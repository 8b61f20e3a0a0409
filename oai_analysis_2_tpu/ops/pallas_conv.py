"""Pallas TPU kernel for the UNet's 3x3x3 stride-1 SAME convolutions.

Why: XLA-TPU lowers our full-resolution NDHWC 3D convs at ~15-31% MXU
(tools/profile_conv_variants.py, tools/profile_unet_levels.py) — the
segment stage's dominant cost (reference graph: networks.py:109-149; the
decoder convs 192->64 and 64->64 at full tile resolution). The main
inefficiencies are (a) out-channel counts of 64 leaving half the MXU
lanes idle and (b) tap-by-tap scheduling that re-streams activations.

This kernel reformulates the conv as a "z-stacked shift-GEMM":

  * the 3 kz taps are stacked on the matmul N dimension, so each matmul
    writes 3*Cout (=192 for Cout=64) output lanes — full MXU width. A
    matmul row computed from input row z' contributes to output rows
    z', z'-1, z'-2; the epilogue sums the 3 shifted slices (VPU adds
    entirely in VMEM);
  * the ky (and optionally kx) taps are stacked on the K dimension by
    concatenating shifted views of the input block along the channel
    (lane) axis — im2col restricted to the cheap directions — so K is a
    multiple of 128 even for 64/32-channel layers;
  * any remaining taps (kx) become a short unrolled accumulation loop;
  * blocks stream HBM->VMEM once via Pallas Element windows with halo
    padding (the SAME-pad zeros come from the window's pad_low/pad_high,
    not an XLA pad copy), and each output voxel is written exactly once,
    with bias + ReLU + dtype cast fused in the epilogue.

FLOP overcount vs the plain conv: the z halo rows ((TZ+2)/TZ) — 12.5%
at the default TZ=16. Everything else is the conv's own arithmetic.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    t = min(target, n)
    while n % t:
        t -= 1
    return t


def _kernel(x_ref, w_ref, b_ref, o_ref, y_ref, *, tz, ty, tx, cin, cout,
            stack_x, use_bias, relu, out_dtype):
    """One (TZ, TY, TX) output block.

    x_ref: (TZ+2, TY+2, TX+2, Cin) halo'd input window (bf16)
    w_ref: (n_dx, K, 3*Cout) rearranged weights — see conv3d_zstack
    b_ref: (1, Cout) bias (zeros when use_bias=False)
    o_ref: (TZ, TY, TX, Cout)
    y_ref: (TZ+2, TY, TX, 3*Cout) f32 scratch accumulator
    """
    # The Element windows reach 1 element past the array on every side; the
    # out-of-bounds positions are NOT zero-filled (NaN in interpret mode,
    # garbage on hardware) — zero the SAME-padding halo explicitly wherever
    # this block touches an array edge.
    iz, iy, ix = pl.program_id(1), pl.program_id(2), pl.program_id(3)
    nz, ny, nx = pl.num_programs(1), pl.num_programs(2), pl.num_programs(3)
    w = tx
    zero_zslab = jnp.zeros((1, ty + 2, tx + 2, cin), x_ref.dtype)
    zero_yrow = jnp.zeros((tz + 2, 1, tx + 2, cin), x_ref.dtype)
    zero_xcol = jnp.zeros((tz + 2, ty + 2, 1, cin), x_ref.dtype)

    @pl.when(iz == 0)
    def _():
        x_ref[0:1] = zero_zslab

    @pl.when(iz == nz - 1)
    def _():
        x_ref[tz + 1:tz + 2] = zero_zslab

    @pl.when(iy == 0)
    def _():
        x_ref[:, 0:1] = zero_yrow

    @pl.when(iy == ny - 1)
    def _():
        x_ref[:, ty + 1:ty + 2] = zero_yrow

    @pl.when(ix == 0)
    def _():
        x_ref[:, :, 0:1] = zero_xcol

    @pl.when(ix == nx - 1)
    def _():
        x_ref[:, :, tx + 1:tx + 2] = zero_xcol

    xv = x_ref[...]  # (TZ+2, TY+2, TX+2, Cin)

    def view(dy, dx):
        return xv[:, dy:dy + ty, dx:dx + w, :]

    m = (tz + 2) * ty * w
    n_dx = 1 if stack_x else 3
    for dx_outer in range(n_dx):
        if stack_x:
            parts = [view(dy, dx) for dy in range(3) for dx in range(3)]
        else:
            parts = [view(dy, dx_outer) for dy in range(3)]
        a = jnp.concatenate(parts, axis=-1)  # (TZ+2, TY, W, K)
        a = a.reshape(m, a.shape[-1])
        y = jax.lax.dot_general(
            a, w_ref[dx_outer],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tz + 2, ty, w, 3 * cout)
        if dx_outer == 0:
            y_ref[...] = y
        else:
            y_ref[...] += y

    yv = y_ref[...]
    # out[z] = sum_dz in[z+dz] @ W[dz], dz-th N chunk of y, rows shifted by dz
    out = (yv[0:tz, :, :, 0:cout]
           + yv[1:tz + 1, :, :, cout:2 * cout]
           + yv[2:tz + 2, :, :, 2 * cout:3 * cout])
    if use_bias:
        out = out + b_ref[0]
    if relu:
        out = jnp.maximum(out, 0.0)
    o_ref[...] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "relu", "out_dtype", "tz", "ty", "tx", "stack_x", "interpret"))
def conv3d_zstack(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    relu: bool = False,
    out_dtype=jnp.bfloat16,
    tz: Optional[int] = None,
    ty: Optional[int] = None,
    tx: Optional[int] = None,
    stack_x: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """3D conv, kernel 3x3x3, stride 1, SAME, NDHWC — Pallas TPU kernel.

    x: (B, D, H, W, Cin); kernel: (3, 3, 3, Cin, Cout); bias: (Cout,) or None.
    Optionally fuses bias add + ReLU + output cast. Returns (B, D, H, W, Cout)
    in out_dtype. Numerics: bf16 operands, f32 accumulation — same contract as
    models/unet3d.conv3d on bf16 inputs.
    """
    b_, d, h, w, cin = x.shape
    kd, kh, kw, kcin, cout = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3) and kcin == cin, (kernel.shape, cin)
    if stack_x is None:
        stack_x = cin < 64  # K = 9*Cin only pays when channels are narrow
    if tz is None:
        tz = _pick_tile(d, 16)
    if ty is None:
        ty = _pick_tile(h, 8 if cin >= 128 else 16)
    if tx is None:
        tx = _pick_tile(w, 128)

    # Rearrange weights: (3,3,3,Cin,Cout) -> (n_dx, K, 3*Cout); dz taps on N
    # (chunk dz of the last axis), (ky[,kx],cin) on K in the same order the
    # kernel concatenates activation views.
    kmat = kernel.astype(x.dtype)
    if stack_x:
        km = kmat.transpose(1, 2, 3, 0, 4).reshape(1, 9 * cin, 3 * cout)
    else:
        km = kmat.transpose(2, 1, 3, 0, 4).reshape(3, 3 * cin, 3 * cout)

    use_bias = bias is not None
    bmat = (bias.astype(jnp.float32).reshape(1, cout)
            if use_bias else jnp.zeros((1, cout), jnp.float32))

    kern = functools.partial(
        _kernel, tz=tz, ty=ty, tx=tx, cin=cin, cout=cout, stack_x=stack_x,
        use_bias=use_bias, relu=relu, out_dtype=out_dtype)

    in_specs = [
        pl.BlockSpec(
            (pl.Squeezed(), pl.Element(tz + 2, (1, 1)),
             pl.Element(ty + 2, (1, 1)), pl.Element(tx + 2, (1, 1)),
             pl.Element(cin, (0, 0))),
            # Element index_map returns the UNPADDED start; pallas subtracts
            # pad_low to place the halo (verified against interpret mode)
            lambda b, iz, iy, ix: (b, iz * tz, iy * ty, ix * tx, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
    ]
    out_specs = pl.BlockSpec(
        (None, tz, ty, tx, cout), lambda b, iz, iy, ix: (b, iz, iy, ix, 0),
        memory_space=pltpu.VMEM,
    )
    # matmul work incl. the z-halo overcompute: 27*Cin*Cout MACs per
    # (d + 2*d/tz) * h * w * b_ "rows"
    flops = 2 * 27 * cin * cout * b_ * (d + 2 * (d // tz)) * h * w
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(b_, d // tz, h // ty, w // tx),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((b_, d, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tz + 2, ty, tx, 3 * cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + b_ * d * h * w * cout * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(x, km, bmat)
