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
  * each output voxel is computed and written exactly once, with bias +
    ReLU + dtype cast fused in the epilogue.

Hardware-lowering constraints discovered on v5e (this is the third
formulation; tools/profile_pallas_conv.py):
  * Mosaic's "last two block dims (8,128)-divisible or equal to the
    array dim" rule rejects x-halo'd windows (tx+2 on the second-minor
    axis) for every tile size dividing production widths — so the x
    axis is NOT blocked: each block spans the full (padded) W extent;
  * Element-window low padding ("pad_low") is unimplemented in this
    libtpu's Mosaic ("Low padding not supported yet") — so the SAME-pad
    halo comes from ONE XLA zero-pad of the activation (z,y,x each +1
    both sides, a bandwidth-bound copy: ~8 ms on the largest 3.2 GB
    slab activation) and the grid reads overlapping UNPADDED Element
    windows of the padded array. No in-kernel edge handling remains;
  * the scoped-VMEM stack limit is 16 MB and counts every live
    temporary (double-buffered input window, the im2col concat, the
    f32 dot results) — `_pick_tiles` sizes (tz, ty) against an explicit
    byte model instead of guessing.

FLOP overcount vs the plain conv: the z halo rows ((TZ+2)/TZ) — 25%
at TZ=8, 50% at TZ=4. Everything else is the conv's own arithmetic.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

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


def _vmem_estimate(tz, ty, w, cin, cout, stack_x) -> int:
    """Bytes of scoped VMEM the kernel needs at (tz, ty): double-buffered
    input window + double-buffered output block + the im2col concat (bf16)
    + the f32 dot result + the f32 scratch accumulator + the weights.
    Validated against Mosaic's reported stack sizes on v5e (the no-scratch
    value-accumulation variant blew this model up 2.3x — unrolled values
    all stay live; the scratch-ref variant tracks it within ~15%)."""
    k = (9 if stack_x else 3) * cin
    m = (tz + 2) * ty * w
    in_block = 2 * (tz + 2) * (ty + 2) * (w + 2) * cin * 2
    out_block = 2 * tz * ty * w * cout * 2
    a_tmp = m * k * 2
    dot_tmp = m * 3 * cout * 4
    scratch = m * 3 * cout * 4
    weights = (1 if stack_x else 3) * k * 3 * cout * 2
    return in_block + out_block + a_tmp + dot_tmp + scratch + weights


def _pick_tiles(d, h, w, cin, cout, stack_x,
                budget=13 * 2**20) -> Optional[Tuple[int, int]]:
    """Largest (tz, ty) whose VMEM estimate fits the budget; z-halo
    overcompute prefers big tz, so search tz descending and maximize ty."""
    for tz_target in (16, 8, 4, 2):
        tz = _pick_tile(d, tz_target)
        best_ty = None
        for ty_target in (16, 8, 4, 2, 1):
            ty = _pick_tile(h, ty_target)
            if _vmem_estimate(tz, ty, w, cin, cout, stack_x) <= budget:
                best_ty = ty
                break
        if best_ty is not None:
            return tz, best_ty
    return None


def _kernel(x_ref, w_ref, b_ref, o_ref, y_ref, *, tz, ty, w, cout,
            stack_x, use_bias, relu, out_dtype):
    """One (TZ, TY, W) output block (x spans the whole array).

    x_ref: (TZ+2, TY+2, W+2, Cin) window of the zero-padded input (bf16)
    w_ref: (n_dx, K, 3*Cout) rearranged weights — see conv3d_zstack
    b_ref: (1, Cout) bias (zeros when use_bias=False)
    o_ref: (TZ, TY, W, Cout)
    y_ref: (TZ+2, TY, W, 3*Cout) f32 scratch accumulator — accumulating
        into a ref (not values) keeps exactly one f32 buffer live; the
        unrolled value form doubled Mosaic's stack use and OOMed VMEM.
    """

    def view(dy, dx):
        return x_ref[:, dy:dy + ty, dx:dx + w, :]

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
    # out[z] = sum_dz in[z+dz] @ W[dz], dz-th N chunk of yv, rows shifted by dz
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
    static_argnames=("relu", "out_dtype", "tz", "ty", "stack_x", "interpret"))
def conv3d_zstack(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    relu: bool = False,
    out_dtype=jnp.bfloat16,
    tz: Optional[int] = None,
    ty: Optional[int] = None,
    stack_x: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """3D conv, kernel 3x3x3, stride 1, SAME, NDHWC — Pallas TPU kernel.

    x: (B, D, H, W, Cin); kernel: (3, 3, 3, Cin, Cout); bias: (Cout,) or None.
    Optionally fuses bias add + ReLU + output cast. Returns (B, D, H, W, Cout)
    in out_dtype. Numerics: bf16 operands, f32 accumulation — same contract as
    models/unet3d.conv3d on bf16 inputs.

    Raises ValueError when no (tz, ty) tiling fits the VMEM budget (callers
    fall back to the XLA conv; see models/unet3d.zstack_supported).
    """
    b_, d, h, w, cin = x.shape
    kd, kh, kw, kcin, cout = kernel.shape
    assert (kd, kh, kw) == (3, 3, 3) and kcin == cin, (kernel.shape, cin)
    if stack_x is None:
        # K = 9*Cin would only pay when channels are narrow, but the
        # lane-axis concat of 9 sub-128-lane views does not lower on the
        # current Mosaic (tools/profile_pallas_conv.py) — default off.
        stack_x = False
    if tz is None or ty is None:
        picked = _pick_tiles(d, h, w, cin, cout, stack_x)
        if picked is None:
            raise ValueError(
                f"conv3d_zstack: no tiling fits VMEM for shape {x.shape} "
                f"cout={cout} stack_x={stack_x}")
        tz = tz if tz is not None else picked[0]
        ty = ty if ty is not None else picked[1]

    # SAME-pad once in XLA; the grid reads overlapping windows of this.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

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
        _kernel, tz=tz, ty=ty, w=w, cout=cout, stack_x=stack_x,
        use_bias=use_bias, relu=relu, out_dtype=out_dtype)

    in_specs = [
        pl.BlockSpec(
            (pl.Squeezed(), pl.Element(tz + 2, (0, 0)),
             pl.Element(ty + 2, (0, 0)), pl.Element(w + 2, (0, 0)),
             pl.Element(cin, (0, 0))),
            lambda b, iz, iy: (b, iz * tz, iy * ty, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
    ]
    out_specs = pl.BlockSpec(
        (None, tz, ty, w, cout), lambda b, iz, iy: (b, iz, iy, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # matmul work incl. the z-halo overcompute: 27*Cin*Cout MACs per
    # (d + 2*d/tz) * h * w * b_ "rows"
    flops = 2 * 27 * cin * cout * b_ * (d + 2 * (d // tz)) * h * w
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(b_, d // tz, h // ty),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((b_, d, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tz + 2, ty, w, 3 * cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + b_ * d * h * w * cout * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(xp, km, bmat)
