"""3D UNet model family for patch-wise cartilage segmentation — TPU-native.

Functional JAX reimplementation of the reference model zoo
(oai_analysis/segmentation/networks.py:38-866): `UNet`, `UNet_light1..4`,
`UNet_light4_2`, `UNet_light4x2`, `UNetClassWise`, plus the auto-context
wrappers (`AutoContextAsRNN`, `CascadedModel`) in models/cascade.py.

TPU-first design decisions (vs the reference's torch NCDHW modules):
  * channels-last NDHWC layout — XLA's native 3D conv layout on TPU, keeps
    the channel dim on the 128-lane axis;
  * the k2s2 transposed-conv upsample is a single einsum
    (N*D*H*W, Cin) @ (Cin, 8*Cout) + reshape — one MXU matmul instead of a
    scatter;
  * the reference's k3/s1/p1 "decoder" ConvTranspose3d layers are
    mathematically plain k3/s1/p1 convolutions with a spatially-flipped,
    channel-swapped kernel, so they are stored and executed here as forward
    convs (the torch-checkpoint converter performs the flip once at load);
  * parameters are a plain nested-dict pytree — shardable with
    jax.sharding, checkpointable as npz/orbax;
  * optional bfloat16 compute with float32 params and accumulation.

Architecture tables were derived from the reference definitions
(networks.py:38-149 UNet, 259-351 light1, 354-445 light2, 448-539 light3,
542-614 light4, 617-661 light4_2, 664-731 light4x2, 152-224 ClassWise).
Note: the reference's `UNetClassWise.dc0s` is a plain Python list so its
heads are invisible to `state_dict()` (networks.py:182) — a known defect we
do NOT replicate; heads here are real parameters.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, dict]

_CONV_DN = ("NDHWC", "DHWIO", "NDHWC")


@dataclasses.dataclass(frozen=True)
class UNetSpec:
    """Static architecture description of one UNet variant.

    enc:  per resolution level, the output channels of the two encoder convs
          (levels are separated by 2x maxpools; the second conv of every
          non-bottom level feeds the skip connection).
    dec:  per decoder level from deepest to shallowest:
          (upconv_out, conv1_out, conv2_out); conv1 consumes
          upconv_out + skip channels.
    """

    name: str
    enc: Tuple[Tuple[int, int], ...]
    dec: Tuple[Tuple[int, int, int], ...]
    in_channels: int = 1
    n_classes: int = 2
    bias: bool = False
    batchnorm: bool = False
    classwise_heads: bool = False

    @property
    def head_in(self) -> int:
        return self.dec[-1][2]

    def replace(self, **kw) -> "UNetSpec":
        return dataclasses.replace(self, **kw)


def _spec(name, enc, dec, **kw):
    return UNetSpec(name=name, enc=tuple(map(tuple, enc)), dec=tuple(map(tuple, dec)), **kw)


# Channel tables for every variant in the reference registry + extras.
NETWORK_SPECS: Dict[str, UNetSpec] = {
    # networks.py:38-149 — 4 levels, 3 pools
    "UNet": _spec(
        "UNet",
        enc=[(32, 64), (64, 128), (128, 256), (256, 512)],
        dec=[(512, 256, 256), (256, 128, 128), (128, 64, 64)],
    ),
    # networks.py:152-224 — UNet trunk + per-class 1-channel heads
    "UNetClassWise": _spec(
        "UNetClassWise",
        enc=[(32, 64), (64, 128), (128, 256), (256, 512)],
        dec=[(512, 256, 256), (256, 128, 128), (128, 64, 64)],
        classwise_heads=True,
    ),
    # networks.py:259-351
    "UNet_light1": _spec(
        "UNet_light1",
        enc=[(16, 32), (32, 64), (64, 128)],
        dec=[(128, 64, 64), (64, 32, 32)],
    ),
    # networks.py:354-445
    "UNet_light2": _spec(
        "UNet_light2",
        enc=[(8, 16), (16, 32), (32, 64)],
        dec=[(64, 32, 32), (32, 16, 16)],
    ),
    # networks.py:448-539
    "UNet_light3": _spec(
        "UNet_light3",
        enc=[(8, 16), (16, 32), (32, 32)],
        dec=[(32, 32, 32), (16, 16, 8)],
    ),
    # networks.py:542-614
    "UNet_light4": _spec(
        "UNet_light4",
        enc=[(8, 16), (16, 32)],
        dec=[(16, 16, 8)],
    ),
    # networks.py:617-661 (module-level encoder/decoder helpers, wider up)
    "UNet_light4_2": _spec(
        "UNet_light4_2",
        enc=[(8, 16), (16, 32)],
        dec=[(32, 16, 8)],
    ),
}


def get_available_networks():
    return list(NETWORK_SPECS.keys())


def get_network(name: str) -> UNetSpec:
    """Registry lookup mirroring the reference factory (networks.py:849-866)."""
    if name not in NETWORK_SPECS:
        raise KeyError(
            f"Network {name} is not available! Choose from: {get_available_networks()}"
        )
    return NETWORK_SPECS[name]


# -- initialisers ---------------------------------------------------------------


def _xavier_normal(key, shape, fan_in, fan_out, dtype=jnp.float32):
    """Xavier/Glorot normal, matching the reference init (networks.py:71-78)."""
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def _init_conv(key, k, cin, cout, bias, dtype=jnp.float32):
    kd = kh = kw = k
    rf = kd * kh * kw
    p = {"kernel": _xavier_normal(key, (kd, kh, kw, cin, cout), cin * rf, cout * rf, dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _init_bn(cout, dtype=jnp.float32):
    return {
        "scale": jnp.ones((cout,), dtype),
        "bias": jnp.zeros((cout,), dtype),
        "mean": jnp.zeros((cout,), dtype),
        "var": jnp.ones((cout,), dtype),
    }


# -- primitive layers -------------------------------------------------------------


def zstack_supported(x: jax.Array, p: dict, spec: "UNetSpec", train: bool) -> bool:
    """Whether this conv should route to the Pallas z-stacked shift-GEMM
    kernel (ops/pallas_conv.conv3d_zstack) instead of XLA's conv.

    The kernel targets the segment stage's hot full-resolution 3x3x3 convs
    (enc0b / dec{last}a / dec{last}b of the reference UNet, networks.py:
    109-149) where XLA runs at ~15-31% MXU. It is inference-only (no vjp
    rule), bf16-only, and needs enough spatial extent to amortize its z/y
    halo overcompute — small/deep layers and training stay on XLA.
    """
    k = p["kernel"]
    if train or spec.batchnorm or x.dtype != jnp.bfloat16:
        return False
    if k.shape[:3] != (3, 3, 3):
        return False
    cin, cout = int(k.shape[3]), int(k.shape[4])
    if cin < 16 or cout > 128:  # degenerate K / wide-N deep layers
        return False
    b, d, h, w, _ = x.shape
    if d < 8 or h < 8 or w < 128:
        return False
    if b * d * h * w < 2_000_000:  # full-res tiles only
        return False
    from oai_analysis_2_tpu.ops.pallas_conv import _pick_tiles
    return _pick_tiles(d, h, w, cin, cout, False) is not None


def conv3d(x: jax.Array, p: dict, padding="SAME", precision=None) -> jax.Array:
    k = p["kernel"].astype(x.dtype)
    # f32 accumulation is requested via preferred_element_type for f32 inputs;
    # for bf16 inputs the conv stays bf16-in/bf16-out (the MXU still
    # accumulates in f32 internally) because jax's conv transpose rule cannot
    # differentiate a mixed bf16-operand/f32-output conv — the result is
    # upcast explicitly instead.
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1), padding=padding, dimension_numbers=_CONV_DN,
        preferred_element_type=pet, precision=precision,
    ).astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y


def upconv2x(x: jax.Array, p: dict, precision=None) -> jax.Array:
    """k2/s2 transposed conv as one MXU matmul: (..., Cin) x (Cin, 2*2*2*Cout)."""
    w = p["kernel"].astype(x.dtype)  # (2, 2, 2, Cin, Cout)
    n, d, h, wd, cin = x.shape
    cout = w.shape[-1]
    wm = w.transpose(3, 0, 1, 2, 4).reshape(cin, 8 * cout)
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    y = jnp.einsum("ndhwc,ck->ndhwk", x, wm,
                   preferred_element_type=pet, precision=precision).astype(jnp.float32)
    y = y.reshape(n, d, h, wd, 2, 2, 2, cout)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(n, 2 * d, 2 * h, 2 * wd, cout)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y


def maxpool2x(x: jax.Array) -> jax.Array:
    """MaxPool3d(2) — floor semantics on odd dims, like torch."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 2, 2, 2, 1),
        window_strides=(1, 2, 2, 2, 1),
        padding="VALID",
    )


def _bn_inference(y: jax.Array, p: dict, eps=1e-5) -> jax.Array:
    inv = lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    return (y - p["mean"]) * (inv * p["scale"]) + p["bias"]


def _bn_train(y: jax.Array, p: dict, eps=1e-5, momentum=0.1):
    axes = (0, 1, 2, 3)
    mean = jnp.mean(y, axes)
    var = jnp.var(y, axes)
    inv = lax.rsqrt(var + eps)
    out = (y - mean) * (inv * p["scale"]) + p["bias"]
    n = y.size // y.shape[-1]
    unbiased = var * n / max(n - 1, 1)
    new_stats = {
        "mean": (1 - momentum) * p["mean"] + momentum * mean,
        "var": (1 - momentum) * p["var"] + momentum * unbiased,
    }
    return out, new_stats


def _block(x, p, spec, up=False, train=False, stats_out=None, name=None,
           precision=None, conv_impl="xla"):
    """conv/upconv [+ BN] + ReLU — the reference's encoder()/decoder() helper."""
    if (not up) and conv_impl == "pallas" and zstack_supported(x, p, spec, train):
        from oai_analysis_2_tpu.ops.pallas_conv import conv3d_zstack
        # bias + ReLU + cast fused into the kernel epilogue; bf16 out is the
        # compute dtype the caller would cast to anyway
        return conv3d_zstack(x, p["kernel"], p.get("bias"), relu=True,
                             out_dtype=x.dtype)
    y = upconv2x(x, p, precision=precision) if up else conv3d(x, p, precision=precision)
    if spec.batchnorm:
        if train:
            y, new_stats = _bn_train(y, p["bn"])
            if stats_out is not None:
                stats_out[name] = new_stats
        else:
            y = _bn_inference(y, p["bn"])
    return jax.nn.relu(y)


# -- the model -----------------------------------------------------------------


def make_threshold_params(
    model: "UNet3D", gain: float = 24.0, threshold: float = 0.5, key=None
) -> Params:
    """Synthetic weights that make the UNet compute
    `sigmoid(gain * (x - threshold))` per class — an intensity threshold
    routed through the REAL topology (level-0 skip path + heads).

    For benches and pipeline-wiring tests: the compute graph, shapes and
    FLOPs are the production network's, but the outputs are deterministic
    shell probability maps instead of random-weight noise, so downstream
    stages (warp, mesh, thickness) see realistic surfaces and an
    assemble/segmenter regression is visible in mesh statistics. Requires a
    bias-enabled spec (the threshold shift lives in the head bias).
    """
    spec = model.spec
    if not spec.bias:
        raise ValueError("threshold params need spec.bias=True for the shift")
    # host-side numpy throughout: eval_shape avoids materializing random
    # init on the accelerator — on a tunneled TPU the device init + ~60
    # per-leaf .at[].set() dispatches + pull-back for np.savez cost minutes
    # of bench/test warmup for what is a pure-host weight construction
    del key  # weights are deterministic zeros+taps; no randomness consumed
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )

    def center_tap(p, cin_idx, cout_idx):
        k = p["kernel"]
        c = k.shape[0] // 2
        k[c, c, c, cin_idx, cout_idx] = 1.0

    # identity path: input -> enc0a ch0 -> enc0b ch0 -> (skip) -> dec{last}a/b
    center_tap(params["enc0a"], 0, 0)
    center_tap(params["enc0b"], 0, 0)
    last = len(spec.dec) - 1
    up_ch = spec.dec[last][0]  # skip channels sit after the upconv block
    center_tap(params[f"dec{last}a"], up_ch + 0, 0)
    center_tap(params[f"dec{last}b"], 0, 0)

    heads = (
        [f"head{c}" for c in range(spec.n_classes)] if spec.classwise_heads else ["head"]
    )
    for name in heads:
        p = params[name]
        p["kernel"][0, 0, 0, 0, :] = gain
        p["bias"] = p["bias"] + (-gain * threshold)
    return params


class UNet3D:
    """Functional 3D UNet. `init(key)` builds the param pytree; `apply(params,
    x)` runs NDHWC -> NDHWC logits. All variants in NETWORK_SPECS share this
    implementation; the spec tables define the topology."""

    def __init__(self, spec: UNetSpec, compute_dtype=jnp.float32, precision=None,
                 conv_impl: str = "auto"):
        """precision: lax.Precision for convs/matmuls. None = backend default
        (bf16 MXU passes on TPU — fastest); "highest" = full f32 (use for
        bit-parity against reference checkpoints).

        conv_impl: "xla" (what "auto" currently resolves to) runs every
        conv through lax.conv_general_dilated; "pallas" routes qualifying
        full-resolution 3x3x3 inference convs to the z-stacked shift-GEMM
        kernel (ops/pallas_conv.py, see zstack_supported). MEASURED
        OUTCOME on v5e (tools/profile_pallas_conv.py, 2026-08): the
        Pallas kernel is parity-correct at production slab shapes but
        0.90-0.95x of XLA's conv — XLA's ~25% MFU on these shapes is not
        scheduling waste the shift-GEMM can recover (its own 192-lane
        dots run at ~53 TF/s too), so XLA stays the default and the
        kernel remains an opt-in experiment."""
        self.spec = spec
        self.compute_dtype = compute_dtype
        self.precision = precision
        if conv_impl == "auto":
            conv_impl = "xla"
        self.conv_impl = conv_impl

    # parameter construction ---------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        spec = self.spec
        params: Params = {}
        keys = iter(jax.random.split(key, 64))

        cin = spec.in_channels
        for li, (ca, cb) in enumerate(spec.enc):
            pa = _init_conv(next(keys), 3, cin, ca, spec.bias, dtype)
            pb = _init_conv(next(keys), 3, ca, cb, spec.bias, dtype)
            if spec.batchnorm:
                pa["bn"] = _init_bn(ca, dtype)
                pb["bn"] = _init_bn(cb, dtype)
            params[f"enc{li}a"] = pa
            params[f"enc{li}b"] = pb
            cin = cb

        cur = spec.enc[-1][1]
        for li, (cu, c1, c2) in enumerate(spec.dec):
            # skip feeding this decoder level: second conv of mirrored encoder level
            skip = spec.enc[len(spec.enc) - 2 - li][1]
            pu = {"kernel": _xavier_normal(next(keys), (2, 2, 2, cur, cu), cur * 8, cu * 8, dtype)}
            if spec.bias:
                pu["bias"] = jnp.zeros((cu,), dtype)
            p1 = _init_conv(next(keys), 3, cu + skip, c1, spec.bias, dtype)
            p2 = _init_conv(next(keys), 3, c1, c2, spec.bias, dtype)
            if spec.batchnorm:
                pu["bn"] = _init_bn(cu, dtype)
                p1["bn"] = _init_bn(c1, dtype)
                p2["bn"] = _init_bn(c2, dtype)
            params[f"dec{li}up"] = pu
            params[f"dec{li}a"] = p1
            params[f"dec{li}b"] = p2
            cur = c2

        if spec.classwise_heads:
            for c in range(spec.n_classes):
                params[f"head{c}"] = _init_conv(next(keys), 1, spec.head_in, 1, spec.bias, dtype)
        else:
            params["head"] = _init_conv(next(keys), 1, spec.head_in, spec.n_classes, spec.bias, dtype)
        return params

    # forward --------------------------------------------------------------------

    def apply(self, params: Params, x: jax.Array, train: bool = False):
        """x: (N, D, H, W, C_in) -> logits (N, D, H, W, n_classes).

        Mirrors the reference forward graph (networks.py:109-149): two convs
        per level, maxpool between levels, upconv + skip-concat + two convs
        per decoder level, 1x1x1 head.
        """
        spec = self.spec
        x = x.astype(self.compute_dtype)
        stats_out: dict = {}

        prec = self.precision
        impl = self.conv_impl
        skips = []
        # cast back to compute_dtype after EVERY block: _block outputs f32
        # (bias/BN/ReLU numerics), and a conv whose input arrives f32 runs a
        # full-f32 MXU pass — leaving the cast to the end of the level made
        # every second encoder conv (the expensive full-resolution ones)
        # silently compute in f32 (~2-4x the bf16 pass)
        for li in range(len(spec.enc)):
            x = _block(x, params[f"enc{li}a"], spec, train=train, stats_out=stats_out, name=f"enc{li}a", precision=prec, conv_impl=impl)
            x = x.astype(self.compute_dtype)
            x = _block(x, params[f"enc{li}b"], spec, train=train, stats_out=stats_out, name=f"enc{li}b", precision=prec, conv_impl=impl)
            x = x.astype(self.compute_dtype)
            if li < len(spec.enc) - 1:
                skips.append(x)
                x = maxpool2x(x)

        for li in range(len(spec.dec)):
            up = _block(x, params[f"dec{li}up"], spec, up=True, train=train, stats_out=stats_out, name=f"dec{li}up", precision=prec)
            skip = skips[len(skips) - 1 - li]
            x = jnp.concatenate([up.astype(self.compute_dtype), skip.astype(self.compute_dtype)], axis=-1)
            x = _block(x, params[f"dec{li}a"], spec, train=train, stats_out=stats_out, name=f"dec{li}a", precision=prec, conv_impl=impl)
            x = x.astype(self.compute_dtype)
            x = _block(x, params[f"dec{li}b"], spec, train=train, stats_out=stats_out, name=f"dec{li}b", precision=prec, conv_impl=impl)
            x = x.astype(self.compute_dtype)

        if spec.classwise_heads:
            outs = [conv3d(x, params[f"head{c}"], precision=prec) for c in range(spec.n_classes)]
            logits = jnp.concatenate(outs, axis=-1)
        else:
            logits = conv3d(x, params["head"], precision=prec)
        logits = logits.astype(jnp.float32)

        if train and spec.batchnorm:
            return logits, stats_out
        return logits

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)
