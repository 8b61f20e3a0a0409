"""Warp-stage breakdown on the real chip: where do the ~1.9 s go?

Times the production fused separable warp (2-channel bf16 probmaps,
160x384x384 atlas grid, 48x96x96 field) and ablations: field upsample only,
gather only (precomputed indices), 1 channel, f32. Each variant loops
REPEATS times inside one jit (serialized through a scalar) so tunnel
dispatch doesn't confound it.
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from oai_analysis_2_tpu.core.image import image_from_array, physical_grid
from oai_analysis_2_tpu.ops.resample import (
    DisplacementField,
    _separable_resize_weights,
    _trilinear_gather,
    _upsample_field_separable,
)

REPEATS = 5
shape = (160, 384, 384)
fshape = (48, 96, 96)
rng = np.random.default_rng(0)

probs = jnp.asarray(rng.uniform(0, 1, shape + (2,)).astype(np.float32)).astype(jnp.bfloat16)
field = jnp.asarray(rng.normal(0, 2.0, fshape + (3,)).astype(np.float32))
atlas = image_from_array(np.zeros(shape, np.float32), spacing=(0.36, 0.36, 0.7))
moving = image_from_array(np.zeros(shape, np.float32), spacing=(0.36, 0.36, 0.7))
disp = DisplacementField(
    field=field,
    origin=atlas.origin,
    spacing=jnp.asarray(np.asarray(atlas.spacing) * (np.asarray(shape[::-1]) - 1)
                        / (np.asarray(fshape[::-1]) - 1), jnp.float32),
    direction=atlas.direction,
)
wz, wy, wx = _separable_resize_weights(disp, atlas)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            y = fn(*a, acc)
            return 1e-12 * jnp.mean(y).astype(jnp.float32)

        return lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))

    sync(loop(*args))
    t0 = time.time()
    sync(loop(*args))
    dt = (time.time() - t0) / REPEATS
    print(f"{name}: {dt*1000:.0f} ms", flush=True)
    return dt


def full_warp(stacked, fld, acc):
    pts = physical_grid(shape, atlas.origin, atlas.spacing, atlas.direction)
    pts = pts + _upsample_field_separable(fld + acc, wz, wy, wx)
    idx_zyx = moving.physical_to_indices(pts)[..., ::-1]
    return _trilinear_gather(stacked, idx_zyx, 0.0)


def upsample_only(fld, acc):
    return _upsample_field_separable(fld + acc, wz, wy, wx)


def grid_and_idx(fld, acc):
    pts = physical_grid(shape, atlas.origin, atlas.spacing, atlas.direction)
    pts = pts + _upsample_field_separable(fld + acc, wz, wy, wx)
    return moving.physical_to_indices(pts)[..., ::-1]


idx_pre = jax.jit(lambda f: grid_and_idx(f, jnp.zeros((), jnp.float32)))(field)


def gather_only(stacked, idx, acc):
    return _trilinear_gather(stacked, idx + acc, 0.0)


def trilinear_windowed(vol, idx_zyx, acc, split_x=False):
    """Trilinear via ONE windowed lax.gather of (2,2,2,C) blocks per point
    (or TWO (2,2,1,C) gathers when split_x), instead of 8 scalar-ish gathers."""
    d, h, w = vol.shape[:3]
    c = vol.shape[3]
    z, y, x = idx_zyx[..., 0] + acc, idx_zyx[..., 1], idx_zyx[..., 2]
    s_z = jnp.clip(jnp.floor(z), 0, d - 2).astype(jnp.int32)
    s_y = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
    s_x = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    fz = jnp.clip(z - s_z, 0.0, 1.0).astype(vol.dtype)
    fy = jnp.clip(y - s_y, 0.0, 1.0).astype(vol.dtype)
    fx = jnp.clip(x - s_x, 0.0, 1.0).astype(vol.dtype)
    starts = jnp.stack([s_z.ravel(), s_y.ravel(), s_x.ravel()], axis=-1)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(), start_index_map=(0, 1, 2)
    )
    if split_x:
        win = lax.gather(vol, starts, dn, slice_sizes=(2, 2, 1, c))[..., 0, :]
        win1 = lax.gather(
            vol, starts + jnp.asarray([0, 0, 1], jnp.int32), dn, slice_sizes=(2, 2, 1, c)
        )[..., 0, :]
        fxr = fx.ravel()[:, None, None, None]
        wx2 = win * (1 - fxr) + win1 * fxr  # (N,2,2,C)
    else:
        win = lax.gather(vol, starts, dn, slice_sizes=(2, 2, 2, c))  # (N,2,2,2,C)
        fxr = fx.ravel()[:, None, None, None]
        wx2 = win[:, :, :, 0, :] * (1 - fxr) + win[:, :, :, 1, :] * fxr
    fyr = fy.ravel()[:, None, None]
    wy2 = wx2[:, :, 0, :] * (1 - fyr) + wx2[:, :, 1, :] * fyr
    fzr = fz.ravel()[:, None]
    out = wy2[:, 0, :] * (1 - fzr) + wy2[:, 1, :] * fzr
    return out.reshape(z.shape + (c,))


def trilinear_flat(vol, idx_zyx, acc):
    """Trilinear via 8 FLAT 1-D gathers on the linearized (D*H*W, C) volume
    — probes whether XLA's 1-D gather path beats the 3-D one."""
    d, h, w = vol.shape[:3]
    c = vol.shape[3]
    z, y, x = idx_zyx[..., 0] + acc, idx_zyx[..., 1], idx_zyx[..., 2]
    z0 = jnp.clip(jnp.floor(z), 0, d - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1).astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, d - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fz = jnp.clip(z - z0, 0, 1).astype(vol.dtype)[..., None]
    fy = jnp.clip(y - y0, 0, 1).astype(vol.dtype)[..., None]
    fx = jnp.clip(x - x0, 0, 1).astype(vol.dtype)[..., None]
    flat = vol.reshape(d * h * w, c)

    def g(zi, yi, xi):
        return jnp.take(flat, (zi * h + yi) * w + xi, axis=0)

    c00 = g(z0, y0, x0) * (1 - fx) + g(z0, y0, x1) * fx
    c01 = g(z0, y1, x0) * (1 - fx) + g(z0, y1, x1) * fx
    c10 = g(z1, y0, x0) * (1 - fx) + g(z1, y0, x1) * fx
    c11 = g(z1, y1, x0) * (1 - fx) + g(z1, y1, x1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def trilinear_flat_scalar(vol3, idx_zyx, acc):
    """Pure scalar flat gather: vol (D,H,W) -> ravel (M,), no channel dim."""
    d, h, w = vol3.shape
    z, y, x = idx_zyx[..., 0] + acc, idx_zyx[..., 1], idx_zyx[..., 2]
    z0 = jnp.clip(jnp.floor(z), 0, d - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1).astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, d - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fz = jnp.clip(z - z0, 0, 1).astype(vol3.dtype)
    fy = jnp.clip(y - y0, 0, 1).astype(vol3.dtype)
    fx = jnp.clip(x - x0, 0, 1).astype(vol3.dtype)
    flat = vol3.ravel()

    def g(zi, yi, xi):
        return jnp.take(flat, (zi * h + yi) * w + xi)

    c00 = g(z0, y0, x0) * (1 - fx) + g(z0, y0, x1) * fx
    c01 = g(z0, y1, x0) * (1 - fx) + g(z0, y1, x1) * fx
    c10 = g(z1, y0, x0) * (1 - fx) + g(z1, y0, x1) * fx
    c11 = g(z1, y1, x0) * (1 - fx) + g(z1, y1, x1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def full_warp_packed(stacked, fld, acc):
    pts = physical_grid(shape, atlas.origin, atlas.spacing, atlas.direction)
    pts = pts + _upsample_field_separable(fld + acc, wz, wy, wx)
    idx_zyx = moving.physical_to_indices(pts)[..., ::-1]
    return _trilinear_gather(stacked, idx_zyx, 0.0, pack=True)


VARIANTS = [
    ("flat 1-D gather C=2 bf16", lambda: timed("flat 1-D gather C=2 bf16", trilinear_flat, probs, idx_pre)),
    ("flat 1-D gather C=1 bf16", lambda: timed("flat 1-D gather C=1 bf16", trilinear_flat, probs[..., :1], idx_pre)),
    ("flat scalar bf16", lambda: timed("flat scalar bf16", trilinear_flat_scalar, probs[..., 0], idx_pre)),
    ("flat scalar f32", lambda: timed("flat scalar f32", trilinear_flat_scalar, probs[..., 0].astype(jnp.float32), idx_pre)),
    ("full warp C=2 bf16", lambda: timed("full warp C=2 bf16", full_warp, probs, field)),
    ("full warp packed C=2 bf16", lambda: timed("full warp packed C=2 bf16", full_warp_packed, probs, field)),
    ("field upsample only", lambda: timed("field upsample only", upsample_only, field)),
    ("grid+idx (no gather)", lambda: timed("grid+idx (no gather)", grid_and_idx, field)),
    ("gather only C=2 bf16", lambda: timed("gather only C=2 bf16", gather_only, probs, idx_pre)),
    ("gather only C=1 bf16", lambda: timed("gather only C=1 bf16", gather_only, probs[..., :1], idx_pre)),
    ("gather only C=2 f32", lambda: timed("gather only C=2 f32", gather_only, probs.astype(jnp.float32), idx_pre)),
    # no-channel-axis gather (D,H,W): the layout the registration warp uses
    ("gather only (D,H,W) f32", lambda: timed("gather only (D,H,W) f32", gather_only, probs[..., 0].astype(jnp.float32), idx_pre)),
]

_only = sys.argv[1] if len(sys.argv) > 1 else None
for _name, _fn in VARIANTS:
    if _only is None or _only in _name:
        _fn()
print("PROFILE_WARP_DONE")
