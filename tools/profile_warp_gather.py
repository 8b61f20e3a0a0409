"""Gather-formulation shootout for the warp's trilinear sample.

profile_warp.py showed the 8-tap flat gather IS the warp (1.10 s of the
1.10 s full program). Packing more taps per gather row via lax.gather
slice_sizes naively OOMs: a (N, 2, C) result puts tiny dims in the two
minor (tiled) positions and XLA pads them 64x. The fix probed here is a
BATCH-LAST output layout (offset_dims occupy the leading output dims, the
23.6M-point batch dim is minor-most), so the lane dim is the huge N and
only the sublane dim carries a small pad.

Variants (bit-equivalent to _trilinear_gather for in-range points; edge
clamping via slice-start shift folded into the lerp weight):
  * flat8    — baseline: 8 jnp.take rows of (C,) on (M, C)
  * xpair4T  — 4 lax.gather, slices (2,C) on (M,C), output (2,C,N)
  * yxc2T    — 2 lax.gather, slices (2,2C) on (D*H, W*C), output (2,2C,N)
  * zyxc1T   — 1 lax.gather, slice (2,2,2C) on (D,H,W*C), output (2,2,2C,N)

Round-5 additions: instead of widening the gather SLICE (which the TPU
compiler crashes on at production size), widen the gather ROW by
pre-packing the 2x2x2 neighborhood into the channel dim with clamped
rolls+concat, so each point needs ONE jnp.take row:
  * pack4   — (M, 2C) rows [x0,x1 taps], 4 takes (z,y corners)
  * pack8   — (M, 4C) rows [y,x window], 2 takes (z corners)
  * pack16  — (M, 8C) rows [full 2x2x2 window], 1 take; 32 B/row for
              C=2 bf16 = exactly one HBM granule
The packed volume build is a streaming concat whose cost is included in
the timing (built inside the timed fn).
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

REPEATS = 5
shape = (160, 384, 384)
C = 2
rng = np.random.default_rng(0)

# build test data ON DEVICE: host->device of ~380 MB over the axon tunnel
# can stall for minutes (NEXT.md environment lessons)
@jax.jit
def _make_data(key):
    k1, k2 = jax.random.split(key)
    vol = jax.random.uniform(k1, shape + (C,), jnp.float32).astype(jnp.bfloat16)
    # smooth-ish sample points like a real registration warp (identity + a
    # few voxels of displacement)
    base = jnp.stack(
        [jax.lax.broadcasted_iota(jnp.float32, shape, d) for d in range(3)],
        axis=-1,
    )
    idx = base + 3.0 * jax.random.normal(k2, shape + (3,), jnp.float32)
    return vol, idx


vol, idx = _make_data(jax.random.PRNGKey(0))
jax.block_until_ready((vol, idx))
print("data ready", flush=True)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            y = fn(*a, acc)
            return 1e-12 * jnp.mean(y.astype(jnp.float32))

        return lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))

    try:
        sync(loop(*args))
        t0 = time.time()
        sync(loop(*args))
        dt = (time.time() - t0) / REPEATS
        print(f"{name}: {dt*1000:.0f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 — OOM probes expected
        print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:100]})", flush=True)
        return None


def _starts_weights(idx_zyx, acc, d, h, w):
    z = idx_zyx[..., 0] + acc
    y = idx_zyx[..., 1]
    x = idx_zyx[..., 2]
    z0 = jnp.clip(jnp.floor(z), 0, d - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    fz = jnp.clip(z - z0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    return z0, y0, x0, fz, fy, fx


def flat8(vol, idx_zyx, acc):
    d, h, w, c = vol.shape
    z0, y0, x0, fz, fy, fx = _starts_weights(idx_zyx, acc, d, h, w)
    z1, y1, x1 = z0 + 1, y0 + 1, x0 + 1
    fz, fy, fx = fz[..., None], fy[..., None], fx[..., None]
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


def xpair4T(vol, idx_zyx, acc):
    d, h, w, c = vol.shape
    z0, y0, x0, fz, fy, fx = _starts_weights(idx_zyx, acc, d, h, w)
    flat = vol.reshape(d * h * w, c)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(0, 1), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def g2(zi, yi):
        starts = (((zi * h + yi) * w + x0).ravel())[:, None]
        return lax.gather(flat, starts, dn, slice_sizes=(2, c))  # (2,C,N)

    fxr = fx.ravel()[None, :]
    p00 = g2(z0, y0)
    p01 = g2(z0, y0 + 1)
    p10 = g2(z0 + 1, y0)
    p11 = g2(z0 + 1, y0 + 1)
    c00 = p00[0] * (1 - fxr) + p00[1] * fxr  # (C,N)
    c01 = p01[0] * (1 - fxr) + p01[1] * fxr
    c10 = p10[0] * (1 - fxr) + p10[1] * fxr
    c11 = p11[0] * (1 - fxr) + p11[1] * fxr
    fyr = fy.ravel()[None, :]
    fzr = fz.ravel()[None, :]
    c0 = c00 * (1 - fyr) + c01 * fyr
    c1 = c10 * (1 - fyr) + c11 * fyr
    out = c0 * (1 - fzr) + c1 * fzr  # (C, N)
    return jnp.moveaxis(out, 0, -1).reshape(idx_zyx.shape[:-1] + (c,))


def yxc2T(vol, idx_zyx, acc):
    d, h, w, c = vol.shape
    z0, y0, x0, fz, fy, fx = _starts_weights(idx_zyx, acc, d, h, w)
    v = vol.reshape(d * h, w * c)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(0, 1), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def g(zi):
        starts = jnp.stack([(zi * h + y0).ravel(), (x0 * c).ravel()], axis=-1)
        return lax.gather(v, starts, dn, slice_sizes=(2, 2 * c))  # (2,2C,N)

    fxr = fx.ravel()[None, :]
    fyr = fy.ravel()[None, :]
    fzr = fz.ravel()[None, :]

    def lerp_yx(win):
        cx0 = win[:, :c] * (1 - fxr[None]) + win[:, c:] * fxr[None]  # (2,C,N)
        return cx0[0] * (1 - fyr) + cx0[1] * fyr  # (C,N)

    out = lerp_yx(g(z0)) * (1 - fzr) + lerp_yx(g(z0 + 1)) * fzr
    return jnp.moveaxis(out, 0, -1).reshape(idx_zyx.shape[:-1] + (c,))


def zyxc1T(vol, idx_zyx, acc):
    d, h, w, c = vol.shape
    z0, y0, x0, fz, fy, fx = _starts_weights(idx_zyx, acc, d, h, w)
    v = vol.reshape(d, h, w * c)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(0, 1, 2), collapsed_slice_dims=(), start_index_map=(0, 1, 2)
    )
    starts = jnp.stack([z0.ravel(), y0.ravel(), (x0 * c).ravel()], axis=-1)
    win = lax.gather(v, starts, dn, slice_sizes=(2, 2, 2 * c))  # (2,2,2C,N)
    fxr = fx.ravel()[None, None, :]
    fyr = fy.ravel()[None, :]
    fzr = fz.ravel()[None, :]
    cx = win[:, :, :c] * (1 - fxr[None]) + win[:, :, c:] * fxr[None]  # (2,2,C,N)
    cy = cx[:, 0] * (1 - fyr[None]) + cx[:, 1] * fyr[None]  # (2,C,N)
    out = cy[0] * (1 - fzr) + cy[1] * fzr  # (C,N)
    return jnp.moveaxis(out, 0, -1).reshape(idx_zyx.shape[:-1] + (c,))


def _shift_clamped(v, axis):
    """v advanced one step along `axis` with edge clamp: out[i] = v[min(i+1, n-1)]."""
    n = v.shape[axis]
    head = lax.slice_in_dim(v, 1, n, axis=axis)
    tail = lax.slice_in_dim(v, n - 1, n, axis=axis)
    return jnp.concatenate([head, tail], axis=axis)


def _pack(vol, axes):
    """Concatenate clamped +1 shifts along `axes` into the channel dim.
    After packing axes (2,) the lane order is [dx, c]; (1, 2) -> [dy, dx, c];
    (0, 1, 2) -> [dz, dy, dx, c]."""
    p = vol
    for ax in reversed(axes):
        p = jnp.concatenate([p, _shift_clamped(p, ax)], axis=-1)
    return p


def pack4(vol, idx_zyx, acc):
    d, h, w, c = vol.shape
    z0, y0, x0, fz, fy, fx = _starts_weights(idx_zyx, acc, d, h, w)
    packed = _pack(vol, (2,)).reshape(d * h * w, 2 * c)
    fz, fy, fx = fz[..., None], fy[..., None], fx[..., None]

    def g(zi, yi):
        win = jnp.take(packed, (zi * h + yi) * w + x0, axis=0)
        return win[..., :c] * (1 - fx) + win[..., c:] * fx

    c0 = g(z0, y0) * (1 - fy) + g(z0, y0 + 1) * fy
    c1 = g(z0 + 1, y0) * (1 - fy) + g(z0 + 1, y0 + 1) * fy
    return c0 * (1 - fz) + c1 * fz


def pack8(vol, idx_zyx, acc):
    d, h, w, c = vol.shape
    z0, y0, x0, fz, fy, fx = _starts_weights(idx_zyx, acc, d, h, w)
    packed = _pack(vol, (1, 2)).reshape(d * h * w, 4 * c)
    fz, fy, fx = fz[..., None], fy[..., None], fx[..., None]

    def g(zi):
        win = jnp.take(packed, (zi * h + y0) * w + x0, axis=0)  # [dy, dx, c]
        cy = win[..., : 2 * c] * (1 - fy) + win[..., 2 * c :] * fy  # -> [dx, c]
        return cy[..., :c] * (1 - fx) + cy[..., c:] * fx

    return g(z0) * (1 - fz) + g(z0 + 1) * fz


def pack16(vol, idx_zyx, acc):
    d, h, w, c = vol.shape
    z0, y0, x0, fz, fy, fx = _starts_weights(idx_zyx, acc, d, h, w)
    packed = _pack(vol, (0, 1, 2)).reshape(d * h * w, 8 * c)
    fz, fy, fx = fz[..., None], fy[..., None], fx[..., None]
    win = jnp.take(packed, (z0 * h + y0) * w + x0, axis=0)  # (..., 8C) [dz,dy,dx,c]
    cz = win[..., : 4 * c] * (1 - fz) + win[..., 4 * c :] * fz
    cy = cz[..., : 2 * c] * (1 - fy) + cz[..., 2 * c :] * fy
    return cy[..., :c] * (1 - fx) + cy[..., c:] * fx


VARIANTS = [
    ("flat8", flat8),
    ("xpair4T", xpair4T),
    ("yxc2T", yxc2T),
    ("zyxc1T", zyxc1T),
    ("pack4", pack4),
    ("pack8", pack8),
    ("pack16", pack16),
]

if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    # correctness vs baseline first, on a small in-range slab
    small_v = vol[:8, :32, :32]
    small_i = jnp.clip(idx[:8, :32, :32], 0.0, None)
    small_i = jnp.minimum(
        small_i, jnp.asarray([7.0, 31.0, 31.0], small_i.dtype)
    )
    want = flat8(small_v, small_i, jnp.zeros((), jnp.float32))
    for name, fn in VARIANTS[1:]:
        got = fn(small_v, small_i, jnp.zeros((), jnp.float32))
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        print(f"{name} max |err| vs flat8: {err:.2e}")
        assert err < 1e-2, name

    for name, fn in VARIANTS:
        if only and name != only:
            continue
        timed(name, fn, vol, idx)
    print("PROFILE_WARP_GATHER_DONE")
