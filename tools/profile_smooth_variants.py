"""Smoothing-loop lowering shootout on the real chip.

The production `_smooth_loop` gathers (N, K) neighbor ROWS from an (N, 3)
vertex array every iteration. f32 arrays tile as (8, 128) on TPU, so a
3-wide row gather may move a full 128-lane tile per neighbor (~42x the
useful bytes) — the same failure mode the warp stage hit before its
flat-1-D gather rewrite (ops/resample.py). Candidates:

  rows : current form — jnp.sum(v[tbl], axis=1)
  soa  : structure-of-arrays — three (N,) coordinate planes, three 1-D
         gathers per iteration
  onep : SoA but carrying an (3, N) array, gathering along axis 1

Each runs the production 150 iterations at the B=8 union size (bucket
524288, K=16) and the single-knee size (65536).
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


@partial(jax.jit, static_argnames=("iters",))
def rows(verts, tbl, deg, iters: int, relax):
    inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)[:, None]
    mov = (deg > 0)[:, None]

    def body(_, v):
        avg = jnp.sum(v[tbl], axis=1) * inv
        return jnp.where(mov, v + relax * (avg - v), v)

    return jax.lax.fori_loop(0, iters, body, verts)


@partial(jax.jit, static_argnames=("iters",))
def soa(verts, tbl, deg, iters: int, relax):
    inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
    mov = deg > 0
    planes = tuple(verts[:, i] for i in range(3))

    def body(_, ps):
        out = []
        for p in ps:
            avg = jnp.sum(p[tbl], axis=1) * inv
            out.append(jnp.where(mov, p + relax * (avg - p), p))
        return tuple(out)

    ps = jax.lax.fori_loop(0, iters, body, planes)
    return jnp.stack(ps, axis=1)


@partial(jax.jit, static_argnames=("iters",))
def onep(verts, tbl, deg, iters: int, relax):
    inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
    mov = deg > 0
    v3n = verts.T  # (3, N)

    def body(_, v):
        avg = jnp.take(v, tbl.reshape(-1), axis=1).reshape(3, tbl.shape[0], tbl.shape[1]).sum(-1) * inv
        return jnp.where(mov, v + relax * (avg - v), v)

    return jax.lax.fori_loop(0, iters, body, v3n).T


def bench_one(name, fn, verts, tbl, deg):
    relax = jnp.float32(0.01)
    out = fn(verts, tbl, deg, 150, relax)
    out.block_until_ready()
    float(np.asarray(out).ravel()[0])  # tunnel-true sync
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(verts, tbl, deg, 150, relax)
        float(np.asarray(out).ravel()[0])
        ts.append(time.time() - t0)
    print(f"  {name}: {sorted(ts)[1]*1000:.0f} ms (x150 iters)", flush=True)
    return out


for nv in (65536, 524288):
    k = 16
    rng = np.random.default_rng(0)
    # band-structured neighbors like an MC mesh: indices near the row
    base = np.arange(nv)[:, None] + rng.integers(-300, 300, (nv, k))
    tbl_np = np.clip(base, 0, nv - 1).astype(np.int32)
    deg_np = np.full(nv, 11.0, np.float32)
    deg_np[-1] = 0.0
    verts_np = rng.standard_normal((nv, 3)).astype(np.float32)
    verts = jnp.asarray(verts_np)
    tbl = jnp.asarray(tbl_np)
    deg = jnp.asarray(deg_np)
    print(f"nv={nv} K={k}:", flush=True)
    ref = bench_one("rows", rows, verts, tbl, deg)
    for name, fn in (("soa", soa), ("onep", onep)):
        out = bench_one(name, fn, verts, tbl, deg)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"    max|diff vs rows| = {err:.3e}", flush=True)


@partial(jax.jit, static_argnames=("iters",))
def tiered(verts, tbl8, tbl16, deg, iters: int, relax):
    """Vertices pre-sorted [deg<=8 | deg>8]: low-deg rows gather K=8, the
    high-deg tail K=16 — gather rows ~8.8/vertex instead of 16."""
    n8 = tbl8.shape[0]
    inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)[:, None]
    mov = (deg > 0)[:, None]

    def body(_, v):
        s8 = jnp.sum(v[tbl8], axis=1)
        s16 = jnp.sum(v[tbl16], axis=1)
        avg = jnp.concatenate([s8, s16]) * inv
        return jnp.where(mov, v + relax * (avg - v), v)

    return jax.lax.fori_loop(0, iters, body, verts)


for nv in (65536, 524288):
    k = 16
    rng = np.random.default_rng(0)
    n8 = int(nv * 0.92)  # MC meshes: ~92% of vertices have degree <= 8
    base8 = np.arange(n8)[:, None] + rng.integers(-300, 300, (n8, 8))
    base16 = (np.arange(nv - n8)[:, None] + n8 + rng.integers(-300, 300, (nv - n8, 16)))
    tbl8 = jnp.asarray(np.clip(base8, 0, nv - 1).astype(np.int32))
    tbl16 = jnp.asarray(np.clip(base16, 0, nv - 1).astype(np.int32))
    deg_np = np.concatenate([np.full(n8, 6.0), np.full(nv - n8, 11.0)]).astype(np.float32)
    deg = jnp.asarray(deg_np)
    verts = jnp.asarray(rng.standard_normal((nv, 3)).astype(np.float32))
    relax = jnp.float32(0.01)
    out = tiered(verts, tbl8, tbl16, deg, 150, relax)
    float(np.asarray(out).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = tiered(verts, tbl8, tbl16, deg, 150, relax)
        float(np.asarray(out).ravel()[0])
        ts.append(time.time() - t0)
    print(f"nv={nv} tiered(8/16): {sorted(ts)[1]*1000:.0f} ms (x150 iters)", flush=True)
