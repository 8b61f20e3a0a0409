"""Thickness-stage profiling on the real chip: per-substage wall times
for the production workload (bench.py's warped shell probmaps)."""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np

import jax
import jax.numpy as jnp

from oai_analysis_2_tpu.core.image import image_from_array
from oai_analysis_2_tpu.mesh.marching_cubes import marching_cubes_multi
from oai_analysis_2_tpu.mesh.components import filter_small_components
from oai_analysis_2_tpu.mesh.ops import (
    smooth_meshes, distance_to_surface_async, _sync_distance,
)
from oai_analysis_2_tpu.mesh.split import split_mesh
from oai_analysis_2_tpu.mesh.processing import _as_xyz


def _shell(shape, r_in=47.5, r_out=52.5, center=None):
    d, h, w = shape
    c = center or (d * 0.5, h * 0.55, w * 0.5)
    z, y, x = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape], indexing="ij")
    rr = np.sqrt(((z - c[0]) * 2.4) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2)
    s = np.clip(1.0 - np.abs(rr - (r_in + r_out) / 2) / ((r_out - r_in) / 2), 0, 1)
    return (s * (y < c[1])).astype(np.float32)


shape = (160, 384, 384)
fc = image_from_array(_shell(shape), spacing=(0.36, 0.36, 0.7))
tc = image_from_array(_shell(shape, 31.5, 35.5, (80, 230, 192)), spacing=(0.36, 0.36, 0.7))

# N_KNEES=8 profiles the batched-thickness workload (16 tissue maps, the
# B=8 cohort batch); default 1 is the single-knee stage. DEVICE_INPUTS=1
# device_puts the maps first — the production path (batch.py feeds device
# views of the warped array, which routes MC through the on-device branch).
import os

n_knees = int(os.environ.get("N_KNEES", "1"))
if os.environ.get("DEVICE_INPUTS") == "1":
    fc = fc.with_data(jax.device_put(fc.data))
    tc = tc.with_data(jax.device_put(tc.data))
images = [fc, tc] * n_knees

for rep in range(3):
    tmarks = [("start", time.time())]
    vols = [_as_xyz(im) for im in images]
    sp = tuple(float(s) for s in np.asarray(fc.spacing))
    extracted = marching_cubes_multi(vols, level=0.5, spacing=sp)
    tmarks.append(("mc", time.time()))
    raws = [filter_small_components(r, 3000) for r in extracted]
    tmarks.append(("components", time.time()))
    smoothed = smooth_meshes(raws, num_iterations=150)
    tmarks.append(("smooth", time.time()))
    pend = []
    for mesh, mt in zip(smoothed, ("FC", "TC") * n_knees):
        inner, outer = split_mesh(mesh, mt)
        pend.append((inner, outer,
                     distance_to_surface_async(inner.vertices, outer),
                     distance_to_surface_async(outer.vertices, inner)))
    tmarks.append(("split+dispatch", time.time()))
    for inner, outer, d_in, d_out in pend:
        _sync_distance(d_in, inner.n_points)
        _sync_distance(d_out, outer.n_points)
    tmarks.append(("distance_sync", time.time()))
    line = " ".join(
        f"{name}={tmarks[i+1][1]-tmarks[i][1]:.2f}s"
        for i, (name, _) in enumerate(tmarks[1:])
    )
    total = tmarks[-1][1] - tmarks[0][1]
    pts = [m.n_points for m in smoothed]
    print(f"rep{rep}: {line} total={total:.2f}s points={pts}", flush=True)

# the actual production call (batched split via kmeans_many + packed pulls)
from oai_analysis_2_tpu.mesh.processing import get_thickness_meshes

for rep in range(2):
    t0 = time.time()
    pairs = get_thickness_meshes(images, ["FC", "TC"] * n_knees)
    print(f"get_thickness_meshes rep{rep}: {time.time()-t0:.2f}s", flush=True)
