"""Chip-gated TPU regression tests (VERDICT round-1 weak #5).

Run with the real chip attached:

    OAI_TPU_TESTS=1 python -m pytest tests/test_tpu_chip.py -q

Skipped entirely on the CPU CI mesh — these pin the ON-CHIP claims (Pallas
distance-kernel numerics + minimum speedup over the XLA fallback) that were
previously verified only in builder logs. NOTE: do not run while another
process is using the TPU (the axon worker can crash under two clients).
"""

import os
import time

import numpy as np
import pytest

_on_chip = os.environ.get("OAI_TPU_TESTS") == "1"
if _on_chip:
    import jax

    _on_chip = any(d.platform == "tpu" for d in jax.devices())

pytestmark = pytest.mark.skipif(
    not _on_chip, reason="needs OAI_TPU_TESTS=1 and a TPU device"
)


def _random_surface(n_tri=4096, n_pts=8192, seed=0):
    rng = np.random.default_rng(seed)
    verts = rng.uniform(0, 50, (n_tri * 3, 3)).astype(np.float32)
    faces = np.arange(n_tri * 3, dtype=np.int32).reshape(-1, 3)
    points = rng.uniform(-5, 55, (n_pts, 3)).astype(np.float32)
    return points, verts, faces


class TestPallasOnChip:
    def test_distance_kernel_matches_xla(self):
        from oai_analysis_2_tpu.mesh.ops import distance_to_surface
        from oai_analysis_2_tpu.mesh.types import Mesh
        from oai_analysis_2_tpu.ops.pallas_kernels import (
            pallas_available,
            point_triangle_distance_pallas,
        )

        assert pallas_available(), "Pallas must resolve on the attached TPU"
        points, verts, faces = _random_surface()
        mesh = Mesh(verts, faces)
        expect = distance_to_surface(points, mesh, force_xla=True)
        got = point_triangle_distance_pallas(points, mesh.triangles())
        np.testing.assert_allclose(got, expect, atol=1e-3, rtol=1e-3)

    def test_distance_kernel_speedup(self):
        """The Pallas kernel must beat the XLA scan fallback by >= 2x on a
        production-scale problem (round-1 builder logs claimed 9.6x)."""
        import jax

        from oai_analysis_2_tpu.mesh.ops import distance_to_surface
        from oai_analysis_2_tpu.mesh.types import Mesh
        from oai_analysis_2_tpu.ops.pallas_kernels import point_triangle_distance_pallas

        points, verts, faces = _random_surface(n_tri=16384, n_pts=16384, seed=1)
        mesh = Mesh(verts, faces)

        # warm both paths (compile)
        point_triangle_distance_pallas(points, mesh.triangles())
        distance_to_surface(points, mesh, force_xla=True)

        def best_of(fn, n=3):
            times = []
            for _ in range(n):
                t0 = time.perf_counter()
                fn()
                times.append(time.perf_counter() - t0)
            return min(times)

        t_pallas = best_of(lambda: point_triangle_distance_pallas(points, mesh.triangles()))
        t_xla = best_of(lambda: distance_to_surface(points, mesh, force_xla=True))
        assert t_pallas * 2.0 < t_xla, (
            f"Pallas {t_pallas * 1e3:.1f} ms not >=2x faster than XLA {t_xla * 1e3:.1f} ms"
        )


class TestMarchingCubesOnChip:
    def test_device_extraction_matches_host(self):
        import jax.numpy as jnp

        from oai_analysis_2_tpu.mesh.marching_cubes import marching_cubes

        n = 64
        g = np.arange(n, dtype=np.float32)
        x, y, z = np.meshgrid(g, g, g, indexing="ij")
        vol = (20.0 - np.sqrt((x - 32) ** 2 + (y - 32) ** 2 + (z - 32) ** 2)).astype(
            np.float32
        )
        host = marching_cubes(vol, 0.0)
        dev = marching_cubes(jnp.asarray(vol), 0.0)
        assert host.n_points == dev.n_points and host.n_cells == dev.n_cells
        hv = host.vertices[np.lexsort(host.vertices.T)]
        dv = dev.vertices[np.lexsort(dev.vertices.T)]
        np.testing.assert_allclose(hv, dv, atol=1e-4)


class TestNetworkRegistrationOnChip:
    def test_shipped_weights_register_on_chip(self):
        """The production registration path (shipped GradICON weights + low-lr
        fine-tune) must run on the real chip and recover a deliberate shift
        direction — an on-chip e2e guard for the round-2 network mode."""
        import jax
        import jax.numpy as jnp

        from oai_analysis_2_tpu.core.image import image_from_array
        from oai_analysis_2_tpu.engine.registration import ICON_Registration
        from oai_analysis_2_tpu.models.gradicon import (
            GradICONConfig,
            default_gradicon_weights_path,
        )

        if not default_gradicon_weights_path().exists():
            pytest.skip("weights not shipped in this checkout")
        shape = (48, 96, 96)
        rng = np.random.default_rng(5)
        z, y, x = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape], indexing="ij")
        rr = np.sqrt(((z - 24) * 2.4) ** 2 + (y - 52) ** 2 + (x - 48) ** 2)
        shell = np.clip(1.0 - np.abs(rr - 14.0) / 2.0, 0, 1) * (y < 52)
        vol = (shell * 0.8 + rng.uniform(0, 0.2, shape)).astype(np.float32)
        fixed = image_from_array(vol, spacing=(1.0, 1.0, 1.0))
        moving = image_from_array(np.roll(vol, 3, axis=1), spacing=(1.0, 1.0, 1.0))

        reg = ICON_Registration(mode="auto", config=GradICONConfig(), finetune_steps=10)
        assert reg.mode == "network"
        phi = reg.register(fixed, moving)
        jax.block_until_ready(phi.field)
        f = np.asarray(phi.field)
        assert np.isfinite(f).all()
        # moving = fixed rolled +3 in y, so a moving-grid point maps to
        # fixed-space y-3: the returned phi (fixed->moving convention,
        # engine/registration.py:register docstring) must carry ~-3 mm mean
        # y-displacement over the anatomy
        mask = shell > 0.5
        mean_y = f[..., 1][mask].mean()
        assert abs(mean_y + 3.0) < 0.8, f"expected ~-3 y displacement, got {mean_y:.3f}"
