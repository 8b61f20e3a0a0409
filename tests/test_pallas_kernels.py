"""Pallas kernel parity vs the XLA implementations.

On the CPU test mesh the Pallas TPU kernel cannot run compiled; we verify
the kernel math in interpreter mode against the XLA surface-distance path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestPointTriangleDistanceKernel:
    def test_interpret_matches_xla(self, monkeypatch):
        from jax.experimental import pallas as pl

        import oai_analysis_2_tpu.ops.pallas_kernels as pk
        from oai_analysis_2_tpu.mesh.ops import distance_to_surface
        from oai_analysis_2_tpu.mesh.types import Mesh

        rng = np.random.default_rng(0)
        n_tri = 40
        verts = rng.uniform(0, 10, (n_tri * 3, 3)).astype(np.float32)
        faces = np.arange(n_tri * 3, dtype=np.int32).reshape(-1, 3)
        mesh = Mesh(verts, faces)
        points = rng.uniform(-2, 12, (50, 3)).astype(np.float32)

        expect = distance_to_surface(points, mesh)

        # run the Pallas kernel in interpreter mode
        orig_call = pl.pallas_call

        def interp_call(*args, **kw):
            kw["interpret"] = True
            return orig_call(*args, **kw)

        monkeypatch.setattr(pl, "pallas_call", interp_call)
        pk._distance_pallas.clear_cache()
        got = pk.point_triangle_distance_pallas(points, mesh.triangles())
        np.testing.assert_allclose(got, expect, atol=1e-4, rtol=1e-4)
