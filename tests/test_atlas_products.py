"""Cohort science products (engine/atlas_products.py): the atlas-mapped 2D
thickness chain (reference FullDemo cells 9-12, mesh_processing.py:400-534)
as a production path, plus the population-atlas aggregation the reference's
Dask layer never performs."""

import json

import numpy as np
import pytest

import jax

from oai_analysis_2_tpu.core.image import image_from_array
from oai_analysis_2_tpu.engine.atlas_products import (
    AtlasThicknessMapper,
    aggregate_thickness_maps,
    thickness_map_stats,
)
from oai_analysis_2_tpu.mesh.marching import marching_tetrahedra
from oai_analysis_2_tpu.mesh.types import Mesh


def _ball_volume(n, r, center):
    z, y, x = np.meshgrid(*[np.arange(n, dtype=np.float32)] * 3, indexing="ij")
    rr = np.sqrt((z - center[0]) ** 2 + (y - center[1]) ** 2 + (x - center[2]) ** 2)
    return np.clip(1.0 - (rr - r), 0.0, 1.0)


def _thick_mesh(n=20, r=6.0, center=(10, 10, 10), seed=0):
    m = marching_tetrahedra(_ball_volume(n, r, center), 0.5)
    rng = np.random.default_rng(seed)
    m.point_data = rng.uniform(1.0, 3.0, m.n_points).astype(np.float32)
    return m


class TestMapper:
    @pytest.mark.parametrize("mesh_type", ["FC", "TC"])
    def test_matches_manual_chain(self, mesh_type):
        """map_knee must equal the manual map_attributes -> project_thickness
        -> rasterize_thickness chain (the full_demo path) for both tissue
        projections — the mapper only precomputes the atlas-constant parts."""
        from oai_analysis_2_tpu.mesh.ops import map_attributes
        from oai_analysis_2_tpu.mesh.projection import (
            project_thickness,
            rasterize_thickness,
        )

        knee = _thick_mesh(seed=1)
        atlas = _thick_mesh(n=22, r=6.5, center=(11, 11, 11), seed=2)
        if mesh_type == "FC":
            mapper = AtlasThicknessMapper(atlas, _thick_mesh(seed=3))
        else:
            mapper = AtlasThicknessMapper(_thick_mesh(seed=3), atlas)
        out = mapper.map_knee(knee, knee)

        mapped = map_attributes(knee, atlas)
        x, y, t = project_thickness(mapped, mesh_type=mesh_type)
        mean, counts, bounds = rasterize_thickness(x, y, t)

        k = mesh_type.lower()
        np.testing.assert_allclose(out[f"{k}_x"], x.astype(np.float32), rtol=1e-6)
        np.testing.assert_allclose(out[f"{k}_y"], y.astype(np.float32), rtol=1e-6)
        np.testing.assert_allclose(out[f"{k}_thickness"], t, rtol=1e-6)
        np.testing.assert_allclose(out[f"{k}_map"], mean, atol=1e-5)
        np.testing.assert_array_equal(out[f"{k}_counts"], counts)
        np.testing.assert_allclose(out[f"{k}_bounds"], np.asarray(bounds), rtol=1e-6)

    def test_empty_inputs_do_not_crash(self):
        empty = Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
        atlas = _thick_mesh(seed=4)
        mapper = AtlasThicknessMapper(atlas, empty)
        out = mapper.map_knee(empty, _thick_mesh(seed=5))
        assert out["fc_thickness"].shape == (atlas.n_points,)
        assert np.all(out["fc_thickness"] == 0)
        assert out["tc_thickness"].shape == (0,)
        stats = thickness_map_stats(out)
        assert stats["tc_raster_coverage"] == 0.0

    def test_fixed_grid_is_knee_independent(self):
        """Two different knees mapped through one mapper share x/y/bounds
        exactly — the property that makes cohort rasters addable."""
        atlas = _thick_mesh(n=22, r=6.5, center=(11, 11, 11), seed=2)
        mapper = AtlasThicknessMapper(atlas, atlas)
        a = mapper.map_knee(_thick_mesh(seed=6), _thick_mesh(seed=6))
        b = mapper.map_knee(
            _thick_mesh(n=24, r=7.0, center=(12, 12, 12), seed=7),
            _thick_mesh(n=24, r=7.0, center=(12, 12, 12), seed=7),
        )
        np.testing.assert_array_equal(a["fc_x"], b["fc_x"])
        np.testing.assert_array_equal(a["fc_bounds"], b["fc_bounds"])
        assert not np.array_equal(a["fc_thickness"], b["fc_thickness"])


class TestAggregation:
    def test_population_mean(self, tmp_path):
        """sum(mean*counts)/sum(counts) binwise across knees."""
        atlas = _thick_mesh(n=22, r=6.5, center=(11, 11, 11), seed=2)
        mapper = AtlasThicknessMapper(atlas, atlas)
        paths = []
        payloads = []
        for seed in (10, 11, 12):
            knee = _thick_mesh(seed=seed)
            out = mapper.map_knee(knee, knee)
            p = tmp_path / f"k{seed}_thickness_2d.npz"
            np.savez_compressed(p, **out)
            paths.append(p)
            payloads.append(out)

        agg = aggregate_thickness_maps(paths, out_path=tmp_path / "atlas.npz")
        assert int(agg["n_knees"]) == 3
        total_counts = sum(p["fc_counts"] for p in payloads)
        total_sum = sum(
            p["fc_map"].astype(np.float64) * p["fc_counts"] for p in payloads
        )
        expect = np.divide(
            total_sum, total_counts,
            out=np.zeros_like(total_sum), where=total_counts > 0,
        )
        np.testing.assert_allclose(agg["fc_mean"], expect, atol=1e-5)
        np.testing.assert_array_equal(agg["fc_counts"], total_counts)
        with np.load(tmp_path / "atlas.npz") as z:
            np.testing.assert_allclose(z["fc_mean"], agg["fc_mean"])

    def test_unreadable_and_empty(self, tmp_path):
        assert aggregate_thickness_maps([]) is None
        assert aggregate_thickness_maps([tmp_path / "missing.npz"]) is None


class TestPipelineIntegration:
    def test_run_path_and_cohort_atlas(self, tmp_path):
        """KneePipeline(atlas_products=True).run_path writes
        <stem>_thickness_2d.npz + outer meshes; CohortRunner aggregates the
        cohort-mean thickness atlas into the run summary — VERDICT r4 #4."""
        from oai_analysis_2_tpu.engine.pipeline import KneePipeline
        from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise
        from oai_analysis_2_tpu.models.gradicon import GradICONConfig
        from oai_analysis_2_tpu.models.unet3d import (
            NETWORK_SPECS,
            UNet3D,
            make_threshold_params,
        )
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner
        from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint

        cfg = {
            "patch_size": [32, 32, 8],
            "model": "UNet_light4",
            "model_setting": {"in_channel": 1, "n_classes": 2, "bias": True,
                              "BN": False},
        }
        (tmp_path / "cfg.json").write_text(json.dumps(cfg))
        model = UNet3D(NETWORK_SPECS["UNet_light4"].replace(bias=True))
        save_checkpoint(
            {"params": make_threshold_params(model, gain=24.0, threshold=0.5)},
            is_best=False, path=tmp_path, name="seg.npz",
        )
        seg = Segmenter3DInPatchClassWise(mode="pred", config={
            "ckpoint_path": str(tmp_path / "seg.npz"),
            "training_config_file": str(tmp_path / "cfg.json"),
            "batch_size": 4,
            "overlap_size": (8, 8, 2),
            "compute_dtype": "float32",
        })

        shape = (8, 32, 32)
        rng = np.random.default_rng(3)

        def shell_knee(shift):
            z, y, x = np.meshgrid(
                *[np.arange(s, dtype=np.float32) for s in shape], indexing="ij"
            )
            c = (4.0, 17.0 - shift, 16.0)
            rr = np.sqrt(((z - c[0]) * 2.0) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2)
            vol = np.clip(1.0 - np.abs(rr - 6.0) / 2.0, 0, 1) * 0.8
            vol += rng.uniform(0, 0.2, shape).astype(np.float32)
            return image_from_array(vol.astype(np.float32), spacing=(0.5, 0.5, 1.0))

        knees = {"k0": shell_knee(0), "k1": shell_knee(1)}
        atlas = shell_knee(0.5)
        # tiny phantom meshes fall under the production 3000-cell component
        # filter — inject a mapper built without it (the injection path)
        mapper = AtlasThicknessMapper.from_segmenter(
            seg, atlas, filter_threshold=0
        )
        pipe = KneePipeline(
            seg, atlas,
            registration_config=GradICONConfig(
                grid_shape=(8, 16, 16), scales=(2,), stage_width=2
            ),
            registration_mode="instance",
            instance_scales=(2,), instance_steps=(1,),
            atlas_products=mapper,
        )
        out_dir = tmp_path / "out"
        runner = CohortRunner(
            lambda k: pipe.run_path(k, output_dir=out_dir, image=knees[k]),
            manifest_path=tmp_path / "m.json", verbose=False,
        )
        summary = runner.run(sorted(knees))
        assert summary == {"done": 2}

        for k in knees:
            assert (out_dir / f"{k}_thickness_2d.npz").exists()
            assert (out_dir / f"{k}_FC_outer.vtk").exists()
            assert (out_dir / f"{k}_TC_outer.vtk").exists()

        s = json.loads((tmp_path / "m.json.summary.json").read_text())
        atlas_stats = s["thickness_atlas"]
        assert atlas_stats["n_knees"] == 2
        assert atlas_stats["fc_raster_coverage"] > 0
        npz_path = atlas_stats["path"]
        with np.load(npz_path) as z:
            assert z["fc_mean"].shape == (128, 128)
            assert int(z["n_knees"]) == 2
        # per-knee manifest records carry the scalar stats
        rec = runner.manifest.items["k0"]["result"]
        assert "fc_mean_thickness_mm" in rec and "thickness_2d" in rec
