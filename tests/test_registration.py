"""Registration tests: transform algebra, losses, instance-optimization
recovery of a known translation, and the physical-space facade."""

import numpy as np
import pytest

import jax.numpy as jnp

from oai_analysis_2_tpu.core.image import image_from_array
from oai_analysis_2_tpu.models.gradicon import (
    GradICON,
    GradICONConfig,
    compose,
    gradicon_penalty,
    identity_map,
    lncc,
    register_pair_instance,
    warp,
)


def _blob(shape, center, sigma=4.0):
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    d2 = (zz - center[0]) ** 2 + (yy - center[1]) ** 2 + (xx - center[2]) ** 2
    return np.exp(-d2 / (2 * sigma**2)).astype(np.float32)


class TestTransformAlgebra:
    def test_identity_warp(self):
        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.standard_normal((8, 8, 8)), jnp.float32)
        ident = identity_map(vol.shape)
        np.testing.assert_allclose(np.asarray(warp(vol, ident)), np.asarray(vol), atol=1e-5)

    def test_compose_with_identity(self):
        shape = (6, 7, 8)
        ident = identity_map(shape)
        rng = np.random.default_rng(1)
        phi = ident + 0.05 * jnp.asarray(rng.standard_normal(shape + (3,)), jnp.float32)
        np.testing.assert_allclose(np.asarray(compose(phi, ident)), np.asarray(phi), atol=1e-5)

    def test_constant_shift_warp(self):
        shape = (8, 8, 8)
        vol = jnp.asarray(np.arange(512).reshape(shape), jnp.float32)
        ident = identity_map(shape)
        shift = jnp.zeros(3).at[2].set(1.0 / 7.0)  # +1 voxel in x
        out = np.asarray(warp(vol, ident + shift))
        np.testing.assert_allclose(out[:, :, :-1], np.asarray(vol)[:, :, 1:], atol=1e-3)

    def test_gradicon_penalty_zero_for_inverse_pair(self):
        shape = (8, 8, 8)
        ident = identity_map(shape)
        assert float(gradicon_penalty(ident, ident)) < 1e-8

    def test_alternating_penalty_zero_at_optimum_and_scatter_free(self):
        """gradicon_penalty_alternating: same optimum (mutually inverse
        maps), gradients flow to BOTH fields, and — the point of it — the
        gradient program contains NO scatter (the exact penalty's VJP
        scatter-adds into the full grid, which TPUs serialize)."""
        import jax

        from oai_analysis_2_tpu.models.gradicon import gradicon_penalty_alternating

        shape = (8, 8, 8)
        ident = identity_map(shape)
        assert float(gradicon_penalty_alternating(ident, ident)) < 1e-8

        rng = np.random.default_rng(3)
        pert = 0.03 * jnp.asarray(rng.standard_normal(shape + (3,)), jnp.float32)
        phi_ab, phi_ba = ident + pert, ident - pert

        def alt_loss(pair):
            return gradicon_penalty_alternating(*pair)

        def exact_loss(pair):
            return gradicon_penalty(*pair)

        g_ab, g_ba = jax.grad(alt_loss)((phi_ab, phi_ba))
        assert float(jnp.abs(g_ab).max()) > 0
        assert float(jnp.abs(g_ba).max()) > 0

        alt_hlo = jax.jit(jax.grad(alt_loss)).lower((phi_ab, phi_ba)).as_text()
        exact_hlo = jax.jit(jax.grad(exact_loss)).lower((phi_ab, phi_ba)).as_text()
        assert "scatter" not in alt_hlo
        assert "scatter" in exact_hlo

    def test_instance_gicon_grad_modes(self):
        """Both gradient modes recover a translation; bad mode raises."""
        shape = (16, 32, 32)
        a = jnp.asarray(_blob(shape, (8, 16, 16)))
        b = jnp.asarray(_blob(shape, (8, 16, 19)))
        before = float(jnp.mean((a - b) ** 2))
        for mode in ("exact", "alternating"):
            phi_ab, _ = register_pair_instance(
                a, b, scales=(4,), steps_per_scale=30, gicon_grad=mode
            )
            after = float(jnp.mean((a - warp(b, phi_ab)) ** 2))
            assert after < 0.4 * before, mode
        with pytest.raises(ValueError):
            register_pair_instance(
                a, b, scales=(4,), steps_per_scale=1, gicon_grad="bogus"
            )

    def test_lncc_perfect_match_is_zero(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.standard_normal((10, 10, 10)), jnp.float32)
        assert float(lncc(a, a)) < 1e-3
        b = jnp.asarray(rng.standard_normal((10, 10, 10)), jnp.float32)
        assert float(lncc(a, b)) > 0.5


class TestInstanceRegistration:
    def test_recovers_translation(self):
        shape = (16, 32, 32)
        a = _blob(shape, (8, 16, 16))
        b = _blob(shape, (8, 16, 20))  # shifted +4 in x
        before = float(np.mean((a - b) ** 2))
        phi_ab, phi_ba = register_pair_instance(
            jnp.asarray(a), jnp.asarray(b), scales=(4, 2), steps_per_scale=40
        )
        warped_b = np.asarray(warp(jnp.asarray(b), phi_ab))
        after = float(np.mean((a - warped_b) ** 2))
        assert after < 0.3 * before

    def test_early_stop_matches_full_budget_and_bounds_steps(self):
        """The plateau early-stop (while_loop) must (a) land near the
        fixed-budget solution on an easy problem and (b) actually run the
        bounded program — verified via the steps_taken output of the cached
        per-scale runner."""
        from oai_analysis_2_tpu.models.gradicon import _scale_runner

        shape = (16, 32, 32)
        a = _blob(shape, (8, 16, 16))
        b = _blob(shape, (8, 16, 20))
        before = float(np.mean((a - b) ** 2))
        phi_ab, _ = register_pair_instance(
            jnp.asarray(a), jnp.asarray(b), scales=(4, 2), steps_per_scale=40,
            early_stop=0.05,
        )
        warped_b = np.asarray(warp(jnp.asarray(b), phi_ab))
        after = float(np.mean((a - warped_b) ** 2))
        assert after < 0.3 * before  # same contract as the fixed-budget test

        # direct per-scale check: an easy pure-translation at coarse scale
        # plateaus well before the 200-step cap
        runner = _scale_runner(
            (8, 16, 16), shape, 200, 1.2, 5, "lncc+mse", 0.5, 0.3, False,
            "alternating", 0.05,
        )
        from oai_analysis_2_tpu.models.gradicon import downsample2x, identity_map

        a_s = downsample2x(jnp.asarray(a))
        b_s = downsample2x(jnp.asarray(b))
        ident = identity_map((8, 16, 16))
        pab, pba, steps = runner(ident, ident, a_s, b_s)
        assert pab.shape == shape + (3,)
        assert 6 < int(steps) < 200, int(steps)

    def test_network_forward_shapes(self):
        import jax

        cfg = GradICONConfig(grid_shape=(8, 16, 16), scales=(2, 1), stage_width=2)
        model = GradICON(cfg)
        params = model.init(jax.random.PRNGKey(0))
        a = jnp.asarray(_blob(cfg.grid_shape, (4, 8, 8)))
        b = jnp.asarray(_blob(cfg.grid_shape, (4, 8, 10)))
        phi_ab, phi_ba = model.both_maps(params, a, b)
        assert phi_ab.shape == cfg.grid_shape + (3,)
        loss, (sim, reg, *_) = model.loss(params, a, b)
        assert np.isfinite(float(loss))


class TestPhysicalFacade:
    def test_register_and_warp_improves_overlap(self):
        from oai_analysis_2_tpu.engine.registration import register_pair
        from oai_analysis_2_tpu.models.gradicon import GradICONConfig
        from oai_analysis_2_tpu.ops.resample import resample_image

        shape = (16, 32, 32)
        # knee (A): blob at x=20; atlas (B): blob at x=14, different origin
        a_img = image_from_array(_blob(shape, (8, 16, 20)), origin=(1.0, 2.0, 3.0))
        b_img = image_from_array(_blob(shape, (8, 16, 14)), origin=(-5.0, 0.0, 0.0))

        cfg = GradICONConfig(grid_shape=shape, scales=(2, 1))
        phi_ab, phi_ba = register_pair(
            a_img, b_img, config=cfg, instance_scales=(4, 2), instance_steps=30
        )
        # warp an A-grid "probability map" (the blob itself) onto B's grid
        warped = resample_image(a_img, b_img, displacement=phi_ab)
        target = np.asarray(b_img.data)
        before = float(np.mean((np.asarray(resample_image(a_img, b_img).data) - target) ** 2))
        after = float(np.mean((np.asarray(warped.data) - target) ** 2))
        assert after < 0.5 * before


class TestGradICONTraining:
    def test_train_step_reduces_loss(self):
        import jax
        import optax

        from oai_analysis_2_tpu.models.gradicon import (
            GradICON,
            GradICONConfig,
            make_gradicon_train_step,
        )

        cfg = GradICONConfig(grid_shape=(8, 16, 16), scales=(2, 1), stage_width=2)
        model = GradICON(cfg)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        step = make_gradicon_train_step(model, opt)

        a = jnp.stack([jnp.asarray(_blob(cfg.grid_shape, (4, 8, 8)))])
        b = jnp.stack([jnp.asarray(_blob(cfg.grid_shape, (4, 8, 10)))])
        losses = []
        for _ in range(4):
            params, opt_state, loss = step(params, opt_state, a, b)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestScaleRunnerCache:
    def test_instance_scale_program_is_cached(self):
        """Round-2 regression guard: register_pair_instance must NOT rebuild
        (and re-trace) its jitted scale program per call — the round-1
        closure-per-call pattern cost ~4s host time per registration."""
        import jax.numpy as jnp

        from oai_analysis_2_tpu.models.gradicon import (
            _scale_runner,
            register_pair_instance,
        )

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(0, 1, (8, 16, 16)).astype(np.float32))
        b = jnp.asarray(rng.uniform(0, 1, (8, 16, 16)).astype(np.float32))
        register_pair_instance(a, b, scales=(2,), steps_per_scale=2)
        before = _scale_runner.cache_info()
        register_pair_instance(a, b, scales=(2,), steps_per_scale=2)
        after = _scale_runner.cache_info()
        assert after.hits == before.hits + 1  # same program object reused
        assert after.misses == before.misses


class TestShippedWeights:
    def test_auto_mode_resolves_to_network(self):
        """With the packaged gradicon.npz present, ICON_Registration("auto")
        must pick the trained-network path (the reference's pretrained
        behavior, registration.py:20) and expose loaded params."""
        from oai_analysis_2_tpu.engine.registration import ICON_Registration
        from oai_analysis_2_tpu.models.gradicon import default_gradicon_weights_path

        if not default_gradicon_weights_path().exists():
            pytest.skip("weights not shipped in this checkout")
        # config=None: adopt the checkpoint's recorded architecture, so this
        # test survives retrains at any width (w16 -> w24 shipped in round 4)
        reg = ICON_Registration(mode="auto", config=None)
        assert reg.mode == "network"
        assert reg.params is not None and len(reg.params) == 3
        # stage params carry the trained (nonzero) displacement heads
        head = np.asarray(reg.params[0]["head"]["kernel"])
        assert np.abs(head).max() > 0

    def test_auto_mode_adopts_checkpoint_architecture(self, tmp_path, monkeypatch):
        """With no explicit config, auto mode must build its GradICONConfig
        from the checkpoint's recorded architecture metadata — so retrained
        weights at a different width/grid ship without code changes."""
        import jax

        from oai_analysis_2_tpu.engine import registration as reg_mod
        from oai_analysis_2_tpu.models import gradicon as g
        from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint

        cfg = g.GradICONConfig(grid_shape=(16, 32, 32), scales=(2, 1), stage_width=4)
        params = g.GradICON(cfg).init(jax.random.PRNGKey(0))
        save_checkpoint(
            {
                "params": {f"stage{i}": p for i, p in enumerate(params)},
                "stage_width": cfg.stage_width,
                "grid_shape": list(cfg.grid_shape),
                "scales": list(cfg.scales),
            },
            is_best=False,
            path=tmp_path,
            name="gradicon.npz",
        )
        monkeypatch.setattr(
            g, "default_gradicon_weights_path", lambda: tmp_path / "gradicon.npz"
        )
        reg = reg_mod.ICON_Registration(mode="auto", config=None)
        assert reg.mode == "network"
        assert reg.config.stage_width == 4
        assert reg.config.grid_shape == (16, 32, 32)
        assert reg.config.scales == (2, 1)
        # an EXPLICIT mismatched config stays authoritative: weights are
        # rejected and auto falls back to instance optimization
        reg2 = reg_mod.ICON_Registration(
            mode="auto", config=g.GradICONConfig(stage_width=16)
        )
        assert reg2.mode == "instance"


class TestQualityMetrics:
    """map_quality_stats (models/gradicon.py) + its production surfacing
    (ICON_Registration.last_quality; VERDICT r4 #3b)."""

    def test_identity_maps_are_perfect(self):
        from oai_analysis_2_tpu.models.gradicon import map_quality_stats

        ident = identity_map((12, 16, 16))
        q = {k: float(v) for k, v in map_quality_stats(ident, ident).items()}
        assert q["ice_mean_vox"] < 1e-5 and q["ice_max_vox"] < 1e-4
        assert q["fold_fraction_ab"] == 0.0 and q["fold_fraction_ba"] == 0.0

    def test_reflection_is_fully_folded(self):
        from oai_analysis_2_tpu.models.gradicon import map_quality_stats

        ident = identity_map((12, 16, 16))
        # reflect the z component: det(J) = -1 everywhere
        refl = ident.at[..., 0].set(1.0 - ident[..., 0])
        q = map_quality_stats(refl, ident)
        assert float(q["fold_fraction_ab"]) == 1.0
        assert float(q["fold_fraction_ba"]) == 0.0

    def test_inverse_pair_beats_mismatched_pair(self):
        from oai_analysis_2_tpu.models.gradicon import map_quality_stats

        shape = (12, 16, 16)
        ident = identity_map(shape)
        shift = jnp.zeros(ident.shape).at[..., 2].set(0.1)
        fwd, inv = ident + shift, ident - shift
        good = float(map_quality_stats(fwd, inv)["ice_mean_vox"])
        bad = float(map_quality_stats(fwd, fwd)["ice_mean_vox"])
        assert good < 0.2 * bad
        # 0.1 normalized x-shift composed twice = 0.2 * (16-1) = 3 voxels
        assert abs(bad - 2 * 0.1 * (shape[2] - 1)) < 0.3

    def test_facade_surfaces_quality(self):
        from oai_analysis_2_tpu.engine.registration import ICON_Registration

        shape = (16, 32, 32)
        a_img = image_from_array(_blob(shape, (8, 16, 18)))
        b_img = image_from_array(_blob(shape, (8, 16, 14)))
        reg = ICON_Registration(
            mode="instance",
            config=GradICONConfig(grid_shape=shape, scales=(2,)),
            instance_scales=(2,), instance_steps=(5,),
        )
        assert reg.last_quality is None
        reg.register(a_img, b_img)
        q = reg.last_quality
        assert set(q) >= {
            "ice_mean_vox", "ice_max_vox", "ice_mean_mm", "ice_max_mm",
            "fold_fraction_ab", "fold_fraction_ba",
        }
        assert 0.0 <= q["fold_fraction_ab"] <= 1.0
        assert q["ice_mean_mm"] >= 0.0 and np.isfinite(q["ice_max_mm"])

        off = ICON_Registration(
            mode="instance",
            config=GradICONConfig(grid_shape=shape, scales=(2,)),
            instance_scales=(2,), instance_steps=(1,),
            collect_quality=False,
        )
        off.register(a_img, b_img)
        assert off.last_quality is None
