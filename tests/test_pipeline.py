"""Engine + facade + parallel runtime tests: segmentation end-to-end on a
synthetic checkpoint, sharded train/inference on the 8-device CPU mesh, and
the resumable cohort runner."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oai_analysis_2_tpu.core.image import image_from_array
from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise
from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D
from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def seg_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("seg")
    config = {
        "patch_size": [32, 32, 16],  # x, y, z
        "model": "UNet_light4",
        "model_setting": {"in_channel": 1, "n_classes": 2, "bias": False, "BN": False},
    }
    cfg_path = tmp / "train_config.json"
    cfg_path.write_text(json.dumps(config))

    spec = NETWORK_SPECS["UNet_light4"]
    model = UNet3D(spec)
    params = model.init(jax.random.PRNGKey(7))
    save_checkpoint(
        {"params": params, "epoch": 600, "best_score": 0.9},
        is_best=False,
        path=tmp,
        name="seg.npz",
    )
    return {
        "ckpoint_path": str(tmp / "seg.npz"),
        "training_config_file": str(cfg_path),
        "batch_size": 4,
        "overlap_size": (4, 4, 2),
        "output_prob": True,
        "output_itk": True,
        "compute_dtype": "float32",
    }


class TestSegmenter:
    def test_end_to_end_probmaps(self, seg_setup):
        seg = Segmenter3DInPatchClassWise(mode="pred", config=seg_setup)
        rng = np.random.default_rng(0)
        img = image_from_array(
            rng.uniform(0, 1, (24, 48, 48)).astype(np.float32),
            origin=(1.0, 2.0, 3.0),
            spacing=(0.36, 0.36, 0.7),
        )
        fc, tc = seg.segment(img, if_output_prob_map=True, if_output_itk=True)
        assert fc.data.shape == img.data.shape
        np.testing.assert_allclose(np.asarray(fc.origin), np.asarray(img.origin))
        f, t = np.asarray(fc.data), np.asarray(tc.data)
        assert 0.0 <= f.min() and f.max() <= 1.0
        assert not np.allclose(f, t)  # two distinct class channels
        # boundary margin zeroed with the reference's axis quirk (z<-cz, y<-cx, x<-cy)
        assert np.all(f[:2] == 0) and np.all(f[:, :4] == 0) and np.all(f[:, :, :4] == 0)

    def test_evaluation_entry_point(self, seg_setup):
        """`test()` — the evaluation path the reference stubs out
        (segmenter.py:94-98) — returns per-class Dice through the production
        segment path."""
        seg = Segmenter3DInPatchClassWise(mode="pred", config=seg_setup)
        rng = np.random.default_rng(5)
        img = image_from_array(rng.uniform(0, 1, (24, 48, 48)).astype(np.float32))
        # oracle labels = the model's own thresholded prediction -> Dice 1.0
        fc, tc = seg.segment(img, if_output_prob_map=False, if_output_itk=False)
        label = np.stack([np.asarray(fc), np.asarray(tc)])
        out = seg.test([(img, label)])
        assert out["per_volume_dice"] == [[1.0, 1.0]]
        # disjoint labels -> Dice 0.0
        out0 = seg.test([(img, 1.0 - label)])
        assert all(d < 0.7 for d in out0["mean_dice"])

    def test_threshold_mode(self, seg_setup):
        seg = Segmenter3DInPatchClassWise(mode="pred", config=seg_setup)
        rng = np.random.default_rng(1)
        img = image_from_array(rng.uniform(0, 1, (24, 48, 48)).astype(np.float32))
        fc, _ = seg.segment(img, if_output_prob_map=False)
        vals = np.unique(np.asarray(fc.data))
        assert set(vals).issubset({0.0, 1.0})

    def test_inference_patch_size_dial(self, seg_setup, tmp_path):
        """`inference_patch_size` re-tiles inference without touching the
        training patch. With pointwise (threshold) weights the output is
        tile-size invariant, so the dial must reproduce the default tiling's
        maps exactly; invalid tiles (not divisible by the pooling ladder)
        must raise."""
        import json as _json

        from oai_analysis_2_tpu.models.unet3d import make_threshold_params

        cfg = {
            "patch_size": [32, 32, 16],
            "model": "UNet_light4",
            "model_setting": {"in_channel": 1, "n_classes": 2, "bias": True, "BN": False},
        }
        (tmp_path / "cfg.json").write_text(_json.dumps(cfg))
        model = UNet3D(NETWORK_SPECS["UNet_light4"].replace(bias=True))
        save_checkpoint(
            {"params": make_threshold_params(model, gain=24.0, threshold=0.5)},
            is_best=False, path=tmp_path, name="seg.npz",
        )
        base = {
            "ckpoint_path": str(tmp_path / "seg.npz"),
            "training_config_file": str(tmp_path / "cfg.json"),
            "batch_size": 4,
            "overlap_size": (4, 4, 2),
            "compute_dtype": "float32",
        }
        rng = np.random.default_rng(3)
        img = image_from_array(rng.uniform(0, 1, (20, 36, 36)).astype(np.float32))

        seg_def = Segmenter3DInPatchClassWise(mode="pred", config=base)
        fc0, tc0 = seg_def.segment(img, if_output_itk=False)

        seg_big = Segmenter3DInPatchClassWise(
            mode="pred", config={**base, "inference_patch_size": (40, 40, 24),
                                 "batch_size": 1},
        )
        seg_big.pred_setup()
        assert seg_big.partition.num_tiles(img.data.shape) < seg_def.partition.num_tiles(
            img.data.shape
        )
        fc1, tc1 = seg_big.segment(img, if_output_itk=False)
        np.testing.assert_allclose(np.asarray(fc1), np.asarray(fc0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tc1), np.asarray(tc0), atol=1e-6)

        seg_bad = Segmenter3DInPatchClassWise(
            mode="pred", config={**base, "inference_patch_size": (35, 36, 20)},
        )
        with pytest.raises(ValueError, match="divisible"):
            seg_bad.pred_setup()

    def test_torch_checkpoint_roundtrip(self, seg_setup, tmp_path):
        """The reference's .pth.tar checkpoints load through the converter."""
        torch = pytest.importorskip("torch")
        from tests.test_unet3d import TorchUNetOracle, _randomize

        spec = NETWORK_SPECS["UNet_light4"]
        oracle = _randomize(TorchUNetOracle(spec))
        ck = {
            "model_state_dict": oracle.state_dict(),
            "epoch": 42,
            "best_score": 0.5,
        }
        path = tmp_path / "model.pth.tar"
        torch.save(ck, path)

        from oai_analysis_2_tpu.models.unet3d import UNet3D
        from oai_analysis_2_tpu.utils.checkpoint import initialize_model

        model = UNet3D(spec)
        params, epoch, best = initialize_model(model, ckpoint_path=path)
        assert epoch == 42 and best == 0.5
        out = model.apply(params, jnp.ones((1, 4, 4, 4, 1)))
        assert np.isfinite(np.asarray(out)).all()


class TestSharding:
    def test_mesh_and_sharded_train_step(self):
        import optax

        from oai_analysis_2_tpu.parallel.sharding import (
            make_device_mesh,
            make_sharded_train_step,
        )

        assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
        mesh = make_device_mesh(n_data=4, n_space=2)
        spec = NETWORK_SPECS["UNet_light4"]
        model = UNet3D(spec)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.sgd(1e-2)
        opt_state = opt.init(params)
        step = make_sharded_train_step(model, opt, mesh, spatial_shard=True)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 4, 8, 8, 1)), jnp.float32)
        y = (x > 0).astype(jnp.float32).repeat(2, axis=-1)
        new_params, _, loss = step(params, opt_state, x, y)
        assert np.isfinite(float(loss))
        # params actually changed
        delta = jax.tree_util.tree_reduce(
            lambda acc, leaf: acc + float(jnp.sum(jnp.abs(leaf))),
            jax.tree_util.tree_map(lambda a, b: a - b, new_params, params),
            0.0,
        )
        assert delta > 0

    def test_sharded_inference_matches_single(self):
        from oai_analysis_2_tpu.parallel.sharding import (
            make_device_mesh,
            make_sharded_inference,
        )

        mesh = make_device_mesh(n_data=8, n_space=1)
        spec = NETWORK_SPECS["UNet_light4"]
        model = UNet3D(spec)
        params = model.init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(2)
        tiles = jnp.asarray(rng.standard_normal((5, 4, 8, 8, 1)), jnp.float32)
        run = make_sharded_inference(model, mesh)
        got = np.asarray(run(params, tiles))
        expect = np.asarray(jax.nn.sigmoid(model.apply(params, tiles)))
        np.testing.assert_allclose(got, expect, atol=2e-5)


    def test_sharded_gradicon_train_step(self):
        """Data-parallel registration training over the 8-device mesh — one
        step must run, all-reduce, and move the params."""
        import optax

        from oai_analysis_2_tpu.models.gradicon import GradICON, GradICONConfig
        from oai_analysis_2_tpu.parallel.sharding import (
            make_device_mesh,
            make_sharded_gradicon_train_step,
        )

        mesh = make_device_mesh(n_data=4, n_space=2)
        cfg = GradICONConfig(grid_shape=(16, 16, 16), scales=(2, 1), stage_width=2)
        model = GradICON(cfg)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        step = make_sharded_gradicon_train_step(model, opt, mesh)

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 16)), jnp.float32)
        b = jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 16)), jnp.float32)
        new_params, _, loss = step(params, opt_state, a, b)
        assert np.isfinite(float(loss))
        delta = sum(
            float(jnp.sum(jnp.abs(l)))
            for l in jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x, y: x - y, new_params, params)
            )
        )
        assert delta > 0


class TestCohortRunner:
    def test_resume_and_failure_isolation(self, tmp_path):
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        calls = []

        def pipeline(item):
            calls.append(item)
            if item == "bad":
                raise ValueError("boom")
            return {"ok": item}

        manifest = tmp_path / "manifest.json"
        runner = CohortRunner(pipeline, manifest_path=manifest, max_retries=0, verbose=False)
        summary = runner.run(["a", "bad", "c"])
        assert summary == {"done": 2, "failed": 1}

        # resume: only the failed item is retried? (max_retries=0 -> stays failed)
        runner2 = CohortRunner(pipeline, manifest_path=manifest, max_retries=0, verbose=False)
        calls.clear()
        summary2 = runner2.run(["a", "bad", "c"])
        assert "a" not in calls and "c" not in calls
        assert summary2["done"] == 2


class TestCohortBatching:
    def test_batch_claiming_runs_batches(self, tmp_path):
        """batch_size=2: items execute through batch_pipeline in claimed
        groups (2,2,1 for 5 items), all marked done with per-item results."""
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        batches = []

        def batch_pipeline(items):
            batches.append(list(items))
            return [{"ok": it} for it in items]

        runner = CohortRunner(
            lambda it: {"ok": it},
            manifest_path=tmp_path / "m.json",
            verbose=False,
            batch_pipeline=batch_pipeline,
            batch_size=2,
        )
        summary = runner.run(["a", "b", "c", "d", "e"])
        assert summary == {"done": 5}
        # the leftover single item routes through the plain pipeline (a
        # 1-item "batch" would just add overhead), so batch_pipeline sees
        # exactly the two full batches
        assert sorted(len(b) for b in batches) == [2, 2]
        assert len(sum(batches, [])) == 4
        for k in "abcde":
            assert runner.manifest.items[k]["result"] == {"ok": k}

    def test_batch_failure_falls_back_to_items(self, tmp_path):
        """A poisoned batch re-runs item-by-item so only the bad item
        fails."""
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        def batch_pipeline(items):
            if "bad" in items:
                raise ValueError("poisoned batch")
            return [{"ok": it} for it in items]

        def single(item):
            if item == "bad":
                raise ValueError("boom")
            return {"ok": item}

        runner = CohortRunner(
            single,
            manifest_path=tmp_path / "m.json",
            max_retries=0,
            verbose=False,
            batch_pipeline=batch_pipeline,
            batch_size=4,
        )
        summary = runner.run(["a", "bad", "c"])
        assert summary == {"done": 2, "failed": 1}

    def test_batch_size_requires_pipeline(self, tmp_path):
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        import pytest as _pytest

        with _pytest.raises(ValueError, match="batch_pipeline"):
            CohortRunner(
                lambda it: {}, manifest_path=tmp_path / "m.json", batch_size=2
            )


class TestDynamicCohort:
    def test_dead_worker_claim_stolen(self, tmp_path):
        """A worker that died mid-item (stale claim) must not strand its
        share: the survivor steals the item after claim_ttl and completes
        the cohort without double-processing finished work."""
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        manifest = tmp_path / "m.json"
        # host 0 completed "a", then died while holding a claim on "b"
        r0 = CohortRunner(
            lambda it: {"ok": it}, manifest_path=manifest,
            host=0, n_hosts=2, verbose=False,
        )
        r0._run_item("a", "a")
        r0.manifest.mark("b", "claim", claim_host=0, attempts=0)

        processed = []

        def pipe(item):
            processed.append(item)
            return {"ok": item}

        r1 = CohortRunner(
            pipe, manifest_path=manifest, host=1, n_hosts=2, verbose=False,
            claim_ttl=0.3, poll_seconds=0.05,
        )
        summary = r1.run(["a", "b", "c"])
        assert summary.get("done") == 3
        assert sorted(processed) == ["b", "c"]  # "a" never re-run, "b" stolen once

    def test_dynamic_single_host_drains_everything(self, tmp_path):
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        calls = []
        runner = CohortRunner(
            lambda it: calls.append(it) or {"ok": it},
            manifest_path=tmp_path / "m.json", verbose=False,
        )
        summary = runner.run(["x", "y", "z"])
        assert summary == {"done": 3}
        assert calls == ["x", "y", "z"]
        # machine-readable run summary written next to the manifest
        s = json.loads((tmp_path / "m.json.summary.json").read_text())
        assert s["counts"] == {"done": 3}
        assert s["n_items"] == 3 and s["scheduling"] == "dynamic"

    def test_fresh_claim_not_stolen(self, tmp_path):
        """An item freshly claimed by a live host is left alone until ttl."""
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        manifest = tmp_path / "m.json"
        r0 = CohortRunner(
            lambda it: {"ok": it}, manifest_path=manifest,
            host=0, n_hosts=2, verbose=False,
        )
        r0.manifest.mark("slow", "claim", claim_host=0, attempts=0)
        r0._run_item("other", "other")

        seen = []
        r1 = CohortRunner(
            lambda it: seen.append(it) or {"ok": it},
            manifest_path=manifest, host=1, n_hosts=2, verbose=False,
            claim_ttl=60.0, poll_seconds=0.01,
        )
        # "slow" is claimed-fresh; r1 must finish "mine", then wait — emulate
        # host 0 completing "slow" from another thread
        import threading
        import time

        def finish_slow():
            time.sleep(0.2)
            r0._run_item("slow", "slow")

        t = threading.Thread(target=finish_slow)
        t.start()
        summary = r1.run(["slow", "other", "mine"])
        t.join()
        assert summary.get("done") == 3
        assert seen == ["mine"]

    def test_heartbeat_keeps_slow_item_claimed(self, tmp_path):
        """An item slower than claim_ttl is NOT stolen while its host is
        alive: the claim-heartbeat thread keeps the claim fresh (the Dask
        worker-liveness signal), so at-least-once never degrades to
        double-processing for merely-slow work."""
        import threading
        import time

        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        manifest = tmp_path / "m.json"
        runs = {"h0": [], "h1": []}

        def slow_pipe(item):
            runs["h0"].append(item)
            time.sleep(1.0)  # >> claim_ttl
            return {"ok": item}

        r0 = CohortRunner(
            slow_pipe, manifest_path=manifest, host=0, n_hosts=2,
            verbose=False, claim_ttl=0.3, claim_heartbeat=0.05,
            poll_seconds=0.05,
        )
        t0 = threading.Thread(target=lambda: r0.run(["slow"]))
        t0.start()
        time.sleep(0.45)  # host 0's ORIGINAL claim is now past ttl

        r1 = CohortRunner(
            lambda it: runs["h1"].append(it) or {"ok": it},
            manifest_path=manifest, host=1, n_hosts=2, verbose=False,
            claim_ttl=0.3, claim_heartbeat=0.05, poll_seconds=0.05,
        )
        summary = r1.run(["slow"])
        t0.join()
        assert summary.get("done") == 1
        assert runs["h0"] == ["slow"] and runs["h1"] == []  # never stolen

    def test_failed_item_retries_and_terminates(self, tmp_path):
        """A transiently-failing item must be retried up to max_retries and
        the run must TERMINATE. Regression: the claim-winner check compared
        the exact (time, host) record, so the host's own earlier fresh claim
        always outranked its re-claim and the retry loop spun forever."""
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        calls = {"flaky": 0, "good": 0, "poison": 0}

        def pipe(item):
            calls[item] += 1
            if item == "poison" or (item == "flaky" and calls[item] == 1):
                raise RuntimeError("transient")
            return {"ok": item}

        runner = CohortRunner(
            pipe, manifest_path=tmp_path / "m.json", verbose=False,
            max_retries=1, claim_ttl=60.0, claim_settle=0.01,
            poll_seconds=0.02, claim_heartbeat=0,
        )
        summary = runner.run(["flaky", "good", "poison"], keys=None)
        # flaky: fail once then succeed; poison: exhausted after 2 attempts
        assert calls["flaky"] == 2 and calls["poison"] == 2
        assert summary.get("done") == 2 and summary.get("failed") == 1
        rec = runner.manifest.items["poison"]
        assert rec["status"] == "failed" and rec["attempts"] == 2
        assert "transient" in rec["error"]

    def test_prepare_prefetch_overlaps_and_feeds_pipeline(self, tmp_path):
        """With prepare= set, the pipeline receives prepared values, every
        item is prepared (ahead when possible), and prepare failures are
        isolated per item like pipeline failures."""
        import threading

        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        prepared, got = [], []
        prep_thread_ids = []

        def prepare(item):
            prep_thread_ids.append(threading.get_ident())
            if item == "badread":
                raise IOError("corrupt volume")
            prepared.append(item)
            return f"decoded:{item}"

        def pipe(value):
            got.append(value)
            return {"v": value}

        runner = CohortRunner(
            pipe, manifest_path=tmp_path / "m.json", verbose=False,
            prepare=prepare, prefetch_depth=2, max_retries=0,
            claim_settle=0.0,
        )
        summary = runner.run(["a", "b", "badread", "c"])
        assert summary.get("done") == 3 and summary.get("failed") == 1
        assert got == ["decoded:a", "decoded:b", "decoded:c"]
        assert "corrupt volume" in runner.manifest.items["badread"]["error"]
        # prefetch ran off the main thread for at least some items
        assert any(t != threading.get_ident() for t in prep_thread_ids)

    def test_prepare_with_batch_pipeline(self, tmp_path):
        """prepare= composes with batch_pipeline: batches receive prepared
        values, in claim order."""
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        batches = []

        def batch_pipe(items):
            batches.append(list(items))
            return [{"v": it} for it in items]

        runner = CohortRunner(
            lambda it: {"v": it}, manifest_path=tmp_path / "m.json",
            verbose=False, prepare=lambda p: f"img:{p}", prefetch_depth=2,
            batch_pipeline=batch_pipe, batch_size=2, claim_settle=0.0,
        )
        summary = runner.run(["a", "b", "c", "d"])
        assert summary == {"done": 4}
        assert batches == [["img:a", "img:b"], ["img:c", "img:d"]]

    def test_terminal_record_beats_later_claim(self, tmp_path):
        """Merge rule: a done record wins over a LATER claim record (a
        heartbeat racing the item's completion must not mask it)."""
        from oai_analysis_2_tpu.parallel.cohort import CohortManifest

        path = tmp_path / "m.json"
        m = CohortManifest.open(path, host=0)
        m.mark("x", "done", seconds=1.0)
        m.mark("x", "claim", claim_host=0)  # stray heartbeat after done
        assert m.items["x"]["status"] == "done"  # in-memory view
        merged = CohortManifest.open(path)  # re-read from disk
        assert merged.items["x"]["status"] == "done"


class TestSampler:
    def test_balanced_patch_sampler(self):
        from oai_analysis_2_tpu.engine.sampling import BalancedPatchSampler

        rng = np.random.default_rng(0)
        vol = rng.uniform(0, 1, (20, 30, 30)).astype(np.float32)
        lab = np.zeros((20, 30, 30, 2), np.float32)
        lab[8:12, 10:20, 10:20, 0] = 1.0
        sampler = BalancedPatchSampler(
            [vol], [lab], patch_size_zyx=(8, 16, 16), batch_size=4,
            foreground_fraction=1.0,
        )
        imgs, segs = next(sampler)
        assert imgs.shape == (4, 8, 16, 16, 1)
        assert segs.shape == (4, 8, 16, 16, 2)
        # all foreground-centered patches contain foreground
        assert all(segs[i].sum() > 0 for i in range(4))

    def test_sampler_trains(self):
        import jax
        import optax

        from oai_analysis_2_tpu.engine.sampling import BalancedPatchSampler
        from oai_analysis_2_tpu.engine.training import train_segmentation
        from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D

        rng = np.random.default_rng(1)
        vol = rng.uniform(0, 1, (8, 16, 16)).astype(np.float32)
        lab = np.zeros((8, 16, 16, 2), np.float32)
        lab[:, 4:12, 4:12, 0] = 1.0
        sampler = BalancedPatchSampler([vol], [lab], (4, 8, 8), batch_size=2)
        model = UNet3D(NETWORK_SPECS["UNet_light4"])
        params, _, losses = train_segmentation(
            model, iter(sampler), num_steps=4, learning_rate=1e-2
        )
        assert np.isfinite(losses).all()


class TestClaimSettleCalibration:
    def test_auto_settle_in_bounds(self, tmp_path):
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        r = CohortRunner(lambda it: {}, manifest_path=tmp_path / "m.json",
                         verbose=False)  # claim_settle defaults to "auto"
        assert 0.1 <= r.claim_settle <= 2.0
        # Local tmpfs/disk probes land on (or near) the floor. The probe
        # takes worst-of-3 fsync latencies x20, so a single contended fsync
        # (co-running benchmark, CI noise) can legitimately push one
        # construction over 1 s — take the best of a few constructions so
        # the test asserts the filesystem's floor, not the machine's load.
        best = r.claim_settle
        for _ in range(4):
            if best < 1.0:
                break
            best = min(best, CohortRunner(
                lambda it: {}, manifest_path=tmp_path / "m.json",
                verbose=False).claim_settle)
        assert best < 1.0
        # no probe residue in the manifest directory
        assert not list(tmp_path.glob(".settle_probe_*"))

    def test_explicit_settle_respected(self, tmp_path):
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        r = CohortRunner(lambda it: {}, manifest_path=tmp_path / "m.json",
                         verbose=False, claim_settle=0.25)
        assert r.claim_settle == 0.25


class TestHostInfoFallbackChain:
    def test_tunnel_without_backend_returns_single_host(self, monkeypatch):
        """Under the single-chip tunnel with no backend up, _host_info must
        not instantiate a device client (which can block indefinitely)."""
        from oai_analysis_2_tpu.parallel import cohort

        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        import jax
        from jax._src import xla_bridge

        monkeypatch.setattr(xla_bridge, "_backends", {}, raising=False)
        calls = []
        monkeypatch.setattr(jax, "process_index", lambda: calls.append(1) or 0)
        assert cohort._host_info() == (0, 1)
        assert not calls  # never queried -> never instantiated a client

    def test_distributed_initialized_uses_public_api(self, monkeypatch):
        from oai_analysis_2_tpu.parallel import cohort

        import jax

        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
        monkeypatch.setattr(jax, "process_index", lambda: 3)
        monkeypatch.setattr(jax, "process_count", lambda: 8)
        assert cohort._host_info() == (3, 8)

    def test_private_attr_drift_bounded_query(self, monkeypatch):
        """If jax._src.xla_bridge._backends disappears, the chain falls back
        to a bounded-timeout query rather than a hang or a blind (0, 1)."""
        from oai_analysis_2_tpu.parallel import cohort

        import jax
        from jax._src import xla_bridge

        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        monkeypatch.delattr(xla_bridge, "_backends", raising=False)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        assert cohort._host_info() == (1, 4)
