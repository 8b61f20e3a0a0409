"""Knee-batched multi-chip inference — the production scale-out path.

The reference fans a cohort across GPU workers by shipping pickled tasks
through Dask's TCP scheduler (dask_processing.py:126-189,
DaskComputationCoiled.ipynb cells 2-3: 6 cloud GPU workers). The TPU-native
equivalent is ONE jitted SPMD program over a `jax.sharding.Mesh`: a batch of
B knees is sharded over the mesh's data axis, and every per-knee stage —
percentile windowing, overlap-tiled UNet segmentation, GradICON registration
against the shared atlas (network forward + per-pair fine-tuning, or full
instance optimization), and the probability-map warp onto the atlas grid —
runs batched under one `vmap`, so XLA partitions the whole pipeline across
chips with no host round-trips in between.

Geometry requirement: all knees in a batch share volume shape and physical
metadata (true for OAI DESS cohorts — one scan protocol); the atlas is
shared. Thickness extraction stays per-knee on the host side of the fence
(meshes are data-dependent), fed from the batched device outputs.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from oai_analysis_2_tpu.core.image import Image, physical_grid
from oai_analysis_2_tpu.engine.pipeline import KneeResult
from oai_analysis_2_tpu.engine.registration import (
    ICON_Registration,
    _net_grid_reference,
    _normalized_to_physical,
)
from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise
from oai_analysis_2_tpu.models.gradicon import (
    GradICONConfig,
    INSTANCE_DEFAULT_LR,
    INSTANCE_DEFAULT_SIMILARITY,
    _scale_run_fn,
    downsample2x,
    identity_map,
    resize_field,
)
from oai_analysis_2_tpu.ops.resample import (
    DisplacementField,
    _separable_resize_weights,
    _trilinear_gather,
    _upsample_field_separable,
    sample_displacement,
)
from oai_analysis_2_tpu.utils.profiling import StageTimer


def _pyramid(vol: jax.Array, scale: int) -> jax.Array:
    out = vol
    for _ in range(int.bit_length(int(scale)) - 1):
        out = downsample2x(out)
    return out


class BatchKneePipeline:
    """segment + register + warp for B knees in one sharded program, plus
    per-knee thickness meshes on the host side.

    `mesh` is a `jax.sharding.Mesh` (any axis layout; devices are flattened
    onto one `data` axis). With mesh=None the program runs unsharded on the
    default device — the measured single-chip baseline of the same graph.
    """

    def __init__(
        self,
        segmenter: Segmenter3DInPatchClassWise,
        atlas_image: Image,
        mesh: Optional[Mesh] = None,
        registration_config: Optional[GradICONConfig] = None,
        registration_mode: str = "auto",
        instance_scales: Tuple[int, ...] = (4, 2, 1),
        instance_steps=(80, 60, 40),
        finetune_steps: int = 0,
        finetune_scales: Tuple[int, ...] = (2,),
        finetune_lr: float = 0.15,
        lambda_reg: float = 0.5,
        diffusion_weight: float = 0.3,
        normalize: bool = True,
        warp_dtype: str = "float32",
        max_batch_per_device: int = 2,
    ):
        """max_batch_per_device: cap on knees resident per chip in one
        device program — the batched segmenter's live set (padded volumes +
        a (B*batch_size)-tile conv batch + canvases) scales with the
        PER-CHIP knee count, and >2 production knees overflows a 16 GB v5e
        chip (measured: B=8 unsharded wants 36.7 GB). Bigger batches are
        chunked; on an n-chip mesh the effective chunk is
        max_batch_per_device * n_chips (each chip holds its own share)."""
        if warp_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"warp_dtype must be 'float32' or 'bfloat16', got {warp_dtype!r}"
            )
        self.segmenter = segmenter
        self.atlas = atlas_image
        self.mesh = mesh
        self.instance_scales = tuple(instance_scales)
        self.instance_steps = instance_steps
        self.finetune_steps = finetune_steps
        self.finetune_scales = tuple(finetune_scales)
        self.finetune_lr = finetune_lr
        self.lambda_reg = lambda_reg
        self.diffusion_weight = diffusion_weight
        self.normalize = normalize
        self.warp_dtype = warp_dtype
        self.max_batch_per_device = max(int(max_batch_per_device), 1)
        # mode resolution + weight loading exactly like the single pipeline
        # (config=None adopts the shipped checkpoint's recorded architecture)
        self.registerer = ICON_Registration(
            mode=registration_mode,
            config=registration_config,
            instance_steps=instance_steps,
            instance_scales=instance_scales,
            finetune_steps=finetune_steps,
            finetune_scales=finetune_scales,
            finetune_lr=finetune_lr,
        )
        self.reg_config = self.registerer.config  # possibly checkpoint-adapted
        self._programs: dict = {}

    # -- program construction ---------------------------------------------------

    @property
    def n_devices(self) -> int:
        return int(self.mesh.devices.size) if self.mesh is not None else 1

    def _meta_key(self, image: Image) -> tuple:
        return (
            tuple(image.data.shape),
            np.asarray(image.origin).tobytes(),
            np.asarray(image.spacing).tobytes(),
            np.asarray(image.direction).tobytes(),
        )

    def _register_one_fn(self):
        """The pure per-knee registration program: (reg_params, a, b) ->
        (phi_ab, phi_ba) normalized coordinate maps on the net grid."""
        cfg = self.reg_config
        full_shape = tuple(cfg.grid_shape)
        mode = self.registerer.mode
        model = self.registerer.model

        if mode == "network":
            if self.registerer.params is None:
                raise ValueError(
                    "network-mode batch registration without weights: call "
                    "registerer.load_params() or ship weights/gradicon.npz "
                    "(same guard as engine.registration.register_pair)"
                )
            scales = self.finetune_scales if self.finetune_steps else ()
            steps = [self.finetune_steps] * len(scales)
            lr = self.finetune_lr
        else:
            scales = self.instance_scales
            steps = (
                [self.instance_steps] * len(scales)
                if isinstance(self.instance_steps, int)
                else list(self.instance_steps)
            )
            lr = INSTANCE_DEFAULT_LR

        def register_one(reg_params, a, b):
            if mode == "network":
                phi_ab, phi_ba = model.both_maps(reg_params, a, b)
            else:
                phi_ab = phi_ba = identity_map(full_shape)
            for scale, n_steps in zip(scales, steps):
                a_s, b_s = _pyramid(a, scale), _pyramid(b, scale)
                run, _ = _scale_run_fn(
                    tuple(a_s.shape),
                    full_shape,
                    int(n_steps),
                    float(lr),
                    int(cfg.lncc_window),
                    INSTANCE_DEFAULT_SIMILARITY,
                    float(self.lambda_reg),
                    float(self.diffusion_weight),
                )
                base_ab = resize_field(phi_ab, a_s.shape)
                base_ba = resize_field(phi_ba, a_s.shape)
                phi_ab, phi_ba = run(base_ab, base_ba, a_s, b_s)
            return phi_ab, phi_ba

        return register_one

    def _batched_fn(self, template: Image, n_knees: int):
        """Build (and cache) the jitted sharded B-knee program for the
        template's shape+geometry and padded batch size."""
        key = self._meta_key(template) + (n_knees,)
        if key in self._programs:
            return self._programs[key]

        seg = self.segmenter
        if not seg.ready:
            seg.pred_setup()
        cfg = self.reg_config
        vol_shape = tuple(template.data.shape)
        # knee axis = plain conv batch dim (NOT vmap): per-knee cost then
        # matches the single-knee program (vmap re-laid-out the convs,
        # measured 1.7-2.4x slower), and the dim shards over the mesh
        seg_fn = seg.volume_fn_batched(
            n_knees, vol_shape, int(seg.config.get("batch_size", 4)), threshold=False
        )

        # shared geometry, computed once on host at build time ------------------
        grid_a = _net_grid_reference(template, cfg.grid_shape)
        grid_b = _net_grid_reference(self.atlas, cfg.grid_shape)

        def grid_to_idx(grid: Image, img: Image) -> jax.Array:
            pts = physical_grid(grid.data.shape, grid.origin, grid.spacing, grid.direction)
            return jnp.asarray(np.asarray(img.physical_to_indices(pts))[..., ::-1])

        idx_a = grid_to_idx(grid_a, template)  # net-grid voxel -> knee zyx index
        idx_b = grid_to_idx(grid_b, self.atlas)
        p_b = jnp.asarray(
            np.asarray(_normalized_to_physical(grid_b, identity_map(cfg.grid_shape)))
        )
        # separable MXU upsample of the displacement field when the atlas and
        # field grids are axis-aligned (every real OAI case)
        dummy = DisplacementField(
            field=jnp.zeros(tuple(cfg.grid_shape) + (3,), jnp.float32),
            origin=grid_b.origin,
            spacing=grid_b.spacing,
            direction=grid_b.direction,
        )
        sep_weights = _separable_resize_weights(dummy, self.atlas)

        register_one = self._register_one_fn()
        atlas_shape = tuple(self.atlas.data.shape)
        normalize = self.normalize
        wdt = jnp.bfloat16 if self.warp_dtype == "bfloat16" else jnp.float32

        # STAGED programs (window -> segment -> register+warp), mirroring the
        # single-knee pipeline's program structure. One fused mega-jit was
        # measured 1.7-2.4x slower per knee at production scale (XLA
        # scheduling/layout of the combined graph); as separate programs each
        # stage compiles exactly like its single-knee counterpart, and the
        # intermediates stay on device between calls.

        def window_fn(knees):
            def window(knee):
                lo = jnp.percentile(knee, 0.1)
                hi = jnp.percentile(knee, 99.9)
                return jnp.clip((knee - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0)

            return jax.vmap(window)(knees)

        def reg_warp_fn(reg_params, pre, maps):
            atlas_f32 = self.atlas.data.astype(jnp.float32)
            b = _trilinear_gather(atlas_f32, idx_b, 0.0)
            pts_atlas = physical_grid(
                atlas_shape, self.atlas.origin, self.atlas.spacing, self.atlas.direction
            )

            def reg_warp(pre_k, maps_k):
                a = _trilinear_gather(pre_k, idx_a, 0.0)
                _, phi_ba = register_one(reg_params, a, b)
                disp = (_normalized_to_physical(grid_a, phi_ba) - p_b).astype(
                    jnp.float32
                )  # physical displacement on grid_b

                if sep_weights is not None:
                    up = _upsample_field_separable(disp, *sep_weights)
                else:
                    up = sample_displacement(
                        dataclasses.replace(dummy, field=disp), pts_atlas
                    )
                pts = pts_atlas + up
                idx_knee = template.physical_to_indices(pts)[..., ::-1]
                stacked = jnp.moveaxis(maps_k, 0, -1).astype(wdt)  # (D,H,W,C)
                warped = _trilinear_gather(stacked, idx_knee, 0.0).astype(jnp.float32)
                return warped, disp

            # lax.map, NOT vmap: each chip registers its local knees
            # SEQUENTIALLY with the exact single-knee program (vmap re-lays
            # out the stage-UNet convs: measured 1.5x per-knee at B=2), and
            # sequential per-knee peaks, not sums, the warp's index/gather
            # intermediates (~1.7 GB each at production scale)
            return jax.lax.map(lambda ab: reg_warp(ab[0], ab[1]), (pre, maps))

        if self.mesh is not None:
            try:
                from jax import shard_map  # jax >= 0.8
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            flat = Mesh(self.mesh.devices.reshape(-1), ("data",))
            rep = NamedSharding(flat, P())
            data = NamedSharding(flat, P("data"))
            # shard_map: each chip lax.maps over ITS OWN knees — a global
            # lax.map over a sharded axis would run the scan's iterations
            # sequentially across the whole mesh (chips idle in turn)
            reg_warp_sharded = shard_map(
                reg_warp_fn, mesh=flat,
                in_specs=(P(), P("data"), P("data")),
                out_specs=P("data"),
            )
            stages = (
                jax.jit(window_fn, in_shardings=(data,), out_shardings=data),
                jax.jit(seg_fn, in_shardings=(rep, data), out_shardings=data),
                jax.jit(reg_warp_sharded, in_shardings=(rep, data, data), out_shardings=data),
            )
            program = (stages, flat)
        else:
            stages = (jax.jit(window_fn), jax.jit(seg_fn), jax.jit(reg_warp_fn))
            program = (stages, None)
        self._programs[key] = program
        return program

    # -- execution ---------------------------------------------------------------

    def run_device_batch(self, images: Sequence[Image]):
        """The device part only: (B knees) -> (warped (B,Da,Ha,Wa,C) numpy,
        disp (B,gz,gy,gx,3) numpy). Pads the batch to a multiple of the mesh
        size; padding knees are dropped from the output."""
        warped, disp = self._run_device_batch_dev(images)
        return np.asarray(warped), np.asarray(disp)

    def _run_device_batch_dev(self, images: Sequence[Image]):
        """Like run_device_batch but returns DEVICE arrays, blocking until
        they are ready."""
        warped, disp = self._dispatch_device_batch(images)
        jax.block_until_ready(warped)
        return warped, disp

    def _dispatch_device_batch(self, images: Sequence[Image]):
        """Dispatch the device stages for a batch WITHOUT blocking on the
        result (JAX dispatch is async): returns (warped, disp) device
        arrays still being computed. Downstream thickness consumes the
        warped probmaps on device (marching cubes is device-side), so
        materializing them on host would move B x 160x384x384 x C floats
        over the wire for nothing — measured 4x the entire device
        pipeline's cost on the TPU tunnel. The async dispatch is what lets
        `run_batches` overlap batch k's host-side mesh bookkeeping with
        batch k+1's device compute."""
        if not images:
            # correctly-RANKED empties per the documented output contract
            if not self.segmenter.ready:
                self.segmenter.pred_setup()
            c = self.segmenter.model.spec.n_classes
            return (
                jnp.zeros((0,) + tuple(self.atlas.data.shape) + (c,)),
                jnp.zeros((0,) + tuple(self.reg_config.grid_shape) + (3,)),
            )
        chunk = self.max_batch_per_device * self.n_devices
        if len(images) > chunk:
            outs = [
                self._dispatch_device_batch(images[i : i + chunk])
                for i in range(0, len(images), chunk)
            ]
            return (
                jnp.concatenate([w for w, _ in outs]),
                jnp.concatenate([d for _, d in outs]),
            )
        metas = {self._meta_key(im) for im in images}
        if len(metas) != 1:
            raise ValueError(
                "all knees in a batch must share volume shape and physical "
                f"metadata; got {len(metas)} distinct geometries"
            )
        template = images[0]
        n_dev = self.n_devices
        n = len(images)
        pad = (-n) % n_dev
        (window_j, seg_j, reg_warp_j), flat = self._batched_fn(template, n + pad)
        if all(isinstance(im.data, jax.Array) for im in images):
            # device-resident inputs (e.g. a pipeline feeding warm volumes):
            # stack ON DEVICE — np.asarray here would round-trip every knee
            # through the host (2 x 94 MB each at production scale, measured
            # as the whole batch-vs-single efficiency gap on the TPU tunnel)
            knees = jnp.stack(
                [im.data.astype(jnp.float32) for im in images]
                + [jnp.zeros(template.data.shape, jnp.float32)] * pad
            )
        else:
            knees = jnp.asarray(
                np.stack(
                    [np.asarray(im.data, np.float32) for im in images]
                    + [np.zeros(template.data.shape, np.float32)] * pad
                )
            )
        if flat is not None:
            knees = jax.device_put(knees, NamedSharding(flat, P("data")))
        seg_params = self.segmenter.params
        reg_params = self.registerer.params if self.registerer.mode == "network" else ()
        pre = window_j(knees) if self.normalize else knees
        maps = seg_j(seg_params, pre)
        warped, disp = reg_warp_j(reg_params, pre, maps)
        return warped[:n], disp[:n]

    def run_batch(self, images: Sequence[Image], compute_thickness: bool = True
                  ) -> List[KneeResult]:
        """Full batch: device pipeline + per-knee thickness meshes."""
        timer = StageTimer()
        with timer.stage("device_batch"):
            warped, _ = self._run_device_batch_dev(images)
        return self._finish_batch(images, warped, compute_thickness, timer)

    def run_batches(
        self, batches: Sequence[Sequence[Image]], compute_thickness: bool = True
    ) -> List[List[KneeResult]]:
        """Software-pipelined multi-batch execution: batch k+1's device
        stages are DISPATCHED (async) before batch k's thickness meshes are
        harvested, so the host-side mesh bookkeeping of one batch overlaps
        the device compute of the next — the cohort-loop analogue of the
        reference's Dask workers overlapping transfer with compute
        (dask_processing.py:46-189). Results are identical to calling
        `run_batch` per batch, in order."""
        batches = [list(b) for b in batches]
        out: List[List[KneeResult]] = []
        pending = None  # (images, warped, timer) of the previous batch
        for imgs in batches + [None]:
            if imgs is not None:
                timer = StageTimer()
                with timer.stage("device_dispatch"):
                    warped, _ = self._dispatch_device_batch(imgs)
                nxt = (imgs, warped, timer)
            else:
                nxt = None
            if pending is not None:
                p_imgs, p_warped, p_timer = pending
                with p_timer.stage("device_batch"):
                    jax.block_until_ready(p_warped)
                out.append(
                    self._finish_batch(p_imgs, p_warped, compute_thickness, p_timer)
                )
            pending = nxt
        return out

    def _finish_batch(
        self, images: Sequence[Image], warped, compute_thickness: bool,
        timer: StageTimer,
    ) -> List[KneeResult]:
        """Host-side tail of a batch: wrap the warped maps and build the
        per-knee thickness meshes."""
        from oai_analysis_2_tpu.mesh.processing import get_thickness_meshes

        probmaps = []
        for i in range(len(images)):
            fc = Image(
                data=warped[i, ..., 0],
                origin=self.atlas.origin,
                spacing=self.atlas.spacing,
                direction=self.atlas.direction,
            )
            probmaps.append((fc, fc.with_data(warped[i, ..., 1])))
        if compute_thickness:
            # ONE thickness call for the whole batch: all 2B tissue maps share
            # the atlas grid, so marching-cubes counts run in one device pass
            # and the 150-iteration Laplacian loop smooths every mesh as one
            # disjoint union — per-knee serial thickness is what stops a
            # B-knee batch from scaling (device stages shard; host-side
            # per-knee loops do not)
            # one knee's FC+TC per smoothing group: the vmapped group loop's
            # leading axis shards over the data mesh, so each chip smooths
            # its own knees' meshes (no collectives; see smooth_mesh_groups)
            smooth_sharding = None
            distance_devices = None
            if self.mesh is not None and len(images) % self.n_devices == 0:
                flat_devs = self.mesh.devices.reshape(-1)
                flat = Mesh(flat_devs, ("data",))
                smooth_sharding = NamedSharding(flat, P("data"))
                # knee i's FC+TC distance kernels run on chip i (committed-
                # input placement) — knee-parallel like the grouped smoothing
                distance_devices = [
                    flat_devs[(t // 2) % len(flat_devs)]
                    for t in range(2 * len(images))
                ]
            sub = {}
            with timer.stage("thickness_batch"):
                pairs = get_thickness_meshes(
                    [m for fc, tc in probmaps for m in (fc, tc)],
                    ["FC", "TC"] * len(images),
                    group_size=2,
                    smooth_sharding=smooth_sharding,
                    distance_devices=distance_devices,
                    # knee i's MC passes run on chip i, like its distance
                    # kernels — the extraction substage sharded per knee
                    mc_devices=distance_devices,
                    timings_out=sub,
                )
            # surface the substage split: "smooth" is the grouped vmapped
            # loop whose leading (per-knee) axis shards over the data mesh,
            # so bench's multi-chip projection may divide it by chip count
            for name, secs in sub.items():
                timer.totals[f"thickness_{name}"] += secs
                timer.counts[f"thickness_{name}"] += 1
        else:
            pairs = [(None, None)] * (2 * len(images))
        results = []
        for i, (fc, tc) in enumerate(probmaps):
            (fci, fco), (tci, tco) = pairs[2 * i], pairs[2 * i + 1]
            results.append(
                KneeResult(
                    fc_probmap=fc, tc_probmap=tc,
                    fc_inner=fci, fc_outer=fco, tc_inner=tci, tc_outer=tco,
                    timings=timer.report(),
                )
            )
        return results
