"""Registration engine — physical-space facade over the GradICON models.

Replaces the reference's `ICON_Registration` (oai_analysis/registration.py:18-27)
and `icon_registration.itk_wrapper.register_pair`: images are resampled onto a
fixed registration grid, registered with either a trained GradICON network or
instance optimization, and the result is returned as a physical-space
`DisplacementField` consumable by `ops.resample.resample_image` — exactly how
the reference consumes `phi_AB` via `itk.resample_image_filter`
(dask_processing.py:95-111, test/test_all.py:43-51).

Contract (matching the reference's usage): `register(image_A, image_B)`
returns the transform mapping image_B-space physical points into image_A
space, i.e. the pullback for warping A-grid data (probability maps) onto
B's (atlas) grid.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from oai_analysis_2_tpu.core.image import Image
from oai_analysis_2_tpu.models.gradicon import (
    GradICON,
    GradICONConfig,
    identity_map,
    register_pair_instance,
)
from oai_analysis_2_tpu.ops.resample import DisplacementField, resample_image


def _net_grid_reference(image: Image, grid_shape_zyx) -> Image:
    """An Image describing the registration grid over `image`'s physical
    extent: same origin/direction, spacing scaled so grid corners coincide
    with the source volume's corners."""
    src = np.asarray(image.data.shape, np.float64)  # z,y,x
    dst = np.asarray(grid_shape_zyx, np.float64)
    spacing_zyx = np.asarray(image.spacing)[::-1] * (src - 1.0) / (dst - 1.0)
    return Image(
        data=jnp.zeros(tuple(int(s) for s in grid_shape_zyx), jnp.float32),
        origin=image.origin,
        spacing=jnp.asarray(spacing_zyx[::-1].copy(), jnp.float32),
        direction=image.direction,
    )


def _normalized_to_physical(grid: Image, phi_zyx: jax.Array) -> jax.Array:
    """Map normalized [0,1]^3 zyx coordinate fields to physical points (xyz)."""
    shape = np.asarray(grid.data.shape, np.float32)
    idx_zyx = phi_zyx * jnp.asarray(shape - 1.0)
    idx_xyz = idx_zyx[..., ::-1]
    return grid.indices_to_physical(idx_xyz)


def _maps_to_displacement(
    phi_ba: jax.Array, grid_a: Image, grid_b: Image
) -> DisplacementField:
    """Turn the normalized map phi_BA (B-grid coords -> A-grid coords) into a
    physical-space displacement field on B's registration grid. The
    conversion is one jitted program per grid-geometry pair (eager op chains
    cost a dispatch round-trip each on the TPU tunnel)."""

    def meta(g: Image):
        return (
            tuple(g.data.shape),
            np.asarray(g.origin, np.float32).tobytes(),
            np.asarray(g.spacing, np.float32).tobytes(),
            np.asarray(g.direction, np.float32).tobytes(),
        )

    conv = _displacement_converter(meta(grid_a), meta(grid_b))
    return DisplacementField(
        field=conv(phi_ba),
        origin=grid_b.origin,
        spacing=grid_b.spacing,
        direction=grid_b.direction,
    )


@functools.lru_cache(maxsize=16)
def _displacement_converter(meta_a, meta_b):
    """Jitted phi_BA -> physical displacement-field program for one
    (grid_a, grid_b) geometry pair."""

    from oai_analysis_2_tpu.models.gradicon import _identity_map_np

    def rebuild(meta):
        # numpy data stand-in: only .shape is read inside conv, and host
        # constants are safe to capture in the cached jitted closure (a
        # device buffer here would pin ~MBs per cache entry for nothing)
        shape, origin, spacing, direction = meta
        return Image(
            data=np.zeros(shape, np.float32),
            origin=np.frombuffer(origin, np.float32).copy(),
            spacing=np.frombuffer(spacing, np.float32).copy(),
            direction=np.frombuffer(direction, np.float32).reshape(3, 3).copy(),
        )

    grid_a, grid_b = rebuild(meta_a), rebuild(meta_b)
    ident = _identity_map_np(meta_b[0])

    @jax.jit
    def conv(phi_ba):
        p_b = _normalized_to_physical(grid_b, jnp.asarray(ident))
        p_a = _normalized_to_physical(grid_a, phi_ba)
        return (p_a - p_b).astype(jnp.float32)

    return conv


def _jitted_both_maps(model: GradICON):
    """One jitted program for the network's two forward passes (per model
    instance — eager stage-by-stage dispatch over the TPU tunnel is pure
    overhead). Cached ON the model instance so the compiled program's
    lifetime is exactly the model's (a module-level id()-keyed dict pinned
    every model alive forever — an unbounded leak in many-config processes)."""
    import jax

    fn = getattr(model, "_jitted_both_maps", None)
    if fn is None:
        fn = jax.jit(model.both_maps)
        model._jitted_both_maps = fn
    return fn


def register_pair(
    image_a: Image,
    image_b: Image,
    model: Optional[GradICON] = None,
    params: Optional[List[dict]] = None,
    config: Optional[GradICONConfig] = None,
    instance_steps=(80, 60, 40),  # int or per-scale schedule
    instance_scales: Tuple[int, ...] = (4, 2, 1),
    lambda_reg: float = 0.5,
    diffusion_weight: float = 0.3,
    finetune_steps: int = 0,
    finetune_scales: Tuple[int, ...] = (2,),
    finetune_lr: float = 0.15,
    b_on_grid: Optional[jax.Array] = None,
    gicon_grad: Optional[str] = None,
    early_stop: Optional[float] = None,
    quality_out: Optional[dict] = None,
) -> Tuple[DisplacementField, DisplacementField]:
    """Register two physical-space images; returns (phi_AB, phi_BA) as
    displacement fields. phi_AB warps A-grid data onto B's grid (it maps
    B-space points into A space) — mirroring the reference's return
    convention where `register_pair(model, A, B)[0]` feeds
    `resample(prob_on_A, output_grid=B)`.

    With model+params: one trained-network forward pass (the reference's
    pretrained path, registration.py:20-27), optionally refined by
    `finetune_steps` of instance optimization per scale in `finetune_scales`
    (icon_registration's finetune_steps equivalent).

    b_on_grid: image_b already resampled onto its registration grid —
    ICON_Registration caches this for its fixed atlas so repeated
    registrations (the cohort case) skip one full resample per knee.

    gicon_grad: GradICON-penalty gradient mode for the instance/fine-tune
    steps ("exact" | "alternating"); None = the package default
    (models.gradicon.INSTANCE_DEFAULT_GICON_GRAD).

    early_stop: plateau tolerance for the instance/fine-tune loops (None =
    fixed step counts); see models.gradicon.register_pair_instance.

    quality_out: a dict to receive per-registration quality signals
    (models.gradicon.map_quality_stats): inverse-consistency error in
    voxels and mm (via the A-grid spacing) and the folded-Jacobian
    fraction of each map. Values are filled as DEVICE scalars — callers
    float() them when convenient so the metric never adds a tunnel sync
    to the registration hot path."""
    from oai_analysis_2_tpu.models.gradicon import INSTANCE_DEFAULT_GICON_GRAD

    gicon_grad = INSTANCE_DEFAULT_GICON_GRAD if gicon_grad is None else gicon_grad
    cfg = config or GradICONConfig()
    grid_a = _net_grid_reference(image_a, cfg.grid_shape)
    grid_b = _net_grid_reference(image_b, cfg.grid_shape)
    a = resample_image(image_a, grid_a).data.astype(jnp.float32)
    if b_on_grid is not None:
        b = b_on_grid
    else:
        b = resample_image(image_b, grid_b).data.astype(jnp.float32)

    if model is not None:
        if params is None:
            raise ValueError(
                "network-mode registration without weights: call load_params() "
                "or pass params (round-1 silently fell back to instance mode)"
            )
        # Trained-network path: phi_ab warps B onto A's grid.
        nmap_ab, nmap_ba = _jitted_both_maps(model)(params, a, b)
        if finetune_steps:
            # refining a good network init needs far smaller steps than
            # cold-start instance optimization (lr 1.2 voxels/step WORSENS
            # the network's solution; 0.15 reliably improves it)
            nmap_ab, nmap_ba = register_pair_instance(
                a,
                b,
                scales=finetune_scales,
                steps_per_scale=finetune_steps,
                lr=finetune_lr,
                lncc_window=cfg.lncc_window,
                lambda_reg=lambda_reg,
                diffusion_weight=diffusion_weight,
                init_ab=nmap_ab,
                init_ba=nmap_ba,
                gicon_grad=gicon_grad,
                early_stop=early_stop,
            )
    else:
        nmap_ab, nmap_ba = register_pair_instance(
            a,
            b,
            scales=instance_scales,
            steps_per_scale=instance_steps,
            lncc_window=cfg.lncc_window,
            lambda_reg=lambda_reg,
            diffusion_weight=diffusion_weight,
            gicon_grad=gicon_grad,
            early_stop=early_stop,
        )

    if quality_out is not None:
        from oai_analysis_2_tpu.models.gradicon import map_quality_stats

        q = map_quality_stats(nmap_ab, nmap_ba)
        # mm conversion: voxel-unit ICE x the mean A-grid voxel pitch (the
        # grids are isotropic per axis; a per-axis exact norm would need the
        # per-axis error vector — mean pitch is the standard reporting form)
        pitch = float(np.mean(np.asarray(grid_a.spacing)))
        quality_out.update(q)
        quality_out["ice_mean_mm"] = q["ice_mean_vox"] * pitch
        quality_out["ice_max_mm"] = q["ice_max_vox"] * pitch

    # nmap_ab: A-grid coords -> B-grid coords (pullback of B onto A).
    disp_ab_on_b = _maps_to_displacement(nmap_ba, grid_a, grid_b)
    disp_ba_on_a = _maps_to_displacement(nmap_ab, grid_b, grid_a)
    # Naming per reference convention: phi_AB is used to pull A-data onto B.
    return disp_ab_on_b, disp_ba_on_a


class ICON_Registration:
    """API-parity facade (reference registration.py:18-27).

    Modes:
      * "auto" (default): "network" when the shipped GradICON weights exist
        (models/gradicon.py:default_gradicon_weights_path — the TPU-native
        analog of the reference's pretrained download), else "instance";
      * "network": trained GradICON forward pass (+ optional instance
        fine-tuning steps); weights auto-load from the package, or inject
        via `load_params`. Registering without weights RAISES (round 1
        silently fell back to instance mode — a loaded footgun);
      * "instance": per-pair optimization, no weights needed.
    """

    def __init__(
        self,
        mode: str = "auto",
        config: Optional[GradICONConfig] = None,
        instance_steps=(80, 60, 40),  # int or per-scale schedule
        instance_scales: Tuple[int, ...] = (4, 2, 1),
        finetune_steps: int = 0,
        finetune_scales: Tuple[int, ...] = (2,),
        finetune_lr: float = 0.15,
        verbose: bool = False,
        gicon_grad: Optional[str] = None,
        early_stop: Optional[float] = None,
        collect_quality: bool = True,
    ):
        from oai_analysis_2_tpu.models.gradicon import (
            default_gradicon_weights_path,
            load_gradicon_params,
        )

        # With no explicit config, the shipped checkpoint's architecture
        # metadata (stage_width / grid_shape / scales, if recorded) defines
        # the default — so retrained weights at a different width or grid
        # plug in without code changes. An explicit config stays authoritative
        # (mismatched weights are then rejected and auto falls back to
        # instance mode).
        if config is None and mode in ("auto", "network"):
            config = self._config_from_shipped_meta()
        self.config = config or GradICONConfig()
        self.instance_steps = instance_steps
        self.instance_scales = instance_scales
        self.finetune_steps = finetune_steps
        self.finetune_scales = finetune_scales
        self.finetune_lr = finetune_lr
        self.verbose = verbose
        # GradICON gradient mode for instance/fine-tune steps ("exact" |
        # "alternating" | None = package default); see gradicon_penalty_alternating.
        self.gicon_grad = gicon_grad
        # plateau early-stop tolerance for instance/fine-tune steps (None =
        # fixed step counts); see models.gradicon._scale_run_fn early_stop
        self.early_stop = early_stop
        self.model: Optional[GradICON] = None
        self.params: Optional[List[dict]] = None
        # per-registration quality signals (folded-Jacobian fraction,
        # inverse-consistency error) — computed on-device inside register()
        # when collect_quality; read via `last_quality` (syncs the scalars)
        self.collect_quality = collect_quality
        self._last_quality_dev: Optional[dict] = None

        # the per-scale stage UNets (two 2x pools) need every grid dim
        # divisible by max_scale * 4; instance mode has no such constraint
        need = max(self.config.scales) * 4
        grid_ok = all(s % need == 0 for s in self.config.grid_shape)
        if mode == "auto":
            mode = (
                "network"
                if grid_ok and self._try_load_default(load_gradicon_params, default_gradicon_weights_path)
                else "instance"
            )
            if mode == "network":
                # The shipped weights are synthetic-phantom-trained (no OAI
                # data exists in this build environment); per VALIDATION.md
                # the network+finetune path trades some accuracy vs full
                # instance optimization for ~40x registration speed. Make
                # the silent default switch visible once per process.
                import warnings

                warnings.warn(
                    "registration mode 'auto' resolved to the shipped "
                    "synthetic-trained GradICON network (fast path; see "
                    "VALIDATION.md for accuracy vs instance optimization). "
                    "Pass mode='instance' for per-pair optimization.",
                    stacklevel=2,
                )
        self.mode = mode
        self._moving_on_grid_cache: dict = {}
        if mode == "network":
            if not grid_ok:
                raise ValueError(
                    f"network mode needs grid_shape divisible by {need}, got "
                    f"{self.config.grid_shape}"
                )
            self.model = GradICON(self.config)
            if self.params is None and default_gradicon_weights_path().exists():
                self.params = load_gradicon_params()
        elif mode != "instance":
            raise ValueError(f"unknown registration mode {mode!r}")

    @staticmethod
    def _config_from_shipped_meta() -> Optional[GradICONConfig]:
        """A GradICONConfig matching the shipped checkpoint's recorded
        architecture, or None (no weights / no metadata / unreadable)."""
        import dataclasses

        from oai_analysis_2_tpu.models.gradicon import (
            default_gradicon_weights_path,
            load_gradicon_checkpoint,
        )

        if not default_gradicon_weights_path().exists():
            return None
        try:
            _, meta = load_gradicon_checkpoint()
        except Exception:  # noqa: BLE001 — unreadable file -> default config
            return None
        if not meta:
            return None
        fields = {f.name for f in dataclasses.fields(GradICONConfig)}
        return GradICONConfig(**{k: v for k, v in meta.items() if k in fields})

    def _try_load_default(self, load_fn, path_fn) -> bool:
        """Auto mode: load the shipped weights iff they exist AND match this
        config's architecture (stage count / width); else fall back."""
        if not path_fn().exists():
            return False
        try:
            params = load_fn()
        except Exception:  # noqa: BLE001 — unreadable file -> instance mode
            return False
        if len(params) != len(self.config.scales):
            return False
        if int(params[0]["enc0a"]["kernel"].shape[-1]) != self.config.stage_width:
            return False
        self.params = params
        return True

    def load_params(self, params: List[dict]) -> None:
        self.params = params

    def register(self, fixed_image: Image, moving_image: Image) -> DisplacementField:
        """Returns phi_fixed_moving: the transform used to warp fixed-grid
        data onto the moving (atlas) grid — reference registration.py:22-27."""
        if self.verbose:
            a = np.asarray(fixed_image.data)
            b = np.asarray(moving_image.data)
            print("fixed range", a.min(), a.max())
            print("moving range", b.min(), b.max())
        # cache the moving (atlas) image resampled onto its registration grid
        # — the atlas is fixed across a cohort, so every knee after the first
        # skips one full-volume resample. Bounded: one entry per distinct
        # moving geometry actually registered against (typically 1).
        key = (
            id(moving_image.data),  # safe: the cached entry pins the source
            tuple(moving_image.data.shape),
            np.asarray(moving_image.origin).tobytes(),
            np.asarray(moving_image.spacing).tobytes(),
            np.asarray(moving_image.direction).tobytes(),
            tuple(self.config.grid_shape),
        )
        cached = self._moving_on_grid_cache.get(key)
        if cached is None:
            import jax.numpy as jnp

            grid_b = _net_grid_reference(moving_image, self.config.grid_shape)
            b_on_grid = resample_image(moving_image, grid_b).data.astype(jnp.float32)
            if len(self._moving_on_grid_cache) >= 4:  # bound device residency
                self._moving_on_grid_cache.clear()
            # keep a strong ref to the SOURCE data: the id() in the key stays
            # valid exactly as long as the entry lives
            self._moving_on_grid_cache[key] = (moving_image.data, b_on_grid)
        else:
            _, b_on_grid = cached
        quality: Optional[dict] = {} if self.collect_quality else None
        phi_ab, _ = register_pair(
            fixed_image,
            moving_image,
            model=self.model if self.mode == "network" else None,
            params=self.params,
            config=self.config,
            instance_steps=self.instance_steps,
            instance_scales=self.instance_scales,
            finetune_steps=self.finetune_steps,
            finetune_scales=self.finetune_scales,
            finetune_lr=self.finetune_lr,
            b_on_grid=b_on_grid,
            gicon_grad=self.gicon_grad,
            early_stop=self.early_stop,
            quality_out=quality,
        )
        self._last_quality_dev = quality
        return phi_ab

    @property
    def last_quality(self) -> Optional[dict]:
        """Quality metrics of the most recent register() call as floats:
        {fold_fraction_ab, fold_fraction_ba, ice_mean_vox, ice_max_vox,
        ice_mean_mm, ice_max_mm}. Syncing the device scalars happens here,
        off the hot path; None before any call or with collect_quality=False.
        """
        q = self._last_quality_dev
        if not q:
            return None
        return {k: round(float(v), 6) for k, v in q.items()}
