"""GradICON-style deformable registration — TPU-native.

Replaces the reference's external `icon_registration` dependency
(oai_analysis/registration.py:18-27, pinned icon-registration==1.1.2 in
pyproject.toml:35): a multiscale, two-step displacement-field registration
network with gradient-inverse-consistency (GradICON) regularisation and
LNCC similarity, plus an instance-optimization mode that registers a pair
without pretrained weights.

Design (idiomatic JAX, everything jit/vmap/grad-friendly):
  * images and transforms live on a fixed registration grid; coordinates
    are normalized to [0, 1]^3 (z, y, x order matching array axes);
  * a transform is a dense coordinate map phi: (D, H, W, 3) with
    phi(x) = sample point for the pullback  B_warped(x) = B(phi(x));
  * stages are small 3D UNets predicting displacement increments; stage k
    refines the running map via  phi <- phi_prev  o  (id + u_k), evaluated
    coarse-to-fine (the reference's TwoStep/Downsample wrappers);
  * GradICON penalty: finite-difference Jacobian of phi_AB o phi_BA minus
    identity, squared — the regularizer from "Gradient Inverse Consistency:
    GradICON" (Tian et al., CVPR 2023), which the pretrained OAI knees model
    of the reference uses;
  * similarity: local normalized cross-correlation over a box window.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from oai_analysis_2_tpu.models.unet3d import UNet3D, UNetSpec
from oai_analysis_2_tpu.ops.resample import _trilinear_gather

# ---------------------------------------------------------------------------
# Transform algebra on the registration grid (normalized [0,1]^3, zyx order)
# ---------------------------------------------------------------------------


def identity_map(shape_zyx: Tuple[int, int, int]) -> jax.Array:
    """(D, H, W, 3) normalized coordinates of every voxel."""
    d, h, w = shape_zyx
    z = jnp.linspace(0.0, 1.0, d)
    y = jnp.linspace(0.0, 1.0, h)
    x = jnp.linspace(0.0, 1.0, w)
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    return jnp.stack([zz, yy, xx], axis=-1).astype(jnp.float32)


def _identity_map_np(shape_zyx) -> "np.ndarray":
    """Host-numpy identity map — for values captured in cached CLOSURES.

    jnp ops staged while a jit trace is active produce tracers even on
    concrete inputs; a memoized builder (e.g. `_scale_run_fn`) called during
    another program's trace would bake that tracer into its cached closure
    and poison every later trace (UnexpectedTracerError). numpy constants
    are immune."""
    import numpy as np

    d, h, w = shape_zyx
    z, y, x = np.meshgrid(
        np.linspace(0.0, 1.0, d, dtype=np.float32),
        np.linspace(0.0, 1.0, h, dtype=np.float32),
        np.linspace(0.0, 1.0, w, dtype=np.float32),
        indexing="ij",
    )
    return np.stack([z, y, x], axis=-1)


def _to_index(phi: jax.Array, shape_zyx) -> jax.Array:
    scale = jnp.asarray([s - 1.0 for s in shape_zyx], jnp.float32)
    return phi * scale


def warp(volume: jax.Array, phi: jax.Array) -> jax.Array:
    """Pullback-warp a (D,H,W) volume: out(x) = volume(phi(x)). Outside -> 0."""
    return _trilinear_gather(volume, _to_index(phi, volume.shape), 0.0)


def compose(phi_outer: jax.Array, phi_inner: jax.Array) -> jax.Array:
    """(phi_outer o phi_inner)(x) = phi_outer(phi_inner(x)).

    phi_outer is a (D,H,W,3) field sampled at phi_inner's points (clamped to
    the unit cube so boundary compositions stay well-defined)."""
    shape = phi_outer.shape[:3]
    pts = jnp.clip(phi_inner, 0.0, 1.0)
    return _trilinear_gather(phi_outer, _to_index(pts, shape), 0.0)


def downsample2x(volume: jax.Array) -> jax.Array:
    """2x average-pool downsample of a (D,H,W) volume."""
    return lax.reduce_window(
        volume, 0.0, lax.add, (2, 2, 2), (2, 2, 2), "VALID"
    ) * 0.125


def resize_field(phi: jax.Array, shape_zyx: Tuple[int, int, int]) -> jax.Array:
    """Trilinear resize of a (D,H,W,3) field defined on normalized coords."""
    ident = identity_map(shape_zyx)
    return _trilinear_gather(phi, _to_index(ident, phi.shape[:3]), 0.0)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def _box_sum(x: jax.Array, win: int) -> jax.Array:
    """Separable 3D box-filter sum (3 x win taps instead of win^3), SAME."""
    for axis in range(3):
        window = [1, 1, 1]
        window[axis] = win
        x = lax.reduce_window(x, 0.0, lax.add, tuple(window), (1, 1, 1), "SAME")
    return x


def _box_mean(x: jax.Array, win: int) -> jax.Array:
    """Box-filter mean over a (D,H,W) volume, SAME padding."""
    return _box_sum(x, win) / _box_sum(jnp.ones_like(x), win)


def lncc(a: jax.Array, b: jax.Array, win: int = 5, eps: float = 1e-5) -> jax.Array:
    """1 - mean local normalized cross-correlation (the similarity used by the
    reference's pretrained OAI model). All window sums are separable."""
    cnt = _box_sum(jnp.ones_like(a), win)
    mu_a = _box_sum(a, win) / cnt
    mu_b = _box_sum(b, win) / cnt
    var_a = _box_sum(a * a, win) / cnt - mu_a * mu_a
    var_b = _box_sum(b * b, win) / cnt - mu_b * mu_b
    cov = _box_sum(a * b, win) / cnt - mu_a * mu_b
    cc = (cov * cov) / (var_a * var_b + eps)
    return 1.0 - jnp.mean(cc)


def make_similarity(kind: str = "lncc", lncc_window: int = 5, mse_weight: float = 10.0):
    """Similarity factory. "lncc" is contrast-invariant (the GradICON paper's
    choice); "lncc+mse" adds a weighted intensity term — stronger capture
    range for same-modality pairs (DESS knee vs DESS atlas), the default of
    the instance-optimization path; "mse" is plain intensity."""

    def sim(a, b_warped):
        total = 0.0
        if "lncc" in kind:
            total = total + lncc(a, b_warped, lncc_window)
        if "mse" in kind:
            total = total + mse_weight * jnp.mean((a - b_warped) ** 2)
        return total

    return sim


def gradicon_penalty(phi_ab: jax.Array, phi_ba: jax.Array) -> jax.Array:
    """|| d/dx (phi_AB o phi_BA) - I ||^2 via forward differences."""
    comp = compose(phi_ab, phi_ba)  # (D,H,W,3) ~ identity
    shape = comp.shape[:3]
    total = 0.0
    for axis in range(3):
        h = 1.0 / (shape[axis] - 1)
        d = jnp.diff(comp, axis=axis) / h  # ~ dcomp/dx_axis
        # constant unit vector WITHOUT .at[].set (that lowers to a scatter op
        # and would defeat the scatter-free guarantee the alternating-penalty
        # test pins on the lowered gradient program)
        e = jnp.eye(3, dtype=comp.dtype)[axis]
        total = total + jnp.mean(jnp.sum((d - e) ** 2, axis=-1))
    return total


def gradicon_penalty_alternating(phi_ab: jax.Array, phi_ba: jax.Array) -> jax.Array:
    """GradICON penalty with SCATTER-FREE gradients.

    The exact penalty's VJP needs the cotangent of the composition's OUTER
    field (the gathered array), which XLA lowers to a full-grid scatter-add —
    TPUs serialize scatters with duplicate indices, and on-chip profiling
    (tools/profile_instance.py) shows that single scatter is 77% of an
    instance-optimization step (315 -> 72 ms/step at a 48x96x96 grid when the
    outer field is stop-gradiented).

    This form evaluates BOTH composition orders and stop-gradients the outer
    field in each, so every field still receives a penalty gradient — through
    its role as the inner map (points-side VJP = gathers only). It is
    alternating/coordinate-style descent on the symmetrized objective
    0.5*(||d(phi_AB o phi_BA) - I||^2 + ||d(phi_BA o phi_AB) - I||^2), whose
    value and optimum (mutually inverse maps) match the exact penalty's.
    Accuracy parity at production settings is pinned in VALIDATION.md.
    """
    return 0.5 * (
        gradicon_penalty(lax.stop_gradient(phi_ab), phi_ba)
        + gradicon_penalty(lax.stop_gradient(phi_ba), phi_ab)
    )


@jax.jit
def map_quality_stats(phi_ab: jax.Array, phi_ba: jax.Array) -> dict:
    """Per-registration quality signals, all on-device (one jitted program):

      * inverse-consistency error: || (phi_AB o phi_BA)(x) - x || over the
        grid interior, in VOXEL units per axis (callers convert to mm with
        the grid spacing) — the production form of the GradICON training
        penalty (reference: ICON/GradICON's inverse-consistency objective);
      * folded-Jacobian fraction per map: voxels where det(d phi/dx) <= 0,
        i.e. where the transform is locally non-invertible (the standard
        deformable-registration pathology metric; VALIDATION.md measured
        5.7% on cross-anatomy phantoms — this surfaces it per registration).

    Returns {"ice_mean_vox", "ice_max_vox", "fold_fraction_ab",
    "fold_fraction_ba"} as device scalars.
    """
    shape = phi_ab.shape[:3]
    vox = jnp.asarray([s - 1.0 for s in shape], jnp.float32)
    comp = compose(phi_ab, phi_ba)
    ice = (comp - identity_map(shape)) * vox
    # interior crop: boundary compositions sample clamped/out-of-cube points
    interior = tuple(slice(2, -2) for _ in range(3))
    ice_n = jnp.sqrt(jnp.sum(ice[interior] ** 2, axis=-1))

    def fold_fraction(phi):
        # J[i, j] = d(phi_i * (N_i - 1)) / d(voxel x_j): forward differences
        # (one voxel step along axis j), cropped to the common
        # (D-1, H-1, W-1) corner; identity map -> J = I
        crop = (slice(0, shape[0] - 1), slice(0, shape[1] - 1),
                slice(0, shape[2] - 1))
        cols = [(jnp.diff(phi, axis=j) * vox)[crop] for j in range(3)]
        jac = jnp.stack(cols, axis=-1)  # (..., 3 components, 3 d/dx_j)
        det = jnp.linalg.det(jac)
        return jnp.mean(det <= 0.0)

    return {
        "ice_mean_vox": jnp.mean(ice_n),
        "ice_max_vox": jnp.max(ice_n),
        "fold_fraction_ab": fold_fraction(phi_ab),
        "fold_fraction_ba": fold_fraction(phi_ba),
    }


def diffusion_penalty(phi: jax.Array) -> jax.Array:
    """Smoothness of the displacement u = phi - id (first differences)."""
    u = phi - identity_map(phi.shape[:3])
    total = 0.0
    for axis in range(3):
        h = 1.0 / (phi.shape[axis] - 1)
        d = jnp.diff(u, axis=axis) / h
        total = total + jnp.mean(jnp.sum(d * d, axis=-1))
    return total


# ---------------------------------------------------------------------------
# The multiscale network
# ---------------------------------------------------------------------------


def _stage_spec(width: int = 16) -> UNetSpec:
    """A compact 3-level UNet: 2 image channels in, 3 displacement channels out."""
    w = width
    return UNetSpec(
        name="reg_stage",
        enc=((w, 2 * w), (2 * w, 4 * w), (4 * w, 8 * w)),
        dec=((8 * w, 4 * w, 4 * w), (4 * w, 2 * w, 2 * w)),
        in_channels=2,
        n_classes=3,
        bias=True,
        batchnorm=False,
    )


@dataclasses.dataclass(frozen=True)
class GradICONConfig:
    # Registration grid: the finest scale actually optimized. A 2x finer
    # grid with scales starting at 2 is mathematically identical but does all
    # full-grid composes/resizes at 8x the voxel count for nothing. Every
    # dim must be divisible by (max scale x 4) so the per-scale stage UNets
    # (two 2x pools) see even shapes at the coarsest scale.
    grid_shape: Tuple[int, int, int] = (48, 96, 96)  # net grid, z,y,x
    scales: Tuple[int, ...] = (4, 2, 1)  # coarse-to-fine downsample factors
    stage_width: int = 16
    lncc_window: int = 5
    lambda_reg: float = 1.5
    displacement_scale: float = 0.2  # max fraction of the volume per stage
    similarity: str = "lncc"  # training similarity; "lncc+mse" adds capture
    mse_weight: float = 10.0  # range for same-modality normalized volumes


class GradICON:
    """Multiscale two-step registration network with shared per-scale UNets."""

    def __init__(self, config: GradICONConfig = GradICONConfig(), compute_dtype=jnp.float32):
        self.config = config
        self.stages = [
            UNet3D(_stage_spec(config.stage_width), compute_dtype=compute_dtype)
            for _ in config.scales
        ]

    def init(self, key: jax.Array, zero_heads: bool = True) -> List[dict]:
        """zero_heads: zero the displacement-head convs so the untrained
        network IS the identity transform — registration nets train far more
        stably from identity than from random initial fields (every stage's
        tanh(u)*scale starts at 0 instead of random ~0.2-amplitude warps
        that downstream stages must first unlearn)."""
        keys = jax.random.split(key, len(self.stages))
        params = [m.init(k) for m, k in zip(self.stages, keys)]
        if zero_heads:
            params = [
                {**p, "head": jax.tree.map(jnp.zeros_like, p["head"])} for p in params
            ]
        return params

    # -- single direction -------------------------------------------------------

    def _stage_increment(self, stage: UNet3D, params, a_s, b_warp_s):
        """Predict a displacement increment at one scale from the fixed image
        and the current warped moving image."""
        net_in = jnp.stack([a_s, b_warp_s], axis=-1)[None]  # (1,D,H,W,2)
        u = stage.apply(params, net_in)[0]  # (D,H,W,3) raw
        return jnp.tanh(u) * self.config.displacement_scale

    def forward_map(self, params_list: List[dict], a: jax.Array, b: jax.Array) -> jax.Array:
        """phi s.t. b(phi(x)) ~= a(x): the pullback warping B onto A's grid."""
        cfg = self.config
        full_shape = a.shape
        phi = identity_map(full_shape)
        for stage, params, scale in zip(self.stages, params_list, cfg.scales):
            a_s, b_s = a, warp(b, phi)
            for _ in range(int.bit_length(scale) - 1):  # scale is 1,2,4,...
                a_s, b_s = downsample2x(a_s), downsample2x(b_s)
            u = self._stage_increment(stage, params, a_s, b_s)
            if u.shape[:3] != full_shape:
                u = resize_field(u, full_shape)
            # refine: phi <- phi o (id + u)
            phi = compose(phi, identity_map(full_shape) + u)
        return phi

    def both_maps(self, params_list, a, b):
        phi_ab = self.forward_map(params_list, a, b)  # warps B onto A
        phi_ba = self.forward_map(params_list, b, a)  # warps A onto B
        return phi_ab, phi_ba

    # -- training loss ----------------------------------------------------------

    def loss(self, params_list, a, b):
        cfg = self.config
        sim_fn = make_similarity(cfg.similarity, cfg.lncc_window, cfg.mse_weight)
        phi_ab, phi_ba = self.both_maps(params_list, a, b)
        sim = sim_fn(a, warp(b, phi_ab)) + sim_fn(b, warp(a, phi_ba))
        reg = gradicon_penalty(phi_ab, phi_ba)
        return sim + cfg.lambda_reg * reg, (sim, reg, phi_ab, phi_ba)


def default_gradicon_weights_path():
    """Path of the weights shipped with the package (the TPU-native analog of
    the reference's pretrained `OAI_knees_gradICON_model(pretrained=True)`
    download, registration.py:20) — present iff training has produced them."""
    from pathlib import Path

    return Path(__file__).resolve().parent.parent / "weights" / "gradicon.npz"


def load_gradicon_params(path=None) -> List[dict]:
    """Load a GradICON stage-params list from a native npz checkpoint written
    by `save_checkpoint({"params": {"stage{i}": ...}})`."""
    params, _ = load_gradicon_checkpoint(path)
    return params


def load_gradicon_checkpoint(path=None) -> Tuple[List[dict], dict]:
    """(stage-params list, architecture metadata) from a native checkpoint.

    The metadata dict carries whatever the training run recorded —
    `stage_width`, `grid_shape`, `scales` — so `ICON_Registration` can adapt
    its default config to the shipped architecture (the reference hard-codes
    its pretrained net's architecture in code, registration.py:18-27; here
    the checkpoint is self-describing). Older checkpoints without metadata
    return {}."""
    from oai_analysis_2_tpu.utils.checkpoint import load_checkpoint

    path = default_gradicon_weights_path() if path is None else path
    state = load_checkpoint(path)
    stages = state["params"]
    meta = {}
    if "stage_width" in state:
        meta["stage_width"] = int(state["stage_width"])
    if "grid_shape" in state:
        meta["grid_shape"] = tuple(int(v) for v in state["grid_shape"])
    if "scales" in state:
        meta["scales"] = tuple(int(v) for v in state["scales"])
    return [stages[f"stage{i}"] for i in range(len(stages))], meta


def make_gradicon_train_step(model: GradICON, optimizer):
    """Jitted GradICON training step over a batch of image pairs.

    a, b: (N, D, H, W) volume pairs on the registration grid."""

    import optax

    def step(params, opt_state, a, b):
        def batch_loss(p):
            def one(a1, b1):
                l, _ = model.loss(p, a1, b1)
                return l

            return jnp.mean(jax.vmap(one)(a, b))

        loss_val, grads = jax.value_and_grad(batch_loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Instance optimization (registration without pretrained weights)
# ---------------------------------------------------------------------------


# Empirically-tuned instance-optimization defaults, shared with the batch
# pipeline's trace-composable re-implementation (parallel/batch.py) so the
# two paths cannot silently drift.
INSTANCE_DEFAULT_LR = 1.2  # voxels of the current scale per Adam step
INSTANCE_DEFAULT_SIMILARITY = "lncc+mse"
# "alternating" = scatter-free GradICON gradients (gradicon_penalty_alternating):
# ~4.4x faster per step at the full grid on TPU with matched recovery accuracy
# (VALIDATION.md); "exact" = joint gradients through both composition roles.
INSTANCE_DEFAULT_GICON_GRAD = "alternating"


def register_pair_instance(
    a: jax.Array,
    b: jax.Array,
    scales: Sequence[int] = (8, 4, 2),
    steps_per_scale=60,  # int, or one count per scale (finer scales cost
    # ~8x more per step — front-load the coarse scales)
    lr: float = INSTANCE_DEFAULT_LR,  # in VOXELS of the current scale per Adam step (Adam
    # normalizes gradients, so the step size ~ lr); converted per scale to
    # normalized-coordinate units — a fixed normalized lr would take steps
    # proportional to the physical volume size, diverging on large grids
    lncc_window: int = 5,
    lambda_reg: float = 0.5,
    diffusion_weight: float = 0.3,
    similarity: str = INSTANCE_DEFAULT_SIMILARITY,
    verbose: bool = False,
    init_ab: jax.Array = None,
    init_ba: jax.Array = None,
    gicon_grad: str = INSTANCE_DEFAULT_GICON_GRAD,
    early_stop: Optional[float] = None,
):
    """Symmetric multiscale instance-optimization registration.

    Optimizes per-scale displacement fields for both directions jointly with
    LNCC(+MSE) similarity + GradICON inverse-consistency + a diffusion
    (first-difference) smoothness term, coarse to fine. The diffusion term is
    essential in instance mode: raw per-voxel fields can satisfy inverse
    consistency with mutually-inverse-but-wild deformations that shred thin
    structures; a network parameterization regularizes implicitly, a raw
    field does not. Returns
    (phi_ab, phi_ba) coordinate maps on a's grid shape; b(phi_ab(x)) ~= a(x).

    init_ab / init_ba: optional full-grid coordinate maps to start from —
    the per-pair fine-tuning mode on top of a trained network's prediction
    (the reference's icon_registration `finetune_steps`).

    early_stop: optional plateau tolerance in (0, 1). Each scale then runs a
    BOUNDED `lax.while_loop` (cap = steps_per_scale) that exits once the EMA
    of positive per-step loss drops falls below `early_stop` x its peak —
    adaptive budget: easy pairs/scales stop early, hard ones use the full
    count. See `_scale_run_fn` for the criterion.

    This is the out-of-the-box registration path (the reference requires a
    1.2 GB pretrained download; this path requires nothing) — and it runs
    entirely on TPU under jit.

    Compiled per-scale programs are memoized (`_scale_runner`, up to 64
    configurations); call `clear_instance_cache()` in long-lived cohort
    processes with heterogeneous volume shapes to release them.
    """
    if isinstance(steps_per_scale, int):
        steps_per_scale = [steps_per_scale] * len(scales)
    full_shape = a.shape
    ident_full = identity_map(full_shape)

    def pyramid(vol, s):
        out = vol
        for _ in range(int.bit_length(int(s)) - 1):
            out = downsample2x(out)
        return out

    phi_ab = ident_full if init_ab is None else init_ab
    phi_ba = ident_full if init_ba is None else init_ba

    for scale, n_steps in zip(scales, steps_per_scale):
        a_s, b_s = pyramid(a, scale), pyramid(b, scale)
        shape_s = a_s.shape
        runner = _scale_runner(
            shape_s,
            full_shape,
            int(n_steps),
            float(lr),
            int(lncc_window),
            str(similarity),
            float(lambda_reg),
            float(diffusion_weight),
            bool(verbose),
            str(gicon_grad),
            None if early_stop is None else float(early_stop),
        )
        base_ab = resize_field(phi_ab, shape_s)
        base_ba = resize_field(phi_ba, shape_s)
        if early_stop is None:
            phi_ab, phi_ba = runner(base_ab, base_ba, a_s, b_s)
        else:
            phi_ab, phi_ba, steps = runner(base_ab, base_ba, a_s, b_s)
            if verbose:
                print(f"scale {scale}: {int(steps)}/{int(n_steps)} steps")

    return phi_ab, phi_ba


def clear_instance_cache() -> None:
    """Drop all cached per-scale instance-optimization programs.

    `_scale_runner` memoizes one compiled XLA program (plus its captured
    identity map) per (shape, steps, lr, ...) configuration; a long-lived
    cohort process registering many distinct volume shapes can accumulate up
    to 64 resident programs/buffers. Call this between cohort segments to
    bound device/host memory."""
    _scale_runner.cache_clear()
    _scale_run_fn.cache_clear()


@functools.lru_cache(maxsize=64)
def _scale_run_fn(
    shape_s,
    full_shape,
    n_steps: int,
    lr: float,
    lncc_window: int,
    similarity: str,
    lambda_reg: float,
    diffusion_weight: float,
    gicon_grad: str = INSTANCE_DEFAULT_GICON_GRAD,
    early_stop: Optional[float] = None,
):
    """The PURE per-scale instance-optimization program
    (base_ab, base_ba, a_s, b_s) -> (phi_ab, phi_ba): init + n_steps of
    fused Adam + compose + resize back to full resolution. Returned
    unjitted (plus the single opt step for verbose paths) so the
    single-pair path can jit it and the multi-chip batch pipeline can
    vmap it over a knee batch (parallel/batch.py).

    early_stop: if set, run a `lax.while_loop` (bounded by n_steps) that
    exits once the per-step loss drop plateaus — recent progress (EMA of
    the drop, beta 0.85) falls below `early_stop` x the progress rate when
    the window opened (the EMA at min_steps = max(6, n_steps//4)). The
    criterion is a RATIO of same-scale quantities, so it is invariant to
    loss magnitude across scales/volumes. Returns (phi_ab, phi_ba,
    steps_taken) in this mode."""
    import optax

    sim_fn = make_similarity(similarity, lncc_window)
    ident_s = _identity_map_np(shape_s)  # numpy: closure-safe under traces
    lr_norm = lr / float(max(shape_s))
    optimizer = optax.adam(lr_norm)
    if gicon_grad not in ("exact", "alternating"):
        raise ValueError(f"gicon_grad must be 'exact' or 'alternating', got {gicon_grad!r}")
    penalty = gradicon_penalty if gicon_grad == "exact" else gradicon_penalty_alternating

    def loss_fn(p, base_ab, base_ba, a_s, b_s):
        pab = compose(base_ab, ident_s + p["u_ab"])
        pba = compose(base_ba, ident_s + p["u_ba"])
        # image warps (the dominant gathers) in bf16; LNCC statistics,
        # penalties and the fields themselves stay f32
        wb = warp(b_s.astype(jnp.bfloat16), pab).astype(jnp.float32)
        wa = warp(a_s.astype(jnp.bfloat16), pba).astype(jnp.float32)
        sim = sim_fn(a_s, wb) + sim_fn(b_s, wa)
        reg = penalty(pab, pba)
        smooth = diffusion_penalty(pab) + diffusion_penalty(pba)
        return sim + lambda_reg * reg + diffusion_weight * smooth

    def opt_step(params, opt_state, base_ab, base_ba, a_s, b_s):
        l, g = jax.value_and_grad(loss_fn)(params, base_ab, base_ba, a_s, b_s)
        updates, opt_state = optimizer.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    def _finish(params, base_ab, base_ba):
        phi_ab = resize_field(compose(base_ab, ident_s + params["u_ab"]), full_shape)
        phi_ba = resize_field(compose(base_ba, ident_s + params["u_ba"]), full_shape)
        return phi_ab, phi_ba

    def run(base_ab, base_ba, a_s, b_s):
        u0 = jnp.zeros(shape_s + (3,), jnp.float32)
        params = {"u_ab": u0, "u_ba": u0}
        opt_state = optimizer.init(params)

        def body(_, carry):
            p, o = carry
            p2, o2, _ = opt_step(p, o, base_ab, base_ba, a_s, b_s)
            return (p2, o2)

        params, _ = jax.lax.fori_loop(0, n_steps, body, (params, opt_state))
        return _finish(params, base_ab, base_ba)

    if early_stop is None:
        return run, opt_step

    # Bounded while_loop with plateau exit. Progress = EMA of the POSITIVE
    # per-step loss drops (Adam at lr~1.2 voxels explodes the loss for the
    # first few steps before descending — raw drops would leave the EMA
    # deeply negative exactly when the stop window opens). The reference
    # rate is the PEAK progress EMA seen so far, so (a) the warm-up spike
    # never poisons it, and (b) a run that starts converged (fine-tune of a
    # good init) has peak~0 and exits right after min_steps.
    min_steps = max(6, n_steps // 4)
    tol = float(early_stop)
    beta = 0.85

    def run_early(base_ab, base_ba, a_s, b_s):
        u0 = jnp.zeros(shape_s + (3,), jnp.float32)
        params = {"u_ab": u0, "u_ba": u0}
        opt_state = optimizer.init(params)

        def cond(carry):
            _, _, i, _, ema, peak = carry
            return (i < n_steps) & ((i <= min_steps) | (ema > tol * peak))

        def body(carry):
            p, o, i, last_l, ema, peak = carry
            p2, o2, l = opt_step(p, o, base_ab, base_ba, a_s, b_s)
            drop = jnp.maximum(jnp.where(i == 0, 0.0, last_l - l), 0.0)
            ema2 = jnp.where(i <= 1, drop, beta * ema + (1.0 - beta) * drop)
            return (p2, o2, i + 1, l, ema2, jnp.maximum(peak, ema2))

        carry = (
            params,
            opt_state,
            jnp.int32(0),
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.float32(0.0),
        )
        params, _, steps, _, _, _ = jax.lax.while_loop(cond, body, carry)
        phi_ab, phi_ba = _finish(params, base_ab, base_ba)
        return phi_ab, phi_ba, steps

    return run_early, opt_step


@functools.lru_cache(maxsize=64)
def _scale_runner(
    shape_s,
    full_shape,
    n_steps: int,
    lr: float,
    lncc_window: int,
    similarity: str,
    lambda_reg: float,
    diffusion_weight: float,
    verbose: bool,
    gicon_grad: str = INSTANCE_DEFAULT_GICON_GRAD,
    early_stop: Optional[float] = None,
):
    """One CACHED jitted program for a whole scale of instance optimization.

    Defining the jitted step inline (round 1) meant a fresh closure — and a
    full RETRACE — on every `register_pair_instance` call: ~4 s of host-side
    tracing per registration on this 1-core machine, dwarfing the actual
    device time of a 20-step fine-tune (<0.3 s). The cache key is the full
    static configuration, so repeated registrations (the cohort case) reuse
    the compiled program."""
    run, opt_step = _scale_run_fn(
        shape_s, full_shape, n_steps, lr, lncc_window, similarity,
        lambda_reg, diffusion_weight, gicon_grad, early_stop,
    )
    shape_s = tuple(shape_s)

    if not verbose:
        return jax.jit(run)

    # compiled once at builder time — wrapping opt_step inside run_verbose
    # would re-trace on every registration, the exact cost this cache exists
    # to eliminate on the non-verbose path
    verbose_step = jax.jit(opt_step)
    import optax

    optimizer = optax.adam(lr / float(max(shape_s)))
    ident_s = _identity_map_np(shape_s)

    # host-side mirror of run_early's plateau criterion (same constants)
    min_steps = max(6, n_steps // 4)
    beta = 0.85

    def run_verbose(base_ab, base_ba, a_s, b_s):
        u0 = jnp.zeros(shape_s + (3,), jnp.float32)
        params = {"u_ab": u0, "u_ba": u0}
        opt_state = optimizer.init(params)
        step = verbose_step
        last_l, ema, peak = 0.0, 0.0, 0.0
        taken = n_steps
        for i in range(n_steps):
            params, opt_state, l = step(params, opt_state, base_ab, base_ba, a_s, b_s)
            if i % 20 == 0:
                print(f"scale shape {shape_s} step {i}: loss {float(l):.4f}")
            if early_stop is not None:
                l = float(l)
                drop = max(0.0 if i == 0 else last_l - l, 0.0)
                ema = drop if i <= 1 else beta * ema + (1.0 - beta) * drop
                peak = max(peak, ema)
                last_l = l
                # device cond continues while (i <= min_steps) | (ema > tol*peak),
                # checked before step i — so the first stoppable state is the one
                # after step min_steps has run. Mirror exactly: >= here, not >.
                if i >= min_steps and ema <= early_stop * peak:
                    taken = i + 1
                    print(f"scale shape {shape_s}: early stop at step {taken}")
                    break
        phi_ab = resize_field(compose(base_ab, ident_s + params["u_ab"]), full_shape)
        phi_ba = resize_field(compose(base_ba, ident_s + params["u_ba"]), full_shape)
        if early_stop is not None:
            return phi_ab, phi_ba, jnp.int32(taken)
        return phi_ab, phi_ba

    return run_verbose
