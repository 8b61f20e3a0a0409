"""Synthetic knee phantoms + smooth deformations for self-supervised
GradICON training.

The reference ships a 1.2 GB pretrained registration model
(oai_analysis/registration.py:18-27, `OAI_knees_gradICON_model(
pretrained=True)`) trained on OAI DESS pairs. No OAI data exists in this
sandbox, so the TPU-native equivalent weights are produced by training the
same self-supervised objective (LNCC + gradient inverse consistency — no
labels needed) on procedurally generated knee-like phantoms: cartilage
shells, bone blobs and texture of varying geometry, paired either as two
different anatomies or as two random smooth warps of the same anatomy.

Everything host-side here is cheap numpy at the registration-grid size
(~0.4 M voxels); the warping/augmentation happens on device inside the
jitted train step (`make_augmented_train_step`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from oai_analysis_2_tpu.models.gradicon import (
    GradICON,
    identity_map,
    resize_field,
    warp,
)


def random_phantom(
    rng: np.random.Generator, shape_zyx: Tuple[int, int, int] = (48, 96, 96)
) -> np.ndarray:
    """A windowed-intensity knee-like volume in [0, 1].

    1-3 cartilage-like shells (curved thin caps, the structures the
    production registration must align — cf. the bench's `_shell_probmap`),
    0-2 solid ellipsoids (bone-like bulk), low-frequency illumination bias,
    and uniform texture noise. All geometry parameters are randomized so the
    trained network cannot memorize a template.
    """
    d, h, w = shape_zyx
    z, y, x = np.meshgrid(
        np.arange(d, dtype=np.float32),
        np.arange(h, dtype=np.float32),
        np.arange(w, dtype=np.float32),
        indexing="ij",
    )
    anatomy = np.zeros(shape_zyx, np.float32)

    for _ in range(int(rng.integers(1, 4))):  # shells
        c = (
            d * rng.uniform(0.3, 0.7),
            h * rng.uniform(0.35, 0.7),
            w * rng.uniform(0.35, 0.65),
        )
        aspect_z = rng.uniform(1.6, 3.0)
        r0 = rng.uniform(0.10, 0.24) * h
        th = rng.uniform(1.0, 3.5)
        rr = np.sqrt(((z - c[0]) * aspect_z) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2)
        shell = np.clip(1.0 - np.abs(rr - r0) / th, 0.0, 1.0)
        cap_kind = int(rng.integers(0, 3))
        if cap_kind == 0:
            cap = (y < c[1]).astype(np.float32)
        elif cap_kind == 1:
            cap = (y > c[1]).astype(np.float32)
        else:
            cap = 1.0
        anatomy = np.maximum(anatomy, shell * cap * rng.uniform(0.55, 0.95))

    for _ in range(int(rng.integers(0, 3))):  # bone-like ellipsoids
        c = (
            d * rng.uniform(0.25, 0.75),
            h * rng.uniform(0.25, 0.75),
            w * rng.uniform(0.3, 0.7),
        )
        radii = (
            d * rng.uniform(0.08, 0.2),
            h * rng.uniform(0.08, 0.2),
            w * rng.uniform(0.08, 0.2),
        )
        q = (
            ((z - c[0]) / radii[0]) ** 2
            + ((y - c[1]) / radii[1]) ** 2
            + ((x - c[2]) / radii[2]) ** 2
        )
        blob = np.clip(2.0 * (1.0 - q), 0.0, 1.0)
        anatomy = np.maximum(anatomy, blob * rng.uniform(0.3, 0.7))

    # low-frequency illumination bias + uniform texture noise
    bias = (
        rng.uniform(-0.06, 0.06) * np.sin(z / d * rng.uniform(2, 5) + rng.uniform(0, 6))
        + rng.uniform(-0.06, 0.06) * np.sin(y / h * rng.uniform(2, 5) + rng.uniform(0, 6))
    )
    noise = rng.uniform(0.0, rng.uniform(0.12, 0.28), shape_zyx)
    return np.clip(anatomy + noise + bias, 0.0, 1.0).astype(np.float32)


def random_lowres_field(
    rng: np.random.Generator,
    lowres_shape: Tuple[int, int, int] = (6, 12, 12),
    amplitude: float = 0.035,
    translation: float = 0.03,
) -> np.ndarray:
    """A random smooth displacement field in NORMALIZED [0,1]-coordinate
    units, stored at low resolution (trilinearly upsampled on device).
    0.035 normalized over a 96-voxel axis ~ 3.4 voxels — the scale of the
    residual misalignment registration must resolve after the affine-free
    global offsets real pipelines see.
    """
    amp = rng.uniform(0.0, amplitude)
    field = rng.normal(0.0, 1.0, lowres_shape + (3,)).astype(np.float32) * amp
    field += rng.uniform(-translation, translation, (3,)).astype(np.float32)
    return field


def make_phantom_pool(
    n: int, shape_zyx: Tuple[int, int, int] = (48, 96, 96), seed: int = 0
) -> np.ndarray:
    """(n, D, H, W) stack of independent phantoms."""
    rng = np.random.default_rng(seed)
    return np.stack([random_phantom(rng, shape_zyx) for _ in range(n)])


def apply_lowres_warp(volume: jax.Array, u_lowres: jax.Array) -> jax.Array:
    """Device-side: warp a (D,H,W) volume by a low-res normalized
    displacement field (upsampled trilinearly)."""
    ident = identity_map(volume.shape)
    u = resize_field(u_lowres, volume.shape)
    return warp(volume, ident + u)


def make_augmented_train_step(
    model: GradICON, optimizer, sup_weight: float = 0.0, sim_weight: float = 1.0
):
    """Jitted GradICON train step with on-device warp augmentation and an
    optional known-correspondence supervision term.

    Inputs per step: (params, opt_state, vol_a, vol_b, u_a, u_b, same) where
    vol_*: (N, D, H, W) phantom volumes, u_*: (N, *lowres, 3) normalized
    low-res displacement fields, and same: (N,) float — 1.0 when vol_a and
    vol_b are the SAME phantom. Each volume is warped by its field before
    the self-supervised GradICON loss.

    For same-phantom pairs the ground-truth correspondence is known:
    a = v o (id+u_a), b = v o (id+u_b), so a perfect phi_AB satisfies
    (id+u_b) o phi_AB = id+u_a — the supervision is the residual of that
    COMPOSITION (no field inversion needed), scaled to voxel units. This is
    the SynthMorph recipe (synthetic shapes + known deformations) adapted to
    GradICON: LNCC alone barely converges on texture phantoms because the
    noise is uninformative across pairs, while the composition residual is a
    dense noise-free signal. Cross-anatomy pairs (same=0) still train purely
    self-supervised, like the reference's random OAI knee pairs.

    sim_weight scales the LNCC similarity term: on texture phantoms its
    gradient is mostly noise (uncorrelated texture across pairs), which can
    swamp the clean supervised signal in Adam's per-parameter normalization —
    SynthMorph-style mostly-supervised training uses a small sim_weight.
    The GradICON regularity penalty keeps its configured weight regardless.

    Returns (params, opt_state, (loss, sim, reg, sup)).
    """
    import optax

    from oai_analysis_2_tpu.models.gradicon import compose

    def step(params, opt_state, vol_a, vol_b, u_a, u_b, same):
        def batch_loss(p):
            def one(va, vb, ua_low, ub_low, s):
                shape = va.shape
                ident = identity_map(shape)
                ua = resize_field(ua_low, shape)
                ub = resize_field(ub_low, shape)
                a = warp(va, ident + ua)
                b = warp(vb, ident + ub)
                _, (sim, reg, phi_ab, phi_ba) = model.loss(p, a, b)
                l = sim_weight * sim + model.config.lambda_reg * reg
                scale = jnp.asarray([d - 1.0 for d in shape], jnp.float32)
                res_ab = (compose(ident + ub, phi_ab) - (ident + ua)) * scale
                res_ba = (compose(ident + ua, phi_ba) - (ident + ub)) * scale
                sup = 0.5 * (
                    jnp.mean(jnp.sum(res_ab * res_ab, axis=-1))
                    + jnp.mean(jnp.sum(res_ba * res_ba, axis=-1))
                )
                return l + s * sup_weight * sup, (sim, reg, s * sup)

            losses, (sims, regs, sups) = jax.vmap(one)(vol_a, vol_b, u_a, u_b, same)
            return jnp.mean(losses), (jnp.mean(sims), jnp.mean(regs), jnp.mean(sups))

        (loss_val, (sim, reg, sup)), grads = jax.value_and_grad(
            batch_loss, has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (loss_val, sim, reg, sup)

    return jax.jit(step)
