"""Segmentation training — functional JAX training step + loop.

The reference declares training entry points but ships them as stubs
(segmenter.py:64-73, 94-98); this framework provides a working
implementation: per-class sigmoid Dice+BCE (matching the classwise-sigmoid
inference contract of segmenter.py:121), optax optimizer, jitted step, and
a data-parallel multi-chip variant in parallel/sharding.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from oai_analysis_2_tpu.models.unet3d import UNet3D


def dice_bce_loss(
    logits: jax.Array, labels: jax.Array, class_weights: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> jax.Array:
    """Multi-label Dice + BCE. logits/labels: (N, D, H, W, C) with labels in
    {0,1} per class channel."""
    labels = labels.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    axes = (1, 2, 3)
    inter = jnp.sum(probs * labels, axes)
    denom = jnp.sum(probs, axes) + jnp.sum(labels, axes)
    dice = 1.0 - (2.0 * inter + eps) / (denom + eps)  # (N, C)
    bce = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels), axes)  # (N, C)
    per_class = dice + bce
    if class_weights is not None:
        per_class = per_class * class_weights[None, :]
    return jnp.mean(per_class)


def make_train_step(
    model: UNet3D,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = dice_bce_loss,
) -> Callable:
    """A jittable (params, opt_state, images, labels) -> (params, opt_state,
    loss) step. Gradients are checkpointed through the UNet blocks by XLA's
    remat-free default; wrap `model.apply` in jax.checkpoint upstream if
    memory-bound."""

    def step(params, opt_state, images, labels):
        def loss(p):
            logits = model.apply(p, images)
            return loss_fn(logits, labels)

        loss_val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    return jax.jit(step)


def train_segmentation(
    model: UNet3D,
    data_iter,
    num_steps: int,
    learning_rate: float = 1e-3,
    params=None,
    key: Optional[jax.Array] = None,
    log_every: int = 50,
    callback=None,
):
    """Minimal single-chip training loop. `data_iter` yields (images NDHWC,
    labels NDHWC-multi-hot)."""
    if params is None:
        params = model.init(key if key is not None else jax.random.PRNGKey(0))
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer)
    losses = []
    for i in range(num_steps):
        images, labels = next(data_iter)
        params, opt_state, loss = step(params, opt_state, images, labels)
        losses.append(float(loss))
        if callback and (i % log_every == 0 or i == num_steps - 1):
            callback(i, losses[-1])
    return params, opt_state, losses
