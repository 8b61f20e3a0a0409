"""Auto-context cascades of UNets.

Functional equivalents of the reference's `AutoContextAsRNN`
(networks.py:227-256), `CascadedModel` (networks.py:734-846) and
`UNet_light4x2` (networks.py:664-731): each stage consumes the raw input
concatenated with the softmax of the previous stage's logits, and (with
residual=True) adds its logits onto the running prediction. Freezing of
earlier stages is expressed the JAX way — callers simply exclude earlier
stages' params from the optimizer / take gradients w.r.t. the last stage
only — rather than mutating requires_grad flags.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D, UNetSpec


class CascadedUNet:
    """A cascade of UNet3D stages with auto-context + residual wiring."""

    def __init__(
        self,
        specs: Sequence[UNetSpec],
        auto_context: bool = True,
        residual: bool = True,
        residual_scale: float = 1.0,
        compute_dtype=jnp.float32,
    ):
        self.stages = [UNet3D(s, compute_dtype) for s in specs]
        self.auto_context = auto_context
        self.residual = residual
        self.residual_scale = residual_scale

    def init(self, key: jax.Array) -> List[dict]:
        keys = jax.random.split(key, len(self.stages))
        return [m.init(k) for m, k in zip(self.stages, keys)]

    def apply(self, params_list: List[dict], x: jax.Array, multi_output: bool = False):
        """x: (N, D, H, W, C_in). Returns final logits (or all stage outputs)."""
        outputs = []
        out = self.stages[0].apply(params_list[0], x)
        outputs.append(out)
        for i in range(1, len(self.stages)):
            if self.auto_context:
                ctx = jax.nn.softmax(out, axis=-1)
                stage_in = jnp.concatenate([ctx.astype(x.dtype), x], axis=-1)
            else:
                stage_in = x
            stage_out = self.stages[i].apply(params_list[i], stage_in)
            out = stage_out * self.residual_scale + out if self.residual else stage_out
            outputs.append(out)
        return outputs if multi_output else out

    def trainable_params(self, params_list: List[dict], end2end: bool = False):
        """Which params to optimize — the reference trains only the last stage
        unless end2end (networks.py:749-754)."""
        return params_list if end2end else params_list[-1:]

    def __call__(self, params_list, x, **kw):
        return self.apply(params_list, x, **kw)


def auto_context_step(
    model: UNet3D,
    params: dict,
    x: jax.Array,
    hidden: jax.Array,
    residual: int = 0,
    residual_scale: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """One recurrent auto-context iteration (reference AutoContextAsRNN.forward,
    networks.py:236-244): concat(input, softmax(hidden)) -> FCN -> new hidden;
    returns (softmax(hidden'), hidden')."""
    combined = jnp.concatenate([x, jax.nn.softmax(hidden, axis=-1).astype(x.dtype)], axis=-1)
    delta = model.apply(params, combined)
    new_hidden = hidden + delta * residual_scale if residual else delta
    return jax.nn.softmax(new_hidden, axis=-1), new_hidden


def init_hidden(shape, n_classes: int) -> jax.Array:
    """Uniform 0.5 initial hidden state (reference networks.py:246-247)."""
    return jnp.full(tuple(shape) + (n_classes,), 0.5, jnp.float32)


def make_unet_light4x2(
    in_channels: int = 1, n_classes: int = 2, bias: bool = False, BN: bool = False,
    compute_dtype=jnp.float32,
) -> CascadedUNet:
    """The reference's UNet_light4x2 (networks.py:664-731): two light4-shaped
    stages; stage 2 sees softmax(stage1) ++ input and adds its logits onto
    stage 1's."""
    s1 = NETWORK_SPECS["UNet_light4"].replace(
        in_channels=in_channels, n_classes=n_classes, bias=bias, batchnorm=BN
    )
    s2 = s1.replace(in_channels=in_channels + n_classes)
    return CascadedUNet([s1, s2], auto_context=True, residual=True, residual_scale=1.0,
                        compute_dtype=compute_dtype)
