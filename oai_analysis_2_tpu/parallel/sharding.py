"""Multi-chip parallelism: device meshes, sharded training and inference.

The reference's only multi-device story is Dask shipping pickled tasks to
GPU workers over TCP (dask_processing.py, SURVEY.md §2.4/§5). The TPU-native
equivalent: a `jax.sharding.Mesh` with
  * `data` axis — cohort/patch data parallelism (knees, tiles, training
    batches), gradients reduced over ICI by XLA-inserted psums;
  * `space` axis — optional spatial sharding of the volume D (z) dimension
    for single-volume scale-out (the Partition tiling is halo-free by
    construction, so spatial shards are independent).

Everything is expressed with NamedSharding + jit so XLA owns collective
placement; no hand-written NCCL/MPI analogue exists or is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from oai_analysis_2_tpu.models.unet3d import UNet3D


def make_device_mesh(
    n_data: Optional[int] = None, n_space: int = 1, devices=None
) -> Mesh:
    """A (data, space) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_space
    arr = np.array(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(arr, ("data", "space"))


def shard_batch(mesh: Mesh, batch: jax.Array, spatial_axis: Optional[int] = None):
    """Place a batch with dim0 sharded over `data` (and optionally one
    spatial dim over `space`)."""
    spec = [None] * batch.ndim
    spec[0] = "data"
    if spatial_axis is not None:
        spec[spatial_axis] = "space"
    return jax.device_put(batch, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_train_step(
    model: UNet3D,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn=None,
    spatial_shard: bool = False,
):
    """Data-parallel (+ optional spatial) training step.

    Params/opt state are replicated; the batch is sharded over `data` (and
    dim1 = z over `space` when spatial_shard). Gradient reduction is an XLA
    all-reduce over ICI — the jit'd function simply computes a global mean
    loss and XLA inserts the collectives from the shardings.
    """
    from oai_analysis_2_tpu.engine.training import dice_bce_loss

    loss_fn = loss_fn or dice_bce_loss

    batch_spec = P("data", "space", None, None, None) if spatial_shard else P("data")
    in_shardings = (
        NamedSharding(mesh, P()),  # params
        NamedSharding(mesh, P()),  # opt_state
        NamedSharding(mesh, batch_spec),
        NamedSharding(mesh, batch_spec),
    )

    @jax.jit
    def step(params, opt_state, images, labels):
        def loss(p):
            logits = model.apply(p, images)
            return loss_fn(logits, labels)

        loss_val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss_val

    def run(params, opt_state, images, labels):
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        images = jax.device_put(images, in_shardings[2])
        labels = jax.device_put(labels, in_shardings[3])
        return step(params, opt_state, images, labels)

    return run


def make_sharded_gradicon_train_step(model, optimizer, mesh: Mesh):
    """Data-parallel GradICON registration training step over a device mesh.

    The reference trains registration on a single GPU (external
    icon_registration); here pair batches shard over the mesh's `data` axis
    and XLA all-reduces the gradients over ICI — the multi-chip analog of
    examples/train_gradicon_synthetic.py's single-chip loop. Params replicate
    (a few MB; no need for tensor sharding at this size).

    a, b: (N, D, H, W) image pairs on the registration grid, N % n_data == 0.
    """
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("data",))
    batch_sharding = NamedSharding(flat_mesh, P("data"))
    rep = NamedSharding(flat_mesh, P())

    @jax.jit
    def step(params, opt_state, a, b):
        def batch_loss(p):
            def one(a1, b1):
                l, _ = model.loss(p, a1, b1)
                return l

            return jnp.mean(jax.vmap(one)(a, b))

        loss_val, grads = jax.value_and_grad(batch_loss)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss_val

    def run(params, opt_state, a, b):
        params = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
        opt_state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), opt_state)
        a = jax.device_put(a, batch_sharding)
        b = jax.device_put(b, batch_sharding)
        return step(params, opt_state, a, b)

    return run


def make_sharded_inference(model: UNet3D, mesh: Mesh):
    """Tile-parallel inference: a batch of patches sharded over every mesh
    device; returns per-patch sigmoid probabilities."""

    @jax.jit
    def infer(params, tiles):
        return jax.nn.sigmoid(model.apply(params, tiles))

    def run(params, tiles):
        n = mesh.devices.size
        pad = (-tiles.shape[0]) % n
        tiles_p = jnp.pad(tiles, ((0, pad),) + ((0, 0),) * (tiles.ndim - 1))
        flat_mesh = Mesh(mesh.devices.reshape(-1), ("data",))
        tiles_p = jax.device_put(tiles_p, NamedSharding(flat_mesh, P("data")))
        params_r = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(flat_mesh, P())), params
        )
        out = infer(params_r, tiles_p)
        return out[: tiles.shape[0]]

    return run
