"""Checkpointing: native npz format + one-time torch-checkpoint conversion.

Replaces the reference's torch `.pth.tar` persistence
(oai_analysis/segmentation/utils.py:10-57) with a framework-native format
(flattened-key npz + json metadata, no pickle), and provides a converter
from the reference's shipped torch checkpoints (keys `model_state_dict`,
`optimizer_state_dict`, `epoch`, `best_score|reg_best_score|seg_best_score`)
into this framework's UNet parameter pytrees.

Layout conversions (torch NCDHW modules -> our NDHWC functional model):
  * Conv3d weight (O, I, D, H, W)            -> DHWIO transpose
  * ConvTranspose3d k2/s2 weight (I, O, 2,2,2) -> (2,2,2, I, O)
  * ConvTranspose3d k3/s1/p1 weight          -> equivalent *forward* conv:
      K[d,h,w,i,o] = W[i, o, 2-d, 2-h, 2-w]
    (a stride-1 transposed conv is a plain conv with a spatially-flipped,
    channel-swapped kernel; padding 1 maps to padding 1 for k=3).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from oai_analysis_2_tpu.models.unet3d import UNet3D, UNetSpec

# -- native checkpoint format ----------------------------------------------------


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_checkpoint(
    state: dict,
    is_best: bool,
    path,
    prefix: Optional[str] = None,
    name: str = "checkpoint.npz",
) -> Path:
    """Persist a training state. `state` holds `params` (pytree), optional
    `opt_state_flat` (pytree), and scalar metadata (`epoch`, `best_score`...).
    Mirrors the reference's save_checkpoint semantics (utils.py:48-57):
    best-model copies drop the optimizer state."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    name = f"{prefix}_{name}" if prefix else name
    file = path / name

    arrays = {}
    meta = {}
    for k, v in state.items():
        if isinstance(v, dict):
            arrays.update(_flatten({k: v}))
        elif v is None:
            continue
        else:
            meta[k] = float(v) if isinstance(v, (int, float, np.floating)) else v
    np.savez(file, __meta__=json.dumps(meta), **arrays)

    if is_best:
        best_name = f"{prefix}_model_best.npz" if prefix else "model_best.npz"
        best_arrays = {k: v for k, v in arrays.items() if not k.startswith("opt_state")}
        np.savez(path / best_name, __meta__=json.dumps(meta), **best_arrays)
    return file


def load_checkpoint(file) -> dict:
    """Load a native checkpoint into {params: pytree, ..., epoch, best_score}."""
    with np.load(file, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    state = dict(meta)
    state.update(_unflatten(flat))
    return state


def initialize_model(
    model: UNet3D,
    key: Optional[jax.Array] = None,
    ckpoint_path=None,
) -> Tuple[dict, int, float]:
    """Build (params, finished_epoch, best_score) — reference initialize_model
    (utils.py:10-45). Accepts either a native .npz checkpoint or a torch
    .pth.tar checkpoint (converted on the fly)."""
    if ckpoint_path:
        p = Path(ckpoint_path)
        if not p.is_file():
            raise ValueError(f"no checkpoint found at '{p}'")
        if p.suffix == ".npz":
            state = load_checkpoint(p)
            return state["params"], int(state.get("epoch", 0)), float(state.get("best_score", 0.0))
        # torch checkpoint
        sd, epoch, best = load_torch_checkpoint(p)
        params = convert_torch_unet_state_dict(sd, model.spec)
        return params, epoch, best
    if key is None:
        key = jax.random.PRNGKey(0)
    return model.init(key), 0, 0.0


# -- torch conversion --------------------------------------------------------------


def load_torch_checkpoint(path) -> Tuple[dict, int, float]:
    """Read a reference-format torch checkpoint; returns (state_dict as numpy,
    epoch, best_score). Requires torch (CPU) at call time only."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck.get("model_state_dict", ck)
    best = 0.0
    for k in ("best_score", "reg_best_score", "seg_best_score"):
        if k in ck:
            best = float(ck[k])
            break
    epoch = int(ck.get("epoch", 0))
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return sd_np, epoch, best


def _is_unet_key(key: str) -> bool:
    """True for keys of the reference UNet naming scheme (ec*/dc*)."""
    return key.startswith(("ec", "dc"))


def _conv_fwd(w: np.ndarray) -> jnp.ndarray:
    # torch Conv3d (O, I, D, H, W) -> DHWIO
    return jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _convT_up(w: np.ndarray) -> jnp.ndarray:
    # torch ConvTranspose3d k2s2 (I, O, 2, 2, 2) -> (2, 2, 2, I, O)
    return jnp.asarray(np.transpose(w, (2, 3, 4, 0, 1)))


def _convT_as_fwd(w: np.ndarray) -> jnp.ndarray:
    # torch ConvTranspose3d k3s1p1 (I, O, 3, 3, 3) -> flipped forward DHWIO
    k = np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1]
    return jnp.asarray(np.ascontiguousarray(k))


def _torch_decoder_names(num_dec_levels: int):
    """The reference numbers decoder layers top-down: for L levels the deepest
    level uses dc{3L}(up), dc{3L-1}, dc{3L-2}, ... and dc0 is the head
    (networks.py:56-66 for L=3; 275-282 for L=2; 555-559 for L=1)."""
    names = []
    for li in range(num_dec_levels):
        base = 3 * (num_dec_levels - li)
        names.append((f"dc{base}", f"dc{base - 1}", f"dc{base - 2}"))
    return names


def convert_torch_unet_state_dict(
    sd: Dict[str, np.ndarray], spec: UNetSpec, prefix: str = "", rng_key=None
) -> dict:
    """Map a reference UNet torch state_dict onto this framework's pytree.

    Hardened for the artifacts the reference actually ships:
      * `module.`-prefixed keys (torch DataParallel training) are accepted
        transparently;
      * a `UNetClassWise` checkpoint whose per-class heads are missing — the
        reference keeps them in a plain Python list invisible to
        `state_dict()` (networks.py:182) — gets freshly initialized heads
        plus a warning instead of producing a pytree that KeyErrors at
        `apply` time.
    """
    if not any(k.startswith(prefix) and _is_unet_key(k[len(prefix):]) for k in sd):
        dp = f"{prefix}module."
        if any(k.startswith(dp) and _is_unet_key(k[len(dp):]) for k in sd):
            prefix = dp

    def seq(name, idx, leaf):
        return sd[f"{prefix}{name}.{idx}.{leaf}"]

    def grab_block(torch_name, transform):
        p = {"kernel": transform(seq(torch_name, 0, "weight"))}
        if f"{prefix}{torch_name}.0.bias" in sd:
            p["bias"] = jnp.asarray(seq(torch_name, 0, "bias"))
        if f"{prefix}{torch_name}.1.running_mean" in sd:  # batchnorm present
            p["bn"] = {
                "scale": jnp.asarray(seq(torch_name, 1, "weight")),
                "bias": jnp.asarray(seq(torch_name, 1, "bias")),
                "mean": jnp.asarray(seq(torch_name, 1, "running_mean")),
                "var": jnp.asarray(seq(torch_name, 1, "running_var")),
            }
        return p

    params: dict = {}
    for li in range(len(spec.enc)):
        params[f"enc{li}a"] = grab_block(f"ec{2 * li}", _conv_fwd)
        params[f"enc{li}b"] = grab_block(f"ec{2 * li + 1}", _conv_fwd)

    for li, (up_name, a_name, b_name) in enumerate(_torch_decoder_names(len(spec.dec))):
        params[f"dec{li}up"] = grab_block(up_name, _convT_up)
        params[f"dec{li}a"] = grab_block(a_name, _convT_as_fwd)
        params[f"dec{li}b"] = grab_block(b_name, _convT_as_fwd)

    if spec.classwise_heads:
        # Reference defect (networks.py:182): classwise heads live in a plain
        # Python list and are absent from shipped state_dicts. If present
        # under 'dc0s.{i}', convert; otherwise initialize them and warn.
        missing = []
        for c in range(spec.n_classes):
            k = f"{prefix}dc0s.{c}.weight"
            if k in sd:
                head = {"kernel": _conv_fwd(sd[k])}
                if f"{prefix}dc0s.{c}.bias" in sd:
                    head["bias"] = jnp.asarray(sd[f"{prefix}dc0s.{c}.bias"])
                params[f"head{c}"] = head
            else:
                missing.append(c)
        if missing:
            import warnings

            from oai_analysis_2_tpu.models.unet3d import _init_conv

            warnings.warn(
                f"UNetClassWise checkpoint is missing per-class heads {missing} "
                "(reference networks.py:182 keeps them outside state_dict); "
                "initializing them randomly — class outputs need fine-tuning",
                stacklevel=2,
            )
            key = jax.random.PRNGKey(0) if rng_key is None else rng_key
            for c in missing:
                key, sub = jax.random.split(key)
                params[f"head{c}"] = _init_conv(sub, 1, spec.head_in, 1, spec.bias)
    else:
        head = {"kernel": _conv_fwd(sd[f"{prefix}dc0.weight"])}
        if f"{prefix}dc0.bias" in sd:
            head["bias"] = jnp.asarray(sd[f"{prefix}dc0.bias"])
        params["head"] = head
    return params


def weight_from_truth(truths: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """Inverse class-frequency loss weights (reference utils.py:60-70)."""
    total = truths.size
    counts = jnp.array([jnp.sum(truths == c) for c in range(n_classes)], jnp.float32)
    ratio_inv = jnp.where(counts > 0, total / jnp.maximum(counts, 1), 0.0)
    return ratio_inv / jnp.sum(ratio_inv)


# -- orbax backend (optional; for large sharded registration nets) ---------------


def save_checkpoint_orbax(state: dict, path) -> None:
    """Persist a pytree state with orbax (async-capable, shardable — suited
    to multi-host GradICON training); npz remains the default format."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(str(Path(path).resolve()), state)


def load_checkpoint_orbax(path) -> dict:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(str(Path(path).resolve()))
