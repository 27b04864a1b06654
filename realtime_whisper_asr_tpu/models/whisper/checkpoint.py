"""Framework-native checkpoint save/load (orbax).

The reference's "checkpointing" is disk-cached CTranslate2 downloads
(`一键实时识别麦克风.py:1097,1115`); here models (including fine-tuned or
int8-quantized params from quant.py) persist via orbax with the architecture
config alongside, so `TPUWhisperASR(checkpoint_dir=...)` restores either an
HF-layout directory (load.py) or a native one (this module).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax

from realtime_whisper_asr_tpu.models.whisper.config import WhisperConfig
from realtime_whisper_asr_tpu.models.whisper.model import Params

_CONFIG_FILE = "rtwa_config.json"
_PARAMS_DIR = "params"


def save_checkpoint(path: str, params: Params, cfg: WhisperConfig) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _CONFIG_FILE), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, _PARAMS_DIR), params, force=True)
    ckptr.wait_until_finished()


def _cast_floats(tree, dtype):
    """Cast float leaves to ``dtype``, EXCEPT inside int8-quantized weights
    ({"q": int8, "s": f32} from quant.py): downcasting the f32 scales to bf16
    would dequantize to different weights than the in-memory quantization the
    checkpoint was saved from, silently breaking token parity."""
    if isinstance(tree, dict):
        if set(tree) == {"q", "s"}:
            return tree
        return {k: _cast_floats(v, dtype) for k, v in tree.items()}
    if hasattr(tree, "dtype") and tree.dtype.kind == "f":
        return tree.astype(dtype)
    return tree


def load_checkpoint(path: str, dtype=None) -> tuple[WhisperConfig, Params]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, _CONFIG_FILE)) as f:
        cfg = WhisperConfig(**json.load(f))
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, _PARAMS_DIR))
    if dtype is not None:
        params = _cast_floats(params, dtype)
    return cfg, params


def is_native_checkpoint(path: str) -> bool:
    return os.path.exists(os.path.join(path, _CONFIG_FILE))


# ---------------------------------------------------------------------------
# sharded checkpoints (multi-chip training runs)
# ---------------------------------------------------------------------------


def load_checkpoint_sharded(path: str, mesh, dtype=None):
    """Restore params directly into the mesh's tensor-parallel layout.

    Orbax restores each shard to its owning device (no single-host gather —
    the property that matters when params exceed one host's memory on real
    multi-host meshes). Shapes/dtypes come from the checkpoint metadata;
    placements from parallel.sharding.whisper_param_shardings.
    """
    import orbax.checkpoint as ocp

    from realtime_whisper_asr_tpu.parallel.sharding import whisper_param_shardings

    path = os.path.abspath(path)
    with open(os.path.join(path, _CONFIG_FILE)) as f:
        cfg = WhisperConfig(**json.load(f))
    ckptr = ocp.StandardCheckpointer()
    item = os.path.join(path, _PARAMS_DIR)
    meta = ckptr.metadata(item).item_metadata.tree  # plain dict of ArrayMetadata
    shardings = whisper_param_shardings(mesh)
    abstract = jax.tree.map(
        lambda m, s: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=s),
        meta, shardings,
    )
    params = ckptr.restore(item, abstract)
    if dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype.kind == "f" else x,
            params,
        )
    return cfg, params


def save_train_state(path: str, state) -> None:
    """Persist a train/TrainState (params + optimizer moments + step) —
    sharded arrays are written shard-by-shard by orbax."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_train_state(path: str, template_state):
    """Resume a training run: restore into the exact array layouts of a
    freshly-built template (make_train_state under the same mesh), so every
    leaf — including Adam moments — lands on its owning devices.

    Leaves the template left uncommitted (optax counters are plain scalars on
    the default device) restore REPLICATED over the template's mesh — a
    committed single-device scalar would make the jitted step reject the
    state as device-incompatible.
    """
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec

    ckptr = ocp.StandardCheckpointer()
    mesh = next(
        (x.sharding.mesh for x in jax.tree.leaves(template_state)
         if isinstance(getattr(x, "sharding", None), NamedSharding)),
        None,
    )

    def _abstract(x):
        if not hasattr(x, "sharding"):
            return x
        sh = x.sharding
        if not isinstance(sh, NamedSharding) and mesh is not None:
            sh = NamedSharding(mesh, PartitionSpec(*([None] * x.ndim)))
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)

    return ckptr.restore(os.path.abspath(path), jax.tree.map(_abstract, template_state))
