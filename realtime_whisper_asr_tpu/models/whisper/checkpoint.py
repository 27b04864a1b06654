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


def load_checkpoint(path: str, dtype=None) -> tuple[WhisperConfig, Params]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, _CONFIG_FILE)) as f:
        cfg = WhisperConfig(**json.load(f))
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, _PARAMS_DIR))
    if dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype.kind == "f" else x,
            params,
        )
    return cfg, params


def is_native_checkpoint(path: str) -> bool:
    return os.path.exists(os.path.join(path, _CONFIG_FILE))
