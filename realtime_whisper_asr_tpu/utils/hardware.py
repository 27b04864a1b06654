"""TPU/CPU hardware detection and model recommendation.

Replaces the reference's nvidia-smi/nvcc parsing (`一键实时识别麦克风.py:
130-193`) and VRAM-based model recommendation (:254-330) with jax device
topology and HBM-based sizing.
"""

from __future__ import annotations

from typing import Any

# (model, est. weights GiB in bf16, note) — from the public size table the
# reference also surfaces (一键…py:258-263), halved for bf16 vs fp32.
MODEL_MEMORY_GIB = {
    "tiny": 0.08,
    "base": 0.15,
    "small": 0.5,
    "medium": 1.6,
    "large-v3": 3.2,
    "large-v3-turbo": 1.7,
}


def detect_hardware() -> dict[str, Any]:
    import jax

    devices = jax.devices()
    kind = devices[0].platform if devices else "cpu"
    info: dict[str, Any] = {
        "platform": kind,
        "device_kind": getattr(devices[0], "device_kind", "unknown") if devices else "none",
        "n_devices": len(devices),
    }
    try:
        stats = devices[0].memory_stats() or {}
        info["hbm_bytes"] = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    except Exception:
        info["hbm_bytes"] = None
    if info.get("hbm_bytes") is None and kind == "tpu":
        info["hbm_bytes"] = 16 * 2**30  # v5e default
    return info


def recommend_config(hw: dict[str, Any]) -> dict[str, Any]:
    """Pick the largest model whose weights + KV + activations fit comfortably."""
    hbm = hw.get("hbm_bytes") or 0
    gib = hbm / 2**30 if hbm else 0
    if hw.get("platform") != "tpu":
        return {"model": "tiny", "dtype": "float32", "reason": "CPU fallback"}
    for model in ("large-v3", "medium", "small", "base", "tiny"):
        need = MODEL_MEMORY_GIB.get(model, 1e9) * 3  # weights + cache + headroom
        if gib >= need:
            return {"model": model, "dtype": "bfloat16",
                    "reason": f"{gib:.0f} GiB HBM ≥ {need:.1f} GiB needed"}
    return {"model": "tiny", "dtype": "bfloat16", "reason": "minimal HBM"}
