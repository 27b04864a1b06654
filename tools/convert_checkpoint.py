"""Convert a Whisper checkpoint into a native orbax checkpoint, optionally
int8-quantizing it — the deployment artifact: loads in seconds with NO
load-time quantization pass (the analog of CTranslate2's pre-quantized model
dirs the reference loads, `asr_components.py:232-265`).

    python tools/convert_checkpoint.py /path/to/hf_whisper out_dir --quantize int8
    python tools/convert_checkpoint.py native_ckpt out_dir --quantize int8-all

``src`` may be an HF-layout dir (config.json + *.safetensors) or an existing
native checkpoint (re-saved with the requested quantization). Scales stay f32
in the artifact (checkpoint._cast_floats keeps them exact on load), so a
pre-quantized checkpoint decodes token-identically to quantize-at-load.
"""

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="HF-layout dir (config.json + *.safetensors) or native checkpoint dir")
    p.add_argument("dst", help="output native checkpoint dir")
    p.add_argument("--quantize", choices=["int8", "int8-all", "none"], default="none")
    p.add_argument("--dtype", choices=["bfloat16", "float32"], default="bfloat16")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from realtime_whisper_asr_tpu.models.whisper import load_checkpoint_dir
    from realtime_whisper_asr_tpu.models.whisper.checkpoint import (
        is_native_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from realtime_whisper_asr_tpu.models.whisper.quant import (
        detect_quantization,
        quantize_all,
        quantize_decoder,
    )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if is_native_checkpoint(args.src):
        cfg, params = load_checkpoint(args.src, dtype)
    else:
        cfg, params = load_checkpoint_dir(args.src, dtype)
    if args.quantize == "int8":
        params = quantize_decoder(params)
    elif args.quantize == "int8-all":
        params = quantize_all(params)
    save_checkpoint(args.dst, params, cfg)
    # carry the sidecar files the runtime reads from the checkpoint dir:
    # alignment heads (word timestamps) + tokenizer files (real BPE text) —
    # without these the converted checkpoint silently degrades to default
    # heads and the mock tokenizer (found by tools/checkpoint_drill.py)
    import os
    import shutil

    for name in ("generation_config.json", "tokenizer.json", "vocab.json",
                 "merges.txt", "tokenizer_config.json", "special_tokens_map.json",
                 "added_tokens.json", "normalizer.json"):
        src_f = os.path.join(args.src, name)
        if os.path.exists(src_f):
            shutil.copy2(src_f, os.path.join(args.dst, name))
    print(f"saved {cfg.name} ({args.dtype}, quantization={detect_quantization(params)}) -> {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
