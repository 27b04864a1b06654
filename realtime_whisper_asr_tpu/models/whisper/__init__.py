"""JAX Whisper: config, model, checkpoint loading, decoding, timestamps."""

from realtime_whisper_asr_tpu.models.whisper.config import (
    WhisperConfig,
    PRESETS,
    LANGUAGES,
    get_config,
)
from realtime_whisper_asr_tpu.models.whisper.model import (
    init_params,
    encode,
    decode_full,
    decode_step,
    decode_span,
    init_cache,
    precompute_cross_kv,
    param_count,
    DecoderCache,
)
from realtime_whisper_asr_tpu.models.whisper.load import (
    params_from_hf_state_dict,
    load_checkpoint_dir,
    config_from_hf,
)
