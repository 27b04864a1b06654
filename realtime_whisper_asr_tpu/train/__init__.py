"""Fine-tuning: sharded training step (dp × tp) + manifest data pipeline."""

from realtime_whisper_asr_tpu.train.train_step import (
    TrainState,
    make_train_state,
    make_sharded_train_step,
    loss_fn,
)
from realtime_whisper_asr_tpu.train.data import (
    DataPipeline,
    ManifestEntry,
    prepare_batch,
    read_manifest,
    tokenize_example,
)
