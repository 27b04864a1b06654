"""Fine-tuning: sharded training step (dp × tp) for the JAX Whisper."""

from realtime_whisper_asr_tpu.train.train_step import (
    make_train_state,
    make_sharded_train_step,
    loss_fn,
)
