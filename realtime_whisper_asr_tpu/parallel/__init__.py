"""Multi-chip parallelism: device mesh + parameter sharding rules.

The reference is strictly single-device (SURVEY.md §2.4) — this package is the
TPU-native headroom path: data-parallel batch + tensor-parallel attention/MLP
sharding over ICI via ``jax.sharding`` and jit-with-shardings, with XLA
inserting the collectives.
"""

from realtime_whisper_asr_tpu.parallel.mesh import make_mesh
from realtime_whisper_asr_tpu.parallel.sharding import (
    whisper_param_shardings,
    shard_params,
    data_sharding,
    sequence_sharding,
)
from realtime_whisper_asr_tpu.parallel.pipeline import (
    make_pp_mesh,
    make_pp_train_state,
    make_pp_train_step,
    pipeline_blocks,
    pp_decode_full,
    pp_encode,
    pp_param_shardings,
)
