"""Device-side DSP ops: log-mel frontend, feature extractors, filters."""

from realtime_whisper_asr_tpu.ops.mel import mel_filterbank, hann_window, dft_matrices
from realtime_whisper_asr_tpu.ops.logmel import (
    log_mel_spectrogram,
    log_mel_spectrogram_reference,
    N_FFT,
    HOP_LENGTH,
)
from realtime_whisper_asr_tpu.ops.features import dedup_features, cosine_similarity01, relative_similarity
from realtime_whisper_asr_tpu.ops.dsp import bandpass_filter, time_stretch, fir_bandpass
