"""Model families: Whisper (encoder-decoder ASR) and streaming VAD."""
