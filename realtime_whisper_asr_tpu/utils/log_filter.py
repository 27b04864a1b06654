"""Known-noise log suppression (reference FilteredLogFile, 一键…py:1970-1981).

The reference wraps stderr to hide whisper_streaming's noisy internals; here
the equivalent is a logging filter dropping known-benign records (the axon
"experimental platform" banner, repetitive retrace notices) from console
output while file logs keep everything.
"""

from __future__ import annotations

import logging

_NOISE_SUBSTRINGS = (
    "Platform 'axon' is experimental",
    "Very slow compile",
)


class KnownNoiseFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not any(s in msg for s in _NOISE_SUBSTRINGS)


def install(logger_names: tuple[str, ...] = ("jax._src.xla_bridge",)) -> None:
    for name in logger_names:
        logging.getLogger(name).addFilter(KnownNoiseFilter())
