"""Device channel warmup.

On the axon (tunneled) TPU backend the FIRST device→host transfer of a process
pays 150–300 s of channel establishment (size-independent; subsequent
transfers are ~0.03 s). ``start_background_warmup`` fires that transfer from a
daemon thread as early as possible so it overlaps model init and compiles;
``wait`` joins before the first latency-sensitive measurement.
"""

from __future__ import annotations

import threading

_warmup_thread: threading.Thread | None = None


def _do_warmup():
    import numpy as np
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.float32)
    np.asarray(x + 1.0)


def start_background_warmup() -> threading.Thread:
    global _warmup_thread
    if _warmup_thread is None:
        _warmup_thread = threading.Thread(target=_do_warmup, name="rtwa-warmup", daemon=True)
        _warmup_thread.start()
    return _warmup_thread


def wait_for_warmup(timeout: float | None = None) -> None:
    if _warmup_thread is not None:
        _warmup_thread.join(timeout)
