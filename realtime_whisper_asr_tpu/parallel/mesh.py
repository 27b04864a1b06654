"""Device mesh construction for (data, model) parallelism."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Mesh over the first ``n_devices`` devices, factored (data × model).

    ``model_parallel`` defaults to the largest power of two ≤ min(n, 4) that
    divides n — tensor parallelism rides ICI within a host; the remainder is
    the data axis.
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if model_parallel is None:
        model_parallel = 1
        for cand in (4, 2):
            if n % cand == 0 and cand <= n:
                model_parallel = cand
                break
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)
