"""C-kernel parity + timestamp extraction tests."""

import numpy as np
import pytest

from realtime_whisper_asr_tpu.models.whisper import timestamps as TS
from realtime_whisper_asr_tpu.native import get_lib


def test_native_lib_builds():
    assert get_lib() is not None, "cc build failed in this environment"


@pytest.mark.parametrize("seed,n,m", [(0, 5, 9), (1, 40, 200), (2, 96, 1500), (3, 1, 4)])
def test_dtw_c_matches_python(seed, n, m):
    rng = np.random.default_rng(seed)
    cost = rng.standard_normal((n, m))
    ti_c, fj_c = TS.dtw_path(cost)
    ti_p, fj_p = TS._dtw_path_py(cost)
    np.testing.assert_array_equal(ti_c, ti_p)
    np.testing.assert_array_equal(fj_c, fj_p)


def test_dtw_path_properties():
    rng = np.random.default_rng(4)
    cost = rng.standard_normal((10, 50))
    ti, fj = TS.dtw_path(cost)
    assert ti[0] == 0 and fj[0] == 0
    assert ti[-1] == 9 and fj[-1] == 49
    assert np.all(np.diff(ti) >= 0) and np.all(np.diff(fj) >= 0)  # monotonic
    assert np.all((np.diff(ti) + np.diff(fj)) >= 1)  # always advances


def test_median_filter_c_matches_numpy():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((8, 40))
    out_c = TS.median_filter(x, 7)
    pad = 3
    xp = np.pad(x, [(0, 0), (pad, pad)], mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(xp, 7, axis=-1)
    np.testing.assert_allclose(out_c, np.median(win, axis=-1))


def test_word_timestamps_monotonic_from_synthetic_attention():
    """A diagonal-ish attention pattern must produce ordered word times."""
    n_tok, n_frames = 12, 300
    xattn = np.zeros((n_tok, 1500))
    for i in range(n_tok):
        center = int((i + 0.5) * n_frames / n_tok)
        xattn[i, max(0, center - 5) : center + 5] = 1.0

    class Tok:
        class cfg:
            eot = 50257

        def split_to_word_tokens(self, ids, language=None):
            return [f" w{i}" for i in ids], [[i] for i in ids]

    words = TS.word_timestamps(list(range(100, 112)), xattn, Tok(), n_frames)
    assert len(words) == 12
    begs = [b for b, e, w in words]
    ends = [e for b, e, w in words]
    assert begs == sorted(begs)
    assert all(e >= b for b, e in zip(begs, ends))
    assert ends[-1] <= n_frames * 0.02 + 0.1
