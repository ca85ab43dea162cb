"""Pallas SW scoring kernel vs the host oracle."""
import numpy as np
import pytest

from vgan_tpu.mapper.sw_pallas import sw_scores, sw_scores_reference


def _make_batch(rng, B=16, R=64, W=128):
    read = np.full((B, R), 255, dtype=np.int32)
    win = np.full((B, W), 255, dtype=np.int32)
    rlen = rng.integers(20, R, size=B).astype(np.int32)
    wlen = rng.integers(60, W, size=B).astype(np.int32)
    for b in range(B):
        w = rng.integers(0, 4, size=wlen[b])
        win[b, : wlen[b]] = w
        # plant the read inside the window with mutations/indels
        start = rng.integers(0, max(1, wlen[b] - rlen[b])) if wlen[b] > rlen[b] else 0
        r = w[start : start + rlen[b]].copy()
        if len(r) < rlen[b]:
            r = np.concatenate([r, rng.integers(0, 4, size=rlen[b] - len(r))])
        mut = rng.random(rlen[b]) < 0.05
        r[mut] = rng.integers(0, 4, size=int(mut.sum()))
        read[b, : rlen[b]] = r
    return read, win, rlen, wlen


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    read, win, rlen, wlen = _make_batch(rng)
    got = np.asarray(sw_scores(read, win, rlen, wlen, interpret=True))
    want = sw_scores_reference(read, win, rlen, wlen)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_kernel_handles_unrelated_sequences():
    rng = np.random.default_rng(7)
    B, R, W = 8, 48, 96
    read = rng.integers(0, 4, size=(B, R)).astype(np.int32)
    win = rng.integers(0, 4, size=(B, W)).astype(np.int32)
    rlen = np.full(B, R, dtype=np.int32)
    wlen = np.full(B, W, dtype=np.int32)
    got = np.asarray(sw_scores(read, win, rlen, wlen, interpret=True))
    want = sw_scores_reference(read, win, rlen, wlen)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_xla_twin_matches_oracle(seed):
    from vgan_tpu.mapper.sw_pallas import sw_scores_xla

    rng = np.random.default_rng(seed)
    read, win, rlen, wlen = _make_batch(rng)
    got = np.asarray(sw_scores_xla(read, win, rlen, wlen))
    want = sw_scores_reference(read, win, rlen, wlen)
    np.testing.assert_allclose(got, want, atol=1e-5)
