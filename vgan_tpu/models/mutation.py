"""HaploCart's site-specific mtDNA mutation model.

Reimplements `get_p_obs_base` / `get_p_no_seq_error_mapping`
(`src/get_p_obs_base.cpp:3-69`) as precomputed per-pangenome-position
tables so the device kernel is a gather + fused multiply.

QUIRKS preserved (they shape every published HaploCart call):
* `(2/3)`, `(1/3)`, `(22/23)`, `(1/46)` are C++ *integer* divisions and
  evaluate to 0, so the protein-coding mu collapses to 0 and the
  transversion/transition weights tv = ts = 0
  (`src/get_p_obs_base.cpp:50,65-66`). Hence
  ``p_obs_base = (1-30*mu)^generations * (1 - epsilon)``.
* generations = 8, years/generation = 30 (`src/update_likelihood`
  call chain; `src/get_p_obs_base.cpp:62`).
"""
from __future__ import annotations

import numpy as np

GENERATIONS = 8
PANGENOME_LEN = 16571  # rCRS coordinates are 1-based <= 16569, +1 offset


def mu_table(n: int = PANGENOME_LEN) -> np.ndarray:
    """Per-pangenome-base mutation rate mu (already x30 per generation),
    region table from `src/get_p_obs_base.cpp:44-62`."""
    mu = np.full(n, 2.48537e-8, dtype=np.float64)

    def setr(lo, hi, v):
        mu[lo : min(hi + 1, n)] = v

    setr(57, 372, 1.64273e-7)  # HVS I
    setr(1, 56, 2.29640e-8)  # HVS II
    setr(373, 576, 2.29640e-8)
    setr(16384, 16569, 1.54555e-8)  # control region remainder
    for lo, hi in [
        (3307, 4262), (4470, 5511), (5904, 7445), (7586, 8269),
        (8366, 9990), (10059, 10403), (10470, 12137), (12337, 14673),
        (14747, 15886),
    ]:
        setr(lo, hi, 0.0)  # protein coding: mu = 8.8764e-9*(2/3)*... == 0 (int div)
    for lo, hi in [
        (577, 647), (1602, 1670), (3230, 3304), (4263, 4400), (4402, 4469),
        (5512, 5579), (5587, 5654), (5657, 5728), (5761, 5891), (7446, 7514),
        (7518, 7585), (8295, 8364), (15888, 15953), (15956, 16023),
    ]:
        setr(lo, hi, 6.91285e-9)  # tRNA
    setr(648, 1601, 6.91285e-9)  # rRNA
    setr(1671, 3229, 6.91285e-9)
    return mu * 30.0


def match_prob_table(n: int = PANGENOME_LEN) -> np.ndarray:
    """(1 - mu)^generations per pangenome base; p_obs_base is then
    match * (1 - epsilon) because tv = ts = 0 (see module doc)."""
    return (1.0 - mu_table(n)) ** GENERATIONS


# Background mitogenome base frequencies (`src/haplocart_functions.cpp:81-98`)
BACKGROUND_FREQ = np.array([0.27532, 0.30044, 0.16644, 0.25780, 0.25], dtype=np.float64)


def background_freq(code: int) -> float:
    """code in dna codes; non-ACGT gets the 0.25 default."""
    return float(BACKGROUND_FREQ[code]) if code < 4 else 0.25
