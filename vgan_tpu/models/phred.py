"""PHRED quality models.

Mirrors `src/miscfunc.h:180-216`:
* `get_p_seq_error(Q)` = 10^(-Q/10) for Q>2 else 0.25
* `qscore_vec()`       = that, tabulated for Q in [0,100)
  (the table's Q>=2 branch still calls get_p_seq_error, whose own Q>2
  test floors Q<=2 at 0.25, so the table is simply p_seq_error(Q))
* `incorrect_mapping_vec()` = 10^(-Q/10) for Q in [0,100)
  (`src/haplocart_functions.cpp:101-107`)
"""
from __future__ import annotations

import numpy as np

QMAX = 100


def p_seq_error(Q: int) -> float:
    if Q > 2:
        return 10.0 ** (-Q * 0.1)
    return 0.25


def qscore_vec() -> np.ndarray:
    return np.array([p_seq_error(Q) for Q in range(QMAX)], dtype=np.float64)


def incorrect_mapping_vec() -> np.ndarray:
    Q = np.arange(QMAX, dtype=np.float64)
    return 10.0 ** (-Q * 0.1)
