"""Runtime correctness guards.

The reference's correctness net is NaN/Inf/positivity assertions
sprinkled through its hot loops (SURVEY.md §5: every computed
log-likelihood is checked, e.g. `src/getLCAfromGAM.h:242,257,277,
355-357`, `src/MCMC.h:165-168,270-278`, simplex-sum assert
`src/MCMC.cpp:1164-1169`). Device batching moves the equivalent checks
to batch boundaries where they cost O(batch) instead of O(bases):
these helpers raise RuntimeError exactly like the reference's throws.
"""
from __future__ import annotations

import numpy as np

LOGLIK_TOL = 1e-8  # reference gate: `log_lik_marg > 1e-8` throws


def check_finite(x, what: str) -> None:
    a = np.asarray(x)
    if not np.isfinite(a).all():
        bad = int((~np.isfinite(a)).sum())
        raise RuntimeError(
            f"calculated {what} is nan/inf ({bad} of {a.size} values)"
        )


def check_loglik(x, what: str, tol: float = LOGLIK_TOL) -> None:
    """Log-likelihoods must be finite and non-positive (within tol),
    mirroring `if(isnan(..)||isinf(..)|| .. > 1e-8) throw`
    (`src/getLCAfromGAM.h:355-357`)."""
    a = np.asarray(x)
    if not np.isfinite(a).all():
        raise RuntimeError(f"calculated {what} is nan")
    if a.size and float(a.max()) > tol:
        raise RuntimeError(
            f"calculated {what} is positive ({float(a.max()):g} > {tol:g})"
        )


def check_simplex(x, what: str, atol: float = 1e-6) -> None:
    """Abundance vectors must sum to 1 (`src/MCMC.cpp:1164-1169`)."""
    a = np.asarray(x)
    s = a.sum(axis=-1)
    if not np.allclose(s, 1.0, atol=atol):
        raise RuntimeError(
            f"{what} does not sum to 1 (max deviation "
            f"{float(np.abs(s - 1.0).max()):g})"
        )
