"""Scalar statistics implemented from scratch (scipy is not available
in this environment): one-sided Fisher exact test and logsumexp.

Fisher (alternative='greater') matches scipy.stats.fisher_exact
semantics for a 2×2 table [[a, b], [c, d]]: the p-value is the
hypergeometric tail P(X >= a) with margins fixed.
"""

from __future__ import annotations

import math


def _log_comb(n: int, k: int) -> float:
    if k < 0 or k > n:
        return float("-inf")
    return (
        math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)
    )


def hypergeom_logpmf(k: int, M: int, n: int, N: int) -> float:
    """log P(X = k) drawing N from population M with n successes."""
    return _log_comb(n, k) + _log_comb(M - n, N - k) - _log_comb(M, N)


def fisher_exact_greater(a: int, b: int, c: int, d: int) -> float:
    """One-sided (greater) Fisher exact p-value for [[a, b], [c, d]]."""
    M = a + b + c + d
    n = a + b          # row-1 margin
    N = a + c          # col-1 margin
    k_max = min(n, N)
    logs = [hypergeom_logpmf(k, M, n, N) for k in range(a, k_max + 1)]
    finite = [x for x in logs if x > float("-inf")]
    if not finite:
        return 0.0
    m = max(finite)
    p = math.exp(m) * sum(math.exp(x - m) for x in finite)
    return min(p, 1.0)


def logsumexp(values) -> float:
    finite = [v for v in values if v > float("-inf")]
    if not finite:
        return float("-inf")
    m = max(finite)
    return m + math.log(sum(math.exp(v - m) for v in finite))
