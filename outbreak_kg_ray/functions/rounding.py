"""Half-away-from-zero rounding, matching DuckDB / ANSI-SQL ROUND().

Python ``round()`` and ``np.round`` are banker's (half-to-even);
DuckDB rounds halves away from zero. On exact decimal ties
(e.g. 0.5290625 at 6 dp) the two disagree, which breaks value-hash
comparison against the SQL oracle (VERDICT.md round 1: quality_scores).
Every float that is rounded for cross-engine comparison must go
through these helpers.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def round_half_away(x: float, ndigits: int = 6) -> float:
    """Scalar half-away-from-zero round (DuckDB semantics)."""
    scale = 10.0 ** ndigits
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def np_round_half_away(a: np.ndarray, ndigits: int = 6) -> np.ndarray:
    """Vectorized half-away-from-zero round over a float array."""
    scale = 10.0 ** ndigits
    a = np.asarray(a, dtype=np.float64)
    return np.copysign(np.floor(np.abs(a) * scale + 0.5), a) / scale


def pa_round_half_away(col, ndigits: int = 6) -> pa.Array:
    """Arrow column round with DuckDB semantics, computed
    arithmetically as ``sign * floor(|x|*scale + 0.5) / scale``.

    pc.round(round_mode="half_towards_infinity") is NOT used: its
    internal path differs from DuckDB's ``round(x*scale)/scale`` by
    1 ULP on some inputs (observed: 527868276.59000003 vs
    527868276.59 on a pricing_summary sum), which breaks value-hash
    parity. floor/divide below reproduce DuckDB's double math
    operation-for-operation."""
    scale = pa.scalar(10.0 ** ndigits, pa.float64())
    scaled = pc.multiply(pc.cast(col, pa.float64()), scale)
    mag = pc.floor(pc.add(pc.abs(scaled), pa.scalar(0.5, pa.float64())))
    signed = pc.if_else(pc.less(scaled, pa.scalar(0.0)), pc.negate(mag), mag)
    return pc.divide(signed, scale)
