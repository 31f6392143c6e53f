"""Shared hash-join partition sizing policy.

Ray's JoinOperator spawns an actor pool per join — at small scale a
fixed high partition count pays actor-spawn latency for nothing, at
large scale too few partitions makes each shuffle block exceed the
target block size. One partition per ~250k joined input rows, clamped
2..64; cluster-sized runs should pass an explicit count keyed to the
cluster, not the input. Front-ends: footer row counts
(relational._adaptive_join_partitions) and materialized-dataset
metadata (dedup._join_partitions_for) both resolve to this policy so
tuning cannot drift between modules.
"""

from __future__ import annotations


def adaptive_partitions(
    n_rows: int, *, rows_per_partition: int = 250_000,
    lo: int = 2, hi: int = 64,
) -> int:
    return max(lo, min(hi, n_rows // rows_per_partition + 1))
