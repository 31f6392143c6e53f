"""Temporal join operators Ray Data lacks natively — as-of join and
date-band (interval) join — composed per SURVEY.md §2 custom-operator
guidance: key-partitioned ``groupby().map_groups`` with a sorted
merge for the as-of case, and a calendar-bounded broadcast prefix-sum
for the band case.

Reference parity: the reference's only temporal lookup is the J1
alert→outbreak timestamp join (kg/build.py); these generalize it to
the as-of / interval semantics a training-data pipeline needs
(event sessionization, windowed joins).

Scale notes (documented partitioning assumptions):

* ``asof_join_events_orders`` shuffles both inputs ONCE by the join
  key (user/customer); the match is a WHOLE-PARTITION vectorized
  sweep (rank-compressed (user, time) composite + one
  ``searchsorted``) — zero per-group Python, total work
  ``O(P log P)`` per partition of P rows. Hot keys are bounded by a
  single user's history — the same assumption every keyed
  sessionizer makes. Nothing O(corpus) on the driver.
* ``order_ship_window`` pre-aggregates the probe side to one row per
  distinct ship date BEFORE any pairing. The daily table is
  calendar-bounded (a decade of days ≈ 3.7k rows regardless of
  corpus size), so it is broadcast via ``ray.put`` and each order
  batch answers its window with two vectorized ``searchsorted``
  lookups against prefix sums — zero shuffle, zero pair explosion.
  The naive order×lineitem inequality join this replaces is
  O(|orders| × window-density) and melts at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from outbreak_kg_ray.functions.rounding import np_round_half_away
from outbreak_kg_ray.sources.io import read_parquet_clean

_TS = pa.timestamp("us")

_ASOF_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("ts", _TS),
        ("event_id", pa.int64()),
        ("o_orderkey", pa.int64()),
        ("o_totalprice", pa.float64()),
        ("side", pa.int8()),
    ]
)

_ASOF_OUT = {
    "event_id": "int64",
    "user_id": "int64",
    "o_orderkey": "int64",
    "o_totalprice": "float64",
}


def _empty_asof() -> pa.Table:
    return pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_totalprice", pa.float64()),
        ]
    ).empty_table()


def asof_join_events_orders(sf_dir: str):
    """For each event, the most recent order (``o_orderdate <= ts``)
    of the same user — the classic as-of join.

    Determinism: orders are first reduced to one row per
    (custkey, orderdate) keeping the max ``o_orderkey`` (the SQL
    oracle applies the same reduction), so date ties cannot flip the
    matched row across engines.

    Composition: both sides are projected onto one tagged-union
    schema, unioned, hash-partitioned by ``user_id`` in a single
    ``groupby``, and merged per key with a sorted ``searchsorted``
    — the standard distributed as-of shape when the engine has no
    native ASOF operator.
    """
    events = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def tag_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "ts": t.column("ts").cast(_TS),
                "event_id": t.column("event_id").cast(pa.int64()),
                "o_orderkey": pa.nulls(n, pa.int64()),
                "o_totalprice": pa.nulls(n, pa.float64()),
                "side": pa.array([1] * n, pa.int8()),
            },
            schema=_ASOF_SCHEMA,
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "user_id": t.column("o_custkey").cast(pa.int64()),
                "ts": t.column("o_orderdate").cast(_TS),
                "event_id": pa.nulls(n, pa.int64()),
                "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "o_totalprice": t.column("o_totalprice").cast(pa.float64()),
                "side": pa.array([0] * n, pa.int8()),
            },
            schema=_ASOF_SCHEMA,
        )

    unioned = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def match_partition(g: pa.Table) -> pa.Table:
        # WHOLE-PARTITION vectorized as-of: all users at once, zero
        # per-group Python. Order timestamps are rank-compressed per
        # partition so (user, time) collapses to ONE overflow-safe
        # int64 composite — a single searchsorted answers every
        # event's "latest order ≤ ts, same user" probe.
        side = g.column("side").to_numpy(zero_copy_only=False)
        o_mask = side == 0
        e_mask = side == 1
        if not o_mask.any() or not e_mask.any():
            return _empty_asof()
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        uniq_u, inv_u = np.unique(uid, return_inverse=True)
        okey = g.column("o_orderkey").to_numpy(zero_copy_only=False)

        # one order per (user, date): max orderkey wins — lexsort by
        # (user, date, key) then keep the last row of each pair
        o_ts = ts[o_mask]
        o_u = inv_u[o_mask]
        o_key = okey[o_mask]
        o_price = g.column("o_totalprice").to_numpy(
            zero_copy_only=False
        )[o_mask]
        order = np.lexsort((o_key, o_ts, o_u))
        o_ts, o_u = o_ts[order], o_u[order]
        o_key, o_price = o_key[order], o_price[order]
        last = np.ones(len(o_ts), dtype=bool)
        if len(o_ts) > 1:
            last[:-1] = (o_u[1:] != o_u[:-1]) | (o_ts[1:] != o_ts[:-1])
        o_ts, o_u = o_ts[last], o_u[last]
        o_key, o_price = o_key[last], o_price[last]

        # rank-compress order timestamps: R+2 distinct slots bound the
        # composite by |users| × (|order dates|+2) ≤ partition rows²
        uniq_ts = np.unique(o_ts)
        stride = len(uniq_ts) + 2
        comb_o = o_u.astype(np.int64) * stride + (
            np.searchsorted(uniq_ts, o_ts) + 1
        )
        e_ts = ts[e_mask]
        e_u = inv_u[e_mask]
        # r_e = #distinct order dates ≤ event ts ⇒ qualifying orders
        # are exactly the user's slots 1..r_e
        r_e = np.searchsorted(uniq_ts, e_ts, side="right")
        idx = np.searchsorted(
            comb_o, e_u.astype(np.int64) * stride + r_e, side="right"
        ) - 1
        keep = (idx >= 0) & (comb_o[np.maximum(idx, 0)] // stride == e_u)
        if not keep.any():
            return _empty_asof()
        idx = idx[keep]
        eid = g.column("event_id").to_numpy(zero_copy_only=False)[
            e_mask
        ][keep]
        return pa.table(
            {
                "event_id": pa.array(eid.astype(np.int64), pa.int64()),
                "user_id": pa.array(uniq_u[e_u[keep]]),
                "o_orderkey": pa.array(
                    o_key[idx].astype(np.int64), pa.int64()
                ),
                "o_orderdate": pa.array(o_ts[idx]).cast(
                    pa.timestamp("us")
                ),
                "o_totalprice": pa.array(o_price[idx], pa.float64()),
            }
        )

    from outbreak_kg_ray.sources.io import pinned_schema
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    return pinned_schema(
        keyed_partitions(unioned, ["user_id"], match_partition),
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_totalprice", pa.float64()),
            ]
        ),
    )


def sessionize_events(sf_dir: str, *, gap_minutes: int = 30):
    """Gap-based sessionization: per user, a new session starts when
    the time since the previous event exceeds ``gap_minutes``. Emits
    one row per event with its session ordinal (1-based per user) —
    the standard clickstream / training-data session operator.

    Shape: ONE hash shuffle by ``user_id`` (the same partitioning key
    the as-of join uses), then a vectorized per-group pass: sort,
    diff, cumsum — no per-row Python. Group size is bounded by a
    single user's history. The SQL oracle is the classic
    lag → gap-flag → running-sum window pair.
    """
    events = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    gap = np.timedelta64(gap_minutes * 60, "s")

    def assign(g: pa.Table) -> pa.Table:
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        take = pa.array(order, pa.int64())
        ts = ts[order]
        new_session = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new_session[1:] = (ts[1:] - ts[:-1] > gap).astype(np.int64)
        return pa.table(
            {
                "event_id": g.column("event_id").take(take),
                "user_id": g.column("user_id").take(take),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "session_id": pa.array(
                    np.cumsum(new_session), pa.int64()
                ),
            }
        )

    return events.groupby("user_id").map_groups(
        assign, batch_format="pyarrow"
    )


def order_ship_window(sf_dir: str, *, window_days: int = 30):
    """Per order: how many lineitems (corpus-wide) shipped in
    ``[o_orderdate, o_orderdate + window_days)`` and their total
    quantity — a date-band (interval) join.

    Shape: the probe side collapses to one row per distinct ship
    date FIRST (a groupby whose output is calendar-bounded), prefix
    sums are broadcast once with ``ray.put``, and each order batch
    answers its band with two ``searchsorted`` calls. ``l_quantity``
    is integer-valued in this corpus, so day-bucketed partial sums
    reassociate without float drift vs the oracle's direct sum.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    daily = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_quantity"],
        )
        .groupby("l_shipdate")
        .aggregate(
            Count(alias_name="n"), Sum("l_quantity", alias_name="q")
        )
    )
    # calendar-bounded: one row per distinct ship date (~3.7k/decade)
    rows = sorted(daily.take_all(), key=lambda r: r["l_shipdate"])
    days = np.array([r["l_shipdate"] for r in rows], dtype="datetime64[us]")
    cum_n = np.concatenate(
        [[0], np.cumsum([r["n"] for r in rows], dtype=np.int64)]
    )
    cum_q = np.concatenate(
        [[0.0], np.cumsum([r["q"] for r in rows], dtype=np.float64)]
    )
    ref = ray.put((days, cum_n, cum_q))
    delta = np.timedelta64(window_days, "D").astype("timedelta64[us]")

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def window(t: pa.Table) -> pa.Table:
        d, cn, cq = ray.get(ref)
        od = t.column("o_orderdate").cast(_TS).to_numpy()
        lo = np.searchsorted(d, od, side="left")
        hi = np.searchsorted(d, od + delta, side="left")
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderdate": t.column("o_orderdate").cast(_TS),
                "n_shipped": pa.array(cn[hi] - cn[lo], pa.int64()),
                "qty_shipped": pa.array(
                    np_round_half_away(cq[hi] - cq[lo], 6), pa.float64()
                ),
            }
        )

    return orders.map_batches(window, batch_format="pyarrow")


_FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_stages(sf_dir: str):
    """Ordered conversion funnel view → click → purchase: a user
    converts at stage i+1 only with an event of that type STRICTLY
    AFTER their stage-i conversion time (first-touch chaining, the
    standard product-analytics funnel).

    Shape: ONE hash shuffle by ``user_id`` (same key as sessionize /
    as-of), then a vectorized per-group chain over the user's sorted
    history — min-ts searchsorted per stage, group size bounded by
    one user's events — and a final stage-bounded aggregate (3 rows).
    """
    import pyarrow.parquet as pq_
    from ray.data.aggregate import Sum

    from outbreak_kg_ray.sources.io import empty_dataset

    if pq_.read_metadata(f"{sf_dir}/events.parquet").num_rows == 0:
        return empty_dataset(
            {
                "stage": pa.int64(),
                "event_type": pa.string(),
                "n_users": pa.int64(),
            }
        )
    events = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def chain(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        all_ts = g.column("ts").to_numpy(zero_copy_only=False)
        reached = np.zeros(len(_FUNNEL_STAGES), dtype=np.int64)
        t_prev = None
        for i, stage in enumerate(_FUNNEL_STAGES):
            ts = all_ts[et == stage]
            if t_prev is not None:
                ts = ts[ts > t_prev]
            if len(ts) == 0:
                break
            reached[i] = 1
            t_prev = ts.min()
        return pa.table(
            {
                "stage": pa.array(
                    np.arange(1, len(_FUNNEL_STAGES) + 1), pa.int64()
                ),
                "event_type": pa.array(
                    list(_FUNNEL_STAGES), pa.string()
                ),
                "reached": pa.array(reached, pa.int64()),
            }
        )

    out = (
        events.groupby("user_id")
        .map_groups(chain, batch_format="pyarrow")
        .groupby(["stage", "event_type"])
        .aggregate(Sum("reached", alias_name="n_users"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "stage": t.column("stage").cast(pa.int64()),
                "event_type": t.column("event_type"),
                "n_users": t.column("n_users").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def event_transitions(sf_dir: str):
    """Per-user consecutive event-type transition counts — the
    first-order Markov matrix of behavioral modeling
    (from_type, to_type, n_transitions).

    Shape: ONE ``keyed_partitions`` shuffle by ``user_id`` (the
    sessionizer's key), then a WHOLE-PARTITION vectorized pass — all
    users pair in one lexsort over (user, ts, event_id) with
    same-user masking, zero per-group Python — emitting one partial
    row per distinct (from, to) pair per PARTITION (a strictly
    tighter combiner than per-user) into a type²-bounded grouped
    sum."""

    from ray.data.aggregate import Sum

    from outbreak_kg_ray.sources.io import (
        empty_dataset,
        parquet_rows,
        read_parquet_clean,
    )

    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset({
            "from_type": pa.string(), "to_type": pa.string(),
            "n_transitions": pa.int64(),
        })

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    _tr_schema = pa.schema(
        [("from_type", pa.string()), ("to_type", pa.string()),
         ("c", pa.int64())]
    )

    def partials(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _tr_schema.empty_table()
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((eid, ts, uid))
        et = g.column("event_type").to_numpy(zero_copy_only=False)[order]
        uid = uid[order]
        same = uid[1:] == uid[:-1]
        if not same.any():
            return _tr_schema.empty_table()
        pairs = np.char.add(
            np.char.add(et[:-1][same].astype(str), "\x1f"),
            et[1:][same].astype(str),
        )
        uniq, counts = np.unique(pairs, return_counts=True)
        split = np.char.partition(uniq, "\x1f")
        return pa.table(
            {
                "from_type": pa.array(split[:, 0], pa.string()),
                "to_type": pa.array(split[:, 2], pa.string()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            },
            schema=_tr_schema,
        )

    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    agg = (
        keyed_partitions(events, ["user_id"], partials, schema=_tr_schema)
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("c", alias_name="n_transitions"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "from_type" not in t.column_names:
            return pa.schema(
                [("from_type", pa.string()), ("to_type", pa.string()),
                 ("n_transitions", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "from_type": t.column("from_type"),
                "to_type": t.column("to_type"),
                "n_transitions": t.column("n_transitions").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def user_gap_stats(sf_dir: str):
    """Per-user inter-event arrival statistics (gap count, mean gap
    seconds, max gap microseconds) — the inter-arrival features
    behind bot/burst detection and session-gap tuning.

    Shape: ONE ``keyed_partitions`` shuffle + a WHOLE-PARTITION
    sweep — all users diff in one lexsort, per-user sums/maxes via
    ``reduceat`` over contiguous gap segments, zero per-group
    Python; gaps are exact int64 microseconds (no boundary-crossing
    semantics to mismatch), only the mean becomes a rounded float."""

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import (
        empty_dataset,
        parquet_rows,
        read_parquet_clean,
    )

    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset({
            "user_id": pa.int64(), "n_gaps": pa.int64(),
            "mean_gap_s": pa.float64(), "max_gap_us": pa.int64(),
        })

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    _gap_schema = pa.schema(
        [("user_id", pa.int64()), ("n_gaps", pa.int64()),
         ("mean_gap_s", pa.float64()), ("max_gap_us", pa.int64())]
    )

    def stats(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _gap_schema.empty_table()
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((ts, uid))
        uid_s = uid[order]
        us = ts[order].astype("datetime64[us]").astype(np.int64)
        same = uid_s[1:] == uid_s[:-1]
        if not same.any():
            return _gap_schema.empty_table()
        gaps = np.diff(us)[same]
        gap_uid = uid_s[:-1][same]  # sorted (users contiguous)
        starts = np.flatnonzero(
            np.concatenate(([True], gap_uid[1:] != gap_uid[:-1]))
        )
        counts = np.diff(np.append(starts, len(gaps)))
        sums = np.add.reduceat(gaps, starts)
        maxs = np.maximum.reduceat(gaps, starts)
        means = [
            round_half_away(float(s) / float(c) / 1e6, 6)
            for s, c in zip(sums, counts)
        ]
        return pa.table(
            {
                "user_id": pa.array(gap_uid[starts], pa.int64()),
                "n_gaps": pa.array(counts.astype(np.int64), pa.int64()),
                "mean_gap_s": pa.array(means, pa.float64()),
                "max_gap_us": pa.array(
                    maxs.astype(np.int64), pa.int64()
                ),
            },
            schema=_gap_schema,
        )

    from outbreak_kg_ray.sources.io import pinned_schema
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    return pinned_schema(
        keyed_partitions(events, ["user_id"], stats), _gap_schema
    )


def events_replicas(sf_dir: str, repeat: int):
    """Deterministic ×``repeat`` replication of the events table for
    stress runs: replica ``r`` offsets ``user_id`` by r·10⁷ and
    ``event_id`` by r·10¹² with ``ts`` unchanged — each replica is an
    independent user population, so every user-keyed semantics
    (sessions, windows, retention) replicates exactly and expected
    output size is ``repeat ×`` the base output."""
    base = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def rep(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = t.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ts = t.column("ts").cast(_TS)
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "event_id": pa.array(eid + r * 10**12, pa.int64()),
                        "ts": ts,
                        "user_id": pa.array(uid + r * 10**7, pa.int64()),
                    }
                )
                for r in range(repeat)
            ]
        )

    return base.map_batches(rep, batch_format="pyarrow", batch_size=None)


def session_summaries(sf_dir: str, *, gap_minutes: int = 30,
                      events_ds=None):
    """Gaps-and-islands rollup: one row per (user, session) with
    start/end timestamps, event count and duration — the session
    summary table sessionization exists to feed.

    Shape: ONE user-keyed ``keyed_partitions`` exchange, then a
    WHOLE-PARTITION vectorized pass — all of a partition's users
    sessionize in one lexsort + cumsum sweep (a session boundary is
    "user changed OR gap exceeded"), so per-group Python overhead is
    zero even at hundreds of thousands of users (the ×N events
    stress measured the per-group map_groups version paying ~1 Python
    visit per user).  ``events_ds`` overrides the input stream (the
    ×N replication stress)."""
    from outbreak_kg_ray.sources.io import pinned_schema
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    events = events_ds if events_ds is not None else read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    gap = np.timedelta64(gap_minutes * 60, "s")
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("t_start", pa.timestamp("us")),
            ("t_end", pa.timestamp("us")),
            ("n_events", pa.int64()),
            ("duration_s", pa.float64()),
        ]
    )

    def summarize_partition(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((eid, ts, uid))
        ts, uid = ts[order], uid[order]
        n = len(ts)
        new_sess = np.ones(n, dtype=np.int64)
        if n > 1:
            new_sess[1:] = (
                (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap)
            ).astype(np.int64)
        sid_g = np.cumsum(new_sess)  # global session index, 1-based
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n) - 1
        s_uid = uid[starts]
        # per-user session numbering: global index minus the user's
        # first global index + 1 (users are contiguous after the sort)
        first_of_user = np.ones(len(starts), dtype=bool)
        first_of_user[1:] = s_uid[1:] != s_uid[:-1]
        base = np.maximum.accumulate(
            np.where(first_of_user, sid_g[starts], 0)
        )
        sess_no = sid_g[starts] - base + 1
        t_start = ts[starts].astype("datetime64[us]")
        t_end = ts[ends].astype("datetime64[us]")
        dur_s = (t_end.astype(np.int64) - t_start.astype(np.int64)) / 1e6
        return pa.table(
            {
                "user_id": pa.array(s_uid, pa.int64()),
                "session_id": pa.array(sess_no, pa.int64()),
                "t_start": pa.array(t_start).cast(pa.timestamp("us")),
                "t_end": pa.array(t_end).cast(pa.timestamp("us")),
                "n_events": pa.array(
                    (ends - starts + 1).astype(np.int64), pa.int64()
                ),
                "duration_s": pa.array(dur_s, pa.float64()),
            },
            schema=out_schema,
        )

    return pinned_schema(
        keyed_partitions(events, ["user_id"], summarize_partition),
        out_schema,
    )


def open_orders_snapshot(sf_dir: str):
    """Temporal AS-OF snapshots: for the first day of every month in
    the order-date range, how many orders are OPEN (placed on/before
    the probe date, first shipment strictly after it — or never
    shipped) — the backlog time series a fulfillment dashboard plots.

    Scale shape: lineitem collapses to per-order MIN ship date
    (combining groupby), a LEFT join attaches it to orders (orders
    with no lineitems stay, as永 open), and each batch evaluates ALL
    probe dates vectorized against a calendar-bounded broadcast probe
    list; the exchange is |probes| partial-sum rows per batch."""
    import ray
    from ray.data.aggregate import Min, Sum

    from outbreak_kg_ray.sources.io import (
        empty_dataset,
        parquet_rows,
        read_parquet_clean,
    )

    out_schema = {
        "snapshot": pa.timestamp("us"), "n_open": pa.int64(),
    }
    if parquet_rows(f"{sf_dir}/orders.parquet") == 0:
        return empty_dataset(out_schema)

    import pyarrow.parquet as pq_

    # calendar-bounded probe list from the parquet footer stats
    t = pq_.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])
    od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
    lo = od.min().astype("datetime64[M]")
    hi = od.max().astype("datetime64[M]")
    probes = np.arange(lo, hi + 1, dtype="datetime64[M]").astype(
        "datetime64[D]"
    )
    probes_i = probes.astype("datetime64[us]").astype(np.int64)
    probes_ref = ray.put(probes_i)

    first_ship = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_shipdate"],
        )
        .groupby("l_orderkey")
        .aggregate(Min("l_shipdate", alias_name="first_ship"))
    )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    if parquet_rows(f"{sf_dir}/lineitem.parquet") == 0:
        # degenerate: no shipments at all — every placed order is
        # open; skip the join (empty right side emits schema-less
        # blocks that crash the acero hash join)
        joined = orders.map_batches(
            lambda t2: t2.append_column(
                "first_ship",
                pa.nulls(len(t2), pa.timestamp("us")),
            ),
            batch_format="pyarrow",
        )
    else:
        from outbreak_kg_ray.sources.io import pinned_schema

        nparts = 4  # order-bounded join; fan-out stays modest
        joined = orders.join(
            pinned_schema(first_ship, {
                "l_orderkey": pa.int64(),
                "first_ship": pa.timestamp("us"),
            }),
            "left_outer", nparts,
            on=("o_orderkey",), right_on=("l_orderkey",),
        )

    def partials(t2: pa.Table) -> pa.Table:
        if len(t2) == 0 or "o_orderdate" not in t2.column_names:
            return pa.table(
                {"snapshot": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        pr = ray.get(probes_ref)
        placed = t2.column("o_orderdate").to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        fs = t2.column("first_ship").to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]")
        # NaT → +inf (never shipped stays open forever); NaT must be
        # detected with isnat BEFORE the float cast — astype(float)
        # turns NaT into the int64 sentinel (-2^63), not NaN
        fs_i = np.where(
            np.isnat(fs), np.inf, fs.astype(np.float64)
        )
        counts = np.zeros(len(pr), dtype=np.int64)
        for i, d in enumerate(pr):
            counts[i] = int(((placed <= d) & (fs_i > d)).sum())
        return pa.table(
            {
                "snapshot": pa.array(pr, pa.int64()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    agg = (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("snapshot")
        .aggregate(Sum("c", alias_name="n_open"))
    )

    def finish(t2: pa.Table) -> pa.Table:
        if len(t2) == 0 or "snapshot" not in t2.column_names:
            return pa.schema(list(out_schema.items())).empty_table()
        return pa.table(
            {
                "snapshot": pa.array(
                    t2.column("snapshot").to_numpy(
                        zero_copy_only=False
                    ).astype("datetime64[us]")
                ).cast(pa.timestamp("us")),
                "n_open": t2.column("n_open").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_RANGE_TAG_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("pbucket", pa.int64()),
        ("event_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("side", pa.int8()),  # 0 = error (right), 1 = purchase replica
    ]
)

_RANGE_PARTIAL_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("n", pa.int64()),
    ]
)


def errors_after_purchase(sf_dir: str, *, window_hours: int = 24,
                          parts: int = 32):
    """Windowed range self-join: for each ``purchase`` event, the
    number of ``error`` events by the same user with
    ``purchase.ts < error.ts <= purchase.ts + window`` — the
    stream-style "what broke within a day of paying" feature.

    Distributed shape (the range-join bucketing Ray Data lacks
    natively): bucket time by the window width W. An error in bucket
    ``b`` can only match purchases in buckets ``b`` and ``b-1``, so
    each purchase is REPLICATED to partitions ``(user, b)`` and
    ``(user, b+1)`` while errors are routed once — one
    ``keyed_partitions`` exchange co-locates every candidate pair,
    adjacent buckets never share a right-side row, and the per-pair
    work is two vectorized ``searchsorted`` probes against an int64
    composite key (dense (user, bucket) id × 4W + W-bounded time
    offset — no overflow, no per-row Python). Replica partial counts
    are summed by a purchase-bounded grouped aggregate. Total traffic
    = 2·|purchases| + |errors| rows; hot keys are bounded by one
    user's single-window history.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from outbreak_kg_ray.sources.io import pinned_schema
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    w_us = window_hours * 3600 * 1_000_000
    events = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def tag(t: pa.Table) -> pa.Table:
        ty = t.column("event_type").to_numpy(zero_copy_only=False)
        ts_us = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        uid = t.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = t.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bkt = ts_us // w_us
        rm = ty == "error"
        lm = ty == "purchase"
        # rights once; lefts to bucket b and b+1
        out_u = np.concatenate([uid[rm], uid[lm], uid[lm]])
        out_b = np.concatenate([bkt[rm], bkt[lm], bkt[lm] + 1])
        out_e = np.concatenate([eid[rm], eid[lm], eid[lm]])
        out_t = np.concatenate([ts_us[rm], ts_us[lm], ts_us[lm]])
        out_s = np.concatenate(
            [
                np.zeros(int(rm.sum()), np.int8),
                np.ones(int(lm.sum()) * 2, np.int8),
            ]
        )
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "pbucket": pa.array(out_b, pa.int64()),
                "event_id": pa.array(out_e, pa.int64()),
                "ts_us": pa.array(out_t, pa.int64()),
                "side": pa.array(out_s, pa.int8()),
            },
            schema=_RANGE_TAG_SCHEMA,
        )

    tagged = events.map_batches(tag, batch_format="pyarrow")

    def count_in_partition(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        bkt = g.column("pbucket").to_numpy(zero_copy_only=False)
        tsu = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        lm = side == 1
        if not lm.any():
            return _RANGE_PARTIAL_SCHEMA.empty_table()
        keys = np.empty(len(uid), dtype=[("u", "i8"), ("b", "i8")])
        keys["u"] = uid
        keys["b"] = bkt
        _, inv = np.unique(keys, return_inverse=True)
        # offset within the partition bucket: rights land in [W, 2W),
        # shifted purchase replicas in [0, W); probe upper bound < 4W
        off = tsu - bkt * w_us + w_us
        comb = inv * (4 * w_us) + off
        rm = side == 0
        comb_r = np.sort(comb[rm])
        lo = np.searchsorted(comb_r, comb[lm], side="right")
        hi = np.searchsorted(comb_r, comb[lm] + w_us, side="right")
        return pa.table(
            {
                "event_id": pa.array(eid[lm], pa.int64()),
                "user_id": pa.array(uid[lm], pa.int64()),
                "ts_us": pa.array(tsu[lm], pa.int64()),
                "n": pa.array((hi - lo).astype(np.int64), pa.int64()),
            },
            schema=_RANGE_PARTIAL_SCHEMA,
        )

    partials = keyed_partitions(
        tagged,
        ["user_id", "pbucket"],
        count_in_partition,
        parts=parts,
        schema=_RANGE_PARTIAL_SCHEMA,
    )

    summed = (
        partials.groupby(["event_id", "user_id", "ts_us"])
        .aggregate(Sum("n", alias_name="n_errors_24h"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "user_id": t.column("user_id").cast(pa.int64()),
                "ts": t.column("ts_us").cast(pa.timestamp("us")),
                "n_errors_24h": t.column("n_errors_24h").cast(pa.int64()),
            }
        )

    return pinned_schema(
        summed.map_batches(finish, batch_format="pyarrow"),
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("n_errors_24h", pa.int64()),
            ]
        ),
    )


_ATTR_TAG_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("pbucket", pa.int64()),
        ("event_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("side", pa.int8()),   # 0 = candidate (non-purchase), 1 = purchase
        ("prio", pa.int8()),   # purchases: 1 = original bucket, 0 = shifted
        ("etype", pa.string()),
        ("cents", pa.int64()),
    ]
)

_ATTR_PARTIAL_SCHEMA = pa.schema(
    [
        ("pid", pa.int64()),
        ("cents", pa.int64()),
        ("prio", pa.int8()),
        ("found", pa.int8()),
        ("ctype", pa.string()),
    ]
)


def purchase_attribution(sf_dir: str, *, window_hours: int = 24,
                         parts: int = 32):
    """Last-touch attribution: each ``purchase`` event's value is
    attributed to the SAME user's most recent non-purchase event
    within the 24 h before it (ties on timestamp → smallest
    event_id; no qualifying touch → ``(direct)``), then rolled up
    per attributed event type — the bounded-staleness as-of join
    (argmax within a window) that completes the range-join family
    next to the count variant (``errors_after_purchase``).

    Distributed shape: same window-width bucketing — purchases
    replicate to (user, b) and (user, b-1), candidates route once;
    per partition the latest-candidate probe is two vectorized
    ``searchsorted`` calls against the composite key with candidates
    pre-sorted by (key, ts asc, event_id desc) so "last among
    equals" IS the deterministic tie-break. Cross-replica selection
    needs no timestamp comparison: a hit in the original bucket is
    always later than any hit in the earlier bucket, so a 2-row
    max-prio pick per purchase (one more keyed exchange, vectorized
    first-per-group) resolves it. Money sums are exact int64 cents
    (the Q14 int-unit pattern); the final rollup is event-type
    bounded."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    from outbreak_kg_ray.sources.io import pinned_schema
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    w_us = window_hours * 3600 * 1_000_000
    events = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def tag(t: pa.Table) -> pa.Table:
        ty = t.column("event_type").to_numpy(zero_copy_only=False)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = t.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = t.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        val = t.column("value").to_numpy(zero_copy_only=False)
        cents = np_round_half_away(val * 100.0, 0).astype(np.int64)
        bkt = ts_us // w_us
        lm = ty == "purchase"
        rm = ~lm
        n_l, n_r = int(lm.sum()), int(rm.sum())
        out_u = np.concatenate([uid[rm], uid[lm], uid[lm]])
        out_b = np.concatenate([bkt[rm], bkt[lm], bkt[lm] - 1])
        out_e = np.concatenate([eid[rm], eid[lm], eid[lm]])
        out_t = np.concatenate([ts_us[rm], ts_us[lm], ts_us[lm]])
        out_s = np.concatenate(
            [np.zeros(n_r, np.int8), np.ones(n_l * 2, np.int8)]
        )
        out_p = np.concatenate(
            [np.zeros(n_r, np.int8), np.ones(n_l, np.int8),
             np.zeros(n_l, np.int8)]
        )
        out_c = np.concatenate(
            [np.zeros(n_r, np.int64), cents[lm], cents[lm]]
        )
        etype = np.concatenate(
            [ty[rm], np.full(n_l * 2, "", dtype=object)]
        )
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "pbucket": pa.array(out_b, pa.int64()),
                "event_id": pa.array(out_e, pa.int64()),
                "ts_us": pa.array(out_t, pa.int64()),
                "side": pa.array(out_s, pa.int8()),
                "prio": pa.array(out_p, pa.int8()),
                "etype": pa.array(etype.tolist(), pa.string()),
                "cents": pa.array(out_c, pa.int64()),
            },
            schema=_ATTR_TAG_SCHEMA,
        )

    tagged = events.map_batches(tag, batch_format="pyarrow")

    def probe(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        lm = side == 1
        if not lm.any():
            return _ATTR_PARTIAL_SCHEMA.empty_table()
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        bkt = g.column("pbucket").to_numpy(zero_copy_only=False)
        tsu = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        keys = np.empty(len(uid), dtype=[("u", "i8"), ("b", "i8")])
        keys["u"] = uid
        keys["b"] = bkt
        _, inv = np.unique(keys, return_inverse=True)
        off = tsu - bkt * w_us + w_us
        comb = inv * (4 * w_us) + off
        rm = side == 0
        comb_r, eid_r = comb[rm], eid[rm]
        etype_r = g.column("etype").to_numpy(zero_copy_only=False)[rm]
        order = np.lexsort((-eid_r, comb_r))
        comb_s = comb_r[order]
        lo = np.searchsorted(comb_s, comb[lm] - w_us, side="left")
        hi = np.searchsorted(comb_s, comb[lm], side="left")
        found = hi > lo
        idx = np.where(found, hi - 1, 0)
        ctype = np.where(
            found,
            etype_r[order][idx] if len(comb_s) else "",
            "",
        )
        return pa.table(
            {
                "pid": pa.array(eid[lm], pa.int64()),
                "cents": pa.array(
                    g.column("cents").to_numpy(zero_copy_only=False)[lm],
                    pa.int64(),
                ),
                "prio": pa.array(
                    g.column("prio").to_numpy(zero_copy_only=False)[lm],
                    pa.int8(),
                ),
                "found": pa.array(found.astype(np.int8), pa.int8()),
                "ctype": pa.array(ctype.tolist(), pa.string()),
            },
            schema=_ATTR_PARTIAL_SCHEMA,
        )

    partials = keyed_partitions(
        tagged,
        ["user_id", "pbucket"],
        probe,
        parts=parts,
        schema=_ATTR_PARTIAL_SCHEMA,
    )

    def pick_best(g: pa.Table) -> pa.Table:
        pid = g.column("pid").to_numpy(zero_copy_only=False)
        found = g.column("found").to_numpy(zero_copy_only=False)
        prio = g.column("prio").to_numpy(zero_copy_only=False)
        # (found, prio) descending within pid: an original-bucket hit
        # always beats a shifted-bucket hit (strictly later window)
        order = np.lexsort((-prio, -found, pid))
        pid_s = pid[order]
        first = np.ones(len(pid_s), dtype=bool)
        first[1:] = pid_s[1:] != pid_s[:-1]
        sel = order[first]
        ctype = g.column("ctype").to_numpy(zero_copy_only=False)[sel]
        fsel = found[sel] == 1
        ctype = np.where(fsel, ctype, "(direct)")
        return pa.table(
            {
                "event_type": pa.array(ctype.tolist(), pa.string()),
                "cents": pa.array(
                    g.column("cents").to_numpy(zero_copy_only=False)[sel],
                    pa.int64(),
                ),
            }
        )

    picked = keyed_partitions(
        partials,
        ["pid"],
        pick_best,
        parts=parts,
        schema=pa.schema(
            [("event_type", pa.string()), ("cents", pa.int64())]
        ),
    )

    summed = picked.groupby("event_type").aggregate(
        Count(alias_name="n_purchases"),
        Sum("cents", alias_name="cents"),
    )

    def finish(t: pa.Table) -> pa.Table:
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n_purchases": t.column("n_purchases").cast(pa.int64()),
                "attributed_value": pa.array(
                    (cents / 100.0).round(2), pa.float64()
                ),
            }
        )

    return pinned_schema(
        summed.map_batches(finish, batch_format="pyarrow"),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("n_purchases", pa.int64()),
                ("attributed_value", pa.float64()),
            ]
        ),
    )


def late_event_report(sf_dir: str):
    """Out-of-order arrival audit (streaming watermark semantics):
    an event is LATE when its ``ts`` precedes the running max ts of
    earlier-ARRIVING events of the same user → per user (user_id,
    n_events, n_late, max_lateness_us).  The table a streaming ingest
    monitors to size watermarks / allowed-lateness windows.

    The synthetic log is created in-order (event_id follows ts), so
    arrival order is the deterministic block-4 delivery shuffle
    ``event_id - event_id%4 + (3 - event_id%4)`` — the replayable
    stand-in for network reordering, replayed exactly by the oracle.

    Scale shape: ONE hash exchange by user, then a whole-partition
    vectorized pass — per-group running max via a single global
    ``np.maximum.accumulate`` over group-offset-shifted int64
    timestamps (offsets cancel inside a group, so lateness is exact;
    groups-per-partition × ts-range must fit int64 — ~10^5 users per
    partition at a decade of µs range, far above any partition this
    engine emits), then one reduceat rollup.  Zero per-group Python."""
    import numpy as np
    import pyarrow as pa

    from outbreak_kg_ray.sources.io import (
        empty_dataset,
        parquet_rows,
        read_parquet_clean,
    )
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()),
         ("n_late", pa.int64()), ("max_lateness_us", pa.int64())]
    )
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(dict(zip(schema.names, schema.types)))

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"],
    )

    def audit(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        arr = eid - eid % 4 + (3 - eid % 4)
        ts = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((arr, uid))
        uid, ts = uid[order], ts[order]
        n = len(uid)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        gidx = np.cumsum(first) - 1
        span = (ts.max() - ts.min() + 1) if n else 1
        shifted = (ts - ts.min()) + gidx * span
        cummax = np.maximum.accumulate(shifted)
        prior = np.concatenate(([np.iinfo(np.int64).min], cummax[:-1]))
        prior[first] = np.iinfo(np.int64).min  # no prior in-group max
        late = shifted < prior
        lateness = np.where(late, prior - shifted, 0)
        starts = np.flatnonzero(first)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_events": pa.array(
                    np.diff(np.concatenate((starts, [n]))), pa.int64()
                ),
                "n_late": pa.array(
                    np.add.reduceat(late.astype(np.int64), starts),
                    pa.int64(),
                ),
                "max_lateness_us": pa.array(
                    np.maximum.reduceat(lateness, starts), pa.int64()
                ),
            }
        )

    return keyed_partitions(events, ["user_id"], audit, schema=schema)


def leave_last_out_split(sf_dir: str):
    """Recsys evaluation protocol: leave-last-out split — each
    user's latest event (by ts, event_id) is the TEST example,
    everything earlier is TRAIN → (event_id, user_id, event_type,
    split).  The standard offline-eval construction for sequential
    recommenders (He et al. NCF evaluation).

    Scale shape: ONE user-keyed exchange, whole-partition lexsort +
    run-boundary last-index pick, zero per-group Python."""
    import numpy as np
    import pyarrow as pa

    from outbreak_kg_ray.sources.io import (
        empty_dataset,
        parquet_rows,
        read_parquet_clean,
    )
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("event_type", pa.string()), ("split", pa.string())]
    )
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(dict(zip(schema.names, schema.types)))

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def split(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid = uid[order], eid[order]
        et = g.column("event_type").to_numpy(zero_copy_only=False)[order]
        n = len(uid)
        last = np.concatenate((uid[1:] != uid[:-1], [True]))
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(et.astype(object), pa.string()),
                "split": pa.array(
                    np.where(last, "test", "train").astype(object),
                    pa.string(),
                ),
            }
        )

    return keyed_partitions(events, ["user_id"], split, schema=schema)


def bpr_triples(sf_dir: str):
    """BPR implicit-feedback training triples (Rendle et al. 2009):
    for each user, every ordered event-type pair (i, j) where the
    user interacted with i strictly more often than j → (user_id,
    pos_type, neg_type, pos_count, neg_count) — the pairwise
    preference data a ranking recommender trains on.

    Scale shape: ONE grouped (user, type) count (bounded by
    users × type vocabulary), then a user-keyed exchange whose
    per-partition pair construction is type-vocab-bounded per user
    (T ≤ a few dozen ⇒ ≤ T² rows per user by construction)."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Count

    from outbreak_kg_ray.sources.io import (
        empty_dataset,
        parquet_rows,
        read_parquet_clean,
    )
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    schema = pa.schema(
        [("user_id", pa.int64()), ("pos_type", pa.string()),
         ("neg_type", pa.string()), ("pos_count", pa.int64()),
         ("neg_count", pa.int64())]
    )
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(dict(zip(schema.names, schema.types)))

    counts = (
        read_parquet_clean(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type"],
        )
        .groupby(["user_id", "event_type"])
        .count()
    )

    def pairs(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(
            g.column("event_type").to_pylist(), dtype=object
        )
        n = g.column("count()").to_numpy(zero_copy_only=False)
        order = np.lexsort((et, -n, uid))
        uid, et, n = uid[order], et[order], n[order]
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(first).tolist() + [len(uid)]
        out_u, out_p, out_ng, out_pc, out_nc = [], [], [], [], []
        for s, e in zip(starts, starts[1:]):
            seg_n = n[s:e]
            seg_t = et[s:e]
            # count-desc order: j to the right with strictly smaller n
            for i in range(e - s):
                gt = np.flatnonzero(seg_n < seg_n[i])
                for j in gt:
                    out_u.append(int(uid[s]))
                    out_p.append(seg_t[i])
                    out_ng.append(seg_t[j])
                    out_pc.append(int(seg_n[i]))
                    out_nc.append(int(seg_n[j]))
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "pos_type": pa.array(out_p, pa.string()),
                "neg_type": pa.array(out_ng, pa.string()),
                "pos_count": pa.array(out_pc, pa.int64()),
                "neg_count": pa.array(out_nc, pa.int64()),
            }
        )

    return keyed_partitions(counts, ["user_id"], pairs, schema=schema)


def watermark_window_counts(sf_dir: str):
    """Streaming-semantics tumbling windows: per (hour, event_type),
    how many events a zero-allowed-lateness streaming engine would
    have counted on time vs dropped as late — late under the same
    deterministic block-4 delivery shuffle as
    :func:`late_event_report` → (hour, event_type, n_on_time,
    n_late).  The batch-vs-stream reconciliation table a pipeline
    uses to size watermark allowances per window.

    Scale shape: ONE user-keyed exchange computes per-row late flags
    (whole-partition segment cummax, zero per-group Python) and
    pre-collapses to (hour, type) partials INSIDE the partition; the
    final grouped sum is calendar×vocab-bounded."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from outbreak_kg_ray.sources.io import (
        empty_dataset,
        parquet_rows,
        read_parquet_clean,
    )
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    schema = pa.schema(
        [("hour", pa.timestamp("us")), ("event_type", pa.string()),
         ("n_on_time", pa.int64()), ("n_late", pa.int64())]
    )
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(dict(zip(schema.names, schema.types)))

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    HOUR_US = 3_600_000_000

    def partials(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        arr = eid - eid % 4 + (3 - eid % 4)
        ts = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        et = np.asarray(
            g.column("event_type").to_pylist(), dtype=object
        )
        order = np.lexsort((arr, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        n = len(uid)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        gidx = np.cumsum(first) - 1
        span = (ts.max() - ts.min() + 1) if n else 1
        shifted = (ts - ts.min()) + gidx * span
        cummax = np.maximum.accumulate(shifted)
        prior = np.concatenate(
            ([np.iinfo(np.int64).min], cummax[:-1])
        )
        prior[first] = np.iinfo(np.int64).min
        late = shifted < prior
        hour = ts - ts % HOUR_US
        return (
            pa.table(
                {
                    "hour": pa.array(hour, pa.int64()),
                    "event_type": pa.array(et, pa.string()),
                    "ot": pa.array((~late).astype(np.int64), pa.int64()),
                    "lt": pa.array(late.astype(np.int64), pa.int64()),
                }
            )
            .group_by(["hour", "event_type"])
            .aggregate([("ot", "sum"), ("lt", "sum")])
            .rename_columns(["hour", "event_type", "ot", "lt"])
        )

    agg = (
        keyed_partitions(
            events, ["user_id"], partials,
            schema=pa.schema(
                [("hour", pa.int64()), ("event_type", pa.string()),
                 ("ot", pa.int64()), ("lt", pa.int64())]
            ),
        )
        .groupby(["hour", "event_type"])
        .aggregate(
            Sum("ot", alias_name="n_on_time"),
            Sum("lt", alias_name="n_late"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        if "hour" not in t.column_names or len(t) == 0:
            return schema.empty_table()
        return pa.table(
            {
                "hour": t.column("hour").cast(pa.timestamp("us")),
                "event_type": t.column("event_type"),
                "n_on_time": t.column("n_on_time"),
                "n_late": t.column("n_late"),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")
