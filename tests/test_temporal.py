"""Tests for the temporal-join family (pipelines/temporal.py), the
Q5-style multi-join (relational.revenue_by_nation), the SQL-checkable
literature slice (encode.literature_overlap) and the blocked exact
Jaccard (docops.prefix_block_jaccard) — each checked against an
independent brute-force / DuckDB computation on sf0.001."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from outbreak_kg_ray.pipelines import docops, encode, relational, temporal


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events", "customer", "supplier",
              "nation", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_asof_join_matches_bruteforce(sf_dir):
    out = temporal.asof_join_events_orders(sf_dir).to_pandas()
    con = _duck(sf_dir)
    events = con.execute(
        "SELECT event_id, user_id, ts FROM events"
    ).fetchdf()
    orders = con.execute(
        """SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
           FROM orders GROUP BY 1, 2"""
    ).fetchdf()
    by_user = {
        k: g.sort_values("o_orderdate")
        for k, g in orders.groupby("o_custkey")
    }
    expected = {}
    for _, e in events.iterrows():
        g = by_user.get(e["user_id"])
        if g is None:
            continue
        prior = g[g["o_orderdate"] <= e["ts"]]
        if len(prior):
            expected[e["event_id"]] = int(prior.iloc[-1]["o_orderkey"])
    got = dict(zip(out["event_id"], out["o_orderkey"]))
    assert got == expected
    assert len(out) == len(expected)
    # every matched order strictly precedes (or equals) its event ts
    merged = out.merge(events, on="event_id", suffixes=("", "_e"))
    assert (merged["o_orderdate"] <= merged["ts"]).all()


def test_asof_empty_group_schema_stable(sf_dir):
    # rows survive with the declared 5-column schema even when some
    # user groups are order-only or event-only
    ds = temporal.asof_join_events_orders(sf_dir)
    assert set(ds.schema().names) == {
        "event_id", "user_id", "o_orderkey", "o_orderdate", "o_totalprice"
    }


def test_order_ship_window_matches_sql(sf_dir):
    out = (
        temporal.order_ship_window(sf_dir)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    con = _duck(sf_dir)
    exp = con.execute(
        """SELECT o.o_orderkey, count(l.l_orderkey) AS n_shipped,
                  coalesce(sum(l.l_quantity), 0) AS qty_shipped
           FROM orders o LEFT JOIN lineitem l
             ON l.l_shipdate >= o.o_orderdate
            AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
           GROUP BY 1 ORDER BY 1"""
    ).fetchdf()
    assert (out["o_orderkey"].to_numpy() == exp["o_orderkey"].to_numpy()).all()
    assert (out["n_shipped"].to_numpy() == exp["n_shipped"].to_numpy()).all()
    assert np.allclose(
        out["qty_shipped"].to_numpy(),
        exp["qty_shipped"].to_numpy().astype(float),
    )
    # zero-shipment orders are present, not dropped (left semantics)
    assert len(out) == 1500


def test_revenue_by_nation_matches_sql(sf_dir):
    out = (
        relational.revenue_by_nation(sf_dir)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    con = _duck(sf_dir)
    exp = con.execute(
        """SELECT n.n_name,
                  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                    AS revenue,
                  count(*) AS n_items
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           GROUP BY 1 ORDER BY 1"""
    ).fetchdf()
    assert out["n_name"].tolist() == exp["n_name"].tolist()
    assert out["n_items"].tolist() == exp["n_items"].tolist()
    assert np.allclose(out["revenue"], exp["revenue"], atol=0.011)


def test_literature_overlap_bounds_and_threshold(sf_dir):
    df = encode.literature_overlap(
        sf_dir, ["click", "error", "purchase"]
    ).to_pandas()
    assert len(df) > 0
    assert (df["pub_count"] >= 2).all()  # q=3 → threshold 2
    assert df["overlap_n"].between(0, 3).all()
    assert np.allclose(df["coverage"], df["overlap_n"] / 3.0, atol=1e-6)
    # unknown query terms → empty frame with stable columns
    empty = encode.literature_overlap(sf_dir, ["no-such-term"])
    assert list(empty.columns) == [
        "pmid", "pub_count", "overlap_n", "coverage"
    ]
    assert len(empty) == 0


def test_prefix_block_jaccard_exact(sf_dir):
    out = docops.prefix_block_jaccard(sf_dir).to_pandas()
    assert len(out) > 0
    assert (out["doc_a"] < out["doc_b"]).all()
    assert out["jaccard"].between(0.5, 1.0).all()
    # exact recomputation for each emitted pair
    con = _duck(sf_dir)
    texts = dict(
        con.execute("SELECT doc_id, text FROM documents").fetchall()
    )

    def sh(x, k=5):
        return {x[i:i + k] for i in range(len(x) - k + 1)}

    for _, r in out.iterrows():
        a, b = texts[r["doc_a"]], texts[r["doc_b"]]
        assert a[:32] == b[:32]
        inter = len(sh(a) & sh(b))
        union = len(sh(a) | sh(b))
        assert 2 * inter >= union
        assert abs(r["jaccard"] - inter / union) < 1e-6


def test_sessionize_gap_semantics(sf_dir):
    out = temporal.sessionize_events(sf_dir).to_pandas()
    assert len(out) == 1000
    # per user: session ids start at 1, are non-decreasing in event
    # order, and increment exactly at >30min gaps
    for _, g in out.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        assert g.loc[0, "session_id"] == 1
        gaps = g["ts"].diff().dt.total_seconds().to_numpy()[1:]
        expected_incr = (gaps > 30 * 60).astype(int)
        actual_incr = g["session_id"].diff().to_numpy()[1:].astype(int)
        assert (actual_incr == expected_incr).all()


def test_top_customers_by_nation(sf_dir):
    out = relational.top_customers_by_nation(sf_dir).to_pandas()
    con = _duck(sf_dir)
    exp = con.execute(
        """WITH rev AS (SELECT o_custkey, sum(o_totalprice) AS revenue
                        FROM orders GROUP BY 1)
           SELECT c.c_nationkey, r.o_custkey AS c_custkey, r.revenue,
                  row_number() OVER (PARTITION BY c.c_nationkey
                                     ORDER BY r.revenue DESC, r.o_custkey)
                    AS rank
           FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
           QUALIFY rank <= 3"""
    ).fetchdf()
    a = out.sort_values(["c_nationkey", "rank"]).reset_index(drop=True)
    b = exp.sort_values(["c_nationkey", "rank"]).reset_index(drop=True)
    assert a["c_custkey"].tolist() == b["c_custkey"].tolist()
    assert (a.groupby("c_nationkey")["rank"].max() <= 3).all()


def test_token_count_quantiles(sf_dir):
    out = relational.token_count_quantiles(sf_dir).to_pandas()
    con = _duck(sf_dir)
    exp = con.execute(
        r"""SELECT quantile_cont(len(string_split_regex(trim(text),
                                                        '\s+')), 0.5)
            FROM documents"""
    ).fetchone()[0]
    assert abs(out.loc[0, "q50"] - exp) < 1e-6
    assert out.loc[0, "q50"] <= out.loc[0, "q90"] <= out.loc[0, "q99"]


def test_fingerprint_sql_equivalence():
    # the recursive-CTE oracle in __ray_entry__ assumes ASCII text
    # (unicode(char) == utf-8 byte); assert the corpus satisfies it
    from outbreak_kg_ray.stages.textstats import fingerprint

    con = duckdb.connect()
    got = con.execute(
        """WITH RECURSIVE fp AS (
             SELECT CAST(0 AS HUGEINT) AS h, 0 AS pos, 5 AS n
             UNION ALL
             SELECT (h * 1000003 + unicode(substr('abcde', pos + 1, 1)))
                      % CAST(2305843009213693951 AS HUGEINT),
                    pos + 1, n
             FROM fp WHERE pos < n)
           SELECT CAST(h AS BIGINT) FROM fp WHERE pos = n"""
    ).fetchone()[0]
    assert got == fingerprint("abcde")


def test_events_props_stats(sf_dir):
    out = relational.events_props_stats(sf_dir).to_pandas()
    con = _duck(sf_dir)
    exp = con.execute(
        """SELECT event_type, count(*) AS n,
                  sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k,
                  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
           FROM events GROUP BY 1 ORDER BY 1"""
    ).fetchdf()
    a = out.sort_values("event_type").reset_index(drop=True)
    assert a["n"].tolist() == exp["n"].tolist()
    assert a["sum_k"].astype(int).tolist() == exp["sum_k"].astype(int).tolist()
    assert a["max_k"].tolist() == exp["max_k"].tolist()


def test_customers_without_orders_antijoin(sf_dir):
    out = relational.customers_without_orders(sf_dir).to_pandas()
    con = _duck(sf_dir)
    exp = set(
        r[0] for r in con.execute(
            """SELECT c_custkey FROM customer c
               WHERE NOT EXISTS (
                 SELECT 1 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                   AND o.o_orderdate >= TIMESTAMP '2000-01-01')"""
        ).fetchall()
    )
    assert set(out["c_custkey"]) == exp
    assert len(out) == len(exp) > 0


def test_order_priority_return_rate(sf_dir, tmp_path):
    out = (
        relational.order_priority_return_rate(sf_dir)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    con = _duck(sf_dir)
    exp = con.execute(
        """WITH f AS (
             SELECT l_orderkey,
                    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
             FROM lineitem GROUP BY l_orderkey)
           SELECT o_orderpriority, count(*) AS n_orders,
                  CAST(sum(coalesce(f.ret, 0)) AS BIGINT) AS n_returned
           FROM orders o LEFT JOIN f ON o.o_orderkey = f.l_orderkey
           GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    ).fetch_df()
    assert out["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert out["n_orders"].tolist() == exp["n_orders"].tolist()
    assert out["n_returned"].tolist() == exp["n_returned"].tolist()
    assert ((out["return_rate"] >= 0) & (out["return_rate"] <= 1)).all()

    # empty-lineitem branch: every priority present, zero returns
    import pyarrow.parquet as pq
    import pyarrow as pa_mod

    for t in ("orders", "lineitem"):
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        pq.write_table(
            tbl.slice(0, 0) if t == "lineitem" else tbl,
            str(tmp_path / f"{t}.parquet"),
        )
    empty = relational.order_priority_return_rate(
        str(tmp_path)
    ).to_pandas()
    assert (empty["n_returned"] == 0).all()
    assert (empty["return_rate"] == 0.0).all()
    assert empty["n_orders"].sum() == exp["n_orders"].sum()


def test_broadcast_join_swap_equivalence(sf_dir, monkeypatch):
    """The broadcast↔hash-join selection is measured, not caller
    chosen; both branches must return identical rows (the KG combine
    strategy's invariant, applied to dimension attachment)."""
    base_top = relational.top_customers(sf_dir).to_pandas()
    base_rev = (
        relational.revenue_by_nation(sf_dir)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(relational, "BROADCAST_DIM_ROWS", 0)
    join_top = relational.top_customers(sf_dir).to_pandas()
    join_rev = (
        relational.revenue_by_nation(sf_dir)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    assert base_top[["c_custkey", "c_name", "n_orders"]].equals(
        join_top[["c_custkey", "c_name", "n_orders"]]
    )
    assert np.allclose(base_top["revenue"], join_top["revenue"])
    assert base_rev["n_name"].tolist() == join_rev["n_name"].tolist()
    assert base_rev["n_items"].tolist() == join_rev["n_items"].tolist()
    assert np.allclose(base_rev["revenue"], join_rev["revenue"], atol=0.011)


def test_pricing_rollup_levels(sf_dir):
    out = relational.pricing_rollup(sf_dir).to_pandas()
    detail = out[(out["l_returnflag"] != "ALL")
                 & (out["l_linestatus"] != "ALL")]
    by_flag = out[(out["l_returnflag"] != "ALL")
                  & (out["l_linestatus"] == "ALL")]
    grand = out[(out["l_returnflag"] == "ALL")
                & (out["l_linestatus"] == "ALL")]
    assert len(grand) == 1
    # counts roll up exactly at every level
    assert grand["count_order"].iloc[0] == detail["count_order"].sum() == 6000
    for flag, g in detail.groupby("l_returnflag"):
        sub = by_flag[by_flag["l_returnflag"] == flag]
        assert sub["count_order"].iloc[0] == g["count_order"].sum()


def test_pricing_cube_levels(sf_dir):
    out = relational.pricing_cube(sf_dir).to_pandas()
    detail = out[(out["l_returnflag"] != "ALL")
                 & (out["l_linestatus"] != "ALL")]
    by_flag = out[(out["l_returnflag"] != "ALL")
                  & (out["l_linestatus"] == "ALL")]
    by_status = out[(out["l_returnflag"] == "ALL")
                    & (out["l_linestatus"] != "ALL")]
    grand = out[(out["l_returnflag"] == "ALL")
                & (out["l_linestatus"] == "ALL")]
    assert len(grand) == 1
    assert (
        grand["count_order"].iloc[0]
        == detail["count_order"].sum()
        == by_flag["count_order"].sum()
        == by_status["count_order"].sum()
    )
    for status, g in detail.groupby("l_linestatus"):
        sub = by_status[by_status["l_linestatus"] == status]
        assert sub["count_order"].iloc[0] == g["count_order"].sum()
    # cube ⊃ rollup: every rollup row appears verbatim in the cube
    roll = relational.pricing_rollup(sf_dir).to_pandas()
    cube_keys = set(map(tuple, out.itertuples(index=False)))
    assert all(tuple(r) in cube_keys
               for r in roll.itertuples(index=False))


def test_stratified_sample_determinism(sf_dir):
    from outbreak_kg_ray.pipelines import docops as dops

    a = dops.stratified_sample(sf_dir).to_pandas()
    b = dops.stratified_sample(sf_dir).to_pandas()
    key = lambda df: sorted(zip(df["lang"], df["doc_id"]))
    assert key(a) == key(b)
    assert (a.groupby("lang").size() == 3).all()


def test_cumulative_order_revenue_window(sf_dir):
    out = (
        relational.cumulative_order_revenue(sf_dir)
        .to_pandas()
        .sort_values(["o_custkey", "order_seq"])
        .reset_index(drop=True)
    )
    con = _duck(sf_dir)
    exp = con.execute(
        """SELECT o_custkey, o_orderkey,
                  CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
                  ROUND(SUM(o_totalprice) OVER w, 2) AS cum_revenue
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)
           ORDER BY o_custkey, order_seq"""
    ).fetchdf()
    assert out["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
    assert out["order_seq"].tolist() == exp["order_seq"].tolist()
    assert np.allclose(out["cum_revenue"], exp["cum_revenue"], atol=0.011)
    # running total is non-decreasing within a customer (prices > 0)
    g = out.groupby("o_custkey")["cum_revenue"]
    assert (g.diff().dropna() > 0).all()


def test_retention_cohorts_two_cohorts(ray_session, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import relational

    # user 1 starts week of Jan 6 2025 (Mon) and returns week 2;
    # user 2 starts week 2 only
    rows = [
        (1, dt.datetime(2025, 1, 7)),
        (1, dt.datetime(2025, 1, 9)),   # same week — collapses
        (1, dt.datetime(2025, 1, 15)),
        (2, dt.datetime(2025, 1, 14)),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["e"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = relational.retention_cohorts(str(tmp_path)).to_pandas()
    got = {
        (str(r.cohort_week.date()), int(r.week_offset)): int(r.n_users)
        for r in out.itertuples()
    }
    assert got == {
        ("2025-01-06", 0): 1,
        ("2025-01-06", 1): 1,
        ("2025-01-13", 0): 1,
    }


def test_funnel_strict_ordering(ray_session, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import temporal

    d = dt.datetime
    rows = [
        # user 1: full ordered funnel
        (1, "view", d(2025, 1, 1)), (1, "click", d(2025, 1, 2)),
        (1, "purchase", d(2025, 1, 3)),
        # user 2: click BEFORE first view — stage 2 not reached
        (2, "click", d(2025, 1, 1)), (2, "view", d(2025, 1, 2)),
        (2, "purchase", d(2025, 1, 3)),
        # user 3: view+click, purchase before click — stage 3 missed
        (3, "view", d(2025, 1, 1)), (3, "purchase", d(2025, 1, 2)),
        (3, "click", d(2025, 1, 3)),
        # user 4: never views
        (4, "click", d(2025, 1, 1)), (4, "purchase", d(2025, 1, 2)),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = (
        temporal.funnel_stages(str(tmp_path))
        .to_pandas()
        .set_index("stage")
        .sort_index()
    )
    assert list(out["event_type"]) == ["view", "click", "purchase"]
    assert list(out["n_users"]) == [3, 2, 1]


def test_events_gap_fill_explicit_zeros(ray_session, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import relational

    d = dt.datetime
    # events at hours 0 and 3 → hours 1 and 2 must appear as zeros
    rows = [
        (1, "click", d(2025, 1, 1, 0, 15)),
        (2, "click", d(2025, 1, 1, 3, 45)),
        (3, "view", d(2025, 1, 1, 1, 5)),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = relational.events_gap_fill(str(tmp_path)).to_pandas()
    assert len(out) == 8  # 4 hours x 2 types
    got = {
        (r.hour.hour, r.event_type): int(r.n_events)
        for r in out.itertuples()
    }
    assert got[(0, "click")] == 1 and got[(3, "click")] == 1
    assert got[(1, "click")] == 0 and got[(2, "click")] == 0
    assert got[(1, "view")] == 1 and got[(0, "view")] == 0


def test_events_hourly_anomalies_flags_spike(ray_session, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import relational

    d = dt.datetime
    # 23 quiet hours with 1 click each, then a 100-event spike
    rows = []
    for h in range(23):
        rows.append((h, "click", d(2025, 1, 1, h, 30)))
    rows += [(1000 + i, "click", d(2025, 1, 1, 23, 30)) for i in range(100)]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = relational.events_hourly_anomalies(str(tmp_path)).to_pandas()
    assert len(out) == 24
    spike = out[out["n_events"] == 100]
    assert len(spike) == 1 and bool(spike["anomalous"].iloc[0])
    quiet = out[out["n_events"] == 1]
    assert not quiet["anomalous"].any()
    assert (quiet["zscore"] < 0).all()  # below the spike-inflated mean


def test_events_value_histogram_and_mode(ray_session, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import relational

    d = dt.datetime(2025, 1, 1)
    vals = [1.0, 24.9, 25.0, 60.0]
    types = ["view", "view", "click", "click"]
    t = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array([d] * 4, pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    hist = (
        relational.events_value_histogram(str(tmp_path))
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    assert list(hist.index) == [0, 1, 2]
    assert list(hist["n_events"]) == [2, 1, 1]
    assert hist.loc[0, "mean_value"] == round((1.0 + 24.9) / 2, 6)
    assert hist.loc[1, "bin_lo"] == 25.0

    # user 7: view ×2 beats click ×1; user 8: click (tie impossible);
    # tie case: user 7 has view=2, click=1 → view
    mode = (
        relational.user_top_event_type(str(tmp_path))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert mode.loc[7, "top_event_type"] == "view"
    assert mode.loc[7, "n"] == 2
    assert mode.loc[8, "top_event_type"] == "click"


def test_events_type_value_quantiles_interpolation(ray_session, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import relational

    d = dt.datetime(2025, 1, 1)
    vals = [10.0, 20.0, 30.0, 40.0]  # p50 = 25.0, p90 = 37.0
    t = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array([d] * 4, pa.timestamp("us")),
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_type": pa.array(["click"] * 4, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = relational.events_type_value_quantiles(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["q50"].iloc[0] == 25.0
    assert out["q90"].iloc[0] == 37.0


def test_customer_rfm_handmade(ray_session, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import relational

    rows = [
        (1, dt.date(2024, 1, 1), 100.0),
        (1, dt.date(2024, 1, 11), 50.0),   # last for cust 1
        (2, dt.date(2024, 1, 21), 200.0),  # corpus anchor
    ]
    t = pa.table(
        {
            "o_orderkey": pa.array(range(3), pa.int64()),
            "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_orderdate": pa.array([r[1] for r in rows], pa.date32()),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderpriority": pa.array(["1-URGENT"] * 3, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    out = (
        relational.customer_rfm(str(tmp_path))
        .to_pandas()
        .set_index("c_custkey")
        .sort_index()
    )
    assert out.loc[1, "recency_days"] == 10
    assert out.loc[1, "frequency"] == 2
    assert out.loc[1, "monetary"] == 150.0
    assert out.loc[2, "recency_days"] == 0


def _ts(y, m, d):
    import datetime as dt

    return dt.datetime(y, m, d)


def test_shipping_priority_handmade(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import relational

    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_mktsegment": pa.array(
                    ["BUILDING", "MACHINERY"], pa.string()
                ),
            }
        ),
        tmp_path / "customer.parquet",
    )
    # o10 qualifies; o11 fails the order-date cut; o12 is the wrong
    # segment; o13 qualifies and ties o10 on revenue with an earlier
    # order date (tie-break witness)
    orders = [
        (10, 1, _ts(1998, 5, 1), "1-URGENT"),
        (11, 1, _ts(1998, 7, 1), "2-HIGH"),
        (12, 2, _ts(1998, 5, 1), "3-MEDIUM"),
        (13, 1, _ts(1998, 4, 1), "2-HIGH"),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_orderdate": pa.array(
                    [o[2] for o in orders], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    [o[3] for o in orders], pa.string()
                ),
            }
        ),
        tmp_path / "orders.parquet",
    )
    # (orderkey, shipdate, price, discount)
    lines = [
        (10, _ts(1998, 7, 1), 100.0, 0.10),   # rev 90
        (10, _ts(1998, 7, 2), 100.0, 0.10),   # rev 90  → o10 = 180
        (10, _ts(1998, 5, 1), 500.0, 0.00),   # shipped before cut
        (11, _ts(1998, 8, 1), 999.0, 0.00),   # order fails date cut
        (12, _ts(1998, 8, 1), 999.0, 0.00),   # wrong segment
        (13, _ts(1998, 7, 3), 200.0, 0.10),   # rev 180 → o13 = 180
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([l[0] for l in lines], pa.int64()),
                "l_shipdate": pa.array(
                    [l[1] for l in lines], pa.timestamp("us")
                ),
                "l_extendedprice": pa.array(
                    [l[2] for l in lines], pa.float64()
                ),
                "l_discount": pa.array([l[3] for l in lines], pa.float64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    out = relational.shipping_priority(str(tmp_path)).to_pandas()
    assert out["l_orderkey"].tolist() == [13, 10]
    assert out["revenue"].tolist() == [180.0, 180.0]
    assert out["o_orderpriority"].tolist() == ["2-HIGH", "1-URGENT"]

    # k=1 keeps the earlier order date on the revenue tie
    top1 = relational.shipping_priority(str(tmp_path), k=1).to_pandas()
    assert top1["l_orderkey"].tolist() == [13]


def test_promo_revenue_share_handmade(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import relational

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_type": pa.array(["ECONOMY", "SMALL"], pa.string()),
            }
        ),
        tmp_path / "part.parquet",
    )
    # (partkey, shipdate, price, discount)
    lines = [
        (1, _ts(1995, 1, 5), 100.0, 0.0),    # promo rev 100
        (2, _ts(1995, 1, 9), 300.0, 0.0),    # rev 300 → share 25%
        (2, _ts(1995, 2, 1), 10.01, 0.05),   # rev 9.5095 → rounds 9.51
    ]
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([l[0] for l in lines], pa.int64()),
                "l_shipdate": pa.array(
                    [l[1] for l in lines], pa.timestamp("us")
                ),
                "l_extendedprice": pa.array(
                    [l[2] for l in lines], pa.float64()
                ),
                "l_discount": pa.array([l[3] for l in lines], pa.float64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )

    out = (
        relational.promo_revenue_share(str(tmp_path))
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.loc[0, "promo_share"] == 25.0
    assert out.loc[0, "revenue"] == 400.0
    # exact half-cent boundary rounds half-away-from-zero
    assert out.loc[1, "promo_share"] == 0.0
    assert out.loc[1, "revenue"] == 9.51


def test_event_transitions_handmade(ray_session, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines.temporal import event_transitions

    rows = [  # (event_id, user, ts-minute, type)
        (0, 1, 0, "a"), (1, 1, 1, "b"), (2, 1, 2, "a"),
        (3, 2, 0, "a"), (4, 2, 1, "b"),
        (5, 3, 0, "c"),  # single event: no transition
        # same-ts tie broken by event_id: a→b, not b→a
        (6, 4, 0, "a"), (7, 4, 0, "b"),
    ]
    base = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(minutes=r[2]) for r in rows],
                    pa.timestamp("us"),
                ),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    out = event_transitions(str(tmp_path)).to_pandas()
    got = {
        (r.from_type, r.to_type): r.n_transitions
        for r in out.itertuples()
    }
    assert got == {("a", "b"): 3, ("b", "a"): 1}


def test_quality_percentile_rank_transform(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.docops import quality_percentile

    out = quality_percentile(sf_dir).to_pandas()
    assert ((out["quality_pct"] >= 0) & (out["quality_pct"] <= 1)).all()
    # min score(s) sit at 0; the unique max (if unique) at 1
    assert (out.loc[out["quality"].idxmin(), "quality_pct"] == 0.0)
    top = out[out["quality"] == out["quality"].max()]
    if len(top) == 1:
        assert top["quality_pct"].iloc[0] == 1.0
    # rank transform is monotone in the score
    s = out.sort_values(["quality", "quality_pct"])
    assert s["quality_pct"].is_monotonic_increasing


def test_user_type_entropy_bounds(ray_session, sf_dir):
    import numpy as np

    from outbreak_kg_ray.pipelines.relational import user_type_entropy

    out = user_type_entropy(sf_dir).to_pandas()
    # entropy bounded by ln(#types present); non-negative
    assert (out["type_entropy"] >= 0).all()
    n_types = 6  # testdata event_type vocabulary
    assert (out["type_entropy"] <= np.log(n_types) + 1e-9).all()
    assert out["user_id"].is_unique


def test_lineitem_quantity_mad_handmade(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines.relational import lineitem_quantity_mad

    # flag A: quantities 1..5 → med 3, |dev| = {2,1,0,1,2} → MAD 1
    # flag B: quantities {1, 2, 10, 11} → med 6.0, devs {5,4,4,5} → 4.5
    q = [1, 2, 3, 4, 5, 1, 2, 10, 11]
    f = ["A"] * 5 + ["B"] * 4
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(f, pa.string()),
                "l_quantity": pa.array(q, pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    out = (
        lineitem_quantity_mad(str(tmp_path))
        .to_pandas()
        .set_index("l_returnflag")
    )
    assert out.loc["A", "med"] == 3.0 and out.loc["A", "mad"] == 1.0
    assert out.loc["B", "med"] == 6.0 and out.loc["B", "mad"] == 4.5
    assert out.loc["A", "n_items"] == 5 and out.loc["B", "n_items"] == 4


def test_nation_account_reconciliation_full_outer(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.relational import (
        nation_account_reconciliation,
    )

    out = nation_account_reconciliation(sf_dir).to_pandas()
    assert out["nationkey"].is_unique
    # at sf0.001 suppliers cover only 10 of 25 nations: the full-outer
    # join must surface the customer-only nations with zeroed supplier
    # columns
    cust_only = out[out["category"] == "customer_only"]
    assert len(cust_only) > 0
    assert (cust_only["n_suppliers"] == 0).all()
    assert (cust_only["supp_acctbal"] == 0.0).all()
    both = out[out["category"] == "both"]
    assert (both["n_suppliers"] > 0).all() and (
        both["n_customers"] > 0
    ).all()


def test_nation_account_reconciliation_one_sided_empty(
    ray_session, sf_dir, tmp_path
):
    """Exactly one side empty (the ADVICE r2 medium finding): the
    full-outer join must degenerate to the non-empty side's rows, not
    crash on schema-less empty blocks."""
    import duckdb
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines.relational import (
        nation_account_reconciliation,
    )

    for empty_table, other, category in (
        ("supplier", "customer", "customer_only"),
        ("customer", "supplier", "supplier_only"),
    ):
        d = tmp_path / f"empty_{empty_table}"
        d.mkdir()
        for t in ("supplier", "customer"):
            tab = pq.read_table(f"{sf_dir}/{t}.parquet")
            if t == empty_table:
                tab = tab.slice(0, 0)
            pq.write_table(tab, str(d / f"{t}.parquet"))
        out = (
            nation_account_reconciliation(str(d))
            .to_pandas()
            .sort_values("nationkey")
            .reset_index(drop=True)
        )
        assert (out["category"] == category).all()
        k = other[0]
        exp = duckdb.sql(
            f"""SELECT {k}_nationkey AS nationkey,
                       count(*) AS n, round(sum({k}_acctbal), 2) AS bal
                FROM '{d}/{other}.parquet'
                GROUP BY 1 ORDER BY 1"""
        ).df()
        assert len(out) == len(exp) > 0
        side = "cust" if other == "customer" else "supp"
        zero = "supp" if other == "customer" else "cust"
        assert (out["nationkey"].values == exp["nationkey"].values).all()
        assert (
            out[f"n_{other}s"].values == exp["n"].values
        ).all()
        assert (
            abs(out[f"{side}_acctbal"].values - exp["bal"].values) < 1e-6
        ).all()
        assert (out[f"n_{empty_table}s"] == 0).all()
        assert (out[f"{zero}_acctbal"] == 0.0).all()


def test_user_gap_stats_invariants(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.temporal import user_gap_stats

    out = user_gap_stats(sf_dir).to_pandas()
    assert (out["n_gaps"] > 0).all()
    assert (out["mean_gap_s"] > 0).all()
    # mean never exceeds max
    assert (out["mean_gap_s"] * 1e6 <= out["max_gap_us"] + 1).all()


def test_revenue_yoy_handmade(ray_session, tmp_path):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines.relational import revenue_yoy

    rows = [  # (date, totalprice)
        (dt.datetime(2020, 3, 10), 100.0),
        (dt.datetime(2020, 3, 20), 100.0),  # 2020-03: 200
        (dt.datetime(2021, 3, 5), 300.0),   # 2021-03: 300 → +50%
        (dt.datetime(2021, 6, 1), 50.0),    # no 2020-06 → excluded
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(4), pa.int64()),
                "o_custkey": pa.array([1] * 4, pa.int64()),
                "o_orderdate": pa.array(
                    [r[0] for r in rows], pa.timestamp("us")
                ),
                "o_totalprice": pa.array(
                    [r[1] for r in rows], pa.float64()
                ),
                "o_orderpriority": pa.array(["1"] * 4, pa.string()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    out = revenue_yoy(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "revenue"] == 300.0
    assert out.loc[0, "prev_revenue"] == 200.0
    assert out.loc[0, "yoy_growth"] == 0.5


def test_langid_confusion_totals(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.docops import langid_confusion

    out = langid_confusion(sf_dir).to_pandas()
    assert out["n_docs"].sum() == 500  # every doc lands in one cell
    assert set(out["lang"]).issubset({"de", "en", "es", "fr", "zh"})


def test_events_winsorized_mean_bounds(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.relational import (
        events_winsorized_mean,
    )

    out = events_winsorized_mean(sf_dir).to_pandas()
    assert (out["qlo"] <= out["qhi"]).all()
    # the winsorized mean sits inside the clip band
    assert (out["wins_mean"] >= out["qlo"]).all()
    assert (out["wins_mean"] <= out["qhi"]).all()
    # degenerate clip (lo=hi=median) collapses to the median
    med = events_winsorized_mean(sf_dir, lo=0.5, hi=0.5).to_pandas()
    assert (med["wins_mean"] == med["qlo"]).all()


def test_fk_integrity_audit_detects_orphans(ray_session, sf_dir, tmp_path):
    """Clean corpus → zero orphans everywhere; corrupting a child FK
    must surface in exactly that relation's orphan count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines.relational import fk_integrity_audit

    clean = fk_integrity_audit(sf_dir).to_pandas()
    assert len(clean) == 7
    assert (clean["n_orphans"] == 0).all()
    assert (clean["n_rows"] > 0).all()

    # corrupt: point 3 orders at a non-existent customer
    d = tmp_path / "corrupt"
    d.mkdir()
    import shutil

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copy(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    orders = pq.read_table(str(d / "orders.parquet"))
    cust = orders.column("o_custkey").to_pylist()
    cust[:3] = [99999999, 99999998, 99999997]
    orders = orders.set_column(
        orders.column_names.index("o_custkey"), "o_custkey",
        pa.array(cust, orders.column("o_custkey").type),
    )
    pq.write_table(orders, str(d / "orders.parquet"))
    bad = (
        fk_integrity_audit(str(d))
        .to_pandas()
        .set_index("relation")["n_orphans"]
    )
    assert bad["orders.o_custkey->customer"] == 3
    assert bad["customer.c_nationkey->nation"] == 0


def test_rolling_active_users_brute_force(ray_session, sf_dir):
    import duckdb

    from outbreak_kg_ray.pipelines.relational import rolling_active_users

    got = (
        rolling_active_users(sf_dir)
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH hrs AS (SELECT DISTINCT date_trunc('hour', ts) AS h
                         FROM '{sf_dir}/events.parquet')
            SELECT hrs.h AS hour, count(DISTINCT e.user_id) AS n
            FROM hrs JOIN '{sf_dir}/events.parquet' e
              ON date_trunc('hour', e.ts) <= hrs.h
             AND date_trunc('hour', e.ts) > hrs.h - INTERVAL 3 HOUR
            GROUP BY 1 ORDER BY 1"""
    ).df()
    assert len(got) == len(exp)
    assert (got["active_users"].values == exp["n"].values).all()
    # windowed distinct >= the single-hour distinct everywhere
    single = duckdb.sql(
        f"""SELECT date_trunc('hour', ts) AS hour,
                   count(DISTINCT user_id) AS n
            FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    assert (got["active_users"].values >= single["n"].values).all()


def test_latest_event_and_zscore(ray_session, sf_dir):
    import duckdb

    from outbreak_kg_ray.pipelines.relational import (
        latest_event_per_user,
        zscore_features,
    )

    latest = latest_event_per_user(sf_dir).to_pandas()
    assert latest["user_id"].is_unique
    # each user's row really is their max-(ts, event_id) event
    ev = duckdb.sql(
        f"SELECT * FROM '{sf_dir}/events.parquet'"
    ).df()
    for _, r in latest.head(5).iterrows():
        g = ev[ev["user_id"] == r["user_id"]].sort_values(
            ["ts", "event_id"]
        )
        assert g.iloc[-1]["event_id"] == r["event_id"]

    z = zscore_features(sf_dir).to_pandas()
    # per type: mean(z) ~ 0, std(z) ~ 1 (population)
    for _, g in z.groupby("event_type"):
        assert abs(g["zscore"].mean()) < 1e-3
        assert abs(g["zscore"].std(ddof=0) - 1.0) < 1e-3


def test_round3_late_ops_smoke(ray_session, sf_dir):
    """Consolidated invariants for the late round-3 operators (each
    is hash-checked against DuckDB in the driver gate; these pin the
    semantic invariants an oracle refactor could silently lose)."""
    import numpy as np

    from outbreak_kg_ray.pipelines.relational import (
        audience_overlap,
        events_seasonality,
        ship_lag_quantiles,
    )
    from outbreak_kg_ray.pipelines.temporal import open_orders_snapshot

    ao = audience_overlap(sf_dir).to_pandas()
    assert (ao["type_a"] < ao["type_b"]).all()
    assert ao["jaccard"].between(0, 1).all()

    se = events_seasonality(sf_dir).to_pandas()
    assert se["dow"].between(1, 7).all()
    assert se["hour"].between(0, 23).all()
    assert se["n_events"].sum() == 1000

    sl = ship_lag_quantiles(sf_dir).to_pandas()
    assert (sl["q50"] <= sl["q90"]).all() and (
        sl["q90"] <= sl["q99"]
    ).all()

    oo = open_orders_snapshot(sf_dir).to_pandas().sort_values(
        "snapshot"
    )
    assert (oo["n_open"] >= 0).all()
    # backlog is 0 before the first order month's end is reached
    assert len(oo) > 12


def test_errors_after_purchase_window_boundaries(tmp_path):
    """Range-join boundary semantics on a crafted corpus: exclusive
    lower bound, inclusive upper bound, bucket-boundary crossing, and
    user isolation — the cases the bucketed replication must get
    exactly right."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    w_us = 24 * 3600 * 1_000_000
    t0 = 3 * w_us - 1000  # purchase 1ms before a bucket boundary
    rows = [
        # (event_id, ts_us, user_id, event_type)
        (1, t0, 7, "purchase"),
        (10, t0, 7, "error"),            # == ts  -> excluded
        (11, t0 + 1, 7, "error"),        # just inside
        (12, t0 + 900, 7, "error"),      # same bucket
        (13, t0 + 5000, 7, "error"),     # NEXT bucket, inside window
        (14, t0 + w_us, 7, "error"),     # exactly +W -> included
        (15, t0 + w_us + 1, 7, "error"),  # out
        (16, t0 + 500, 8, "error"),      # other user -> excluded
        (2, 10 * w_us, 8, "purchase"),   # isolated purchase, zero matches
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = {
        r["event_id"]: r["n_errors_24h"]
        for r in temporal.errors_after_purchase(str(tmp_path)).take_all()
    }
    assert got == {1: 4, 2: 0}


def test_purchase_attribution_last_touch_semantics(tmp_path):
    """Crafted corpus: tie on candidate ts -> smallest event_id; a
    same-bucket hit beats an earlier-bucket hit; exactly -24h is
    included, == purchase ts excluded; no touch -> (direct)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    w_us = 24 * 3600 * 1_000_000
    t0 = 5 * w_us + 1000  # purchase just after a bucket boundary
    rows = [
        # purchase 1: candidates in previous bucket + same bucket
        (1, t0, 7, "purchase", 100.00),
        (10, t0 - w_us, 7, "click", 0.0),    # exactly -24h -> eligible
        (11, t0 - 2000, 7, "signup", 0.0),   # previous bucket, later
        (12, t0 + 500, 7, "error", 0.0),     # after -> ineligible
        # purchase 2: tie on ts -> event_id 20 wins over 21
        (2, 10 * w_us + 5000, 7, "purchase", 50.25),
        (20, 10 * w_us + 1000, 7, "click", 0.0),
        (21, 10 * w_us + 1000, 7, "error", 0.0),
        (22, 10 * w_us + 5000, 7, "signup", 0.0),  # == p.ts -> excluded
        # purchase 3: no touch
        (3, 20 * w_us, 8, "purchase", 10.10),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = {
        r["event_type"]: (r["n_purchases"], r["attributed_value"])
        for r in temporal.purchase_attribution(str(tmp_path)).take_all()
    }
    assert got == {
        "signup": (1, 100.00),   # p1: signup@t0-2000 is the latest touch
        "click": (1, 50.25),     # p2: tie broken to event_id 20
        "(direct)": (1, 10.10),  # p3
    }


def test_user_type_scd2_invariants(sf_dir):
    """SCD2 contract: per user, intervals tile the history — exactly
    one open interval (valid_to null) per user, valid_to equals the
    next interval's valid_from, n_events sums to the user's event
    count, and consecutive intervals never share an event_type."""
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import relational

    df = (
        relational.user_type_scd2(sf_dir)
        .to_pandas()
        .sort_values(["user_id", "valid_from"])
        .reset_index(drop=True)
    )
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    ).to_pandas()
    per_user = ev.groupby("user_id").size()
    got_sum = df.groupby("user_id")["n_events"].sum()
    assert got_sum.to_dict() == per_user.to_dict()
    for uid, g in df.groupby("user_id"):
        assert g["valid_to"].isna().sum() == 1
        assert g["valid_to"].iloc[-1] is None or g["valid_to"].isna().iloc[-1]
        # chaining: closed intervals point at the next valid_from
        nxt = g["valid_from"].shift(-1)
        closed = g["valid_to"].notna()
        assert (g.loc[closed, "valid_to"].values
                == nxt[closed].values).all()
        # no two consecutive intervals share a type
        assert (g["event_type"].shift() != g["event_type"]).iloc[1:].all()


def test_late_event_report_matches_python(sf_dir):
    """Per-user late counts and max lateness match a direct python
    replay of the block-4 delivery shuffle, and lateness is nonzero
    somewhere (the audit is non-degenerate on the testdata)."""
    import collections

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import temporal

    ev = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"],
    ).to_pylist()
    by_user = collections.defaultdict(list)
    for r in ev:
        arr = r["event_id"] - r["event_id"] % 4 + (3 - r["event_id"] % 4)
        by_user[r["user_id"]].append((arr, r["ts"]))
    expect = {}
    for u, rows in by_user.items():
        rows.sort()
        prior, n_late, max_late = None, 0, 0
        for _, ts in rows:
            if prior is not None and ts < prior:
                n_late += 1
                d = prior - ts
                max_late = max(
                    max_late,
                    d.days * 86_400_000_000 + d.seconds * 1_000_000
                    + d.microseconds,
                )
            prior = ts if prior is None else max(prior, ts)
        expect[u] = (len(rows), n_late, max_late)

    got = temporal.late_event_report(sf_dir).take_all()
    assert len(got) == len(expect)
    for r in got:
        assert expect[r["user_id"]] == (
            r["n_events"], r["n_late"], r["max_lateness_us"]
        )
    assert sum(r["n_late"] for r in got) > 0


def test_leave_last_out_split_one_test_per_user(sf_dir):
    """Exactly one 'test' row per user — the user's (ts, event_id)
    max — everything else 'train'."""
    import collections

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import temporal

    rows = temporal.leave_last_out_split(sf_dir).take_all()
    ev = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"],
    ).to_pylist()
    assert len(rows) == len(ev)
    latest = {}
    for r in ev:
        key = (r["ts"], r["event_id"])
        if r["user_id"] not in latest or key > latest[r["user_id"]][0]:
            latest[r["user_id"]] = (key, r["event_id"])
    test_rows = collections.defaultdict(list)
    for r in rows:
        if r["split"] == "test":
            test_rows[r["user_id"]].append(r["event_id"])
    assert set(test_rows) == set(latest)
    for u, eids in test_rows.items():
        assert eids == [latest[u][1]]


def test_bpr_triples_strict_preference(sf_dir):
    """Every triple has pos_count > neg_count and matches the true
    per-user type counts; all strictly-ordered pairs are present."""
    import collections

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import temporal

    counts = collections.Counter()
    for r in pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).to_pylist():
        counts[(r["user_id"], r["event_type"])] += 1
    expect = set()
    by_user = collections.defaultdict(list)
    for (u, t), n in counts.items():
        by_user[u].append((t, n))
    for u, tns in by_user.items():
        for t1, n1 in tns:
            for t2, n2 in tns:
                if n1 > n2:
                    expect.add((u, t1, t2, n1, n2))
    got = {
        (r["user_id"], r["pos_type"], r["neg_type"],
         r["pos_count"], r["neg_count"])
        for r in temporal.bpr_triples(sf_dir).take_all()
    }
    assert got == expect
    assert got  # non-degenerate


def test_watermark_window_counts_reconciles_hourly(sf_dir):
    """(n_on_time + n_late) per (hour, type) equals the batch-truth
    hourly counts; total lateness equals the per-user audit."""
    import collections

    from outbreak_kg_ray.pipelines import temporal

    wm = temporal.watermark_window_counts(sf_dir).take_all()
    assert wm
    total = collections.Counter()
    for r in wm:
        assert r["n_on_time"] >= 0 and r["n_late"] >= 0
        total[(r["hour"], r["event_type"])] += (
            r["n_on_time"] + r["n_late"]
        )
    import pyarrow.parquet as pq

    truth = collections.Counter()
    for e in pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pylist():
        truth[(e["ts"].replace(minute=0, second=0, microsecond=0),
               e["event_type"])] += 1
    assert total == truth
    audit = temporal.late_event_report(sf_dir).take_all()
    assert sum(r["n_late"] for r in wm) == \
        sum(r["n_late"] for r in audit)
