"""General relational pipelines over the TPC-H-ish testdata tables —
the engine's generic operator surface (groupby-aggregate, broadcast
join, top-k, time-bucketed aggregation) expressed Ray-Data-first.

These correspond to the reference's generic table ops: A2-style
grouped counting, J1-style broadcast joins, T2/T4 sorts + top-k.
Float outputs are rounded to 6 dp for cross-engine comparability.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from outbreak_kg_ray.functions.rounding import np_round_half_away, pa_round_half_away
from outbreak_kg_ray.sources.io import read_parquet_clean


def pricing_summary(sf_dir: str):
    """lineitem pricing summary (groupby-agg with derived columns;
    per-batch combining happens inside Ray's hash aggregate)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )

    def derive(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return t.append_column("disc_price", disc_price)

    out = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )

    def round2(t: pa.Table) -> pa.Table:
        # money sums rounded to 2 dp: absorbs summation-order float
        # drift across engines while staying exact for comparison
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if pa.types.is_floating(col.type):
                col = pa_round_half_away(col, 2)
            cols[name] = col
        return pa.table(cols)

    return out.map_batches(round2, batch_format="pyarrow")


# A dimension table up to this many rows rides along as a ray.put
# broadcast dict; beyond it, the pipeline swaps to a distributed hash
# join automatically. Picked so the broadcast side stays a few tens of
# MB per worker; the swap is measured (footer row count), not a code
# path the caller chooses — same policy as the KG combine strategy.
BROADCAST_DIM_ROWS = 200_000


def top_customers(sf_dir: str, k: int = 10):
    """orders → revenue per customer → deterministic top-k, with the
    customer name attached. The name side broadcasts while customer
    is measurably small and swaps to a distributed hash join past
    ``BROADCAST_DIM_ROWS`` (customer scales with the corpus — a fixed
    broadcast would be the round-1 O(corpus)-driver-state bug in new
    clothes)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    agg = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="revenue"),
        Count(alias_name="n_orders"),
    )

    cust_path = f"{sf_dir}/customer.parquet"
    n_cust = pq.read_metadata(cust_path).num_rows
    if n_cust <= BROADCAST_DIM_ROWS:
        cust = pq.read_table(cust_path, columns=["c_custkey", "c_name"])
        ref = ray.put(
            dict(
                zip(
                    cust.column("c_custkey").to_pylist(),
                    cust.column("c_name").to_pylist(),
                )
            )
        )

        def attach(t: pa.Table) -> pa.Table:
            name_by_key = ray.get(ref)
            keys = t.column("o_custkey").to_pylist()
            names = [name_by_key.get(key1) for key1 in keys]
            # drop keys absent from customer: the hash-join branch is
            # an inner join, so both branches must agree on non-FK
            # inputs (the swap is execution strategy, not semantics)
            keep = pa.array([n is not None for n in names])
            return pa.table(
                {
                    "c_custkey": t.column("o_custkey"),
                    "c_name": pa.array(names, pa.string()),
                    "revenue": pa_round_half_away(t.column("revenue"), 6),
                    "n_orders": t.column("n_orders"),
                }
            ).filter(keep)

        joined = agg.map_batches(attach, batch_format="pyarrow")
    else:
        customer = read_parquet_clean(
            cust_path, columns=["c_custkey", "c_name"]
        )
        j = agg.join(
            customer,
            join_type="inner",
            num_partitions=_adaptive_join_partitions(cust_path),
            on=("o_custkey",),
            right_on=("c_custkey",),
        )

        def project(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "c_custkey": t.column("o_custkey"),
                    "c_name": t.column("c_name"),
                    "revenue": pa_round_half_away(t.column("revenue"), 6),
                    "n_orders": t.column("n_orders"),
                }
            )

        joined = j.map_batches(project, batch_format="pyarrow")
    return joined.sort(["revenue", "c_custkey"], descending=[True, False]).limit(k)


def events_hourly(sf_dir: str):
    """events bucketed to the hour per event_type: count + sum(value).
    The groupby key (hour, type) is derived per batch — M11-style
    column derivation feeding the A2-style grouped count."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def bucket(t: pa.Table) -> pa.Table:
        hours = pc.floor_temporal(t.column("ts"), unit="hour")
        return pa.table(
            {
                "hour": hours,
                "event_type": t.column("event_type"),
                "value": t.column("value"),
            }
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"),
        )
    )

    def round6(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("sum_value"),
            "sum_value",
            pa_round_half_away(t.column("sum_value"), 6),
        )

    return out.map_batches(round6, batch_format="pyarrow")


def order_lineitem_join(sf_dir: str, *, num_partitions: int | None = None):
    """orders ⋈ lineitem revenue rollup via Ray Data's distributed
    HASH JOIN — the big-side⋈big-side case where no side fits a
    broadcast (contrast: top_customers broadcasts the small customer
    table). Both inputs are column-pruned at the read; the join runs
    with ``num_partitions`` hash partitions and the rollup groups the
    joined stream by order priority.

    → (o_orderpriority, n_items, revenue) rounded to 2 dp."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if (parquet_rows(f"{sf_dir}/orders.parquet") == 0
            or parquet_rows(f"{sf_dir}/lineitem.parquet") == 0):
        return empty_dataset({
            "o_orderpriority": pa.string(), "n_items": pa.int64(),
            "revenue": pa.float64(),
        })
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    if num_partitions is None:
        num_partitions = _adaptive_join_partitions(
            f"{sf_dir}/orders.parquet", f"{sf_dir}/lineitem.parquet"
        )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def derive(t: pa.Table) -> pa.Table:
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "revenue": disc}
        )

    joined = orders.join(
        lineitem.map_batches(derive, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    out = joined.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_items"),
        Sum("revenue", alias_name="revenue"),
    )

    def round2(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("revenue"),
            "revenue",
            pa_round_half_away(t.column("revenue"), 2),
        )

    return out.map_batches(round2, batch_format="pyarrow")


def order_priority_return_rate(
    sf_dir: str, *, num_partitions: int | None = None
):
    """Per-priority order counts and the share of orders with at
    least one returned line (l_returnflag = 'R') — an EXISTS
    semi-join folded into a ratio aggregate (TPC-H Q4's shape over
    this schema's columns).

    Scale shape: the lineitem side collapses BATCH-LOCALLY to one
    (orderkey, flag) row per order per batch (pyarrow group_by
    inside ``map_batches``), so the per-order max shuffle carries at
    most a couple of rows per order instead of every line; the
    orders⋈flags hash join is order-cardinality-bounded on both
    sides; the final group is priority-bounded (5 rows). The ratio
    is derived on that tiny output."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/orders.parquet") == 0:
        return empty_dataset({
            "o_orderpriority": pa.string(), "n_orders": pa.int64(),
            "n_returned": pa.int64(), "return_rate": pa.float64(),
        })
    from ray.data.aggregate import Count, Max, Sum

    if num_partitions is None:
        num_partitions = _adaptive_join_partitions(
            f"{sf_dir}/orders.parquet", f"{sf_dir}/lineitem.parquet"
        )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    )

    def finish(t: pa.Table) -> pa.Table:
        rate = pc.divide(
            pc.cast(t.column("n_returned"), pa.float64()),
            pc.cast(t.column("n_orders"), pa.float64()),
        )
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "n_orders": t.column("n_orders"),
                "n_returned": pc.cast(t.column("n_returned"), pa.int64()),
                "return_rate": pa_round_half_away(rate, 6),
            }
        )

    if parquet_rows(f"{sf_dir}/lineitem.parquet") == 0:
        agg = orders.groupby("o_orderpriority").aggregate(
            Count(alias_name="n_orders")
        )

        def zero(t: pa.Table) -> pa.Table:
            return t.append_column(
                "n_returned", pa.array([0] * t.num_rows, pa.int64())
            )

        return agg.map_batches(zero, batch_format="pyarrow").map_batches(
            finish, batch_format="pyarrow"
        )

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag"],
    )

    # Round-4 exchange shape: the per-order Max groupby + left-outer
    # join (two all-to-alls, one paying Ray's per-group aggregation
    # over ~|orders| groups) collapse into ONE int-keyed partition
    # shuffle.  Both sides are tagged and co-partitioned by a hash of
    # the orderkey; inside each partition a vectorized pc.is_in
    # semi-join marks returned orders and a C++ group_by emits
    # 5-row (priority, n_orders, n_returned) partials; the final
    # combine is priority-bounded.
    import numpy as np

    parts = max(8, num_partitions)

    def _pid(keys: pa.ChunkedArray | pa.Array) -> pa.Array:
        k = keys.to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = (k * np.uint64(0x9E3779B97F4A7C15)) ^ (k >> np.uint64(29))
        return pa.array(
            ((mixed >> np.uint64(17)) % np.uint64(parts)).astype(np.int64)
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(t.column("o_orderkey"), pa.int64()),
                "pri": t.column("o_orderpriority"),
                "_pid": _pid(t.column("o_orderkey")),
            }
        )

    def tag_returned(t: pa.Table) -> pa.Table:
        keys = pc.unique(
            t.filter(pc.equal(t.column("l_returnflag"), pa.scalar("R")))
            .column("l_orderkey")
        )
        return pa.table(
            {
                "k": pc.cast(keys, pa.int64()),
                "pri": pa.nulls(len(keys), pa.string()),
                "_pid": _pid(keys),
            }
        )

    tagged = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        lineitem.map_batches(tag_returned, batch_format="pyarrow")
    )

    def part_counts(t: pa.Table) -> pa.Table:
        pri = t.column("pri")
        is_order = pc.is_valid(pri)
        o = t.filter(is_order)
        rk = pc.unique(t.filter(pc.invert(is_order)).column("k"))
        ret = pc.cast(pc.is_in(o.column("k"), value_set=rk), pa.int64())
        g = (
            pa.table({"o_orderpriority": o.column("pri"), "ret": ret})
            .group_by("o_orderpriority")
            .aggregate([("ret", "count"), ("ret", "sum")])
        )
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "n_orders": g.column("ret_count"),
                "n_ret": g.column("ret_sum"),
            }
        )

    agg = (
        tagged.groupby("_pid")
        .map_groups(part_counts, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_ret", alias_name="n_returned"),
        )
    )
    return agg.map_batches(finish, batch_format="pyarrow")


def _adaptive_join_partitions(*paths: str) -> int:
    """Footer-row-count front-end of the shared partition policy
    (functions/partitions.py)."""
    import pyarrow.parquet as pq

    from outbreak_kg_ray.functions.partitions import adaptive_partitions

    rows = sum(pq.read_metadata(p).num_rows for p in paths)
    return adaptive_partitions(rows)


def revenue_by_nation(sf_dir: str, *, num_partitions: int | None = None):
    """TPC-H Q5-style multi-way join: revenue by supplier nation where
    the customer and the supplier share a nation.

    Join plan (the scale-aware part): the three corpus-scale tables
    (lineitem, orders, customer) chain through Ray Data's distributed
    hash join on their natural keys. Supplier (100× smaller than
    lineitem but still corpus-scaling) broadcasts while measurably
    under ``BROADCAST_DIM_ROWS`` and swaps to a fourth hash join past
    it; nation (a fixed 25-row table) always broadcasts. No dimension
    is re-shipped per batch and nothing corpus-scale is ever
    broadcast.
    """
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if any(
        parquet_rows(f"{sf_dir}/{t}.parquet") == 0
        for t in ("customer", "orders", "lineitem", "nation")
    ):
        return empty_dataset({
            "n_name": pa.string(), "revenue": pa.float64(),
            "n_items": pa.int64(),
        })
    import pyarrow.parquet as pq
    import ray

    if num_partitions is None:
        num_partitions = _adaptive_join_partitions(
            f"{sf_dir}/lineitem.parquet",
            f"{sf_dir}/orders.parquet",
            f"{sf_dir}/customer.parquet",
        )

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    customer = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    supp_path = f"{sf_dir}/supplier.parquet"
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nat_ref = ray.put(
        dict(
            zip(
                nation.column("n_nationkey").to_pylist(),
                nation.column("n_name").to_pylist(),
            )
        )
    )

    def derive(t: pa.Table) -> pa.Table:
        disc = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "rev": disc,
            }
        )

    li = lineitem.map_batches(derive, batch_format="pyarrow")

    if pq.read_metadata(supp_path).num_rows <= BROADCAST_DIM_ROWS:
        supp = pq.read_table(
            supp_path, columns=["s_suppkey", "s_nationkey"]
        )
        supp_ref = ray.put(
            dict(
                zip(
                    supp.column("s_suppkey").to_pylist(),
                    supp.column("s_nationkey").to_pylist(),
                )
            )
        )

        def attach_snat(t: pa.Table) -> pa.Table:
            supp_nat = ray.get(supp_ref)
            snat = np.array(
                [supp_nat.get(s, -1)
                 for s in t.column("l_suppkey").to_pylist()],
                dtype=np.int64,
            )
            return pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "s_nationkey": pa.array(snat),
                    "rev": t.column("rev"),
                }
            )

        li = li.map_batches(attach_snat, batch_format="pyarrow")
    else:
        supplier = read_parquet_clean(
            supp_path, columns=["s_suppkey", "s_nationkey"]
        )
        li = li.join(
            supplier,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        ).select_columns(["l_orderkey", "s_nationkey", "rev"])

    cust_path = f"{sf_dir}/customer.parquet"
    if pq.read_metadata(cust_path).num_rows <= BROADCAST_DIM_ROWS:
        # measured-size broadcast (same policy as supplier): the
        # custkey→nationkey map rides the lineitem⋈orders output, so
        # the second corpus-scale hash join disappears entirely
        cust = pq.read_table(
            cust_path, columns=["c_custkey", "c_nationkey"]
        )
        cust_ref = ray.put(
            dict(
                zip(
                    cust.column("c_custkey").to_pylist(),
                    cust.column("c_nationkey").to_pylist(),
                )
            )
        )
        joined = li.join(
            orders,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def attach_dims(t: pa.Table) -> pa.Table:
            if "s_nationkey" not in t.column_names or len(t) == 0:
                return pa.table(
                    {"n_name": pa.array([], pa.string()),
                     "rev": pa.array([], pa.float64())}
                )
            cust_nat = ray.get(cust_ref)
            nat_name = ray.get(nat_ref)
            snat = t.column("s_nationkey").to_numpy(
                zero_copy_only=False
            )
            cnat = np.array(
                [cust_nat.get(c, -2)
                 for c in t.column("o_custkey").to_pylist()],
                dtype=np.int64,
            )
            keep = snat == cnat
            names = [nat_name.get(int(nk)) for nk in snat[keep]]
            return pa.table(
                {
                    "n_name": pa.array(names, pa.string()),
                    "rev": t.column("rev").filter(pa.array(keep)),
                }
            )

    else:
        joined = (
            li.join(
                orders,
                join_type="inner",
                num_partitions=num_partitions,
                on=("l_orderkey",),
                right_on=("o_orderkey",),
            )
            .join(
                customer,
                join_type="inner",
                num_partitions=num_partitions,
                on=("o_custkey",),
                right_on=("c_custkey",),
            )
        )

        def attach_dims(t: pa.Table) -> pa.Table:
            nat_name = ray.get(nat_ref)
            snat = t.column("s_nationkey").to_numpy(
                zero_copy_only=False
            )
            cnat = t.column("c_nationkey").to_numpy(
                zero_copy_only=False
            )
            keep = snat == cnat
            names = [nat_name.get(int(nk)) for nk in snat[keep]]
            return pa.table(
                {
                    "n_name": pa.array(names, pa.string()),
                    "rev": t.column("rev").filter(pa.array(keep)),
                }
            )

    from ray.data.aggregate import Sum

    def local_sum(t: pa.Table) -> pa.Table:
        # nation-bounded combiner: ≤25 rows leave each batch, so the
        # final exchange ships 25×blocks rows, never the join output
        if "n_name" not in t.column_names or len(t) == 0:
            return pa.table(
                {"n_name": pa.array([], pa.string()),
                 "rev": pa.array([], pa.float64()),
                 "c": pa.array([], pa.int64())}
            )
        return (
            t.append_column("c", pa.array([1] * len(t), pa.int64()))
            .group_by("n_name")
            .aggregate([("rev", "sum"), ("c", "sum")])
            .rename_columns(["n_name", "rev", "c"])
        )

    out = (
        joined.map_batches(attach_dims, batch_format="pyarrow")
        .map_batches(local_sum, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("rev", alias_name="revenue"),
            Sum("c", alias_name="n_items"),
        )
    )

    def round2(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("revenue"),
            "revenue",
            pa_round_half_away(t.column("revenue"), 2),
        )

    return out.map_batches(round2, batch_format="pyarrow")


def top_customers_by_nation(sf_dir: str, *, k: int = 3):
    """Per-nation top-k customers by order revenue — the grouped
    top-k operator (window ``row_number() <= k`` in SQL).

    Shape: revenue pre-aggregates per customer FIRST (orders →
    groupby(custkey), output bounded by |customers|), then one hash
    join attaches c_nationkey, and the grouped top-k runs per nation
    over per-customer rows — the expensive exchange is the
    pre-aggregated table, never raw orders. Ties break by ascending
    custkey on both engines."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if (parquet_rows(f"{sf_dir}/customer.parquet") == 0
            or parquet_rows(f"{sf_dir}/orders.parquet") == 0):
        return empty_dataset({
            "c_nationkey": pa.int32(), "c_custkey": pa.int64(),
            "revenue": pa.float64(), "rank": pa.int64(),
        })
    from ray.data.aggregate import Sum

    num_partitions = _adaptive_join_partitions(
        f"{sf_dir}/orders.parquet", f"{sf_dir}/customer.parquet"
    )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    rev = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="revenue")
    )
    joined = rev.join(
        customer,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def topk(g: pa.Table) -> pa.Table:
        # Arrow-native per-group top-k: numpy lexsort, no pandas
        rev = g.column("revenue").to_numpy(zero_copy_only=False)
        cust = g.column("o_custkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((cust, -rev))[:k]
        return pa.table(
            {
                "c_nationkey": g.column("c_nationkey").take(
                    pa.array(order, pa.int64())
                ),
                "c_custkey": pa.array(cust[order], pa.int64()),
                "revenue": pa.array(
                    np_round_half_away(rev[order], 6), pa.float64()
                ),
                "rank": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    return joined.groupby("c_nationkey").map_groups(
        topk, batch_format="pyarrow"
    )


def token_count_quantiles(sf_dir: str):
    """Exact linear-interpolated quantiles (p50/p90/p99) of the
    per-document whitespace token count.

    Distributed shape: token counts are small integers, so the
    groupby(count) histogram is VALUE-bounded (thousands of distinct
    counts regardless of corpus size); the tiny histogram reaches the
    driver and the interpolation is exact — the same
    bounded-domain trick the ship-window join uses with the
    calendar. Matches DuckDB ``quantile_cont`` (linear
    interpolation at rank p·(n−1))."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from outbreak_kg_ray.functions.rounding import round_half_away

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_tokens": pa.array(
                    [len(x.split()) for x in t.column("text").to_pylist()],
                    pa.int64(),
                )
            }
        )

    hist = (
        docs.map_batches(counts, batch_format="pyarrow")
        .groupby("n_tokens")
        .aggregate(Count(alias_name="freq"))
        .take_all()
    )  # value-bounded: one row per distinct token count
    if not hist:  # empty corpus → NULL quantiles, like quantile_cont
        null = pa.array([None], pa.float64())
        return pa.table({"q50": null, "q90": null, "q99": null})
    hist.sort(key=lambda r: r["n_tokens"])
    values = np.array([r["n_tokens"] for r in hist], dtype=np.float64)
    freqs = np.array([r["freq"] for r in hist], dtype=np.int64)
    cum = np.cumsum(freqs)
    n = int(cum[-1])

    def q(p: float) -> float:
        pos = p * (n - 1)
        lo_i, frac = int(np.floor(pos)), pos - np.floor(pos)
        lo_v = values[np.searchsorted(cum, lo_i + 1, side="left")]
        hi_v = values[np.searchsorted(cum, min(lo_i + 1, n - 1) + 1,
                                      side="left")]
        return round_half_away(lo_v + (hi_v - lo_v) * frac, 6)

    return pa.table(
        {
            "q50": pa.array([q(0.5)], pa.float64()),
            "q90": pa.array([q(0.9)], pa.float64()),
            "q99": pa.array([q(0.99)], pa.float64()),
        }
    )


def pricing_rollup(sf_dir: str):
    """Pricing summary with ROLLUP semantics: per (returnflag,
    linestatus), per returnflag subtotals, and the grand total —
    GROUPING SETS as a union of three aggregates over ONE shared
    pre-aggregated pass. The detail level is computed once; the
    coarser levels re-aggregate ITS output (bounded by the group
    cardinality, not the corpus), so the corpus is scanned exactly
    once. Rollup keys use the literal 'ALL' (the distributed stand-in
    for SQL's NULL grouping marker, which hash-compare can't
    distinguish from data nulls)."""
    # materialize: the lazy detail Dataset is consumed by three
    # branches and Ray Data would re-run the lineitem scan+aggregate
    # per branch; the materialized table is group-bounded
    # (|flags|×|statuses| rows), so "scanned exactly once" holds
    detail = pricing_summary(sf_dir).materialize()
    base = detail.map_batches(
        _gs_relabel(None, None), batch_format="pyarrow"
    )
    by_flag = _gs_reagg(
        detail.map_batches(_gs_relabel(None, "ALL"), batch_format="pyarrow")
    )
    grand = _gs_reagg(
        detail.map_batches(_gs_relabel("ALL", "ALL"), batch_format="pyarrow")
    )
    return base.select_columns(
        ["l_returnflag", "l_linestatus", "sum_qty", "count_order"]
    ).union(by_flag, grand)


def _gs_relabel(col_flag: str | None, col_status: str | None):
    """Grouping-set projector: pin a key column to the literal 'ALL'
    marker (the distributed stand-in for SQL's NULL grouping marker)
    or pass it through."""

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "l_returnflag": (
                    t.column("l_returnflag")
                    if col_flag is None
                    else pa.array([col_flag] * n, pa.string())
                ),
                "l_linestatus": (
                    t.column("l_linestatus")
                    if col_status is None
                    else pa.array([col_status] * n, pa.string())
                ),
                "sum_qty": t.column("sum_qty"),
                "count_order": t.column("count_order"),
            }
        )

    return f


def _gs_reagg(ds):
    """Re-aggregate a relabeled detail stream — bounded by the group
    cardinality, never the corpus."""
    from ray.data.aggregate import Sum

    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("count_order", alias_name="count_order"),
    )

    def round2(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("sum_qty"),
            "sum_qty",
            pa_round_half_away(t.column("sum_qty"), 2),
        )

    return out.map_batches(round2, batch_format="pyarrow")


def pricing_cube(sf_dir: str):
    """Pricing summary with CUBE semantics: all four grouping sets of
    (returnflag, linestatus) — detail, per-flag, per-status, grand
    total — from ONE shared pre-aggregated pass, completing the
    grouping-sets family next to ``pricing_rollup``. The corpus is
    scanned exactly once (by ``pricing_summary``); every coarser set
    re-aggregates that group-bounded output."""
    # materialized for the same reason as pricing_rollup: four
    # consumers of one lazy Dataset would each re-run the scan
    detail = pricing_summary(sf_dir).materialize()
    base = detail.map_batches(
        _gs_relabel(None, None), batch_format="pyarrow"
    )
    by_flag = _gs_reagg(
        detail.map_batches(_gs_relabel(None, "ALL"), batch_format="pyarrow")
    )
    by_status = _gs_reagg(
        detail.map_batches(_gs_relabel("ALL", None), batch_format="pyarrow")
    )
    grand = _gs_reagg(
        detail.map_batches(_gs_relabel("ALL", "ALL"), batch_format="pyarrow")
    )
    return base.select_columns(
        ["l_returnflag", "l_linestatus", "sum_qty", "count_order"]
    ).union(by_flag, by_status, grand)


def events_props_stats(sf_dir: str):
    """Per-event-type stats over a JSON payload column — the
    reference's ``json.loads`` surface (kg/client.py:104) done
    vectorized: the field is pulled with ONE ``pc.extract_regex``
    over the whole batch (no per-row json.loads in the hot path),
    then a plain grouped aggregate."""
    from ray.data.aggregate import Count, Max, Sum

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def parse(t: pa.Table) -> pa.Table:
        # whitespace-tolerant and sign-aware, so the extraction does
        # not couple to the generator's exact json.dumps formatting
        hits = pc.extract_regex(
            t.column("props"), r'"k"\s*:\s*(?P<k>-?\d+)'
        )
        k = pc.cast(pc.struct_field(hits, "k"), pa.int64())
        return pa.table({"event_type": t.column("event_type"), "k": k})

    return (
        ds.map_batches(parse, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="sum_k"),
            Max("k", alias_name="max_k"),
        )
    )


def customers_without_orders(sf_dir: str, *, since: str = "2000-01-01"):
    """Anti-join: customers with no order on/after ``since``. Shape:
    the order side is row-filtered AT THE SCAN, then collapses to its
    distinct keys (bounded by |customers|) before one left-outer hash
    join and a null filter — the standard distributed anti-join; no
    corpus-scale broadcast."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/customer.parquet") == 0:
        return empty_dataset({
            "c_custkey": pa.int64(), "c_name": pa.string(),
        })
    if parquet_rows(f"{sf_dir}/orders.parquet") == 0:
        # no orders at all: EVERY customer qualifies
        return read_parquet_clean(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name"],
        )
    import numpy as np

    from ray.data.aggregate import Count

    num_partitions = _adaptive_join_partitions(
        f"{sf_dir}/customer.parquet", f"{sf_dir}/orders.parquet"
    )
    customer = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    cutoff = np.datetime64(since)

    def recent(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(
            t.column("o_orderdate"),
            pa.scalar(cutoff.astype("datetime64[us]").item()),
        )
        return t.filter(mask).select(["o_custkey"])

    order_keys = (
        read_parquet_clean(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate"],
        )
        .map_batches(recent, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="_n"))
    )
    joined = customer.join(
        order_keys,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def anti(t: pa.Table) -> pa.Table:
        mask = pc.is_null(t.column("_n"))
        kept = t.filter(mask)
        return kept.select(["c_custkey", "c_name"])

    return joined.map_batches(anti, batch_format="pyarrow")


def events_sliding_window(sf_dir: str):
    """3-hour sliding-window aggregate per event type — the custom
    windowed operator Ray Data lacks natively, composed per
    SURVEY.md §2 guidance: hour-bucket pre-aggregation inside
    ``map_batches`` + ``groupby(type)`` + per-group ordered rolling.

    Partitioning assumption (documented): the window is applied AFTER
    hour-level pre-aggregation, so each group is (hours × 1 row) —
    bounded by the time range, not the event count; a year of hourly
    buckets is ~9k rows per type. The expensive exchange is the tiny
    hourly table, never raw events."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.floor_temporal(t.column("ts"), unit="hour"),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
            }
        )

    hourly = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sv"))
    )

    def roll(g: pa.Table) -> pa.Table:
        # time-based 3h rolling sum, Arrow/numpy-native: sort by hour,
        # prefix sums, and a searchsorted left boundary per row
        # (pandas rolling("3h") semantics: window (t-3h, t], right-
        # closed — gaps in the hourly grid respected)
        hours = g.column("hour").to_numpy(zero_copy_only=False)
        order = np.argsort(hours, kind="stable")
        take = pa.array(order, pa.int64())
        hours = hours[order]
        n_ev = g.column("n_events").to_numpy(zero_copy_only=False)[order]
        sv = g.column("sv").to_numpy(zero_copy_only=False)[order]
        h_i = hours.astype("datetime64[ns]").astype(np.int64)
        lo = np.searchsorted(
            h_i, h_i - np.int64(3 * 3600 * 1_000_000_000), side="right"
        )
        cn = np.concatenate(([0], np.cumsum(n_ev)))
        cv = np.concatenate(([0.0], np.cumsum(sv)))
        idx = np.arange(1, len(hours) + 1)
        return pa.table(
            {
                "hour": pa.array(hours).cast(pa.timestamp("us")),
                "event_type": g.column("event_type").take(take),
                "n_events": pa.array(n_ev, pa.int64()),
                "window_events": pa.array(cn[idx] - cn[lo], pa.int64()),
                "window_value": pa.array(
                    np_round_half_away(cv[idx] - cv[lo], 6), pa.float64()
                ),
            }
        )

    return hourly.groupby("event_type").map_groups(
        roll, batch_format="pyarrow"
    )


def cumulative_order_revenue(sf_dir: str):
    """Ordered window analytics: per customer, orders sorted by
    (o_orderdate, o_orderkey) with a 1-based sequence number and a
    running revenue total — the classic ROW_NUMBER / SUM OVER pair.

    Distributed shape: ONE hash shuffle by ``o_custkey`` (group size
    bounded by a single customer's history), then a vectorized sort +
    cumsum per group — no per-row Python.  The running sum is left at
    full float precision except the final 2-dp money rounding; both
    engines accumulate in the same (o_orderdate, o_orderkey) order, so
    the cumsum is bit-stable across the oracle comparison.
    """

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def running(g: pa.Table) -> pa.Table:
        dates = g.column("o_orderdate").to_numpy(zero_copy_only=False)
        keys = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, dates))
        take = pa.array(order, pa.int64())
        prices = g.column("o_totalprice").to_numpy(
            zero_copy_only=False
        )[order]
        return pa.table(
            {
                "o_custkey": g.column("o_custkey").take(take),
                "o_orderkey": pa.array(keys[order], pa.int64()),
                "o_orderdate": g.column("o_orderdate").take(take),
                "order_seq": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64),
                    pa.int64(),
                ),
                "cum_revenue": pa.array(
                    np_round_half_away(np.cumsum(prices), 2),
                    pa.float64(),
                ),
            }
        )

    return orders.groupby("o_custkey").map_groups(
        running, batch_format="pyarrow"
    )


def parts_with_large_orders(sf_dir: str, *, min_qty: int = 45):
    """Semi-join (the EXISTS complement of
    ``customers_without_orders``): parts having at least one lineitem
    with quantity ≥ ``min_qty``.  Shape: the probe side is
    row-filtered AT THE SCAN and collapses to its distinct keys
    (bounded by |part|) BEFORE the single inner hash join — the
    filter+distinct runs where the data is, and only keys enter the
    exchange; no corpus-scale broadcast, no row multiplication."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if (parquet_rows(f"{sf_dir}/part.parquet") == 0
            or parquet_rows(f"{sf_dir}/lineitem.parquet") == 0):
        return empty_dataset({
            "p_partkey": pa.int64(), "p_name": pa.string(),
        })
    from ray.data.aggregate import Count

    num_partitions = _adaptive_join_partitions(
        f"{sf_dir}/part.parquet", f"{sf_dir}/lineitem.parquet"
    )
    part = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )

    def big(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t.column("l_quantity"), min_qty)
        return t.filter(mask).select(["l_partkey"])

    keys = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity"],
        )
        .map_batches(big, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Count(alias_name="_n"))
    )
    joined = part.join(
        keys,
        join_type="inner",
        num_partitions=num_partitions,
        on=("p_partkey",),
        right_on=("l_partkey",),
    )

    def project(t: pa.Table) -> pa.Table:
        return t.select(["p_partkey", "p_name"])

    return joined.map_batches(project, batch_format="pyarrow")


def retention_cohorts(sf_dir: str, *, num_partitions: int | None = None):
    """Weekly retention cohorts over the events stream: users are
    cohorted by the ISO week of their FIRST event; each later active
    week contributes one user to (cohort_week, week_offset).  The
    classic product-analytics rollup.

    Scale shape: the raw stream first collapses to DISTINCT
    (user_id, week) via a combining hash aggregate (per-block
    pre-aggregation, so the exchange carries user-week pairs, not
    events), the cohort table is a second user-keyed aggregate of
    that already-collapsed set, and the join back is user-hash
    partitioned — every structure is bounded by users × active
    weeks, never by event count."""
    from ray.data.aggregate import Count, Min

    import pyarrow.parquet as pq_

    from outbreak_kg_ray.sources.io import empty_dataset

    n_rows = pq_.read_metadata(f"{sf_dir}/events.parquet").num_rows
    if n_rows == 0:
        return empty_dataset(
            {
                "cohort_week": pa.timestamp("us"),
                "week_offset": pa.int64(),
                "n_users": pa.int64(),
            }
        )
    if num_partitions is None:
        # lo=1: a tiny corpus must not split the user-key join into a
        # partition that receives no shards (Ray 2.49 zero-column
        # finalize, see _adaptive_join_partitions docstring)
        from outbreak_kg_ray.functions.partitions import adaptive_partitions

        num_partitions = adaptive_partitions(n_rows, lo=1)
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def week(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "week": pc.floor_temporal(
                    t.column("ts"), unit="week", week_starts_monday=True
                ),
            }
        )

    # (round 4) the distinct (user, week) collapse, the per-user
    # cohort Min and the join back all fuse into ONE user-keyed hash
    # partition exchange (keyed_partitions): within a partition every
    # user's weeks are co-located, so a C++ group_by derives the
    # cohort, an in-partition acero join attaches it, and the
    # partition emits (cohort_week, week_offset, n) PARTIALS bounded
    # by weeks² — only those partials enter the final (tiny) Sum.
    from ray.data.aggregate import Sum

    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    def part_cohorts(t: pa.Table) -> pa.Table:
        d = (
            t.select(["user_id", "week"])
            .group_by(["user_id", "week"])
            .aggregate([([], "count_all")])
            .drop_columns(["count_all"])
        )
        c = d.group_by("user_id").aggregate([("week", "min")])
        j = d.join(c, keys=["user_id"])
        wk = j.column("week").cast(pa.timestamp("us")).cast(pa.int64())
        cw = j.column("week_min").cast(pa.timestamp("us"))
        delta_us = pc.subtract(wk, cw.cast(pa.int64()))
        off = pc.divide(delta_us, pa.scalar(7 * 86_400_000_000, pa.int64()))
        return (
            pa.table({"cohort_week": cw, "week_offset": off})
            .group_by(["cohort_week", "week_offset"])
            .aggregate([([], "count_all")])
            .rename_columns(["cohort_week", "week_offset", "_n"])
        )

    partials = keyed_partitions(
        ds.map_batches(week, batch_format="pyarrow"),
        ["user_id"],
        part_cohorts,
        schema=pa.schema(
            [("cohort_week", pa.timestamp("us")),
             ("week_offset", pa.int64()), ("_n", pa.int64())]
        ),
    )
    return (
        partials.groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("_n", alias_name="n_users"))
    )


def events_gap_fill(sf_dir: str):
    """Zero-filled hourly resample: events_hourly's (hour, event_type)
    counts projected onto the COMPLETE hour × type grid between the
    corpus's first and last event — silent-gap detection for stream
    monitoring (a missing hour shows as an explicit 0, not an absent
    row).

    Scale shape: the aggregate side is calendar-bounded (hours ×
    types, independent of event count) so the grid fill happens on
    the aggregate OUTPUT — the raw stream is touched exactly once by
    the same combining aggregate events_hourly uses; the grid is a
    generated Dataset, not a driver loop over data."""
    import pyarrow.parquet as pq_
    import ray.data as rd

    from outbreak_kg_ray.sources.io import empty_dataset

    if pq_.read_metadata(f"{sf_dir}/events.parquet").num_rows == 0:
        return empty_dataset(
            {
                "hour": pa.timestamp("us"),
                "event_type": pa.string(),
                "n_events": pa.int64(),
            }
        )

    hourly = events_hourly(sf_dir).materialize()  # calendar-bounded

    # grid bounds + type vocabulary from the (bounded) aggregate
    lo = hourly.min("hour")
    hi = hourly.max("hour")
    types = sorted(
        r["event_type"]
        for r in hourly.groupby("event_type").count().take_all()
    )
    lo64 = int(pa.scalar(lo, pa.timestamp("us")).cast(pa.int64()).as_py())
    hi64 = int(pa.scalar(hi, pa.timestamp("us")).cast(pa.int64()).as_py())
    hours = np.arange(lo64, hi64 + 1, 3_600_000_000, dtype=np.int64)
    grid = rd.from_arrow(
        pa.table(
            {
                "hour": pa.array(
                    np.repeat(hours, len(types)), pa.int64()
                ).cast(pa.timestamp("us")),
                "event_type": pa.array(
                    list(types) * len(hours), pa.string()
                ),
            }
        )
    )

    counts = hourly.map_batches(
        lambda t: pa.table(
            {
                "hour": t.column("hour").cast(pa.timestamp("us")),
                "event_type": t.column("event_type"),
                "n_events": t.column("n_events").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = grid.join(
        counts, "left_outer", 2, on=("hour", "event_type")
    )

    def fill(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "hour" not in t.column_names:
            return pa.table(
                {
                    "hour": pa.array([], pa.timestamp("us")),
                    "event_type": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "hour": t.column("hour"),
                "event_type": t.column("event_type"),
                "n_events": pc.coalesce(
                    t.column("n_events"), pa.scalar(0, pa.int64())
                ),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def events_hourly_anomalies(sf_dir: str, *, z_threshold: float = 3.0):
    """Per-type z-scores over the zero-filled hourly series — the
    stream-monitoring anomaly detector: an hour whose count sits
    ``z_threshold`` standard deviations from its type's mean (gaps
    INCLUDED as zeros, so a silent outage scores as anomalous, not
    invisible).

    Shape: the gap-filled grid is calendar-bounded; per-type mean/std
    are a bounded aggregate over it, broadcast back as a join against
    the same grid — population std (ddof=0) in BOTH engines, computed
    from Σx/Σx² partials so no per-type vector ever materializes."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from outbreak_kg_ray.functions.rounding import pa_round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset

    import pyarrow.parquet as pq_

    if pq_.read_metadata(f"{sf_dir}/events.parquet").num_rows == 0:
        return empty_dataset(
            {
                "hour": pa.timestamp("us"),
                "event_type": pa.string(),
                "n_events": pa.int64(),
                "zscore": pa.float64(),
                "anomalous": pa.bool_(),
            }
        )

    grid = events_gap_fill(sf_dir).materialize()  # calendar-bounded

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("n_events").cast(pa.float64())
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "x": x,
                "xx": pc.multiply(x, x),
            }
        )

    stats = (
        grid.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"),
            Sum("xx", alias_name="sxx"),
        )
    )

    def finish_stats(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "event_type" not in t.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "mean": pa.array([], pa.float64()),
                    "std": pa.array([], pa.float64()),
                }
            )
        n = t.column("n").cast(pa.float64())
        mean = pc.divide(t.column("sx"), n)
        var = pc.subtract(
            pc.divide(t.column("sxx"), n), pc.multiply(mean, mean)
        )
        std = pc.sqrt(pc.max_element_wise(var, pa.scalar(0.0)))
        return pa.table(
            {"event_type": t.column("event_type"), "mean": mean,
             "std": std}
        )

    # the stats side is bounded by the event-type vocabulary —
    # broadcast it rather than hash-joining the grid against a
    # handful of rows
    typed = {
        r["event_type"]: (r["mean"], r["std"])
        for r in stats.map_batches(
            finish_stats, batch_format="pyarrow"
        ).take_all()
    }

    def score(t: pa.Table) -> pa.Table:
        means = pa.array(
            [typed[et][0] for et in t.column("event_type").to_pylist()],
            pa.float64(),
        )
        stds = pa.array(
            [typed[et][1] for et in t.column("event_type").to_pylist()],
            pa.float64(),
        )
        x = t.column("n_events").cast(pa.float64())
        z = pc.divide(pc.subtract(x, means), stds)
        return pa.table(
            {
                "hour": t.column("hour"),
                "event_type": t.column("event_type"),
                "n_events": t.column("n_events"),
                "zscore": pa_round_half_away(z, 6),
                "anomalous": pc.greater(
                    pc.abs(z), pa.scalar(float(z_threshold))
                ),
            }
        )

    return grid.map_batches(score, batch_format="pyarrow")


def events_value_histogram(sf_dir: str, *, bin_width: float = 25.0):
    """Fixed-width histogram of events.value: count + mean per
    ``bin_width``-sized bucket — the distribution profile an
    ingest-monitoring dashboard draws.

    One combining aggregate over a per-batch derived bin id; the
    exchange is bounded by the bin count, never the event count.
    The bin id is an integer (floor(value / width)) so the groupby
    key is drift-free; only the per-bin mean is float, rounded 6 dp."""
    from ray.data.aggregate import Count, Sum

    from outbreak_kg_ray.sources.io import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])

    def bin_id(t: pa.Table) -> pa.Table:
        b = pc.floor(
            pc.divide(t.column("value"), pa.scalar(float(bin_width)))
        ).cast(pa.int64())
        return pa.table({"bin": b, "value": t.column("value")})

    out = (
        ds.map_batches(bin_id, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="_sum"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "bin" not in t.column_names:
            return pa.table(
                {
                    "bin": pa.array([], pa.int64()),
                    "bin_lo": pa.array([], pa.float64()),
                    "n_events": pa.array([], pa.int64()),
                    "mean_value": pa.array([], pa.float64()),
                }
            )
        mean = pc.divide(
            t.column("_sum"), t.column("n_events").cast(pa.float64())
        )
        return pa.table(
            {
                "bin": t.column("bin"),
                "bin_lo": pc.multiply(
                    t.column("bin").cast(pa.float64()),
                    pa.scalar(float(bin_width)),
                ),
                "n_events": t.column("n_events").cast(pa.int64()),
                "mean_value": pa_round_half_away(mean, 6),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def user_top_event_type(sf_dir: str):
    """Per-user modal event type (most frequent; ties broken by type
    name ascending) with its count — per-group mode, the "dominant
    behavior" profile column a feature store materializes.

    Two combining aggregates: the raw stream collapses to
    (user, type, n) — users × types bounded — then a user-keyed
    map_groups picks the mode vectorized; group size ≤ #types."""
    from ray.data.aggregate import Count

    from outbreak_kg_ray.sources.io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    counts = (
        ds.groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n"))
    )

    def mode(g: pa.Table) -> pa.Table:
        n = g.column("n").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        best = int(np.lexsort((et, -n))[0])
        take = pa.array([best], pa.int64())
        return pa.table(
            {
                "user_id": g.column("user_id").take(take),
                "top_event_type": g.column("event_type").take(take),
                "n": pa.array([int(n[best])], pa.int64()),
            }
        )

    return counts.groupby("user_id").map_groups(
        mode, batch_format="pyarrow"
    )


def events_type_value_quantiles(sf_dir: str):
    """Exact per-type p50/p90/p99 of events.value via the same
    value-bounded histogram trick as token_count_quantiles — values
    have cent granularity so the (type, value) histogram is bounded
    by the value DOMAIN, not the event count; the per-type quantile
    interpolation runs inside a type-keyed map_groups over that
    bounded histogram (group size ≤ distinct values), never over raw
    events.  Matches DuckDB ``quantile_cont`` (rank p·(n−1))."""
    from ray.data.aggregate import Count

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset

    import pyarrow.parquet as pq_

    if pq_.read_metadata(f"{sf_dir}/events.parquet").num_rows == 0:
        return empty_dataset(
            {
                "event_type": pa.string(),
                "q50": pa.float64(),
                "q90": pa.float64(),
                "q99": pa.float64(),
            }
        )

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    hist = (
        ds.groupby(["event_type", "value"])
        .aggregate(Count(alias_name="freq"))
    )

    def quantiles(g: pa.Table) -> pa.Table:
        values = g.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        freqs = g.column("freq").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(values, kind="stable")
        values = values[order]
        cum = np.cumsum(freqs[order])
        n = int(cum[-1])

        def q(p: float) -> float:
            pos = p * (n - 1)
            lo_i, frac = int(np.floor(pos)), pos - np.floor(pos)
            lo_v = values[np.searchsorted(cum, lo_i + 1, side="left")]
            hi_v = values[
                np.searchsorted(cum, min(lo_i + 1, n - 1) + 1, side="left")
            ]
            return round_half_away(lo_v + (hi_v - lo_v) * frac, 6)

        return pa.table(
            {
                "event_type": g.column("event_type").slice(0, 1),
                "q50": pa.array([q(0.5)], pa.float64()),
                "q90": pa.array([q(0.9)], pa.float64()),
                "q99": pa.array([q(0.99)], pa.float64()),
            }
        )

    return hist.groupby("event_type").map_groups(
        quantiles, batch_format="pyarrow"
    )


def events_winsorized_mean(sf_dir: str, *, lo: float = 0.05,
                           hi: float = 0.95):
    """Per-type winsorized mean of events.value (clip at the exact
    [lo, hi] quantiles, then average) — the robust mean that survives
    fat-tailed value columns.

    Scale shape: everything — BOTH quantiles AND the clipped mean —
    derives from the ONE value-domain-bounded (type, value) histogram
    pass the other quantile ops share: the clipped mean is a weighted
    fold over the histogram, so no second corpus scan.  Quantile
    interpolation matches DuckDB ``quantile_cont`` (rank p·(n−1))."""
    from ray.data.aggregate import Count

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset({
            "event_type": pa.string(), "wins_mean": pa.float64(),
            "qlo": pa.float64(), "qhi": pa.float64(),
            "n_events": pa.int64(),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    hist = ds.groupby(["event_type", "value"]).aggregate(
        Count(alias_name="freq")
    )

    def stats(g: pa.Table) -> pa.Table:
        raw_v = g.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        raw_f = g.column("freq").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(raw_v, kind="stable")
        values = raw_v[order]
        freqs = raw_f[order]
        cum = np.cumsum(freqs)
        n = int(cum[-1])

        def q(p: float) -> float:
            pos = p * (n - 1)
            lo_i, frac = int(np.floor(pos)), pos - np.floor(pos)
            lo_v = values[np.searchsorted(cum, lo_i + 1, side="left")]
            hi_v = values[
                np.searchsorted(cum, min(lo_i + 1, n - 1) + 1,
                                side="left")
            ]
            return float(lo_v + (hi_v - lo_v) * frac)

        qlo, qhi = q(lo), q(hi)
        clipped = np.clip(values, qlo, qhi)
        wmean = float((freqs * clipped).sum() / n)
        return pa.table(
            {
                "event_type": g.column("event_type").slice(0, 1),
                "wins_mean": pa.array(
                    [round_half_away(wmean, 6)], pa.float64()
                ),
                "qlo": pa.array([round_half_away(qlo, 6)], pa.float64()),
                "qhi": pa.array([round_half_away(qhi, 6)], pa.float64()),
                "n_events": pa.array([n], pa.int64()),
            }
        )

    return hist.groupby("event_type").map_groups(
        stats, batch_format="pyarrow"
    )


def lineitem_qty_price_corr(sf_dir: str):
    """Pearson correlation of (l_quantity, l_extendedprice) per
    l_returnflag — the grouped statistical aggregate, computed from
    one pass of per-batch moment partials (n, Σx, Σy, Σxy, Σx², Σy²)
    so the exchange is flag-vocabulary-bounded and the correlation
    formula runs once per group.  The oracle spells out the SAME
    moment formula (not corr(), whose streaming algorithm differs in
    the last float bits); 6-dp rounding absorbs summation-order
    drift."""
    from ray.data.aggregate import Count, Sum

    from outbreak_kg_ray.sources.io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("l_quantity").cast(pa.float64())
        y = t.column("l_extendedprice").cast(pa.float64())
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "xx": pc.multiply(x, x),
                "yy": pc.multiply(y, y),
            }
        )

    agg = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"),
            Sum("xy", alias_name="sxy"),
            Sum("xx", alias_name="sxx"),
            Sum("yy", alias_name="syy"),
        )
    )

    def corr(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "l_returnflag" not in t.column_names:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "corr_qty_price": pa.array([], pa.float64()),
                }
            )
        n = t.column("n").cast(pa.float64())
        num = pc.subtract(
            pc.multiply(n, t.column("sxy")),
            pc.multiply(t.column("sx"), t.column("sy")),
        )
        den = pc.multiply(
            pc.sqrt(
                pc.subtract(
                    pc.multiply(n, t.column("sxx")),
                    pc.multiply(t.column("sx"), t.column("sx")),
                )
            ),
            pc.sqrt(
                pc.subtract(
                    pc.multiply(n, t.column("syy")),
                    pc.multiply(t.column("sy"), t.column("sy")),
                )
            ),
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "n": t.column("n").cast(pa.int64()),
                "corr_qty_price": pa_round_half_away(
                    pc.divide(num, den), 6
                ),
            }
        )

    return agg.map_batches(corr, batch_format="pyarrow")


def customer_rfm(sf_dir: str):
    """Per-customer RFM features — recency (days since the
    customer's last order, relative to the corpus's latest order
    date), frequency (order count) and monetary (total spend) — the
    canonical feature-store rollup.

    One combining aggregate keyed by customer; the global anchor date
    is a scalar Max aggregate (no materialization).  Monetary is
    rounded to 2 dp like the other money sums."""
    from ray.data.aggregate import Count, Max, Sum

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    anchor = orders.max("o_orderdate")

    agg = orders.groupby("o_custkey").aggregate(
        Max("o_orderdate", alias_name="_last"),
        Count(alias_name="frequency"),
        Sum("o_totalprice", alias_name="_spend"),
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "o_custkey" not in t.column_names:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "recency_days": pa.array([], pa.int64()),
                    "frequency": pa.array([], pa.int64()),
                    "monetary": pa.array([], pa.float64()),
                }
            )
        last = t.column("_last").cast(pa.timestamp("us")).cast(pa.int64())
        # anchor may arrive as date or datetime depending on the
        # column's physical type; route through an untyped scalar
        anchor_us = int(
            pa.scalar(anchor)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .as_py()
        )
        rec = pc.divide(
            pc.subtract(pa.scalar(anchor_us, pa.int64()), last),
            pa.scalar(86_400_000_000, pa.int64()),
        )
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "recency_days": rec,
                "frequency": t.column("frequency").cast(pa.int64()),
                "monetary": pa_round_half_away(t.column("_spend"), 2),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def shipping_priority(
    sf_dir: str,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
):
    """TPC-H Q3-style shipping priority: unshipped revenue per order
    for one market segment — customer ⋈ orders ⋈ lineitem with
    opposite-side date predicates, grouped per order, top-k.

    Scale plan: every predicate is pushed to the Parquet scan
    (segment on customer, ``o_orderdate < cutoff`` on orders,
    ``l_shipdate > cutoff`` on lineitem), so only qualifying
    row-groups leave storage.  The segment keyset broadcasts while
    the customer table measures under ``BROADCAST_DIM_ROWS`` and
    swaps to a hash join past it; orders ⋈ lineitem is always the
    distributed hash join.  Top-k is a per-batch prune (each block
    emits ≤ k rows) followed by a bounded global sort — the full
    per-order aggregate never feeds a corpus-scale sort.

    Revenue is rounded to 2 dp BEFORE ranking so the Ray and oracle
    orderings agree on ties at the k boundary."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {
        "l_orderkey": pa.int64(), "revenue": pa.float64(),
        "o_orderdate": pa.timestamp("us"),
        "o_orderpriority": pa.string(),
    }
    if any(
        parquet_rows(f"{sf_dir}/{t}.parquet") == 0
        for t in ("customer", "orders", "lineitem")
    ):
        return empty_dataset(out_schema)

    cut = _dt.datetime.fromisoformat(cutoff)
    num_partitions = _adaptive_join_partitions(
        f"{sf_dir}/orders.parquet", f"{sf_dir}/lineitem.parquet"
    )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
        filter=pads.field("o_orderdate") < cut,
    )

    cust_path = f"{sf_dir}/customer.parquet"
    if pq.read_metadata(cust_path).num_rows <= BROADCAST_DIM_ROWS:
        seg = pq.read_table(
            cust_path, columns=["c_custkey", "c_mktsegment"],
            filters=pads.field("c_mktsegment") == segment,
        )
        keys_ref = ray.put(set(seg.column("c_custkey").to_pylist()))

        def in_segment(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            mask = pa.array(
                [c in keys for c in t.column("o_custkey").to_pylist()]
            )
            return t.filter(mask).drop_columns(["o_custkey"])

        orders = orders.map_batches(in_segment, batch_format="pyarrow")
    else:
        customer = read_parquet_clean(
            cust_path, columns=["c_custkey"],
            filter=pads.field("c_mktsegment") == segment,
        )
        orders = orders.join(
            customer,
            join_type="inner",
            num_partitions=num_partitions,
            on=("o_custkey",),
            right_on=("c_custkey",),
        ).select_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=pads.field("l_shipdate") > cut,
    )

    def derive(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return pa.table({"l_orderkey": t.column("l_orderkey"), "rev": rev})

    per_order = (
        lineitem.map_batches(derive, batch_format="pyarrow")
        .join(
            orders,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
        .aggregate(Sum("rev", alias_name="revenue"))
    )

    def prune(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "l_orderkey" not in t.column_names:
            return pa.schema(list(out_schema.items())).empty_table()
        t = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "revenue": pa_round_half_away(t.column("revenue"), 2),
                "o_orderdate": t.column("o_orderdate").cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[("revenue", "descending"),
                       ("o_orderdate", "ascending"),
                       ("l_orderkey", "ascending")],
        )
        return t.take(idx[:k])

    return (
        per_order.map_batches(prune, batch_format="pyarrow")
        .sort(
            ["revenue", "o_orderdate", "l_orderkey"],
            descending=[True, False, False],
        )
        .limit(k)
    )


def promo_revenue_share(sf_dir: str, *, promo_type: str = "ECONOMY"):
    """TPC-H Q14-style promotion effect: per ship month, the share of
    discounted revenue coming from one part type.

    Scale plan: part is the dimension side — a broadcast
    partkey→is-promo bitmap dict while it measures under
    ``BROADCAST_DIM_ROWS``, a distributed hash join past it (same
    measured policy as ``revenue_by_nation``).  The fact stream is
    one pruned pass; the exchange carries (month, two partial sums),
    i.e. calendar-bounded rows."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {
        "month": pa.timestamp("us"), "promo_share": pa.float64(),
        "revenue": pa.float64(),
    }
    if (parquet_rows(f"{sf_dir}/lineitem.parquet") == 0
            or parquet_rows(f"{sf_dir}/part.parquet") == 0):
        return empty_dataset(out_schema)

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    )

    part_path = f"{sf_dir}/part.parquet"
    if pq.read_metadata(part_path).num_rows <= BROADCAST_DIM_ROWS:
        part = pq.read_table(part_path, columns=["p_partkey", "p_type"])
        keys = part.column("p_partkey").to_numpy(zero_copy_only=False)
        flags = (
            part.column("p_type").to_numpy(zero_copy_only=False)
            == promo_type
        ).astype(np.float64)
        order = np.argsort(keys, kind="stable")
        # sorted (partkey, is_promo) arrays: searchsorted lookup, and
        # rows whose partkey is absent from part are DROPPED so both
        # paths share the hash path's inner-join semantics (they used
        # to be kept with promo=0 on this path only)
        promo_ref = ray.put((keys[order], flags[order]))

        def flag(t: pa.Table) -> pa.Table:
            skeys, sflags = ray.get(promo_ref)
            lk = t.column("l_partkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(skeys, lk)
            pos_c = np.minimum(pos, len(skeys) - 1)
            present = skeys[pos_c] == lk
            t = t.filter(pa.array(present))
            return t.append_column(
                "_promo", pa.array(sflags[pos_c[present]])
            )

        flagged = lineitem.map_batches(flag, batch_format="pyarrow")
    else:
        part = read_parquet_clean(
            part_path, columns=["p_partkey", "p_type"]
        )
        num_partitions = _adaptive_join_partitions(
            f"{sf_dir}/lineitem.parquet"
        )
        flagged = lineitem.join(
            part,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_partkey",),
            right_on=("p_partkey",),
        ).map_batches(
            lambda t: t.append_column(
                "_promo",
                pc.cast(
                    pc.equal(t.column("p_type"), pa.scalar(promo_type)),
                    pa.float64(),
                ),
            ),
            batch_format="pyarrow",
        )

    def derive(t: pa.Table) -> pa.Table:
        # price has 2 decimals and discount 2, so revenue is an exact
        # 4-decimal quantity: carry it as int64 1e-4 units and the
        # monthly sums are drift-free regardless of summation order
        # (the plain double sum flipped a half-cent rounding boundary
        # against the oracle at sf0.001)
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        rev_e4 = pc.cast(
            pc.round(pc.multiply(rev, pa.scalar(1e4))), pa.int64()
        )
        return pa.table(
            {
                "month": pc.floor_temporal(
                    t.column("l_shipdate").cast(pa.timestamp("us")),
                    unit="month",
                ),
                "rev_e4": rev_e4,
                "promo_e4": pc.cast(
                    pc.multiply(
                        pc.cast(rev_e4, pa.float64()), t.column("_promo")
                    ),
                    pa.int64(),
                ),
            }
        )

    agg = (
        flagged.map_batches(derive, batch_format="pyarrow")
        .groupby("month")
        .aggregate(
            Sum("promo_e4", alias_name="_promo_e4"),
            Sum("rev_e4", alias_name="_rev_e4"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "month" not in t.column_names:
            return pa.schema(list(out_schema.items())).empty_table()
        total_e4 = t.column("_rev_e4").cast(pa.int64())
        promo_e4 = t.column("_promo_e4").cast(pa.int64())
        # exact half-away-from-zero 2-dp rounding in integer math
        cents = pc.divide(
            pc.add(total_e4, pa.scalar(50, pa.int64())),
            pa.scalar(100, pa.int64()),
        )
        share = pc.multiply(
            pa.scalar(100.0),
            pc.divide(
                pc.cast(promo_e4, pa.float64()),
                pc.cast(total_e4, pa.float64()),
            ),
        )
        return pa.table(
            {
                "month": t.column("month").cast(pa.timestamp("us")),
                "promo_share": pa_round_half_away(share, 6),
                "revenue": pc.divide(
                    pc.cast(cents, pa.float64()), pa.scalar(100.0)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def lineitem_quantity_mad(sf_dir: str):
    """Per-returnflag robust statistics: median and median absolute
    deviation (MAD) of l_quantity — the outlier-resistant spread
    feature.

    Scale shape: l_quantity is small-integer-valued, so the
    (flag, quantity) histogram is value-DOMAIN-bounded; ONE corpus
    pass builds it, and BOTH medians come from that same histogram —
    the deviation histogram |q − median| is derived arithmetically
    from the first, costing zero extra passes.  Quantile
    interpolation matches DuckDB ``median`` (quantile_cont rank
    p·(n−1))."""
    from ray.data.aggregate import Count

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/lineitem.parquet") == 0:
        return empty_dataset({
            "l_returnflag": pa.string(), "med": pa.float64(),
            "mad": pa.float64(), "n_items": pa.int64(),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )
    hist = ds.groupby(["l_returnflag", "l_quantity"]).aggregate(
        Count(alias_name="freq")
    )

    def _median(values: np.ndarray, freqs: np.ndarray) -> float:
        order = np.argsort(values, kind="stable")
        values, freqs = values[order], freqs[order]
        cum = np.cumsum(freqs)
        n = int(cum[-1])
        pos = 0.5 * (n - 1)
        lo_i, frac = int(np.floor(pos)), pos - np.floor(pos)
        lo_v = values[np.searchsorted(cum, lo_i + 1, side="left")]
        hi_v = values[
            np.searchsorted(cum, min(lo_i + 1, n - 1) + 1, side="left")
        ]
        return float(lo_v + (hi_v - lo_v) * frac)

    def stats(g: pa.Table) -> pa.Table:
        v = g.column("l_quantity").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        f = g.column("freq").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        med = _median(v, f)
        mad = _median(np.abs(v - med), f)  # derived histogram: free
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag").slice(0, 1),
                "med": pa.array([round_half_away(med, 6)], pa.float64()),
                "mad": pa.array([round_half_away(mad, 6)], pa.float64()),
                "n_items": pa.array([int(f.sum())], pa.int64()),
            }
        )

    return hist.groupby("l_returnflag").map_groups(
        stats, batch_format="pyarrow"
    )


def revenue_yoy(sf_dir: str, *, num_partitions: int = 1):
    """Year-over-year monthly revenue growth — the reporting join of
    a month against itself twelve months earlier.

    Scale shape: the corpus collapses to one row per month FIRST
    (combining aggregate over exact int64 cents — o_totalprice has 2
    decimals, so monthly sums are drift-free), then the self-join
    runs on an integer year×12+month key over the calendar-bounded
    table.  Only months with a prior-year counterpart emit (inner
    join), matching the SQL.  The join defaults to ONE partition:
    both sides are #months rows regardless of corpus size, and
    Ray's hash-shuffle join breaks on the schema-less empty
    partitions that extra fan-out creates on a bounded input."""
    from ray.data.aggregate import Sum

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/orders.parquet") == 0:
        return empty_dataset({
            "month": pa.timestamp("us"), "revenue": pa.float64(),
            "prev_revenue": pa.float64(), "yoy_growth": pa.float64(),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def derive(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(
            t.column("o_orderdate").cast(pa.timestamp("us")), unit="month"
        )
        cents = pc.cast(
            pc.round(
                pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))
            ),
            pa.int64(),
        )
        ym = pc.add(
            pc.multiply(pc.year(month), pa.scalar(12, pa.int64())),
            pc.subtract(pc.month(month), pa.scalar(1, pa.int64())),
        )
        return pa.table({"month": month, "ym": ym, "cents": cents})

    monthly = (
        orders.map_batches(derive, batch_format="pyarrow")
        .groupby(["month", "ym"])
        .aggregate(Sum("cents", alias_name="cents"))
    )  # calendar-bounded

    # pin the schema: with fewer months than hash partitions the
    # aggregate emits empty schema-less blocks that break the acero
    # join ("no match for key field ym") — shared guard, sources/io.py
    from outbreak_kg_ray.sources.io import pinned_schema

    monthly = pinned_schema(monthly, {
        "month": pa.timestamp("us"), "ym": pa.int64(),
        "cents": pa.int64(),
    })

    def to_prev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ym_next": pc.add(
                    t.column("ym").cast(pa.int64()),
                    pa.scalar(12, pa.int64()),
                ),
                "prev_cents": t.column("cents").cast(pa.int64()),
            }
        )

    prev = monthly.map_batches(to_prev, batch_format="pyarrow")
    joined = monthly.join(
        prev,
        join_type="inner",
        num_partitions=num_partitions,
        on=("ym",),
        right_on=("ym_next",),
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "month" not in t.column_names:
            return pa.schema(
                [("month", pa.timestamp("us")), ("revenue", pa.float64()),
                 ("prev_revenue", pa.float64()),
                 ("yoy_growth", pa.float64())]
            ).empty_table()
        cur = t.column("cents").cast(pa.int64())
        prv = t.column("prev_cents").cast(pa.int64())
        growth = pc.divide(
            pc.cast(pc.subtract(cur, prv), pa.float64()),
            pc.cast(prv, pa.float64()),
        )
        return pa.table(
            {
                "month": t.column("month").cast(pa.timestamp("us")),
                "revenue": pc.divide(
                    pc.cast(cur, pa.float64()), pa.scalar(100.0)
                ),
                "prev_revenue": pc.divide(
                    pc.cast(prv, pa.float64()), pa.scalar(100.0)
                ),
                "yoy_growth": pa.array(
                    [round_half_away(float(x), 6)
                     for x in growth.to_pylist()],
                    pa.float64(),
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def nation_account_reconciliation(sf_dir: str):
    """Per-nation reconciliation of the supplier and customer account
    books — the FULL OUTER join member of the join matrix (inner /
    left / anti / as-of / band are covered elsewhere): nations can
    have customers but no suppliers (and vice versa), and the audit
    must show both absences.

    Scale shape: BOTH sides pre-aggregate to one row per nation
    BEFORE the join (combining groupbys), so the full-outer exchange
    is nation-vocabulary-bounded regardless of corpus size."""
    from ray.data.aggregate import Count, Sum

    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {
        "nationkey": pa.int64(), "n_suppliers": pa.int64(),
        "supp_acctbal": pa.float64(), "n_customers": pa.int64(),
        "cust_acctbal": pa.float64(), "category": pa.string(),
    }
    n_supp = parquet_rows(f"{sf_dir}/supplier.parquet")
    n_cust = parquet_rows(f"{sf_dir}/customer.parquet")
    if n_supp == 0 and n_cust == 0:
        return empty_dataset(out_schema)

    def _one_sided(table: str, key: str, bal: str, n_alias: str,
                   bal_alias: str, category: str):
        # Exactly one input is empty: the full outer join degenerates
        # to the non-empty side's aggregate with the other side's
        # columns zero-filled (the join would otherwise see a
        # schema-less empty side and crash in acero).
        agg = (
            read_parquet_clean(f"{sf_dir}/{table}", columns=[key, bal])
            .groupby(key)
            .aggregate(
                Count(alias_name=n_alias),
                Sum(bal, alias_name=bal_alias),
            )
        )

        def degen(t: pa.Table) -> pa.Table:
            if len(t) == 0 or n_alias not in t.column_names:
                return pa.schema(list(out_schema.items())).empty_table()
            n = len(t)
            own_n = t.column(n_alias).cast(pa.int64())
            own_bal = pa_round_half_away(
                t.column(bal_alias).cast(pa.float64()), 2
            )
            zero_i = pa.array([0] * n, pa.int64())
            zero_f = pa.array([0.0] * n, pa.float64())
            cols = {
                "nationkey": t.column(key).cast(pa.int64()),
                "n_suppliers": own_n if n_alias == "n_suppliers"
                else zero_i,
                "supp_acctbal": own_bal if bal_alias == "supp_acctbal"
                else zero_f,
                "n_customers": own_n if n_alias == "n_customers"
                else zero_i,
                "cust_acctbal": own_bal if bal_alias == "cust_acctbal"
                else zero_f,
                "category": pa.array([category] * n, pa.string()),
            }
            return pa.table(cols)

        return agg.map_batches(degen, batch_format="pyarrow")

    if n_cust == 0:
        return _one_sided(
            "supplier.parquet", "s_nationkey", "s_acctbal",
            "n_suppliers", "supp_acctbal", "supplier_only",
        )
    if n_supp == 0:
        return _one_sided(
            "customer.parquet", "c_nationkey", "c_acctbal",
            "n_customers", "cust_acctbal", "customer_only",
        )

    # With fewer nations than hash partitions the aggregate emits
    # schema-less empty blocks that break the acero join (same trap
    # revenue_yoy documents); pin each side — shared guard,
    # sources/io.py.
    from outbreak_kg_ray.sources.io import pinned_schema

    supp = pinned_schema(
        read_parquet_clean(
            f"{sf_dir}/supplier.parquet",
            columns=["s_nationkey", "s_acctbal"],
        )
        .groupby("s_nationkey")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Sum("s_acctbal", alias_name="supp_acctbal"),
        ),
        {"s_nationkey": pa.int64(), "n_suppliers": pa.int64(),
         "supp_acctbal": pa.float64()},
    )
    cust = pinned_schema(
        read_parquet_clean(
            f"{sf_dir}/customer.parquet",
            columns=["c_nationkey", "c_acctbal"],
        )
        .groupby("c_nationkey")
        .aggregate(
            Count(alias_name="n_customers"),
            Sum("c_acctbal", alias_name="cust_acctbal"),
        ),
        {"c_nationkey": pa.int64(), "n_customers": pa.int64(),
         "cust_acctbal": pa.float64()},
    )
    joined = supp.join(
        cust,
        join_type="full_outer",
        num_partitions=4,
        on=("s_nationkey",),
        right_on=("c_nationkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "n_suppliers" not in t.column_names:
            return pa.schema(list(out_schema.items())).empty_table()
        # Ray's full_outer join coalesces both keys into the LEFT key
        # column; side membership comes from the aggregates' nulls
        ns = t.column("n_suppliers").cast(pa.int64())
        nc = t.column("n_customers").cast(pa.int64())
        has_s = pc.is_valid(ns)
        has_c = pc.is_valid(nc)
        category = pc.if_else(
            pc.and_(has_s, has_c),
            pa.scalar("both", pa.string()),
            pc.if_else(
                has_s,
                pa.scalar("supplier_only", pa.string()),
                pa.scalar("customer_only", pa.string()),
            ),
        )
        zero_i = pa.scalar(0, pa.int64())
        zero_f = pa.scalar(0.0, pa.float64())
        return pa.table(
            {
                "nationkey": t.column("s_nationkey").cast(pa.int64()),
                "n_suppliers": pc.coalesce(ns, zero_i),
                "supp_acctbal": pa_round_half_away(
                    pc.coalesce(
                        t.column("supp_acctbal").cast(pa.float64()),
                        zero_f,
                    ),
                    2,
                ),
                "n_customers": pc.coalesce(nc, zero_i),
                "cust_acctbal": pa_round_half_away(
                    pc.coalesce(
                        t.column("cust_acctbal").cast(pa.float64()),
                        zero_f,
                    ),
                    2,
                ),
                "category": category,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def user_type_entropy(sf_dir: str):
    """Per-user Shannon entropy over the event-type distribution —
    the behavioral-diversity feature (0 for single-action bots, high
    for diverse users).

    Scale shape: the raw stream collapses to (user, type, count)
    in ONE combining aggregate (bounded by users × types), then a
    user-keyed ``map_groups`` folds entropy over each user's ≤|types|
    rows — the per-group input is the collapsed counts, never the
    event stream."""
    from ray.data.aggregate import Count

    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset({
            "user_id": pa.int64(), "n_events": pa.int64(),
            "type_entropy": pa.float64(),
        })

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    counts = events.groupby(["user_id", "event_type"]).aggregate(
        Count(alias_name="c")
    )

    def entropy(g: pa.Table) -> pa.Table:
        from outbreak_kg_ray.functions.rounding import round_half_away

        et = g.column("event_type").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False).astype(
            np.float64
        )[np.argsort(et, kind="stable")]  # deterministic fold order
        n = c.sum()
        p = c / n
        h = round_half_away(float(-(p * np.log(p)).sum()), 6)
        return pa.table(
            {
                "user_id": g.column("user_id").slice(0, 1),
                "n_events": pa.array([int(n)], pa.int64()),
                "type_entropy": pa.array([h], pa.float64()),
            }
        )

    return counts.groupby("user_id").map_groups(
        entropy, batch_format="pyarrow"
    )


def part_supplier_coverage(sf_dir: str):
    """Parts ranked by supplier diversity: distinct suppliers seen in
    lineitem per part — the two-level distinct aggregate (collapse to
    (part, supplier) pairs first, so the exchange carries pairs, not
    the lineitem stream)."""
    from ray.data.aggregate import Count

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    pairs = (
        li.groupby(["l_partkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    return (
        pairs.groupby("l_partkey")
        .aggregate(Count(alias_name="n_suppliers"))
        .map_batches(
            lambda t: pa.table(
                {
                    "l_partkey": t.column("l_partkey"),
                    "n_suppliers": t.column("n_suppliers").cast(pa.int64()),
                }
            )
            if len(t) and "l_partkey" in t.column_names
            else pa.table(
                {
                    "l_partkey": pa.array([], pa.int64()),
                    "n_suppliers": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def events_value_percent_rank(sf_dir: str):
    """SQL ``PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY
    value)`` — distinct (event_type, value) resolution.  The window
    function done WITHOUT a per-row window: values have cent
    granularity, so the (type, value) histogram is value-bounded; the
    percent rank of every row with value v is ``rows_below(v) /
    (n-1)``, read off the per-type cumulative counts.  The event
    stream itself never re-shuffles — only the histogram does.
    """
    from ray.data.aggregate import Count

    from outbreak_kg_ray.functions.rounding import np_round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {
        "event_type": pa.string(), "value": pa.float64(),
        "pr": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(out_schema)

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    hist = ev.groupby(["event_type", "value"]).aggregate(
        Count(alias_name="freq")
    )

    def pr(g: pa.Table) -> pa.Table:
        vals = g.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        freqs = g.column("freq").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(vals, kind="stable")
        vals = vals[order]
        freqs = freqs[order]
        cum = np.cumsum(freqs)
        n = int(cum[-1])
        below = cum - freqs
        ranks = (
            below / (n - 1) if n > 1
            else np.zeros(len(vals), dtype=np.float64)
        )
        return pa.table(
            {
                "event_type": pa.array(
                    [g.column("event_type")[0].as_py()] * len(vals),
                    pa.string(),
                ),
                "value": pa.array(vals, pa.float64()),
                "pr": pa.array(
                    np_round_half_away(ranks, 6), pa.float64()
                ),
            }
        )

    return hist.groupby("event_type").map_groups(
        pr, batch_format="pyarrow"
    )


_FK_RELATIONS = (
    # (name, child table, fk col, parent table, pk col)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
)


def fk_integrity_audit(sf_dir: str):
    """Referential-integrity audit across the whole schema: one row
    per FK relation with the child row count and the number of
    ORPHAN rows (fk value absent from the parent) — the data-quality
    gate every ingest runs before trusting a new drop.

    Scale shape: ZERO shuffles. Each child table is read ONCE (all
    its FK columns in one pass — lineitem carries three relations in
    a single scan); every task tests membership directly against
    the broadcast sorted parent key columns (one ray.put holding
    every dimension's keys) and emits per-relation orphan COUNTS, so
    the only exchange is the tiny partial-count collect. A fact→fact
    relation would swap in the hash anti-join used by
    customers_without_orders; every parent here is a dimension.

    Execution shape: ONE streaming executor over a row-group MANIFEST
    (child path, row-group id, fk cols) — each task reads its own
    row group inside ``map_batches``. The previous shape (one Dataset
    per child table, drained by concurrent driver threads because
    2.49's union serializes branches) paid ~5 executor startups for
    sub-second work: 4.1 s → 0.9 s warm at sf0.1. The manifest is
    also the restart unit a 100-TB audit would checkpoint on."""
    import pyarrow.parquet as pq_
    import ray

    by_child: dict[str, list[tuple[str, str, str, str]]] = {}
    for name, child, fk, parent, pk in _FK_RELATIONS:
        by_child.setdefault(child, []).append((name, fk, parent, pk))

    parent_keys = {}
    for name, child, fk, parent, pk in _FK_RELATIONS:
        parent_keys[name] = np.sort(
            pq_.read_table(f"{sf_dir}/{parent}.parquet", columns=[pk])
            .column(pk)
            .to_numpy(zero_copy_only=False)
        )
    keys_ref = ray.put(parent_keys)

    import json

    names, n_rows_l = [], []
    manifest_rows: list[dict] = []
    for child, rels in by_child.items():
        child_path = f"{sf_dir}/{child}.parquet"
        md = pq_.read_metadata(child_path)
        for name, _fk, _parent, _pk in rels:
            names.append(name)
            n_rows_l.append(md.num_rows)
        if md.num_rows == 0:
            continue
        spec = json.dumps([(n, fk) for n, fk, _p, _k in rels])
        for rg in range(md.num_row_groups):
            manifest_rows.append(
                {"path": child_path, "rg": rg, "spec": spec}
            )

    def orphan_partials(t: pa.Table) -> pa.Table:
        pk_map = ray.get(keys_ref)
        out_r, out_o = [], []
        for path, rg, spec in zip(
            t.column("path").to_pylist(),
            t.column("rg").to_pylist(),
            t.column("spec").to_pylist(),
        ):
            rels = json.loads(spec)
            chunk = pq_.ParquetFile(path).read_row_group(
                rg, columns=[fk for _n, fk in rels]
            )
            for rel, col in rels:
                keys = pk_map[rel]
                vals = chunk.column(col).to_numpy(zero_copy_only=False)
                if len(keys):
                    pos = np.minimum(
                        np.searchsorted(keys, vals), len(keys) - 1
                    )
                    n_orphan = int((keys[pos] != vals).sum())
                else:
                    n_orphan = len(vals)
                out_r.append(rel)
                out_o.append(n_orphan)
        return pa.table(
            {
                "rel": pa.array(out_r, pa.string()),
                "orphans": pa.array(out_o, pa.int64()),
            }
        )

    import ray.data as rd

    n_orphans = {name: 0 for name in names}
    if manifest_rows:
        partials = rd.from_items(
            manifest_rows, override_num_blocks=len(manifest_rows)
        ).map_batches(orphan_partials, batch_format="pyarrow")
        for r in partials.take_all():
            n_orphans[r["rel"]] += int(r["orphans"] or 0)

    order = np.argsort(np.array(names, dtype=object), kind="stable")
    return rd.from_arrow(
        pa.table(
            {
                "relation": pa.array(
                    [names[i] for i in order], pa.string()
                ),
                "n_rows": pa.array(
                    [n_rows_l[i] for i in order], pa.int64()
                ),
                "n_orphans": pa.array(
                    [n_orphans[names[i]] for i in order], pa.int64()
                ),
            }
        )
    )



def rolling_active_users(sf_dir: str, *, window_hours: int = 3):
    """Distinct active users per trailing ``window_hours``-hour
    window, one row per event hour — the windowed COUNT(DISTINCT)
    that plain rolling sums cannot express (distinct does not
    decompose over window slides).

    Scale shape: the event stream collapses to DISTINCT (hour, user)
    pairs first (combining groupby bounded by hours × active users);
    each pair then fans out to the ≤ ``window_hours`` window-ends it
    contributes to (a streaming flat map), and a second pair-collapse
    + count yields the per-window distinct — two bounded exchanges,
    no per-window set materialization. Window-ends are filtered to
    hours actually present (calendar-bounded broadcast)."""
    import ray
    from ray.data.aggregate import Count

    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {"hour": pa.timestamp("us"), "active_users": pa.int64()}
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(out_schema)

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def to_pairs(t: pa.Table) -> pa.Table:
        # batch-local DISTINCT combiner: events arrive roughly
        # time-ordered, so a batch spans few hours and dedup inside
        # the batch cuts the (hour, user) exchange ~10x before the
        # global collapse
        h = pc.floor_temporal(
            t.column("ts").cast(pa.timestamp("us")), unit="hour"
        ).to_numpy(zero_copy_only=False).astype("datetime64[us]")
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        pairs = np.stack(
            [h.astype(np.int64), uid.astype(np.int64)], axis=1
        )
        uniq = np.unique(pairs, axis=0)
        return pa.table(
            {
                "h": pa.array(
                    uniq[:, 0].astype("datetime64[us]")
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    # (round 4) both distinct collapses run through keyed_partitions:
    # group cardinality here is ~hours x users (≈ row count after the
    # batch combiner), exactly where Ray's per-group aggregate pays
    # Python work per group; a hash-partition + C++ group_by keeps
    # the exchange int-keyed and the per-key work vectorized.
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    def part_distinct(t: pa.Table) -> pa.Table:
        return (
            t.select(["h", "user_id"])
            .group_by(["h", "user_id"])
            .aggregate([([], "count_all")])
            .drop_columns(["count_all"])
        )

    pairs = keyed_partitions(
        ev.map_batches(to_pairs, batch_format="pyarrow"),
        ["h", "user_id"],
        part_distinct,
        schema=pa.schema(
            [("h", pa.timestamp("us")), ("user_id", pa.int64())]
        ),
    ).materialize()  # two consumers: hour catalog + window fanout

    # calendar-bounded hour catalog (one timestamp per active hour)
    hour_rows = (
        pairs.groupby("h").aggregate(Count(alias_name="_n")).take_all()
    )
    hours = np.sort(
        np.array([r["h"] for r in hour_rows], dtype="datetime64[us]")
    )
    hours_ref = ray.put(hours.astype(np.int64))

    def fan_out(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "h" not in t.column_names:
            return pa.table(
                {"w": pa.array([], pa.timestamp("us")),
                 "user_id": pa.array([], pa.int64())}
            )
        valid = ray.get(hours_ref)
        h = t.column("h").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        hour_us = np.int64(3600 * 1_000_000)
        ws, us_ = [], []
        for k in range(window_hours):
            w = h + k * hour_us
            pos = np.searchsorted(valid, w)
            pos_c = np.minimum(pos, len(valid) - 1)
            present = valid[pos_c] == w
            ws.append(w[present])
            us_.append(uid[present])
        return pa.table(
            {
                "w": pa.array(
                    np.concatenate(ws).astype("datetime64[us]")
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(np.concatenate(us_)),
            }
        )

    # Partitioning by w alone co-locates every window's rows, so ONE
    # exchange yields the final per-window distinct count (the
    # (w,user) distinct + per-w count both happen inside the
    # partition) — the previous plan paid two aggregate shuffles.
    def part_window_counts(t: pa.Table) -> pa.Table:
        d = (
            t.select(["w", "user_id"])
            .group_by(["w", "user_id"])
            .aggregate([([], "count_all")])
        )
        g = d.group_by("w").aggregate([("user_id", "count")])
        return pa.table(
            {
                "hour": g.column("w").cast(pa.timestamp("us")),
                "active_users": pc.cast(
                    g.column("user_id_count"), pa.int64()
                ),
            }
        )

    return keyed_partitions(
        pairs.map_batches(fan_out, batch_format="pyarrow"),
        ["w"],
        part_window_counts,
        schema=pa.schema(list(out_schema.items())),
    )


def latest_event_per_user(sf_dir: str):
    """Change-log compaction: the LAST event per user by (ts,
    event_id) — the last-writer-wins upsert materialization every
    CDC/state pipeline runs.

    Shape: ONE hash shuffle by user, then an argmax per group (no
    sort of the whole history — a single vectorized lexsort pick)."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {
        "user_id": pa.int64(), "event_id": pa.int64(),
        "ts": pa.timestamp("us"), "event_type": pa.string(),
        "value": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(out_schema)

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def last(g: pa.Table) -> pa.Table:
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        best = int(np.lexsort((eid, ts))[-1])
        take = pa.array([best], pa.int64())
        return pa.table(
            {
                "user_id": g.column("user_id").take(take).cast(
                    pa.int64()
                ),
                "event_id": g.column("event_id").take(take).cast(
                    pa.int64()
                ),
                "ts": g.column("ts").take(take).cast(
                    pa.timestamp("us")
                ),
                "event_type": g.column("event_type").take(take),
                "value": g.column("value").take(take).cast(
                    pa.float64()
                ),
            }
        )

    return ev.groupby("user_id").map_groups(
        last, batch_format="pyarrow"
    )


def zscore_features(sf_dir: str):
    """Per-type z-score normalization of events.value — the two-pass
    feature-scaling stage of an ML data pipeline: pass 1 computes
    per-type (n, Σx, Σx²) via a combining aggregate (type-vocabulary
    bounded), pass 2 streams the transform with the tiny moment
    table broadcast. The event stream itself never shuffles.

    σ uses the population formula (√(E[x²] − E[x]²)), matching the
    oracle's ``stddev_pop``."""
    import ray
    from ray.data.aggregate import Count, Sum

    from outbreak_kg_ray.functions.rounding import np_round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {
        "event_id": pa.int64(), "event_type": pa.string(),
        "value": pa.float64(), "zscore": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(out_schema)

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def moments(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(et, return_inverse=True)
        s1 = np.zeros(len(uniq))
        s2 = np.zeros(len(uniq))
        n = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s1, inv, v)
        np.add.at(s2, inv, v * v)
        np.add.at(n, inv, 1)
        return pa.table(
            {
                "event_type": pa.array(uniq.tolist(), pa.string()),
                "n": pa.array(n, pa.int64()),
                "s1": pa.array(s1, pa.float64()),
                "s2": pa.array(s2, pa.float64()),
            }
        )

    rows = (
        ev.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
        )
        .take_all()
    )  # type-vocabulary bounded
    stats = {}
    for r in rows:
        mu = r["s1"] / r["n"]
        var = max(r["s2"] / r["n"] - mu * mu, 0.0)
        stats[r["event_type"]] = (mu, float(np.sqrt(var)))
    stats_ref = ray.put(stats)

    def transform(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        mu = np.array([st[x][0] for x in et])
        sd = np.array([st[x][1] for x in et])
        z = np.where(sd > 0, (v - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        return pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "event_type": t.column("event_type"),
                "value": pa.array(v, pa.float64()),
                "zscore": pa.array(
                    np_round_half_away(z, 6), pa.float64()
                ),
            }
        )

    return ev.map_batches(transform, batch_format="pyarrow")


def events_value_trend(sf_dir: str):
    """Per-type OLS trend of events.value over time — grouped linear
    regression ``slope = cov(t, v) / var(t)`` computed ENTIRELY from
    algebraic moment partials (n, Σt, Σv, Σtv, Σt²): one combining
    aggregate bounded by the type vocabulary, zero event shuffle.
    Time is epoch seconds; slope is value-units per second, matching
    the oracle's ``regr_slope``."""
    from ray.data.aggregate import Sum

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {
        "event_type": pa.string(), "n": pa.int64(),
        "slope_e6": pa.float64(), "intercept": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(out_schema)

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def moments(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        # centered at 2024-01-01 (fixed constant, mirrored in the
        # oracle): keeps the t moments ~1e6 instead of ~1.7e9, so the
        # cov/var cancellation stays far from float53 precision
        secs = (
            t.column("ts").to_numpy(zero_copy_only=False).astype(
                "datetime64[us]"
            ).astype(np.int64) / 1e6
            - 1704067200.0
        )
        v = t.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        uniq, inv = np.unique(et, return_inverse=True)
        out = {
            "event_type": pa.array(uniq.tolist(), pa.string()),
        }
        n = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n, inv, 1)
        out["n"] = pa.array(n, pa.int64())
        for name, arr in (
            ("st", secs), ("sv", v), ("stv", secs * v),
            ("stt", secs * secs),
        ):
            acc = np.zeros(len(uniq))
            np.add.at(acc, inv, arr)
            out[name] = pa.array(acc, pa.float64())
        return pa.table(out)

    rows = (
        ev.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"), Sum("st", alias_name="st"),
            Sum("sv", alias_name="sv"), Sum("stv", alias_name="stv"),
            Sum("stt", alias_name="stt"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "event_type" not in t.column_names:
            return pa.schema(list(out_schema.items())).empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        st = t.column("st").to_numpy(zero_copy_only=False)
        sv = t.column("sv").to_numpy(zero_copy_only=False)
        stv = t.column("stv").to_numpy(zero_copy_only=False)
        stt = t.column("stt").to_numpy(zero_copy_only=False)
        cov = stv / n - (st / n) * (sv / n)
        var = stt / n - (st / n) ** 2
        slope = np.where(var > 0, cov / np.where(var > 0, var, 1.0), 0.0)
        intercept = sv / n - slope * (st / n)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "slope_e6": pa.array(
                    [round_half_away(x, 6) for x in slope * 1e6],
                    pa.float64(),
                ),
                "intercept": pa.array(
                    [round_half_away(x, 2) for x in intercept],
                    pa.float64(),
                ),
            }
        )

    return rows.map_batches(finish, batch_format="pyarrow")


def audience_overlap(sf_dir: str):
    """Jaccard overlap of the USER AUDIENCES of every event-type pair
    — "how much do the people who click overlap the people who
    purchase", the segment-overlap audit.

    Scale shape: the event stream collapses to DISTINCT (user, type)
    pairs (combining groupby); each user's type set then emits its
    within-user type pairs (a per-group combinator bounded by
    |types|² per user); pair counts + per-type audience sizes are
    |types|-bounded; the Jaccard is |A∩B| / (|A| + |B| − |A∩B|).
    The user catalog never reaches the driver."""
    from itertools import combinations

    import ray
    from ray.data.aggregate import Count, Sum

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {
        "type_a": pa.string(), "type_b": pa.string(),
        "n_both": pa.int64(), "jaccard": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(out_schema)

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    pairs = (
        ev.groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()  # two consumers: audience sizes + type pairs
    )
    # per-type audience sizes: |types|-bounded broadcast
    aud_rows = (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    aud = {r["event_type"]: int(r["n"]) for r in aud_rows}
    aud_ref = ray.put(aud)

    def user_type_pairs(g: pa.Table) -> pa.Table:
        ts = sorted(set(g.column("event_type").to_pylist()))
        if len(ts) < 2:
            return pa.schema(
                [("type_a", pa.string()), ("type_b", pa.string()),
                 ("c", pa.int64())]
            ).empty_table()
        a, b = zip(*combinations(ts, 2))
        return pa.table(
            {
                "type_a": pa.array(list(a), pa.string()),
                "type_b": pa.array(list(b), pa.string()),
                "c": pa.array([1] * len(a), pa.int64()),
            }
        )

    counted = (
        pairs.groupby("user_id")
        .map_groups(user_type_pairs, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("c", alias_name="n_both"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "type_a" not in t.column_names:
            return pa.schema(list(out_schema.items())).empty_table()
        am = ray.get(aud_ref)
        ta = t.column("type_a").to_pylist()
        tb = t.column("type_b").to_pylist()
        nb = t.column("n_both").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        union = np.array(
            [am[x] + am[y] for x, y in zip(ta, tb)], dtype=np.int64
        ) - nb
        return pa.table(
            {
                "type_a": t.column("type_a"),
                "type_b": t.column("type_b"),
                "n_both": pa.array(nb, pa.int64()),
                "jaccard": pa.array(
                    [
                        round_half_away(x / u if u else 0.0, 6)
                        for x, u in zip(nb, union)
                    ],
                    pa.float64(),
                ),
            }
        )

    return counted.map_batches(finish, batch_format="pyarrow").sort(
        ["type_a", "type_b"]
    )


def ship_lag_quantiles(sf_dir: str):
    """Fulfillment-latency percentiles: days between order date and
    each lineitem's ship date, p50/p90/p99 per order priority — the
    operations dashboard metric.

    Scale shape: ONE lineitem↔orders hash join (adaptive partition
    count), then the lag collapses to a (priority, lag_days)
    HISTOGRAM — lag is calendar-bounded, so exact linear-interpolated
    quantiles come from cumulative counts, the same shape as
    events_type_value_quantiles; no per-row sort anywhere."""
    from ray.data.aggregate import Count

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {
        "o_orderpriority": pa.string(), "q50": pa.float64(),
        "q90": pa.float64(), "q99": pa.float64(),
    }
    if (parquet_rows(f"{sf_dir}/lineitem.parquet") == 0
            or parquet_rows(f"{sf_dir}/orders.parquet") == 0):
        return empty_dataset(out_schema)

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    nparts = _adaptive_join_partitions(f"{sf_dir}/lineitem.parquet")
    joined = li.join(
        orders, "inner", nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def lag_hist(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "l_shipdate" not in t.column_names:
            return pa.table(
                {"o_orderpriority": pa.array([], pa.string()),
                 "lag": pa.array([], pa.int64()),
                 "freq": pa.array([], pa.int64())}
            )
        ship = t.column("l_shipdate").to_numpy(
            zero_copy_only=False
        ).astype("datetime64[D]").astype(np.int64)
        od = t.column("o_orderdate").to_numpy(
            zero_copy_only=False
        ).astype("datetime64[D]").astype(np.int64)
        lag = ship - od
        pr = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        key = np.char.add(
            np.char.add(pr.astype(str), "\x1f"), lag.astype(str)
        )
        uniq, cnt = np.unique(key, return_counts=True)
        split = np.char.partition(uniq, "\x1f")
        return pa.table(
            {
                "o_orderpriority": pa.array(split[:, 0], pa.string()),
                "lag": pa.array(
                    split[:, 2].astype(np.int64), pa.int64()
                ),
                "freq": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    hist = (
        joined.map_batches(lag_hist, batch_format="pyarrow")
        .groupby(["o_orderpriority", "lag"])
        .aggregate(Sum("freq", alias_name="freq"))
    )

    def quantiles(g: pa.Table) -> pa.Table:
        lag = g.column("lag").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        freq = g.column("freq").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(lag, kind="stable")
        values = lag[order]
        cum = np.cumsum(freq[order])
        n = int(cum[-1])

        def q(p: float) -> float:
            pos = p * (n - 1)
            lo_i, frac = int(np.floor(pos)), pos - np.floor(pos)
            lo_v = values[np.searchsorted(cum, lo_i + 1, side="left")]
            hi_v = values[
                np.searchsorted(cum, min(lo_i + 1, n - 1) + 1,
                                side="left")
            ]
            return round_half_away(lo_v + (hi_v - lo_v) * frac, 6)

        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority").slice(
                    0, 1
                ),
                "q50": pa.array([q(0.5)], pa.float64()),
                "q90": pa.array([q(0.9)], pa.float64()),
                "q99": pa.array([q(0.99)], pa.float64()),
            }
        )

    return hist.groupby("o_orderpriority").map_groups(
        quantiles, batch_format="pyarrow"
    )


def events_seasonality(sf_dir: str):
    """Weekly seasonality profile: event counts and mean value per
    (day-of-week, hour-of-day) cell — the 7×24 heatmap behind
    traffic shaping and anomaly baselines.

    Pure streaming: calendar keys derive per batch with Arrow
    temporal kernels; ONE grouped aggregate bounded by 168 cells."""
    from ray.data.aggregate import Count, Sum

    from outbreak_kg_ray.functions.rounding import pa_round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    out_schema = {
        "dow": pa.int64(), "hour": pa.int64(),
        "n_events": pa.int64(), "mean_value": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(out_schema)

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def keys(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.timestamp("us"))
        return pa.table(
            {
                # ISO day of week (1=Monday..7=Sunday), matching
                # DuckDB isodow
                "dow": pc.day_of_week(
                    ts, count_from_zero=False, week_start=1
                ).cast(pa.int64()),
                "hour": pc.hour(ts).cast(pa.int64()),
                "value": t.column("value"),
            }
        )

    agg = (
        ev.map_batches(keys, batch_format="pyarrow")
        .groupby(["dow", "hour"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="_sv"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "dow" not in t.column_names:
            return pa.schema(list(out_schema.items())).empty_table()
        n = t.column("n_events").cast(pa.int64())
        mean = pc.divide(
            t.column("_sv").cast(pa.float64()), pc.cast(n, pa.float64())
        )
        return pa.table(
            {
                "dow": t.column("dow").cast(pa.int64()),
                "hour": t.column("hour").cast(pa.int64()),
                "n_events": n,
                "mean_value": pa_round_half_away(mean, 6),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_pareto_deciles(sf_dir: str):
    """Revenue concentration across customers (Pareto audit): rank
    customers by total order revenue ascending, split into ntile(10)
    population deciles, report each decile's share of total revenue —
    "the top decile books X% of revenue".

    Scale shape: orders collapse to one row per customer (combining
    groupby over exact int64 cents); the decile assignment uses the
    documented sort-path machinery (ONE global range sort +
    metadata-only zip_with_index rank — the driver touches per-block
    counts, never rows) and the final share table is 10 rows."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    from ..stages.shuffle import zip_with_index

    out_schema = {
        "decile": pa.int64(), "n_customers": pa.int64(),
        "revenue_share": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/orders.parquet") == 0:
        return empty_dataset(out_schema)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            t.column("o_totalprice"), pa.scalar(100.0)
                        )
                    ),
                    pa.int64(),
                ),
            }
        )

    per_cust = (
        orders.map_batches(cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="cents"))
    )

    def pin(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "o_custkey" not in t.column_names:
            return pa.schema(
                [("o_custkey", pa.int64()), ("cents", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "o_custkey": t.column("o_custkey").cast(pa.int64()),
                "cents": t.column("cents").cast(pa.int64()),
            }
        )

    ranked = zip_with_index(
        per_cust.map_batches(pin, batch_format="pyarrow").sort(
            ["cents", "o_custkey"]
        ),
        rank_col="_rank",
    ).materialize()
    n = ranked.count()
    total_cents = float(ranked.sum("cents") or 0)
    size, rem = divmod(n, 10)
    # ntile: first `rem` deciles take size+1 rows
    split = rem * (size + 1)

    def decile_partials(t: pa.Table) -> pa.Table:
        r = t.column("_rank").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        lo = r // max(size + 1, 1) + 1
        hi = (r - split) // max(size, 1) + rem + 1
        dec = np.where(r < split, lo, hi).astype(np.int64)
        uniq, inv = np.unique(dec, return_inverse=True)
        nc = np.zeros(len(uniq), dtype=np.int64)
        sc = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(nc, inv, 1)
        np.add.at(sc, inv, c)
        return pa.table(
            {
                "decile": pa.array(uniq, pa.int64()),
                "n_customers": pa.array(nc, pa.int64()),
                "cents": pa.array(sc, pa.int64()),
            }
        )

    agg = (
        ranked.map_batches(decile_partials, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("cents", alias_name="cents"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "decile" not in t.column_names:
            return pa.schema(list(out_schema.items())).empty_table()
        c = t.column("cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "decile": t.column("decile").cast(pa.int64()),
                "n_customers": t.column("n_customers").cast(pa.int64()),
                "revenue_share": pa.array(
                    [
                        round_half_away(
                            x / total_cents if total_cents else 0.0, 6
                        )
                        for x in c
                    ],
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def join_skew_report(sf_dir: str, *, k: int = 10):
    """Hot-key diagnostics for the three high-fan-out join columns
    (``orders.o_custkey``, ``lineitem.l_orderkey``,
    ``events.user_id``): the top-``k`` keys per column with row count
    and share of table — the report that decides where salting /
    broadcast thresholds are needed BEFORE a shuffle melts on a hub
    key (north_rule: skew handled explicitly).

    Scale shape, per column: per-batch ``np.unique`` partial counts →
    one key-bounded grouped sum → the distributed top-k cut
    (sort + limit — the driver holds ≤ k rows per column); table
    totals come from Parquet metadata, no second scan. The three
    bounded reports concatenate driver-side (≤ 3k rows)."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away
    from ..sources.io import parquet_rows, read_parquet_clean
    from .docops import _topv_rows

    specs = [
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        ("events.user_id", "events", "user_id"),
    ]
    tbls, keys, ns, shares = [], [], [], []
    for label, table, col in specs:
        path = f"{sf_dir}/{table}.parquet"
        total = parquet_rows(path)
        if total == 0:
            continue
        ds = read_parquet_clean(path, columns=[col])

        def partials(t: pa.Table, _col=col) -> pa.Table:
            v = t.column(_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            uniq, cnt = np.unique(v, return_counts=True)
            return pa.table(
                {
                    "key": pa.array(uniq, pa.int64()),
                    "c": pa.array(cnt, pa.int64()),
                }
            )

        counts = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby("key")
            .aggregate(Sum("c", alias_name="c"))
        )
        # _topv_rows cuts by (count DESC, key ASC) — but the oracle
        # ranks string keys; int order == string order only for
        # equal-width keys, so cut on the STRING form for parity
        str_counts = counts.map_batches(
            lambda t: pa.table(
                {
                    "key": pc.cast(t.column("key"), pa.string()),
                    "c": t.column("c"),
                }
            ),
            batch_format="pyarrow",
        )
        for r in _topv_rows(str_counts, "key", "c", k):
            tbls.append(label)
            keys.append(r["key"])
            n = int(r["c"])
            ns.append(n)
            shares.append(round_half_away(n / total, 6))
    return pa.table(
        {
            "join_col": pa.array(tbls, pa.string()),
            "key": pa.array(keys, pa.string()),
            "n_rows": pa.array(ns, pa.int64()),
            "share": pa.array(shares, pa.float64()),
        }
    )


def daily_value_drift(sf_dir: str):
    """Per-type daily median of events.value plus the day-over-day
    absolute drift — the drift monitor a data-quality pipeline runs
    before accepting a new day's partition.

    Scale shape: ONE corpus pass builds the (type × day × value)
    histogram (value domain is cent-granular and the day axis is
    calendar-bounded, so the histogram never scales with event
    count); the exact median interpolates per (type, day) inside a
    map_groups over that bounded histogram; the final lag fold runs
    driver-side over ≤ |types| × |days| rows.  Matches DuckDB
    ``quantile_cont`` (rank p·(n−1)); drift compares the 6-dp-rounded
    medians (both sides round before differencing)."""
    from ray.data.aggregate import Count

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset

    import pyarrow.parquet as pq_

    out_schema = {
        "event_type": pa.string(),
        "day": pa.timestamp("us"),
        "q50": pa.float64(),
        "drift": pa.float64(),
    }
    if pq_.read_metadata(f"{sf_dir}/events.parquet").num_rows == 0:
        return empty_dataset(out_schema)

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def day_col(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": pc.floor_temporal(t.column("ts"), unit="day"),
                "value": t.column("value"),
            }
        )

    hist = (
        ds.map_batches(day_col, batch_format="pyarrow")
        .groupby(["event_type", "day", "value"])
        .aggregate(Count(alias_name="freq"))
    )

    def median(g: pa.Table) -> pa.Table:
        values = g.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        freqs = g.column("freq").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(values, kind="stable")
        values = values[order]
        cum = np.cumsum(freqs[order])
        n = int(cum[-1])
        pos = 0.5 * (n - 1)
        lo_i, frac = int(np.floor(pos)), pos - np.floor(pos)
        lo_v = values[np.searchsorted(cum, lo_i + 1, side="left")]
        hi_v = values[
            np.searchsorted(cum, min(lo_i + 1, n - 1) + 1, side="left")
        ]
        return pa.table(
            {
                "event_type": g.column("event_type").slice(0, 1),
                "day": g.column("day").slice(0, 1),
                "q50": pa.array(
                    [round_half_away(lo_v + (hi_v - lo_v) * frac, 6)],
                    pa.float64(),
                ),
            }
        )

    daily = (
        hist.groupby(["event_type", "day"])
        .map_groups(median, batch_format="pyarrow")
        .take_all()
    )  # ≤ |types| × |days| rows
    daily.sort(key=lambda r: (r["event_type"], r["day"]))
    types, days, q50s, drifts = [], [], [], []
    prev_type, prev_q = None, None
    for r in daily:
        q = float(r["q50"])
        types.append(r["event_type"])
        days.append(r["day"])
        q50s.append(q)
        if r["event_type"] == prev_type:
            drifts.append(round_half_away(abs(q - prev_q), 6))
        else:
            drifts.append(None)
        prev_type, prev_q = r["event_type"], q
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "day": pa.array(days, pa.timestamp("us")),
                "q50": pa.array(q50s, pa.float64()),
                "drift": pa.array(drifts, pa.float64()),
            }
        )
    )


def user_type_scd2(sf_dir: str):
    """SCD-Type-2 dimension build from the event change log: collapse
    each user's history (ordered by ts, event_id) into validity
    intervals of consecutive same-``event_type`` runs →
    (user_id, event_type, valid_from, valid_to, n_events) with
    ``valid_to`` NULL on the open (current) interval — the
    slowly-changing-dimension materialization every warehouse builds
    from CDC streams (Kimball type 2).

    Shape: ONE hash shuffle by user (``keyed_partitions``), then a
    whole-partition vectorized sweep — lexsort + run-boundary diff +
    ``reduceat``; zero per-group Python (the sessionizer's pattern)."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("valid_from", pa.timestamp("us")),
        ("valid_to", pa.timestamp("us")), ("n_events", pa.int64()),
    ])
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(out_schema)

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def sweep(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "user_id" not in t.column_names:
            return out_schema.empty_table()
        st = t.sort_by([
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending"),
        ])
        uid = st.column("user_id").to_numpy()
        ts = st.column("ts").to_numpy()  # datetime64[us]
        et = np.asarray(st.column("event_type").to_pylist(), dtype=object)
        n = len(uid)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        new_type = np.concatenate(([True], et[1:] != et[:-1]))
        starts = np.flatnonzero(new_user | new_type)
        ends = np.concatenate((starts[1:], [n]))
        # valid_to = next interval's valid_from, unless the next
        # interval belongs to another user (open interval → null)
        vfrom = ts[starts]
        open_iv = np.concatenate((new_user[starts[1:]], [True]))
        vto = np.empty(len(starts), dtype=ts.dtype)
        vto[:-1] = ts[starts[1:]]
        vto_arr = pa.array(vto, pa.timestamp("us"), mask=open_iv)
        return pa.table(
            {"user_id": pa.array(uid[starts], pa.int64()),
             "event_type": pa.array(et[starts].tolist(), pa.string()),
             "valid_from": pa.array(vfrom, pa.timestamp("us")),
             "valid_to": vto_arr,
             "n_events": pa.array(
                 (ends - starts).astype(np.int64), pa.int64()
             )}
        )

    return keyed_partitions(ev, ["user_id"], sweep, schema=out_schema)
