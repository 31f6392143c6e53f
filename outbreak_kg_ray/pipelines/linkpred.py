"""Link prediction over the co-occurrence knowledge graph: rank
non-adjacent entity pairs by shared-neighbor evidence (common-neighbor
count + Jaccard coefficient) — the classical "which edges are missing"
heuristic (Liben-Nowell & Kleinberg 2003) a KG curation loop runs to
propose new relations for review.

Reference parity: the reference leaves graph exploration to Neo4j
Cypher at query time (kg/build.py:409-416 bulk-imports and stops);
at engine scale the candidate generation must run distributed.

Scale shape: wedges are enumerated by a self-join on the apex —
the fan-out per apex is degree², so the exchange is bounded by
Σ deg(a)² (the graph's wedge count).  The co-occurrence graph is
vocabulary-bounded (nodes = MeSH terms, edges ≤ vocab² — reference
kg/build.py:60), so wedge volume does not grow with corpus size; on a
general power-law graph the same pipeline applies after a max-degree
cut (hub apexes contribute quadratically and are exactly the pairs a
curator would not need proposed — standard practice).  The anti-join
against the existing edge set and both degree joins are hash joins on
the vocabulary-bounded pair/node tables; the top-k cut is a
distributed sort + limit.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Broadcast-CSR fastpath bound: below this many canonical edges the
# whole adjacency (two int64 arrays + one sorted edge-key array +
# the name dictionary, ~24 B/edge) ships once via ``ray.put`` and
# every stage probes it in shared memory — zero shuffle joins.  4 M
# edges ≈ 100 MB of object store, far under a worker heap; past the
# bound the four-hash-join path below carries the same semantics
# distributed (same measured-size policy as
# relational.BROADCAST_DIM_ROWS).
_BROADCAST_EDGES = 4_000_000


def common_neighbors_topk(sf_dir: str, *, k: int = 50, products=None):
    """→ top-``k`` non-adjacent pairs (u, w, n_common, jaccard) by
    (common-neighbor count DESC, u ASC, w ASC); ``jaccard`` =
    |Γ(u)∩Γ(w)| / |Γ(u)∪Γ(w)| rounded 6."""
    from ray.data.aggregate import Count

    from outbreak_kg_ray.pipelines import kg
    from outbreak_kg_ray.pipelines.graph import (
        _drop_empty_blocks,
        _join_partitions,
    )
    from outbreak_kg_ray.sources.io import empty_dataset

    schema = {
        "u": pa.string(), "w": pa.string(),
        "n_common": pa.int64(), "jaccard": pa.float64(),
    }
    edges = kg.cooccurrence_edges(sf_dir, products)

    def canon(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t.column("start_id"), t.column("end_id"))
        hi = pc.max_element_wise(t.column("start_id"), t.column("end_id"))
        return pa.table({"lo": lo, "hi": hi}).filter(pc.not_equal(lo, hi))

    pairs = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    pairs = _drop_empty_blocks(
        pairs, pa.schema([("lo", pa.string()), ("hi", pa.string())])
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return empty_dataset(schema)
    if n_pairs <= _BROADCAST_EDGES:
        return _common_neighbors_broadcast(pairs, k, schema)
    nparts = _join_partitions(n_pairs)

    def symmetrize(t: pa.Table) -> pa.Table:
        if "lo" not in t.column_names or len(t) == 0:
            return pa.table(
                {"u": pa.array([], pa.string()),
                 "v": pa.array([], pa.string())}
            )
        u = pa.concat_arrays(
            [c.combine_chunks() if hasattr(c, "combine_chunks") else c
             for c in (t.column("lo").combine_chunks(),
                       t.column("hi").combine_chunks())]
        )
        v = pa.concat_arrays(
            [t.column("hi").combine_chunks(),
             t.column("lo").combine_chunks()]
        )
        return pa.table({"u": u, "v": v})

    adj = pairs.map_batches(
        symmetrize, batch_format="pyarrow"
    ).materialize()

    # degrees (vocabulary-bounded node table)
    deg = adj.groupby("u").aggregate(Count(alias_name="d"))
    deg = _drop_empty_blocks(
        deg, pa.schema([("u", pa.string()), ("d", pa.int64())])
    )

    # wedges: both neighbors of each apex, ordered u < w
    wedges = _drop_empty_blocks(
        adj.join(
            adj, "inner", nparts, on=("u",),
            left_suffix="_l", right_suffix="_r",
        ),
        pa.schema([("u", pa.string()), ("v_l", pa.string()),
                   ("v_r", pa.string())]),
    ).map_batches(
        lambda t: pa.table(
            {"cu": t.column("v_l"), "cw": t.column("v_r")}
        ).filter(pc.less(t.column("v_l"), t.column("v_r"))),
        batch_format="pyarrow",
    )
    cn = wedges.groupby(["cu", "cw"]).aggregate(
        Count(alias_name="n_common")
    )
    cn = _drop_empty_blocks(
        cn,
        pa.schema([("cu", pa.string()), ("cw", pa.string()),
                   ("n_common", pa.int64())]),
    )

    # anti-join: keep only pairs NOT already connected.  Left-outer
    # against the pair set + null filter (Ray has no anti join).
    marked = pairs.map_batches(
        lambda t: t.append_column(
            "_edge", pa.array([1] * len(t), pa.int8())
        ),
        batch_format="pyarrow",
    )
    cand = _drop_empty_blocks(
        cn.join(
            marked, "left_outer", nparts,
            on=("cu", "cw"), right_on=("lo", "hi"),
        ),
        pa.schema([("cu", pa.string()), ("cw", pa.string()),
                   ("n_common", pa.int64()), ("_edge", pa.int8())]),
    ).map_batches(
        lambda t: t.filter(pc.is_null(t.column("_edge")))
        .drop_columns(["_edge"]),
        batch_format="pyarrow",
    )

    # attach both endpoint degrees → Jaccard
    with_du = _drop_empty_blocks(
        cand.join(deg, "inner", nparts, on=("cu",), right_on=("u",)),
        pa.schema([("cu", pa.string()), ("cw", pa.string()),
                   ("n_common", pa.int64()), ("d", pa.int64())]),
    ).map_batches(
        lambda t: pa.table(
            {"cu": t.column("cu"), "cw": t.column("cw"),
             "n_common": t.column("n_common"), "du": t.column("d")}
        ),
        batch_format="pyarrow",
    )
    with_both = _drop_empty_blocks(
        with_du.join(deg, "inner", nparts, on=("cw",), right_on=("u",)),
        pa.schema([("cu", pa.string()), ("cw", pa.string()),
                   ("n_common", pa.int64()), ("du", pa.int64()),
                   ("d", pa.int64())]),
    )

    from outbreak_kg_ray.functions.rounding import pa_round_half_away

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_common"), pa.float64())
        union = pc.subtract(
            pc.cast(pc.add(t.column("du"), t.column("d")), pa.float64()),
            n,
        )
        return pa.table(
            {"u": t.column("cu"), "w": t.column("cw"),
             "n_common": pc.cast(t.column("n_common"), pa.int64()),
             "jaccard": pa_round_half_away(pc.divide(n, union), 6)}
        )

    scored = with_both.map_batches(finish, batch_format="pyarrow")
    return scored.sort(
        ["n_common", "u", "w"], descending=[True, False, False]
    ).limit(k)


def _common_neighbors_broadcast(pairs_mat, k: int, schema: dict):
    """Measured-small-graph path: one ``ray.put`` of the CSR
    adjacency, apex fan-out via ``map_batches`` over the node range,
    ONE integer-keyed groupby for the partial wedge counts, and a
    distributed sort+limit — no hash joins at all.

    Wedge enumeration per apex is vectorized (``np.triu_indices``
    over the apex's sorted neighbor slice; Python cost is per APEX,
    numpy cost per pair).  Codes are assigned by ``np.unique`` so
    integer code order == lexicographic name order, which makes the
    ``cu < cw`` cut and every downstream tie-break byte-identical to
    the join path / SQL oracle.  The anti-join against existing
    edges and both degree lookups become ``searchsorted`` probes of
    the broadcast arrays inside the finishing stage.
    """
    import numpy as np
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from outbreak_kg_ray.functions.rounding import pa_round_half_away

    tab = pa.concat_tables(ray.get(pairs_mat.to_arrow_refs()))
    lo = tab.column("lo").to_numpy(zero_copy_only=False)
    hi = tab.column("hi").to_numpy(zero_copy_only=False)
    names, inv = np.unique(np.concatenate([lo, hi]), return_inverse=True)
    n = len(names)
    lo_c, hi_c = inv[: len(lo)], inv[len(lo):]
    # symmetric CSR, neighbor lists sorted by code (== by name)
    src = np.concatenate([lo_c, hi_c])
    dst = np.concatenate([hi_c, lo_c])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.searchsorted(src, np.arange(n + 1)).astype(np.int64)
    deg = np.diff(indptr)
    edge_keys = np.sort(lo_c.astype(np.int64) * n + hi_c)
    adj_ref = ray.put(
        (names, indptr, dst.astype(np.int64), deg.astype(np.int64),
         edge_keys)
    )

    partial_schema = pa.schema([("key", pa.int64()), ("c", pa.int64())])

    def wedge_partials(t: pa.Table) -> pa.Table:
        a_names, a_indptr, a_nbr, _, _ = ray.get(adj_ref)
        nn = len(a_names)
        keys = []
        for a in t.column("id").to_numpy(zero_copy_only=False):
            nb = a_nbr[a_indptr[a]:a_indptr[a + 1]]
            d = len(nb)
            if d < 2:
                continue
            iu, ju = np.triu_indices(d, 1)
            keys.append(nb[iu] * nn + nb[ju])
        if not keys:
            return partial_schema.empty_table()
        uk, counts = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table(
            {"key": uk, "c": counts.astype(np.int64)},
            schema=partial_schema,
        )

    apexes = rd.range(n, override_num_blocks=max(1, min(32, n // 64 or 1)))
    cn = (
        apexes.map_batches(wedge_partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("c", alias_name="n_common"))
    )

    out_schema = pa.schema(list(schema.items()))

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "key" not in t.column_names:
            return out_schema.empty_table()
        a_names, _, _, a_deg, a_edge_keys = ray.get(adj_ref)
        nn = len(a_names)
        key = t.column("key").to_numpy(zero_copy_only=False)
        ncm = t.column("n_common").to_numpy(zero_copy_only=False)
        # anti-join: drop pairs already connected (sorted-key probe)
        pos = np.searchsorted(a_edge_keys, key)
        pos_c = np.minimum(pos, max(len(a_edge_keys) - 1, 0))
        keep = (
            a_edge_keys[pos_c] != key
            if len(a_edge_keys)
            else np.ones(len(key), bool)
        )
        key, ncm = key[keep], ncm[keep]
        cu, cw = key // nn, key % nn
        union = (a_deg[cu] + a_deg[cw] - ncm).astype(np.float64)
        out = pa.table(
            {
                "u": pa.array(a_names[cu], pa.string()),
                "w": pa.array(a_names[cw], pa.string()),
                "n_common": pa.array(ncm.astype(np.int64)),
                "jaccard": pa_round_half_away(
                    pa.array(ncm.astype(np.float64) / union), 6
                ),
            },
            schema=out_schema,
        )
        # per-batch prune: only the batch-local top-k can survive the
        # global (n_common DESC, u, w) cut
        idx = pc.sort_indices(
            out,
            sort_keys=[("n_common", "descending"), ("u", "ascending"),
                       ("w", "ascending")],
        )
        return out.take(idx[:k])

    return (
        cn.map_batches(finish, batch_format="pyarrow")
        .sort(["n_common", "u", "w"], descending=[True, False, False])
        .limit(k)
    )
