"""Serving-side query pipelines over the materialized graph tables —
the engine's answers to the reference's Neo4j/Flask query surface
(kg/client.py / kg/api.py). Every query is computable from the
canonical Parquet tables; no graph database required.

- ``direct_relations`` — J7 (kg/client.py:222-236): all edges whose
  BOTH endpoints are in the query curie set.
- ``comention_alerts`` — J8/A10 (kg/client.py:238-262): alerts
  mentioning ≥2 of the query curies, entity sets merged per alert,
  ranked by entity count desc then alert id, top-500.
- ``isa_closure`` — J9 (kg/client.py:127-181 isa*-closure matches):
  precomputed transitive closure over the ``isa`` forest (MeSH
  hierarchy + geonames), the serving-side ancestor table.

The deterministic demo query set is the lexicon's first N typed MeSH
curies, so oracle SQL can reproduce it exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..fixtures import lexicon as lex


def default_query_curies(n: int = 12) -> list[str]:
    """First n typed lexicon entries as MESH curies (deterministic)."""
    out = []
    for mid, _name, mtype, _p in lex.ONTOLOGY:
        if mtype in ("disease", "pathogen", "geoloc"):
            out.append(f"MESH:{mid}")
        if len(out) == n:
            break
    return out


def direct_relations(sf_dir: str, curies: list[str] | None = None):
    """Edges with both endpoints in the query set (J7)."""
    from .kg import canonical_edges

    qset = pa.array(sorted(curies or default_query_curies()))

    def f(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t.column("start_id"), value_set=qset),
            pc.is_in(t.column("end_id"), value_set=qset),
        )
        return t.filter(keep)

    return canonical_edges(sf_dir).map_batches(f, batch_format="pyarrow")


def comention_alerts(sf_dir: str, curies: list[str] | None = None,
                     top_k: int = 500):
    """Alerts mentioning ≥2 query curies, ranked by entity count
    (J8 via groupby — NOT an O(n²) self-join; A10 merge; T4 top-k).

    → (alert_id, n_entities, entities) with entities ';'-joined
    sorted curies."""
    from ray.data.aggregate import Unique

    from .kg import alert_mention_edges

    qset = pa.array(sorted(curies or default_query_curies()))
    edges = alert_mention_edges(sf_dir)

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("end_id"), value_set=qset))
        return pa.table(
            {"alert_id": t.column("start_id"), "curie": t.column("end_id")}
        )

    grouped = (
        edges.map_batches(pre, batch_format="pyarrow")
        .groupby("alert_id")
        .aggregate(Unique("curie", alias_name="_curies"))
    )

    def finish(t: pa.Table) -> pa.Table:
        alert_ids, n_ent, ents = [], [], []
        for aid, cs in zip(
            t.column("alert_id").to_pylist(), t.column("_curies").to_pylist()
        ):
            cs = sorted(set(cs))
            if len(cs) < 2:
                continue  # needs two distinct co-mentioned entities
            alert_ids.append(aid)
            n_ent.append(len(cs))
            ents.append(";".join(cs))
        return pa.table(
            {
                "alert_id": pa.array(alert_ids, pa.string()),
                "n_entities": pa.array(n_ent, pa.int64()),
                "entities": pa.array(ents, pa.string()),
            }
        )

    ranked = grouped.map_batches(finish, batch_format="pyarrow")
    return ranked.sort(["n_entities", "alert_id"], descending=[True, False]).limit(
        top_k
    )


def isa_closure_table() -> pa.Table:
    """Transitive closure (depth ≥ 1) of the isa forest. The isa
    relation is single-parent (MeSH subtree parents kg/build.py:114-124;
    geoname containment chains kg/build.py:365-375), so the closure is
    each node's root path — computed driver-side on the small static
    tables and broadcast, exactly like the other ontology artifacts."""
    from .kg import geoname_edges_table, mesh_hierarchy_edges_table

    parent: dict[str, str] = {}
    for t in (mesh_hierarchy_edges_table(), geoname_edges_table()):
        for s, e in zip(t.column("start_id").to_pylist(),
                        t.column("end_id").to_pylist()):
            parent[s] = e
    starts, ends, depths = [], [], []
    for node in sorted(parent):
        anc, depth, seen = parent[node], 1, {node}
        while True:
            starts.append(node)
            ends.append(anc)
            depths.append(depth)
            if anc in seen or anc not in parent:
                break
            seen.add(anc)
            anc, depth = parent[anc], depth + 1
    return pa.table(
        {
            "start_id": pa.array(starts, pa.string()),
            "rel_type": pa.array(["isa_closure"] * len(starts), pa.string()),
            "end_id": pa.array(ends, pa.string()),
            "depth": pa.array(depths, pa.int64()),
        }
    )


def isa_closure(sf_dir: str):
    import ray.data as rd

    return rd.from_arrow(isa_closure_table())


def autocomplete_terms(sf_dir: str):
    """Autocomplete lookup rows (kg/get_lookups.py:4-61 /
    kg/nodes_trie.py): (key, curie, labels) with case-insensitive
    name-collision suffixes ``_1``, ``_2``… (gl:36-59). The
    reference's first-seen suffix order is replaced by a
    deterministic sort-by-curie order (T5 policy, SURVEY.md §7).

    Built from the canonical node table; the trie itself is a
    driver/serving-side artifact assembled from these rows."""
    import pandas as pd

    from .kg import canonical_nodes

    nodes = canonical_nodes(sf_dir).to_pandas()
    nodes["key"] = nodes["name"].str.lower()
    nodes = nodes.sort_values(["key", "curie"], kind="mergesort")
    rank = nodes.groupby("key").cumcount()
    nodes["key"] = nodes["key"].where(
        rank == 0, nodes["key"] + "_" + rank.astype(str)
    )
    return pd.DataFrame(
        {
            "key": nodes["key"].to_numpy(),
            "curie": nodes["curie"].to_numpy(),
            "labels": nodes["labels"].to_numpy(),
        }
    ).reset_index(drop=True)
