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


class PrefixIndex:
    """Case-insensitive prefix search over autocomplete rows — the
    engine's NodesTrie (kg/nodes_trie.py:20-39; result cap 100 per
    autocomplete_blueprint.py:18). pytrie's
    ``SortedStringTrie.values(prefix)`` yields values in sorted key
    order; a bisect over the sorted key array gives the identical
    contract in O(log n + k) without the pytrie dependency.

    Like the reference trie (built driver-side from the lookups
    pickle, kg/get_lookups.py), this is an in-RAM SERVING artifact:
    it is assembled once from the distributed ``autocomplete_terms``
    output and queried point-wise, never used inside a data
    pipeline."""

    def __init__(self, rows: list[tuple[str, str, str]]):
        rows = sorted(rows)  # (key, curie, labels) — key already lower
        self._keys = [r[0] for r in rows]
        self._rows = rows

    def search(self, prefix: str, top_n: int = 100
               ) -> list[tuple[str, str, str]]:
        """All (key, curie, labels) whose key starts with the
        lowercased prefix, in sorted key order, capped at top_n —
        NodesTrie.case_insensitive_search semantics."""
        from bisect import bisect_left

        prefix = prefix.lower()
        out = []
        i = bisect_left(self._keys, prefix)
        while i < len(self._keys) and len(out) < top_n:
            if not self._keys[i].startswith(prefix):
                break
            out.append(self._rows[i])
            i += 1
        return out


def build_prefix_index(sf_dir: str) -> PrefixIndex:
    """autocomplete_terms rows → PrefixIndex (collision suffixes and
    ordering come from the distributed pipeline; this is only the
    final in-RAM assembly)."""
    df = autocomplete_terms(sf_dir).to_pandas()
    return PrefixIndex(
        list(zip(df["key"], df["curie"], df["labels"]))
    )


_FACET_TYPES = {
    "disease": "disease",
    "geolocation": "geoloc",
    "pathogen": "pathogen",
    "symptom": "disease",
}


_query_grounder_cache = None


def _query_grounder():
    """Grounder over the MESH ontology + geonames fixture names — the
    engine's analog of the reference custom grounder
    (kg/client.py:323-365: generate_mesh_terms + geoname_nodes.tsv,
    normalized through the Gilda chain). MESH rows enter first so a
    name shared by both namespaces resolves to MESH (M15 priority)."""
    global _query_grounder_cache
    if _query_grounder_cache is None:
        from ..stages.ner import LexicalGrounder

        rows: list[tuple[str, str, str]] = [
            ("MESH", mid, name) for mid, name, _t, _p in lex.ONTOLOGY
        ]
        seen = {name.lower() for _db, _id, name in rows}
        for curie, name, _pc, _pn in lex.GEONAME_TERMS:
            if name.lower() in seen:
                continue  # MESH wins on shared names (GROUND_NS order)
            seen.add(name.lower())
            db, id_ = curie.split(":", 1)
            rows.append((db, id_, name))
        _query_grounder_cache = LexicalGrounder(rows)
    return _query_grounder_cache


def resolve_curie(query: str) -> str | None:
    """Name-or-curie → curie (reference get_curie,
    kg/client.py:366-379: curies pass through; names ground via the
    normalization chain; a facet that fails to resolve empties the
    whole query)."""
    if ":" in query:
        return query
    hit = _query_grounder().ground_name(query)
    return f"{hit[0]}:{hit[1]}" if hit else None


def facet_descendants(target_curie: str, *,
                      include_phenotype: bool = False) -> set[str]:
    """All curies that reach ``target_curie`` via 0+ ``isa`` hops
    (``isa*0..`` in the reference Cypher, kg/client.py:138-177);
    with ``include_phenotype`` the edge set also includes
    ``has_phenotype`` (the symptom facet's ``has_phenotype|isa*0..``).

    Computed by reverse BFS over the vocabulary-bounded ontology edge
    tables on the driver and broadcast into the mention-edge filter —
    the corpus-scale scan stays distributed."""
    from collections import defaultdict

    from .kg import (
        disease_phenotype_edges_table,
        geoname_edges_table,
        mesh_hierarchy_edges_table,
    )

    tables = [mesh_hierarchy_edges_table(), geoname_edges_table()]
    if include_phenotype:
        tables.append(disease_phenotype_edges_table())
    children: dict[str, list[str]] = defaultdict(list)
    for t in tables:
        for s, e in zip(t.column("start_id").to_pylist(),
                        t.column("end_id").to_pylist()):
            children[e].append(s)
    out = {target_curie}
    stack = [target_curie]
    while stack:
        for c in children.get(stack.pop(), []):
            if c not in out:
                out.add(c)
                stack.append(c)
    return out


def facet_ancestors(target_curie: str) -> set[str]:
    """All curies reachable FROM ``target_curie`` via 0+ ``isa`` hops
    (the upward leg of the reference's two-direction indicator query,
    kg/client.py:84-92). Forward BFS over the vocabulary-bounded
    ontology edges on the driver."""
    from collections import defaultdict

    from .kg import geoname_edges_table, mesh_hierarchy_edges_table

    parents: dict[str, list[str]] = defaultdict(list)
    for t in (mesh_hierarchy_edges_table(), geoname_edges_table()):
        for s, e in zip(t.column("start_id").to_pylist(),
                        t.column("end_id").to_pylist()):
            parents[s].append(e)
    out = {target_curie}
    stack = [target_curie]
    while stack:
        for p in parents.get(stack.pop(), []):
            if p not in out:
                out.add(p)
                stack.append(p)
    return out


def indicators_by_country(sf_dir: str, geolocation: str = "Asia",
                          indicator_filter: str = "total"):
    """The ``/v1/indicators`` endpoint (kg/api.py:54-61;
    client.query_indicators kg/client.py:76-114): indicator edges of
    every geolocation whose ``isa*0..`` closure reaches the query
    curie in EITHER direction (the Cypher UNION of the two
    path-direction MATCHes), name-filtered by ``CONTAINS``.

    All inputs are vocabulary-bounded reference tables (countries ×
    series), so this composes driver-side Arrow like the other
    indicator builders; nothing corpus-scale moves."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .kg import indicator_edges_table, indicator_nodes_table

    empty = pa.table(
        {
            "country_curie": pa.array([], pa.string()),
            "indicator_curie": pa.array([], pa.string()),
            "indicator_name": pa.array([], pa.string()),
            "years_data": pa.array([], pa.string()),
        }
    )
    curie = resolve_curie(geolocation)
    if curie is None:
        return rd.from_arrow(empty)
    members = facet_descendants(curie) | facet_ancestors(curie)

    edges = pa.concat_tables(
        [indicator_edges_table(k) for k in ("health", "dev")]
    )
    nodes = pa.concat_tables(
        [indicator_nodes_table(k) for k in ("health", "dev")]
    )
    name_by_curie = dict(
        zip(nodes.column("curie").to_pylist(),
            nodes.column("name").to_pylist())
    )
    rows = []
    for s, yd, e in zip(
        edges.column("start_id").to_pylist(),
        edges.column("years_data").to_pylist(),
        edges.column("end_id").to_pylist(),
    ):
        name = name_by_curie.get(e, "")
        if s in members and indicator_filter in name:
            rows.append((s, e, name, yd))
    if not rows:
        return rd.from_arrow(empty)
    rows = sorted(set(rows))
    return rd.from_arrow(
        pa.table(
            {
                "country_curie": pa.array([r[0] for r in rows]),
                "indicator_curie": pa.array([r[1] for r in rows]),
                "indicator_name": pa.array([r[2] for r in rows]),
                "years_data": pa.array([r[3] for r in rows]),
            }
        )
    )


def alerts_by_facet(sf_dir: str, *, disease: str | None = None,
                    geolocation: str | None = None,
                    pathogen: str | None = None,
                    symptom: str | None = None,
                    timestamp: str | None = None,
                    limit: int | None = None,
                    num_partitions: int = 8):
    """Faceted alert search — the reference's ``/v1/alerts`` workhorse
    (kg/client.py:118-193 query_graph; route kg/api.py:26-38).

    Per facet: the alert must mention a node of the facet's type whose
    ``isa*0..`` closure reaches the query curie (symptom: closure over
    ``has_phenotype|isa``). Facets are independent MATCH clauses in
    the Cypher, so multiple facets cross-product per alert — this is
    reproduced by inner hash joins on alert_id. One row per distinct
    (alert, facet node, ...) combination.

    Output: (alert_id, timestamp, {facet}_curie...). Rows are already
    distinct — mention edges are distinct per (alert, curie) and each
    join key is the alert — so no extra dedup shuffle is spent.

    Deviation (documented): the reference's symptom endpoint carries a
    ``:disease`` label check on the closure TARGET; phenotype IDs are
    not nodes in the fixture ontology, so the endpoint label check is
    dropped (the matched MENTION node is still type-checked)."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        fields = {"alert_id": pa.string(), "timestamp": pa.string()}
        for nm, v in (("disease", disease), ("geolocation", geolocation),
                      ("pathogen", pathogen), ("symptom", symptom)):
            if v is not None:
                fields[f"{nm}_curie"] = pa.string()
        return empty_dataset(fields)
    from .kg import alert_mention_edges, alert_nodes

    requested = [
        ("disease", disease), ("geolocation", geolocation),
        ("pathogen", pathogen), ("symptom", symptom),
    ]
    facet_members: list[tuple[str, pa.Array]] = []
    for fname, q in requested:
        if q is None:
            continue
        target = resolve_curie(q)
        if target is None:
            import ray.data as rd

            return rd.from_arrow(
                pa.table({"alert_id": pa.array([], pa.string())})
            )
        desc = facet_descendants(
            target, include_phenotype=(fname == "symptom")
        )
        ty = _FACET_TYPES[fname]
        members = pa.array(sorted(
            c for c in desc
            if lex.MESH_TYPES.get(c.split(":", 1)[1]) == ty
        ))
        facet_members.append((fname, members))

    edges = alert_mention_edges(sf_dir)

    def facet_rows(fname: str, members: pa.Array):
        col = f"{fname}_curie"

        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t.column("end_id"), value_set=members))
            return pa.table(
                {"alert_id": t.column("start_id"), col: t.column("end_id")}
            )

        return edges.map_batches(f, batch_format="pyarrow")

    # Size the alert-key joins from the OBSERVED smaller side: a
    # facet-filtered edge set can be tiny, and a hash partition that
    # receives no shards becomes a zero-column table Ray 2.49's join
    # finalize hands to Acero (nondeterministic crash, block-layout
    # dependent).  Dense partitions (≥64 rows each, the graph-module
    # policy) make that unreachable; the facet sides are
    # mention-bounded, so the materialize-for-count is cheap.
    sides = []
    min_side = None
    for fname, members in facet_members:
        fds = facet_rows(fname, members).materialize()
        n = fds.count()
        min_side = n if min_side is None else min(min_side, n)
        sides.append(fds)
    if min_side is not None:
        num_partitions = max(1, min(num_partitions, min_side // 64 + 1))

    result = None
    for fds in sides:
        result = fds if result is None else result.join(
            fds, "inner", num_partitions, on=("alert_id",)
        )

    alerts = alert_nodes(sf_dir).select_columns(
        ["curie", "timestamp"]
    ).rename_columns({"curie": "alert_id"})
    if result is None:
        # no facet: DISTINCT alerts that mention anything
        from .kg import distinct

        mentioned = distinct(
            edges.select_columns(["start_id"]), ["start_id"]
        ).rename_columns({"start_id": "alert_id"})
        result = mentioned.join(alerts, "inner", num_partitions,
                                on=("alert_id",))
    else:
        result = result.join(alerts, "inner", num_partitions,
                             on=("alert_id",))
    if timestamp is not None:
        result = result.filter(
            expr=f"timestamp == '{timestamp}'"
        )
    ordered = ["alert_id", "timestamp"] + [
        f"{f}_curie" for f, _ in facet_members
    ]
    result = result.select_columns(ordered)
    if limit is not None:
        result = result.sort(ordered).limit(limit)
    return result


def autocomplete_terms(sf_dir: str, *, num_partitions: int = 8):
    """Autocomplete lookup rows (kg/get_lookups.py:4-61 /
    kg/nodes_trie.py): (key, curie, labels) with case-insensitive
    name-collision suffixes ``_1``, ``_2``… (gl:36-59). The
    reference's first-seen suffix order is replaced by a
    deterministic sort-by-curie order (T5 policy, SURVEY.md §7).

    Distributed (round-1 VERDICT #5: the previous version pulled the
    whole O(corpus) node table to driver pandas): collision ranks are
    computed with a count-aggregate + hash-join on the lowered name;
    rows whose key is unique (the overwhelming majority — alert
    archives are unique by construction) stream through untouched,
    and only the collision subset pays a per-group suffix pass."""

    from ray.data.aggregate import Count

    from .kg import canonical_nodes

    nodes = canonical_nodes(sf_dir)

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.utf8_lower(t.column("name")),
                "curie": t.column("curie"),
                "labels": t.column("labels"),
            }
        )

    k = nodes.map_batches(keyed, batch_format="pyarrow")
    counts = k.groupby("key").aggregate(Count(alias_name="_n"))
    joined = k.join(counts, "inner", num_partitions, on=("key",))
    uniq = joined.filter(expr="_n == 1").drop_columns(["_n"])
    coll = joined.filter(expr="_n > 1").drop_columns(["_n"])

    def suffix(g: pa.Table) -> pa.Table:
        import numpy as np

        curies = g.column("curie").to_numpy(zero_copy_only=False)
        order = np.argsort(curies, kind="stable")
        take = pa.array(order, pa.int64())
        base = g.column("key")[0].as_py()
        keys = [base] + [
            f"{base}_{i}" for i in range(1, len(curies))
        ]
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "curie": g.column("curie").take(take),
                "labels": g.column("labels").take(take),
            }
        )

    suffixed = coll.groupby("key").map_groups(
        suffix, batch_format="pyarrow"
    )
    return uniq.union(suffixed).select_columns(["key", "curie", "labels"])


# ---------------------------------------------------------------------------
# /v1/text_relations — annotate free text, then relate the grounded
# entities (kg/client.py:195-283 annotate_text_query)
# ---------------------------------------------------------------------------

DEMO_TEXT = (
    "An outbreak of Cholera caused by Vibrio Cholerae was confirmed in "
    "Nigeria, while Dengue and Malaria cases were reported across "
    "Brazil and India."
)


def annotate_text(text: str) -> list[dict]:
    """Free text → [{text, name, curie, type}] via the lexical
    grounder (kg/client.py:197-216: gilda.annotate over
    MESH/geonames, type from the is_disease/is_geoloc/is_pathogen
    predicates — here the MESH_TYPES lookup, 'other' as fallback)."""
    from ..stages.ner import LexicalGrounder

    grounder = LexicalGrounder()
    out = []
    for txt, db, id_, name, _s, _e in grounder.annotate(text):
        out.append(
            {
                "text": txt,
                "name": name,
                "curie": f"{db}:{id_}",
                "type": lex.MESH_TYPES.get(id_, "other"),
            }
        )
    return out


def text_relations_curies(text: str = DEMO_TEXT) -> list[str]:
    """Sorted distinct curie set of the annotations
    (kg/client.py:217) — deterministic for a fixed text, so the
    DuckDB oracle can inline it."""
    return sorted({a["curie"] for a in annotate_text(text)})


def text_relations_direct(sf_dir: str, text: str = DEMO_TEXT):
    """'direct' component: every canonical edge whose BOTH endpoints
    are grounded in the text (kg/client.py:222-236) — J7 with the
    annotation-derived curie set."""
    return direct_relations(sf_dir, text_relations_curies(text))


def text_relations_alerts(sf_dir: str, text: str = DEMO_TEXT):
    """'alerts' component: alerts co-mentioning ≥2 of the text's
    entities, entity sets merged per alert, top-500 by entity count
    (kg/client.py:238-262) — J8/A10 with the annotation curies."""
    return comention_alerts(sf_dir, text_relations_curies(text))


def text_relations(sf_dir: str, text: str = DEMO_TEXT) -> dict:
    """The composed /v1/text_relations endpoint
    (kg/client.py:195-283): annotations + direct relations +
    co-mention alerts + realism classification. The realism component
    reuses the precomputed pair-score table exactly like the
    reference (realism_score.py loads its scores TSV once)."""
    import numpy as np

    from .realism import logsumexp_score, realism_lookup

    annotations = annotate_text(text)
    curies = sorted({a["curie"] for a in annotations})
    mesh_ids = [c.split(":", 1)[1] for c in curies if c.startswith("MESH:")]

    # collect ONLY the query-relevant slice of the distributed
    # pair-score table (a handful of ids per request); the full table
    # never lands on the driver
    num_alerts = 1  # folded into the stored scores; lookup is absolute
    lookup = realism_lookup(sf_dir, mesh_ids)
    scores, score_sum, classification = logsumexp_score(
        mesh_ids, lookup, num_alerts
    )
    return {
        "annotations": annotations,
        "direct": text_relations_direct(sf_dir, text),
        "alerts": text_relations_alerts(sf_dir, text),
        "realism_score": {
            "scores": [[a, b, s] for (a, b), s in scores.items()],
            "score_sum": float(score_sum) if np.isfinite(score_sum) else None,
            "classification": classification,
        },
    }


def autocomplete_search(sf_dir: str, *, prefix: str = "in",
                        top_n: int = 100):
    """/v1/autocomplete analog as a driver query: the rows the
    PrefixIndex serves for ``prefix`` (case-insensitive, sorted key
    order, capped at ``top_n`` — reference NodesTrie semantics,
    kg/nodes_trie.py:20-39, cap autocomplete_blueprint.py:18).
    Assembles the serving artifact from the distributed
    autocomplete_terms output, then answers the point query."""
    import ray.data as rd

    idx = build_prefix_index(sf_dir)
    rows = idx.search(prefix, top_n=top_n)
    return rd.from_arrow(
        pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.string()),
                "curie": pa.array([r[1] for r in rows], pa.string()),
                "labels": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def trending_terms_daily(sf_dir: str, *, k: int = 3):
    """Trending entities: the top-``k`` mentioned terms per published
    day (count of mentioning alerts, ties by name) — the dashboard
    query layered on the NER output.

    ONE fused pass: the batch runs the same grounder actor the
    mentions pipeline uses, then stamps each mention with its doc's
    day from a BATCH-LOCAL doc→day map (published_ts rides the same
    batch — no join, no global state); the (day, term) exchange is
    calendar × vocabulary bounded, and the top-k picks run per day
    inside map_groups."""

    from ray.data.aggregate import Count

    from outbreak_kg_ray.sources.pages import pages_dataset
    from outbreak_kg_ray.stages.extract import extract_docs
    from outbreak_kg_ray.stages.ner import NerStage, default_concurrency

    docs = extract_docs(pages_dataset(sf_dir)).select_columns(
        ["doc_id", "sections", "published_ts"]
    )

    class TrendStage:
        def __init__(self) -> None:
            self._ner = NerStage(mode="terms")

        def __call__(self, t: pa.Table) -> pa.Table:
            m = self._ner(t.select(["doc_id", "sections"]))
            days = dict(
                zip(
                    t.column("doc_id").to_pylist(),
                    pc.floor_temporal(
                        t.column("published_ts"), unit="day"
                    )
                    .cast(pa.timestamp("us"))
                    .to_pylist(),
                )
            )
            return pa.table(
                {
                    "day": pa.array(
                        [days[d] for d in m.column("doc_id").to_pylist()],
                        pa.timestamp("us"),
                    ),
                    "term": m.column("entry_name"),
                }
            )

    counts = (
        docs.map_batches(
            TrendStage,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=default_concurrency(),
        )
        .groupby(["day", "term"])
        .aggregate(Count(alias_name="n"))
    )

    def top(g: pa.Table) -> pa.Table:
        import numpy as np

        n = g.column("n").to_numpy(zero_copy_only=False)
        terms = g.column("term").to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -n))[:k]
        take = pa.array(order, pa.int64())
        return pa.table(
            {
                "day": g.column("day").take(take),
                "term": g.column("term").take(take),
                "n": pa.array(n[order], pa.int64()),
            }
        )

    return counts.groupby("day").map_groups(top, batch_format="pyarrow")


def alert_hourly_timeline(sf_dir: str, *, window: int = 3):
    """Alerts published per hour with a trailing ``window``-hour
    moving average — the monitoring timeline over the ingest stream.

    The hourly aggregate is CALENDAR-bounded (it grows with the time
    span, not the corpus — the distributed combining count happens
    BEFORE anything reaches the driver), so the windowed smoothing
    runs on the collected series like the ship-window calendar; gaps
    are zero-filled first so the average is over true hours, not
    observed rows."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Count

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.pages import pages_dataset
    from outbreak_kg_ray.stages.extract import extract_docs

    docs = extract_docs(pages_dataset(sf_dir)).select_columns(
        ["published_ts"]
    )

    def hour(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.floor_temporal(
                    t.column("published_ts"), unit="hour"
                ).cast(pa.timestamp("us"))
            }
        )

    rows = (
        docs.map_batches(hour, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Count(alias_name="n_alerts"))
        .take_all()
    )  # calendar-bounded
    if not rows:
        return rd.from_arrow(
            pa.schema(
                [
                    ("hour", pa.timestamp("us")),
                    ("n_alerts", pa.int64()),
                    ("moving_avg", pa.float64()),
                ]
            ).empty_table()
        )
    by_hour = {r["hour"]: r["n_alerts"] for r in rows}
    lo, hi = min(by_hour), max(by_hour)
    step = np.timedelta64(1, "h")
    hours = []
    cur = np.datetime64(lo)
    end = np.datetime64(hi)
    while cur <= end:
        hours.append(cur)
        cur = cur + step
    counts = np.array(
        [by_hour.get(h.astype("datetime64[us]").item(), 0) for h in hours],
        dtype=np.int64,
    )
    mavg = [
        round_half_away(
            float(counts[max(0, i - window + 1): i + 1].mean()), 6
        )
        for i in range(len(counts))
    ]
    return rd.from_arrow(
        pa.table(
            {
                "hour": pa.array(
                    [h.astype("datetime64[us]").item() for h in hours],
                    pa.timestamp("us"),
                ),
                "n_alerts": pa.array(counts, pa.int64()),
                "moving_avg": pa.array(mavg, pa.float64()),
            }
        )
    )


def mesh_subtree_sizes(sf_dir: str):
    """Per ontology node: how many descendants reach it through the
    ``isa*`` closure (subtree size) — the ontology fan-in statistic
    the faceted search uses to gauge how broad a facet query is.
    Pure aggregate over the static closure table (vocabulary-bounded,
    like every ontology artifact)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    return (
        isa_closure(sf_dir)
        .groupby("end_id")
        .aggregate(Count(alias_name="n_descendants"))
        .map_batches(
            lambda t: pa.table(
                {
                    "curie": t.column("end_id"),
                    "n_descendants": t.column("n_descendants").cast(
                        pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def entity_timeline(sf_dir: str):
    """Per-entity activity span: number of mentioning alerts plus
    first/last published timestamp — the KG dashboard's "when was
    this entity active" rollup.

    Same fused single-pass shape as ``trending_terms_daily``: the
    grounder actor emits per-alert distinct terms stamped with the
    doc's timestamp from a batch-local map (no join), then ONE
    vocabulary-bounded aggregate carries (term, count, min, max)."""
    from ray.data.aggregate import Count, Max, Min

    from outbreak_kg_ray.sources.pages import pages_dataset
    from outbreak_kg_ray.stages.extract import extract_docs
    from outbreak_kg_ray.stages.ner import NerStage, default_concurrency

    docs = extract_docs(pages_dataset(sf_dir)).select_columns(
        ["doc_id", "sections", "published_ts"]
    )

    class StampStage:
        def __init__(self) -> None:
            self._ner = NerStage(mode="terms")

        def __call__(self, t: pa.Table) -> pa.Table:
            m = self._ner(t.select(["doc_id", "sections"]))
            ts = dict(
                zip(
                    t.column("doc_id").to_pylist(),
                    t.column("published_ts")
                    .cast(pa.timestamp("us"))
                    .to_pylist(),
                )
            )
            return pa.table(
                {
                    "entry_name": m.column("entry_name"),
                    "ts": pa.array(
                        [ts[d] for d in m.column("doc_id").to_pylist()],
                        pa.timestamp("us"),
                    ),
                }
            )

    agg = (
        docs.map_batches(
            StampStage,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=default_concurrency(),
        )
        .groupby("entry_name")
        .aggregate(
            Count(alias_name="n_alerts"),
            Min("ts", alias_name="first_seen"),
            Max("ts", alias_name="last_seen"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "entry_name" not in t.column_names:
            return pa.schema(
                [("entry_name", pa.string()), ("n_alerts", pa.int64()),
                 ("first_seen", pa.timestamp("us")),
                 ("last_seen", pa.timestamp("us"))]
            ).empty_table()
        return pa.table(
            {
                "entry_name": t.column("entry_name"),
                "n_alerts": t.column("n_alerts").cast(pa.int64()),
                "first_seen": t.column("first_seen").cast(
                    pa.timestamp("us")
                ),
                "last_seen": t.column("last_seen").cast(
                    pa.timestamp("us")
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def top_cooccurring_partners(sf_dir: str, *, k: int = 3):
    """Per-entity top-``k`` co-occurrence partners by edge weight —
    the "related entities" serving panel over the occurs_with table
    (reference kg/build.py:52-94 edges, ranked per node).

    Scale shape: the co-occurrence table is vocabulary-bounded, so
    symmetrize + one entity-keyed map_groups (≤ |vocab| rows each)
    is the whole plan; ties rank by partner curie for cross-engine
    determinism."""

    from outbreak_kg_ray.pipelines import kg

    edges = kg.cooccurrence_edges(sf_dir)

    def sym(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "start_id" not in t.column_names:
            return pa.schema(
                [("entity", pa.string()), ("partner", pa.string()),
                 ("n", pa.int64())]
            ).empty_table()
        def flat(col):
            return (
                col.combine_chunks()
                if isinstance(col, pa.ChunkedArray)
                else col
            )

        s, e = flat(t.column("start_id")), flat(t.column("end_id"))
        c = flat(t.column("count").cast(pa.int64()))
        return pa.table(
            {
                "entity": pa.concat_arrays([s, e]),
                "partner": pa.concat_arrays([e, s]),
                "n": pa.concat_arrays([c, c]),
            }
        )

    def topk(g: pa.Table) -> pa.Table:
        import numpy as np

        n = g.column("n").to_numpy(zero_copy_only=False)
        partners = g.column("partner").to_numpy(zero_copy_only=False)
        order = np.lexsort((partners, -n))[:k]
        take = pa.array(order, pa.int64())
        return pa.table(
            {
                "entity": g.column("entity").take(take),
                "partner": g.column("partner").take(take),
                "n": pa.array(n[order], pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    return (
        edges.map_batches(sym, batch_format="pyarrow")
        .groupby("entity")
        .map_groups(topk, batch_format="pyarrow")
    )
