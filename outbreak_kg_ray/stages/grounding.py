"""Scored, ambiguity-aware grounding (Gilda analog).

The reference grounds free-text names with a *custom Gilda grounder*
indexing MeSH terms AND geoname terms (kg/client.py:323-366
``create_custom_grounder``), then resolves a name to one CURIE by
taking the TOP-SCORED match (kg/client.py:368-378 ``get_curie``:
curie-shaped input is returned as-is; no match → None).  Gilda ranks
candidate terms by match quality (exact beats case-variant) and term
status (primary name beats synonym); the NER path additionally walks
groundings in namespace-priority order (promed_ner.py:160-176).

This engine replaces Gilda's trained scorer with a *deterministic
total order* over the same signals — so results are reproducible and
oracle-checkable — while keeping the ambiguity structure: one surface
form may carry multiple candidate groundings across or within
namespaces ("United States" → MESH:D014481 and geonames:6252001;
"Marburg" → MESH:D008379 and MESH:D029044).

Ranking tuple (best first), exposed as an integer ``score``:

- ``match_tier``  0 = exact (case-sensitive) surface match,
                  1 = case-insensitive match        (Gilda match quality)
- ``status_rank`` 0 = primary name, 1 = synonym     (Gilda Term.status)
- ``ns_rank``     0 = MESH, 1 = geonames            (GILDA_NS priority)
- curie ascending as the final tiebreak

``score = 100 - 20*match_tier - 10*status_rank - ns_rank`` (ints keep
the DuckDB oracle hash float-free).

Scale notes: the candidate index is built ONCE PER ACTOR in
``__init__`` (a reference-scale lexicon is 31k+ surfaces — still a
broadcast-sized lookup table, never a shuffle side); per-batch work is
a dict probe per query surface.  The query stream itself is a pruned
single-column Parquet scan.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

from ..fixtures import lexicon as lex
from ..sources.io import empty_dataset, parquet_rows, read_parquet_clean

NS_RANK = {"MESH": 0, "geonames": 1}
STATUS_RANK = {"name": 0, "synonym": 1}


def ground_terms() -> list[tuple[str, str, str, str, str]]:
    """The candidate term table: (ns, id, entry_name, text, status).

    MESH primary names come from the mention lexicon, geonames primary
    names from the geoname fixture (both status='name', mirroring
    kg/client.py:352-361 Term(status="name")); synonyms add extra
    surface forms with status='synonym'."""
    out: list[tuple[str, str, str, str, str]] = []
    for mesh_id, name, _t, _p in lex.MENTION_LEXICON:
        out.append(("MESH", mesh_id, name, name, "name"))
    for curie, name, _pc, _pn in lex.GEONAME_TERMS:
        ns, gid = curie.split(":", 1)
        out.append((ns, gid, name, name, "name"))
    for ns, tid, entry_name, syn in lex.GROUND_SYNONYMS:
        out.append((ns, tid, entry_name, syn, "synonym"))
    return out


def _norm(text: str) -> str:
    """Gilda ``normalize`` analog: whitespace-collapse + casefold to
    lower (the fixture surfaces need no greek/dash rewriting)."""
    return " ".join(text.split()).lower()


class ScoredGrounder:
    """Per-actor grounding index. ``ground`` returns ALL candidates,
    ranked; ``get_curie`` is the reference's top-1 walk."""

    def __init__(self) -> None:
        self._index: dict[str, list[tuple]] = {}
        for ns, tid, entry_name, text, status in ground_terms():
            self._index.setdefault(_norm(text), []).append(
                (ns, tid, entry_name, text, status,
                 STATUS_RANK[status], NS_RANK[ns])
            )

    def ground(self, query: str) -> list[dict]:
        """All scored candidates for ``query``, best first (Gilda
        ``Grounder.ground`` analog). Empty list for no match."""
        cands = self._index.get(_norm(query))
        if not cands:
            return []
        scored = []
        for ns, tid, entry_name, text, status, srank, nsrank in cands:
            tier = 0 if query == text else 1
            score = 100 - 20 * tier - 10 * srank - nsrank
            scored.append(
                {"ns": ns, "id": tid, "entry_name": entry_name,
                 "status": status, "match_tier": tier, "score": score}
            )
        scored.sort(key=lambda c: (-c["score"], c["ns"], c["id"]))
        for rank, c in enumerate(scored, start=1):
            c["rank"] = rank
        return scored

    def get_curie(self, query: str) -> str | None:
        """kg/client.py:368-378: curie passthrough, else top match as
        'ns:id', else None."""
        if ":" in query:
            return query
        matches = self.ground(query)
        if not matches:
            return None
        return f"{matches[0]['ns']}:{matches[0]['id']}"


# ---------------------------------------------------------------------------
# Query-stream synthesis: one grounding call per document, surface
# chosen from the deterministic pool with a case-mangling mode that
# exercises the exact-vs-casefold tier (kept in sync with the oracle
# SQL in __ray_entry__):
#   surface = GROUND_QUERY_POOL[(doc_id*13 + 7) % GROUND_POOL_N]
#   query   = surface            if doc_id % 3 == 0
#           = lower(surface)     if doc_id % 3 == 1
#           = upper(surface)     if doc_id % 3 == 2
# ---------------------------------------------------------------------------


def query_surface(doc_id: int) -> str:
    s = lex.GROUND_QUERY_POOL[(doc_id * 13 + 7) % lex.GROUND_POOL_N]
    m = doc_id % 3
    if m == 1:
        return s.lower()
    if m == 2:
        return s.upper()
    return s


def _queries_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    return pa.table(
        {
            "qid": pa.array(ids, pa.int64()),
            "query": pa.array([query_surface(d) for d in ids], pa.string()),
        }
    )


class _ScoredGroundStage:
    """Actor-pool stage: explode each query into its ranked candidate
    rows (index built once per actor)."""

    def __init__(self) -> None:
        self.grounder = ScoredGrounder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids: list[int] = []
        queries: list[str] = []
        cols: dict[str, list] = {
            "ns": [], "id": [], "entry_name": [], "status": [],
            "match_tier": [], "score": [], "rank": [],
        }
        for qid, q in zip(
            batch.column("qid").to_pylist(), batch.column("query").to_pylist()
        ):
            if ":" in q:
                continue  # curie passthrough is not a grounder hit
            for c in self.grounder.ground(q):
                qids.append(qid)
                queries.append(q)
                for k in cols:
                    cols[k].append(c[k])
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "query": pa.array(queries, pa.string()),
                "ns": pa.array(cols["ns"], pa.string()),
                "id": pa.array(cols["id"], pa.string()),
                "entry_name": pa.array(cols["entry_name"], pa.string()),
                "status": pa.array(cols["status"], pa.string()),
                "match_tier": pa.array(cols["match_tier"], pa.int64()),
                "score": pa.array(cols["score"], pa.int64()),
                "rank": pa.array(cols["rank"], pa.int64()),
            }
        )


class _CurieStage:
    """Actor-pool stage: the get_curie top-1 walk, one row per query
    (curie NULL when ungroundable — kg/client.py:375-376)."""

    def __init__(self) -> None:
        self.grounder = ScoredGrounder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("qid").to_pylist()
        queries = batch.column("query").to_pylist()
        curies = [self.grounder.get_curie(q) for q in queries]
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "query": pa.array(queries, pa.string()),
                "curie": pa.array(curies, pa.string()),
            }
        )


_SCORED_SCHEMA = {
    "qid": pa.int64(), "query": pa.string(), "ns": pa.string(),
    "id": pa.string(), "entry_name": pa.string(), "status": pa.string(),
    "match_tier": pa.int64(), "score": pa.int64(), "rank": pa.int64(),
}
_CURIE_SCHEMA = {"qid": pa.int64(), "query": pa.string(), "curie": pa.string()}


def ground_queries_dataset(sf_dir: str):
    """The deterministic grounding query stream (pruned 1-column scan)."""
    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(_queries_batch, batch_format="pyarrow")


def scored_groundings(sf_dir: str):
    """All ranked candidates per query — the scored-grounding surface
    a Gilda user sees (``Grounder.ground``). Decoys and curie-shaped
    queries contribute no rows."""
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(_SCORED_SCHEMA)
    from outbreak_kg_ray.stages.maputil import map_stage

    return map_stage(
        ground_queries_dataset(sf_dir), _ScoredGroundStage,
        batch_size=1024,
    )


def grounding_curies(sf_dir: str):
    """get_curie analog over the query stream: passthrough / top-1 /
    NULL, one row per document."""
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(_CURIE_SCHEMA)
    from outbreak_kg_ray.stages.maputil import map_stage

    return map_stage(
        ground_queries_dataset(sf_dir), _CurieStage, batch_size=1024,
    )


def ambiguous_groundings(sf_dir: str):
    """Audit view: queries whose surface grounds to MORE than one
    candidate, with the winner — demonstrates the tiebreak the
    reference gets from Gilda's scorer (e.g. 'Marburg' →
    MESH:D008379 over MESH:D029044)."""
    import pyarrow.compute as pc

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(
            {"query": pa.string(), "n_candidates": pa.int64(),
             "best_curie": pa.string()}
        )

    scored = scored_groundings(sf_dir)

    def per_query(t: pa.Table) -> pa.Table:
        # batch-local partial: (query, candidate-count, rank-1 curie)
        # per qid — exact because one qid's candidates never split
        # across batches (they are emitted by one _ScoredGroundStage
        # call from one input row).
        if t.num_rows == 0:
            return pa.table(
                {"query": pa.array([], pa.string()),
                 "n_candidates": pa.array([], pa.int64()),
                 "best_curie": pa.array([], pa.string())}
            )
        best = t.filter(pc.equal(t.column("rank"), 1))
        counts: dict[int, int] = {}
        for qid in t.column("qid").to_pylist():
            counts[qid] = counts.get(qid, 0) + 1
        qs, ns_, ids, qids = (
            best.column("query").to_pylist(),
            best.column("ns").to_pylist(),
            best.column("id").to_pylist(),
            best.column("qid").to_pylist(),
        )
        rows = {
            (q, counts[qid], f"{n}:{i}")
            for q, n, i, qid in zip(qs, ns_, ids, qids)
            if counts[qid] > 1
        }
        srt = sorted(rows)
        return pa.table(
            {"query": pa.array([r[0] for r in srt], pa.string()),
             "n_candidates": pa.array([r[1] for r in srt], pa.int64()),
             "best_curie": pa.array([r[2] for r in srt], pa.string())}
        )

    # distinct over the tiny (≤ pool-size) per-batch partials
    out = scored.map_batches(per_query, batch_format="pyarrow")
    return out.groupby(["query", "n_candidates", "best_curie"]).count().drop_columns(["count()"])
