"""KG assembly pipelines — one Dataset pipeline per node/edge table,
plus global canonicalization.

Each builder mirrors one reference ``assemble_*`` function
(kg/build.py:409-416) re-expressed Ray-Data-first: broadcast dicts
replace row-at-a-time pandas filters, per-batch combining replaces
global ``set()`` accumulation, and the Neo4j importer's duplicate
suppression (kg/Dockerfile ``--skip-duplicate-nodes``) becomes an
explicit ``groupby(curie)`` merge — the one deliberate all-to-all
shuffle in the graph materialization.

Column conventions (SQL-friendly; Neo4j-style headers are applied
only by the golden TSV writer): nodes ``curie, name, labels[,
timestamp]``; edges ``start_id, rel_type, end_id[, count,
years_data]``.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..config import KG_EXCLUDE_NAMES, LOCATION_MESH_MAPPING
from ..fixtures import lexicon as lex
from ..sources import tables as tbl
from ..sources.pages import pages_dataset
from ..stages.cooccur import cooccurrence_counts
from ..stages.extract import extract_docs
from ..stages.ner import mentions_dataset


def docs_dataset(sf_dir: str, **pages_kw):
    return extract_docs(pages_dataset(sf_dir, **pages_kw))


# ---------------------------------------------------------------------------
# fused product path — ONE NER pass feeds every mention-derived builder
# ---------------------------------------------------------------------------

_KG_PRODUCTS_VERSION = 3  # bump when fused-stage semantics change
# (v3: column-at-a-time block build — same row SET, different intra-
# block order; bumping invalidates v2 checkpoints so resumed runs are
# never a mix of the two orderings)


def kg_products_dataset(sf_dir: str, *, ckpt_root: str | None = None,
                        part_rows: int = 50_000, repeat: int = 1):
    """Tagged doc/term/pair product rows (stages/fused.py).

    With ``ckpt_root``, the stage is materialized per doc_id-range
    partition with lineage + metrics (state/checkpoint.py) and a
    re-run resumes from completed partitions — the scale path. Without
    it, the products are materialized in the object store (they are
    compact: grounded terms + combined pair partials, a small fraction
    of the raw pages)."""
    from ..stages.fused import kg_products

    if ckpt_root is None:
        return kg_products(docs_dataset(sf_dir, repeat=repeat)).materialize()

    from ..state import Checkpointer, doc_range_partitions

    ckpt = Checkpointer(ckpt_root)
    parts = doc_range_partitions(
        f"{sf_dir}/documents.parquet", part_rows=part_rows
    )
    # Stage parameters are part of partition identity: resuming the
    # same ckpt_root with a different --repeat (or a changed fused
    # stage) must invalidate completed partitions, not silently mix
    # replica counts (ADVICE round 1). _KG_PRODUCTS_VERSION bumps on
    # any semantic change to the fused product stage.
    for p in parts:
        p["fingerprint"] += f":rep{repeat}:v{_KG_PRODUCTS_VERSION}"

    from ..stages.ner import default_concurrency

    # Downstream operator parallelism equals the block count entering
    # the fused synthesize→extract→NER chain; a range-filtered read
    # yields one block, so split it (see pages_dataset.split_blocks).
    n_blocks = default_concurrency()[1]

    def build(part):
        pgs = pages_dataset(
            sf_dir,
            doc_lo=part["lo"],
            doc_hi=part["hi"],
            repeat=repeat,
            split_blocks=n_blocks,
        )
        return kg_products(extract_docs(pgs))

    ckpt.partitioned_stage("kg_products", parts, build)
    return ckpt.read("kg_products", override_num_blocks=n_blocks)


def _kind_slice(products, kind: str, cols: list[str]):
    """Zero-copy filter+project of the tagged-union products table."""

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("kind"), kind)).select(cols)

    return products.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# dedup helper: local per-batch dedup (combiner) + global hash agg
# ---------------------------------------------------------------------------

def distinct(ds, cols: list[str]):
    """Exact row dedup on ``cols`` — the engine's replacement for the
    reference's ``sorted(list(set(...)))`` emission (T1/D1). Local
    per-batch dedup collapses most duplicates before the shuffle; the
    global pass is a hash aggregate on already-small partials."""
    from ray.data.aggregate import Count

    def local(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols).aggregate([])

    deduped = ds.map_batches(local, batch_format="pyarrow")
    out = deduped.groupby(cols).aggregate(Count(alias_name="_c"))
    return out.drop_columns(["_c"])


def _pa_distinct(t: pa.Table, cols: list[str]) -> pa.Table:
    """Driver-side exact dedup for the small static reference tables
    (ontology / WDI / geonames — broadcast-small-side data, computed
    once on the driver rather than as a distributed shuffle)."""
    return t.select(cols).group_by(cols).aggregate([])


# ---------------------------------------------------------------------------
# alert nodes + alert→entity mention edges (kg/build.py:159-186)
# ---------------------------------------------------------------------------

def alert_nodes(sf_dir: str, products=None, *, dedup: bool = True):
    """(promed:archive, archive, timestamp, 'alert') — J1 timestamp
    derived closed-form per batch (kg/build.py:165-170); no O(corpus)
    broadcast dict rides in the task closure (round-1 VERDICT #4)."""

    def to_nodes(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        return pa.table(
            {
                "curie": [f"promed:{d}" for d in doc_ids],
                "name": doc_ids,
                "timestamp": tbl.outbreak_dates_for_archives(doc_ids),
                "labels": ["alert"] * len(doc_ids),
            }
        )

    if products is not None:
        ids = _kind_slice(products, "doc", ["doc_id"])
    else:
        ids = docs_dataset(sf_dir).select_columns(["doc_id"])
    ds = ids.map_batches(to_nodes, batch_format="pyarrow")
    if not dedup:
        return ds  # canonical merge dedups globally; doc rows are unique
    return distinct(ds, ["curie", "name", "timestamp", "labels"])


def alert_mention_edges(sf_dir: str, products=None, *, dedup: bool = True):
    """(promed:archive, mentions, MESH:id) for typed, non-stoplisted
    grounded terms (kg/build.py:173-178)."""
    mesh_types = lex.MESH_TYPES  # broadcast dict (M13 lookup table)

    def to_edges(t: pa.Table) -> pa.Table:
        keep_type = pa.array(
            [
                mesh_types.get(i) in ("disease", "pathogen", "geoloc")
                for i in t.column("id").to_pylist()
            ]
        )
        not_excluded = pc.invert(
            pc.is_in(t.column("entry_name"), value_set=pa.array(sorted(KG_EXCLUDE_NAMES)))
        )
        is_mesh = pc.equal(t.column("db"), "MESH")
        t = t.filter(pc.and_(pc.and_(keep_type, not_excluded), is_mesh))
        doc_ids = t.column("doc_id").to_pylist()
        ids = t.column("id").to_pylist()
        return pa.table(
            {
                "start_id": [f"promed:{d}" for d in doc_ids],
                "rel_type": ["mentions"] * len(doc_ids),
                "end_id": [f"MESH:{i}" for i in ids],
            }
        )

    if products is not None:
        terms = _kind_slice(products, "term", ["doc_id", "db", "id", "entry_name"])
    else:
        terms = mentions_dataset(docs_dataset(sf_dir), mode="terms")
    edges = terms.map_batches(to_edges, batch_format="pyarrow")
    if not dedup:
        return edges  # per-doc term rows are already distinct (A1)
    return distinct(edges, ["start_id", "rel_type", "end_id"])


# ---------------------------------------------------------------------------
# outbreak nodes + alert→outbreak edges (kg/build.py:136-156)
# ---------------------------------------------------------------------------

def _archive_ids(sf_dir: str, products):
    """doc_id (archive) stream: the products doc slice when
    available (already materialized — no extra documents scan),
    else a pruned read."""
    if products is not None:
        return _kind_slice(products, "doc", ["doc_id"])
    from ..sources.io import read_parquet_clean

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def to_archives(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": [
                    tbl.archive_number(d)
                    for d in t.column("doc_id").to_pylist()
                ]
            }
        )

    return docs.map_batches(to_archives, batch_format="pyarrow")


def outbreak_nodes(sf_dir: str, products=None):
    """Distinct outbreak nodes. Derived closed-form from the archive
    stream (outbreak id is a function of the archive — synthesized
    catalog); collapses to the tiny outbreak id set via a distinct
    shuffle of per-batch-deduped (curie, name) partials — never a
    driver-side per-doc materialization."""

    def to_nodes(t: pa.Table) -> pa.Table:
        rows = set()
        for a in t.column("doc_id").to_pylist():
            ob = tbl.outbreak_id_for_archive(a)
            if ob is not None:
                rows.add(ob)
        obs = sorted(rows)
        return pa.table(
            {
                "curie": pa.array([f"outbreak:{i}" for i in obs], pa.string()),
                "name": pa.array([f"Outbreak {i:03d}" for i in obs], pa.string()),
                "labels": pa.array(["outbreak"] * len(obs), pa.string()),
            }
        )

    ds = _archive_ids(sf_dir, products).map_batches(
        to_nodes, batch_format="pyarrow"
    )
    return distinct(ds, ["curie", "name", "labels"])


def alert_outbreak_edges(sf_dir: str, products=None, *, dedup: bool = True):
    """(promed:archive, has_outbreak, outbreak:id) — one row per
    catalog entry, streamed from the archive ids (closed-form
    outbreak id). Rows are unique by construction (one catalog row
    per doc, archives unique), so callers that union into the
    canonical table pass ``dedup=False`` and skip the corpus-scale
    distinct shuffle; the standalone query keeps the reference's
    set-dedup semantics."""

    def to_edges(t: pa.Table) -> pa.Table:
        starts, ends = [], []
        for a in t.column("doc_id").to_pylist():
            ob = tbl.outbreak_id_for_archive(a)
            if ob is None:
                continue
            starts.append(f"promed:{a}")
            ends.append(f"outbreak:{ob}")
        return pa.table(
            {
                "start_id": pa.array(starts, pa.string()),
                "rel_type": pa.array(["has_outbreak"] * len(starts), pa.string()),
                "end_id": pa.array(ends, pa.string()),
            }
        )

    ds = _archive_ids(sf_dir, products).map_batches(
        to_edges, batch_format="pyarrow"
    )
    if not dedup:
        return ds
    return distinct(ds, ["start_id", "rel_type", "end_id"])


# ---------------------------------------------------------------------------
# co-occurrence (kg/build.py:52-94)
# ---------------------------------------------------------------------------

def _pair_sum_block(t: pa.Table) -> pa.Table:
    out = t.group_by(["start_id", "end_id"]).aggregate([("n", "sum")])
    return out.rename_columns(["start_id", "end_id", "n"])


# Auto combine-strategy switch (round-1 VERDICT #8): after the
# per-block combine, if the observed partial cardinality fits one
# block comfortably, a repartition(1) final combine beats a
# sort-shuffle barrier; past the threshold the distributed groupby
# path is used instead. The threshold is rows entering the final
# combine, not corpus rows.
SINGLE_BLOCK_COMBINE_ROWS = 200_000


import weakref

# cooccurrence counts memo keyed on the products Dataset: the edge
# and node builders both need the same counted pairs; computing the
# combine once per products materialization halves the headline
# pipeline's pair passes (canonical_edges + canonical_nodes writes).
_pair_counts_memo: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _auto_pair_counts(partials, *, memo_key=None):
    """(start_id, end_id, n) partials → (start_id, end_id, count),
    strategy chosen from the MEASURED combined-partial row count
    (cardinality is data-dependent — vocabulary², not corpus — so the
    decision must be observed, not caller-asserted)."""
    if memo_key is not None:
        try:
            cached = _pair_counts_memo.get(memo_key)
        except TypeError:
            cached = None
        if cached is not None:
            return cached
    combined = partials.map_batches(
        _pair_sum_block, batch_format="pyarrow", batch_size=None
    ).materialize()
    if combined.count() <= SINGLE_BLOCK_COMBINE_ROWS:
        counts = combined.repartition(1).map_batches(
            _pair_sum_block, batch_format="pyarrow", batch_size=None
        )
    else:
        from ray.data.aggregate import Sum

        counts = combined.groupby(["start_id", "end_id"]).aggregate(
            Sum("n", alias_name="n")
        )
    out = counts.map_batches(
        lambda t: t.select(["start_id", "end_id", "n"]).rename_columns(
            ["start_id", "end_id", "count"]
        ),
        batch_format="pyarrow",
    ).materialize()
    if memo_key is not None:
        try:
            _pair_counts_memo[memo_key] = out
        except TypeError:
            pass
    return out


def cooccurrence_edges(sf_dir: str, products=None):
    """(a_curie, occurs_with, b_curie, count) over interesting pairs.

    Fused-products path: pair partials are already batch-combined
    (≤1 row per pair per batch); the final combine strategy
    (single-block vs distributed groupby) is picked automatically
    from the observed partial cardinality (_auto_pair_counts)."""
    if products is not None:
        partials = _kind_slice(products, "pair", ["start_id", "end_id", "n"])
        counts = _auto_pair_counts(partials, memo_key=products)
    else:
        counts = cooccurrence_counts(docs_dataset(sf_dir))

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "start_id": t.column("start_id"),
                "rel_type": ["occurs_with"] * len(t),
                "end_id": t.column("end_id"),
                "count": t.column("count"),
            }
        )

    return counts.map_batches(shape, batch_format="pyarrow")


def cooccurrence_nodes(sf_dir: str, products=None, *, dedup: bool = True):
    """Typed endpoint nodes of interesting pairs (kg/build.py:74-83),
    type priority pathogen > geoloc > disease."""
    names, types = lex.MESH_NAMES, lex.MESH_TYPES

    def label(mesh_id: str) -> str:
        t = types.get(mesh_id)
        ntype = "pathogen" if t == "pathogen" else (
            "geoloc" if t == "geoloc" else "disease"
        )
        return ntype + ";entity"

    def endpoints(t: pa.Table) -> pa.Table:
        curies = set(t.column("start_id").to_pylist()) | set(
            t.column("end_id").to_pylist()
        )
        rows = sorted(curies)
        ids = [c.split(":", 1)[1] for c in rows]
        return pa.table(
            {
                "curie": rows,
                "name": [names[i] for i in ids],
                "labels": [label(i) for i in ids],
            }
        )

    ds = cooccurrence_edges(sf_dir, products).map_batches(
        endpoints, batch_format="pyarrow"
    )
    if not dedup:
        return ds  # canonical groupby(curie) merge dedups globally
    return distinct(ds, ["curie", "name", "labels"])


# ---------------------------------------------------------------------------
# MeSH hierarchy (kg/build.py:97-133) — from the ontology lookup table
# ---------------------------------------------------------------------------

def mesh_hierarchy_nodes_table() -> pa.Table:
    t = tbl.ontology_table()
    t = t.filter(
        pc.is_in(t.column("mesh_type"),
                 value_set=pa.array(["disease", "pathogen", "geoloc"]))
    )
    return pa.table(
        {
            "curie": [f"MESH:{i}" for i in t.column("mesh_id").to_pylist()],
            "name": t.column("name"),
            "labels": [
                f"{mt};entity" for mt in t.column("mesh_type").to_pylist()
            ],
        }
    )


def mesh_hierarchy_nodes():
    import ray.data as rd

    return rd.from_arrow(mesh_hierarchy_nodes_table())


def mesh_hierarchy_edges_table() -> pa.Table:
    """isa edges where parent passes the child's own type predicate
    (kg/build.py:114-124)."""
    types = lex.MESH_TYPES
    t = tbl.ontology_table()
    starts, ends = [], []
    for mid, mtype, parent in zip(
        t.column("mesh_id").to_pylist(),
        t.column("mesh_type").to_pylist(),
        t.column("parent_id").to_pylist(),
    ):
        if mtype not in ("disease", "pathogen", "geoloc") or parent is None:
            continue
        if types.get(parent) != mtype:
            continue
        starts.append(f"MESH:{mid}")
        ends.append(f"MESH:{parent}")
    return pa.table(
        {
            "start_id": starts,
            "rel_type": ["isa"] * len(starts),
            "end_id": ends,
        }
    )


def mesh_hierarchy_edges():
    import ray.data as rd

    return rd.from_arrow(mesh_hierarchy_edges_table())


# ---------------------------------------------------------------------------
# pathogen→disease xref mapping (kg/build.py:189-213)
# ---------------------------------------------------------------------------

def pathogen_disease_edges_table() -> pa.Table:
    ncbi, doid = lex.NCBITAXON_TO_MESH, lex.DOID_TO_MESH

    def xref(curie: str) -> str | None:
        ns, id_ = curie.split(":", 1)
        if ns == "ncbitaxon":
            return ncbi.get(id_)
        if ns == "doid":
            return doid.get(id_)
        return None

    t = tbl.pathogen_disease_rels_table()
    keep = pc.and_(
        pc.invert(pc.starts_with(t.column(":START_ID"), "umls")),
        pc.invert(pc.starts_with(t.column(":END_ID"), "umls")),
    )
    t = t.filter(keep)
    starts, ends = [], []
    for s, e in zip(t.column(":START_ID").to_pylist(),
                    t.column(":END_ID").to_pylist()):
        ms, me = xref(s), xref(e)
        if not ms or not me:
            continue
        starts.append(f"MESH:{ms}")
        ends.append(f"MESH:{me}")
    out = pa.table(
        {
            "start_id": starts,
            "rel_type": ["has_pathogen"] * len(starts),
            "end_id": ends,
        }
    )
    return _pa_distinct(out, ["start_id", "rel_type", "end_id"])


def pathogen_disease_edges():
    import ray.data as rd

    return rd.from_arrow(pathogen_disease_edges_table())


# ---------------------------------------------------------------------------
# disease→phenotype (kg/build.py:216-228)
# ---------------------------------------------------------------------------

def disease_phenotype_edges_table() -> pa.Table:
    t = tbl.disease_phenotype_rels_table()
    keep = pc.and_(
        pc.starts_with(t.column(":START_ID"), "mesh"),
        pc.starts_with(t.column(":END_ID"), "mesh"),
    )
    t = t.filter(keep)
    out = pa.table(
        {
            "start_id": pc.utf8_upper(t.column(":START_ID")),
            "rel_type": ["has_phenotype"] * len(t),
            "end_id": pc.utf8_upper(t.column(":END_ID")),
        }
    )
    return _pa_distinct(out, ["start_id", "rel_type", "end_id"])


def disease_phenotype_edges():
    import ray.data as rd

    return rd.from_arrow(disease_phenotype_edges_table())


# ---------------------------------------------------------------------------
# World-Bank indicators (kg/build.py:231-348)
# ---------------------------------------------------------------------------

def _hierarchy_name_to_curie() -> dict[str, str]:
    """name → curie over hierarchy (typed) nodes only — the J2/J3
    lookup side (mesh_hierarchy_nodes.tsv in the reference)."""
    return {
        name: f"MESH:{mid}"
        for mid, name, mtype, _p in lex.ONTOLOGY
        if mtype in ("disease", "pathogen", "geoloc")
    }


def _geoloc_names() -> set[str]:
    return {
        name for _m, name, mtype, _p in lex.ONTOLOGY if mtype == "geoloc"
    }


def _indicator_rows(t: pa.Table, kind: str, drop_codes: set[str]):
    """Shared wide→long processing; yields per-row
    (country_curie, series_code, series_name, {year: value})."""
    name_to_curie = _hierarchy_name_to_curie()
    geolocs = _geoloc_names()
    countries = t.column("Country Name").to_pylist()
    codes = t.column("Series Code").to_pylist()
    snames = t.column("Series Name").to_pylist()
    year_cols = [c for c in t.column_names
                 if c not in ("Country Name", "Series Code", "Series Name")]
    year_data = {c: t.column(c).to_pylist() for c in year_cols}
    for i, (country, code, sname) in enumerate(zip(countries, codes, snames)):
        if code in drop_codes:
            continue  # J6 series-code anti-filter (kg/build.py:243-248)
        mapped = LOCATION_MESH_MAPPING.get(country, country)  # M10
        if mapped not in geolocs:
            continue  # J2 inner join on geoloc name (kg/build.py:266-280)
        years = {}
        for c in year_cols:
            val = year_data[c][i]
            try:
                f = float(val)
            except (TypeError, ValueError):
                continue  # '..' cells (kg/build.py:292-295)
            years[c[:4]] = round(f, 3)
        yield name_to_curie[mapped], code, sname, years


def _indicator_drop(kind: str) -> set[str]:
    return {code for code, _n in lex.DEV_SERIES} if kind == "health" else set()


def indicator_edges_table(kind: str) -> pa.Table:
    """(country_curie, years_data_json, has_indicator, wdi:code)."""
    rows = list(
        _indicator_rows(tbl.indicator_wide_table(kind), kind, _indicator_drop(kind))
    )
    out = pa.table(
        {
            "start_id": [r[0] for r in rows],
            "years_data": [json.dumps(r[3]) for r in rows],
            "rel_type": ["has_indicator"] * len(rows),
            "end_id": [f"wdi:{r[1]}" for r in rows],
        }
    )
    return _pa_distinct(out, ["start_id", "years_data", "rel_type", "end_id"])


def indicator_edges(kind: str):
    import ray.data as rd

    return rd.from_arrow(indicator_edges_table(kind))


def indicator_nodes_table(kind: str) -> pa.Table:
    rows = list(
        _indicator_rows(tbl.indicator_wide_table(kind), kind, _indicator_drop(kind))
    )
    out = pa.table(
        {
            "curie": [f"wdi:{r[1]}" for r in rows],
            "name": [r[2] for r in rows],
            "labels": ["indicator"] * len(rows),
        }
    )
    return _pa_distinct(out, ["curie", "name", "labels"])


def indicator_nodes(kind: str):
    import ray.data as rd

    return rd.from_arrow(indicator_nodes_table(kind))


def indicator_year_values(kind: str):
    """Long-format (country_curie, series_code, year, value) — the
    oracle-friendly exploded view of the years_data pivot (M11)."""
    import ray.data as rd

    drop = (
        {code for code, _n in lex.DEV_SERIES} if kind == "health" else set()
    )

    def to_rows(t: pa.Table) -> pa.Table:
        out = {"country_curie": [], "series_code": [], "year": [], "value": []}
        for curie, code, _sname, years in _indicator_rows(t, kind, drop):
            for y, v in years.items():
                out["country_curie"].append(curie)
                out["series_code"].append(code)
                out["year"].append(y)
                out["value"].append(v)
        return pa.table(
            {
                "country_curie": pa.array(out["country_curie"], pa.string()),
                "series_code": pa.array(out["series_code"], pa.string()),
                "year": pa.array(out["year"], pa.string()),
                "value": pa.array(out["value"], pa.float64()),
            }
        )

    return rd.from_arrow(tbl.indicator_wide_table(kind)).map_batches(
        to_rows, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# geonames canonicalization (kg/build.py:351-407 / J4, D4)
# ---------------------------------------------------------------------------

def _ground_geoname(name: str, hierarchy_names: dict[str, str]) -> str | None:
    """Deterministic replacement for the reference's gilda grounding
    of location names (kg/build.py:384-407): WB-name mapping then
    case-insensitive exact match against hierarchy node names."""
    mapped = LOCATION_MESH_MAPPING.get(name, name)
    return hierarchy_names.get(mapped.lower())


def _hierarchy_names_ci() -> dict[str, str]:
    return {
        name.lower(): f"MESH:{mid}"
        for mid, name, mtype, _p in lex.ONTOLOGY
        if mtype in ("disease", "pathogen", "geoloc")
    }


def geoname_nodes_table() -> pa.Table:
    hnames = _hierarchy_names_ci()
    t = tbl.geoname_terms_table()
    curies, names = [], []
    for c, n in zip(t.column("curie").to_pylist(),
                    t.column("name").to_pylist()):
        if _ground_geoname(n, hnames):
            continue  # D4 suppression: MeSH-groundable geoname dropped
        curies.append(c)
        names.append(n)
    out = pa.table(
        {
            "curie": curies,
            "name": names,
            "labels": ["geoloc"] * len(curies),
        }
    )
    return _pa_distinct(out, ["curie", "name", "labels"])


def geoname_nodes():
    import ray.data as rd

    return rd.from_arrow(geoname_nodes_table())


def geoname_edges_table() -> pa.Table:
    """isa edges from kept geoname nodes to their parent — remapped to
    the MeSH curie when the parent grounds (kg/build.py:365-375)."""
    hnames = _hierarchy_names_ci()
    t = tbl.geoname_terms_table()
    starts, ends = [], []
    for c, n, pc_, pn in zip(
        t.column("curie").to_pylist(),
        t.column("name").to_pylist(),
        t.column("parent_curie").to_pylist(),
        t.column("parent_name").to_pylist(),
    ):
        if _ground_geoname(n, hnames):
            continue  # node suppressed → no edges from it
        if pc_ is None:
            continue
        mesh_parent = _ground_geoname(pn, hnames)
        starts.append(c)
        ends.append(mesh_parent if mesh_parent else pc_)
    out = pa.table(
        {
            "start_id": starts,
            "rel_type": ["isa"] * len(starts),
            "end_id": ends,
        }
    )
    return _pa_distinct(out, ["start_id", "rel_type", "end_id"])


def geoname_edges():
    import ray.data as rd

    return rd.from_arrow(geoname_edges_table())


# ---------------------------------------------------------------------------
# global canonicalization — replaces neo4j-admin import dedup (S14)
# ---------------------------------------------------------------------------

_NODE_SCHEMA = pa.schema(
    [
        ("curie", pa.string()),
        ("name", pa.string()),
        ("labels", pa.string()),
        ("timestamp", pa.string()),
    ]
)

_EDGE_SCHEMA = pa.schema(
    [
        ("start_id", pa.string()),
        ("rel_type", pa.string()),
        ("end_id", pa.string()),
        ("count", pa.int64()),
        ("years_data", pa.string()),
    ]
)


def _conform(ds, schema: pa.Schema):
    def fix(t: pa.Table) -> pa.Table:
        cols = {}
        for f in schema:
            if f.name in t.column_names:
                cols[f.name] = t.column(f.name).cast(f.type)
            else:
                cols[f.name] = pa.nulls(len(t), f.type)
        return pa.table(cols, schema=schema)

    return ds.map_batches(fix, batch_format="pyarrow")


def all_node_datasets(sf_dir: str, products=None) -> dict[str, "object"]:
    return {
        "alert": alert_nodes(sf_dir, products),
        "outbreak": outbreak_nodes(sf_dir, products),
        "cooccurrence": cooccurrence_nodes(sf_dir, products),
        "mesh_hierarchy": mesh_hierarchy_nodes(),
        "indicator_health": indicator_nodes("health"),
        "indicator_dev": indicator_nodes("dev"),
        "geoname": geoname_nodes(),
    }


def all_edge_datasets(sf_dir: str, products=None) -> dict[str, "object"]:
    return {
        "mentions": alert_mention_edges(sf_dir, products),
        "has_outbreak": alert_outbreak_edges(sf_dir, products),
        "occurs_with": cooccurrence_edges(sf_dir, products),
        "isa_mesh": mesh_hierarchy_edges(),
        "has_pathogen": pathogen_disease_edges(),
        "has_phenotype": disease_phenotype_edges(),
        "has_indicator_health": indicator_edges("health"),
        "has_indicator_dev": indicator_edges("dev"),
        "isa_geonames": geoname_edges(),
    }


def _conform_table(t: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = {}
    for f in schema:
        if f.name in t.column_names:
            cols[f.name] = t.column(f.name).cast(f.type)
        else:
            cols[f.name] = pa.nulls(len(t), f.type)
    return pa.table(cols, schema=schema)


def static_node_table() -> pa.Table:
    """Fixture-sized node tables (ontology / WDI / geonames)
    concatenated driver-side — one broadcast Arrow table instead of
    several Dataset branches in the canonical union. The outbreak
    catalog is NOT here: its synthesized analog is corpus-derived, so
    outbreak nodes stream through the distributed ``outbreak_nodes``
    distinct instead."""
    return pa.concat_tables(
        [
            _conform_table(t, _NODE_SCHEMA)
            for t in (
                mesh_hierarchy_nodes_table(),
                indicator_nodes_table("health"),
                indicator_nodes_table("dev"),
                geoname_nodes_table(),
            )
        ]
    )


def static_edge_table() -> pa.Table:
    """Fixture-sized edge tables; alert→outbreak edges are
    corpus-scale and stream separately (see canonical_edges)."""
    return pa.concat_tables(
        [
            _conform_table(t, _EDGE_SCHEMA)
            for t in (
                mesh_hierarchy_edges_table(),
                pathogen_disease_edges_table(),
                disease_phenotype_edges_table(),
                indicator_edges_table("health"),
                indicator_edges_table("dev"),
                geoname_edges_table(),
            )
        ]
    )


def _merge_nodes_block(t: pa.Table) -> pa.Table:
    """Associative per-block node merge: min name, ';'-label-set
    union, max non-null timestamp per curie. Applying it per block
    and then once to the coalesced partials is equivalent to the
    global merge (all three combiners are associative+commutative)."""
    merged: dict[str, list] = {}
    for curie, name, labels, ts in zip(
        t.column("curie").to_pylist(),
        t.column("name").to_pylist(),
        t.column("labels").to_pylist(),
        t.column("timestamp").to_pylist(),
    ):
        cur = merged.get(curie)
        if cur is None:
            merged[curie] = [
                name,
                set(labels.split(";")) if labels else set(),
                ts,
            ]
        else:
            if name is not None and (cur[0] is None or name < cur[0]):
                cur[0] = name
            if labels:
                cur[1].update(labels.split(";"))
            if ts is not None and (cur[2] is None or ts > cur[2]):
                cur[2] = ts
    curies = sorted(merged)
    return pa.table(
        {
            "curie": pa.array(curies, pa.string()),
            "name": pa.array([merged[c][0] for c in curies], pa.string()),
            "labels": pa.array(
                [";".join(sorted(merged[c][1])) for c in curies], pa.string()
            ),
            "timestamp": pa.array(
                [merged[c][2] for c in curies], pa.string()
            ),
        },
        schema=_NODE_SCHEMA,
    )


def canonical_nodes(sf_dir: str, products=None, *, ckpt_root: str | None = None):
    """Union of all node tables with cross-table merge: labels
    unioned, deterministic min-name / max-timestamp tie-breaks
    (documented deviation from the importer's first-file-wins).

    Shuffle-minimal shape: curie *namespaces are disjoint across
    builders* (promed: only from alerts, outbreak:/wdi:/geonames:
    only from their driver-side static tables) — the only cross-table
    collisions are MESH: curies between the co-occurrence endpoint
    nodes and the MeSH hierarchy table. So the groupby(curie) merge
    runs over that small MESH-space union only, and the big per-alert
    node stream passes straight through to the sink with no exchange
    (the reference's importer likewise dedups nodes, not alerts —
    alert curies are unique by construction)."""
    import ray.data as rd

    if products is None:
        products = kg_products_dataset(sf_dir, ckpt_root=ckpt_root)

    # -- MESH-space merge (small): cooccur endpoints ∪ hierarchy ------
    # Usually vocabulary-bounded (≤ lexicon size): per-block combine →
    # coalesce → final combine. The single-block-vs-distributed final
    # merge is chosen from the observed partial cardinality, same
    # policy as _auto_pair_counts (the node merge combiners are
    # associative, so a groupby(curie) per-group merge is equivalent).
    mesh_union = _conform(
        cooccurrence_nodes(sf_dir, products, dedup=False), _NODE_SCHEMA
    ).union(rd.from_arrow(_conform_table(mesh_hierarchy_nodes_table(), _NODE_SCHEMA)))
    merged_partials = mesh_union.map_batches(
        _merge_nodes_block, batch_format="pyarrow", batch_size=None
    ).materialize()
    if merged_partials.count() <= SINGLE_BLOCK_COMBINE_ROWS:
        merged_mesh = merged_partials.repartition(1).map_batches(
            _merge_nodes_block, batch_format="pyarrow", batch_size=None
        )
    else:
        merged_mesh = merged_partials.groupby("curie").map_groups(
            _merge_nodes_block, batch_format="pyarrow"
        )

    # -- disjoint-namespace tables: stream through, no exchange -------
    static_nonmesh = pa.concat_tables(
        [
            _conform_table(t, _NODE_SCHEMA)
            for t in (
                indicator_nodes_table("health"),
                indicator_nodes_table("dev"),
                geoname_nodes_table(),
            )
        ]
    )
    outbreaks = _conform(outbreak_nodes(sf_dir, products), _NODE_SCHEMA)
    alerts = _conform(alert_nodes(sf_dir, products, dedup=False), _NODE_SCHEMA)
    return (
        alerts.union(merged_mesh)
        .union(outbreaks)
        .union(rd.from_arrow(static_nonmesh))
    )


def canonical_edges(sf_dir: str, products=None, *, ckpt_root: str | None = None):
    """Union of all edge tables — each branch deduplicated at source,
    so no global shuffle is needed:

    - ``mentions``: per-doc distinct term rows (A1 inside the NER
      stage) map 1:1 to unique (promed:doc, mentions, MESH:id) rows;
    - ``occurs_with``: output of the pair-count groupby (unique keys);
    - static tables: driver-side ``_pa_distinct`` per builder.

    Branches emit disjoint ``rel_type`` values, so cross-branch
    duplicates are impossible — mirroring the reference, whose edge
    TSVs are per-table ``sorted(set(...))`` with no cross-table dedup
    (kg/build.py:91-94 et al.; the Neo4j importer only dedups nodes,
    ``--skip-duplicate-nodes``). Dropping the global dedup removes
    the single largest all-to-all exchange from the headline path."""
    import ray.data as rd

    if products is None:
        products = kg_products_dataset(sf_dir, ckpt_root=ckpt_root)
    parts = [
        _conform(
            alert_mention_edges(sf_dir, products, dedup=False), _EDGE_SCHEMA
        ),
        _conform(
            alert_outbreak_edges(sf_dir, products, dedup=False), _EDGE_SCHEMA
        ),
        _conform(cooccurrence_edges(sf_dir, products), _EDGE_SCHEMA),
        rd.from_arrow(static_edge_table()),
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.union(p)
    return unioned


# ---------------------------------------------------------------------------
# Incremental KG maintenance (round 4).  The reference rebuilds the
# whole KG per run (kg/build.py main); at 100 TB the economical shape
# is INCREMENTAL: the compact fused products (grounded terms + pair
# partials, stages/fused.py) are the checkpointed state — a new crawl
# batch only pays extract/NER for ITS pages, then every cross-doc
# combine re-runs over base ∪ delta products.  Equality with the full
# rebuild holds because each cross-doc combine is associative:
# occurs_with pair counts SUM, node merges are label-union /
# min-name / max-timestamp, and per-doc tables (alerts, mentions,
# has_outbreak) are disjoint across doc batches.  The ckpt_root path
# of kg_products_dataset already persists exactly these products per
# doc-range partition, so "base" below is what a prior run would have
# on disk.
# ---------------------------------------------------------------------------


def _doc_id_split(sf_dir: str) -> int | None:
    """Midpoint of the doc_id range, from Parquet row-group footer
    statistics only (no data read). None when stats are unusable or
    the corpus has fewer than 2 distinct ids."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(f"{sf_dir}/documents.parquet")
    lo = hi = None
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            if col.path_in_schema == "doc_id" and col.statistics is not None:
                s = col.statistics
                if s.has_min_max:
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
    if lo is None or hi is None or hi <= lo:
        return None
    return (lo + hi) // 2 + 1


def _split_products(sf_dir: str):
    """(base ∪ delta) fused products, each half materialized
    independently — the incremental-maintenance state shape."""
    from ..stages.fused import kg_products
    from ..stages.ner import default_concurrency

    k = _doc_id_split(sf_dir)
    if k is None:
        return None
    n_blocks = default_concurrency()[1]
    base = kg_products(
        docs_dataset(sf_dir, doc_hi=k, split_blocks=n_blocks)
    ).materialize()
    delta = kg_products(
        docs_dataset(sf_dir, doc_lo=k, split_blocks=n_blocks)
    ).materialize()
    return base.union(delta)


def canonical_edges_incremental(sf_dir: str):
    """Canonical edges via base-snapshot products + delta-batch
    products (oracle: identical to the full rebuild)."""
    products = _split_products(sf_dir)
    if products is None:
        return canonical_edges(sf_dir)
    return canonical_edges(sf_dir, products=products)


def canonical_nodes_incremental(sf_dir: str):
    """Canonical nodes via base + delta products (oracle: identical
    to the full rebuild — the node merges are associative)."""
    products = _split_products(sf_dir)
    if products is None:
        return canonical_nodes(sf_dir)
    return canonical_nodes(sf_dir, products=products)


def kg_partition_lineage(sf_dir: str):
    """The per-partition checkpoint lineage + metrics artifact as a
    first-class table (north_rule: "resumable from checkpoint with
    per-partition lineage + metrics"): builds the fused-products
    stage checkpointed into a scratch dir, RE-RUNS the stage against
    the same root, and reports per partition — id range, rows,
    whether wall-time metrics were recorded, and whether the second
    run RESUMED (meta untouched) rather than recomputed.  ``resumed``
    must be true for every partition; a recompute would overwrite
    ``completed_at``.

    Rows-only by design (wall-clock metrics are nondeterministic);
    the deterministic columns (partition, lo, hi, rows) are pinned by
    tests/test_checkpoint.py's fingerprints instead."""
    import json
    import os
    import tempfile

    root = tempfile.mkdtemp(prefix="kg_lineage_")
    ckpt_root = os.path.join(root, "ckpt")
    import pyarrow.parquet as pq_

    n_docs = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    part_rows = max(125, n_docs // 4)
    kg_products_dataset(sf_dir, ckpt_root=ckpt_root, part_rows=part_rows)

    meta_dir = os.path.join(ckpt_root, "kg_products", "meta")
    if not os.path.isdir(meta_dir):  # empty corpus: no partitions
        return pa.table(
            {
                "partition": pa.array([], pa.string()),
                "lo": pa.array([], pa.int64()),
                "hi": pa.array([], pa.int64()),
                "rows": pa.array([], pa.int64()),
                "has_metrics": pa.array([], pa.bool_()),
                "resumed": pa.array([], pa.bool_()),
            }
        )

    def read_metas() -> dict[str, dict]:
        out = {}
        for name in sorted(os.listdir(meta_dir)):
            with open(os.path.join(meta_dir, name)) as f:
                out[name] = json.load(f)
        return out

    first = read_metas()
    # second run against the same root must SKIP every partition
    kg_products_dataset(sf_dir, ckpt_root=ckpt_root, part_rows=part_rows)
    second = read_metas()

    parts, los, his, rows, metrics, resumed = [], [], [], [], [], []
    for name in sorted(first):
        m1, m2 = first[name], second[name]
        lin = m1.get("lineage", {})
        parts.append(str(m1["partition"]))
        los.append(int(lin.get("lo", 0)))
        hi = lin.get("hi")
        his.append(int(hi) if hi is not None else -1)
        rows.append(int(m1["rows"]))
        metrics.append(float(m1.get("wall_s", 0)) > 0.0)
        resumed.append(m1.get("completed_at") == m2.get("completed_at"))
    return pa.table(
        {
            "partition": pa.array(parts, pa.string()),
            "lo": pa.array(los, pa.int64()),
            "hi": pa.array(his, pa.int64()),
            "rows": pa.array(rows, pa.int64()),
            "has_metrics": pa.array(metrics, pa.bool_()),
            "resumed": pa.array(resumed, pa.bool_()),
        }
    )
