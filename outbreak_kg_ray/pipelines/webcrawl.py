"""Crawl-frontier URL hygiene — the web-scale front end of a pages
pipeline: canonicalize noisy URLs, collapse crawl duplicates by
canonical URL, and roll up per-host crawl stats.

Reference semantics: the reference tolerates duplicate alerts keyed by
archive number (promed_ner.py:113-140, survey D5 — "dedup pages on
url/doc_id, first wins"); this module is that operator generalized to
real crawl URLs (scheme/host case noise, tracking params, fragments,
trailing slashes) the way a Common-Crawl-style ingest needs it.

There is no URL column in the driver testdata documents table, so the
noisy raw URL is synthesized deterministically per doc (closed-form in
``doc_id``/``source``/``lang`` — formulas mirrored in the DuckDB
oracle SQL, same pattern as ``sources/pages.py``):

- scheme   = 'HTTPS' if doc_id%2==0 else 'https'        (case noise)
- host     = upper(source) if doc_id%3==0 else source, + '.example.com'
- path     = '/item-{doc_id%56}'
- slash    = '/' appended when doc_id%11==0
- tracking = '?utm_source=feed&utm_campaign=c{doc_id%5}' when doc_id%2==0
- real prm = '[?&]page={doc_id%4}' when doc_id%5==0      (must survive)
- fragment = '#sec{doc_id%7}' when doc_id%3==0

Because canonicalization strips exactly the noise components, the
canonical identity collapses to ``(doc_id mod 280, slash-kept)``
(source is ``src{doc_id%20}`` in the driver testdata; lcm(20,56)=280;
the slash survives only when a kept query follows it, i.e.
doc_id%55==0): docs 280 apart yield the SAME canonical URL from
DIFFERENT raw bytes — host case and fragments differ — a genuine
~1.8× duplicate population at the 500-doc test scale.

Canonicalization chain (all RE2, vectorized Arrow kernels — the same
regexes run in the DuckDB oracle):

1. strip fragment               ``#.*$`` → ''
2. drop tracking params         ``(utm_[a-z]+|ref)=[^&]*&?`` → ''
3. tidy dangling separator      ``[?&]$`` → ''
4. strip trailing slash         ``([^/])/$`` → ``\1``
5. lowercase scheme://host      (split at the authority boundary)

Scale shape: synthesis + canonicalization are pure streaming
``map_batches`` (zero shuffle); the dedup is ONE groupby keyed on the
canonical URL carrying (url, doc_id) pairs only; host stats collapse
to (host, canonical) pairs before the distinct count so the exchange
is bounded by distinct canonical URLs, never the raw crawl stream.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from outbreak_kg_ray.functions.rounding import pa_round_half_away
from outbreak_kg_ray.sources.io import (
    empty_dataset,
    parquet_rows,
    read_parquet_clean,
)

_TRACKING_RE = r"(utm_[a-z]+|ref)=[^&]*&?"
_AUTHORITY_RE = r"^(?P<auth>[^/]+//[^/]+)(?P<rest>.*)$"


def _mod(col, m: int):
    # pyarrow has no modulo kernel: d - (d // m) * m (ints are
    # non-negative here; pc.divide truncates integer division)
    ms = pa.scalar(m, pa.int64())
    return pc.subtract(col, pc.multiply(pc.divide(col, ms), ms))


def _eq0(col, m: int):
    return pc.equal(_mod(col, m), pa.scalar(0, pa.int64()))


def synthesize_raw_urls(t: pa.Table) -> pa.Table:
    """documents batch → (doc_id, n_chars, url) with deterministic
    crawl noise. Vectorized: every piece is an Arrow kernel over the
    whole batch (if_else over mod masks + element-wise join)."""
    d = t.column("doc_id")
    s = lambda x: pa.scalar(x, pa.string())  # noqa: E731

    def txt(col) -> pa.Array:
        return pc.cast(col, pa.string())

    scheme = pc.if_else(_eq0(d, 2), s("HTTPS"), s("https"))
    host_src = pc.if_else(
        _eq0(d, 3),
        pc.utf8_upper(t.column("source")),
        t.column("source"),
    )
    path = pc.binary_join_element_wise(
        s("/item-"), txt(_mod(d, 56)), s("")
    )
    slash = pc.if_else(_eq0(d, 11), s("/"), s(""))
    tracking = pc.if_else(
        _eq0(d, 2),
        pc.binary_join_element_wise(
            s("?utm_source=feed&utm_campaign=c"), txt(_mod(d, 5)), s("")
        ),
        s(""),
    )
    page = pc.if_else(
        _eq0(d, 5),
        pc.binary_join_element_wise(
            pc.if_else(_eq0(d, 2), s("&"), s("?")),
            s("page="),
            txt(_mod(d, 4)),
            s(""),
        ),
        s(""),
    )
    frag = pc.if_else(
        _eq0(d, 3),
        pc.binary_join_element_wise(s("#sec"), txt(_mod(d, 7)), s("")),
        s(""),
    )
    url = pc.binary_join_element_wise(
        scheme, s("://"), host_src, s(".example.com"),
        path, slash, tracking, page, frag, s(""),
    )
    return pa.table(
        {"doc_id": d, "n_chars": t.column("n_chars"), "url": url}
    )


def canonicalize_url_column(url: pa.ChunkedArray | pa.Array) -> pa.Array:
    """The 5-step canonicalization chain over a url column (RE2
    kernels; byte-for-byte the DuckDB oracle's regexp_replace chain)."""
    u = pc.replace_substring_regex(url, pattern=r"#.*$", replacement="")
    u = pc.replace_substring_regex(u, pattern=_TRACKING_RE, replacement="")
    u = pc.replace_substring_regex(u, pattern=r"[?&]$", replacement="")
    u = pc.replace_substring_regex(
        u, pattern=r"([^/])/$", replacement="\\1"
    )
    parts = pc.extract_regex(u, _AUTHORITY_RE)
    return pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(parts, "auth")),
        pc.struct_field(parts, "rest"),
        "",
    )


def crawl_pages(sf_dir: str):
    """→ (doc_id, n_chars, url, canon_url) Dataset — pure streaming,
    column-pruned read, zero shuffle."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang", "n_chars"],
    )

    def stage(t: pa.Table) -> pa.Table:
        raw = synthesize_raw_urls(t)
        return raw.append_column(
            "canon_url", canonicalize_url_column(raw.column("url"))
        )

    return ds.map_batches(stage, batch_format="pyarrow")


def url_dedup(sf_dir: str):
    """Crawl dedup by canonical URL: one row per canonical URL with
    the kept (min) doc_id and the duplicate count — survey D5
    ("first wins" made deterministic as min-key, per T5's documented
    tie-break policy). Exchange carries (canon_url, doc_id) pairs."""
    from ray.data.aggregate import Count, Min

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset({
            "canon_url": pa.string(), "keep_doc_id": pa.int64(),
            "n_docs": pa.int64(),
        })
    pairs = crawl_pages(sf_dir).select_columns(["canon_url", "doc_id"])
    agg = pairs.groupby("canon_url").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_docs"),
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "canon_url": t.column("canon_url"),
                "keep_doc_id": t.column("keep_doc_id").cast(pa.int64()),
                "n_docs": t.column("n_docs").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def host_stats(sf_dir: str):
    """Per-host crawl rollup: raw page count, distinct canonical
    pages, mean raw chars. The distinct count collapses to
    (host, canon_url) pairs FIRST (two-level distinct — the exchange
    is bounded by distinct canonical URLs, not raw pages); the count
    and char sum ride a host-keyed combining aggregate."""
    from ray.data.aggregate import Count, Sum

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset({
            "host": pa.string(), "n_docs": pa.int64(),
            "n_pages": pa.int64(), "avg_chars": pa.float64(),
        })
    pages = crawl_pages(sf_dir)

    def with_host(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            t.column("canon_url"), r"^[^/]+//(?P<host>[^/]+)"
        )
        return pa.table(
            {
                "host": pc.struct_field(m, "host"),
                "canon_url": t.column("canon_url"),
                "n_chars": t.column("n_chars"),
            }
        )

    hosted = pages.map_batches(with_host, batch_format="pyarrow")

    per_host = hosted.groupby("host").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="_chars"),
    )
    distinct_pages = (
        hosted.select_columns(["host", "canon_url"])
        .groupby(["host", "canon_url"])
        .aggregate(Count(alias_name="_n"))
        .groupby("host")
        .aggregate(Count(alias_name="n_pages"))
    )
    joined = per_host.join(
        distinct_pages, "inner", num_partitions=4, on=("host",)
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "host" not in t.column_names:
            return pa.schema(
                [("host", pa.string()), ("n_docs", pa.int64()),
                 ("n_pages", pa.int64()), ("avg_chars", pa.float64())]
            ).empty_table()
        avg = pc.divide(
            pc.cast(t.column("_chars"), pa.float64()),
            pc.cast(t.column("n_docs"), pa.float64()),
        )
        return pa.table(
            {
                "host": t.column("host"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "n_pages": t.column("n_pages").cast(pa.int64()),
                "avg_chars": pa_round_half_away(avg, 6),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _host_rank_cut(t: pa.Table, cap: int) -> pa.Table:
    """Vectorized per-host rank cut: sort (host asc, n_chars desc,
    doc_id asc), rank within host by run boundaries, keep rank ≤ cap.
    Zero per-row Python — Arrow multi-key sort + numpy run-length."""
    import numpy as np

    if len(t) == 0:
        return t.append_column("rank", pa.array([], pa.int64()))
    s = t.sort_by(
        [("host", "ascending"), ("n_chars", "descending"),
         ("doc_id", "ascending")]
    ).combine_chunks()
    host = s.column("host").to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(
        np.concatenate(([True], host[1:] != host[:-1]))
    )
    counts = np.diff(np.append(starts, len(host)))
    rank = np.arange(len(host)) - np.repeat(starts, counts) + 1
    s = s.append_column("rank", pa.array(rank, pa.int64()))
    return s.filter(pa.array(rank <= cap))


def host_cap_sample(sf_dir: str, cap: int = 5):
    """Per-host document quota (the FineWeb/RefinedWeb-style
    anti-SEO-domination sampler a crawl corpus applies before
    training): keep at most ``cap`` docs per host, preferring the
    longest (``n_chars`` desc, ``doc_id`` asc tie-break), with the
    kept rank — the crawl-side twin of D5's first-wins dedup
    (promed_ner.py:113-140) generalized to a quality-ordered quota.

    Scale shape: a batch-local per-host top-``cap`` combiner cuts
    each block to ≤ cap rows per host PRESENT IN THE BLOCK before the
    single host-keyed groupby, so the exchange moves at most
    cap × (hosts per block) rows — never the raw crawl stream; the
    per-group finisher re-runs the same vectorized rank cut."""
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset({
            "host": pa.string(), "doc_id": pa.int64(),
            "n_chars": pa.int64(), "rank": pa.int64(),
        })
    pages = crawl_pages(sf_dir)

    def combiner(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            t.column("canon_url"), r"^[^/]+//(?P<host>[^/]+)"
        )
        hosted = pa.table(
            {
                "host": pc.struct_field(m, "host"),
                "doc_id": t.column("doc_id"),
                "n_chars": t.column("n_chars"),
            }
        )
        return _host_rank_cut(hosted, cap).drop_columns(["rank"])

    def finish(g: pa.Table) -> pa.Table:
        return _host_rank_cut(g, cap)

    return (
        pages.map_batches(combiner, batch_format="pyarrow")
        .groupby("host")
        .map_groups(finish, batch_format="pyarrow")
    )


DEFAULT_BLOCKED_PREFIXES = (
    # a blocked host and a blocked path subtree — the two rule shapes
    # robots/deny lists actually use
    "https://src3.example.com/",
    "https://src7.example.com/item-1",
)


def url_blocklist_filter(sf_dir: str, prefixes=DEFAULT_BLOCKED_PREFIXES):
    """Crawl deny-list filtering: drop pages whose CANONICAL URL
    starts with any blocked prefix (rules match canonical form, so
    case/tracking noise can't dodge them) — the robots/deny-list
    gate of a crawl front end.

    Pure streaming: the rule set is bounded (deny lists are human-
    curated), matching is an OR of vectorized ``starts_with`` kernels
    per batch, zero shuffle.  → kept (doc_id, canon_url)."""
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset({
            "doc_id": pa.int64(), "canon_url": pa.string(),
        })
    pages = crawl_pages(sf_dir)

    def gate(t: pa.Table) -> pa.Table:
        canon = t.column("canon_url")
        blocked = None
        for p in prefixes:
            m = pc.starts_with(canon, pattern=p)
            blocked = m if blocked is None else pc.or_(blocked, m)
        keep = pc.invert(blocked) if blocked is not None else None
        out = pa.table(
            {"doc_id": t.column("doc_id"), "canon_url": canon}
        )
        return out.filter(keep) if keep is not None else out

    return pages.map_batches(gate, batch_format="pyarrow")


def host_lang_entropy(sf_dir: str):
    """Per-host language-mix diagnostic: Shannon entropy (nats) of
    the language distribution of each canonical host's documents →
    (host, n_docs, n_langs, lang_entropy).  A multilingual webtext
    ingest uses this to spot hosts whose language mix drifted
    (scraper regressions, MT spam farms — CCNet §3.2 partitions by
    exactly this signal).

    The host comes from the SAME canonicalization chain as the rest
    of the crawl family (lowercased authority of the canonical URL),
    so the three host rollups (``host_stats``, ``host_cap_sample``,
    this) agree on host identity by construction.

    Scale shape: (host, lang) count pairs are the ONLY exchange —
    hosts × langs bounded, never pages; the entropy reduction is a
    vectorized per-group pass over that bounded rollup (numpy
    segment sums on the host-sorted table, zero per-group Python).
    """
    import numpy as np
    from ray.data.aggregate import Count

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset({
            "host": pa.string(), "n_docs": pa.int64(),
            "n_langs": pa.int64(), "lang_entropy": pa.float64(),
        })
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang"],
    )

    def with_host(t: pa.Table) -> pa.Table:
        raw = synthesize_raw_urls(
            t.append_column(
                "n_chars", pa.nulls(len(t), pa.int64())
            )
        )
        canon = canonicalize_url_column(raw.column("url"))
        m = pc.extract_regex(canon, r"^[^/]+//(?P<host>[^/]+)")
        return pa.table(
            {"host": pc.struct_field(m, "host"),
             "lang": t.column("lang")}
        )

    hl = (
        ds.map_batches(with_host, batch_format="pyarrow")
        .groupby(["host", "lang"])
        .aggregate(Count(alias_name="c"))
    )

    def entropy(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "host" not in t.column_names:
            return pa.schema(
                [("host", pa.string()), ("n_docs", pa.int64()),
                 ("n_langs", pa.int64()),
                 ("lang_entropy", pa.float64())]
            ).empty_table()
        st = t.sort_by([("host", "ascending")])
        hosts = np.asarray(st.column("host").to_pylist(), dtype=object)
        c = st.column("c").to_numpy().astype(np.float64)
        # run boundaries of the host-sorted rollup
        starts = np.flatnonzero(
            np.concatenate(([True], hosts[1:] != hosts[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(hosts)]))
        n = np.add.reduceat(c, starts)
        plogp = np.add.reduceat(c * np.log(c), starts)
        # H = ln(n) - Σ c·ln(c) / n  (grouped, all vectorized)
        ent = np.log(n) - plogp / n
        return pa.table(
            {"host": pa.array(hosts[starts].tolist(), pa.string()),
             "n_docs": pa.array(n.astype(np.int64)),
             "n_langs": pa.array((ends - starts).astype(np.int64)),
             "lang_entropy": pa_round_half_away(
                 pa.array(ent, pa.float64()), 6
             )}
        )

    # the rollup is hosts×langs-bounded: finish in one map over the
    # repartitioned aggregate (each host's rows stay in one group
    # because the aggregate output is hash-partitioned by key prefix)
    return hl.repartition(1).map_batches(
        entropy, batch_format="pyarrow", batch_size=None
    )
