"""Context-extraction (process_eidos.py parity) and serving-query
pipeline tests."""

from __future__ import annotations

from outbreak_kg_ray.pipelines import contexts, serving
from outbreak_kg_ray.sources.pages import archive_number, date_str

SF = "/root/testdata/sf0.001"


def test_timex_contexts_find_published_dates(ray_session):
    df = contexts.timex_contexts(SF).to_pandas()
    # every synthetic page carries exactly one ISO datetime (header)
    assert len(df) == 500
    row = df[df.doc_id == archive_number(3)].iloc[0]
    assert row["text"] == date_str(3)
    assert row["interval_start"] == row["interval_end"] == row["text"]


def test_geoloc_contexts_typed_subset(ray_session):
    from outbreak_kg_ray.fixtures.lexicon import MESH_TYPES

    df = contexts.geoloc_contexts(SF).to_pandas()
    assert len(df) > 0
    assert all(MESH_TYPES[g] == "geoloc" for g in df["geo_id"].unique())


def test_geoloc_stats_counts_sum_to_contexts(ray_session):
    ctx = contexts.geoloc_contexts(SF).to_pandas()
    stats = contexts.geoloc_stats(SF).to_pandas()
    assert stats["count"].sum() == len(ctx)


def test_direct_relations_endpoints_in_query_set(ray_session):
    qs = set(serving.default_query_curies())
    df = serving.direct_relations(SF).to_pandas()
    assert set(df["start_id"]).issubset(qs)
    assert set(df["end_id"]).issubset(qs)


def test_comention_alerts_ranked(ray_session):
    df = serving.comention_alerts(SF).to_pandas()
    assert (df["n_entities"] >= 2).all()
    # ranked by entity count desc
    assert list(df["n_entities"]) == sorted(df["n_entities"], reverse=True)
    # entities string is sorted and matches the count
    for _, row in df.head(5).iterrows():
        ents = row["entities"].split(";")
        assert ents == sorted(ents)
        assert len(ents) == row["n_entities"]


def test_isa_closure_contains_parents_and_grandparents():
    import pyarrow as pa

    t = serving.isa_closure_table()
    pairs = set(
        zip(t.column("start_id").to_pylist(), t.column("end_id").to_pylist())
    )
    from outbreak_kg_ray.pipelines.kg import mesh_hierarchy_edges_table

    direct = mesh_hierarchy_edges_table()
    parent = dict(
        zip(direct.column("start_id").to_pylist(),
            direct.column("end_id").to_pylist())
    )
    assert all((s, e) in pairs for s, e in parent.items())
    # grandparent reachability
    for s, p in parent.items():
        if p in parent:
            assert (s, parent[p]) in pairs
    assert isinstance(t, pa.Table)


def test_facet_descendants_closure():
    from outbreak_kg_ray.pipelines import serving as sv

    # isa*0..: target itself plus strict descendants
    d = sv.facet_descendants("MESH:D007251")  # Influenza
    assert "MESH:D007251" in d and "MESH:D005585" in d  # Avian Influenza child
    g = sv.facet_descendants("MESH:D001104")  # Asia
    assert {"MESH:D001104", "MESH:D014744", "MESH:D007194",
            "MESH:D002681", "MESH:D007564"} <= g
    # symptom closure walks has_phenotype|isa: Cough <- Influenza <- Avian
    s = sv.facet_descendants("MESH:D003371", include_phenotype=True)
    assert "MESH:D007251" in s and "MESH:D005585" in s


def test_alerts_by_facet_uses_closure(ray_session):
    from outbreak_kg_ray.pipelines import serving as sv

    sf = "/root/testdata/sf0.001"
    df = sv.alerts_by_facet(sf, disease="Influenza").to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"alert_id", "timestamp", "disease_curie"}
    # the isa* closure must surface child-term mentions, not only exact
    assert "MESH:D005585" in set(df["disease_curie"])
    # unresolvable facet empties the query (reference get_curie -> [])
    empty = sv.alerts_by_facet(sf, disease="No Such Disease").to_pandas()
    assert len(empty) == 0


def test_alerts_by_facet_limit_deterministic(ray_session):
    from outbreak_kg_ray.pipelines import serving as sv

    sf = "/root/testdata/sf0.001"
    a = sv.alerts_by_facet(sf, geolocation="Asia", limit=5).to_pandas()
    b = sv.alerts_by_facet(sf, geolocation="Asia", limit=5).to_pandas()
    assert a.values.tolist() == b.values.tolist()
    assert len(a) == 5


def test_prefix_index_search(ray_session):
    from outbreak_kg_ray.pipelines import serving as sv

    idx = sv.PrefixIndex([
        ("cholera", "MESH:D002771", "disease"),
        ("china", "MESH:D002681", "geoloc"),
        ("chile", "geonames:3895114", "geoloc"),
        ("congo", "MESH:D003092", "geoloc"),
        ("congo_1", "geonames:203312", "geoloc"),
    ])
    # sorted key order, case-insensitive prefix
    assert [r[0] for r in idx.search("CH")] == ["chile", "china", "cholera"]
    # top_n cap (reference cap: 100; here exercised with 2)
    assert [r[0] for r in idx.search("c", top_n=2)] == ["chile", "china"]
    # collision suffixes order after the base key
    assert [r[0] for r in idx.search("congo")] == ["congo", "congo_1"]
    assert idx.search("zzz") == []


def test_prefix_index_from_pipeline(ray_session):
    from outbreak_kg_ray.pipelines import serving as sv

    idx = sv.build_prefix_index("/root/testdata/sf0.001")
    hits = idx.search("chol")
    assert hits and hits[0][1] == "MESH:D002771"  # Cholera
    assert len(idx.search("", top_n=100)) == 100  # global cap


def test_text_relations_composed(ray_session):
    from outbreak_kg_ray.pipelines import serving as sv

    tr = sv.text_relations("/root/testdata/sf0.001")
    curies = {a["curie"] for a in tr["annotations"]}
    assert "MESH:D002771" in curies and "MESH:D014735" in curies
    types = {a["type"] for a in tr["annotations"]}
    assert types <= {"disease", "pathogen", "geoloc", "other"}
    direct = tr["direct"].to_pandas()
    assert set(direct["start_id"]) | set(direct["end_id"]) <= curies
    alerts = tr["alerts"].to_pandas()
    assert (alerts["n_entities"] >= 2).all()
    assert tr["realism_score"]["classification"] in ("high", "medium", "low")
    # scores only over typed pairs, both sides in the annotation set
    for a, b, _s in tr["realism_score"]["scores"]:
        assert f"MESH:{a}" in curies and f"MESH:{b}" in curies


def test_indicators_by_country(ray_session, sf_dir):
    """/v1/indicators analog: two-direction isa closure + CONTAINS
    filter (kg/client.py:76-114)."""
    from outbreak_kg_ray.pipelines import serving

    df = serving.indicators_by_country(
        sf_dir, geolocation="Asia", indicator_filter="total"
    ).to_pandas()
    assert len(df) > 0
    assert all("total" in n for n in df["indicator_name"])
    # every country is in Asia's two-direction closure
    members = serving.facet_descendants(
        serving.resolve_curie("Asia")
    ) | serving.facet_ancestors(serving.resolve_curie("Asia"))
    assert set(df["country_curie"]) <= members
    # unresolvable geolocation empties the result, like the reference
    empty = serving.indicators_by_country(
        sf_dir, geolocation="Atlantis-nowhere"
    ).to_pandas()
    assert len(empty) == 0


def test_trending_terms_daily_multiday(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import serving

    # published_ts = 2024-01-01 + doc_id minutes → doc 1440 rolls into
    # day 2; 1500 docs exercise a genuine multi-day window
    n = 1500
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["filler text"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([11] * n, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = serving.trending_terms_daily(str(tmp_path)).to_pandas()
    days = sorted(out["day"].unique())
    assert len(days) == 2
    for d in days:
        g = out[out["day"] == d]
        assert 1 <= len(g) <= 3
        ns = list(g.sort_values(["n", "term"],
                                ascending=[False, True])["n"])
        assert ns == sorted(ns, reverse=True)


def test_alert_hourly_timeline_moving_average(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import serving

    # 120 docs at one per minute → hours 0 and 1 get 60 each; the
    # trailing window at hour 1 averages both
    n = 120
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        serving.alert_hourly_timeline(str(tmp_path))
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    assert list(out["n_alerts"]) == [60, 60]
    assert list(out["moving_avg"]) == [60.0, 60.0]


def test_mesh_subtree_sizes_parent_counts(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines import serving

    rows = {
        r["curie"]: r["n_descendants"]
        for r in serving.mesh_subtree_sizes(sf_dir).take_all()
    }
    closure = serving.isa_closure_table()
    import collections

    want = collections.Counter(closure.column("end_id").to_pylist())
    assert rows == dict(want)
    # roots accumulate every transitive descendant, so the max count
    # exceeds any single node's direct child count
    assert max(rows.values()) >= 2


def test_entity_timeline_spans(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.serving import entity_timeline

    out = entity_timeline(sf_dir).to_pandas()
    assert (out["first_seen"] <= out["last_seen"]).all()
    assert (out["n_alerts"] > 0).all()
    assert out["entry_name"].is_unique
    # entities seen once have a zero-width span
    once = out[out["n_alerts"] == 1]
    if len(once):
        assert (once["first_seen"] == once["last_seen"]).all()


def test_top_cooccurring_partners(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.serving import top_cooccurring_partners

    out = top_cooccurring_partners(sf_dir).to_pandas()
    assert (out["rank"] <= 3).all() and (out["rank"] >= 1).all()
    # within an entity, counts are non-increasing with rank
    for _, g in out.groupby("entity"):
        g = g.sort_values("rank")
        assert g["n"].is_monotonic_decreasing or (
            g["n"].diff().dropna() <= 0
        ).all()
    # symmetry: a top partner edge exists in both directions' pools
    assert (out["entity"] != out["partner"]).all()


# ---------------------------------------------------------------------------
# round 4: Eidos TimeNorm analog (timex normalization)
# ---------------------------------------------------------------------------


def test_normalize_timex_calendar_edges():
    import datetime as dt

    from outbreak_kg_ray.pipelines.contexts import TIMEX_POOL, normalize_timex

    idx = {p: i for i, (p, *_r) in enumerate(TIMEX_POOL)}
    jan1 = dt.datetime(2024, 1, 1, 0, 0, 0)  # a Monday
    # "last month" across a year boundary
    assert normalize_timex(jan1, idx["last month"]) == (
        "2023-12-01 00:00:00", "2023-12-31 23:59:59")
    # "last week" from a Monday = the previous full ISO week
    assert normalize_timex(jan1, idx["last week"]) == (
        "2023-12-25 00:00:00", "2023-12-31 23:59:59")
    # "yesterday" across the year boundary
    assert normalize_timex(jan1, idx["yesterday"]) == (
        "2023-12-31 00:00:00", "2023-12-31 23:59:59")
    # leap-February month window
    feb = dt.datetime(2024, 2, 15, 12, 0, 0)
    assert normalize_timex(feb, idx["this month"]) == (
        "2024-02-01 00:00:00", "2024-02-29 23:59:59")
    # hedges stay unresolved (Eidos' behavior for vague expressions)
    assert normalize_timex(jan1, idx["recently"]) == (None, None)
    # absolute month-year ignores the anchor entirely
    assert normalize_timex(feb, idx["in March 2020"]) == (
        "2020-03-01 00:00:00", "2020-03-31 23:59:59")


def test_timex_normalized_dataset(ray_session):
    from outbreak_kg_ray.pipelines.contexts import timex_normalized

    rows = timex_normalized("/root/testdata/sf0.001").take_all()
    assert len(rows) == 500
    for r in rows:
        if r["interval_start"] is not None:
            assert r["interval_start"] <= r["interval_end"]


def test_parse_case_count_rules():
    from outbreak_kg_ray.pipelines.contexts import (
        CASE_PHRASES,
        parse_case_count,
    )

    assert parse_case_count("about 1,200 cases in total") == ("cases", 1200)
    assert parse_case_count("no new cases this week") == ("cases", 0)
    assert parse_case_count("one death was reported") == ("deaths", 1)
    assert parse_case_count("several cases under investigation") == (
        "cases", None)
    # digits always win over word-numbers
    assert parse_case_count("no fewer than 40 cases") == ("cases", 40)
    # every pool phrase classifies to a kind
    assert all(parse_case_count(p)[0] is not None for p in CASE_PHRASES)


def test_case_count_edges_dataset(ray_session):
    from outbreak_kg_ray.pipelines.contexts import case_count_edges

    rows = case_count_edges("/root/testdata/sf0.001").take_all()
    assert rows and all(r["rel_type"] == "has_case_count" for r in rows)
    assert all(r["count"] is not None and r["count"] >= 0 for r in rows)
    assert all(r["end_id"].startswith("outbreak_kind:") for r in rows)
