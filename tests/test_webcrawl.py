"""URL canonicalization + crawl dedup (pipelines/webcrawl.py)."""

import pyarrow as pa

from outbreak_kg_ray.pipelines.webcrawl import canonicalize_url_column


def _canon(u: str) -> str:
    return canonicalize_url_column(pa.array([u], pa.string()))[0].as_py()


def test_canonicalize_strips_fragment_and_tracking():
    assert (
        _canon("https://a.com/x?utm_source=feed&utm_campaign=c1#sec2")
        == "https://a.com/x"
    )
    # a real param survives tracking removal, in either position
    assert (
        _canon("https://a.com/x?utm_source=f&page=2")
        == "https://a.com/x?page=2"
    )
    assert (
        _canon("https://a.com/x?page=2&ref=abc")
        == "https://a.com/x?page=2"
    )


def test_canonicalize_lowercases_authority_only():
    assert (
        _canon("HTTPS://WWW.Example.COM/Path/To?Q=UPPER")
        == "https://www.example.com/Path/To?Q=UPPER"
    )


def test_canonicalize_trailing_slash():
    assert _canon("https://a.com/x/") == "https://a.com/x"
    assert _canon("https://a.com/") == "https://a.com"
    # a slash before a retained query string is not end-of-string, so
    # the chain (shared verbatim with the oracle) preserves it
    assert _canon("https://a.com/x/?page=1") == "https://a.com/x/?page=1"


def test_url_dedup_invariants(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.webcrawl import crawl_pages, url_dedup

    pages = crawl_pages(sf_dir).to_pandas()
    out = url_dedup(sf_dir).to_pandas()
    # every canonical URL appears exactly once and counts add up
    assert out["canon_url"].is_unique
    assert out["n_docs"].sum() == len(pages)
    # the kept doc is the min doc_id within its canonical group
    expect = pages.groupby("canon_url")["doc_id"].min()
    got = out.set_index("canon_url")["keep_doc_id"]
    assert got.sort_index().equals(expect.sort_index())
    # synthesis produced genuine duplicates (the op is non-trivial)
    assert (out["n_docs"] > 1).any()


def test_host_stats_bounded_by_sources(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.webcrawl import host_stats

    out = host_stats(sf_dir).to_pandas()
    assert (out["n_pages"] <= out["n_docs"]).all()
    assert out["host"].str.endswith(".example.com").all()
    # hosts are the lowercased source namespace — bounded vocabulary
    assert out["host"].is_unique


def test_url_blocklist_filter(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.webcrawl import (
        crawl_pages,
        url_blocklist_filter,
    )

    kept = url_blocklist_filter(sf_dir).to_pandas()
    total = crawl_pages(sf_dir).count()
    assert 0 < len(kept) < total  # the gate actually fires
    assert not kept["canon_url"].str.startswith(
        "https://src3.example.com/"
    ).any()
    assert not kept["canon_url"].str.startswith(
        "https://src7.example.com/item-1"
    ).any()
    # an empty rule set keeps everything
    allk = url_blocklist_filter(sf_dir, prefixes=()).to_pandas()
    assert len(allk) == total


def test_host_cap_sample_quota_and_order(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.webcrawl import (
        crawl_pages,
        host_cap_sample,
    )

    cap = 5
    out = host_cap_sample(sf_dir, cap=cap).to_pandas()
    pages = crawl_pages(sf_dir).to_pandas()
    pages["host"] = pages["canon_url"].str.extract(r"^[^/]+//([^/]+)")
    # quota holds and ranks are 1..k per host
    per_host = out.groupby("host")
    assert (per_host.size() <= cap).all()
    for _, g in per_host:
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
    # exactly the cap longest docs per host (n_chars desc, doc_id asc)
    expect = (
        pages.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .groupby("host")
        .head(cap)
    )
    got = set(zip(out["host"], out["doc_id"]))
    assert got == set(zip(expect["host"], expect["doc_id"]))
    # the quota actually cuts something (op is non-trivial)
    assert len(out) < len(pages)
