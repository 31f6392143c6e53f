"""Unit tests for the dedup / textstats / simsearch stage family
(SURVEY.md §5(a): per-operator tests on tiny synthetic batches)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from outbreak_kg_ray.stages import dedup as dd
from outbreak_kg_ray.stages import textstats as ts


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_shingles_and_jaccard():
    a = dd.shingles("the quick brown fox jumps", k=3)
    assert "the quick brown" in a and len(a) == 3
    assert dd.jaccard(a, a) == 1.0
    assert dd.jaccard(set(), set()) == 1.0
    b = dd.shingles("the quick brown cat jumps", k=3)
    assert 0 < dd.jaccard(a, b) < 1


def test_minhash_signature_properties():
    s1 = dd.minhash_signature("alpha beta gamma delta epsilon zeta")
    s2 = dd.minhash_signature("alpha beta gamma delta epsilon zeta")
    assert (s1 == s2).all()  # deterministic
    s3 = dd.minhash_signature("totally different words entirely here now")
    assert (s1 != s3).any()
    # near-identical texts share most signature slots
    s4 = dd.minhash_signature("alpha beta gamma delta epsilon eta")
    assert (s1 == s4).sum() > (s1 == s3).sum()


def test_simhash_hamming():
    a = dd.simhash64("the quick brown fox")
    assert a == dd.simhash64("the quick brown fox")
    assert dd.hamming64(a, a) == 0
    b = dd.simhash64("the quick brown cat")
    assert 0 < dd.hamming64(a, b) < 40


def test_exact_dedup_min_key_wins(ray_session):
    ds = _docs_ds([(5, "same text"), (2, "same text"), (9, "other")])
    out = dd.exact_dedup_keep(ds).to_pandas()
    assert len(out) == 2
    winners = set(out["doc_id"])
    assert winners == {2, 9}  # min doc_id per distinct content


def test_minhash_pipeline_finds_exact_dup(ray_session):
    import ray

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "completely unrelated text with other tokens inside it here"),
    ]
    pairs = dd.minhash_candidate_pairs(_docs_ds(rows))
    texts = {r[0]: r[1] for r in rows}
    verified = pairs.map_batches(
        dd.JaccardVerify,
        fn_constructor_kwargs={"texts_ref": ray.put(texts), "threshold": 0.8},
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    assert [(1, 2)] == list(zip(verified["a"], verified["b"]))
    assert verified["jaccard"].iloc[0] == 1.0


def test_token_stats_and_quality():
    t = pa.table({"doc_id": [1], "text": ["the cat, a dog!"]})
    out = ts.token_stats_batch(t).to_pylist()[0]
    assert out["n_tokens"] == 4
    assert out["n_stopwords"] == 2  # 'the', 'a'
    assert out["n_punct"] == 2  # ',' '!'
    q = ts.quality_batch(t).to_pylist()[0]
    assert q["stop_ratio"] == 0.5
    assert 0 < q["quality"] <= 1.0


def test_readability_batch():
    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["The cat sat. The dog ran!", "", "word"],
        }
    )
    rows = ts.readability_batch(t).to_pylist()
    r1 = rows[0]
    assert r1["n_words"] == 6
    assert r1["n_sentences"] == 2
    assert r1["n_syllables"] == 6  # e, a-a, e, o-y? -> 'the'(1) cat(1) sat(1) the(1) dog(1) ran(1)
    # flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    assert abs(r1["flesch"] - 119.19) < 1e-9
    assert rows[1]["n_words"] == 0 and rows[1]["flesch"] == 0.0
    r3 = rows[2]
    # 1 word, 0 sentences (clamped to 1), 1 syllable ('o')
    assert r3["n_sentences"] == 0
    assert abs(r3["flesch"] - (206.835 - 1.015 - 84.6)) < 1e-9


def test_fingerprint_deterministic_and_distinct():
    a = ts.fingerprint("hello world")
    assert a == ts.fingerprint("hello world")
    assert a != ts.fingerprint("hello world!")


def test_bucket_pairs_cap(ray_session):
    import ray.data as rd

    # one hot bucket with 100 members -> capped at 64 -> C(64,2) pairs
    n = 100
    t = pa.table(
        {
            "band": pa.array([0] * n, pa.int32()),
            "band_hash": pa.array(["hot"] * n, pa.string()),
            "doc_id": pa.array(list(range(n)), pa.int64()),
        }
    )
    pairs = dd._bucket_pairs(rd.from_arrow(t), "doc_id").to_pandas()
    assert len(pairs) == 64 * 63 // 2
    assert pairs["truncated"].all()


def test_joined_verify_matches_broadcast(ray_session):
    """The distributed hash-join verify path must agree pair-for-pair
    with the broadcast-dict verify on the same candidates (round-1
    VERDICT #2: the join is the default, driver-corpus-free path)."""
    import ray

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota nu"),
        (4, "completely unrelated text with other tokens inside it here"),
    ]
    docs = _docs_ds(rows)
    pairs = dd.minhash_candidate_pairs(docs)
    joined = dd.attach_pair_payload(pairs, _docs_ds(rows), num_partitions=2)
    got = (
        dd.jaccard_verify_joined(joined, threshold=0.5)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    texts = {r[0]: r[1] for r in rows}
    want = (
        dd.minhash_candidate_pairs(_docs_ds(rows))
        .map_batches(
            dd.JaccardVerify,
            fn_constructor_kwargs={"texts_ref": ray.put(texts), "threshold": 0.5},
            batch_format="pyarrow", concurrency=1,
        )
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert got[["a", "b", "jaccard"]].values.tolist() == \
        want[["a", "b", "jaccard"]].values.tolist()
    assert (1, 2) in set(zip(got["a"], got["b"]))


def test_hamming_verify_joined(ray_session):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "the quick brown fox jumps over the lazy dog again tonight"),
        (3, "entirely different content about distributed stream engines"),
    ]
    docs = _docs_ds(rows)
    import ray.data as rd
    import pyarrow as pa

    pairs = rd.from_arrow(pa.table({
        "a": pa.array([1, 1], pa.int64()),
        "b": pa.array([2, 3], pa.int64()),
    }))
    sigs = dd.simhash_signature_rows(docs)
    out = dd.hamming_verify_joined(
        pairs, sigs, max_hamming=10, num_partitions=2
    ).to_pandas()
    kept = set(zip(out["a"], out["b"]))
    assert (1, 2) in kept           # one-token delta: small hamming
    assert (1, 3) not in kept       # unrelated: large hamming
    h = dd.hamming64(dd.simhash64(rows[0][1]), dd.simhash64(rows[1][1]))
    assert out.set_index(["a", "b"]).loc[(1, 2), "hamming"] == h


def test_no_driver_corpus_lookup_in_docops():
    """Regression guard: the near-dup pipelines must not read the
    documents table to the driver (the removed _variants_text_lookup
    pattern)."""
    import inspect

    from outbreak_kg_ray.pipelines import docops

    src = inspect.getsource(docops)
    assert "_variants_text_lookup" not in src
    for fn in ("minhash_near_dups", "ngram_jaccard_near_dups",
               "simhash_near_dups"):
        fsrc = inspect.getsource(getattr(docops, fn))
        assert "pq.read_table" not in fsrc and "to_pylist" not in fsrc, fn


def test_connected_components_min_label(ray_session):
    import pyarrow as pa
    import ray.data as rd

    # two components {1,2,3,9} (chain) and {5,7}; singleton 8 absent
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([1, 2, 3, 5], pa.int64()),
        "b": pa.array([2, 3, 9, 7], pa.int64()),
    }))
    out = dd.connected_components(pairs, num_partitions=2).to_pandas()
    got = dict(zip(out["node"], out["label"]))
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5}


def test_connected_components_long_chain_converges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    n = 40  # path graph: worst-case diameter for label propagation
    pairs = rd.from_arrow(pa.table({
        "a": pa.array(list(range(n - 1)), pa.int64()),
        "b": pa.array(list(range(1, n)), pa.int64()),
    }))
    out = dd.connected_components(pairs, num_partitions=2).to_pandas()
    assert set(out["label"]) == {0} and len(out) == n


def test_quality_filter_sample_deterministic(ray_session):
    import hashlib

    from outbreak_kg_ray.pipelines import docops

    sf = "/root/testdata/sf0.001"
    df = docops.quality_filter_sample(sf).to_pandas()
    assert (df["quality"] >= 0.5).all()
    for d in df["doc_id"]:
        assert hashlib.md5(str(d).encode()).hexdigest()[0] in "0123"
    again = docops.quality_filter_sample(sf).to_pandas()
    assert sorted(df["doc_id"]) == sorted(again["doc_id"])


def test_short_exact_duplicates_survive_multiplicity_filter(ray_session):
    """A 3-token exact duplicate has ONE distinct shingle; the
    min_collisions=2 candidate filter must still surface the pair
    (short boilerplate dups are the common dedup case)."""
    ds = _docs_ds([(1, "fever outbreak reported"),
                   (2, "fever outbreak reported"),
                   (3, "completely different text here entirely")])
    pairs = dd.ngram_candidate_pairs(ds).to_pandas()
    assert {(1, 2)} == set(zip(pairs["a"], pairs["b"]))


def test_gram_hashes_match_naive_windows():
    from outbreak_kg_ray.stages import decontam as dc

    hasher = dc.TokenHasher()
    toks = "a b c d e f g".split(" ")
    th = hasher.hash_tokens(toks)
    got = dc.gram_hashes(th, 3)
    assert len(got) == 5
    for i in range(5):
        # recompute each window independently (scalar reference)
        h = np.uint64(0)
        for k in range(3):
            h = h * dc._GRAM_BASE + th[i + k]
        assert got[i] == h
    # identical token sequences hash identically across hasher instances
    th2 = dc.TokenHasher().hash_tokens(toks)
    assert (dc.gram_hashes(th2, 3) == got).all()
    # too-short input -> no grams
    assert len(dc.gram_hashes(th[:2], 3)) == 0


def test_decontaminate_stage_flags_planted_overlap(ray_session):
    import ray

    from outbreak_kg_ray.stages import decontam as dc

    # benchmark doc 0 (id % 10 == 0); doc 13 copies a 4-gram from it,
    # doc 21 shares nothing, doc 30 is itself benchmark (dropped).
    bench_text = "w1 w2 w3 w4 w5 w6"
    hasher = dc.TokenHasher()
    bench = np.sort(
        np.unique(dc.gram_hashes(hasher.hash_tokens(dc.tokenize(bench_text)), 4))
    )
    stage = dc.DecontaminateStage(ray.put(bench), 4, 10)
    t = pa.table(
        {
            "doc_id": pa.array([13, 21, 30], pa.int64()),
            "text": pa.array(
                ["x w2 w3 w4 w5 y", "p q r s t u", bench_text], pa.string()
            ),
        }
    )
    out = stage(t)
    assert out.column("doc_id").to_pylist() == [13, 21]
    assert out.column("n_overlap_grams").to_pylist() == [1, 0]
    assert out.column("contaminated").to_pylist() == [True, False]


def test_boilerplate_ratio_tiny_corpus(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    # the trigram "f1 f2 f3" (a footer) appears in docs 0,1,2; each
    # doc also has unique grams.  min_df=3 → exactly that gram is hot.
    texts = [
        "a b c f1 f2 f3",
        "d e f f1 f2 f3",
        "g h i f1 f2 f3",
        "j k l m n o",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        docops.boilerplate_ratio(str(tmp_path), n=3, min_df=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 0: grams {abc, bcf1, cf1f2, f1f2f3} → 4 distinct, 1 hot
    assert out.loc[0, "n_grams"] == 4
    assert out.loc[0, "n_hot_grams"] == 1
    assert out.loc[0, "boilerplate_ratio"] == 0.25
    assert out.loc[3, "n_hot_grams"] == 0
    assert out.loc[3, "boilerplate_ratio"] == 0.0


def test_lang_median_filter_even_odd_interpolation(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    # lang "aa": lengths 2,3,5,6 (even) → median 4.0, keeps 5,6
    # lang "bb": lengths 1,4,9 (odd)    → median 4,   keeps 4,9
    texts = {
        0: ("aa", "x y"), 1: ("aa", "x y z"),
        2: ("aa", "a b c d e"), 3: ("aa", "a b c d e f"),
        4: ("bb", "q"), 5: ("bb", "q r s t"),
        6: ("bb", "a b c d e f g h i"),
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "lang": pa.array([v[0] for v in texts.values()], pa.string()),
            "text": pa.array([v[1] for v in texts.values()], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = docops.lang_median_filter(str(tmp_path)).to_pandas()
    assert sorted(out.doc_id) == [2, 3, 5, 6]


def test_top_terms_rank_key_integer_ordering(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    # doc 0: "z z q q a" → tf: z=2,q=2,a=1. df: z=2 (docs 0,1), q=1,
    # a=2.  rank key (tf DESC, df ASC, term ASC) → q, z, a.
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["z z q q a", "z a"], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        docops.top_terms_per_doc(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "rank"])
    )
    d0 = out[out.doc_id == 0]
    assert d0.term.tolist() == ["q", "z", "a"]
    assert d0.tf.tolist() == [2, 2, 1]
    assert d0.df.tolist() == [1, 2, 2]


def test_dedup_spans_rewrites_hot_chunks(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    dup = "w1 w2 w3 w4"  # the shared 4-word span (chunk size 4)
    texts = [
        f"{dup} a b c d tail1 tail2",   # chunk0 hot, chunk1 unique, remainder
        f"e f g h {dup}",               # chunk1 hot
        f"{dup} {dup} x",               # both chunks hot (within-doc repeat)
        "p q r",                        # no complete chunk → untouched
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        docops.dedup_spans(str(tmp_path), chunk=4, min_df=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 0: span removed, unique chunk + remainder kept in order
    assert out.loc[0, "n_chunks"] == 2
    assert out.loc[0, "n_removed_chunks"] == 1
    assert out.loc[0, "clean_text"] == "a b c d tail1 tail2"
    # doc 1: leading unique chunk kept
    assert out.loc[1, "clean_text"] == "e f g h"
    # doc 2: EVERY instance of the hot span removed; remainder kept
    assert out.loc[2, "n_removed_chunks"] == 2
    assert out.loc[2, "clean_text"] == "x"
    # doc 3: shorter than one chunk → text unchanged
    assert out.loc[3, "n_chunks"] == 0
    assert out.loc[3, "clean_text"] == "p q r"


def test_dedup_spans_noop_below_min_df(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    texts = ["a b c d e f g h", "i j k l m n o p"]
    t = pa.table(
        {
            "doc_id": pa.array(range(2), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        docops.dedup_spans(str(tmp_path), chunk=4, min_df=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (out["n_removed_chunks"] == 0).all()
    assert list(out["clean_text"]) == texts


def test_redact_pii_patterns(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    # organic PII in the text body is scrubbed too, not only the
    # deterministic planted suffix
    texts = [
        "reach me at jane.doe+spam@mail.example.org today",
        "server 192.168.1.254 responded",
        "plain words only",
    ]
    t = pa.table(
        {
            "doc_id": pa.array([3, 4, 6], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        docops.redact_pii(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 3: 1 organic email, no planted email (3 % 3 == 0)
    assert out.loc[3, "n_emails"] == 1
    assert "<EMAIL>" in out.loc[3, "redacted_text"]
    assert "jane.doe" not in out.loc[3, "redacted_text"]
    # doc 4: organic IP + no planted IP (4 % 2 == 0) → 1
    assert out.loc[4, "n_ips"] == 1
    assert "192.168.1.254" not in out.loc[4, "redacted_text"]
    # every doc gets exactly one planted phone
    assert (out["n_phones"] == 1).all()
    assert all("<PHONE>" in s for s in out["redacted_text"])
    # doc 6: planted suffix is the only PII (6%3==0 emails, 6%2==0 ips)
    assert out.loc[6, "n_emails"] == 0 and out.loc[6, "n_ips"] == 0


def test_mixture_downsample_rates(ray_session, sf_dir):
    import hashlib

    from outbreak_kg_ray.pipelines import docops

    out = docops.mixture_downsample(sf_dir).to_pandas()
    # every surviving doc's hash prefix is under its source's threshold
    for _, r in out.iterrows():
        digit = int(hashlib.md5(r["source"].encode()).hexdigest()[0], 16)
        rate = (digit % 4 + 1) / 4.0
        assert r["rate"] == rate
        h4 = int(
            hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16
        )
        assert h4 < int(rate * 65536)
    # deterministic: a second run returns the identical set
    out2 = docops.mixture_downsample(sf_dir).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # rate-1.0 sources are kept in full, so the result is non-trivial
    assert 0 < len(out) < 500


def test_domain_quality_filter_median_split(ray_session, sf_dir):
    import numpy as np

    from outbreak_kg_ray.pipelines import docops

    out = docops.domain_quality_filter(sf_dir).to_pandas()
    kept_sources = set(out["source"].unique())
    # surviving sources' means are all >= every dropped source's mean
    all_q = docops.quality_scores(sf_dir).to_pandas()
    docs = docops._documents(sf_dir, ("doc_id", "source")).to_pandas()
    merged = all_q.merge(docs, on="doc_id")
    means = merged.groupby("source")["quality"].mean().round(6)
    med = float(np.median(means.to_numpy()))
    assert kept_sources == set(means[means >= med].index)
    # per-row annotation matches its source's mean
    for s in kept_sources:
        sub = out[out["source"] == s]
        assert (sub["source_mean_quality"] == means[s]).all()
    assert 0 < len(out) < len(docs)


def test_normalize_text_rules(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    texts = [
        "  MiXeD   Case\t\ttabs\nand newlines  ",
        "already normal",
        "",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        docops.normalize_text(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "norm_text"] == "mixed case tabs and newlines"
    assert out.loc[1, "norm_text"] == "already normal"
    assert out.loc[2, "norm_text"] == ""


def test_token_freq_spectrum_tiny(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.stages import sketch

    # a:3, b:2, c:1, d:1  → spectrum {1: 2 terms, 2: 1, 3: 1}
    texts = ["a a b", "a b c", "d"]
    t = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        sketch.token_freq_spectrum(str(tmp_path))
        .to_pandas()
        .set_index("freq")
        .sort_index()
    )
    assert out["n_terms"].to_dict() == {1: 2, 2: 1, 3: 1}


def test_curation_funnel_monotone_and_consistent(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines import docops

    funnel = (
        docops.curation_funnel(sf_dir)
        .sort_values("stage_idx")
        .reset_index(drop=True)
    )
    assert list(funnel["stage"]) == [
        "input", "exact_dedup", "quality_gate", "decontaminate",
        "mixture_downsample",
    ]
    counts = funnel["n_docs"].tolist()
    assert all(a >= b for a, b in zip(counts, counts[1:]))  # monotone
    assert counts[0] == 500 and counts[-1] > 0
    # the final stage's count equals the curated output row count
    final = docops.curate_corpus(sf_dir).to_pandas()
    assert len(final) == counts[-1]
    # survivors pass every individual gate
    q = docops.quality_scores(sf_dir).to_pandas().set_index("doc_id")
    assert (q.loc[final["doc_id"], "quality"] >= 0.5).all()
    assert (final["doc_id"] % 50 != 0).all()  # bench docs removed


def test_bigram_pmi_tiny_corpus(ray_session, tmp_path):
    import math

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    # "x y" appears 6 times; unigrams: x=6, y=6, z=3
    # N = 15 tokens; B = 6 + 7 = 13 bigram slots
    texts = ["x y x y x y z", "x y x y x y z z"]
    t = pa.table(
        {
            "doc_id": pa.array(range(2), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        docops.bigram_pmi(str(tmp_path), min_count=5)
        .to_pandas()
        .set_index("bigram")
    )
    assert list(out.index) == ["x y"]
    assert out.loc["x y", "c_ab"] == 6
    want = math.log((6 / 13.0) / ((6 / 15.0) * (6 / 15.0)))
    assert abs(out.loc["x y", "pmi"] - round(want, 6)) < 1e-9


def test_char_entropy_known_values(ray_session, tmp_path):
    import math

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    texts = ["aaaa", "abab", ""]  # H=0, H=ln 2, dropped
    t = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        docops.char_entropy(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1]  # empty doc dropped
    assert out.loc[0, "char_entropy"] == 0.0
    assert abs(out.loc[1, "char_entropy"] - round(math.log(2), 6)) < 1e-9


def test_aho_corasick_automaton():
    from outbreak_kg_ray.functions.ahocorasick import AhoCorasick

    ac = AhoCorasick(["he", "she", "his", "hers"])
    # classic example: "ushers" contains she, he, hers
    assert ac.match_ids("ushers") == {0, 1, 3}
    assert ac.match_ids("history") == {2}
    assert ac.match_ids("xyz") == set()
    assert ac.match_ids("") == set()
    # overlapping occurrences of one pattern count once (distinct ids)
    ac2 = AhoCorasick(["a a"])
    assert ac2.match_ids("a a a") == {0}
    # raw substring semantics: no word boundaries
    ac3 = AhoCorasick(["cat dog"])
    assert ac3.match_ids("concat dogma") == {0}


def test_phrase_blocklist_pipeline(ray_session, sf_dir):
    import hashlib

    from outbreak_kg_ray.pipelines import docops

    out = docops.phrase_blocklist(sf_dir).to_pandas()
    assert len(out) == 500
    assert (out["blocked"] == (out["n_blocked_phrases"] > 0)).all()
    assert 0 < out["blocked"].sum() < 500
    # spot-check one doc against a naive scan
    docs = docops._documents(sf_dir).to_pandas().set_index("doc_id")
    row = out[out["n_blocked_phrases"] > 0].iloc[0]
    text = docs.loc[row["doc_id"], "text"]
    all_texts = docs["text"].tolist()
    pats = set()
    for x in all_texts:
        ws = [w for w in x.split(" ") if w]
        pats.update(
            f"{a} {b}" for a, b in zip(ws, ws[1:])
            if hashlib.md5(f"{a} {b}".encode()).hexdigest()[0] == "0"
        )
    naive = sum(1 for p in pats if p in text)
    assert naive == row["n_blocked_phrases"]


def test_gopher_quality_rules(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    passing = " ".join(
        ["the", "be", "to", "of"] + ["word"] * 60
    )  # 64 words, all alpha, 4 stopword kinds
    short = "the be only five words"
    symbols = " ".join(["###", "!!!"] * 30 + ["the", "be"])  # alpha frac low
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array([passing, short, symbols, ""], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        docops.gopher_quality(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1, 2]  # empty doc dropped
    assert bool(out.loc[0, "gopher_pass"])
    assert out.loc[0, "n_words"] == 64
    assert out.loc[0, "stop_hits"] == 4
    assert not bool(out.loc[1, "gopher_pass"])  # word count < 50
    assert not bool(out.loc[2, "gopher_pass"])  # alpha fraction <= 0.8
    assert out.loc[2, "alpha_word_frac"] < 0.8


def test_chunk_documents_windows(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    text = "x" * 450  # starts 0,160,320 → lens 200,200,130
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([text, ""], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = docops.chunk_documents(str(tmp_path)).to_pandas()
    assert list(out["doc_id"]) == [1, 1, 1]  # empty doc yields no chunks
    assert list(out["chunk_start"]) == [0, 160, 320]
    assert [len(c) for c in out["chunk_text"]] == [200, 200, 130]
    # overlap: chunk i ends 40 chars into chunk i+1
    assert out["chunk_text"][0][160:] == out["chunk_text"][1][:40]


def test_bm25_ranking_prefers_tf_and_rarity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    docs = [
        "spark spark spark pad pad pad",   # high tf for one term
        "spark pad pad pad pad pad",       # low tf same term
        "pad pad pad pad pad pad",         # no query terms → unscored
        "join pad pad pad pad pad",        # rarer term (df=1)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = docops.bm25_topk(str(tmp_path), k=10).to_pandas()
    assert 2 not in set(out["doc_id"])  # zero-score doc excluded
    score = out.set_index("doc_id")["score"]
    assert score[0] > score[1]  # higher tf, same term
    assert score[3] > score[1]  # df=1 term beats df=2 term at tf=1


def test_dsir_weights_prefer_target_tokens(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    # 'en' docs say "hello", others say "bonjour"; a mixed doc sits
    # between.  Target-distinctive tokens must earn positive weight.
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(
                ["hello hello", "bonjour bonjour",
                 "hello bonjour", ""],
                pa.string(),
            ),
            "lang": pa.array(["en", "fr", "fr", "en"], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = (
        docops.dsir_weights(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [0, 1, 2]  # empty doc dropped
    assert out.loc[0, "dsir_weight"] > 0      # pure target token
    assert out.loc[1, "dsir_weight"] < 0      # pure non-target token
    assert (
        out.loc[1, "dsir_weight"]
        < out.loc[2, "dsir_weight"]
        < out.loc[0, "dsir_weight"]
    )


def test_holdout_split_deterministic_and_complete(ray_session, sf_dir):
    import hashlib

    from outbreak_kg_ray.pipelines import docops

    rows = docops.holdout_split(sf_dir).take_all()
    assert len(rows) == 500
    for r in rows[:50]:
        expect = (
            "holdout"
            if int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16)
            < 6553
            else "train"
        )
        assert r["split"] == expect
    # both splits non-empty at corpus scale
    splits = {r["split"] for r in rows}
    assert splits == {"train", "holdout"}


def test_token_budget_cap_quota(ray_session, tmp_path):
    import hashlib

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    # one source with 4 docs of 5 tokens each, budget 12 → the first
    # two docs in md5 order fit (10 ≤ 12), the third would hit 15
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(["a b c d e"] * 4, pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            "n_chars": pa.array([9] * 4, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = docops.token_budget_cap(str(tmp_path), budget=12).to_pandas()
    order = sorted(range(4), key=lambda d: hashlib.md5(str(d).encode()).hexdigest())
    assert sorted(out["doc_id"]) == sorted(order[:2])

    # budget below a single doc still admits the head doc
    out1 = docops.token_budget_cap(str(tmp_path), budget=3).to_pandas()
    assert list(out1["doc_id"]) == [order[0]]


def test_near_dup_clusters_invariants(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines import docops

    pairs = docops.minhash_near_dups(sf_dir).take_all()
    rows = docops.near_dup_clusters(sf_dir).take_all()
    assert rows, "variant corpus must yield near-dup clusters"
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    # canonical id = min member; exactly one keeper per cluster
    for cid, members in by_cluster.items():
        assert min(m["doc_id"] for m in members) == cid
        assert sum(m["keep"] for m in members) == 1
        keeper = next(m for m in members if m["keep"])
        assert keeper["doc_id"] == cid
    # every verified pair is co-clustered
    label = {r["doc_id"]: r["cluster_id"] for r in rows}
    for p in pairs:
        assert label[p["a"]] == label[p["b"]]


def test_ann_range_search_threshold(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines import docops

    rows = docops.ann_range_search(sf_dir, threshold=0.3).take_all()
    assert rows
    assert all(r["score"] >= 0.3 - 1e-9 for r in rows)
    # each query matches itself with cosine 1.0
    selfs = {r["query_id"] for r in rows
             if r["query_id"] == r["vec_id"] and r["score"] == 1.0}
    assert len(selfs) == 8
    # a tighter radius returns a subset
    tight = docops.ann_range_search(sf_dir, threshold=0.9).take_all()
    pairs = {(r["query_id"], r["vec_id"]) for r in rows}
    assert {(r["query_id"], r["vec_id"]) for r in tight} <= pairs


def test_source_vocab_jaccard_tiny(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    t = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(
                ["a b c", "b c d", "x y"], pa.string()
            ),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s1", "s2", "s3"], pa.string()),
            "n_chars": pa.array([5, 5, 3], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = docops.source_vocab_jaccard(str(tmp_path)).to_pandas()
    got = {
        (r.src_a, r.src_b): r.jaccard for r in out.itertuples()
    }
    # s1={a,b,c}, s2={b,c,d} → 2/4; s3 disjoint → absent
    assert got == {("s1", "s2"): 0.5}


def test_oov_rate_vocab_cut(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.docops import oov_rate

    out = oov_rate(sf_dir).to_pandas()
    assert (out["n_oov"] <= out["n_tokens"]).all()
    assert ((out["oov_rate"] >= 0) & (out["oov_rate"] <= 1)).all()
    # a full-size vocabulary (31 distinct tokens at test scale)
    # leaves nothing out-of-vocabulary
    full = oov_rate(sf_dir, vocab_size=10_000).to_pandas()
    assert (full["n_oov"] == 0).all()
    # a capped vocabulary produces genuine OOV mass
    assert (out["n_oov"] > 0).any()


def test_bpe_merge_pairs_handmade(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines.docops import bpe_merge_pairs

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["abab ab", "abc"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["s", "s"], pa.string()),
                "n_chars": pa.array([7, 3], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = bpe_merge_pairs(str(tmp_path)).to_pandas()
    # 'abab' → ab, ba, ab; 'ab' → ab; 'abc' → ab, bc
    got = dict(zip(out["pair"], out["n_occurrences"]))
    assert got == {"ab": 4, "ba": 1, "bc": 1}
    assert out["rank"].tolist() == [1, 2, 3]
    assert out["pair"].tolist() == ["ab", "ba", "bc"]  # count desc, pair asc


def test_source_kl_divergence_properties(ray_session, sf_dir, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines.docops import source_kl_divergence

    out = source_kl_divergence(sf_dir).to_pandas()
    # KL is non-negative and finite
    assert (out["kl"] >= 0).all()
    assert out["kl"].notna().all()

    # a single-source corpus IS the corpus distribution → KL = 0
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b b", "b a"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["only", "only"], pa.string()),
                "n_chars": pa.array([5, 3], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    single = source_kl_divergence(str(tmp_path)).to_pandas()
    assert single["kl"].tolist() == [0.0]
    assert single["n_tokens"].tolist() == [5]


def test_source_lang_chi2_uniform_is_zero(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines.docops import source_lang_chi2

    # perfectly independent 2×2 grid → chi2 exactly 0
    rows = [("s1", "en"), ("s1", "de"), ("s2", "en"), ("s2", "de")]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(["x"] * 4, pa.string()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[0] for r in rows], pa.string()),
                "n_chars": pa.array([1] * 4, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = source_lang_chi2(str(tmp_path)).to_pandas()
    assert out["chi2"].tolist() == [0.0]
    assert out["dof"].tolist() == [1]
    assert out["n_docs"].tolist() == [4]


def test_length_buckets_ntile_semantics(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.docops import length_buckets

    out = length_buckets(sf_dir).to_pandas()
    sizes = out["bucket"].value_counts()
    # equal-count buckets: sizes differ by at most 1, earlier buckets
    # take the extra row
    assert sizes.max() - sizes.min() <= 1
    assert sorted(sizes.index) == list(range(1, 9))
    # monotone: bucket order respects (n_chars, doc_id) order
    s = out.sort_values(["n_chars", "doc_id"])
    assert s["bucket"].is_monotonic_increasing


def test_bigram_nll_model_sanity(ray_session, tmp_path):
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines.docops import bigram_nll

    # corpus: "a b" ×3 and "a c" ×1 → p(b|a)=3/4, p(c|a)=1/4
    texts = ["a b", "a b", "a b", "a c", "x"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 5, pa.string()),
                "source": pa.array(["s"] * 5, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = bigram_nll(str(tmp_path)).to_pandas().set_index("doc_id")
    assert 4 not in out.index  # single-token doc has no bigram
    assert abs(out.loc[0, "bigram_nll"] - (-math.log(0.75))) < 1e-6
    assert abs(out.loc[3, "bigram_nll"] - (-math.log(0.25))) < 1e-6
    # rarer continuations score strictly higher NLL
    assert out.loc[3, "bigram_nll"] > out.loc[0, "bigram_nll"]


def test_export_by_lang_layout(ray_session, sf_dir, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines.docops import export_by_lang

    out = str(tmp_path / "byl")
    manifest = export_by_lang(sf_dir, out_dir=out).to_pandas()
    # one hive directory per lang, rows re-readable and key-pure
    dirs = sorted(glob.glob(os.path.join(out, "lang=*")))
    assert [os.path.basename(d).split("=")[1] for d in dirs] == sorted(
        manifest["lang"]
    )
    assert manifest["n_rows"].sum() == 500
    for d in dirs:
        lang = os.path.basename(d).split("=")[1]
        t = pq.read_table(d)
        # partition column is directory-encoded; data columns intact
        assert t.num_rows == int(
            manifest.set_index("lang").loc[lang, "n_rows"]
        )
        assert "doc_id" in t.column_names and "text" in t.column_names


def test_profile_documents_clean_corpus(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.docops import profile_documents

    out = (
        profile_documents(sf_dir).to_pandas().set_index("col_name")
    )
    assert set(out.index) == {
        "doc_id", "text", "lang", "source", "n_chars"
    }
    # the synthetic corpus has no nulls; doc 0 makes doc_id's
    # "empty" (== 0) count exactly 1
    assert (out["n_null"] == 0).all()
    assert out.loc["doc_id", "n_empty"] == 1
    assert out.loc["text", "n_empty"] == 0


# --- round-3: bounded-vocabulary frequency models (VERDICT #2/#5) ---


def test_relative_min_df_policy():
    from outbreak_kg_ray.pipelines.docops import relative_min_df

    # floor preserves small-corpus (testdata) semantics exactly
    assert relative_min_df(50, floor=2, frac=0.004) == 2
    assert relative_min_df(500, floor=2, frac=0.004) == 2
    assert relative_min_df(500, floor=5, frac=0.01) == 5
    # and grows with the corpus: the hot set stays bounded by
    # (spans per doc)/frac independent of corpus size
    assert relative_min_df(10_000_000, floor=2, frac=0.004) == 40_000
    assert relative_min_df(10_000_000, floor=5, frac=0.01) == 100_000


def test_topv_rows_bounded_and_deterministic(ray_session):
    import ray.data as rd

    from outbreak_kg_ray.pipelines.docops import _topv_rows

    ds = rd.from_items(
        [{"w": f"w{i:03d}", "c": (i * 13) % 7 + 1} for i in range(100)]
    )
    rows = _topv_rows(ds, "w", "c", 10)
    # the driver-held table is ≤ V rows by construction
    assert len(rows) == 10
    expected = sorted(
        [(f"w{i:03d}", (i * 13) % 7 + 1) for i in range(100)],
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [(r["w"], r["c"]) for r in rows] == expected
    # empty input: no crash, no rows
    assert _topv_rows(rd.from_items([]), "w", "c", 10) == []


def _docs_oracle_con(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" '{sf_dir}/documents.parquet'"
    )
    return con


def _sorted_frame(df):
    cols = sorted(df.columns)
    return (
        df[cols].sort_values(cols).reset_index(drop=True)
    )


def test_unigram_logprob_oov_bucket_matches_capped_oracle(
    ray_session, sf_dir
):
    """Force the top-V cut to BIND (V=3 on the real corpus): scores
    must match the capped-model oracle (same SQL the driver checks,
    with the cap lowered), proving the OOV bucket path is exact."""
    import pandas as pd

    import __ray_entry__ as entry
    from outbreak_kg_ray.pipelines.docops import unigram_logprob

    mine = _sorted_frame(unigram_logprob(sf_dir, vocab_size=3).to_pandas())
    sql = entry.oracle_sql()["unigram_logprob"].replace("65536", "3")
    oracle = _sorted_frame(_docs_oracle_con(sf_dir).execute(sql).fetchdf())
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def test_dsir_weights_oov_bucket_matches_capped_oracle(ray_session, sf_dir):
    import pandas as pd

    import __ray_entry__ as entry
    from outbreak_kg_ray.pipelines.docops import dsir_weights

    mine = _sorted_frame(dsir_weights(sf_dir, vocab_size=3).to_pandas())
    sql = entry.oracle_sql()["dsir_weights"].replace("65536", "3")
    oracle = _sorted_frame(_docs_oracle_con(sf_dir).execute(sql).fetchdf())
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def test_oov_rate_distributed_cut_unchanged(ray_session, sf_dir):
    """The distributed top-V cut must reproduce the driver-side
    ranking it replaced: n_oov of the top-20 vocab is stable."""
    from outbreak_kg_ray.pipelines.docops import oov_rate

    out = oov_rate(sf_dir).to_pandas()
    assert len(out) == 500
    assert (out["n_oov"] <= out["n_tokens"]).all()
    assert (out["oov_rate"] >= 0).all() and (out["oov_rate"] <= 1).all()


def test_fuzzy_name_pairs_blocking_complete(ray_session, sf_dir):
    """Deletion-neighborhood blocking must find EXACTLY the brute-
    force levenshtein=1 pair set (completeness: every distance-1 pair
    shares a deletion key; soundness: verification kills
    transpositions and distance-2 collisions)."""
    import duckdb

    from outbreak_kg_ray.pipelines.docops import (
        _lev_le1,
        fuzzy_name_pairs,
    )

    got = fuzzy_name_pairs(sf_dir).to_pandas()
    exp = duckdb.sql(
        f"""SELECT a.c_name AS name_a, b.c_name AS name_b
            FROM (SELECT DISTINCT c_name
                  FROM '{sf_dir}/customer.parquet') a
            JOIN (SELECT DISTINCT c_name
                  FROM '{sf_dir}/customer.parquet') b
              ON a.c_name < b.c_name
            WHERE levenshtein(a.c_name, b.c_name) = 1
            ORDER BY 1, 2"""
    ).df()
    assert len(got) == len(exp) > 0
    assert (got["name_a"].values == exp["name_a"].values).all()
    assert (got["name_b"].values == exp["name_b"].values).all()
    # _lev_le1 unit semantics
    assert _lev_le1("abc", "abd") and _lev_le1("abc", "abcd")
    assert _lev_le1("abc", "bc") and not _lev_le1("ab", "ba")


def test_association_rules_invariants(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines.docops import association_rules

    df = association_rules(sf_dir).to_pandas()
    assert len(df) > 0 and len(df) % 2 == 0  # both directions emitted
    # probability bounds
    assert ((df["support"] > 0) & (df["support"] <= 1)).all()
    assert ((df["confidence"] >= df["support"] - 1e-9)).all()
    assert (df["confidence"] <= 1 + 1e-9).all()
    assert (df["lift"] > 0).all()
    # direction symmetry: support is identical for (a->b) and (b->a)
    fwd = df.set_index(["ant", "cons"])["support"]
    rev = df.set_index(["cons", "ant"])["support"]
    assert (fwd.sort_index().values == rev.sort_index().values).all()


def test_weighted_sample_biased_toward_long_docs(ray_session, sf_dir):
    import duckdb

    from outbreak_kg_ray.pipelines.docops import weighted_sample

    got = weighted_sample(sf_dir, k=50).to_pandas()
    assert len(got) == 50 and got["doc_id"].is_unique
    # weighting invariant: the sampled mean length exceeds the corpus
    # mean (selection probability is proportional to n_chars)
    corpus_mean = duckdb.sql(
        f"SELECT avg(n_chars) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert got["n_chars"].mean() > corpus_mean


def test_perplexity_buckets_tercile_invariants(ray_session):
    """Within each lang: buckets are monotone in nll (every head score
    <= every middle score <= every tail score) and each of head /
    head+middle covers at least its ceil(n/3) / ceil(2n/3) quota
    (ties can only grow a bucket, never shrink it)."""
    from outbreak_kg_ray.pipelines.docops import perplexity_buckets

    rows = perplexity_buckets("/root/testdata/sf0.001").take_all()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["nll_mean"], r["bucket"]))
    assert by_lang
    for lang, vals in by_lang.items():
        n = len(vals)
        heads = [v for v, b in vals if b == "head"]
        mids = [v for v, b in vals if b == "middle"]
        tails = [v for v, b in vals if b == "tail"]
        if mids:
            assert max(heads) <= min(mids)
        if tails:
            assert max(mids or heads) <= min(tails)
        assert len(heads) >= (n + 2) // 3
        assert len(heads) + len(mids) >= (2 * n + 2) // 3


def test_span_corruption_roundtrip(sf_dir):
    """T5 semantics: interleaving input and target at matching
    sentinels reconstructs the original document byte-for-byte, and
    the mask density matches the closed form."""
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import lmdata

    docs = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
        if r["text"].strip()
    }
    rows = lmdata.span_corruption_pairs(sf_dir).take_all()
    assert len(rows) == len(docs)
    for r in rows[:200]:
        orig = docs[r["doc_id"]].strip().split(" ")
        # parse target into {sentinel: [tokens]}
        fills: dict[str, list[str]] = {}
        cur = None
        for tok in (r["target_text"].split(" ")
                    if r["target_text"] else []):
            if tok.startswith("<extra_id_"):
                cur = tok
                fills[cur] = []
            else:
                fills[cur].append(tok)
        rebuilt: list[str] = []
        for tok in r["input_text"].split(" "):
            if tok.startswith("<extra_id_"):
                rebuilt.extend(fills[tok])
            else:
                rebuilt.append(tok)
        assert rebuilt == orig
        n_mask_ref = sum(
            1 for p in range(1, len(orig) + 1)
            if (r["doc_id"] + p) % 7 < 2
        )
        assert r["n_masked"] == n_mask_ref


def test_next_event_examples_matches_pandas_lag(sf_dir):
    """Every example's context equals the user's previous up-to-3
    event types in (ts, event_id) order, oldest first; exactly one
    example per event with >=1 same-user predecessor."""
    import pandas as pd
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import lmdata

    ev = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).to_pandas().sort_values(["user_id", "ts", "event_id"])
    g = ev.groupby("user_id")["event_type"]
    expect = {}
    lag1, lag2, lag3 = g.shift(1), g.shift(2), g.shift(3)
    for i, row in enumerate(ev.itertuples(index=False)):
        parts = [v for v in (lag3.iloc[i], lag2.iloc[i], lag1.iloc[i])
                 if isinstance(v, str)]
        if pd.notna(lag1.iloc[i]):
            expect[row.event_id] = (
                row.user_id, " ".join(parts), row.event_type
            )

    got = lmdata.next_event_examples(sf_dir).take_all()
    assert len(got) == len(expect)
    for r in got:
        u, ctx, tgt = expect[r["event_id"]]
        assert (r["user_id"], r["context"], r["target"]) == (u, ctx, tgt)
        assert 1 <= len(r["context"].split(" ")) <= 3


def test_preference_pairs_invariants(sf_dir):
    """Strict positive margin; per-group pairs <= n//2; a doc never
    appears as both chosen and rejected within its group."""
    import collections

    from outbreak_kg_ray.pipelines import docops

    rows = docops.preference_pairs(sf_dir).take_all()
    assert rows
    qual = {
        r["doc_id"]: r["quality"]
        for r in docops.quality_scores(sf_dir).take_all()
    }
    sizes = collections.Counter()
    for r in docops._documents(
        sf_dir, ("doc_id", "lang", "source")
    ).take_all():
        sizes[(r["lang"], r["source"])] += 1
    per_group = collections.Counter()
    chosen, rejected = collections.defaultdict(set), collections.defaultdict(set)
    for r in rows:
        g = (r["lang"], r["source"])
        per_group[g] += 1
        assert r["chosen_quality"] > r["rejected_quality"]
        assert r["margin"] > 0
        assert qual[r["chosen_id"]] == r["chosen_quality"]
        assert qual[r["rejected_id"]] == r["rejected_quality"]
        chosen[g].add(r["chosen_id"])
        rejected[g].add(r["rejected_id"])
    for g, c in per_group.items():
        assert c <= sizes[g] // 2
        assert not (chosen[g] & rejected[g])


def test_near_dup_keep_best_invariants(sf_dir):
    """Exactly one keeper per cluster; the keeper is the cluster's
    quality argmax (doc_id tie-break); cluster_id is the min member."""
    import collections

    from outbreak_kg_ray.pipelines import docops

    rows = docops.near_dup_keep_best(sf_dir).take_all()
    assert rows
    qual = {
        r["doc_id"]: r["quality"]
        for r in docops.quality_scores(sf_dir).take_all()
    }
    clusters = collections.defaultdict(list)
    for r in rows:
        clusters[r["cluster_id"]].append(r)
    for cid, members in clusters.items():
        assert cid == min(m["doc_id"] for m in members)
        keepers = [m for m in members if m["is_keep"]]
        assert len(keepers) == 1
        best = min(members, key=lambda m: (-qual[m["doc_id"]], m["doc_id"]))
        assert keepers[0]["doc_id"] == best["doc_id"]
        assert all(m["keep_id"] == best["doc_id"] for m in members)
        assert len(members) >= 2


def test_negative_sampling_table_partitions_slots(sf_dir):
    """Slot counts tile the table exactly: non-negative, sum to
    table_size, and monotone with the (freq DESC, token ASC) rank
    up to integer-floor jitter of 1."""
    from outbreak_kg_ray.pipelines import lmdata

    rows = lmdata.negative_sampling_table(sf_dir).take_all()
    assert rows
    assert all(r["n_slots"] >= 0 for r in rows)
    assert sum(r["n_slots"] for r in rows) == 1 << 16
    ordered = sorted(rows, key=lambda r: (-r["freq"], r["token"]))
    slots = [r["n_slots"] for r in ordered]
    for a, b in zip(slots, slots[1:]):
        assert b <= a + 1  # floor jitter only; allocation follows rank


def test_skipgram_pairs_symmetric_and_windowed(sf_dir):
    """Pair counts are symmetric (window pairing emits both
    directions) and match a direct python recount."""
    import collections

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import lmdata

    got = {
        (r["center"], r["context"]): r["n"]
        for r in lmdata.skipgram_pairs(sf_dir).take_all()
    }
    assert got
    expect = collections.Counter()
    for r in pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).to_pylist():
        toks = r["text"].split()
        for i, c in enumerate(toks):
            for j in range(max(0, i - 2), min(len(toks), i + 3)):
                if j != i:
                    expect[(c, toks[j])] += 1
    expect = {k: v for k, v in expect.items() if v >= 2}
    assert got == expect
    for (a, b), n in got.items():
        assert got.get((b, a)) == n


def test_oversample_balanced_replication(sf_dir):
    """Every pool row appears exactly floor(max/n_class) times with
    contiguous copy indices, and post-balance class masses are within
    one replication factor of the majority class."""
    import collections

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    pool = collections.Counter()
    for r in pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_pylist():
        if r["vec_id"] % (r["label"] + 1) == 0:
            pool[r["label"]] += 1
    mx = max(pool.values())
    rows = docops.oversample_balanced(sf_dir).take_all()
    per_row = collections.Counter()
    for r in rows:
        per_row[(r["vec_id"], r["label"])] += 1
    out_mass = collections.Counter()
    for (v, lab), k in per_row.items():
        assert k == mx // pool[lab]
        out_mass[lab] += k
    for lab, m in out_mass.items():
        assert mx - m < mx // pool[lab] * pool[lab] + pool[lab]
        assert m <= mx
    # copy indices are 0..k-1 per row
    seen = collections.defaultdict(set)
    for r in rows:
        seen[(r["vec_id"], r["label"])].add(r["copy_idx"])
    for key, idxs in seen.items():
        assert idxs == set(range(len(idxs)))


def test_repeated_span_report_spans_are_real_duplicates(sf_dir):
    """Every reported span covers only windows whose 8-token text
    occurs in >= 2 documents, spans are maximal (no adjacent
    flagged window extends them), and positions are in-range."""
    import collections

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    texts = {
        r["doc_id"]: r["text"].split()
        for r in pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
    }
    df = collections.Counter()
    win_docs = collections.defaultdict(set)
    for d, toks in texts.items():
        for p in range(len(toks) - 7):
            win_docs[" ".join(toks[p:p + 8])].add(d)
    hot = {w for w, ds_ in win_docs.items() if len(ds_) >= 2}

    # expected islands per doc
    expect = collections.defaultdict(list)
    for d, toks in texts.items():
        covered = [False] * len(toks)
        for p in range(len(toks) - 7):
            if " ".join(toks[p:p + 8]) in hot:
                for o in range(8):
                    covered[p + o] = True
        start = None
        for i, c in enumerate(covered + [False]):
            if c and start is None:
                start = i
            elif not c and start is not None:
                expect[d].append((start + 1, i))
                start = None

    got = collections.defaultdict(list)
    for r in docops.repeated_span_report(sf_dir, min_df=2).take_all():
        assert r["span_len"] == r["span_end"] - r["span_start"] + 1
        got[r["doc_id"]].append((r["span_start"], r["span_end"]))
    assert {d: sorted(v) for d, v in got.items()} == \
        {d: sorted(v) for d, v in expect.items()}
    assert got  # non-degenerate


def test_curriculum_rank_is_total_order(sf_dir):
    """Ranks are a 1..n permutation consistent with
    (quality DESC, doc_id ASC); shards are contiguous rank cuts."""
    from outbreak_kg_ray.pipelines import docops

    rows = sorted(
        docops.curriculum_rank(sf_dir).take_all(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r["quality"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r["shard"] == (r["rank"] - 1) // 64


def test_char_coverage_table_tiles_corpus(sf_dir):
    """Frequencies sum to total corpus chars; coverage is monotone
    to 1.0; in_vocab is a prefix of the ranked alphabet."""
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import lmdata

    df = lmdata.char_coverage_table(sf_dir)
    total = sum(
        len(r["text"])
        for r in pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["text"]
        ).to_pylist()
    )
    assert df["freq"].sum() == total
    cov = list(df["coverage"])
    assert cov == sorted(cov)
    assert abs(cov[-1] - 1.0) < 1e-9
    flags = list(df["in_vocab"])
    assert flags[0] is True or flags[0] == True  # noqa: E712
    # prefix property: once False, never True again
    seen_false = False
    for f in flags:
        if not f:
            seen_false = True
        else:
            assert not seen_false


def test_token_dropout_augment_roundtrip(sf_dir):
    """Exactly n_augments rows per doc; each variant equals the
    closed-form deletion of its source text."""
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import lmdata

    texts = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
    }
    rows = lmdata.token_dropout_augment(sf_dir).take_all()
    assert len(rows) == 2 * len(texts)
    for r in rows[:300]:
        toks = texts[r["doc_id"]].split()
        expect = " ".join(
            w for p, w in enumerate(toks, start=1)
            if (r["doc_id"] + r["aug_id"] + p) % 7 != 0
        )
        assert r["text"] == expect
        assert len(r["text"].split()) < max(len(toks), 1) or not toks


def test_corpus_datacard_scalars(sf_dir):
    """Datacard facts match direct recomputation."""
    import hashlib

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    card = docops.corpus_datacard(sf_dir).iloc[0]
    texts = t.column("text").to_pylist()
    assert card["n_docs"] == len(texts)
    assert card["n_tokens"] == sum(len(x.split()) for x in texts)
    assert card["n_langs"] == len(set(t.column("lang").to_pylist()))
    assert card["n_sources"] == len(set(t.column("source").to_pylist()))
    distinct = len({hashlib.md5(x.encode()).hexdigest() for x in texts})
    assert abs(card["dup_rate"] - (1 - distinct / len(texts))) < 1e-6
    assert 0.0 <= card["mean_quality"] <= 1.0


def test_glove_cooccurrence_subsumes_skipgram(sf_dir):
    """The d<=2 window slice of the GloVe matrix must agree with
    skipgram counts at the pair level: x >= count(d<=2)/2 never holds
    trivially, but every skipgram pair is a GloVe pair and every
    GloVe weight is a positive multiple of 1/12."""
    from outbreak_kg_ray.pipelines import lmdata

    glove = {
        (r["center"], r["context"]): r["x"]
        for r in lmdata.glove_cooccurrence(sf_dir).take_all()
    }
    assert glove
    sg = {
        (r["center"], r["context"])
        for r in lmdata.skipgram_pairs(sf_dir).take_all()
    }
    # skipgram requires raw count >= 2 within d<=2; such pairs carry
    # GloVe weight >= 2 * (1/2) = 1.0 = the min_weight cut
    missing = sg - set(glove)
    assert not missing
    for v in glove.values():
        assert v > 0
        assert abs(v * 12 - round(v * 12)) < 1e-5  # 6dp rounding x12


def test_heldout_perplexity_model_semantics(sf_dir):
    """Scores match a direct add-1 unigram replay; no train doc is
    scored; OOV-heavy docs score higher ppl than in-vocab ones."""
    import collections
    import hashlib
    import math

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    cut = (100 * 65536) // 1000
    train, test = [], []
    for r in docs:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16)
        (test if h < cut else train).append(r)
    cnt = collections.Counter()
    for r in train:
        cnt.update(r["text"].split())
    denom = sum(cnt.values()) + len(cnt) + 1
    got = {r["doc_id"]: r for r in
           docops.heldout_perplexity(sf_dir).take_all()}
    test_ids = {r["doc_id"] for r in test if r["text"].split()}
    assert set(got) == test_ids
    for r in test:
        toks = r["text"].split()
        if not toks:
            continue
        nll = sum(-math.log((cnt.get(w, 0) + 1) / denom) for w in toks)
        mean = round(nll / len(toks), 6)
        g = got[r["doc_id"]]
        assert g["n_tokens"] == len(toks)
        assert abs(g["nll_mean"] - mean) < 2e-6
        assert abs(g["ppl"] - math.exp(g["nll_mean"])) < 2e-4


def test_source_dedup_matrix_counts_shared_leads(sf_dir):
    """Pair counts equal a direct recount of 32-char leads shared
    across sources; pairs are ordered source_a < source_b."""
    import collections
    import itertools

    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import docops

    lead_sources = collections.defaultdict(set)
    for r in pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    ).to_pylist():
        lead_sources[r["text"][:32]].add(r["source"])
    expect = collections.Counter()
    for srcs in lead_sources.values():
        for a, b in itertools.combinations(sorted(srcs), 2):
            expect[(a, b)] += 1
    got = {
        (r["source_a"], r["source_b"]): r["n_shared_texts"]
        for r in docops.source_dedup_matrix(sf_dir).take_all()
    }
    assert got == dict(expect)
    assert got
    assert all(a < b for a, b in got)


def test_quality_lift_report_consistency(sf_dir):
    """Populations tile the corpus per stage; the quality gate's
    kept mean strictly exceeds its dropped mean (it selects FOR
    quality), and quality_gate counts reconcile with quality_scores."""
    from outbreak_kg_ray.pipelines import docops

    df = docops.quality_lift_report(sf_dir)
    assert sorted(df["stage"]) == [
        "decontaminate", "mixture_downsample", "quality_gate"
    ]
    n_docs = len(docops.quality_scores(sf_dir).take_all())
    for _, r in df.iterrows():
        assert r["n_kept"] + r["n_dropped"] == n_docs
    qg = df[df["stage"] == "quality_gate"].iloc[0]
    assert qg["kept_mean_quality"] > qg["dropped_mean_quality"]
    n_hi = sum(
        1 for r in docops.quality_scores(sf_dir).take_all()
        if r["quality"] >= 0.5
    )
    assert qg["n_kept"] == n_hi
