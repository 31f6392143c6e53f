"""Round-5 hardening tests: shared tokenizer semantics, the
distributed degree_assortativity path, glove window validation,
heldout_perplexity's empty-train shortcut, and multimodal
degenerate-payload guards."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# shared tokenizer (functions/tokenize.py)
# ---------------------------------------------------------------------------

CASES = [
    "a b c",
    "a  b",          # double space → empty piece dropped
    " lead",
    "trail ",
    "",
    "   ",
    "tab\there",     # tab is NOT a separator under oracle semantics
    "nl\nhere",
    "one",
]


def _ref_tokens(x: str) -> list[str]:
    return [w for w in x.split(" ") if w]


def test_tokens_matches_oracle_semantics():
    from outbreak_kg_ray.functions.tokenize import tokens

    for x in CASES:
        assert tokens(x) == _ref_tokens(x), x


def test_token_counts_vectorized_matches_python():
    from outbreak_kg_ray.functions.tokenize import token_counts

    col = pa.chunked_array([CASES[:4], CASES[4:]])
    np.testing.assert_array_equal(
        token_counts(col),
        np.array([len(_ref_tokens(x)) for x in CASES], dtype=np.int64),
    )
    assert token_counts(pa.array([], pa.string())).shape == (0,)


def test_flat_tokens_matches_python():
    from outbreak_kg_ray.functions.tokenize import flat_tokens

    flat, idx = flat_tokens(pa.array(CASES))
    got = flat.to_pylist()
    want, want_idx = [], []
    for i, x in enumerate(CASES):
        toks = _ref_tokens(x)
        want.extend(toks)
        want_idx.extend([i] * len(toks))
    assert got == want
    np.testing.assert_array_equal(idx, np.array(want_idx, dtype=np.int64))


def test_flat_tokens_null_strings_contribute_nothing():
    from outbreak_kg_ray.functions.tokenize import flat_tokens, token_counts

    col = pa.array(["a b", None, "c"], pa.string())
    flat, idx = flat_tokens(col)
    assert flat.to_pylist() == ["a", "b", "c"]
    np.testing.assert_array_equal(idx, [0, 0, 2])
    np.testing.assert_array_equal(token_counts(col), [2, 0, 1])


# ---------------------------------------------------------------------------
# degree_assortativity: distributed two-hash-join path == broadcast path
# ---------------------------------------------------------------------------

def test_degree_assortativity_distributed_matches_broadcast():
    from outbreak_kg_ray.pipelines.graph import degree_assortativity

    fast = degree_assortativity(SF, distributed=False).to_pandas()
    dist = degree_assortativity(SF, distributed=True).to_pandas()
    assert fast.to_dict("records") == dist.to_dict("records")
    assert fast["n_edges"].iloc[0] > 0


# ---------------------------------------------------------------------------
# glove_cooccurrence window validation / larger windows
# ---------------------------------------------------------------------------

def test_glove_window_validation():
    from outbreak_kg_ray.pipelines.lmdata import glove_cooccurrence

    with pytest.raises(ValueError):
        glove_cooccurrence(SF, window=0)


def test_glove_window_beyond_four_runs():
    # used to die on a hardcoded-twelfths assert for window > 4;
    # now scales by lcm(1..window) (window=5 → denom 60)
    from outbreak_kg_ray.pipelines.lmdata import glove_cooccurrence

    df = glove_cooccurrence(SF, window=5).to_pandas()
    assert len(df) > 0
    # every weight is a positive multiple of 1/60
    scaled = df["x"] * 60.0
    assert np.allclose(scaled, np.round(scaled), atol=1e-6)
    # a wider window can only add mass to each surviving pair
    df4 = glove_cooccurrence(SF, window=4).to_pandas()
    m = df.merge(df4, on=["center", "context"], suffixes=("_5", "_4"))
    assert (m["x_5"] >= m["x_4"] - 1e-9).all()


# ---------------------------------------------------------------------------
# heldout_perplexity: empty train split → closed-form all-OOV scores
# ---------------------------------------------------------------------------

def test_heldout_perplexity_empty_train_split():
    from outbreak_kg_ray.pipelines.docops import heldout_perplexity

    # permille=1000 puts EVERY doc in the holdout → train split empty
    df = heldout_perplexity(SF, holdout_permille=1000).to_pandas()
    assert len(df) > 0
    # denom = N + V + 1 = 1 → per-token nll 0, ppl 1 for every doc
    assert (df["nll_mean"] == 0.0).all()
    assert (df["ppl"] == 1.0).all()
    assert (df["n_tokens"] > 0).all()


# ---------------------------------------------------------------------------
# multimodal degenerate-payload guards
# ---------------------------------------------------------------------------

def test_image_augment_degenerate_payloads():
    from outbreak_kg_ray.stages import multimodal as mm

    tiny = mm.encode_png(np.arange(16, dtype=np.uint8).reshape(4, 4))
    ok = mm.make_png_payload(3)
    out = mm.ImageAugmentStage()(
        pa.table({"media_id": [1, 3], "payload": [tiny, ok]})
    )
    rows = out.to_pylist()
    # tiny 4×4 image: crop clamps to the full image instead of a
    # zero/negative modulus crash
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[1]["crop_w"] == 4 and by_id[1]["crop_h"] == 4
    assert by_id[1]["x0"] == 0 and by_id[1]["y0"] == 0
    assert 3 in by_id  # the healthy payload still augments


def test_audio_augment_zero_sample_wav_skipped():
    from outbreak_kg_ray.stages import multimodal as mm

    empty = mm.encode_wav(np.array([], dtype=np.int16), 8000)
    ok = mm.make_wav_payload(5)
    out = mm.AudioAugmentStage()(
        pa.table({"media_id": [2, 5], "payload": [empty, ok]})
    )
    rows = out.to_pylist()
    assert [r["media_id"] for r in rows] == [5]


def test_curate_corpus_fixed_bench_dir_is_identity_on_same_corpus():
    # bench_sf_dir pins the benchmark-gram universe; pointing it at
    # the corpus itself must reproduce the default exactly
    from outbreak_kg_ray.pipelines.docops import curate_corpus

    a = curate_corpus(SF).to_pandas().sort_values("doc_id")
    b = curate_corpus(SF, bench_sf_dir=SF).to_pandas().sort_values(
        "doc_id"
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_decode_image_real_guard():
    from outbreak_kg_ray.stages import multimodal as mm

    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"\xff\xd8\xff\xe0 not a png")
    w, h, _ = mm.decode_image_real(mm.make_png_payload(1))
    assert w > 0 and h > 0
