"""BPE merge learning: greedy-application semantics, SQL-replace
equivalence, early stop, and the on-the-fly OOV segmentation path."""

from __future__ import annotations

import pyarrow as pa
import pytest

from outbreak_kg_ray.pipelines.bpe import (
    apply_merges,
    bpe_learn_merges,
    bpe_token_counts,
    learn_merges_from_counts,
    merge_word,
)

SF = "/root/testdata/sf0.001"


def sql_style_merge(s: str, left: str, right: str) -> str:
    """Pure-Python mirror of the oracle's double-space replace trick
    (the equivalence this test file exists to pin)."""
    padded = " " + s.replace(" ", "  ") + " "
    replaced = padded.replace(
        " " + left + "  " + right + " ", " " + left + right + " "
    )
    return replaced.replace("  ", " ").strip()


def test_merge_word_greedy_left_to_right():
    assert merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_word(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    assert merge_word(["x"], "a", "b") == ["x"]
    assert merge_word([], "a", "b") == []
    # a merged symbol is not re-consumed within the same round
    assert merge_word(["a", "a", "b"], "a", "ab") == ["a", "a", "b"]


@pytest.mark.parametrize(
    "syms,pair",
    [
        (list("aaaa"), ("a", "a")),
        (list("aaa"), ("a", "a")),
        (["a", "b", "a", "b"], ("a", "b")),
        (["ab", "a", "b", "ab"], ("a", "b")),
        (["x", "a", "b", "y", "a", "b"], ("a", "b")),
        (["a", "b", "b", "a"], ("b", "b")),
        (list("mississippi"), ("s", "s")),
    ],
)
def test_merge_word_equals_sql_replace_trick(syms, pair):
    got = merge_word(syms, *pair)
    want = sql_style_merge(" ".join(syms), *pair).split(" ")
    assert got == want


def test_merge_word_equals_sql_replace_exhaustive():
    # every 6-symbol word over a 2-letter alphabet, both merge pairs
    from itertools import product

    for word in product("ab", repeat=6):
        for pair in (("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")):
            syms = list(word)
            assert merge_word(syms, *pair) == sql_style_merge(
                " ".join(syms), *pair
            ).split(" ")


def test_learn_merges_early_stop_and_tiebreak():
    # one 2-char word: exactly one merge possible, then no pairs
    out = learn_merges_from_counts([("ab", 3)], merges=10)
    assert out == [(1, "a", "b", "ab", 3)]
    # tie on count resolves (left ASC, right ASC)
    out = learn_merges_from_counts([("ba", 1), ("ab", 1)], merges=1)
    assert out[0][1:3] == ("a", "b")


def test_overlapping_pairs_counted():
    # "aaa" contributes TWO (a,a) occurrences (Sennrich get_stats)
    out = learn_merges_from_counts([("aaa", 1), ("bc", 1)], merges=1)
    assert out[0] == (1, "a", "a", "aa", 2)


def test_apply_merges_replays_in_rank_order():
    merges = [("a", "b"), ("ab", "c")]
    assert apply_merges("abc", merges) == ["abc"]
    assert apply_merges("cab", merges) == ["c", "ab"]
    assert apply_merges("", merges) == []


def test_bpe_learn_merges_matches_first_pair_stat(ray_session):
    """Merge #1 must equal the top row of the (already oracle-checked)
    first-iteration statistic ``bpe_merge_pairs``."""
    from outbreak_kg_ray.pipelines.docops import bpe_merge_pairs

    learned = bpe_learn_merges(SF, merges=3)
    assert learned.num_rows == 3
    first = bpe_merge_pairs(SF, k=1)
    assert learned.column("merged")[0].as_py() == first.column("pair")[0].as_py()
    assert (
        learned.column("n_occurrences")[0].as_py()
        == first.column("n_occurrences")[0].as_py()
    )


def test_bpe_token_counts_oov_path_tiny_cap(ray_session):
    """vocab_size=1: merges are learned from the single most frequent
    word, and every other word is segmented ON THE FLY by the same
    replay rule — n_bpe_tokens must equal the driver-side replay for
    every doc."""
    ds = bpe_token_counts(SF, merges=4, vocab_size=1)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"])
        for r in ds.take_all()
    }
    learned = bpe_learn_merges(SF, merges=4, vocab_size=1)
    pairs = list(
        zip(
            learned.column("left_sym").to_pylist(),
            learned.column("right_sym").to_pylist(),
        )
    )
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    checked = 0
    for doc_id, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        if not text.strip():
            continue
        toks = text.strip().split(" ")
        want = (len(toks), sum(len(apply_merges(w, pairs)) for w in toks))
        assert got[doc_id] == want
        checked += 1
    assert checked == len(got) > 0


def test_bpe_empty_corpus_schema():
    out = learn_merges_from_counts([], merges=5)
    assert out == []
    t = pa.table(
        {
            "rank": pa.array([], pa.int64()),
            "left_sym": pa.array([], pa.string()),
            "right_sym": pa.array([], pa.string()),
            "merged": pa.array([], pa.string()),
            "n_occurrences": pa.array([], pa.int64()),
        }
    )
    assert t.num_rows == 0
