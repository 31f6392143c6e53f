"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The standard trainer never touches the raw corpus after one counting
pass: merges are learned over the *word-frequency table*, because a
word's segmentation depends only on the word itself.  That makes the
distributed shape exactly the repo's frequency-model skeleton
(``unigram_logprob`` / ``oov_rate``):

1. **word counts** — per-batch ``np.unique`` pre-aggregation, one
   (word, count)-bounded grouped sum; token streams never shuffle.
2. **top-V cut** — ``_topv_rows`` (distributed sort + limit) bounds
   the driver-held training table to ``vocab_size`` rows by
   construction, independent of corpus size.  (Capping the training
   vocabulary is what real BPE trainers do; tail words beyond the cap
   still get segmented at apply time, they just don't vote on merges.)
3. **merge loop** — pure driver work over the ≤V-row table:
   O(V × word_len × merges), corpus-size-independent.

Merge semantics (pinned by both the tests and the DuckDB oracle):
pair counts include overlapping occurrences ("aaa" counts (a,a)
twice); the winning pair is (count DESC, left ASC, right ASC); a
merge is applied greedily left-to-right, never re-consuming a symbol
produced by the same round ("a a a a" + (a,a) → "aa aa").  The SQL
oracle reproduces the greedy application with the double-space
``replace`` trick: double every separator so adjacent matches cannot
share a delimiter character, replace " l  r " with " lr ", then
collapse the doubles — leftmost non-overlapping ``replace`` is then
exactly the greedy merge.

Reference anchor: the reference repo has no tokenizer trainer; this
is an engine-added operator for the LLM-data-pipeline family, sharing
its first-iteration statistic with ``docops.bpe_merge_pairs``.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

MERGE_SCHEMA = pa.schema(
    [
        ("rank", pa.int64()),
        ("left_sym", pa.string()),
        ("right_sym", pa.string()),
        ("merged", pa.string()),
        ("n_occurrences", pa.int64()),
    ]
)


def _word_count_ds(sf_dir: str):
    """(word, count) dataset — per-batch ``np.unique`` partials into
    one vocab-bounded grouped sum (tokenize = single-space split,
    mirrored by the oracle's ``string_split(trim(text), ' ')``)."""
    import numpy as np
    from ray.data.aggregate import Sum

    from ..stages.decontam import tokenize
    from .docops import _documents

    def counts(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for x in t.column("text").to_pylist():
            if x.strip():
                toks.extend(tokenize(x))
        if not toks:
            return pa.table(
                {"w": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(
            np.asarray(toks, dtype=object), return_counts=True
        )
        return pa.table(
            {"w": pa.array(uniq.tolist(), pa.string()),
             "c": pa.array(cnt, pa.int64())}
        )

    return (
        _documents(sf_dir)
        .map_batches(counts, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
    )


def merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """Apply one merge greedily left-to-right (a merged symbol is not
    re-considered within the same pass)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_merges_from_counts(
    word_counts: list[tuple[str, int]], merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Driver-side merge loop over the vocab-bounded (word, count)
    table: (rank, left, right, merged, pair count at merge time).
    Stops early when no adjacent pairs remain."""
    segs: list[tuple[list[str], int]] = [
        (list(w), int(c)) for w, c in word_counts
    ]
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, merges + 1):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, c in segs:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, left, right, left + right, int(n)))
        segs = [(merge_word(s, left, right), c) for s, c in segs]
    return out


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one word by replaying the learned merges in rank order
    (the standard BPE apply rule)."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = merge_word(syms, left, right)
    return syms


def bpe_learn_merges(
    sf_dir: str, *, merges: int = 10, vocab_size: int = 1 << 15
) -> pa.Table:
    """Learn the top-``merges`` BPE merges over the corpus —
    (rank, left_sym, right_sym, merged, n_occurrences)."""
    from .docops import _topv_rows

    rows = _topv_rows(_word_count_ds(sf_dir), "w", "c", vocab_size)
    learned = learn_merges_from_counts(
        [(r["w"], int(r["c"])) for r in rows], merges
    )
    return pa.table(
        {
            "rank": pa.array([r[0] for r in learned], pa.int64()),
            "left_sym": pa.array([r[1] for r in learned], pa.string()),
            "right_sym": pa.array([r[2] for r in learned], pa.string()),
            "merged": pa.array([r[3] for r in learned], pa.string()),
            "n_occurrences": pa.array(
                [r[4] for r in learned], pa.int64()
            ),
        },
        schema=MERGE_SCHEMA,
    )


def bpe_token_counts(
    sf_dir: str, *, merges: int = 10, vocab_size: int = 1 << 15
):
    """Per-document token counts under the learned BPE: (doc_id,
    n_tokens, n_bpe_tokens) — the statistic a token-budget planner
    needs BEFORE committing to a tokenizer.

    Scale shape: the merge table (≤ ``merges`` rows) is broadcast via
    ``ray.put``; one streamed actor-pool pass re-segments each doc,
    memoizing segment lengths per distinct word per actor (words
    beyond the training cap are segmented on the fly by the same
    replay rule — exercised by the tiny-cap unit test; at testdata
    scales the cap covers the whole vocabulary, so the DuckDB oracle's
    join over the segmented vocab is exact)."""
    import ray

    from ..stages.decontam import tokenize
    from .docops import _documents

    learned = bpe_learn_merges(
        sf_dir, merges=merges, vocab_size=vocab_size
    )
    pairs = list(
        zip(
            learned.column("left_sym").to_pylist(),
            learned.column("right_sym").to_pylist(),
        )
    )
    merges_ref = ray.put(pairs)

    class BpeCountStage:
        def __init__(self, ref) -> None:
            self._merges: list[tuple[str, str]] = ray.get(ref)
            self._memo: dict[str, int] = {}

        def _n_syms(self, w: str) -> int:
            n = self._memo.get(w)
            if n is None:
                n = len(apply_merges(w, self._merges))
                self._memo[w] = n
            return n

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, n_toks, n_bpe = [], [], []
            for doc_id, x in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
            ):
                if not x.strip():
                    continue
                toks = tokenize(x)
                ids.append(doc_id)
                n_toks.append(len(toks))
                n_bpe.append(sum(self._n_syms(w) for w in toks))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_tokens": pa.array(n_toks, pa.int64()),
                    "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
                }
            )

    from outbreak_kg_ray.stages.maputil import map_stage

    return map_stage(
        _documents(sf_dir), BpeCountStage, batch_size=1024,
        ctor_args=(merges_ref,),
    )
