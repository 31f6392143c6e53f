"""Benchmark decontamination: flag corpus documents that share word
n-grams with a held-out benchmark / eval set.

The real-world shape (GPT-3 appendix C; the C4/benchmark-overlap
audits): the benchmark side is tiny — eval sets are thousands of
documents — while the training corpus is the ~100 TB side.  So the
benchmark's gram set is the BROADCAST side (``ray.put`` once, read
by every actor from the object store) and the corpus streams
through a ``map_batches`` actor pool; nothing corpus-sized is ever
materialized.

Gram identity on the Ray side is a 64-bit polynomial hash over
per-token FNV-1a hashes (vectorized across each document's window
positions).  The driver gate compares the final per-doc overlap
counts against a DuckDB string-equality oracle, so a hash collision
(~2^-64 per gram pair) would surface as a gate mismatch; none occur
on the deterministic test corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# odd multiplier -> bijective mixing step mod 2^64
_GRAM_BASE = np.uint64(0x9E3779B97F4A7C15)
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


class TokenHasher:
    """Memoized FNV-1a token hashing — vocabulary-bounded state,
    built up once per actor and shared across batches."""

    def __init__(self) -> None:
        self._memo: dict[str, int] = {}

    def hash_tokens(self, toks: list[str]) -> np.ndarray:
        memo = self._memo
        out = np.empty(len(toks), dtype=np.uint64)
        for i, tok in enumerate(toks):
            h = memo.get(tok)
            if h is None:
                h = _FNV_OFFSET
                for b in tok.encode("utf-8"):
                    h = ((h ^ b) * _FNV_PRIME) & _MASK64
                memo[tok] = h
            out[i] = h
        return out


def gram_hashes(tok_hashes: np.ndarray, n: int) -> np.ndarray:
    """All word-``n``-gram hashes of one document, vectorized across
    window positions: ``n`` shifted multiply-adds over the token-hash
    array instead of a Python loop per window."""
    m = len(tok_hashes) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    g = np.zeros(m, dtype=np.uint64)
    for k in range(n):
        g = g * _GRAM_BASE + tok_hashes[k : k + m]
    return g


def tokenize(text: str) -> list[str]:
    """Single-space split of the trimmed text — mirrors the oracle's
    ``string_split(trim(text), ' ')`` exactly (NOT ``str.split()``,
    which would collapse runs of whitespace)."""
    return text.strip().split(" ")


def bench_grams_batch(n: int, modulus: int):
    """Batch fn extracting the distinct gram hashes of the benchmark
    subset (``doc_id % modulus == 0``) of a batch."""
    hasher = TokenHasher()

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = ids % modulus == 0
        grams: list[np.ndarray] = []
        for text in t.filter(pa.array(keep)).column("text").to_pylist():
            toks = tokenize(text)
            if len(toks) >= n:
                grams.append(gram_hashes(hasher.hash_tokens(toks), n))
        merged = (
            np.unique(np.concatenate(grams))
            if grams
            else np.empty(0, dtype=np.uint64)
        )
        return pa.table({"g": pa.array(merged, pa.uint64())})

    return fn


class DecontaminateStage:
    """Actor-pool stage: per corpus document, count distinct
    ``n``-grams present in the broadcast benchmark gram set.

    ``bench_ref`` is a ``ray.put`` handle to the SORTED benchmark
    gram-hash array — fetched once per actor in ``__init__`` (zero
    copy from the local object store), never re-shipped per batch.
    Benchmark documents themselves are dropped from the output (they
    are the eval set, not training candidates)."""

    def __init__(self, bench_ref, n: int, modulus: int) -> None:
        import ray

        self._bench: np.ndarray = ray.get(bench_ref)
        self._n = n
        self._modulus = modulus
        self._hasher = TokenHasher()

    def __call__(self, t: pa.Table) -> pa.Table:
        bench, n = self._bench, self._n
        ids = t.column("doc_id").to_numpy()
        keep = ids % self._modulus != 0
        sub = t.filter(pa.array(keep))
        out_ids = sub.column("doc_id").to_numpy()
        overlaps = np.zeros(len(out_ids), dtype=np.int64)
        for i, text in enumerate(sub.column("text").to_pylist()):
            toks = tokenize(text)
            if len(toks) < n or len(bench) == 0:
                continue
            g = np.unique(gram_hashes(self._hasher.hash_tokens(toks), n))
            idx = np.searchsorted(bench, g)
            idx_c = np.minimum(idx, len(bench) - 1)
            overlaps[i] = int((bench[idx_c] == g).sum())
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_overlap_grams": pa.array(overlaps, pa.int64()),
                "contaminated": pa.array(overlaps > 0, pa.bool_()),
            }
        )
