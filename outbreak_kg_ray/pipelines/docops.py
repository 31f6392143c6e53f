"""Document-corpus operator pipelines over documents.parquet /
embeddings.parquet: dedup family, text stats, similarity search.
Each takes ``sf_dir`` and returns a Dataset (or small DataFrame)."""

from __future__ import annotations

import pyarrow.parquet as pq

from ..stages import dedup as dd
from ..stages import simsearch as ss
from ..stages import textstats as ts


def _documents(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=list(columns)
    )


def _embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )


def dedup_exact(sf_dir: str):
    return dd.exact_dedup_keep(_documents(sf_dir))


def token_stats(sf_dir: str):
    return _documents(sf_dir).map_batches(
        ts.token_stats_batch, batch_format="pyarrow"
    )


def quality_scores(sf_dir: str):
    return _documents(sf_dir).map_batches(
        ts.quality_batch, batch_format="pyarrow"
    )


def lang_id(sf_dir: str):
    return _documents(sf_dir, ("doc_id", "text", "lang")).map_batches(
        ts.LangIdStage, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4),
    )


def fingerprints(sf_dir: str):
    return _documents(sf_dir).map_batches(
        ts.fingerprint_batch, batch_format="pyarrow"
    )


def _variants_ds(sf_dir: str):
    return _documents(sf_dir).map_batches(
        dd.make_near_dup_variants, batch_format="pyarrow"
    )


def _variants_text_lookup(sf_dir: str) -> dict[int, str]:
    """Broadcast text lookup for near-dup verification. At testdata
    scale this is a ray.put dict; at 100 TB the verify stage instead
    hash-joins candidate pairs back to the doc partitions so only
    candidate texts move (see JaccardVerify docstring) — the lookup
    indirection keeps that swap local to this function."""
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = {}
    for d, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        out[d * 2] = text
        toks = text.split()
        out[d * 2 + 1] = " ".join(
            "zzz" if (i + d) % 10 == 0 else w for i, w in enumerate(toks)
        )
    return out


def minhash_near_dups(sf_dir: str, *, threshold: float = 0.6):
    """MinHash+LSH candidates verified by exact 3-gram Jaccard.
    Run on the deterministic variant corpus (original + mutated copy
    per doc) so the testdata exercises real near-dup structure."""
    import ray

    pairs = dd.minhash_candidate_pairs(_variants_ds(sf_dir))
    texts_ref = ray.put(_variants_text_lookup(sf_dir))
    return pairs.map_batches(
        dd.JaccardVerify,
        fn_constructor_kwargs={"texts_ref": texts_ref, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )


def ngram_jaccard_near_dups(sf_dir: str, *, threshold: float = 0.6):
    """n-gram Jaccard near-dup: exact-shingle inverted-index
    candidates (min-shingle sampled) verified by exact 3-gram
    Jaccard."""
    import ray

    pairs = dd.ngram_candidate_pairs(_variants_ds(sf_dir))
    texts_ref = ray.put(_variants_text_lookup(sf_dir))
    return pairs.map_batches(
        dd.JaccardVerify,
        fn_constructor_kwargs={"texts_ref": texts_ref, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )


def simhash_near_dups(sf_dir: str, *, max_hamming: int = 6):
    """SimHash banded-LSH candidates verified by hamming distance."""
    import pandas as pd
    import ray

    buckets = _variants_ds(sf_dir).map_batches(
        dd.SimHashStage, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4),
    )
    pairs = dd._bucket_pairs(buckets.drop_columns(["simhash"]), "doc_id")
    texts_ref = ray.put(_variants_text_lookup(sf_dir))

    class HammingVerify:
        def __init__(self):
            texts = ray.get(texts_ref)
            self.sig = {k: dd.simhash64(v) for k, v in texts.items()}

        def __call__(self, t):
            import pyarrow as pa

            a = t.column("a").to_pylist()
            b = t.column("b").to_pylist()
            ka, kb, hd = [], [], []
            for x, y in zip(a, b):
                h = dd.hamming64(self.sig[x], self.sig[y])
                if h <= max_hamming:
                    ka.append(x)
                    kb.append(y)
                    hd.append(h)
            return pa.table(
                {
                    "a": pa.array(ka, pa.int64()),
                    "b": pa.array(kb, pa.int64()),
                    "hamming": pa.array(hd, pa.int64()),
                }
            )

    return pairs.map_batches(
        HammingVerify, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 2),
    )


def _query_vectors(sf_dir: str, n: int = 8):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    pairs = sorted(zip(ids, embs))[:n]
    return [p[0] for p in pairs], [p[1] for p in pairs]


def ann_topk(sf_dir: str, *, k: int = 10):
    qids, qmat = _query_vectors(sf_dir)
    return ss.ann_topk(_embeddings(sf_dir), qids, qmat, k=k)


def ann_topk_ivf(sf_dir: str, *, k: int = 10):
    qids, qmat = _query_vectors(sf_dir)
    return ss.ann_topk_ivf(_embeddings(sf_dir), qids, qmat, k=k)


def embedding_near_dups(sf_dir: str, *, threshold: float = 0.35):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    mask = [lbl == 0 for lbl in t.column("label").to_pylist()]
    sub_ids = [v for v, m in zip(t.column("vec_id").to_pylist(), mask) if m]
    sub_mat = [e for e, m in zip(t.column("embedding").to_pylist(), mask) if m]
    return ss.embedding_near_dup_pairs(
        _embeddings(sf_dir), sub_ids, sub_mat, threshold=threshold
    )
