"""Global sequence packing: assign every document a training-window
id from the running token total in global ``doc_id`` order — the
"pack the corpus into fixed-size context windows" step of an LLM
training-data pipeline (window = ``cum_before // cap``).

The hard part at scale is the GLOBAL ORDERED prefix sum, which naive
implementations do with a single-node sort or a driver loop.  Here it
is a two-level distributed scan:

1. one streamed pass emits per-batch partial token sums keyed by a
   coarse bucket (``doc_id // bucket_size``) — a grouped aggregate
   whose cardinality is ``n_docs / bucket_size``, never the corpus;
2. the driver turns the bucket sums into exclusive bucket offsets
   (one int per bucket; at 10^12 docs and bucket_size 10^6 that is
   10^6 ints — broadcast once via ``ray.put``.  For larger corpora
   the same scan nests: buckets-of-buckets, unchanged code shape);
3. one keyed shuffle co-locates each bucket and a vectorized
   intra-bucket cumsum adds the bucket offset.

So the corpus is touched in two streaming passes, the only exchange
is the bucket groupby (bounded by #buckets), and no stage holds more
than one bucket of rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from outbreak_kg_ray.sources.io import read_parquet_clean


def _token_counts(t: pa.Table) -> np.ndarray:
    # str.split() semantics (runs of whitespace, no empties) ==
    # the oracle's list_filter(string_split(text,' '), x -> x <> '')
    return np.fromiter(
        (len(s.split()) for s in t.column("text").to_pylist()),
        dtype=np.int64,
        count=len(t),
    )


def pack_sequences(sf_dir: str, *, cap: int = 2048,
                   bucket_size: int = 4096):
    """→ (doc_id, n_tokens, cum_before, window_id) for every document,
    where ``cum_before`` is the sum of n_tokens over all lower doc_ids
    and ``window_id = cum_before // cap``."""
    import ray
    from ray.data.aggregate import Sum

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def bucket_partials(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        toks = _token_counts(t)
        buckets = ids // bucket_size
        uniq, inv = np.unique(buckets, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, toks)
        return pa.table({
            "bucket": pa.array(uniq, pa.int64()),
            "s": pa.array(sums, pa.int64()),
        })

    bucket_rows = (
        docs.map_batches(bucket_partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("s", alias_name="s"))
        .take_all()
    )  # n_docs / bucket_size rows
    bucket_ids = np.array([r["bucket"] for r in bucket_rows], dtype=np.int64)
    order = np.argsort(bucket_ids, kind="stable")
    bucket_ids = bucket_ids[order]
    sums = np.array([r["s"] for r in bucket_rows], dtype=np.int64)[order]
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    off_ref = ray.put(dict(zip(bucket_ids.tolist(), offsets.tolist())))

    def with_bucket(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return t.append_column(
            "bucket", pa.array(ids // bucket_size, pa.int64())
        )

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        offs = _ray.get(off_ref)
        g = g.sort_values("doc_id")
        toks = np.fromiter(
            (len(s.split()) for s in g["text"]),
            dtype=np.int64,
            count=len(g),
        )
        cum_before = (
            np.concatenate(([0], np.cumsum(toks)[:-1]))
            + offs[int(g["bucket"].iloc[0])]
        )
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": toks,
            "cum_before": cum_before,
            "window_id": cum_before // cap,
        })

    return (
        docs.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan_bucket, batch_format="pandas")
    )


def shuffle_positions(sf_dir: str, *, prefix_hex: int = 2):
    """Deterministic global shuffle order for training-data sharding:
    every doc gets its rank under ``ORDER BY md5(doc_id)`` — a seeded
    full-corpus permutation computed WITHOUT a single-node sort.

    Same two-level scan as :func:`pack_sequences`, but keyed by the
    hash itself: the first ``prefix_hex`` hex chars of the key are the
    range bucket (16^prefix_hex buckets — raise for bigger corpora),
    bucket counts become exclusive rank offsets (one int per bucket on
    the driver), and one keyed shuffle sorts within buckets.  Ranks
    are 1-based to match SQL ROW_NUMBER."""
    import hashlib

    import ray
    from ray.data.aggregate import Count

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "key": pa.array(keys, pa.string()),
            "bucket": pa.array(
                [k[:prefix_hex] for k in keys], pa.string()
            ),
        })

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow")

    counts = (
        keyed_ds.groupby("bucket").aggregate(Count(alias_name="n"))
        .take_all()
    )  # 16^prefix_hex rows
    counts.sort(key=lambda r: r["bucket"])
    offs, acc = {}, 0
    for r in counts:
        offs[r["bucket"]] = acc
        acc += r["n"]
    off_ref = ray.put(offs)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        offs = _ray.get(off_ref)
        g = g.sort_values(["key", "doc_id"])
        base = offs[g["bucket"].iloc[0]]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "pos": base + np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return keyed_ds.groupby("bucket").map_groups(
        rank_bucket, batch_format="pandas"
    )
