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
import pyarrow as pa

from outbreak_kg_ray.sources.io import read_parquet_clean


def _token_counts(t: pa.Table) -> np.ndarray:
    # shared oracle-exact tokenizer, vectorized (one Arrow split
    # kernel + bincount — no Python loop over rows)
    from outbreak_kg_ray.functions.tokenize import token_counts

    return token_counts(t.column("text"))


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

    def scan_bucket(g: pa.Table) -> pa.Table:
        import ray as _ray

        offs = _ray.get(off_ref)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        texts = g.column("text")
        toks = np.array(
            [len(texts[int(i)].as_py().split()) for i in order],
            dtype=np.int64,
        )
        cum_before = (
            np.concatenate(([0], np.cumsum(toks)[:-1]))
            + offs[int(g.column("bucket")[0].as_py())]
        )
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "cum_before": pa.array(cum_before, pa.int64()),
            "window_id": pa.array(cum_before // cap, pa.int64()),
        })

    return (
        docs.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan_bucket, batch_format="pyarrow")
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

    def rank_bucket(g: pa.Table) -> pa.Table:
        import ray as _ray

        offs = _ray.get(off_ref)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        base = offs[g.column("bucket")[0].as_py()]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "pos": pa.array(
                base + np.arange(1, len(ids) + 1, dtype=np.int64),
                pa.int64(),
            ),
        })

    return keyed_ds.groupby("bucket").map_groups(
        rank_bucket, batch_format="pyarrow"
    )


def _ranked_docs(
    sf_dir: str,
    *,
    prefix_hex: int = 2,
    shard_size: int = 128,
    with_text: bool = False,
):
    """Docs annotated with their md5-shuffle rank and shard id —
    shared core of :func:`shard_manifest` and
    :func:`write_training_shards`.  Same two-level scan as
    :func:`shuffle_positions` (bucket counts → exclusive offsets →
    one keyed shuffle); carries ``n_tokens`` (and optionally the
    text) through the permutation shuffle, which IS the training
    shuffle — the one place the data genuinely has to move."""
    import hashlib

    import ray
    from ray.data.aggregate import Count

    cols = ["doc_id", "text"]
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=cols
    )

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        out = {
            "doc_id": pa.array(ids, pa.int64()),
            "key": pa.array(keys, pa.string()),
            "bucket": pa.array([k[:prefix_hex] for k in keys], pa.string()),
            "n_tokens": pa.array(
                [sum(1 for w in x.split(" ") if w) for x in texts],
                pa.int64(),
            ),
        }
        if with_text:
            out["text"] = pa.array(texts, pa.string())
        return pa.table(out)

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow")
    counts = (
        keyed_ds.groupby("bucket").aggregate(Count(alias_name="n"))
        .take_all()
    )  # 16^prefix_hex rows — bounded
    counts.sort(key=lambda r: r["bucket"])
    offs, acc = {}, 0
    for r in counts:
        offs[r["bucket"]] = acc
        acc += r["n"]
    off_ref = ray.put(offs)

    def rank_bucket(g: pa.Table) -> pa.Table:
        import ray as _ray

        offs = _ray.get(off_ref)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        take = pa.array(order, pa.int64())
        base = offs[g.column("bucket")[0].as_py()]
        pos = base + np.arange(1, len(ids) + 1, dtype=np.int64)
        out = {
            "doc_id": pa.array(ids[order], pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "shard_id": pa.array((pos - 1) // shard_size, pa.int64()),
            "n_tokens": g.column("n_tokens").take(take),
        }
        if with_text:
            out["text"] = g.column("text").take(take)
        return pa.table(out)

    return keyed_ds.groupby("bucket").map_groups(
        rank_bucket, batch_format="pyarrow"
    )


def shard_manifest(sf_dir: str, *, shard_size: int = 128):
    """Per-shard manifest of the deterministic training permutation:
    shard id → doc count, token count, rank range.  The audit table a
    training job reads to know what each shard holds before loading
    it — and the SQL-checkable face of the shard writer."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ranked = _ranked_docs(sf_dir, shard_size=shard_size)
    return (
        ranked.groupby("shard_id")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Min("pos", alias_name="min_pos"),
            Max("pos", alias_name="max_pos"),
        )
    )


def write_training_shards(
    sf_dir: str, out_dir: str, *, shard_size: int = 128
):
    """Materialize the shuffled corpus as SIZED, RESUMABLE training
    shards: one Parquet file per ``shard_size``-doc rank range, rows
    ordered by shuffle rank inside each shard, written atomically
    (tmp + rename) with a ``_DONE`` marker per shard so an
    interrupted run re-executes ONLY the missing shards (north_rule
    resumability at the output layer; complements the per-partition
    input checkpoints in state/checkpoint.py).

    The write happens INSIDE the per-shard group task — workers
    stream their shard to disk; the driver only ever sees the
    returned manifest rows (shard_id, n_docs, n_tokens, path,
    skipped).  On a multi-node cluster ``out_dir`` must be shared
    storage (NFS / FUSE-mounted object store) — the same assumption
    ``Dataset.write_parquet`` makes for a path sink; the atomic
    tmp+rename publish keeps per-shard exactly-once either way."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    ranked = _ranked_docs(sf_dir, shard_size=shard_size, with_text=True)

    def write_shard(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sid = int(g.column("shard_id")[0].as_py())
        path = os.path.join(out_dir, f"shard={sid:06d}")
        done = os.path.join(path, "_DONE")

        def manifest(skipped: bool) -> pa.Table:
            return pa.table({
                "shard_id": pa.array([sid], pa.int64()),
                "n_docs": pa.array([len(g)], pa.int64()),
                "n_tokens": pa.array(
                    [int(pc.sum(g.column("n_tokens")).as_py())],
                    pa.int64(),
                ),
                "path": pa.array([path], pa.string()),
                "skipped": pa.array([skipped], pa.bool_()),
            })

        if os.path.exists(done):
            return manifest(True)
        os.makedirs(path, exist_ok=True)
        t = g.sort_by("pos").select(
            ["doc_id", "pos", "n_tokens", "text"]
        )
        tmp = os.path.join(path, ".part.parquet.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(path, "part.parquet"))
        with open(done, "w", encoding="utf-8") as f:
            f.write(f"{len(g)}\n")
        return manifest(False)

    return ranked.groupby("shard_id").map_groups(
        write_shard, batch_format="pyarrow"
    )


def padded_batch_plan(sf_dir: str, *, batch_size: int = 8):
    """Group-by-length batch planning (the HF ``group_by_length`` /
    padding-efficiency op): rank every document by (n_tokens DESC,
    doc_id ASC), cut the rank order into fixed-size training batches,
    and report each batch's padded length and per-doc padding waste
    → (doc_id, n_tokens, batch_id, batch_max_tokens, pad_waste).
    Length-sorted batching is what keeps padding FLOPs near zero for
    variable-length fine-tuning.

    Scale shape: the global rank is a two-level scan keyed by
    n_tokens ITSELF — the driver holds one (length, count) row per
    DISTINCT token length (bounded by max doc length, never the
    corpus) and turns it into exclusive rank offsets; one keyed
    exchange co-locates each length and a whole-partition lexsort
    assigns ranks vectorized.  batch_max_tokens is a broadcast
    step-function lookup (searchsorted against the offsets) — the
    batch's longest member is rank ``batch_id*batch_size`` by
    construction, so no second exchange and no join."""
    import ray
    from ray.data.aggregate import Count

    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows
    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("batch_id", pa.int64()), ("batch_max_tokens", pa.int64()),
         ("pad_waste", pa.int64())]
    )
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(dict(zip(schema.names, schema.types)))

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def counted(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(_token_counts(t), pa.int64()),
            }
        )

    counted_ds = docs.map_batches(counted, batch_format="pyarrow")
    rows = (
        counted_ds.groupby("n_tokens")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )  # one row per distinct length
    rows.sort(key=lambda r: -r["n_tokens"])
    lengths = np.array([r["n_tokens"] for r in rows], dtype=np.int64)
    cnts = np.array([r["n"] for r in rows], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    offs = {int(L): int(s) for L, s in zip(lengths, starts)}
    state_ref = ray.put((offs, starts, lengths))

    def plan(g: pa.Table) -> pa.Table:
        offs_, starts_, lengths_ = ray.get(state_ref)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, -nt))
        doc, nt = doc[order], nt[order]
        n = len(nt)
        first = np.concatenate(([True], nt[1:] != nt[:-1]))
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(n), 0)
        )
        base = np.fromiter(
            (offs_[int(v)] for v in nt[first]), dtype=np.int64,
            count=int(first.sum()),
        )
        rank = base[np.cumsum(first) - 1] + (np.arange(n) - run_start)
        batch = rank // batch_size
        bmax = lengths_[
            np.searchsorted(
                starts_, batch * batch_size, side="right"
            ) - 1
        ]
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "batch_id": pa.array(batch, pa.int64()),
                "batch_max_tokens": pa.array(bmax, pa.int64()),
                "pad_waste": pa.array(bmax - nt, pa.int64()),
            }
        )

    return keyed_partitions(counted_ds, ["n_tokens"], plan, schema=schema)
