"""Cross-snapshot dedup with a Bloom prefilter — the "drop documents
already crawled in the previous snapshot" step of a rolling web-crawl
pipeline (CCNet/Dolma-style snapshot differencing).

Snapshots are modeled on the documents table itself: docs with
``doc_id < max(doc_id) // 2`` are the OLD snapshot, the rest are NEW.
Each doc's identity is a content signature — md5 of its sorted
distinct token set — so re-crawls with shuffled word order still
collide.

Scale shape (the classic two-sided pattern, exact result):

1. one streamed pass over OLD emits per-block Bloom bitmap partials
   (m bits, OR-combined; #blocks × m/8 bytes ever reach the driver,
   never a signature set) — broadcast once via ``ray.put``;
2. one streamed pass over NEW probes the filter.  Bloom negatives
   are *guaranteed* absent from OLD and pass through immediately;
   only positives (true dups + m/k-tunable false positives) are
   collected — bounded by fp-rate × |NEW| + |true dups|;
3. one more streamed pass over OLD intersects it with the positive
   set (broadcast), yielding the exact present-set that prunes the
   final NEW pass.

So neither snapshot is ever materialized; the only driver state is
the bitmap and the bloom-positive set.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from outbreak_kg_ray.sources.io import read_parquet_clean

M_BITS = 1 << 20  # 128 KiB bitmap
K_HASH = 4


def _max_doc_id(path: str) -> int:
    """Footer-statistics max — metadata-only; falls back to a pruned
    single-column scan when stats are absent."""
    md = pq.ParquetFile(path).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    ci = names.index("doc_id")
    mx = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or st.max is None:
            t = pq.read_table(path, columns=["doc_id"])
            return int(pc.max(t.column("doc_id")).as_py())
        mx = st.max if mx is None else max(mx, st.max)
    return int(mx)


def signature(text: str) -> str:
    return hashlib.md5(
        " ".join(sorted(set(text.split()))).encode()
    ).hexdigest()


def _sig_batch(t: pa.Table) -> pa.Table:
    sigs = [signature(x) for x in t.column("text").to_pylist()]
    return pa.table({
        "doc_id": t.column("doc_id"),
        "sig": pa.array(sigs, pa.string()),
    })


def _bloom_indices(sig_hex: str) -> np.ndarray:
    h1 = int(sig_hex[:16], 16)
    h2 = int(sig_hex[16:32], 16) | 1
    return np.array(
        [(h1 + j * h2) % M_BITS for j in range(K_HASH)], dtype=np.int64
    )


def snapshot_delta(sf_dir: str):
    """→ (doc_id, sig) of NEW-snapshot docs whose content signature
    never appears in the OLD snapshot.  Exact (the Bloom filter only
    prunes; positives are verified against OLD)."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset({
            "doc_id": pa.int64(), "sig": pa.string(),
        })
    import ray

    import pyarrow.compute as _pc

    path = f"{sf_dir}/documents.parquet"
    half = _max_doc_id(path) // 2
    # predicate pushed into the reads: row-group pruning keeps each
    # snapshot scan to its own half of the corpus
    old_sigs = read_parquet_clean(
        path, columns=["doc_id", "text"],
        filter=_pc.field("doc_id") < half,
    ).map_batches(_sig_batch, batch_format="pyarrow")
    new_sigs = read_parquet_clean(
        path, columns=["doc_id", "text"],
        filter=_pc.field("doc_id") >= half,
    ).map_batches(_sig_batch, batch_format="pyarrow")

    def bitmap_partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(M_BITS // 8, dtype=np.uint8)
        for s in t.column("sig").to_pylist():
            idx = _bloom_indices(s)
            bits[idx >> 3] |= (1 << (idx & 7)).astype(np.uint8)
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.binary())})

    bits = np.zeros(M_BITS // 8, dtype=np.uint8)
    for b in old_sigs.map_batches(
        bitmap_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for buf in b.column("bitmap").to_pylist():
            bits |= np.frombuffer(buf, dtype=np.uint8)
    bits_ref = ray.put(bits)

    new_sigs = new_sigs.materialize()  # consumed twice (probe + final)

    def probe_positive(t: pa.Table, _ref=bits_ref) -> pa.Table:
        bm = ray.get(_ref)
        keep = []
        for s in t.column("sig").to_pylist():
            idx = _bloom_indices(s)
            keep.append(bool(np.all(bm[idx >> 3] & (1 << (idx & 7)))))
        return t.filter(pa.array(keep, pa.bool_()))

    positives = {
        s
        for b in new_sigs.map_batches(
            probe_positive, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        for s in b.column("sig").to_pylist()
    }  # fp-rate-bounded, never |NEW|
    pos_ref = ray.put(positives)

    def in_positives(t: pa.Table, _ref=pos_ref) -> pa.Table:
        p = ray.get(_ref)
        keep = [s in p for s in t.column("sig").to_pylist()]
        return t.filter(pa.array(keep, pa.bool_()))

    present = {
        s
        for b in old_sigs.map_batches(
            in_positives, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        for s in b.column("sig").to_pylist()
    }
    present_ref = ray.put(present)

    def not_present(t: pa.Table, _ref=present_ref) -> pa.Table:
        p = ray.get(_ref)
        keep = [s not in p for s in t.column("sig").to_pylist()]
        return t.filter(pa.array(keep, pa.bool_()))

    return new_sigs.map_batches(not_present, batch_format="pyarrow")
