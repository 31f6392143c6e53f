"""Sequence packing (stages/pack.py), snapshot bloom dedup
(stages/bloom.py) and repetition scores (pipelines/docops.py)."""

import hashlib

import numpy as np
import pyarrow.parquet as pq

from outbreak_kg_ray.pipelines import docops
from outbreak_kg_ray.stages import bloom, pack


def _texts(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    order = np.argsort(t.column("doc_id").to_numpy(), kind="stable")
    ids = t.column("doc_id").to_numpy()[order]
    texts = [t.column("text").to_pylist()[i] for i in order]
    return ids, texts


def test_pack_matches_serial_scan(ray_session, sf_dir):
    ids, texts = _texts(sf_dir)
    toks = np.array([len(x.split()) for x in texts], dtype=np.int64)
    cum_before = np.concatenate(([0], np.cumsum(toks)[:-1]))
    got = pack.pack_sequences(sf_dir).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert (got["doc_id"].to_numpy() == ids).all()
    assert (got["n_tokens"].to_numpy() == toks).all()
    assert (got["cum_before"].to_numpy() == cum_before).all()
    assert (got["window_id"].to_numpy() == cum_before // 2048).all()


def test_pack_bucket_size_invariant(ray_session, sf_dir):
    # the two-level scan result must not depend on the bucket split
    a = pack.pack_sequences(sf_dir, bucket_size=16).to_pandas()
    b = pack.pack_sequences(sf_dir, bucket_size=4096).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["cum_before"] == b["cum_before"]).all()
    assert (a["window_id"] == b["window_id"]).all()


def test_pack_windows_contiguous(ray_session, sf_dir):
    got = pack.pack_sequences(sf_dir).to_pandas().sort_values("doc_id")
    w = got["window_id"].to_numpy()
    assert (np.diff(w) >= 0).all()  # monotone in doc order
    assert w[0] == 0
    assert (np.diff(np.unique(w)) == 1).all()  # no window skipped


def test_snapshot_delta_matches_naive(ray_session, sf_dir):
    ids, texts = _texts(sf_dir)
    half = int(ids.max()) // 2
    sig = {
        i: hashlib.md5(
            " ".join(sorted(set(x.split()))).encode()
        ).hexdigest()
        for i, x in zip(ids.tolist(), texts)
    }
    old = {sig[i] for i in sig if i < half}
    expect = {i for i in sig if i >= half and sig[i] not in old}
    got = bloom.snapshot_delta(sf_dir).to_pandas()
    assert set(got["doc_id"]) == expect
    for _, r in got.iterrows():
        assert r["sig"] == sig[r["doc_id"]]


def test_bloom_no_false_negatives():
    # any signature inserted must probe positive
    sigs = [
        hashlib.md5(f"doc {i}".encode()).hexdigest() for i in range(500)
    ]
    bits = np.zeros(bloom.M_BITS // 8, dtype=np.uint8)
    for s in sigs:
        idx = bloom._bloom_indices(s)
        bits[idx >> 3] |= (1 << (idx & 7)).astype(np.uint8)
    for s in sigs:
        idx = bloom._bloom_indices(s)
        assert np.all(bits[idx >> 3] & (1 << (idx & 7)))


def test_repetition_scores_reference(ray_session, sf_dir):
    ids, texts = _texts(sf_dir)
    got = docops.repetition_scores(sf_dir).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    from collections import Counter

    for i in [0, len(ids) // 2, len(ids) - 1]:
        toks = texts[i].split()
        c = Counter(toks)
        top = max(c.values()) / len(toks)
        nb = len(toks) - 1
        nd = len(set(zip(toks, toks[1:])))
        assert abs(got["top_token_frac"][i] - top) < 1e-6
        assert abs(got["dup_bigram_frac"][i] - (nb - nd) / nb) < 1e-6


def test_snapshot_delta_drops_true_cross_half_dups(ray_session, sf_dir):
    # the suppressed set must be exactly the new docs whose signature
    # collides across the boundary (non-empty on the synth corpus)
    ids, texts = _texts(sf_dir)
    half = int(ids.max()) // 2
    n_new = int((ids >= half).sum())
    got = bloom.snapshot_delta(sf_dir).to_pandas()
    assert 0 < len(got) < n_new


def test_shuffle_positions_is_permutation(ray_session, sf_dir):
    got = pack.shuffle_positions(sf_dir).to_pandas()
    n = len(got)
    assert sorted(got["pos"]) == list(range(1, n + 1))
    # deterministic across runs and bucket granularities
    again = pack.shuffle_positions(sf_dir, prefix_hex=1).to_pandas()
    a = got.sort_values("doc_id")["pos"].to_numpy()
    b = again.sort_values("doc_id")["pos"].to_numpy()
    assert (a == b).all()


def test_shuffle_positions_matches_serial(ray_session, sf_dir):
    ids, _ = _texts(sf_dir)
    keys = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids
    )
    expect = {i: r + 1 for r, (_, i) in enumerate(keys)}
    got = pack.shuffle_positions(sf_dir).to_pandas()
    for _, row in got.iterrows():
        assert expect[row["doc_id"]] == row["pos"]


def test_inverted_index_exact_and_capped(ray_session, sf_dir):
    from outbreak_kg_ray.stages import invindex

    ids, texts = _texts(sf_dir)
    ref: dict[str, list[int]] = {}
    for i, x in zip(ids.tolist(), texts):
        for w in set(x.split()):
            ref.setdefault(w, []).append(i)
    got = invindex.inverted_index(sf_dir).to_pandas()
    assert set(got["term"]) == set(ref)
    for _, r in got.iterrows():
        ids_ref = sorted(ref[r["term"]])
        assert r["df"] == len(ids_ref)
        assert r["truncated"] == (len(ids_ref) > invindex.POSTINGS_CAP)
        want = ",".join(str(i) for i in ids_ref[: invindex.POSTINGS_CAP])
        assert r["postings"] == want


def test_write_training_shards_resumable(ray_session, sf_dir, tmp_path):
    import os

    out = str(tmp_path / "shards")
    man = (
        pack.write_training_shards(sf_dir, out, shard_size=128)
        .to_pandas()
        .sort_values("shard_id")
        .reset_index(drop=True)
    )
    # 500 docs / 128 → 4 shards; all freshly written
    assert len(man) == 4
    assert not man["skipped"].any()
    assert man["n_docs"].sum() == 500
    # shard files exist, rows ordered by shuffle rank, ranges disjoint
    seen_pos = []
    for sid in man["shard_id"]:
        p = os.path.join(out, f"shard={sid:06d}", "part.parquet")
        t = pq.read_table(p)
        pos = t.column("pos").to_numpy()
        assert (np.diff(pos) > 0).all()
        assert ((pos - 1) // 128 == sid).all()
        seen_pos.extend(pos.tolist())
    assert sorted(seen_pos) == list(range(1, 501))

    # resume: delete ONE shard, re-run → only that shard rewritten
    victim = int(man["shard_id"].iloc[1])
    vdir = os.path.join(out, f"shard={victim:06d}")
    other = os.path.join(
        out, f"shard={int(man['shard_id'].iloc[0]):06d}", "part.parquet"
    )
    mtime_before = os.path.getmtime(other)
    import shutil

    shutil.rmtree(vdir)
    man2 = (
        pack.write_training_shards(sf_dir, out, shard_size=128)
        .to_pandas()
        .set_index("shard_id")
    )
    assert man2.loc[victim, "skipped"] == False  # noqa: E712
    assert man2.drop(index=victim)["skipped"].all()
    assert os.path.getmtime(other) == mtime_before  # untouched
    assert os.path.exists(os.path.join(vdir, "part.parquet"))


def test_padded_batch_plan_invariants(sf_dir):
    """Batches are contiguous rank cuts: every batch has exactly
    batch_size members (except possibly the last), batch_max is the
    true member max, waste = max - own, and lengths never increase
    across ascending batch ids."""
    import collections

    from outbreak_kg_ray.stages.pack import padded_batch_plan

    rows = padded_batch_plan(sf_dir, batch_size=8).take_all()
    assert rows
    batches = collections.defaultdict(list)
    for r in rows:
        assert r["pad_waste"] == r["batch_max_tokens"] - r["n_tokens"]
        assert r["pad_waste"] >= 0
        batches[r["batch_id"]].append(r)
    ordered = sorted(batches)
    assert ordered == list(range(len(ordered)))
    for b in ordered:
        members = batches[b]
        assert len(members) == (8 if b < len(ordered) - 1
                                else len(rows) - 8 * b)
        assert max(m["n_tokens"] for m in members) == \
            members[0]["batch_max_tokens"]
    # group-by-length: batch maxima are non-increasing
    maxima = [batches[b][0]["batch_max_tokens"] for b in ordered]
    assert maxima == sorted(maxima, reverse=True)
