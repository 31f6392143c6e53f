"""LM training-example construction: T5-style span corruption
(Raffel et al. 2020 §3.1.4) — rewrite each document into an
(input, target) pair where masked token spans are replaced by
numbered sentinels in the input and enumerated after their sentinels
in the target.  This is the step that turns a CLEANED corpus into
actual seq2seq training examples, downstream of the hygiene ops
(dedup_spans / decontaminate / pack_sequences).

Determinism: real T5 samples spans at random; a reproducible data
pipeline needs the mask to be a pure function of content position, so
the mask rule here is closed-form — token at 1-based position ``p``
of ``doc_id`` ``d`` is masked iff ``(d + p) % 7 < 2`` (≈28.6% noise
density in 2-token spans every 7 positions; the same
seeded-closed-form pattern every deterministic op in this repo uses,
mirrored exactly in the DuckDB oracle).

Scale shape: pure streaming ``map_batches`` — zero shuffle, zero
driver state; per-doc work is one numpy mask + span-boundary diff and
one join per output string.  At 100 TB this stage is
embarrassingly parallel and I/O-bound by construction.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from outbreak_kg_ray.functions.tokenize import tokens
from outbreak_kg_ray.sources.io import (
    empty_dataset,
    parquet_rows,
    read_parquet_clean,
)


def span_corruption_pairs(sf_dir: str, *, modulus: int = 7,
                          span: int = 2):
    """→ (doc_id, input_text, target_text, n_masked): T5 span
    corruption with the deterministic mask ``(doc_id + p) % modulus
    < span``.  Contiguous masked runs become one ``<extra_id_k>``
    sentinel (k numbered left to right) in the input; the target is
    ``<extra_id_k> tok tok <extra_id_k+1> tok ...`` in order.  Docs
    with no maskable token still emit a row (target empty) so the
    output is exactly one example per non-empty document."""
    from ..stages.decontam import tokenize

    schema = {
        "doc_id": pa.int64(), "input_text": pa.string(),
        "target_text": pa.string(), "n_masked": pa.int64(),
    }
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(schema)

    def corrupt(t: pa.Table) -> pa.Table:
        ids_out, inp_out, tgt_out, nm_out = [], [], [], []
        for doc_id, x in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            if not x.strip():
                continue
            toks = tokenize(x)
            n = len(toks)
            p = np.arange(1, n + 1, dtype=np.int64)
            mask = (doc_id + p) % modulus < span
            # span starts: masked positions whose predecessor is not
            start = mask & np.concatenate(([True], ~mask[:-1]))
            k = np.cumsum(start) - 1  # sentinel index per position
            inp_parts, tgt_parts = [], []
            for i in range(n):
                if mask[i]:
                    if start[i]:
                        s = f"<extra_id_{k[i]}>"
                        inp_parts.append(s)
                        tgt_parts.append(s)
                    tgt_parts.append(toks[i])
                else:
                    inp_parts.append(toks[i])
            ids_out.append(doc_id)
            inp_out.append(" ".join(inp_parts))
            tgt_out.append(" ".join(tgt_parts))
            nm_out.append(int(mask.sum()))
        return pa.table(
            {"doc_id": pa.array(ids_out, pa.int64()),
             "input_text": pa.array(inp_out, pa.string()),
             "target_text": pa.array(tgt_out, pa.string()),
             "n_masked": pa.array(nm_out, pa.int64())}
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(corrupt, batch_format="pyarrow")


def next_event_examples(sf_dir: str, *, context: int = 3):
    """GPT-style autoregressive example construction over the event
    log: one (user_id, event_id, context, target) training example
    per event with at least one same-user predecessor, where
    ``context`` is the space-joined previous up-to-3 event types in
    time order (oldest first) and ``target`` is the event's own type
    — the sequence-modeling analog of next-token prediction for
    behavioral models (session recommendation / churn LMs).

    Scale shape: ONE hash exchange (keyed_partitions by user_id),
    then a whole-partition vectorized sweep — one lexsort over
    (user, ts, event_id) and three shifted same-user masks build
    every example with zero per-group Python; output streams, no
    aggregation, no driver state."""
    schema = pa.schema(
        [("user_id", pa.int64()), ("event_id", pa.int64()),
         ("context", pa.string()), ("target", pa.string())]
    )
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(dict(zip(schema.names, schema.types)))

    from ..stages.shuffle import keyed_partitions

    def examples(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return schema.empty_table()
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid = uid[order], eid[order]
        et = g.column("event_type").to_numpy(zero_copy_only=False)[
            order
        ].astype(str)
        # lag-d predecessor value + same-user validity mask
        lags = []
        for d in range(1, context + 1):
            valid = np.zeros(n, dtype=bool)
            valid[d:] = uid[d:] == uid[:-d]
            prev = np.full(n, "", dtype=et.dtype)
            prev[d:] = et[:-d]
            lags.append((valid, np.where(valid, prev, "")))
        keep = lags[0][0]
        if not keep.any():
            return schema.empty_table()
        # oldest-first join: lag3 lag2 lag1, spaces only where present
        ctx = lags[0][1]
        for valid, prev in lags[1:]:
            ctx = np.char.add(
                np.where(valid, np.char.add(prev, " "), ""), ctx
            )
        return pa.table(
            {
                "user_id": pa.array(uid[keep], pa.int64()),
                "event_id": pa.array(eid[keep], pa.int64()),
                "context": pa.array(ctx[keep], pa.string()),
                "target": pa.array(et[keep], pa.string()),
            }
        )

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return keyed_partitions(events, ["user_id"], examples, schema=schema)


def negative_sampling_table(sf_dir: str, *, table_size: int = 1 << 16,
                            alpha: float = 0.75):
    """word2vec negative-sampling table construction (Mikolov et al.
    2013 §2.2): allot each vocabulary token a share of a
    ``table_size``-slot sampling table proportional to
    ``count^alpha`` → (token, freq, n_slots).  The op that turns
    corpus counts into the smoothed-unigram noise distribution
    contrastive word/embedding training samples from.

    Exactness: slot boundaries use INTEGER microweights
    (``round(count^0.75 * 1e6)`` as int64), so cumulative sums are
    exact in both engines — no float-accumulation-order drift —
    and ``n_slots = floor(S·hi/W) − floor(S·lo/W)`` reproduces
    bit-for-bit in SQL.  (table_size · total-microweight must fit
    int64 — at 2^16 slots that bounds the corpus at ~10^12 total
    microweight, beyond which nest the same scan.)

    Scale shape: the token-count pass is the standard
    np.unique-combiner grouped sum (vocab stays distributed); the
    driver holds one row per DISTINCT frequency (the Zipf spectrum —
    a few hundred rows at web scale) and turns it into exclusive
    microweight offsets, because every token of frequency c has the
    SAME microweight; one keyed exchange by frequency then assigns
    per-token ranges vectorized (rank · mw(c) is exact int math)."""
    from ray.data.aggregate import Sum

    from ..functions.rounding import np_round_half_away
    from ..stages.shuffle import keyed_partitions

    schema = pa.schema(
        [("token", pa.string()), ("freq", pa.int64()),
         ("n_slots", pa.int64())]
    )
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(dict(zip(schema.names, schema.types)))

    import ray

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def tf_partial(t: pa.Table) -> pa.Table:
        # shared oracle-exact tokenizer, one Arrow split kernel +
        # value_counts combiner — no Python loop over tokens
        import pyarrow.compute as pc

        from ..functions.tokenize import flat_tokens

        toks, _ = flat_tokens(t.column("text"))
        if len(toks) == 0:
            return pa.table(
                {"w": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(toks)
        return pa.table(
            {"w": vc.field("values").cast(pa.string()),
             "c": vc.field("counts").cast(pa.int64())}
        )

    tf = (
        docs.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="freq"))
    ).materialize()

    def spectrum_partial(t: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(
            t.column("freq").to_numpy(), return_counts=True
        )
        return pa.table(
            {"freq": pa.array(uniq, pa.int64()),
             "n": pa.array(cnt, pa.int64())}
        )

    spec = (
        tf.map_batches(spectrum_partial, batch_format="pyarrow")
        .groupby("freq")
        .aggregate(Sum("n", alias_name="n_terms"))
        .take_all()
    )  # one row per distinct frequency

    def microweight(c: int) -> int:
        return int(np_round_half_away(
            np.array([float(c) ** alpha * 1e6]), 0
        )[0])

    spec.sort(key=lambda r: -r["freq"])
    offs: dict[int, int] = {}
    acc = 0
    for r in spec:
        offs[r["freq"]] = acc
        acc += r["n_terms"] * microweight(r["freq"])
    total = acc
    state_ref = ray.put((offs, total))

    def assign(g: pa.Table) -> pa.Table:
        offs_, total_ = ray.get(state_ref)
        w_arr = np.asarray(g.column("w").to_pylist(), dtype=object)
        freq = g.column("freq").to_numpy(zero_copy_only=False)
        order = np.lexsort((w_arr, -freq))
        w_arr, freq = w_arr[order], freq[order]
        n = len(freq)
        first = np.concatenate(([True], freq[1:] != freq[:-1]))
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(n), 0)
        )
        mw = np.fromiter(
            (microweight(int(c)) for c in freq), dtype=np.int64, count=n
        )
        base = np.fromiter(
            (offs_[int(c)] for c in freq[first]), dtype=np.int64,
            count=int(first.sum()),
        )
        lo = base[np.cumsum(first) - 1] + (np.arange(n) - run_start) * mw
        hi = lo + mw
        n_slots = (table_size * hi) // total_ - (table_size * lo) // total_
        return pa.table(
            {
                "token": pa.array(w_arr.tolist(), pa.string()),
                "freq": pa.array(freq, pa.int64()),
                "n_slots": pa.array(n_slots, pa.int64()),
            }
        )

    return keyed_partitions(tf, ["freq"], assign, schema=schema)


def skipgram_pairs(sf_dir: str, *, window: int = 2,
                   min_count: int = 2):
    """Skip-gram (center, context) pair counts with a ±``window``
    token window (Mikolov et al. 2013 §2) → (center, context, n)
    for pairs seen ≥ ``min_count`` times — the co-occurrence stream
    word2vec/GloVe-style embedding training consumes, and the
    natural companion of :func:`negative_sampling_table`.

    Scale shape: pure streaming pair generation (zero state) with a
    batch-local ``np.unique`` combiner, then ONE grouped sum bounded
    by the distinct-pair vocabulary (≤ vocab² but Zipf-concentrated
    in practice); the min_count cut is a vectorized post-filter on
    the aggregate, never a driver collect."""
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    schema = pa.schema(
        [("center", pa.string()), ("context", pa.string()),
         ("n", pa.int64())]
    )
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(dict(zip(schema.names, schema.types)))

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        # vectorized adjacency: flatten the batch's tokens ONCE
        # (shared oracle-exact tokenizer), then distance-d pairs are
        # an aligned slice compare on the doc index — no Python loop
        from ..functions.tokenize import flat_tokens

        toks, idx = flat_tokens(t.column("text"))
        n_tok = len(toks)
        parts: list[pa.Array] = []
        for d in range(1, window + 1):
            if n_tok <= d:
                continue
            same_doc = pa.array(idx[:-d] == idx[d:])
            left = toks.slice(0, n_tok - d).filter(same_doc)
            right = toks.slice(d).filter(same_doc)
            # both directions: (center, context) and mirrored
            parts.append(pc.binary_join_element_wise(left, right, "\x1f"))
            parts.append(pc.binary_join_element_wise(right, left, "\x1f"))
        if not parts:
            return pa.table(
                {"pair": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(pa.concat_arrays(
            [p.cast(pa.string()) for p in parts]
        ))
        return pa.table(
            {"pair": vc.field("values").cast(pa.string()),
             "c": vc.field("counts").cast(pa.int64())}
        )

    counted = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("c", alias_name="n"))
    )

    def split(t: pa.Table) -> pa.Table:
        if "pair" not in t.column_names or len(t) == 0:
            return schema.empty_table()
        t = t.filter(
            pc.greater_equal(t.column("n"), pa.scalar(min_count))
        )
        parts = pc.split_pattern(t.column("pair"), "\x1f")
        return pa.table(
            {
                "center": pc.list_element(parts, 0),
                "context": pc.list_element(parts, 1),
                "n": t.column("n"),
            }
        )

    return counted.map_batches(split, batch_format="pyarrow")


def char_coverage_table(sf_dir: str, *, coverage_bp: int = 9995):
    """SentencePiece-style character-coverage table (Kudo &
    Richardson 2018, ``--character_coverage``): corpus character
    frequencies ranked (freq DESC, char ASC) with cumulative
    coverage, flagging the smallest prefix of the alphabet that
    covers ``coverage_bp``/10000 of all characters → (ch, freq,
    coverage, in_vocab).  The step that decides which characters a
    tokenizer keeps vs maps to <unk>.

    Exactness: the in_vocab cut is the INTEGER comparison
    ``cum_before · 10000 < total · coverage_bp`` — no float
    boundary; ``coverage`` itself is one int/int division rounded
    6 dp (identical doubles in both engines).

    Scale shape: per-batch ``Counter`` partials → ONE grouped sum
    bounded by the alphabet; the ranked rollup (≤ alphabet rows)
    finishes on the driver."""
    import collections

    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    cols = ["ch", "freq", "coverage", "in_vocab"]
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return pd.DataFrame(
            {"ch": pd.Series(dtype=str),
             "freq": pd.Series(dtype="int64"),
             "coverage": pd.Series(dtype=float),
             "in_vocab": pd.Series(dtype=bool)}
        )

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def char_partial(t: pa.Table) -> pa.Table:
        c = collections.Counter()
        for x in t.column("text").to_pylist():
            c.update(x)
        return pa.table(
            {"ch": pa.array(list(c.keys()), pa.string()),
             "f": pa.array(list(c.values()), pa.int64())}
        )

    rows = (
        docs.map_batches(char_partial, batch_format="pyarrow")
        .groupby("ch")
        .aggregate(Sum("f", alias_name="freq"))
        .take_all()
    )  # alphabet-bounded
    rows.sort(key=lambda r: (-r["freq"], r["ch"]))
    total = sum(r["freq"] for r in rows)
    out, cum = [], 0
    for r in rows:
        in_vocab = cum * 10000 < total * coverage_bp
        cum += r["freq"]
        out.append(
            {"ch": r["ch"], "freq": r["freq"],
             "coverage": round_half_away(cum / total, 6),
             "in_vocab": in_vocab}
        )
    return pd.DataFrame(out, columns=cols)


def token_dropout_augment(sf_dir: str, *, n_augments: int = 2,
                          modulus: int = 7):
    """EDA-style token-dropout augmentation (Wei & Zou 2019 random
    deletion, made reproducible): each document yields ``n_augments``
    variants where token at 1-based position ``p`` is dropped iff
    ``(doc_id + aug_id + p) % modulus == 0`` — the deterministic
    stand-in for random deletion, a pure function of content
    position like every seeded op in this repo → (doc_id, aug_id,
    text).  Docs whose variant drops every token still emit a row
    (empty text) so output cardinality is exactly docs × augments.

    Scale shape: pure streaming map_batches fan-out, zero shuffle,
    zero state."""
    schema = pa.schema(
        [("doc_id", pa.int64()), ("aug_id", pa.int64()),
         ("text", pa.string())]
    )
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(dict(zip(schema.names, schema.types)))

    def augment(t: pa.Table) -> pa.Table:
        ids_out, aug_out, txt_out = [], [], []
        for doc_id, x in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = tokens(x)
            n = len(toks)
            p = np.arange(1, n + 1, dtype=np.int64)
            for a in range(n_augments):
                keep = (doc_id + a + p) % modulus != 0
                ids_out.append(doc_id)
                aug_out.append(a)
                txt_out.append(
                    " ".join(np.asarray(toks, dtype=object)[keep])
                )
        return pa.table(
            {"doc_id": pa.array(ids_out, pa.int64()),
             "aug_id": pa.array(aug_out, pa.int64()),
             "text": pa.array(txt_out, pa.string())}
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(augment, batch_format="pyarrow")


def glove_cooccurrence(sf_dir: str, *, window: int = 4,
                       min_weight: float = 1.0):
    """GloVe-style distance-weighted co-occurrence counts (Pennington
    et al. 2014 §3: a pair at token distance ``d`` contributes
    ``1/d``): X[center, context] summed over a ±``window`` window →
    (center, context, x) with x rounded 6 dp, pairs with
    x ≥ ``min_weight`` kept.  The weighted companion of
    :func:`skipgram_pairs` — the actual matrix GloVe factorizes.

    Exactness: per-pair contributions are accumulated as INTEGER
    twelfths (1/d · 12 is an integer for every d ≤ 4), so the grouped
    sum is exact int math and the single final division by 12 yields
    identical doubles in both engines — no float-accumulation-order
    drift.

    Scale shape: identical to skipgram_pairs — streaming pair
    generation with an np.unique combiner, ONE grouped sum bounded by
    the pair vocabulary."""
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    from ..functions.rounding import np_round_half_away

    schema = pa.schema(
        [("center", pa.string()), ("context", pa.string()),
         ("x", pa.float64())]
    )
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(dict(zip(schema.names, schema.types)))

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    # 1/d as exact integer shares of lcm(1..window) — for the
    # default window=4 that is twelfths (d=1→12, 2→6, 3→4, 4→3),
    # and any larger window scales by its own lcm instead of dying
    # on a hardcoded-12 assert (round-4 advisor finding)
    denom = math.lcm(*range(1, window + 1))
    WEIGHT = {d: denom // d for d in range(1, window + 1)}

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        # vectorized like skipgram_pairs: one flatten, distance-d
        # adjacency via aligned slice compare, Arrow group_by combiner
        from ..functions.tokenize import flat_tokens

        toks, idx = flat_tokens(t.column("text"))
        n_tok = len(toks)
        pair_parts: list[pa.Array] = []
        w_parts: list[np.ndarray] = []
        for d in range(1, window + 1):
            if n_tok <= d:
                continue
            same_doc = pa.array(idx[:-d] == idx[d:])
            left = toks.slice(0, n_tok - d).filter(same_doc)
            right = toks.slice(d).filter(same_doc)
            fwd = pc.binary_join_element_wise(left, right, "\x1f")
            rev = pc.binary_join_element_wise(right, left, "\x1f")
            pair_parts.extend([fwd, rev])
            w = np.full(len(fwd), WEIGHT[d], dtype=np.int64)
            w_parts.extend([w, w])
        if not pair_parts:
            return pa.table(
                {"pair": pa.array([], pa.string()),
                 "w12": pa.array([], pa.int64())}
            )
        raw = pa.table(
            {"pair": pa.concat_arrays(
                [p.cast(pa.string()) for p in pair_parts]
             ),
             "w12": pa.array(np.concatenate(w_parts), pa.int64())}
        )
        agg = raw.group_by("pair").aggregate([("w12", "sum")])
        return agg.rename_columns(["pair", "w12"])

    counted = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("w12", alias_name="w12"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if "pair" not in t.column_names or len(t) == 0:
            return schema.empty_table()
        t = t.filter(
            pc.greater_equal(
                t.column("w12"), pa.scalar(int(min_weight * denom))
            )
        )
        parts = pc.split_pattern(t.column("pair"), "\x1f")
        x = t.column("w12").to_numpy(zero_copy_only=False) / float(denom)
        return pa.table(
            {
                "center": pc.list_element(parts, 0),
                "context": pc.list_element(parts, 1),
                "x": pa.array(np_round_half_away(x, 6), pa.float64()),
            }
        )

    return counted.map_batches(finalize, batch_format="pyarrow")
