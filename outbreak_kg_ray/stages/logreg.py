"""Distributed logistic-regression training by full-batch gradient
descent over the embedding column — the supervised sibling of the
Lloyd's k-means trainer (`stages/kmeans.py`): per-round state is a
driver-held (dim+1) weight vector, per-block work is one vectorized
gradient partial, and the exchange per round is dim+1 floats per
block.  This is the "train a small model ON the data pipeline"
capability (quality classifiers, calibration heads, probes) expressed
Ray-natively.

Same iterative-barrier execution choice as Lloyd's (measured there):
raw Ray tasks over block refs pinned ONCE via ``to_arrow_refs``, a
fan-in-32 tree reduce bounding the driver's in-flight set, fixed fold
order for determinism.  A Dataset pass per round would pay executor
startup + an all-to-all for a (dim+1)-float payload.

Label: ``label == 0`` (the embeddings table's own class column) —
binary one-vs-rest, the standard probe-head setup.  Fixed rounds and
a fixed learning rate keep the run deterministic; rows-only by design
(iterative optimization isn't SQL-expressible) with the
single-process numpy reference pinned in tests/test_mlstats.py
(same rounds/lr reproduce the distributed weights to float
tolerance, and per-round loss is strictly decreasing on testdata).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_REMOTES = None


def _batch_matrix(t: pa.Table) -> np.ndarray:
    col = t.column("embedding").combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(len(t), -1)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically-stable piecewise form (exp of negatives only)
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _grad_block(block: pa.Table, w: np.ndarray):
    """→ (gradient partial [dim+1], log-loss partial, n) for one
    Arrow block under weights ``w`` (bias first)."""
    if block.num_rows == 0:
        return np.zeros_like(w), 0.0, 0
    x = _batch_matrix(block)
    y = (
        block.column("label").to_numpy().astype(np.int64) == 0
    ).astype(np.float64)
    z = w[0] + x @ w[1:]
    p = _sigmoid(z)
    resid = p - y
    g = np.concatenate(([resid.sum()], x.T @ resid))
    # clipped log-loss (the reference clips identically)
    pc_ = np.clip(p, 1e-12, 1.0 - 1e-12)
    loss = -(y * np.log(pc_) + (1.0 - y) * np.log(1.0 - pc_)).sum()
    return g, float(loss), len(y)


def _remotes():
    global _REMOTES
    if _REMOTES is None:
        import ray

        @ray.remote(num_cpus=1)
        def grad_partial(block: pa.Table, w: np.ndarray):
            return _grad_block(block, w)

        @ray.remote(num_cpus=1)
        def grad_reduce(*parts):
            g = parts[0][0].copy()
            loss = parts[0][1]
            n = parts[0][2]
            for gp, lp, np_ in parts[1:]:
                g += gp
                loss += lp
                n += np_
            return g, loss, n

        _REMOTES = (grad_partial, grad_reduce)
    return _REMOTES


def train_logreg(sf_dir: str, *, rounds: int = 20, lr: float = 0.5,
                 ds=None) -> tuple[np.ndarray, list[float]]:
    """→ (weights [bias + dim], per-round mean log-loss).  Blocks are
    pinned once; each round is one task per block + tree reduce."""
    import ray

    from outbreak_kg_ray.sources.io import read_parquet_clean

    if ds is None:
        ds = read_parquet_clean(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        ).materialize()
    blocks = list(ds.to_arrow_refs())
    # dim from the first non-empty block (driver holds dim floats)
    dim = None
    for b in blocks:
        tbl = ray.get(b)
        if tbl.num_rows:
            dim = len(tbl.column("embedding")[0])
            break
    if dim is None:
        return np.zeros(1), []
    w = np.zeros(dim + 1)
    losses: list[float] = []
    grad_partial, grad_reduce = _remotes()
    for _ in range(rounds):
        w_ref = ray.put(w)
        refs = [grad_partial.remote(b, w_ref) for b in blocks]
        while len(refs) > 64:
            refs = [
                grad_reduce.remote(*refs[i:i + 32])
                for i in range(0, len(refs), 32)
            ]
        parts = ray.get(refs)
        g = parts[0][0].copy()
        loss = parts[0][1]
        n = parts[0][2]
        for gp, lp, np_ in parts[1:]:
            g += gp
            loss += lp
            n += np_
        losses.append(loss / n)
        w = w - lr * g / n
    return w, losses


def logreg_scores(sf_dir: str, *, rounds: int = 20, lr: float = 0.5):
    """→ (vec_id, p, pred): per-vector probability that
    ``label == 0`` under the trained probe, and the 0.5-threshold
    prediction.  Training via ``train_logreg`` (blocks pinned once,
    shared with the scoring pass); scoring is one streamed broadcast
    pass.  Rows-only by design; numpy reference + monotone-loss
    invariants in tests/test_mlstats.py."""
    import ray

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import (
        empty_dataset,
        parquet_rows,
        read_parquet_clean,
    )
    from .maputil import map_stage

    schema = {
        "vec_id": pa.int64(), "p": pa.float64(), "pred": pa.int8(),
    }
    if parquet_rows(f"{sf_dir}/embeddings.parquet") == 0:
        return empty_dataset(schema)
    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    ).materialize()
    w, _ = train_logreg(sf_dir, rounds=rounds, lr=lr, ds=ds)
    w_ref = ray.put(w)

    class ScoreStage:
        def __init__(self, r) -> None:
            self._w = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            x = _batch_matrix(t)
            p = _sigmoid(self._w[0] + x @ self._w[1:])
            return pa.table(
                {"vec_id": t.column("vec_id"),
                 "p": pa.array(
                     [round_half_away(float(v), 6) for v in p],
                     pa.float64(),
                 ),
                 "pred": pa.array(
                     (p >= 0.5).astype(np.int8), pa.int8()
                 )}
            )

    return map_stage(ds, ScoreStage, batch_size=2048, ctor_args=(w_ref,))
