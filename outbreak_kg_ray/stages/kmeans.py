"""Distributed vector aggregation and k-means over the embeddings
table.

``label_centroids`` is the grouped VECTOR aggregate (per-key mean
embedding): per-batch float64 partial sums in long format
``(key, dim, s, c)`` so the shuffle input is keys × dims — bounded —
regardless of corpus size.

``kmeans_clusters`` is fixed-round distributed Lloyd's — the
canonical iterative-ML shape on Ray Data: each round is ONE streamed
pass (``map_batches`` computes assignments + per-cluster partial
sums; a k×dim-bounded grouped aggregate re-centers on the driver),
centroids ride in the object store between rounds.  Deterministic:
init = first-k vectors by vec_id, float64 arithmetic, argmin ties
break to the lowest cluster id.  Approximate-by-construction
cross-engine (float summation order), so the driver checks it
rows-only; tests pin invariants (monotone inertia, determinism,
agreement with a single-process numpy reference).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from outbreak_kg_ray.functions.rounding import round_half_away
from outbreak_kg_ray.sources.io import read_parquet_clean


def _embeddings(sf_dir: str, columns=("vec_id", "embedding")):
    return read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=list(columns)
    )


def _batch_matrix(t: pa.Table) -> np.ndarray:
    """Zero-ish-copy (one cast) batch → (n, dim) float64 matrix."""
    col = t.column("embedding").combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(len(t), -1)


def label_centroids(sf_dir: str):
    """→ (label, dim, mean_value) — mean embedding per label in long
    format (SQL-comparable).  Shuffle input is labels × dims × blocks
    partial rows, never vectors."""
    from ray.data.aggregate import Sum

    ds = _embeddings(sf_dir, ("label", "embedding"))

    def partials(t: pa.Table) -> pa.Table:
        mat = _batch_matrix(t)
        dim = mat.shape[1]
        labels = t.column("label").to_numpy()
        uniq = np.unique(labels)
        out_l, out_d, out_s, out_c = [], [], [], []
        for lab in uniq:
            sub = mat[labels == lab]
            out_l.extend([int(lab)] * dim)
            out_d.extend(range(dim))
            out_s.extend(sub.sum(axis=0).tolist())
            out_c.extend([len(sub)] * dim)
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "dim": pa.array(out_d, pa.int64()),
                "s": pa.array(out_s, pa.float64()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        means = [
            round_half_away(s / c, 6)
            for s, c in zip(
                t.column("s").to_pylist(), t.column("c").to_pylist()
            )
        ]
        return pa.table(
            {
                "label": t.column("label"),
                "dim": t.column("dim"),
                "mean_value": pa.array(means, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    """First ``k`` vectors by vec_id — a bounded, deterministic read
    (k rows), the distributed stand-in for seeded init."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],  # row-group-pruned: k rows, not the corpus
    )
    order = np.argsort(t.column("vec_id").to_numpy(), kind="stable")
    mat = _batch_matrix(t)
    return mat[order].copy()


def assign_clusters(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Squared-euclidean argmin via the expanded form; ties go to the
    lowest cluster id (np.argmin)."""
    d2 = (
        (mat * mat).sum(axis=1, keepdims=True)
        - 2.0 * mat @ cent.T
        + (cent * cent).sum(axis=1)
    )
    return np.argmin(d2, axis=1)


_LLOYD_REMOTES = None


def _lloyd_remotes():
    """Lazily-defined remote fns (module import must not require an
    initialized Ray)."""
    global _LLOYD_REMOTES
    if _LLOYD_REMOTES is None:
        import ray

        @ray.remote(num_cpus=1)
        def lloyd_partial(block: pa.Table, cent: np.ndarray):
            k, dim = cent.shape
            if block.num_rows == 0:
                return np.zeros((k, dim)), np.zeros(k, dtype=np.int64)
            mat = _batch_matrix(block)
            a = assign_clusters(mat, cent)
            sums = np.zeros((k, dim))
            for ci in np.unique(a):
                sums[ci] = mat[a == ci].sum(axis=0)
            return sums, np.bincount(a, minlength=k).astype(np.int64)

        @ray.remote(num_cpus=1)
        def lloyd_reduce(*parts):
            sums = parts[0][0].copy()
            counts = parts[0][1].copy()
            for s, c in parts[1:]:
                sums += s
                counts += c
            return sums, counts

        _LLOYD_REMOTES = (lloyd_partial, lloyd_reduce)
    return _LLOYD_REMOTES


def lloyd_centroids(sf_dir: str, *, k: int = 8,
                    rounds: int = 5, ds=None) -> np.ndarray:
    """Fixed-round distributed Lloyd's → the trained k×dim centroid
    matrix (shared by ``kmeans_clusters`` and ``semantic_dedup``).

    Iterative-barrier execution is the one shape where raw Ray tasks
    beat a Dataset pass: the per-round state is a driver-held k×dim
    matrix, and routing it through ``map_batches`` → grouped
    aggregate → ``take_all`` paid a full streaming-executor startup
    plus an all-to-all PER ROUND for k×dim-bounded payloads
    (measured: 5 rounds ≈ 5 s of pure orchestration at sf0.1).
    Instead the pinned dataset's Arrow blocks are taken as object
    refs ONCE (``to_arrow_refs`` — zero-copy handles to the
    materialized blocks), and each round launches one task per block
    returning a dense (k×dim sums, k counts) pair; a fan-in-32 tree
    reduce keeps the driver's in-flight set bounded by 64 partials
    regardless of block count, and the fixed fold order keeps the
    result deterministic. Empty clusters keep their previous
    centroid (standard Lloyd's fallback)."""
    import ray

    cent = _init_centroids(sf_dir, k)
    if ds is None:
        # pin the vectors once — every round re-reads them, and
        # re-decoding parquet ×rounds was pure waste (callers that
        # need a post-training pass share the same pinned ds)
        ds = _embeddings(sf_dir).materialize()
    blocks = [b for b in ds.to_arrow_refs()]
    if not blocks:
        return cent
    lloyd_partial, lloyd_reduce = _lloyd_remotes()

    for _ in range(rounds):
        cent_ref = ray.put(cent)
        refs = [lloyd_partial.remote(b, cent_ref) for b in blocks]
        while len(refs) > 64:
            refs = [
                lloyd_reduce.remote(*refs[i:i + 32])
                for i in range(0, len(refs), 32)
            ]
        parts = ray.get(refs)
        sums = parts[0][0].copy()
        counts = parts[0][1].copy()
        for s, c in parts[1:]:
            sums += s
            counts += c
        nz = counts > 0
        new = cent.copy()
        new[nz] = sums[nz] / counts[nz, None]
        cent = new

    return cent


def kmeans_clusters(sf_dir: str, *, k: int = 8, rounds: int = 5):
    """Fixed-round distributed Lloyd's → (vec_id, cluster): train via
    ``lloyd_centroids`` then one assignment-only pass."""
    import ray

    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/embeddings.parquet") == 0:
        return empty_dataset({
            "vec_id": pa.int64(), "cluster": pa.int64(),
        })

    emb = _embeddings(sf_dir).materialize()
    cent = lloyd_centroids(sf_dir, k=k, rounds=rounds, ds=emb)
    final_ref = ray.put(cent)

    def assignments(t: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        mat = _batch_matrix(t)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": pa.array(assign_clusters(mat, c), pa.int64()),
            }
        )

    return emb.map_batches(assignments, batch_format="pyarrow")


def semantic_dedup(sf_dir: str, *, k: int = 8, rounds: int = 5,
                   threshold: float = 0.35):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with distributed k-means,
    then inside each cluster drop every vector whose cosine
    similarity to an EARLIER (lower vec_id) cluster member exceeds
    ``threshold`` — the min-id representative of each semantic ball
    survives (T5's deterministic first-wins policy).

    Scale shape: training exchanges are k×dim-bounded
    (``lloyd_centroids``); the dedup itself is ONE cluster-keyed
    shuffle followed by a per-group vectorized pass (normalize +
    one gram matmul, upper-triangular mask).  The O(|cluster|²)
    gram is the documented partitioning assumption: ``k`` must grow
    with the corpus so clusters stay ~1e4 vectors (the paper uses
    k ∝ N); hub-free by construction since k-means balances cells.

    → (vec_id, cluster, keep, max_prior_sim) — rows-only vs the
    driver (iterative k-means isn't SQL-expressible); exactness is
    pinned by a numpy whole-corpus reference test.  The default
    threshold matches the engine's cosine near-dup convention
    (``embedding_near_dups``; real SemDeDup on real embeddings uses
    ~0.95 — the testdata's synthetic vectors top out at cosine
    ~0.48)."""
    import ray

    from outbreak_kg_ray.functions.rounding import round_half_away
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/embeddings.parquet") == 0:
        return empty_dataset({
            "vec_id": pa.int64(), "cluster": pa.int64(),
            "keep": pa.bool_(), "max_prior_sim": pa.float64(),
        })

    emb = _embeddings(sf_dir).materialize()
    cent_ref = ray.put(lloyd_centroids(sf_dir, k=k, rounds=rounds, ds=emb))

    def with_cluster(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _batch_matrix(t)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": pa.array(assign_clusters(mat, c), pa.int64()),
                "embedding": t.column("embedding"),
            }
        )

    assigned = emb.map_batches(with_cluster, batch_format="pyarrow")

    def prune(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("vec_id", "ascending")])
        t = t.take(order)
        mat = _batch_matrix(t)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        xn = mat / norms[:, None]
        sims = xn @ xn.T
        # [i, j] = sim of earlier member i to j; mask diag + lower
        g = np.where(np.tri(len(xn), dtype=bool), -np.inf, sims)
        max_prior = g.max(axis=0)
        # no prior member (the first row) → sentinel -1
        max_prior = np.where(np.isinf(max_prior), -1.0, max_prior)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": t.column("cluster"),
                "keep": pa.array(
                    (max_prior <= threshold).tolist(), pa.bool_()
                ),
                "max_prior_sim": pa.array(
                    [round_half_away(float(s), 6) for s in max_prior],
                    pa.float64(),
                ),
            }
        )

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pyarrow"
    )


def embedding_outliers(sf_dir: str, *, threshold: float = 0.0):
    """Per-vector cosine similarity to its OWN label's mean embedding,
    with an outlier flag — the embedding-space quality gate a training
    pipeline uses to drop mislabeled / off-distribution examples
    (contrastive-filtering shape: CLIP-score-style pruning against a
    class prototype).

    Scale shape: pass 1 is the label_centroids exchange — per-batch
    float64 partial sums in (label, dim) long format, so the shuffle
    is labels × dims × blocks regardless of corpus size; the finished
    centroid matrix (labels × dims — vocabulary-bounded) is the ONLY
    thing the driver holds, broadcast once via ``ray.put``.  Pass 2
    streams: one matmul per batch against the resident centroid
    matrix inside an actor pool.  The flag compares the 6-dp ROUNDED
    cosine so the cross-engine boundary decision is identical to the
    DuckDB oracle's."""
    import ray
    from ray.data.aggregate import Sum

    ds = _embeddings(sf_dir, ("vec_id", "label", "embedding"))

    def partials(t: pa.Table) -> pa.Table:
        mat = _batch_matrix(t)
        dim = mat.shape[1]
        labels = t.column("label").to_numpy()
        uniq = np.unique(labels)
        out_l, out_d, out_s, out_c = [], [], [], []
        for lab in uniq:
            sub = mat[labels == lab]
            out_l.extend([int(lab)] * dim)
            out_d.extend(range(dim))
            out_s.extend(sub.sum(axis=0).tolist())
            out_c.extend([len(sub)] * dim)
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "dim": pa.array(out_d, pa.int64()),
                "s": pa.array(out_s, pa.float64()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    # labels × dims rows — bounded.  The finished centroid is
    # QUANTIZED to 6 dp on both sides of the oracle boundary: the
    # raw mean differs between engines by O(n·eps) accumulation
    # order (~1e-9 with float32-origin data), which at sf0.1 landed
    # a cosine exactly on a 6-dp rounding boundary (vec 991:
    # 0.1100034999 vs 0.1100035001).  Rounding the centroid first
    # shrinks the surviving cross-engine delta to the 64-term
    # dot-sum order (~1e-15), making a boundary hit impossible in
    # practice; the oracle SQL applies the same round(avg(v), 6).
    cent_rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
        .to_pandas()
    )
    if cent_rows.empty or "label" not in cent_rows.columns:
        # empty corpus: Ray's empty aggregate loses the schema
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
            "centroid_cos": pa.array([], pa.float64()),
            "is_outlier": pa.array([], pa.bool_()),
        }))
    labels = np.sort(cent_rows["label"].unique())
    dim = int(cent_rows["dim"].max()) + 1
    cent = np.zeros((len(labels), dim), dtype=np.float64)
    label_pos = {int(l): i for i, l in enumerate(labels)}
    for _, r in cent_rows.iterrows():
        cent[label_pos[int(r["label"])], int(r["dim"])] = r["s"] / r["c"]
    from outbreak_kg_ray.functions.rounding import np_round_half_away

    cent = np_round_half_away(cent, 6)
    cent_ref = ray.put((label_pos, cent))

    class OutlierStage:
        def __init__(self, ref) -> None:
            self._label_pos, self._cent = ray.get(ref)
            self._cnorm2 = (self._cent * self._cent).sum(axis=1)

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = _batch_matrix(t)
            labs = t.column("label").to_numpy()
            rows = np.array(
                [self._label_pos[int(l)] for l in labs], dtype=np.int64
            )
            c = self._cent[rows]
            dots = (mat * c).sum(axis=1)
            nv2 = (mat * mat).sum(axis=1)
            nc2 = self._cnorm2[rows]
            # same float expression as the oracle: dot / sqrt(nv*nc)
            cos = dots / np.sqrt(nv2 * nc2)
            cos_r = np.array(
                [round_half_away(x, 6) for x in cos], dtype=np.float64
            )
            return pa.table(
                {
                    "vec_id": t.column("vec_id"),
                    "label": t.column("label"),
                    "centroid_cos": pa.array(cos_r, pa.float64()),
                    "is_outlier": pa.array(
                        cos_r < threshold, pa.bool_()
                    ),
                }
            )

    from outbreak_kg_ray.stages.maputil import map_stage

    return map_stage(
        ds, OutlierStage, batch_size=2048, ctor_args=(cent_ref,),
    )
