"""Classical-ML corpus statistics — the model-fitting prep stages a
training-data pipeline runs AFTER cleaning: a Zipf power-law fit of
the token frequency spectrum, a multinomial Naive-Bayes source
classifier (the fastText-style quality/domain classifier of webtext
pipelines — CCNet / GPT-3 appendix A use exactly this shape: train on
labeled subsets, score the whole corpus), and PCA over the embedding
column (covariance → eigendecomposition → projection, the classical
dimensionality reducer run before clustering / ANN indexing).

Reference parity: the reference has no ML-prep stage (its nearest
relative is the mesh_csr term-document matrix, kg/mesh_csr.py:62-77,
which this repo's encode.py family covers); these operators are
engine additions from the "large-scale training-data pipeline" brief.

Scale shapes (all bounded-exchange, nothing corpus-sized leaves the
cluster):

- ``zipf_slope``: token counts via per-batch ``np.unique``
  pre-aggregation → one (token, count) grouped sum → the DISTRIBUTED
  top-V cut (``docops._topv_rows``: sort + limit, driver holds ≤ V
  rows) → closed-form OLS on ≤ V (ln rank, ln count) pairs.
- ``nb_source_scores`` / ``nb_source_pred``: training is counting —
  one (source, token, count) grouped sum (vocabulary × classes
  bounded, the NB model's own size), priors from a classes-bounded
  count; the model broadcasts once via ``ray.put`` and scoring is a
  streaming ``map_batches`` pass (vectorized per-token lookup, one
  matrix add per doc).
- ``embedding_covariance`` / ``pca_projection``: one streaming pass
  emits per-batch moment partials in long format (i, j, Σxᵢxⱼ) for
  i ≤ j plus first moments — dim(dim+3)/2+1 rows per batch — through
  ONE grouped sum; the driver holds dim²-bounded moments only (64²
  here; never vectors).  PCA eigendecomposes the dim×dim covariance
  on the driver (O(dim³), micro) and projects in a second streaming
  pass with the (mean, components) broadcast once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from outbreak_kg_ray.sources.io import (
    empty_dataset,
    parquet_rows,
    read_parquet_clean,
)
from outbreak_kg_ray.functions.rounding import round_half_away


def _documents(sf_dir: str, columns=("doc_id", "text")):
    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=list(columns)
    )


def _embeddings(sf_dir: str, columns=("vec_id", "embedding")):
    return read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=list(columns)
    )


def _batch_matrix(t: pa.Table) -> np.ndarray:
    col = t.column("embedding").combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(len(t), -1)


# ---------------------------------------------------------------- zipf


def zipf_slope(sf_dir: str, *, vocab_size: int = 1 << 16):
    """Power-law fit of the corpus token frequency spectrum: OLS of
    ln(count) on ln(rank) over the top-``vocab_size`` tokens ranked
    by (count DESC, token ASC).  → one row
    (n_vocab, slope, intercept); a healthy natural-language corpus
    sits near slope −1 (Zipf's law), so the fit is the standard
    one-number drift monitor for a webtext ingest.

    The driver never holds more than ``vocab_size`` (token, count)
    rows: the rank cut is the distributed sort+limit
    (``docops._topv_rows``); the OLS reduction is closed-form over
    that bounded table.
    """
    from ray.data.aggregate import Sum

    from .docops import _topv_rows
    from ..stages.decontam import tokenize

    out_schema = {
        "n_vocab": pa.int64(),
        "slope": pa.float64(),
        "intercept": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(out_schema)

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

    vocab_ds = (
        _documents(sf_dir)
        .map_batches(counts, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
    )
    top = _topv_rows(vocab_ds, "w", "c", vocab_size)  # ≤ vocab_size
    if len(top) < 2:  # slope undefined on a 0/1-token vocabulary
        return empty_dataset(out_schema)
    c = np.asarray([float(r["c"]) for r in top])
    rank = np.arange(1, len(top) + 1, dtype=np.float64)
    x, y = np.log(rank), np.log(c)
    xm, ym = x.mean(), y.mean()
    denom = float(((x - xm) ** 2).sum())
    slope = float(((x - xm) * (y - ym)).sum()) / denom
    intercept = ym - slope * xm
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "n_vocab": pa.array([len(top)], pa.int64()),
                "slope": pa.array(
                    [round_half_away(slope, 6)], pa.float64()
                ),
                "intercept": pa.array(
                    [round_half_away(intercept, 6)], pa.float64()
                ),
            }
        )
    )


# -------------------------------------------------- naive bayes


def _nb_model(sf_dir: str, vocab_size: int, alpha: float):
    """Train the multinomial NB model: returns (sources sorted,
    log_prior per source, vocab token → row index, per-class
    log-likelihood matrix [vocab × classes]).  Every exchange is (source, token, count) — the
    model's own size — never token streams."""
    from ray.data.aggregate import Sum

    from .docops import _topv_rows
    from ..stages.decontam import tokenize

    docs = _documents(sf_dir, ("doc_id", "text", "source"))

    def pair_counts(t: pa.Table) -> pa.Table:
        srcs, toks = [], []
        for s, x in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            if x.strip():
                for w in tokenize(x):
                    srcs.append(s)
                    toks.append(w)
        if not toks:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "w": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        key = np.asarray(
            [s + "\x1f" + w for s, w in zip(srcs, toks)], dtype=object
        )
        uniq, cnt = np.unique(key, return_counts=True)
        split = [k.split("\x1f", 1) for k in uniq.tolist()]
        return pa.table(
            {"source": pa.array([s for s, _ in split], pa.string()),
             "w": pa.array([w for _, w in split], pa.string()),
             "c": pa.array(cnt, pa.int64())}
        )

    sw = (
        docs.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["source", "w"])
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    if sw.count() == 0:
        return None

    # vocabulary cut over the global (token, count) rollup of the
    # same exchange output — ≤ vocab_size rows reach the driver
    vocab_ds = sw.groupby("w").aggregate(Sum("c", alias_name="c"))
    top = _topv_rows(vocab_ds, "w", "c", vocab_size)
    vocab = {r["w"]: i for i, r in enumerate(top)}
    v = len(vocab)

    # per-(class, in-vocab token) counts: ≤ vocab × classes rows —
    # the NB model artifact itself; bounded by construction
    rows = [
        r
        for b in sw.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
        if r["w"] in vocab
    ]
    sources = sorted({r["source"] for r in rows})
    src_ix = {s: i for i, s in enumerate(sources)}
    counts = np.zeros((v, len(sources)), dtype=np.float64)
    for r in rows:
        counts[vocab[r["w"]], src_ix[r["source"]]] = float(r["c"])
    n_tok = counts.sum(axis=0)
    # Laplace smoothing: zero-count (class, token) cells already get
    # ln(alpha / (n_tok + alpha·V)) from the matrix itself
    loglik = np.log((counts + alpha) / (n_tok + alpha * v))

    # priors: per-class doc counts over non-empty docs (classes-bounded)
    def doc_counts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(
            pc.utf8_trim_whitespace(t.column("text")), ""
        )
        f = t.filter(keep)
        uniq, cnt = np.unique(
            np.asarray(f.column("source").to_pylist(), dtype=object),
            return_counts=True,
        )
        return pa.table(
            {"source": pa.array(uniq.tolist(), pa.string()),
             "c": pa.array(cnt, pa.int64())}
        )

    prior_rows = (
        docs.map_batches(doc_counts, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )  # ≤ n_classes rows
    n_docs = float(sum(r["c"] for r in prior_rows))
    log_prior = np.full(len(sources), -np.inf)
    for r in prior_rows:
        log_prior[src_ix[r["source"]]] = np.log(r["c"] / n_docs)
    return sources, log_prior, vocab, loglik


_NB_SCHEMA = {
    "doc_id": pa.int64(),
    "cls_source": pa.string(),
    "logprob": pa.float64(),
}


def nb_source_scores(sf_dir: str, *, vocab_size: int = 1 << 16,
                     alpha: float = 1.0):
    """Multinomial Naive-Bayes scoring matrix: for every non-empty
    document and every class (= ``source`` label), the joint
    log-probability ln P(class) + Σ_tokens ln P(token | class) under
    the Laplace-``alpha``-smoothed capped-vocabulary model trained on
    the corpus itself.  → (doc_id, cls_source, logprob) long format —
    docs × classes rows.

    This is the fastText-style corpus classifier of webtext pipelines
    (CCNet's LM filter, GPT-3's quality classifier) reduced to its
    deterministic core: training IS counting (one bounded grouped
    sum), scoring IS a broadcast streaming pass.  Tokens outside the
    top-``vocab_size`` vocabulary are skipped (standard capped-vocab
    semantics); below the cap — all testdata scales — the model is
    the exact MLE-smoothed NB.
    """
    import ray

    model = _nb_model(sf_dir, vocab_size, alpha)
    if model is None:
        return empty_dataset(_NB_SCHEMA)
    sources, log_prior, vocab, loglik = model
    model_ref = ray.put((sources, log_prior, vocab, loglik))

    from ..stages.maputil import map_stage

    class ScoreStage:
        def __init__(self, ref) -> None:
            (self._sources, self._prior, self._vocab,
             self._ll) = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            from ..stages.decontam import tokenize

            srcs, prior = self._sources, self._prior
            vocab, ll = self._vocab, self._ll
            k = len(srcs)
            ids_out, cls_out, lp_out = [], [], []
            for doc_id, x in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
            ):
                if not x.strip():
                    continue
                ix = [vocab[w] for w in tokenize(x) if w in vocab]
                if not ix:
                    continue  # no in-vocab evidence: skip (documented)
                score = prior + ll[np.asarray(ix)].sum(axis=0)
                ids_out.extend([doc_id] * k)
                cls_out.extend(srcs)
                lp_out.extend(
                    round_half_away(float(s), 6) for s in score
                )
            return pa.table(
                {"doc_id": pa.array(ids_out, pa.int64()),
                 "cls_source": pa.array(cls_out, pa.string()),
                 "logprob": pa.array(lp_out, pa.float64())}
            )

    return map_stage(
        _documents(sf_dir), ScoreStage, batch_size=512,
        ctor_args=(model_ref,),
    )


def nb_source_pred(sf_dir: str, *, vocab_size: int = 1 << 16,
                   alpha: float = 1.0):
    """Argmax prediction over the NB scoring matrix: one row per doc
    (doc_id, pred_source, logprob) — the class with the highest
    ROUNDED logprob, ties broken by class name ASC (rounding first
    makes the argmax reproducible across summation orders; the same
    rounded ranking runs in the oracle).  Scoring stays streaming;
    the argmax is per-row within the score stage (no extra shuffle —
    each doc's k class scores are produced together)."""
    import ray

    model = _nb_model(sf_dir, vocab_size, alpha)
    if model is None:
        return empty_dataset(
            {"doc_id": pa.int64(), "pred_source": pa.string(),
             "logprob": pa.float64()}
        )
    sources, log_prior, vocab, loglik = model
    model_ref = ray.put((sources, log_prior, vocab, loglik))

    from ..stages.maputil import map_stage

    class PredStage:
        def __init__(self, ref) -> None:
            (self._sources, self._prior, self._vocab,
             self._ll) = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            from ..stages.decontam import tokenize

            srcs, prior = self._sources, self._prior
            vocab, ll = self._vocab, self._ll
            ids_out, pred_out, lp_out = [], [], []
            for doc_id, x in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
            ):
                if not x.strip():
                    continue
                ix = [vocab[w] for w in tokenize(x) if w in vocab]
                if not ix:
                    continue
                score = prior + ll[np.asarray(ix)].sum(axis=0)
                rounded = [round_half_away(float(s), 6) for s in score]
                # argmax by (rounded logprob DESC, class name ASC)
                best = min(
                    range(len(srcs)),
                    key=lambda i: (-rounded[i], srcs[i]),
                )
                ids_out.append(doc_id)
                pred_out.append(srcs[best])
                lp_out.append(rounded[best])
            return pa.table(
                {"doc_id": pa.array(ids_out, pa.int64()),
                 "pred_source": pa.array(pred_out, pa.string()),
                 "logprob": pa.array(lp_out, pa.float64())}
            )

    return map_stage(
        _documents(sf_dir), PredStage, batch_size=512,
        ctor_args=(model_ref,),
    )


# ------------------------------------------------ covariance / PCA


def _moment_partials(sf_dir: str):
    """One streaming pass → grouped (i, j, v) moment sums:
    (i, j≥i) rows carry Σxᵢxⱼ, (i, -1) rows carry Σxᵢ, (-1, -1)
    carries the row count.  Exchange volume per batch is
    dim(dim+3)/2 + 1 rows — dim-bounded, never vectors."""
    from ray.data.aggregate import Sum

    ds = _embeddings(sf_dir)

    def partials(t: pa.Table) -> pa.Table:
        mat = _batch_matrix(t)
        n, dim = mat.shape
        xx = mat.T @ mat  # dim × dim, float64
        sx = mat.sum(axis=0)
        iu, ju = np.triu_indices(dim)
        i_col = np.concatenate(
            [iu, np.arange(dim), [-1]]
        ).astype(np.int64)
        j_col = np.concatenate(
            [ju, np.full(dim, -1), [-1]]
        ).astype(np.int64)
        v_col = np.concatenate([xx[iu, ju], sx, [float(n)]])
        return pa.table(
            {"i": pa.array(i_col), "j": pa.array(j_col),
             "v": pa.array(v_col, pa.float64())}
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("v", alias_name="v"))
        .take_all()
    )  # ≤ dim(dim+3)/2 + 1 rows by construction


def _mean_cov(rows) -> tuple[float, np.ndarray, np.ndarray]:
    n = 0.0
    first: dict[int, float] = {}
    second: dict[tuple[int, int], float] = {}
    for r in rows:
        i, j, v = int(r["i"]), int(r["j"]), float(r["v"])
        if i == -1:
            n = v
        elif j == -1:
            first[i] = v
        else:
            second[(i, j)] = v
    dim = max(first) + 1 if first else 0
    mu = np.array([first[i] for i in range(dim)]) / n
    cov = np.zeros((dim, dim))
    for (i, j), sxy in second.items():
        c = sxy / n - mu[i] * mu[j]
        cov[i, j] = cov[j, i] = c
    return n, mu, cov


def embedding_covariance(sf_dir: str):
    """Population covariance matrix of the embedding column in long
    upper-triangle format → (i, j, cov) with i ≤ j, 0-based dims,
    rounded 6 — the input statistic of PCA / whitening / Mahalanobis
    outlier scoring.  One streaming moment pass; the only exchange is
    dim²-bounded partial sums (64² floats per batch here, constant in
    corpus size)."""
    schema = {"i": pa.int64(), "j": pa.int64(), "cov": pa.float64()}
    if parquet_rows(f"{sf_dir}/embeddings.parquet") == 0:
        return empty_dataset(schema)
    _, _, cov = _mean_cov(_moment_partials(sf_dir))
    dim = cov.shape[0]
    iu, ju = np.triu_indices(dim)
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {"i": pa.array(iu.astype(np.int64)),
             "j": pa.array(ju.astype(np.int64)),
             "cov": pa.array(
                 [round_half_away(float(c), 6) for c in cov[iu, ju]],
                 pa.float64(),
             )}
        )
    )


def pca_projection(sf_dir: str, *, k: int = 4):
    """Project every embedding onto the top-``k`` principal
    components of the corpus covariance → (vec_id, pc0..pc{k-1}),
    rounded 6.  Classical PCA: covariance from the same dim²-bounded
    moment pass as ``embedding_covariance``; eigendecomposition on
    the driver (dim × dim — O(64³) here, microseconds); projection is
    a second streaming pass with (mean, components) broadcast once
    via ``ray.put``.

    Deterministic sign convention: each component is flipped so its
    largest-|loading| coordinate is positive (ties: the lowest such
    coordinate index decides) — eigenvector sign is otherwise
    arbitrary and would break reproducibility.

    Rows-only by design (eigendecomposition is not SQL-expressible);
    anchored by the oracle-checked ``embedding_covariance`` twin plus
    invariant tests (component orthonormality, per-component variance
    = eigenvalue, numpy whole-corpus equality — tests/test_mlstats.py).
    """
    import ray

    if parquet_rows(f"{sf_dir}/embeddings.parquet") == 0:
        cols = {"vec_id": pa.int64()}
        cols.update({f"pc{i}": pa.float64() for i in range(k)})
        return empty_dataset(cols)
    _, mu, cov = _mean_cov(_moment_partials(sf_dir))
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-evals)[:k]
    comps = evecs[:, order]  # dim × k
    for c in range(comps.shape[1]):
        col = comps[:, c]
        pivot = int(np.argmax(np.abs(col)))
        if col[pivot] < 0:
            comps[:, c] = -col
    ref = ray.put((mu, comps))

    from ..stages.maputil import map_stage

    class ProjectStage:
        def __init__(self, r) -> None:
            self._mu, self._w = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = _batch_matrix(t) - self._mu
            proj = mat @ self._w  # n × k
            cols = {"vec_id": t.column("vec_id")}
            for c in range(proj.shape[1]):
                cols[f"pc{c}"] = pa.array(
                    [round_half_away(float(x), 6) for x in proj[:, c]],
                    pa.float64(),
                )
            return pa.table(cols)

    return map_stage(
        _embeddings(sf_dir), ProjectStage, batch_size=1024,
        ctor_args=(ref,),
    )


# ------------------------------------------- sufficient-statistics ML


def ols_price_model(sf_dir: str):
    """Distributed ordinary-least-squares fit of
    ``l_extendedprice ~ l_quantity + l_discount`` via sufficient
    statistics — the canonical "train a linear model with one
    aggregation" pattern: each batch contributes the 9 moment sums
    (n, Σq, Σd, Σy, Σqq, Σqd, Σdd, Σqy, Σdy); the normal equations
    solve on the driver in closed form (centered 2×2 system).  → one
    row (n, beta0, beta_quantity, beta_discount, r2).

    Exchange volume is 9 floats per batch — constant in table size;
    this is how regression/GLM training actually runs at 100 TB
    (sufficient statistics or minibatch SGD; the closed form needs
    exactly one pass).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    schema = {
        "n": pa.int64(), "beta0": pa.float64(),
        "beta_quantity": pa.float64(), "beta_discount": pa.float64(),
        "r2": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/lineitem.parquet") == 0:
        return empty_dataset(schema)
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    )

    _KEYS = ("n", "sq", "sd", "sy", "sqq", "sqd", "sdd", "sqy", "sdy",
             "syy")

    def partials(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy().astype(np.float64)
        d = t.column("l_discount").to_numpy().astype(np.float64)
        y = t.column("l_extendedprice").to_numpy().astype(np.float64)
        vals = [float(len(q)), q.sum(), d.sum(), y.sum(),
                (q * q).sum(), (q * d).sum(), (d * d).sum(),
                (q * y).sum(), (d * y).sum(), (y * y).sum()]
        return pa.table(
            {"k": pa.array(list(_KEYS), pa.string()),
             "v": pa.array(vals, pa.float64())}
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("v", alias_name="v"))
        .take_all()
    )  # exactly 10 rows
    m = {r["k"]: float(r["v"]) for r in rows}
    n = m["n"]
    mq, md, my = m["sq"] / n, m["sd"] / n, m["sy"] / n
    var_q = m["sqq"] / n - mq * mq
    var_d = m["sdd"] / n - md * md
    cov_qd = m["sqd"] / n - mq * md
    cov_qy = m["sqy"] / n - mq * my
    cov_dy = m["sdy"] / n - md * my
    var_y = m["syy"] / n - my * my
    det = var_q * var_d - cov_qd * cov_qd
    b1 = (cov_qy * var_d - cov_dy * cov_qd) / det
    b2 = (cov_dy * var_q - cov_qy * cov_qd) / det
    b0 = my - b1 * mq - b2 * md
    r2 = (b1 * cov_qy + b2 * cov_dy) / var_y
    return rd.from_arrow(
        pa.table(
            {"n": pa.array([int(n)], pa.int64()),
             "beta0": pa.array([round_half_away(b0, 6)], pa.float64()),
             "beta_quantity": pa.array(
                 [round_half_away(b1, 6)], pa.float64()),
             "beta_discount": pa.array(
                 [round_half_away(b2, 6)], pa.float64()),
             "r2": pa.array([round_half_away(r2, 6)], pa.float64())}
        )
    )


def ab_test_stats(sf_dir: str):
    """Per-event-type Welch two-sample t statistic of ``value``
    against all OTHER events — the A/B experiment readout shape
    (each variant vs the pooled rest).  → (event_type, n, mean_value,
    t_stat, dof), Welch–Satterthwaite degrees of freedom.

    One grouped aggregate produces per-type (n, Σv, Σv²); the
    complement statistics derive from the global totals — no second
    scan, no per-row work beyond the partial sums; the exchange is
    event-type-bounded."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    schema = {
        "event_type": pa.string(), "n": pa.int64(),
        "mean_value": pa.float64(), "t_stat": pa.float64(),
        "dof": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return empty_dataset(schema)
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partials(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        v = t.column("value").to_numpy().astype(np.float64)
        uniq, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv).astype(np.float64)
        sv = np.bincount(inv, weights=v)
        svv = np.bincount(inv, weights=v * v)
        return pa.table(
            {"event_type": pa.array(uniq.tolist(), pa.string()),
             "n": pa.array(n, pa.float64()),
             "sv": pa.array(sv, pa.float64()),
             "svv": pa.array(svv, pa.float64())}
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sv", alias_name="sv"),
            Sum("svv", alias_name="svv"),
        )
        .take_all()
    )  # event-type-bounded
    tot_n = sum(r["n"] for r in rows)
    tot_sv = sum(r["sv"] for r in rows)
    tot_svv = sum(r["svv"] for r in rows)
    out = {k: [] for k in schema}
    for r in sorted(rows, key=lambda r: r["event_type"]):
        n1, sv1, svv1 = float(r["n"]), float(r["sv"]), float(r["svv"])
        n2 = tot_n - n1
        sv2, svv2 = tot_sv - sv1, tot_svv - svv1
        m1, m2 = sv1 / n1, sv2 / n2
        # sample variances (n-1 denominator, Welch's t convention)
        s1 = (svv1 - n1 * m1 * m1) / (n1 - 1.0)
        s2 = (svv2 - n2 * m2 * m2) / (n2 - 1.0)
        se2 = s1 / n1 + s2 / n2
        t_stat = (m1 - m2) / np.sqrt(se2)
        dof = se2 * se2 / (
            (s1 / n1) ** 2 / (n1 - 1.0) + (s2 / n2) ** 2 / (n2 - 1.0)
        )
        out["event_type"].append(r["event_type"])
        out["n"].append(int(n1))
        out["mean_value"].append(round_half_away(m1, 6))
        out["t_stat"].append(round_half_away(float(t_stat), 6))
        out["dof"].append(round_half_away(float(dof), 6))
    return rd.from_arrow(
        pa.table(
            {"event_type": pa.array(out["event_type"], pa.string()),
             "n": pa.array(out["n"], pa.int64()),
             "mean_value": pa.array(out["mean_value"], pa.float64()),
             "t_stat": pa.array(out["t_stat"], pa.float64()),
             "dof": pa.array(out["dof"], pa.float64())}
        )
    )


def mahalanobis_outliers(sf_dir: str, *, k: int = 25):
    """Top-``k`` embedding outliers by Mahalanobis distance to the
    corpus distribution — the covariance-aware upgrade of
    ``kmeans.embedding_outliers`` (Euclidean-to-centroid): directions
    of low variance count MORE, so it catches off-manifold vectors a
    spherical distance misses.  → (vec_id, mdist) top-k by
    (distance DESC, vec_id ASC), rounded 6.

    Same dim²-bounded moment pass as ``embedding_covariance``; the
    precision matrix inverts on the driver (dim × dim); scoring is a
    streaming broadcast pass with a per-batch partial top-k combiner
    (sort + limit finishes the cut in-cluster).

    Rows-only by design (matrix inverse isn't SQL-expressible);
    anchored by the oracle-checked ``embedding_covariance`` twin and
    the numpy whole-corpus reference in tests/test_mlstats.py."""
    import ray

    schema = {"vec_id": pa.int64(), "mdist": pa.float64()}
    if parquet_rows(f"{sf_dir}/embeddings.parquet") == 0:
        return empty_dataset(schema)
    _, mu, cov = _mean_cov(_moment_partials(sf_dir))
    # ridge for numerical safety on degenerate corpora (testdata
    # covariances are full-rank; the epsilon is documentation-level)
    prec = np.linalg.inv(cov + 1e-9 * np.eye(cov.shape[0]))
    ref = ray.put((mu, prec))

    from ..stages.maputil import map_stage

    class ScoreStage:
        def __init__(self, r) -> None:
            self._mu, self._prec = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            x = _batch_matrix(t) - self._mu
            d2 = np.einsum("ij,jk,ik->i", x, self._prec, x)
            d = np.sqrt(np.maximum(d2, 0.0))
            tbl = pa.table(
                {"vec_id": t.column("vec_id"),
                 "mdist": pa.array(
                     [round_half_away(float(v), 6) for v in d],
                     pa.float64(),
                 )}
            )
            # partial top-k combiner: only k rows per batch survive
            order = tbl.sort_by(
                [("mdist", "descending"), ("vec_id", "ascending")]
            )
            return order.slice(0, k)

    scored = map_stage(
        _embeddings(sf_dir), ScoreStage, batch_size=2048,
        ctor_args=(ref,),
    )
    return scored.sort(["mdist", "vec_id"], descending=[True, False]).limit(k)
