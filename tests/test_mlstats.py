"""Classical-ML corpus statistics (pipelines/mlstats.py +
webcrawl.host_lang_entropy): PCA invariants (orthonormality,
variance = eigenvalue, numpy whole-corpus equality), NB vs a
single-process sklearn-style reference, covariance vs numpy,
Zipf fit vs numpy polyfit, and the host-identity closed form used
by the host_lang_entropy oracle."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from outbreak_kg_ray.pipelines import mlstats, webcrawl


def _embedding_matrix(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids, kind="stable")
    col = t.column("embedding").combine_chunks()
    mat = np.asarray(col.flatten(), dtype=np.float64).reshape(len(t), -1)
    return ids[order], mat[order]


def test_covariance_matches_numpy(sf_dir):
    ids, mat = _embedding_matrix(sf_dir)
    ref = np.cov(mat, rowvar=False, bias=True)  # population cov
    got = mlstats.embedding_covariance(sf_dir).to_pandas()
    assert len(got) == mat.shape[1] * (mat.shape[1] + 1) // 2
    for _, r in got.head(200).iterrows():
        assert r["cov"] == pytest.approx(
            ref[int(r["i"]), int(r["j"])], abs=1e-6
        )


def test_pca_matches_numpy_and_invariants(sf_dir):
    ids, mat = _embedding_matrix(sf_dir)
    k = 4
    got = (
        mlstats.pca_projection(sf_dir, k=k)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(got["vec_id"]) == list(ids)

    # whole-corpus numpy reference with the same sign convention
    cov = np.cov(mat, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals)[:k]
    comps = evecs[:, order]
    for c in range(k):
        pivot = int(np.argmax(np.abs(comps[:, c])))
        if comps[pivot, c] < 0:
            comps[:, c] = -comps[:, c]
    ref_proj = (mat - mat.mean(axis=0)) @ comps

    proj = got[[f"pc{c}" for c in range(k)]].to_numpy()
    assert np.allclose(proj, ref_proj, atol=2e-6)

    # invariants: components orthonormal; projected variance per
    # component equals the eigenvalue, in descending order
    assert np.allclose(comps.T @ comps, np.eye(k), atol=1e-9)
    var = proj.var(axis=0)
    top_evals = evals[order]
    assert np.allclose(var, top_evals, rtol=1e-4)
    assert all(np.diff(top_evals) <= 1e-12)


def test_nb_pred_matches_reference(sf_dir):
    """Single-process multinomial-NB reference (counting + Laplace-1)
    agrees with the distributed pipeline on every prediction."""
    t = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    docs = [
        (i, x, s)
        for i, x, s in zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("source").to_pylist(),
        )
        if x.strip()
    ]
    vocab = sorted({w for _, x, _ in docs for w in x.strip().split(" ")})
    wix = {w: i for i, w in enumerate(vocab)}
    sources = sorted({s for _, _, s in docs})
    six = {s: i for i, s in enumerate(sources)}
    counts = np.zeros((len(vocab), len(sources)))
    prior = np.zeros(len(sources))
    for _, x, s in docs:
        prior[six[s]] += 1
        for w in x.strip().split(" "):
            counts[wix[w], six[s]] += 1
    ll = np.log((counts + 1.0) / (counts.sum(axis=0) + len(vocab)))
    lp = np.log(prior / prior.sum())

    got = (
        mlstats.nb_source_pred(sf_dir)
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(got) == len(docs)
    for doc_id, x, _ in docs[:100]:
        score = lp + ll[
            [wix[w] for w in x.strip().split(" ")]
        ].sum(axis=0)
        rounded = np.round(score, 6)
        best = min(
            range(len(sources)), key=lambda i: (-rounded[i], sources[i])
        )
        assert got.loc[doc_id, "pred_source"] == sources[best]
        assert got.loc[doc_id, "logprob"] == pytest.approx(
            score[best], abs=1e-6
        )


def test_nb_scores_shape(sf_dir):
    df = mlstats.nb_source_scores(sf_dir).to_pandas()
    n_docs = df["doc_id"].nunique()
    n_cls = df["cls_source"].nunique()
    assert len(df) == n_docs * n_cls  # full matrix, long format
    assert (df["logprob"] < 0).all()


def test_zipf_slope_matches_polyfit(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    toks = [
        w
        for x in t.column("text").to_pylist()
        if x.strip()
        for w in x.strip().split(" ")
    ]
    uniq, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    order = np.lexsort((uniq, -cnt))  # count DESC, token ASC
    c = cnt[order].astype(np.float64)
    rank = np.arange(1, len(c) + 1, dtype=np.float64)
    slope, intercept = np.polyfit(np.log(rank), np.log(c), 1)

    row = mlstats.zipf_slope(sf_dir).take_all()[0]
    assert row["n_vocab"] == len(c)
    assert row["slope"] == pytest.approx(slope, abs=1e-6)
    assert row["intercept"] == pytest.approx(intercept, abs=1e-6)
    # a natural-ish corpus has a negative power-law slope
    assert row["slope"] < 0


def test_zipf_vocab_cap_binds(sf_dir):
    row = mlstats.zipf_slope(sf_dir, vocab_size=5).take_all()[0]
    assert row["n_vocab"] == 5


def test_host_lang_entropy_closed_form_host(sf_dir):
    """The oracle's closed-form host (lower(cased-source) ||
    '.example.com') must equal the host extracted from the full URL
    canonicalization chain — pin that identity here so the SQL
    shortcut can never drift from the pipeline."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )
    raw = webcrawl.synthesize_raw_urls(t)
    canon = webcrawl.canonicalize_url_column(raw.column("url"))
    m = pc.extract_regex(canon, r"^[^/]+//(?P<host>[^/]+)")
    chain_host = pc.struct_field(m, "host").to_pylist()
    closed = [
        (s.upper() if d % 3 == 0 else s).lower() + ".example.com"
        for d, s in zip(
            t.column("doc_id").to_pylist(),
            t.column("source").to_pylist(),
        )
    ]
    assert chain_host == closed


def test_host_lang_entropy_values(sf_dir):
    import math

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )
    from collections import Counter

    per_host = Counter()
    per_host_lang = Counter()
    for s, lang in zip(
        t.column("source").to_pylist(), t.column("lang").to_pylist()
    ):
        host = s + ".example.com"
        per_host[host] += 1
        per_host_lang[(host, lang)] += 1

    got = webcrawl.host_lang_entropy(sf_dir).to_pandas()
    assert set(got["host"]) == set(per_host)
    for _, r in got.iterrows():
        n = per_host[r["host"]]
        probs = [
            c / n
            for (h, _), c in per_host_lang.items()
            if h == r["host"]
        ]
        ref = -sum(p * math.log(p) for p in probs)
        assert r["n_docs"] == n
        assert r["lang_entropy"] == pytest.approx(ref, abs=1e-6)
        assert 0.0 <= r["lang_entropy"] <= math.log(max(r["n_langs"], 1)) + 1e-9


def test_ols_matches_lstsq(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    )
    q = t.column("l_quantity").to_numpy().astype(np.float64)
    d = t.column("l_discount").to_numpy().astype(np.float64)
    y = t.column("l_extendedprice").to_numpy().astype(np.float64)
    X = np.column_stack([np.ones_like(q), q, d])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    r2 = 1.0 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()

    row = mlstats.ols_price_model(sf_dir).take_all()[0]
    assert row["n"] == len(y)
    assert row["beta0"] == pytest.approx(beta[0], rel=1e-6)
    assert row["beta_quantity"] == pytest.approx(beta[1], rel=1e-6)
    assert row["beta_discount"] == pytest.approx(beta[2], rel=1e-4)
    assert row["r2"] == pytest.approx(r2, abs=1e-6)


def test_ab_test_matches_scipy_formula(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
    v = t.column("value").to_numpy().astype(np.float64)

    got = mlstats.ab_test_stats(sf_dir).to_pandas().set_index("event_type")
    assert set(got.index) == set(np.unique(et))
    for typ in np.unique(et):
        a, b = v[et == typ], v[et != typ]
        m1, m2 = a.mean(), b.mean()
        s1, s2 = a.var(ddof=1), b.var(ddof=1)
        se2 = s1 / len(a) + s2 / len(b)
        t_stat = (m1 - m2) / np.sqrt(se2)
        dof = se2**2 / (
            (s1 / len(a)) ** 2 / (len(a) - 1)
            + (s2 / len(b)) ** 2 / (len(b) - 1)
        )
        r = got.loc[typ]
        assert r["n"] == len(a)
        assert r["mean_value"] == pytest.approx(m1, abs=1e-6)
        assert r["t_stat"] == pytest.approx(t_stat, abs=1e-6)
        assert r["dof"] == pytest.approx(dof, rel=1e-6)


def test_mahalanobis_matches_numpy(sf_dir):
    ids, mat = _embedding_matrix(sf_dir)
    mu = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False, bias=True)
    prec = np.linalg.inv(cov + 1e-9 * np.eye(cov.shape[0]))
    x = mat - mu
    d = np.sqrt(np.einsum("ij,jk,ik->i", x, prec, x))
    order = np.lexsort((ids, -np.round(d, 6)))[:25]

    got = mlstats.mahalanobis_outliers(sf_dir, k=25).to_pandas()
    assert list(got["vec_id"]) == list(ids[order])
    assert np.allclose(got["mdist"], np.round(d[order], 6), atol=1e-6)
    # distances strictly ordered and positive
    assert (got["mdist"] > 0).all()
    assert (np.diff(got["mdist"]) <= 1e-12).all()


def test_logreg_matches_single_process_reference(sf_dir):
    """Distributed GD (raw tasks over pinned blocks) reproduces the
    single-process full-batch reference to float tolerance, and the
    per-round loss strictly decreases."""
    from outbreak_kg_ray.stages import logreg

    ids, mat = _embedding_matrix(sf_dir)
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )
    order = np.argsort(t.column("vec_id").to_numpy(), kind="stable")
    y = (t.column("label").to_numpy()[order] == 0).astype(np.float64)

    def sigmoid(z):
        out = np.empty_like(z)
        pos = z >= 0
        out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
        ez = np.exp(z[~pos])
        out[~pos] = ez / (1.0 + ez)
        return out

    w = np.zeros(mat.shape[1] + 1)
    ref_losses = []
    for _ in range(20):
        p = sigmoid(w[0] + mat @ w[1:])
        resid = p - y
        g = np.concatenate(([resid.sum()], mat.T @ resid))
        pc_ = np.clip(p, 1e-12, 1 - 1e-12)
        ref_losses.append(
            float(-(y * np.log(pc_) + (1 - y) * np.log(1 - pc_)).mean())
        )
        w = w - 0.5 * g / len(y)

    got_w, got_losses = logreg.train_logreg(sf_dir)
    assert np.allclose(got_w, w, atol=1e-9)
    assert np.allclose(got_losses, ref_losses, atol=1e-9)
    assert all(a > b for a, b in zip(got_losses, got_losses[1:]))

    scores = (
        logreg.logreg_scores(sf_dir)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    p_ref = sigmoid(w[0] + mat @ w[1:])
    assert np.allclose(scores["p"], np.round(p_ref, 6), atol=1e-6)
    assert (scores["pred"].to_numpy() == (p_ref >= 0.5)).all()
