"""Sketch operators (stages/sketch.py): HLL distinct-count error
bounds and determinism, heavy-hitter exactness incl. the fallback."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from outbreak_kg_ray.stages import sketch


def _exact_token_counts(sf_dir):
    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    c = Counter()
    for x in texts:
        c.update(x.split())
    return c


def test_hll_error_bound(ray_session, sf_dir):
    exact = len(_exact_token_counts(sf_dir))
    est = sketch.hll_distinct_tokens(sf_dir).to_pandas()["n_distinct_est"][0]
    assert abs(est - exact) / exact < 0.05


def test_hll_deterministic(ray_session, sf_dir):
    a = sketch.hll_distinct_tokens(sf_dir).to_pandas()["n_distinct_est"][0]
    b = sketch.hll_distinct_tokens(sf_dir).to_pandas()["n_distinct_est"][0]
    assert a == b


def test_hll_fold_register_semantics():
    regs = np.zeros(sketch._HLL_M, dtype=np.uint8)
    sketch._hll_fold_tokens(["alpha", "beta", "alpha"], regs)
    once = regs.copy()
    # refolding the same multiset cannot change max-registers
    sketch._hll_fold_tokens(["alpha", "beta"], regs)
    assert (regs == once).all()
    assert regs.max() >= 1 and (regs <= 64 - sketch._HLL_P + 1).all()


def test_heavy_hitters_match_exact(ray_session, sf_dir):
    exact = _exact_token_counts(sf_dir)
    expected = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    df = sketch.heavy_hitter_terms(sf_dir).to_pandas()
    got = list(zip(df["token"], df["n_occurrences"]))
    assert got == expected
    assert df["rank"].tolist() == list(range(1, len(got) + 1))


def test_heavy_hitters_fallback_path(ray_session, sf_dir):
    # m beyond the guaranteed candidate depth forces the exact
    # full-vocabulary fallback; results must still be exact
    exact = _exact_token_counts(sf_dir)
    m = len(exact) + 10
    df = sketch.heavy_hitter_terms(sf_dir, m=m).to_pandas()
    assert len(df) == len(exact)
    expected = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(df["token"], df["n_occurrences"])) == expected
