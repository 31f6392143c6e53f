"""Hand-checkable tests for the from-scratch scalar statistics
(functions/stats.py) and the literature-ranking pipeline that uses
them (pipelines/encode.py / reference kg/mesh_csr.py:102-166)."""

from __future__ import annotations

import math

from outbreak_kg_ray.functions.stats import (
    fisher_exact_greater,
    hypergeom_logpmf,
    logsumexp,
)


def test_fisher_exact_hand_computed():
    # [[2,0],[0,2]]: P(X >= 2), X ~ Hypergeom(M=4, n=2, N=2)
    # = C(2,2)C(2,0)/C(4,2) = 1/6
    assert abs(fisher_exact_greater(2, 0, 0, 2) - 1 / 6) < 1e-12
    # [[1,1],[1,1]]: P(X >= 1) = 1 - P(X=0) = 1 - 1/6 = 5/6
    assert abs(fisher_exact_greater(1, 1, 1, 1) - 5 / 6) < 1e-12
    # a = 0 ⇒ whole support ⇒ p = 1 (up to float summation error)
    assert abs(fisher_exact_greater(0, 3, 2, 5) - 1.0) < 1e-12
    # scipy.stats.fisher_exact([[8,2],[1,5]], 'greater') reference
    # value (computed analytically): sum_{k=8,9} pmf(k; M=16, n=10, N=9)
    p = fisher_exact_greater(8, 2, 1, 5)
    expected = sum(
        math.exp(hypergeom_logpmf(k, 16, 10, 9)) for k in (8, 9)
    )
    assert abs(p - expected) < 1e-12
    assert 0.01 < p < 0.1  # sanity: a strong association


def test_hypergeom_pmf_sums_to_one():
    M, n, N = 20, 7, 9
    total = sum(
        math.exp(hypergeom_logpmf(k, M, n, N))
        for k in range(0, min(n, N) + 1)
    )
    assert abs(total - 1.0) < 1e-12


def test_logsumexp_basics():
    assert logsumexp([float("-inf")]) == float("-inf")
    assert abs(logsumexp([0.0, 0.0]) - math.log(2)) < 1e-12
    big = logsumexp([1000.0, 1000.0])
    assert abs(big - (1000.0 + math.log(2))) < 1e-9


def test_literature_rank_shape(ray_session):
    from outbreak_kg_ray.pipelines.encode import literature_pvalues

    df = literature_pvalues(
        "/root/testdata/sf0.001", ["click", "error", "purchase"]
    )
    assert list(df.columns) == ["pmid", "overlap_n", "coverage", "pval"]
    assert (df["pval"] >= 0).all() and (df["pval"] <= 1).all()
    # ranked: overlap desc, then coverage desc, then pval asc
    assert list(df["overlap_n"]) == sorted(df["overlap_n"], reverse=True)


def test_realism_logsumexp_scorer(ray_session):
    from outbreak_kg_ray.pipelines.realism import (
        logsumexp_score,
        pair_counts,
    )

    df = pair_counts("/root/testdata/sf0.001").to_pandas()
    df = df[(df["mesh_a"] != "") | (df["mesh_b"] != "")]
    lookup = {
        (a, b): float(math.log(c))
        for a, b, c in zip(df["mesh_a"], df["mesh_b"], df["count"])
    }
    ids = sorted({m for pair in list(lookup)[:3] for m in pair})
    scores, total, cls = logsumexp_score(ids, lookup, 100)
    assert cls in ("high", "medium", "low")
    assert total == logsumexp(list(scores.values()))


def test_round_half_away_matches_duckdb():
    """DuckDB ROUND is half-away-from-zero; Python round() is
    banker's. The round-1 quality_scores hash fail (VERDICT.md) was
    exactly this: 0.5290625 must round to 0.529063, not 0.529062."""
    import duckdb
    import numpy as np

    from outbreak_kg_ray.functions.rounding import (
        np_round_half_away,
        pa_round_half_away,
        round_half_away,
    )

    cases = [0.5290625, -0.5290625, 1.0000005, 2.5, -2.5, 0.1234565, 0.0]
    con = duckdb.connect()
    for x in cases:
        expect = con.execute("SELECT round(?::DOUBLE, 6)", [x]).fetchone()[0]
        assert round_half_away(x, 6) == expect, x
    arr = np.array(cases)
    got = np_round_half_away(arr, 6)
    want = [round_half_away(x, 6) for x in cases]
    assert got.tolist() == want
    import pyarrow as pa

    got_pa = pa_round_half_away(pa.array(cases, pa.float64()), 6)
    assert got_pa.to_pylist() == want


def test_fingerprint_vector_matches_scalar():
    """The Mersenne-mod vectorized rolling hash is byte-for-byte the
    scalar definition (and the recursive-CTE SQL oracle)."""
    import random

    import numpy as np

    from outbreak_kg_ray.stages.textstats import (
        fingerprint,
        fingerprint_vector,
    )

    rng = random.Random(11)
    cases = ["", "a", "\x00", "\xff" * 7, "z" * 4096] + [
        "".join(chr(rng.randrange(1, 0x2FFF))
                for _ in range(rng.randrange(0, 400)))
        for _ in range(300)
    ]
    vec = fingerprint_vector(cases)
    ref = np.array([fingerprint(x) for x in cases], dtype=np.uint64)
    assert (vec == ref).all()
    assert (vec < np.uint64((1 << 61) - 1)).all()


def test_lineitem_corr_known_value(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from outbreak_kg_ray.pipelines import relational

    x = [1.0, 2.0, 3.0, 4.0]
    y = [2.0, 4.1, 5.9, 8.0]  # near-perfect positive correlation
    t = pa.table(
        {
            "l_returnflag": pa.array(["A"] * 4, pa.string()),
            "l_linestatus": pa.array(["O"] * 4, pa.string()),
            "l_quantity": pa.array(x, pa.float64()),
            "l_extendedprice": pa.array(y, pa.float64()),
            "l_discount": pa.array([0.0] * 4, pa.float64()),
            "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_shipdate": pa.array(["2024-01-01"] * 4, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = relational.lineitem_qty_price_corr(str(tmp_path)).to_pandas()
    want = float(np.corrcoef(x, y)[0, 1])
    assert len(out) == 1 and out["n"].iloc[0] == 4
    assert abs(out["corr_qty_price"].iloc[0] - round(want, 6)) < 2e-6
