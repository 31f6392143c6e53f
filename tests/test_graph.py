"""Iterative graph algorithms (pipelines/graph.py): PageRank and
connected components, fast (driver numpy) vs distributed (join +
groupby per round) path equality, plus analytic invariants."""

import numpy as np
import pyarrow as pa
import pytest

from outbreak_kg_ray.pipelines import graph


def _edges_ds(pairs):
    import ray.data as rd

    u = [a for a, b in pairs for _ in (0,)] + [b for a, b in pairs]
    v = [b for a, b in pairs] + [a for a, b in pairs]
    return rd.from_arrow(
        pa.table({"u": pa.array(u, pa.string()), "v": pa.array(v, pa.string())})
    )


# two triangles bridged by one edge, plus an isolated 2-cycle
PAIRS = [
    ("a", "b"), ("b", "c"), ("a", "c"),
    ("c", "d"),
    ("d", "e"), ("e", "f"), ("d", "f"),
    ("x", "y"),
]


def test_pagerank_paths_agree(ray_session):
    fast = graph.pagerank_edges(_edges_ds(PAIRS), distributed=False).to_pandas()
    dist = graph.pagerank_edges(_edges_ds(PAIRS), distributed=True).to_pandas()
    f = fast.sort_values("curie").reset_index(drop=True)
    d = dist.sort_values("curie").reset_index(drop=True)
    assert list(f["curie"]) == list(d["curie"])
    np.testing.assert_allclose(f["rank"], d["rank"], atol=1.5e-6)


def test_pagerank_invariants(ray_session):
    df = graph.pagerank_edges(_edges_ds(PAIRS), distributed=False).to_pandas()
    assert len(df) == 8
    # ranks sum to ~1 (no dangling nodes after symmetrization)
    assert abs(df["rank"].sum() - 1.0) < 1e-4
    r = dict(zip(df["curie"], df["rank"]))
    # the bridge endpoints (degree 3) outrank the pure triangle
    # corners (degree 2) and the isolated pair
    assert r["c"] > r["a"] and r["d"] > r["e"]
    assert r["c"] > r["x"]


def test_components_paths_agree(ray_session):
    fast = graph.connected_components_edges(
        _edges_ds(PAIRS), distributed=False
    ).to_pandas()
    dist = graph.connected_components_edges(
        _edges_ds(PAIRS), distributed=True
    ).to_pandas()
    f = dict(zip(fast["curie"], fast["component"]))
    d = dict(zip(dist["curie"], dist["component"]))
    assert f == d


def test_components_labels(ray_session):
    df = graph.connected_components_edges(
        _edges_ds(PAIRS), distributed=False
    ).to_pandas()
    comp = dict(zip(df["curie"], df["component"]))
    assert {comp[c] for c in "abcdef"} == {"a"}
    assert comp["x"] == comp["y"] == "x"


def test_components_rounds_below_diameter(ray_session):
    # a path graph of 6 nodes has diameter 5; with rounds=2 the fixed-
    # round function must still be deterministic (and un-converged)
    chain = [("n%d" % i, "n%d" % (i + 1)) for i in range(5)]
    df = graph.connected_components_edges(
        _edges_ds(chain), rounds=2, distributed=False
    ).to_pandas()
    comp = dict(zip(df["curie"], df["component"]))
    assert comp["n2"] == "n0"
    assert comp["n5"] == "n3"  # only 2 hops propagated


def test_pagerank_on_corpus(ray_session, sf_dir):
    df = graph.pagerank(sf_dir).to_pandas()
    assert len(df) > 0
    assert abs(df["rank"].sum() - 1.0) < 1e-3
    assert (df["rank"] > 0).all()


def _raw_edges(pairs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "start_id": pa.array([a for a, b in pairs], pa.string()),
                "end_id": pa.array([b for a, b in pairs], pa.string()),
            }
        )
    )


def test_triangle_counts_handmade(ray_session):
    # triangles abc and bcd share edge bc; square wxyz has none
    tri_pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"), ("b", "d"), ("c", "d"),
        ("w", "x"), ("x", "y"), ("y", "z"), ("w", "z"),
    ]
    df = graph.triangle_counts_edges(_raw_edges(tri_pairs)).to_pandas()
    got = dict(zip(df["curie"], df["n_triangles"]))
    assert got == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_triangle_counts_duplicate_and_reversed_edges(ray_session):
    # duplicates and reversed orientation collapse to one canonical pair
    tri_pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "a")]
    df = graph.triangle_counts_edges(_raw_edges(tri_pairs)).to_pandas()
    got = dict(zip(df["curie"], df["n_triangles"]))
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_counts_corpus_matches_reference(ray_session, sf_dir):
    from itertools import combinations
    from outbreak_kg_ray.pipelines import kg

    edges = kg.cooccurrence_edges(sf_dir).to_pandas()
    adj = {}
    for a, b in zip(edges["start_id"], edges["end_id"]):
        lo, hi = min(a, b), max(a, b)
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    expected = {}
    for v, nbrs in adj.items():
        c = sum(
            1 for x, y in combinations(sorted(nbrs), 2)
            if y in adj.get(x, ())
        )
        if c:
            expected[v] = c
    df = graph.triangle_counts(sf_dir).to_pandas()
    got = dict(zip(df["curie"], df["n_triangles"]))
    assert got == expected


def test_bfs_paths_agree(ray_session):
    fast = graph.bfs_distances_edges(
        _edges_ds(PAIRS), distributed=False
    ).to_pandas()
    dist = graph.bfs_distances_edges(
        _edges_ds(PAIRS), distributed=True
    ).to_pandas()
    f = fast.sort_values("curie").reset_index(drop=True)
    d = dist.sort_values("curie").reset_index(drop=True)
    assert list(f["curie"]) == list(d["curie"])
    assert list(f["dist"]) == list(d["dist"])


def test_bfs_handmade_distances(ray_session):
    # seed = min node "a"; x/y unreachable from a
    out = (
        graph.bfs_distances_edges(_edges_ds(PAIRS), distributed=False)
        .to_pandas()
        .set_index("curie")["dist"]
        .to_dict()
    )
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3, "f": 3}


def test_bfs_rounds_bound(ray_session):
    # a path graph longer than the round budget: nodes beyond 2 hops
    # are unreached when rounds=2
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    out = (
        graph.bfs_distances_edges(
            _edges_ds(chain), rounds=2, distributed=False
        )
        .to_pandas()
        .set_index("curie")["dist"]
        .to_dict()
    )
    assert out == {"a": 0, "b": 1, "c": 2}


def test_kcore_paths_agree(ray_session):
    fast = graph.kcore_edges(_edges_ds(PAIRS), distributed=False).to_pandas()
    dist = graph.kcore_edges(_edges_ds(PAIRS), distributed=True).to_pandas()
    f = fast.sort_values("curie").reset_index(drop=True)
    d = dist.sort_values("curie").reset_index(drop=True)
    assert list(f["curie"]) == list(d["curie"])
    assert list(f["core_degree"]) == list(d["core_degree"])


def test_kcore_peels_tendrils(ray_session):
    # PAIRS: triangles abc and def joined by bridge c-d, plus edge x-y.
    # x/y peel (degree 1); the bridge SURVIVES — its endpoints keep
    # degree ≥ 2 through their triangles, so the 2-core is a..f whole.
    out = (
        graph.kcore_edges(_edges_ds(PAIRS), distributed=False)
        .to_pandas()
        .set_index("curie")["core_degree"]
        .to_dict()
    )
    assert out == {"a": 2, "b": 2, "c": 3, "d": 3, "e": 2, "f": 2}


def test_kcore_fully_peeled_graph_is_empty(ray_session):
    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    for distributed in (False, True):
        out = graph.kcore_edges(
            _edges_ds(chain), distributed=distributed
        ).to_pandas()
        assert len(out) == 0


def test_degree_histogram_invariants(ray_session, sf_dir):
    from outbreak_kg_ray.pipelines import kg
    from outbreak_kg_ray.pipelines.graph import degree_histogram

    hist = degree_histogram(sf_dir).to_pandas()
    n_edges = kg.cooccurrence_edges(sf_dir).count()
    # handshake lemma: sum(degree × nodes) = 2 × undirected edges
    assert (hist["degree"] * hist["n_nodes"]).sum() == 2 * n_edges
    assert (hist["degree"] > 0).all()
    assert hist["degree"].is_unique


# ---------------------------------------------------------------------------
# fixpoint convergence guards (round-3 VERDICT next #4): chain graphs
# 2x+ longer than the old fixed round counts must resolve exactly
# ---------------------------------------------------------------------------

def _chain(n):
    return [("n%02d" % i, "n%02d" % (i + 1)) for i in range(n - 1)]


@pytest.mark.parametrize("dist", [False, True])
def test_components_long_chain_converges(ray_session, dist):
    # 20-node path, diameter 19 > the old 8-round default: fixpoint
    # default must label every node with the chain head
    df = graph.connected_components_edges(
        _edges_ds(_chain(20)), distributed=dist
    ).to_pandas()
    assert set(df["component"]) == {"n00"}
    assert len(df) == 20


@pytest.mark.parametrize("dist", [False, True])
def test_bfs_long_chain_full_distances(ray_session, dist):
    df = graph.bfs_distances_edges(
        _edges_ds(_chain(20)), rounds=None, distributed=dist
    ).to_pandas().sort_values("curie")
    assert df["dist"].tolist() == list(range(20))


@pytest.mark.parametrize("dist", [False, True])
def test_kcore_long_chain_fully_peels(ray_session, dist):
    # a 20-node path has no 2-core, but peeling exposes one new
    # endpoint pair per round — ~10 rounds > the old 8-round default
    df = graph.kcore_edges(
        _edges_ds(_chain(20)), k=2, distributed=dist
    ).to_pandas()
    assert len(df) == 0


def test_fixpoint_cap_truncation_logged(ray_session, caplog):
    import logging

    chain = _edges_ds(_chain(30))
    with caplog.at_level(logging.WARNING, logger="outbreak_kg_ray.pipelines.graph"):
        graph.MAX_FIXPOINT_ROUNDS, saved = 4, graph.MAX_FIXPOINT_ROUNDS
        try:
            graph.connected_components_edges(
                chain, distributed=False
            ).to_pandas()
        finally:
            graph.MAX_FIXPOINT_ROUNDS = saved
    assert any("fixpoint cap" in r.message for r in caplog.records)


def test_explicit_rounds_still_bounds_propagation(ray_session):
    # the fixed-round contract survives: rounds=2 on a long chain
    # stays a 2-hop propagation (oracle-compatible behavior)
    df = graph.connected_components_edges(
        _edges_ds(_chain(20)), rounds=2, distributed=False
    ).to_pandas()
    comp = dict(zip(df["curie"], df["component"]))
    assert comp["n05"] == "n03"


def test_lpa_paths_agree(ray_session):
    fast = graph.lpa_communities_edges(
        _edges_ds(PAIRS), distributed=False
    ).to_pandas()
    dist = graph.lpa_communities_edges(
        _edges_ds(PAIRS), distributed=True
    ).to_pandas()
    f = fast.sort_values("curie").reset_index(drop=True)
    d = dist.sort_values("curie").reset_index(drop=True)
    assert list(f["curie"]) == list(d["curie"])
    assert list(f["community"]) == list(d["community"])


def test_lpa_splits_bridged_triangles(ray_session):
    """CC merges the two bridged triangles into one component; LPA's
    majority vote keeps them as separate dense clusters."""
    df = graph.lpa_communities_edges(
        _edges_ds(PAIRS), distributed=False
    ).to_pandas()
    com = dict(zip(df["curie"], df["community"]))
    assert com["a"] == com["b"] == com["c"]
    assert com["d"] == com["e"] == com["f"]
    assert com["a"] != com["d"]
    assert com["x"] == com["y"] == "x"
    assert com["x"] not in (com["a"], com["d"])
    cc = graph.connected_components_edges(
        _edges_ds(PAIRS), distributed=False
    ).to_pandas()
    comp = dict(zip(cc["curie"], cc["component"]))
    assert comp["a"] == comp["d"]  # the contrast LPA exists for


def test_lpa_deterministic_tiebreak(ray_session):
    # a-b edge: each node votes {self, neighbor} -> tie -> min label
    # 'a' for BOTH (the self-vote stabilizer: no oscillation)
    df = graph.lpa_communities_edges(
        _edges_ds([("a", "b")]), distributed=False
    ).to_pandas()
    com = dict(zip(df["curie"], df["community"]))
    assert com == {"a": "a", "b": "a"}


def test_common_neighbors_topk(sf_dir):
    """Link prediction vs a networkx-free python reference over the
    same co-occurrence pair set: candidate set, counts and Jaccard
    all agree; returned pairs are non-adjacent by construction."""
    from collections import defaultdict

    import numpy as np

    from outbreak_kg_ray.pipelines import kg, linkpred

    pairs = set()
    for r in kg.cooccurrence_edges(sf_dir).take_all():
        a, b = r["start_id"], r["end_id"]
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    cn = defaultdict(int)
    for apex, nbrs in adj.items():
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if (ns[i], ns[j]) not in pairs:
                    cn[(ns[i], ns[j])] += 1
    ranked = sorted(cn.items(), key=lambda kv: (-kv[1], kv[0]))[:50]

    got = linkpred.common_neighbors_topk(sf_dir, k=50).take_all()
    assert [(r["u"], r["w"]) for r in got] == [p for p, _ in ranked]
    for r, (p, c) in zip(got, ranked):
        assert r["n_common"] == c
        union = len(adj[p[0]] | adj[p[1]])
        assert r["jaccard"] == round(c / union, 6)
        assert p not in pairs  # non-adjacent


def test_hits_distributed_matches_fastpath(ray_session):
    """The per-round join/groupby path and the numpy fastpath agree
    bit-for-bit after 6-dp rounding, and scores are L2-normalized
    per kind."""
    import numpy as np

    from outbreak_kg_ray.pipelines import graph as g

    SF = "/root/testdata/sf0.001"
    fast = {
        (r["node"], r["kind"]): r["score"]
        for r in g.hits_scores(SF, distributed=False).take_all()
    }
    dist = {
        (r["node"], r["kind"]): r["score"]
        for r in g.hits_scores(SF, distributed=True).take_all()
    }
    assert fast == dist
    for kind in ("hub", "authority"):
        v = np.array([s for (_, k), s in fast.items() if k == kind])
        assert len(v) > 0
        assert abs(np.linalg.norm(v) - 1.0) < 1e-4


def test_deepwalk_distributed_matches_fastpath(ray_session):
    """Join-per-step path and the dict fastpath produce the same
    walk set; every consecutive (step s, s+1) pair is a real edge."""
    from outbreak_kg_ray.pipelines import graph as g

    SF = "/root/testdata/sf0.001"
    fast = sorted(
        (r["start"], r["walk"], r["step"], r["node"])
        for r in g.deepwalk_corpus(SF, distributed=False).take_all()
    )
    dist = sorted(
        (r["start"], r["walk"], r["step"], r["node"])
        for r in g.deepwalk_corpus(SF, distributed=True).take_all()
    )
    assert fast == dist
    edges = {
        (r["u"], r["v"])
        for r in g.symmetric_cooccurrence_edges(SF).take_all()
    }
    walks = {}
    for s_, w_, p_, n_ in fast:
        walks.setdefault((s_, w_), {})[p_] = n_
    assert walks
    for (s_, w_), seq in walks.items():
        assert seq[0] == s_
        assert sorted(seq) == list(range(len(seq)))
        for p_ in range(1, len(seq)):
            assert (seq[p_ - 1], seq[p_]) in edges
