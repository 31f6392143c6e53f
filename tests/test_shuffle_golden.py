"""Salted-shuffle semantics + golden sorted-TSV emission tests."""

from __future__ import annotations

import pyarrow as pa

from outbreak_kg_ray.sources import writers
from outbreak_kg_ray.stages.shuffle import salted_count, salted_sum


def _hot_ds(n_hot=5000, n_cold=50):
    import ray.data as rd

    keys = ["hub"] * n_hot + [f"cold{i}" for i in range(n_cold)]
    vals = list(range(n_hot)) + [1] * n_cold
    return rd.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    ).repartition(8)


def test_salted_count_matches_plain_groupby(ray_session):
    df = salted_count(_hot_ds().select_columns(["k"]), ["k"]).to_pandas()
    by_key = dict(zip(df["k"], df["count"]))
    assert by_key["hub"] == 5000
    assert by_key["cold0"] == 1
    assert len(df) == 51


def test_salted_sum_matches_plain_groupby(ray_session):
    df = salted_sum(_hot_ds(), ["k"], "v", alias="total").to_pandas()
    by_key = dict(zip(df["k"], df["total"]))
    assert by_key["hub"] == sum(range(5000))
    assert by_key["cold3"] == 1


def test_golden_tsv_emission(ray_session, tmp_path):
    """Sorted-set TSV emission matches the reference's
    csv.writer(delimiter='\\t') + sorted(list(set(...))) shape
    (kg/build.py:89-94 / T1) byte-for-byte."""
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "start_id": ["b", "a", "b"],
                "rel_type": ["isa", "isa", "isa"],
                "end_id": ["x", "y", "x"],
            }
        )
    )
    path = str(tmp_path / "edges.tsv")
    n = writers.write_sorted_tsv(ds, path, ["start_id", "rel_type", "end_id"])
    # emission keeps duplicates unless pre-deduped (reference dedups
    # via set() before sorting; engine dedups in-pipeline)
    assert n == 3
    with open(path) as fh:
        lines = fh.read().splitlines()
    assert lines[0] == ":START_ID\t:TYPE\t:END_ID"
    assert lines[1:] == ["a\tisa\ty", "b\tisa\tx", "b\tisa\tx"]


def test_golden_tsv_roundtrip_canonical(ray_session, tmp_path):
    """canonical_edges → golden TSV: header mapping + deterministic
    byte-stable output across two emissions."""
    from outbreak_kg_ray.pipelines import kg

    sf = "/root/testdata/sf0.001"
    ds = kg.canonical_edges(sf)
    cols = ["start_id", "rel_type", "end_id"]
    p1, p2 = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
    writers.write_sorted_tsv(ds.select_columns(cols), p1, cols)
    writers.write_sorted_tsv(
        kg.canonical_edges(sf).select_columns(cols), p2, cols
    )
    assert open(p1, "rb").read() == open(p2, "rb").read()
    with open(p1) as fh:
        assert fh.readline().rstrip("\n") == ":START_ID\t:TYPE\t:END_ID"


def test_zip_with_index_global_order(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from outbreak_kg_ray.stages.shuffle import zip_with_index

    vals = [f"k{i:04d}" for i in range(500)]
    ds = rd.from_arrow(pa.table({"key": vals})).repartition(7).sort("key")
    out = zip_with_index(ds, rank_col="idx").to_pandas()
    out = out.sort_values("idx").reset_index(drop=True)
    assert out["key"].tolist() == sorted(vals)
    assert out["idx"].tolist() == list(range(500))


# ---------------------------------------------------------------------------
# round 4: keyed_partitions (hash-partitioned keyed processing)
# ---------------------------------------------------------------------------


def test_keyed_partitions_colocates_keys(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from outbreak_kg_ray.stages.shuffle import keyed_partitions

    n = 5000
    ds = rd.range(n).map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(
                    [i % 137 for i in t.column("id").to_pylist()], pa.int64()
                ),
                "v": t.column("id"),
            }
        ),
        batch_format="pyarrow",
    )

    # per-partition count per key; if a key were split across
    # partitions, the per-key total would arrive in >1 output row
    def per_key_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([([], "count_all")])
        return pa.table(
            {"k": g.column("k"), "n": g.column("count_all")}
        )

    rows = keyed_partitions(
        ds, ["k"], per_key_counts,
        schema=pa.schema([("k", pa.int64()), ("n", pa.int64())]),
    ).take_all()
    seen = {}
    for r in rows:
        assert r["k"] not in seen, "key split across partitions"
        seen[r["k"]] = r["n"]
    assert sum(seen.values()) == n
    assert len(seen) == 137


def test_keyed_partitions_string_and_timestamp_keys(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from outbreak_kg_ray.stages.shuffle import partition_ids

    t = pa.table(
        {
            "s": pa.array(["x", "y", "x", None], pa.string()),
            "ts": pa.array([1, 2, 1, 3], pa.timestamp("us")),
        }
    )
    pid1 = partition_ids(t, ["s", "ts"], 8).to_pylist()
    pid2 = partition_ids(t, ["s", "ts"], 8).to_pylist()
    assert pid1 == pid2  # deterministic
    assert pid1[0] == pid1[2]  # equal keys → equal partition
    assert all(0 <= p < 8 for p in pid1)
