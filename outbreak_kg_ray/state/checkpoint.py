"""Per-partition checkpoint / resume layer with lineage + metrics.

Ray Data gives task retries and object spilling for free but has no
job-level resume: a killed ``ray job submit`` run restarts its
pipelines from scratch. The reference's crude resume point is its
one-file-per-alert JSON dump (promed_ner.py:134-139); this module is
the engine's explicit replacement (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Layout per stage under ``root``::

    <stage>/data/part-<id>/*.parquet   # the partition's output blocks
    <stage>/meta/part-<id>.json        # fingerprint, rows, wall_s, lineage
    <stage>/manifest.json              # stage summary after completion

Exactly-once partition outputs: each partition is written to a
``data/.tmp-<id>`` directory and atomically renamed to
``data/part-<id>`` only after the write succeeds; the meta record is
written (tmp + rename) after the data rename. A partition is resumed
(skipped) iff its meta exists, its recorded input fingerprint matches,
and its data directory exists — so a kill at ANY point yields either
"partition absent" (recomputed) or "partition complete" (skipped),
never a half-read state.

Partitions are doc_id ranges with Parquet row-filter pushdown, so a
256-node run can carve one input file-set into thousands of restart
units without re-reading finished ranges.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _stabilize_lazy_imports() -> None:
    """Ray's write path lazily runs ``from fsspec.implementations.http
    import HTTPFileSystem`` on every write and relies on catching
    ``ModuleNotFoundError`` (aiohttp is absent here). When two
    partition writes run on concurrent threads, the racing failed
    import surfaces as a plain ``ImportError`` from a
    partially-initialized module, which Ray does NOT catch. Installing
    a benign stub module makes the import succeed once and be cached —
    the stub class is only ever used in an ``isinstance`` check."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel: aiohttp absent, never built
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def file_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{int(st.st_mtime)}"


def doc_range_partitions(
    parquet_path: str, *, part_rows: int = 50_000, id_col: str = "doc_id"
) -> list[dict]:
    """Carve a parquet file-set into contiguous id-range partitions.

    Uses only footer metadata (row count + id column stats) — no data
    read. Each partition dict: ``{id, lo, hi, fingerprint}`` with
    ``lo <= id_col < hi`` (hi is None for the last, open, range).
    """
    import pyarrow.parquet as pq

    meta = pq.read_metadata(parquet_path)
    schema = meta.schema.to_arrow_schema()
    idx = schema.get_field_index(id_col)
    lo_val, hi_val = None, None
    for rg in range(meta.num_row_groups):
        stats = meta.row_group(rg).column(idx).statistics
        if stats is None or not stats.has_min_max:
            continue
        lo_val = stats.min if lo_val is None else min(lo_val, stats.min)
        hi_val = stats.max if hi_val is None else max(hi_val, stats.max)
    if lo_val is None:
        lo_val, hi_val = 0, meta.num_rows
    n_parts = max(1, -(-meta.num_rows // part_rows))
    span = (hi_val - lo_val + 1) / n_parts
    fp = file_fingerprint(parquet_path)
    parts = []
    for i in range(n_parts):
        lo = lo_val + int(i * span)
        hi = lo_val + int((i + 1) * span) if i + 1 < n_parts else None
        parts.append(
            {
                "id": f"{i:05d}",
                "lo": lo,
                "hi": hi,
                "fingerprint": f"{fp}:[{lo},{hi})",
            }
        )
    return parts


class Checkpointer:
    """Stage-level partitioned checkpoint store."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _data_dir(self, stage: str, part_id: str | None = None) -> str:
        d = os.path.join(self._stage_dir(stage), "data")
        return os.path.join(d, f"part-{part_id}") if part_id else d

    def _meta_path(self, stage: str, part_id: str) -> str:
        return os.path.join(self._stage_dir(stage), "meta", f"part-{part_id}.json")

    # -- state ------------------------------------------------------------
    def partition_complete(self, stage: str, part: dict) -> bool:
        meta_path = self._meta_path(stage, part["id"])
        data_dir = self._data_dir(stage, part["id"])
        if not (os.path.exists(meta_path) and os.path.isdir(data_dir)):
            return False
        try:
            with open(meta_path) as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return meta.get("fingerprint") == part["fingerprint"]

    def partitioned_stage(self, stage: str, partitions: list[dict], build,
                          *, max_concurrent: int = 4) -> str:
        """Run ``build(part) -> ray.data.Dataset`` for every partition
        not already complete; returns the stage data dir. Lineage and
        wall-time metrics recorded per partition.

        Up to ``max_concurrent`` partition pipelines execute at once
        (each is an independent streaming execution; overlapping them
        keeps the cluster saturated through per-pipeline ramp-up and
        tail stragglers — a strictly sequential loop leaves most CPUs
        idle between partitions)."""
        from concurrent.futures import ThreadPoolExecutor

        _stabilize_lazy_imports()

        os.makedirs(self._data_dir(stage), exist_ok=True)
        os.makedirs(os.path.join(self._stage_dir(stage), "meta"), exist_ok=True)

        # Stale-layout cleanup: partitions from a previous run with a
        # DIFFERENT partitioning (other part_rows / inputs) would
        # otherwise survive on disk and be read alongside the current
        # layout's output, double-counting rows.
        current_ids = {p["id"] for p in partitions}
        data_root = self._data_dir(stage)
        meta_root = os.path.join(self._stage_dir(stage), "meta")
        for name in os.listdir(data_root):
            pid = name.removeprefix("part-")
            if name.startswith("part-") and pid not in current_ids:
                shutil.rmtree(os.path.join(data_root, name), ignore_errors=True)
            elif name.startswith(".tmp-"):
                shutil.rmtree(os.path.join(data_root, name), ignore_errors=True)
        if os.path.isdir(meta_root):
            for name in os.listdir(meta_root):
                pid = name.removeprefix("part-").removesuffix(".json")
                if pid not in current_ids:
                    os.unlink(os.path.join(meta_root, name))

        todo = []
        skipped = 0
        for part in partitions:
            if self.partition_complete(stage, part):
                skipped += 1
            else:
                todo.append(part)

        def run_one(part: dict) -> None:
            final_dir = self._data_dir(stage, part["id"])
            tmp_dir = os.path.join(
                self._data_dir(stage), f".tmp-{part['id']}-{os.getpid()}"
            )
            shutil.rmtree(tmp_dir, ignore_errors=True)
            shutil.rmtree(final_dir, ignore_errors=True)
            t0 = time.perf_counter()
            ds = build(part)
            # an EMPTY partition's write_parquet creates no directory
            # at all — pre-create it so the atomic rename (and a
            # resumed read) still see a valid zero-row partition
            os.makedirs(tmp_dir, exist_ok=True)
            ds.write_parquet(tmp_dir)
            rows = sum(f["num_rows"] for f in _parquet_file_meta(tmp_dir))
            os.replace(tmp_dir, final_dir)
            _atomic_write_json(
                self._meta_path(stage, part["id"]),
                {
                    "partition": part["id"],
                    "fingerprint": part["fingerprint"],
                    "lineage": {k: v for k, v in part.items() if k != "id"},
                    "rows": rows,
                    "wall_s": round(time.perf_counter() - t0, 3),
                    "completed_at": time.time(),
                },
            )

        done = 0
        if todo:
            if max_concurrent > 1 and len(todo) > 1:
                with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
                    for _ in pool.map(run_one, todo):
                        done += 1
            else:
                for part in todo:
                    run_one(part)
                    done += 1
        _atomic_write_json(
            os.path.join(self._stage_dir(stage), "manifest.json"),
            {
                "stage": stage,
                "partitions": len(partitions),
                "computed": done,
                "resumed": skipped,
                "rows": sum(
                    m.get("rows", 0) for m in self.partition_metas(stage)
                ),
            },
        )
        return self._data_dir(stage)

    def partition_metas(self, stage: str) -> list[dict]:
        meta_dir = os.path.join(self._stage_dir(stage), "meta")
        out = []
        if os.path.isdir(meta_dir):
            for name in sorted(os.listdir(meta_dir)):
                if name.endswith(".json"):
                    with open(os.path.join(meta_dir, name)) as f:
                        out.append(json.load(f))
        return out

    def read(self, stage: str, *, override_num_blocks: int | None = None):
        """Completed stage → Dataset (parquet-backed, streams).

        ``override_num_blocks`` caps the read fan-out: many small
        checkpoint files would otherwise each become a block, and
        every downstream map/write stage pays per-block task overhead
        (a 2M-row table across 256 blocks means 500+ write tasks)."""
        import ray.data as rd

        return rd.read_parquet(
            self._data_dir(stage), override_num_blocks=override_num_blocks
        )


def _parquet_file_meta(d: str) -> list[dict]:
    import pyarrow.parquet as pq

    out = []
    for name in os.listdir(d):
        if name.endswith(".parquet"):
            out.append(
                {"file": name, "num_rows": pq.read_metadata(os.path.join(d, name)).num_rows}
            )
    return out
