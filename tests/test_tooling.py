"""Round-5 tooling tests (no Ray needed): the stress RSS guard and
the operator-index sweep-log parser."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_rss_guard_pass_and_fail(monkeypatch):
    import bench

    res = {"driver_rss_growth_mb": 100.0}
    out = bench._rss_guard(dict(res), default_limit_mb=512.0)
    assert out["rss_ok"] and out["rss_limit_mb"] == 512.0

    with pytest.raises(SystemExit):
        bench._rss_guard(
            {"driver_rss_growth_mb": 1000.0}, default_limit_mb=512.0
        )

    monkeypatch.setenv("GRAFT_STRESS_RSS_LIMIT_MB", "2048")
    out = bench._rss_guard(
        {"driver_rss_growth_mb": 1000.0}, default_limit_mb=512.0
    )
    assert out["rss_ok"] and out["rss_limit_mb"] == 2048.0


def test_operator_index_sweep_parser(tmp_path):
    from tools.gen_operator_index import _parse_sweep

    log = tmp_path / "sweep.log"
    log.write_text(
        "2026-01-01 INFO noise line\n"
        "alpha: PASS rows=10/10 schema=True hash=True\n"
        "beta: FAIL rows=1/2 schema=True hash=False\n"
        "gamma: no_oracle rows=5\n"
        "delta: ORACLE_TIMEOUT rows=7 (engine completed)\n"
        "delta: PASS rows=7/7 schema=True hash=True (out-of-band)\n"
    )
    got = _parse_sweep(str(log))
    # later lines win: an out-of-band re-verification upgrades a
    # timeout to PASS (the name_clusters flow)
    assert got == {
        "alpha": "PASS", "beta": "FAIL",
        "gamma": "no_oracle", "delta": "PASS",
    }


def test_resume_log_parse_in_check_queries(tmp_path, monkeypatch):
    # the GRAFT_CHECK_RESUME parser must accept every status token the
    # sweep can emit, or a resumed sweep would redo (or worse, skip)
    # the wrong queries
    import re

    pat = re.compile(
        r"^(\w+): (PASS|FAIL|ERROR|no_oracle|ORACLE_TIMEOUT)"
    )
    lines = [
        "a: PASS rows=1/1 schema=True hash=True",
        "b: ERROR something broke",
        "c: ORACLE_TIMEOUT rows=3 (engine completed; ...)",
        "d: no_oracle rows=9",
        "not a result line",
    ]
    done = {m.group(1) for line in lines if (m := pat.match(line))}
    assert done == {"a", "b", "c", "d"}
