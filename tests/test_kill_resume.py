"""Hard kill-resume test: SIGKILL a real `python -m outbreak_kg_ray
build` subprocess mid-run, re-submit with the same --ckpt, and assert
the resumed output is identical to an uninterrupted run (the
north_rule's "killed ray job submit run resumes without
recomputation"). Uses its own subprocesses (each owns its Ray
session); the pytest session's Ray is untouched."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow.dataset as pads
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _build_cmd(out: str, ckpt: str) -> list[str]:
    return [
        sys.executable, "-m", "outbreak_kg_ray", "build",
        "--sf-dir", SF, "--out", out, "--ckpt", ckpt,
        "--part-rows", "100",
    ]


def _edges_df(out: str) -> pd.DataFrame:
    df = pads.dataset(os.path.join(out, "edges")).to_table().to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True).fillna("∅")


@pytest.mark.slow
def test_sigkill_mid_build_then_resume(tmp_path):
    env = dict(os.environ)
    ckpt = str(tmp_path / "ckpt")

    # clean reference run
    ref_out = str(tmp_path / "ref")
    res = subprocess.run(
        _build_cmd(ref_out, str(tmp_path / "ckpt_ref")),
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    # killed run: SIGKILL once at least one partition has completed
    # start_new_session: the subprocess driver + ITS raylet/workers
    # form their own process group, so SIGKILLing the group takes the
    # whole killed cluster down without touching this pytest
    # session's Ray workers.
    kill_out = str(tmp_path / "kill")
    proc = subprocess.Popen(
        _build_cmd(kill_out, ckpt), cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    meta_dir = os.path.join(ckpt, "kg_products", "meta")
    deadline = time.time() + 240
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — still a valid resume base
        if os.path.isdir(meta_dir) and len(os.listdir(meta_dir)) >= 1:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait(timeout=60)
            break
        time.sleep(0.2)
    else:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        pytest.fail("no partition completed before deadline")
    time.sleep(2)

    n_done_after_kill = (
        len(os.listdir(meta_dir)) if os.path.isdir(meta_dir) else 0
    )

    # resume with the same checkpoint root
    resume_out = str(tmp_path / "resumed")
    res = subprocess.run(
        _build_cmd(resume_out, ckpt),
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["edges"] > 0

    # resumed output == uninterrupted output, byte-for-row
    pd.testing.assert_frame_equal(_edges_df(resume_out), _edges_df(ref_out))

    # the resume skipped the partitions that had completed pre-kill
    with open(os.path.join(ckpt, "kg_products", "manifest.json")) as f:
        man = json.load(f)
    assert man["resumed"] >= min(n_done_after_kill, man["partitions"])
