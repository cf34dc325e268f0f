"""The ``ray job submit`` entrypoint (tools/crawl_job.py): a fresh
process connects to its own Ray, runs the checkpointed wave loop, and a
``--resume`` rerun continues from the newest checkpoint instead of
starting over — the job-level restart story of the north-star
deployment (reference: scheduler/spider restart against durable
redis/ssdb state, scheduler/index.js:124-157)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(*extra: str) -> dict:
    env = dict(os.environ, RAY_ADDRESS="local")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "crawl_job.py"),
         "--sf-dir", SF, "--out", "/tmp/nc_job_test", *extra],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])

def test_job_entrypoint_runs_and_resumes():
    shutil.rmtree("/tmp/nc_job_test", ignore_errors=True)
    first = _run("--max-waves", "2")
    assert first["status"] == "ok"
    assert first["waves"] == 2 and first["scheduled_urls"] > 0
    assert first["resumed_from_wave"] == 0

    resumed = _run("--resume")
    assert resumed["status"] == "ok"
    # the rerun restored wave-2 state and only crawled the remainder
    assert resumed["resumed_from_wave"] == 2
    assert resumed["waves"] > 2
    shutil.rmtree("/tmp/nc_job_test", ignore_errors=True)
