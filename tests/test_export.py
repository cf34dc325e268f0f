"""Resumable partitioned export: chunk planning, atomic part files,
skip-finished on rerun, and equivalence with the streaming pipeline."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from neocrawler_ray.pipelines import export as ex

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def multi_rg_dir(tmp_path):
    """sf0.001 documents rewritten with 100-row row groups so the
    planner produces several chunks."""
    tbl = pq.read_table(f"{SF}/documents.parquet")
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"), row_group_size=100)
    return str(d)


def test_plan_chunks_respects_target(multi_rg_dir):
    path = f"{multi_rg_dir}/documents.parquet"
    assert ex.plan_chunks(path, 100) == [(i, i + 1) for i in range(5)]
    assert ex.plan_chunks(path, 200) == [(0, 2), (2, 4), (4, 5)]
    # target below a row group still yields one-rg chunks, never zero
    assert ex.plan_chunks(path, 10) == [(i, i + 1) for i in range(5)]


def test_export_runs_and_resumes(ray_session, multi_rg_dir, tmp_path):
    from neocrawler_ray.pipelines.corpus_ops import doc_text_stats

    out = str(tmp_path / "out")
    r1 = ex.resumable_export(multi_rg_dir, out, "text_stats",
                             target_rows=100)
    assert r1 == {"chunks": 5, "ran": 5, "skipped": 0, "rows": 500}

    expected = doc_text_stats(multi_rg_dir).to_pandas()
    got = ex.read_export(out).to_pandas()
    key = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[key].sort_values("doc_id").reset_index(drop=True),
        expected[key].sort_values("doc_id").reset_index(drop=True))

    # kill one part; rerun recomputes ONLY that chunk
    victim = os.path.join(out, "part-000-00002.parquet")
    os.remove(victim)
    mtimes = {f: os.path.getmtime(os.path.join(out, f))
              for f in sorted(os.listdir(out))}
    r2 = ex.resumable_export(multi_rg_dir, out, "text_stats",
                             target_rows=100)
    assert r2["ran"] == 1 and r2["skipped"] == 4 and r2["rows"] == 100
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == m, f
    assert os.path.exists(victim)
    assert len(ex.read_export(out).to_pandas()) == 500

    # fully-finished rerun is a no-op
    r3 = ex.resumable_export(multi_rg_dir, out, "text_stats",
                             target_rows=100)
    assert r3 == {"chunks": 5, "ran": 0, "skipped": 5, "rows": 0}


def test_unknown_transform_raises(multi_rg_dir, tmp_path):
    with pytest.raises(ValueError, match="unknown transform"):
        ex.resumable_export(multi_rg_dir, str(tmp_path / "o"), "nope")
