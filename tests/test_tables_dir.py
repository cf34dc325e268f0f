"""Directory-of-parquet tables: every reader resolves a logical table
as either ``{table}.parquet`` or a ``{table}/`` directory of part files
(the 100-TB layout) with identical results."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from neocrawler_ray.sources import tables as tb

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dir_sf(tmp_path_factory):
    """sf0.001 with documents/embeddings rewritten as 3-file dirs."""
    d = tmp_path_factory.mktemp("dirsf")
    for table in ("documents", "embeddings"):
        tbl = pq.read_table(f"{SF}/{table}.parquet")
        sub = d / table
        sub.mkdir()
        n = tbl.num_rows
        cuts = [0, n // 3, 2 * n // 3, n]
        for i in range(3):
            pq.write_table(tbl.slice(cuts[i], cuts[i + 1] - cuts[i]),
                           str(sub / f"chunk-{i}.parquet"))
    return str(d)


def test_resolution_and_rows(dir_sf):
    assert len(tb.table_files(dir_sf, "documents")) == 3
    assert tb.table_rows(dir_sf, "documents") == \
        tb.table_rows(SF, "documents")
    with pytest.raises(FileNotFoundError):
        tb.table_path(dir_sf, "missing_table")


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_ops_match_single_file(ray_session, dir_sf):
    from neocrawler_ray.pipelines import corpus_ops as co
    from neocrawler_ray.pipelines import doc_extract as de

    for fn in (co.doc_text_stats, co.dedup_exact, de.doc_extract,
               lambda sf: co.ann_brute_topk(sf, 5, 10)):
        a = fn(dir_sf)
        b = fn(SF)
        a = a.to_pandas() if hasattr(a, "to_pandas") else a
        b = b.to_pandas() if hasattr(b, "to_pandas") else b
        pd.testing.assert_frame_equal(_sorted(a), _sorted(b))


def test_export_over_directory(ray_session, dir_sf, tmp_path):
    from neocrawler_ray.pipelines import export as ex

    out = str(tmp_path / "out")
    r = ex.resumable_export(dir_sf, out, "text_stats", target_rows=100)
    assert r["rows"] == tb.table_rows(SF, "documents")
    assert r["chunks"] == r["ran"] == 3  # one single-row-group chunk per file
    r2 = ex.resumable_export(dir_sf, out, "text_stats", target_rows=100)
    assert r2["ran"] == 0 and r2["skipped"] == r["chunks"]


# --- jsonl / csv layouts ----------------------------------------------


@pytest.fixture(scope="module")
def fmt_sf(tmp_path_factory):
    """sf0.001 with documents as a 2-file jsonl dir and customer as a
    single csv (the raw-corpus arrival formats)."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("fmtsf")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    sub = d / "documents"
    sub.mkdir()
    half = len(docs) // 2
    docs.iloc[:half].to_json(sub / "part-0.jsonl", orient="records",
                             lines=True, force_ascii=False)
    docs.iloc[half:].to_json(sub / "part-1.jsonl", orient="records",
                             lines=True, force_ascii=False)
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    cust.to_csv(d / "customer.csv", index=False)
    return str(d)


def test_jsonl_rows_and_read(ray_session, fmt_sf):
    assert tb.table_rows(fmt_sf, "documents") == \
        tb.table_rows(SF, "documents")
    a = _sorted(tb.read_table(fmt_sf, "documents",
                              ["doc_id", "text", "lang"]).to_pandas())
    b = _sorted(tb.read_table(SF, "documents",
                              ["doc_id", "text", "lang"]).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_jsonl_rows_ignore_blank_lines(tmp_path):
    """Interior/trailing blank lines are not records: ray.data's JSON
    reader skips them, so the count must too (it feeds
    override_num_blocks / _parts_for sizing)."""
    sub = tmp_path / "t"
    sub.mkdir()
    (sub / "part-0.jsonl").write_bytes(
        b'\n{"a":1}\n\n\n{"a":2}\n{"a":3}\n\n')
    (sub / "part-1.jsonl").write_bytes(b'{"a":4}\n{"a":5}')  # unterminated
    assert tb.table_rows(str(tmp_path), "t") == 5


def test_csv_rows_and_read(ray_session, fmt_sf):
    assert tb.table_rows(fmt_sf, "customer") == \
        tb.table_rows(SF, "customer")
    a = _sorted(tb.read_table(fmt_sf, "customer",
                              ["c_custkey", "c_name", "c_acctbal"])
                .to_pandas())
    b = _sorted(tb.read_table(SF, "customer",
                              ["c_custkey", "c_name", "c_acctbal"])
                .to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_ops_match_over_jsonl(ray_session, fmt_sf):
    """A real operator over the jsonl layout must equal the parquet
    answer byte-for-byte."""
    from neocrawler_ray.pipelines import corpus_ops as co

    a = co.doc_text_stats(fmt_sf)
    b = co.doc_text_stats(SF)
    a = a.to_pandas() if hasattr(a, "to_pandas") else a
    b = b.to_pandas() if hasattr(b, "to_pandas") else b
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b))


def test_filter_expr_refused_on_jsonl(fmt_sf):
    import pyarrow.dataset as pads

    with pytest.raises(ValueError, match="parquet"):
        tb.read_table(fmt_sf, "documents", ["doc_id"],
                      filter_expr=pads.field("doc_id") > 0)
