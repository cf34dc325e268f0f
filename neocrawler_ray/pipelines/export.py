"""Resumable partitioned export for per-document transforms.

At the 100-TB design point a per-document transform (text stats,
language ID, fingerprints) runs for hours; a crash must not restart
from zero.  Ray Data's ``write_parquet`` has no skip-finished
semantics, so this module plans the input into deterministic
row-group-aligned chunks and runs each chunk as ONE Ray task:

    read row-group slice → pure pandas kernel → write to a temp file →
    atomic ``os.replace`` to ``part-{i:05d}.parquet``

The atomic rename makes the output file's existence the completion
marker — a rerun skips every chunk whose part file exists and
recomputes only the missing ones.  Raw ``@ray.remote`` tasks (not a
Dataset stage) are the right primitive here: the unit of restart must
equal the unit of output, and that mapping (chunk i ↔ part-i) has to be
deterministic across runs, which a streaming executor's dynamic block
assignment cannot promise.  A chunk holds whole row groups up to
``target_rows``, so worker memory is bounded by ``max(target_rows,
largest row group)`` — see :func:`plan_chunks` for the single-row-group
floor.
"""

from __future__ import annotations

import os

import pandas as pd

# Bump whenever a transform kernel's OUTPUT changes (new column, new
# semantics) or the part-file naming changes: cache dirs built from
# this version invalidate automatically instead of serving stale parts.
EXPORT_VERSION = 2

# transform name → pandas kernel(df) -> df.  Kept as names (not
# callables) so the task payload is a string, never a pickled closure.
_TRANSFORMS = {}


def _register(name: str):
    def deco(fn):
        _TRANSFORMS[name] = fn
        return fn
    return deco


@_register("text_stats")
def _t_text_stats(df: pd.DataFrame) -> pd.DataFrame:
    from ..functions import text_stats as ts

    out = ts.text_stats_frame(df["text"])
    out.insert(0, "doc_id", df["doc_id"].astype("int64").to_numpy())
    return out


@_register("lang_id")
def _t_lang_id(df: pd.DataFrame) -> pd.DataFrame:
    from ..functions import text_stats as ts

    return pd.DataFrame(
        {"doc_id": df["doc_id"].astype("int64").to_numpy(),
         "lang_pred": ts.lang_id_markers(df["text"]).to_numpy(dtype=object)})


@_register("fingerprint")
def _t_fingerprint(df: pd.DataFrame) -> pd.DataFrame:
    from ..functions import text_stats as ts

    return pd.DataFrame(
        {"doc_id": df["doc_id"].astype("int64").to_numpy(),
         "fp": ts.simplefp(df["text"]).to_numpy(dtype=object)})


def plan_chunks(path: str, target_rows: int) -> list[tuple[int, int]]:
    """Split a parquet file into [rg_lo, rg_hi) row-group ranges of
    ≤ ``target_rows`` rows each (always ≥1 row group per chunk).  Planned
    from metadata only — no data scan.

    Memory floor: the row group is the smallest restartable read unit
    here, so a single row group larger than ``target_rows`` becomes one
    oversized chunk — worker memory is bounded by
    ``max(target_rows, largest row group)`` rows, not strictly
    ``target_rows``.  Write inputs with reasonable row-group sizes
    (pyarrow defaults to ~1M rows) or lower them for very wide rows."""
    import pyarrow.parquet as pq

    meta = pq.read_metadata(path)
    chunks, lo, acc = [], 0, 0
    for rg in range(meta.num_row_groups):
        n = meta.row_group(rg).num_rows
        if acc and acc + n > target_rows:
            chunks.append((lo, rg))
            lo, acc = rg, 0
        acc += n
    if lo < meta.num_row_groups:
        chunks.append((lo, meta.num_row_groups))
    return chunks


def _run_chunk(path: str, rg_lo: int, rg_hi: int, transform: str,
               columns: list[str], out_file: str) -> int:
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    tbl = pf.read_row_groups(list(range(rg_lo, rg_hi)), columns=columns)
    out = _TRANSFORMS[transform](tbl.to_pandas())
    tmp = f"{out_file}.tmp-{os.getpid()}"
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
    os.replace(tmp, out_file)  # atomic: existence == completion
    return len(out)


def resumable_export(sf_dir: str, out_dir: str, transform: str = "text_stats",
                     table: str = "documents",
                     columns: list[str] | None = None,
                     target_rows: int = 100_000) -> dict:
    """Run ``transform`` over ``table`` into ``out_dir`` as partitioned
    Parquet, skipping chunks whose part file already exists.  Returns
    ``{"chunks", "ran", "skipped", "rows"}``."""
    import ray

    if transform not in _TRANSFORMS:
        raise ValueError(f"unknown transform {transform!r}; "
                         f"have {sorted(_TRANSFORMS)}")
    from ..sources.tables import table_files

    columns = columns or ["doc_id", "text"]
    os.makedirs(out_dir, exist_ok=True)
    # chunk ids are (sorted-file index, in-file chunk index) — stable
    # across runs, so a directory-of-parts table resumes just like a
    # single file
    chunks = [(path, f_idx, i, lo, hi)
              for f_idx, path in enumerate(table_files(sf_dir, table))
              for i, (lo, hi) in enumerate(plan_chunks(path, target_rows))]

    task = ray.remote(num_cpus=1)(_run_chunk)
    futs, skipped = [], 0
    for path, f_idx, i, lo, hi in chunks:
        out_file = os.path.join(out_dir, f"part-{f_idx:03d}-{i:05d}.parquet")
        if os.path.exists(out_file):
            skipped += 1
            continue
        futs.append(task.remote(path, lo, hi, transform, columns, out_file))
    rows = sum(ray.get(futs)) if futs else 0
    return {"chunks": len(chunks), "ran": len(futs),
            "skipped": skipped, "rows": rows}


def read_export(out_dir: str):
    """The exported partition directory as a Dataset."""
    import ray

    return ray.data.read_parquet(out_dir)
