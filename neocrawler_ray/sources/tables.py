"""Table path resolution: a logical table is either a single
``{table}.{parquet,jsonl,csv}`` file (driver testdata / raw-corpus
drops) or a ``{table}/`` directory of part files (how a 100-TB table
actually arrives).  Every pipeline reader resolves through here so all
layouts work everywhere; parquet row counts come from metadata only —
never a data scan.

Format notes (the honest trade-offs, not hidden):
- **parquet** is the scale path: column pruning and predicate pushdown
  happen IN the scan (row groups pruned by statistics).
- **jsonl/csv** exist because raw corpora arrive that way (Common-Crawl
  derivatives ship .jsonl.gz).  Neither carries statistics: column
  pruning happens AFTER decode (``select_columns``), row counts cost
  one streaming pass, and ``filter_expr`` is refused rather than
  silently degraded — convert to parquet before the heavy pipelines.
"""

from __future__ import annotations

import glob
import os

_EXTS = (".parquet", ".jsonl", ".csv")


def table_path(sf_dir: str, table: str) -> str:
    """The file or directory for a logical table (file wins if both;
    parquet wins over jsonl over csv when several files exist)."""
    for ext in _EXTS:
        f = os.path.join(sf_dir, f"{table}{ext}")
        if os.path.exists(f):
            return f
    d = os.path.join(sf_dir, table)
    if os.path.isdir(d):
        return d
    raise FileNotFoundError(
        f"no {table}.{{parquet,jsonl,csv}} file or {table}/ directory "
        f"under {sf_dir}")


def table_files(sf_dir: str, table: str) -> list[str]:
    """Sorted part files (deterministic order — resumable-export chunk
    ids and sample filters depend on it).  A directory must hold ONE
    format; parquet is preferred if several are present."""
    p = table_path(sf_dir, table)
    if os.path.isdir(p):
        for ext in _EXTS:
            files = sorted(glob.glob(os.path.join(p, "**", f"*{ext}"),
                                     recursive=True))
            if files:
                return files
        raise FileNotFoundError(f"no *.parquet/*.jsonl/*.csv under {p}")
    return [p]


def _table_format(files: list[str]) -> str:
    return os.path.splitext(files[0])[1].lstrip(".")


def table_rows(sf_dir: str, table: str) -> int:
    files = table_files(sf_dir, table)
    fmt = _table_format(files)
    if fmt == "parquet":
        import pyarrow.parquet as pq

        return sum(pq.read_metadata(f).num_rows for f in files)
    if fmt == "jsonl":
        # NDJSON: one record per line (embedded newlines are escaped by
        # spec).  Count only NON-EMPTY lines — blank interior/trailing
        # lines are skipped by the JSON reader, and counting them would
        # inflate override_num_blocks / _parts_for sizing: a line ends a
        # record only if the byte before its "\n" wasn't itself "\n".
        import numpy as np

        total = 0
        for f in files:
            with open(f, "rb") as fh:
                prev = b"\n"  # BOF behaves like a preceding newline
                while chunk := fh.read(1 << 20):
                    a = np.frombuffer(prev + chunk, dtype=np.uint8)
                    nl = a == 0x0A
                    # "\n" whose preceding byte wasn't "\n" ⇒ one record
                    # (nl[1:] spans exactly the chunk's bytes)
                    total += int(np.count_nonzero(nl[1:] & ~nl[:-1]))
                    prev = chunk[-1:]
                if prev != b"\n":
                    total += 1  # unterminated final record
        return total
    # csv: quoted fields may embed newlines — count via the streaming
    # reader (one decode pass; the price of a statistics-free format)
    import pyarrow.csv as pcsv

    total = 0
    for f in files:
        with pcsv.open_csv(f) as reader:
            for batch in reader:
                total += batch.num_rows
    return total


def read_table(sf_dir: str, table: str, columns: list[str],
               rows_per_block: int = 50_000, filter_expr=None):
    """Column-pruned Dataset with a row-aware block count (one block
    per ``rows_per_block`` rows, min 1) — see the pipeline docstrings
    for why the default 2×CPU split floods small-table shuffles.

    ``filter_expr`` (a ``pyarrow.dataset`` expression) is pushed into
    the parquet scan itself — row groups whose column statistics can't
    match are never read, so a delta scan over a time-partitioned
    table touches only the tail row groups (the prune-at-the-read rule
    applied to rows, not just columns).  Parquet-only: jsonl/csv have
    no statistics to prune with, and a silent full-scan fallback would
    hide the regression, so it raises instead."""
    import ray

    files = table_files(sf_dir, table)
    fmt = _table_format(files)
    rows = table_rows(sf_dir, table)
    blocks = max(1, rows // max(1, rows_per_block))
    if fmt == "parquet":
        kw = {} if filter_expr is None else {"filter": filter_expr}
        return ray.data.read_parquet(files, columns=columns,
                                     override_num_blocks=blocks, **kw)
    if filter_expr is not None:
        raise ValueError(
            f"filter_expr needs parquet statistics; table {table!r} "
            f"resolved to {fmt} — convert it to parquet first")
    if fmt == "jsonl":
        ds = ray.data.read_json(files, override_num_blocks=blocks)
    else:
        ds = ray.data.read_csv(files, override_num_blocks=blocks)
    # columns=None means "all columns" (profiler scans); select_columns
    # rejects None
    return ds if columns is None else ds.select_columns(columns)
