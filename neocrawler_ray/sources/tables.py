"""Table path resolution: a logical table is either a single
``{table}.parquet`` file (driver testdata) or a ``{table}/`` directory
of part files (how a 100-TB table actually arrives).  Every pipeline
reader resolves through here so both layouts work everywhere; row
counts come from parquet metadata only — never a data scan.
"""

from __future__ import annotations

import glob
import os


def table_path(sf_dir: str, table: str) -> str:
    """The file or directory for a logical table (file wins if both)."""
    f = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.exists(f):
        return f
    d = os.path.join(sf_dir, table)
    if os.path.isdir(d):
        return d
    raise FileNotFoundError(
        f"no {table}.parquet file or {table}/ directory under {sf_dir}")


def table_files(sf_dir: str, table: str) -> list[str]:
    """Sorted part files (deterministic order — resumable-export chunk
    ids and sample filters depend on it)."""
    p = table_path(sf_dir, table)
    if os.path.isdir(p):
        files = sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                 recursive=True))
        if not files:
            raise FileNotFoundError(f"no *.parquet under {p}")
        return files
    return [p]


def table_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows
               for f in table_files(sf_dir, table))


def read_table(sf_dir: str, table: str, columns: list[str],
               rows_per_block: int = 50_000, filter_expr=None):
    """Column-pruned Dataset with a row-aware block count (one block
    per ``rows_per_block`` rows, min 1) — see the pipeline docstrings
    for why the default 2×CPU split floods small-table shuffles.

    ``filter_expr`` (a ``pyarrow.dataset`` expression) is pushed into
    the parquet scan itself — row groups whose column statistics can't
    match are never read, so a delta scan over a time-partitioned
    table touches only the tail row groups (the prune-at-the-read rule
    applied to rows, not just columns)."""
    import ray

    rows = table_rows(sf_dir, table)
    blocks = max(1, rows // max(1, rows_per_block))
    kw = {} if filter_expr is None else {"filter": filter_expr}
    return ray.data.read_parquet(table_files(sf_dir, table),
                                 columns=columns,
                                 override_num_blocks=blocks, **kw)
