"""Local mimic of the driver's correctness gate: run every queries()
entry at a given sf, compare against oracle_sql() via DuckDB
(row-count + sorted-column value comparison), print one line per query.

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main(sf_dir: str = "/root/testdata/sf0.01",
         json_out: str | None = None) -> int:
    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            elif not isinstance(res, pd.DataFrame):
                res = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
            dt = time.time() - t0
            if name in oracles:
                exp = con.execute(oracles[name]).fetchdf()
                a = res[sorted(res.columns)].sort_values(
                    sorted(res.columns)).reset_index(drop=True)
                b = exp[sorted(exp.columns)].sort_values(
                    sorted(exp.columns)).reset_index(drop=True)
                same_cols = list(a.columns) == list(b.columns)
                same_rows = len(a) == len(b)
                ok = (
                    same_cols and same_rows
                    and a.astype(str).equals(b.astype(str))
                )
                status = "MATCH" if ok else "MISMATCH"
                records[name] = {
                    "rows_match": same_rows, "schema_match": same_cols,
                    "hash_match": ok, "ray_rows": len(a),
                    "oracle_rows": len(b), "sec": round(dt, 2), "err": None}
                if not ok:
                    failures += 1
                    detail = (f" cols={list(a.columns)}vs{list(b.columns)}"
                              if not same_cols else f" rows={len(a)}vs{len(b)}")
                    print(f"{name:26s} {status} ({dt:5.1f}s){detail}")
                    if same_cols and same_rows:
                        neq = ~(a.astype(str) == b.astype(str)).all(axis=1)
                        print(a[neq].head(3))
                        print(b[neq].head(3))
                    continue
            else:
                status = f"rows-only n={len(res)}"
                records[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "ray_rows": len(res),
                    "oracle_rows": None, "sec": round(dt, 2),
                    "err": "no_oracle"}
            print(f"{name:26s} {status} ({dt:5.1f}s)")
        except Exception as e:  # noqa: BLE001
            failures += 1
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "ray_rows": None, "oracle_rows": None,
                "sec": round(time.time() - t0, 2),
                "err": f"{type(e).__name__}: {e}"}
            print(f"{name:26s} ERROR ({time.time()-t0:5.1f}s): {type(e).__name__}: {e}")
    print(f"done, {failures} failures")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "failures": failures,
                       "queries": records}, f, indent=1)
        print(f"wrote {json_out}")
    return failures


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--json=")]
    jout = next((a.split("=", 1)[1] for a in sys.argv[1:]
                 if a.startswith("--json=")), None)
    sys.exit(1 if main(*args, json_out=jout) else 0)
