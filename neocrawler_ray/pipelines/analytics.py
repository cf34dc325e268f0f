"""Reporting / aggregation pipelines (reference §2.5 A1-A3 re-expressed).

The reference's monitoring layer is daily counters (`hincrby
count:{yyyymmdd}` by event class × domain, reference
instance/example/spider_extend.js:97-169) read back as per-day series
(reference webconfig/controllers/monitor.js:53-171).  Here the same
shapes run over the synthetic ``events`` / TPC-H-ish tables as proper
distributed aggregates:

- per-batch **partial aggregation** (pandas groupby inside map_batches)
  before the global ``groupby`` — the exchange carries one row per
  (key, block), not per event;
- **broadcast joins** for small dimension tables (customer, nation) —
  a dict captured in the batch fn, never a shuffle;
- money columns are compared in **fixed-point**: ``FLOOR(v * 10000)``
  per row on both the Ray and the DuckDB side, so value hashes match
  bit-for-bit (double sums are order-dependent; floored-int sums are
  exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _read(sf_dir: str, table: str, columns: list[str]):
    """Column-pruned read with a row-aware block count.

    Ray's default splits any file into ~2×CPU blocks; for small dimension
    tables that floods downstream groupbys with per-block overhead.  One
    block per ~50k rows (min 1) keeps map parallelism where the data is
    and makes shuffles on small tables near-free; huge inputs still fan
    out wide (the count comes from parquet metadata, not a scan)."""
    import pyarrow.parquet as pq
    import ray

    path = f"{sf_dir}/{table}.parquet"
    rows = pq.read_metadata(path).num_rows
    blocks = max(1, rows // 50_000)
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=blocks)


def _e4(series: pd.Series) -> np.ndarray:
    """FLOOR(v*10000) as int64 — the shared fixed-point convention."""
    return np.floor(series.to_numpy(dtype="float64") * 10000.0).astype("int64")


def _finish_small(ds_partials, keys: list[str], sums: dict[str, str]) -> pd.DataFrame:
    """Final reduce for ANSWER-SIZED aggregates: the per-batch partial
    already collapsed each block to ≤ |keys| rows, so the remaining data
    is ~keys × blocks — pull that (tiny) frame and finish with one
    vectorized pandas groupby on the driver.  Avoids a full Ray
    sort-shuffle whose empty output partitions surface as schema-less
    pandas blocks ("different schema" warnings) and whose per-key reduce
    is orders slower than the C kernel.  ``sums`` maps partial column →
    output column name."""
    df = ds_partials.to_pandas()
    g = df.groupby(keys, as_index=False)[list(sums)].sum()
    g = g.rename(columns=sums)
    for c in sums.values():
        g[c] = g[c].astype("int64")
    return g.sort_values(keys).reset_index(drop=True)


def events_daily_counts(sf_dir: str):
    """Daily event counters by class — A1 (count:{yyyymmdd} hash) shape."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"date": df["ts"].dt.strftime("%Y-%m-%d"),
             "event_type": df["event_type"]}
        )
        g = out.groupby(["date", "event_type"], as_index=False).size()
        return g.rename(columns={"size": "partial_n"}).astype({"partial_n": "int64"})

    ds = ds.map_batches(partial, batch_format="pandas")
    return _finish_small(ds, ["date", "event_type"], {"partial_n": "n"})


def events_value_by_type(sf_dir: str):
    """Σ value (fixed-point) + count per event class."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tmp = pd.DataFrame(
            {"event_type": df["event_type"], "value_e4": _e4(df["value"])}
        )
        g = tmp.groupby("event_type", as_index=False).agg(
            partial_sum=("value_e4", "sum"), partial_n=("value_e4", "size")
        )
        return g.astype({"partial_sum": "int64", "partial_n": "int64"})

    ds = ds.map_batches(partial, batch_format="pandas")
    return _finish_small(ds, ["event_type"],
                         {"partial_sum": "value_e4", "partial_n": "n"})


def q1_lineitem(sf_dir: str):
    """TPC-H Q1 shape: per (returnflag, linestatus) sums/counts."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tmp = pd.DataFrame(
            {"l_returnflag": df["l_returnflag"],
             "l_linestatus": df["l_linestatus"],
             "qty": df["l_quantity"].to_numpy(dtype="float64").astype("int64"),
             "price_e4": _e4(df["l_extendedprice"])}
        )
        g = tmp.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            p_qty=("qty", "sum"), p_price=("price_e4", "sum"), p_n=("qty", "size")
        )
        return g.astype({"p_qty": "int64", "p_price": "int64", "p_n": "int64"})

    ds = ds.map_batches(partial, batch_format="pandas")
    return _finish_small(
        ds, ["l_returnflag", "l_linestatus"],
        {"p_qty": "sum_qty", "p_price": "sum_price_e4", "p_n": "count_order"})


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k customers by order revenue — broadcast join to names.

    Revenue aggregates distributed (partial per batch → groupby); the
    customer dimension is read once, turned into a plain dict and
    captured by the rename fn (broadcast-join semantics, J1 analogue)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tmp = pd.DataFrame(
            {"o_custkey": df["o_custkey"].astype("int64"),
             "rev": _e4(df["o_totalprice"])}
        )
        g = tmp.groupby("o_custkey", as_index=False).agg(
            p_rev=("rev", "sum"), p_n=("rev", "size"))
        return g.astype({"p_rev": "int64", "p_n": "int64"})

    from .corpus_ops import _hash_grouped

    def per_part_topk(df: pd.DataFrame) -> pd.DataFrame:
        """Custkey totals + LOCAL top-k inside each hash partition: every
        custkey lives wholly in one partition, so the global top-k is
        exactly the top-k of the ≤64×k partition candidates — the driver
        never sees the full per-customer aggregate."""
        g = df.groupby("o_custkey", as_index=False)[["p_rev", "p_n"]].sum()
        g = g.rename(columns={"p_rev": "revenue_e4", "p_n": "n_orders"})
        return g.sort_values(["revenue_e4", "o_custkey"],
                             ascending=[False, True],
                             kind="mergesort").head(k)

    cands = _hash_grouped(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_custkey"], per_part_topk,
    ).to_pandas()
    agg = cands.sort_values(["revenue_e4", "o_custkey"],
                            ascending=[False, True], kind="mergesort").head(k)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    names = dict(zip(cust["c_custkey"].astype("int64"), cust["c_name"]))
    out = pd.DataFrame(
        {"c_custkey": agg["o_custkey"].astype("int64").to_numpy(),
         "c_name": [names.get(int(ck), "") for ck in agg["o_custkey"]],
         "revenue_e4": agg["revenue_e4"].astype("int64").to_numpy(),
         "n_orders": agg["n_orders"].astype("int64").to_numpy()}
    )
    return out.reset_index(drop=True)


def revenue_by_nation(sf_dir: str):
    """Order revenue rolled up to nations via two broadcast dims.

    orders (fact, streamed) × customer (broadcast dict) × nation
    (broadcast dict) → partial per batch → small global groupby."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    c2n = dict(zip(cust["c_custkey"].astype("int64"),
                   cust["c_nationkey"].astype("int64")))
    n2name = dict(zip(nation["n_nationkey"].astype("int64"), nation["n_name"]))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nk = df["o_custkey"].astype("int64").map(lambda x: c2n.get(int(x), -1))
        tmp = pd.DataFrame(
            {"n_name": nk.map(lambda x: n2name.get(int(x), "UNKNOWN")),
             "rev": _e4(df["o_totalprice"])}
        )
        g = tmp.groupby("n_name", as_index=False).agg(
            p_rev=("rev", "sum"), p_n=("rev", "size"))
        return g.astype({"p_rev": "int64", "p_n": "int64"})

    ds = orders.map_batches(partial, batch_format="pandas")
    return _finish_small(ds, ["n_name"],
                         {"p_rev": "revenue_e4", "p_n": "n_orders"})
