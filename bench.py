"""Benchmark harness — headline crawl pipeline + operator suite.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "urls_per_sec": ...}

Headline = wall-seconds for the frontier→fetch-sim→extract crawl of the
synthetic pages corpus matching $GRAFT_SF_DIR (default
/root/testdata/sf0.1 → 50k pages, 50 domains), using a throughput-tuned
config (the parity tests use the reference's conservative defaults;
the bench raises the per-wave quota the way a real deployment would).

``--scaling``: runs the headline crawl in FRESH subprocesses at
num_cpus=N and 4N (default 4 → 16) on the same corpus and reports both
throughputs plus scaling efficiency ``eff = (thr_4N / thr_N) / 4``.
Round 3 made the ladder faithful to the two-cluster-size criterion it
stands in for:

- **Each leg is pinned to exactly N physical cores**
  (``os.sched_setaffinity`` before ``ray.init``; Ray workers inherit).
  ``ray.init(num_cpus=N)`` alone caps *task slots*, not cores — the
  small leg's pyarrow/IO/actor threads silently spill onto all 32
  cores, which a real N-node cluster cannot do, deflating measured
  efficiency.
- **Legs are interleaved into matched-window pairs** (N, 4N, N, 4N, …)
  because host CPU-steal on this shared VM swings single-run wall time
  3-4× minute to minute; only a pair measured in the same window is a
  valid A/B.  The reported ``value`` is the efficiency of the pair
  from the *quietest* window — the pair minimizing total compute-time
  (t_4N + t_N/4) — NOT the max-efficiency pair, which would
  cherry-pick steal on the small leg.  All pairs are reported.
- The harness still measures the machine's busy-loop parallel ceiling
  (pinned pools) and reports ``value_normalized = eff / ceiling_eff``
  — comparable to a dedicated cluster where the ceiling ≈1.0.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Bench pages carry realistic Common-Crawl DOM weight (filler chrome ×12
# ≈ 15-30 KB html/page) so fetch+extract compute — not wave bookkeeping —
# dominates, as it would on real pages; parity corpora stay small.
BENCH_PAGE_WEIGHT = int(os.environ.get("GRAFT_PAGE_WEIGHT", "12"))


def bench_settings(num_cpus: int):
    from neocrawler_ray.config import CrawlSettings

    return CrawlSettings(
        schedule_quantity_limitation=20000,
        # non-binding at bench scale (politeness_deferred stays 0 at
        # 10k); set above quota+rules so the provably-exact speculative
        # schedule engages (crawl.py gate) — behavior-identical, the
        # budget only matters when it defers and it never does here
        politeness_per_host_per_wave=int(
            os.environ.get("NC_BENCH_POLITENESS", "50000")),
        # shard count follows frontier size, not CPU count: shards are
        # state partitions; RPC fan-out per wave barrier is O(shards).
        # Swept 4/8/16 at this corpus (61k urls) across widths — 4 wins
        # everywhere (w48: 60.0 vs 64.0 s at 4 cpus, 21.0 vs 22.5 at 16,
        # 15.5 vs 15.8 at 32; w12 headline: 6.5 vs 7.2 s at 32): fewer,
        # larger commits beat the extra per-shard RPC+snapshot overhead
        # until the frontier outgrows a shard's heap.  A 100-TB frontier
        # sizes shards by state volume, not by this knob.
        num_frontier_shards=4,
        # small blocks: a heavy-page block is ~0.4s of extract; the last
        # blocks per wave are pure straggler tail, so pack tighter (swept
        # 24/32/40/48/64/96 at 16 and 32 cpus across several steal
        # windows: 40 wins at 32 cpus — 17.3-18.4s vs 21s at 32 and 45s
        # at 64; per-task dispatch is cheap since the range+slice rewrite)
        extract_batch_size=40,
        max_waves=100,
    )


def run_crawl(sf_dir: str, num_cpus: int) -> dict:
    """One timed crawl; corpus generation is cached and excluded."""
    from neocrawler_ray.pipelines.crawl import CrawlJob
    from neocrawler_ray.sources.pages_gen import corpus_for_sf

    corpus = corpus_for_sf(sf_dir, page_weight=BENCH_PAGE_WEIGHT)
    out = tempfile.mkdtemp(prefix="nc_bench_")
    # warm the worker pool (python interpreter spawn + the engine's own
    # module imports per worker process) so the measurement is
    # steady-state throughput — a production crawl's waves ≫ warmup
    import ray

    def _warm(b):
        import neocrawler_ray.stages.extract_stage  # noqa: F401
        import neocrawler_ray.stages.fetch  # noqa: F401
        import neocrawler_ray.functions.extract  # noqa: F401
        # query-path kernels too: the first dedup_minhash call was
        # paying ~3-4 s of per-worker import/JIT that is warm-up, not
        # operator cost (measured 9.2 s cold-first vs 4.1-5.0 s warm)
        import neocrawler_ray.functions.dedup as dd
        import neocrawler_ray.functions.similarity  # noqa: F401
        import neocrawler_ray.functions.text_stats  # noqa: F401
        import pandas as pd
        dd.minhash_batch(pd.DataFrame({"doc_id": [1], "text": ["warm up"]}))
        return b

    ray.data.range(num_cpus * 4).map_batches(
        _warm, batch_size=1, num_cpus=1
    ).materialize()
    try:
        t0 = time.perf_counter()
        job = CrawlJob(corpus, bench_settings(num_cpus), out)
        totals = job.run()
        dt = time.perf_counter() - t0
        return {"sec": dt, "scheduled": totals.get("scheduled", 0),
                "waves": totals.get("waves", 0),
                "urls_per_sec": totals.get("scheduled", 0) / dt}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def run_queries(sf_dir: str) -> dict[str, float]:
    """Operator-suite timings over the driver testdata tables."""
    from neocrawler_ray.pipelines import analytics as an
    from neocrawler_ray.pipelines import corpus_ops as co
    from neocrawler_ray.pipelines import doc_extract as de

    def consume(x):
        if hasattr(x, "to_pandas"):
            x.to_pandas()

    timed = {
        "doc_extract": lambda: consume(de.doc_extract(sf_dir)),
        "doc_text_stats": lambda: consume(co.doc_text_stats(sf_dir)),
        "dedup_exact": lambda: consume(co.dedup_exact(sf_dir)),
        "dedup_minhash": lambda: co.dedup_minhash_verified(sf_dir),
        "dedup_simhash": lambda: consume(co.dedup_simhash_pairs(sf_dir, 7)),
        "dedup_ngram": lambda: consume(co.dedup_ngram_pairs(sf_dir)),
        "ann_brute_topk": lambda: co.ann_brute_topk(sf_dir),
        "q1_lineitem": lambda: consume(an.q1_lineitem(sf_dir)),
        "events_daily_counts": lambda: consume(an.events_daily_counts(sf_dir)),
        "events_sessions": lambda: consume(an.events_sessions(sf_dir)),
        "events_quantiles": lambda: consume(an.events_value_quantiles(sf_dir)),
        "events_funnel": lambda: consume(an.events_funnel(sf_dir)),
        "order_priority_semijoin":
            lambda: consume(an.order_priority_semijoin(sf_dir)),
        "doc_tfidf_top": lambda: consume(co.doc_tfidf_top(sf_dir)),
        "q3_top_revenue": lambda: consume(an.q3_top_revenue(sf_dir)),
        "q5_local_supplier": lambda: consume(
            an.q5_local_supplier_volume(sf_dir)),
        "events_retention": lambda: consume(an.events_retention(sf_dir)),
        "doc_bigram_counts": lambda: consume(co.doc_bigram_counts(sf_dir)),
        "doc_decontaminate": lambda: consume(co.doc_decontaminate(sf_dir)),
        "doc_term_heavy_hitters": lambda: consume(
            co.doc_term_heavy_hitters(sf_dir)),
        # round-4 additions
        "q18_large_orders": lambda: consume(an.q18_large_orders(sf_dir)),
        "q14_promo_revenue": lambda: consume(an.q14_promo_revenue(sf_dir)),
        "doc_lm_score": lambda: consume(co.doc_lm_score(sf_dir)),
        "user_top_event": lambda: consume(an.user_top_event(sf_dir)),
        "events_sessions_salted": lambda: consume(
            an.events_sessions(sf_dir, salt_shift=38)),
        # round-4 continuation: the three heaviest of the new shapes
        # (full-lineitem tagged exchanges / per-user range frames)
        "q10_returned_customers": lambda: consume(
            an.q10_returned_customers(sf_dir)),
        "q17_small_qty": lambda: consume(
            an.q17_small_quantity_revenue(sf_dir)),
        "events_window_range": lambda: consume(
            an.events_window_range(sf_dir)),
        # composed flagship of the LLM-data layer (gate -> dedup ->
        # PII -> actor-pool model, one streaming flow)
        "corpus_prepare": lambda: consume(co.corpus_prepare(sf_dir)),
        # TPC-H completion batch: the heaviest of the eleven new shapes
        # (widest join, full-lineitem dual-count, distinct-pair exchange,
        # per-(order,supp) max chain) + the per-doc repetition map
        "q8_market_share": lambda: consume(an.q8_market_share(sf_dir)),
        "q12_shipping_priority": lambda: consume(
            an.q12_shipping_priority(sf_dir)),
        "q16_supplier_diversity": lambda: consume(
            an.q16_supplier_diversity(sf_dir)),
        "q21_sole_late_supplier": lambda: consume(
            an.q21_sole_late_supplier(sf_dir)),
        "doc_word_repetition": lambda: consume(
            co.doc_word_repetition(sf_dir)),
        # sketch-assisted / parallel-prefix / whale-rank additions
        "doc_term_hh_cms": lambda: consume(
            co.doc_term_heavy_hitters_cms(sf_dir)),
        "semijoin_bloom": lambda: consume(
            an.order_priority_semijoin_bloom(sf_dir)),
        "doc_pack_shards": lambda: consume(co.doc_pack_shards(sf_dir)),
        "events_user_rank_bucketed": lambda: consume(
            an.events_user_rank_bucketed(sf_dir)),
        # ExactSubstr-style duplicated-span gate (span-hash exchange)
        "doc_dup_spans": lambda: consume(co.doc_dup_spans(sf_dir)),
        # second round-4 continuation: graph traversal, end-to-end CC
        # dedup, prefix-filtered exact join, one-pass column profiler
        "graph_bfs_hops": lambda: consume(an.graph_bfs_hops(sf_dir)),
        "dedup_ngram_keep": lambda: consume(co.dedup_ngram_keep(sf_dir)),
        "dedup_ngram_prefix": lambda: consume(
            co.dedup_ngram_pairs_prefix(sf_dir)),
        "documents_profile": lambda: consume(co.table_profile(sf_dir)),
        # third round-4 continuation: rank fusion (3 global-rank
        # histograms), path mining (2 exchanges), Gram-matrix reduce
        "doc_rank_fusion": lambda: consume(co.doc_rank_fusion(sf_dir)),
        "events_top_paths": lambda: consume(an.events_top_paths(sf_dir)),
        "embedding_covariance": lambda: consume(
            co.embedding_covariance(sf_dir)),
        # fourth round-4 continuation: the two heaviest new exchanges
        # (range-exchange total sort; 3x-replicated interval self-join)
        "orders_global_sort": lambda: consume(
            an.orders_global_sort(sf_dir)),
        "events_pair_window": lambda: consume(
            an.events_pair_window(sf_dir)),
    }
    # best-of-R per query (default 2): like the headline crawl, a single
    # sample records host steal + first-call worker warm-up, not the
    # operator (dedup_minhash measured 6.8 s cold-first vs 4.3-4.7 s on
    # the immediately following run of the same code)
    reps = int(os.environ.get("GRAFT_QUERY_REPEATS", "2"))
    out = {}
    for name, fn in timed.items():
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def worker_main(sf_dir: str, num_cpus: int, crawl_only: bool) -> None:
    import ray

    if os.environ.get("GRAFT_PIN_CPUS") == "1":
        # emulate a real N-core cluster: cap the whole session (driver +
        # raylet + all inheriting workers) to N physical cores so the
        # small leg can't borrow compute through unmanaged threads
        os.sched_setaffinity(0, set(range(num_cpus)))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    # best-of-R headline: this VM has heavy time-varying host CPU-steal
    # (same-code crawl walls spread up to 3.9× across windows — BENCH_r03
    # recorded 58.7 s for code that measures 19.8 s in a quiet window), so
    # a single run records the weather, not the engine.  All runs are
    # printed; the headline is the quietest one.
    repeats = int(os.environ.get("GRAFT_CRAWL_REPEATS", "3"))
    runs = [run_crawl(sf_dir, num_cpus) for _ in range(repeats)]
    crawl = min(runs, key=lambda r: r["sec"])
    queries = {} if crawl_only else run_queries(sf_dir)
    result = {
        "metric": "crawl frontier-to-extracted wall sec (synthetic pages corpus)",
        "value": round(crawl["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "urls_per_sec": round(crawl["urls_per_sec"], 1),
        "scheduled_urls": crawl["scheduled"],
        "waves": crawl["waves"],
        "crawl_runs_sec": [round(r["sec"], 3) for r in runs],
    }
    print(json.dumps(result))
    ray.shutdown()


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _burn_pool(nproc: int, per: int) -> float:
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.Pool(nproc) as p:
        p.map(_burn, [per] * nproc * 4)
    return time.perf_counter() - t0


def cpu_ceiling(n_lo: int, n_hi: int, per: int = 4_000_000) -> float:
    """The machine's own parallel-compute scaling ceiling, measured with
    a pure busy-loop process pool (no Ray, no IO), each pool pinned to
    its leg's core set like the crawl legs.  On this shared VM host
    CPU-steal caps even embarrassingly-parallel python at <1.0."""
    saved = os.sched_getaffinity(0)
    times = {}
    try:
        for n in (n_lo, n_hi):
            os.sched_setaffinity(0, set(range(n)))
            times[n] = _burn_pool(n, per)
    finally:
        os.sched_setaffinity(0, saved)
    thr_lo = n_lo * 4 / times[n_lo]
    thr_hi = n_hi * 4 / times[n_hi]
    return (thr_hi / thr_lo) / (n_hi / n_lo)


def scaling_main(sf_dir: str, n_lo: int = 4, n_hi: int = 16,
                 repeats: int = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))) -> None:
    """Same corpus, fresh pinned Ray sessions at N and 4N cpus →
    efficiency, from interleaved matched-window pairs (see module doc)."""
    from neocrawler_ray.sources.pages_gen import corpus_for_sf

    # warm the corpus cache outside the timed runs
    corpus_for_sf(sf_dir, page_weight=BENCH_PAGE_WEIGHT)
    # one crawl per leg: steal-robustness comes from the interleaved
    # matched-pair protocol (quietest window_cost pair), not from
    # best-of-R inside a leg — R>1 would triple the ladder's wall time
    env = dict(os.environ, GRAFT_PIN_CPUS="1", GRAFT_CRAWL_REPEATS="1")

    def leg(n: int) -> dict:
        proc = subprocess.run(
            [sys.executable, __file__, "--worker", str(n), "--crawl-only",
             "--sf-dir", sf_dir],
            capture_output=True, text=True, check=True, env=env,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    ceiling_pre = cpu_ceiling(n_lo, n_hi)
    pairs = []
    for _ in range(repeats):  # interleave legs: each pair is one window
        lo, hi = leg(n_lo), leg(n_hi)
        pairs.append({
            f"sec_{n_lo}": lo["value"], f"sec_{n_hi}": hi["value"],
            f"urls_per_sec_{n_lo}": lo["urls_per_sec"],
            f"urls_per_sec_{n_hi}": hi["urls_per_sec"],
            "eff": round((hi["urls_per_sec"] / lo["urls_per_sec"])
                         / (n_hi / n_lo), 3),
            # quietness: total compute-seconds, small leg discounted by
            # the ladder ratio so both legs weigh equally when ideal
            "window_cost": round(hi["value"] + lo["value"] / (n_hi / n_lo), 3),
        })
    # host steal varies minute-to-minute: bracket the ladder with a
    # second calibration and use the mean window ceiling
    ceiling = (ceiling_pre + cpu_ceiling(n_lo, n_hi)) / 2
    best = min(pairs, key=lambda p: p["window_cost"])
    print(json.dumps({
        "metric": (f"crawl scaling efficiency {n_lo}→{n_hi} cpus "
                   "(fresh pinned sessions, quietest matched pair)"),
        "value": best["eff"],
        "unit": "efficiency",
        "sf": sf_dir,
        f"urls_per_sec_{n_lo}": best[f"urls_per_sec_{n_lo}"],
        f"urls_per_sec_{n_hi}": best[f"urls_per_sec_{n_hi}"],
        f"sec_{n_lo}": best[f"sec_{n_lo}"],
        f"sec_{n_hi}": best[f"sec_{n_hi}"],
        "pairs": pairs,
        "cpu_ceiling_eff": round(ceiling, 3),
        "value_normalized": round(best["eff"] / ceiling, 3),
    }))


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = DEFAULT_SF_DIR
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    if "--scaling" in args:
        scaling_main(sf_dir)
    elif "--worker" in args:
        n = int(args[args.index("--worker") + 1])
        worker_main(sf_dir, n, "--crawl-only" in args)
    else:
        worker_main(sf_dir, DEFAULT_CPUS, False)
