"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library code) calls ``ray.init()`` / ``ray.shutdown()``.

``entry()`` runs the flagship crawl pipeline (frontier → fetch-sim →
extract) on the sf0.001-scale synthetic pages corpus.  ``queries()``
exposes every implemented operator family (SURVEY.md §2 + the
training-data layer); SQL-expressible ones have a matching entry in
``oracle_sql()`` with identical column names.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable
from typing import Any

# bump when crawl output semantics/schema change so a stale /tmp cache
# from an older code version is never served to the driver's gate
_RUN_SCHEMA_VERSION = 9  # v9: corpus v6 — jshandle lists behind a
#     session cookie (every 5th≡2 list demands a premium cookie the rule
#     lacks → login stub, no browser rounds); cookie gate precedes
#     browser rendering in engine AND oracle
#     (v8: S6 per-navigation-round result rows)
_RUN_CACHE_ROOT = f"/tmp/neocrawler_ray_runs/v{_RUN_SCHEMA_VERSION}"


def _crawl_out_dir(sf_dir: str) -> str:
    """Run the crawl once per sf_dir (cached across queries): the three
    crawl queries below are views over one run's Parquet artifacts."""
    from neocrawler_ray.config import CrawlSettings
    from neocrawler_ray.pipelines.crawl import CrawlJob
    from neocrawler_ray.sources.pages_gen import corpus_for_sf

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(_RUN_CACHE_ROOT, tag)
    marker = os.path.join(out, "metrics.json")
    if not os.path.exists(marker):
        corpus = corpus_for_sf(sf_dir)
        # throughput config (deterministic; the reference-default quota of
        # 200 urls/wave is exercised by the pytest parity suite instead —
        # here it would only multiply wave overhead ~26×)
        settings = CrawlSettings(
            schedule_quantity_limitation=20000,
            politeness_per_host_per_wave=2000,
            num_frontier_shards=8,
        )
        job = CrawlJob(corpus, settings, out)
        job.run()
    return out


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: wave-looped crawl
    (frontier actor pool → fetch-sim → rule-engine extract), returning
    the extracted-pages Dataset."""
    import ray

    out = _crawl_out_dir("/root/testdata/sf0.001")
    return ray.data.read_parquet(
        os.path.join(out, "extracted"),
        columns=["url", "urllib", "domain", "status", "valid", "final_state",
                 "text", "drill_relation", "n_links"],
    )


# --- crawl-family queries (deterministic; pages corpus is synthetic so
#     these get the driver's rows-only check; full parity is pytest's job)


def _q_crawl_extract(sf_dir: str):
    import ray

    out = _crawl_out_dir(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(out, "extracted"),
        columns=["url", "nav_round", "status", "valid", "final_state",
                 "text", "drill_relation", "n_links"],
    )
    return ds.sort(["url", "nav_round"])


def _q_crawl_schedule(sf_dir: str):
    import pandas as pd
    import pyarrow.parquet as pq

    out = _crawl_out_dir(sf_dir)
    files = sorted(
        glob.glob(os.path.join(out, "schedule", "wave_*.parquet")),
        key=lambda p: int(p.split("_")[-1].split(".")[0]),
    )
    frames = [pq.read_table(f).to_pandas() for f in files]
    return pd.concat(frames, ignore_index=True)[
        ["wave", "seq", "url", "urllib", "drill_relation"]
    ]


def _q_crawl_url_seen(sf_dir: str):
    import pyarrow.parquet as pq

    out = _crawl_out_dir(sf_dir)
    # url_seen/ is a per-shard parquet dataset (shards write their own
    # partitions; the driver never holds the full set) — read + sort here
    tbl = pq.read_table(os.path.join(out, "url_seen"))
    return tbl.sort_by("url_md5")


def _q_crawl_report(sf_dir: str):
    """A1-style counters over the crawl output: events per domain ×
    final_state (reference instance/example/spider_extend.js:97-169)."""
    import pandas as pd
    import ray

    out = _crawl_out_dir(sf_dir)
    ds = ray.data.read_parquet(
        os.path.join(out, "extracted"), columns=["domain", "final_state"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["domain", "final_state"], as_index=False).size()
        return g.rename(columns={"size": "p_n"}).astype({"p_n": "int64"})

    from neocrawler_ray.pipelines.analytics import _finish_small

    out = _finish_small(ds.map_batches(partial, batch_format="pandas"),
                        ["domain", "final_state"], {"p_n": "n"})
    return out.sort_values(["domain", "final_state"]).reset_index(drop=True)


def _q_crawl_failures(sf_dir: str):
    """Fail/stuck report read from the run's per-shard checkpoints
    (reference zsets fail:urllib:* / stuck:urllib:*, README.md:764-781)."""
    from neocrawler_ray.pipelines.replay import failure_report

    out = _crawl_out_dir(sf_dir)
    return failure_report(os.path.join(out, "ckpt"))


def _q_doc_stats_resumable(sf_dir: str):
    """text_stats via the resumable partitioned-export path: chunked
    part files under /tmp (a rerun skips finished chunks), read back as
    a Dataset — same rows as doc_text_stats, so it shares its oracle."""
    from neocrawler_ray.pipelines import export as ex

    tag = os.path.basename(os.path.normpath(sf_dir))
    # versioned by ex.EXPORT_VERSION so a kernel/naming change never
    # serves stale part files from a previous code state
    out = f"/tmp/neocrawler_ray_export/v{ex.EXPORT_VERSION}/{tag}/text_stats"
    ex.resumable_export(sf_dir, out, "text_stats")
    return ex.read_export(out)


def _q_corpus_from_crawl(sf_dir: str):
    from neocrawler_ray.pipelines.export import corpus_from_crawl

    out = _crawl_out_dir(sf_dir)
    return corpus_from_crawl(
        os.path.join(out, "extracted"),
        workdir=os.path.join(out, "bridge_corpus"))


def queries() -> dict[str, Callable[[str], Any]]:
    from neocrawler_ray.pipelines import analytics as an
    from neocrawler_ray.pipelines import corpus_ops as co
    from neocrawler_ray.pipelines import doc_extract as de
    from neocrawler_ray.stages import multimodal as mm

    # NOTE (driver contract): the correctness gate checks at most the
    # FIRST 50 entries of this dict, and the repo now carries 134
    # oracle_sql()-backed queries — more than two rounds' gates can hold.
    # Order is therefore a ROTATION policy, derived from the committed
    # CORRECTNESS_r01/r02/r03 artifacts (the only driver rows that
    # exist): the oracle-backed entries with NO green row in any of
    # them come first (operators new this round + those that earlier
    # caps truncated); never-checked entries past the 50-row window
    # are first in line for round 5's window.  Directly after the
    # cap sit the entries last checked in round 2 (q6_revenue,
    # revenue_by_nation, top_customers), then the round-3-green
    # re-checks.  The oracle-backed entries placed past the cap were ALL
    # green in a previous round's CORRECTNESS artifact AND stay green
    # in tools/check_correctness.py at sf0.01 (the committed
    # CORRECTNESS_LOCAL_r04.json records the full gate); cumulatively
    # every oracle-backed operator has a driver hard-signal row in some
    # round.  The tail keeps the rows-only crawl family (their real
    # parity is the pytest e2e suite vs the sequential oracle) and the
    # structurally-no-oracle sketch/LSH ops (planted-dup / recall /
    # tolerance pytest coverage).
    return {
        # ---- never driver-checked: new this round ----
        # sample-split range-exchange total sort with exact global
        # ROW_NUMBER (the ds.sort scale path)
        "orders_global_sort": an.orders_global_sort,
        # time-bounded stream-stream pair self-join (bucket replication)
        "events_pair_window": an.events_pair_window,
        # Z-order (Morton) multi-column layout keys
        "orders_zorder": an.orders_zorder,
        # Tukey-fence outlier detection (two-pass dependent statistic)
        "events_value_outliers": an.events_value_outliers,
        # 2x2 chi-square A/B significance test (exact scaled integers)
        "events_ab_chisq": an.events_ab_chisq,
        # incremental view maintenance: checkpointed base + pushed-down
        # delta scan, merged answer-sized (same oracle as the full op)
        "events_daily_counts_incremental":
            an.events_daily_counts_incremental,
        # per-user time-weighted mean (step-function integral, big-int
        # numerators)
        "events_time_weighted_avg": an.events_time_weighted_avg,
        # holistic aggregate over high-cardinality groups (exact median)
        "events_user_median": an.events_user_median,
        # windowed exact COUNT(DISTINCT) via triple-hash dedupe exchange
        "events_window_distinct": an.events_window_distinct,
        # TPC-H suite completion (shapes adapted to the testdata's
        # column subset — see each docstring): correlated-min join-back,
        # nation-pair OR join, conditional ratio, two-key profit rollup,
        # group-vs-global HAVING, lateness dual-count, argmax-of-
        # aggregate, grouped distinct-count, share-threshold semi-join,
        # unique-max-achiever exists chain, correlated-avg + NOT EXISTS
        "q2_min_price_supplier": an.q2_min_price_supplier,
        "q7_volume_shipping": an.q7_volume_shipping,
        "q8_market_share": an.q8_market_share,
        "q9_product_profit": an.q9_product_profit,
        "q11_important_parts": an.q11_important_parts,
        "q12_shipping_priority": an.q12_shipping_priority,
        "q15_top_supplier": an.q15_top_supplier,
        "q16_supplier_diversity": an.q16_supplier_diversity,
        "q20_dominant_suppliers": an.q20_dominant_suppliers,
        "q21_sole_late_supplier": an.q21_sole_late_supplier,
        "q22_idle_rich_customers": an.q22_idle_rich_customers,
        # per-doc lexical repetition quality signals (pure map stage)
        "doc_word_repetition": co.doc_word_repetition,
        # TPC-H Q13's second aggregate level (histogram OF an outer-join
        # aggregate) and the RANK/DENSE_RANK window pair
        "order_count_distribution": an.order_count_distribution,
        "events_user_rank": an.events_user_rank,
        # event-time streaming windows: aligned tumbling grid + 2-hop
        # overlapping (sliding) windows via map-stage replication
        "events_tumbling_counts": an.events_tumbling_counts,
        "events_hopping_counts": an.events_hopping_counts,
        # token-budget shard packing (distributed parallel prefix sum)
        "doc_pack_shards": co.doc_pack_shards,
        # ExactSubstr-style duplicated-span gate (Lee et al. 2022)
        "doc_dup_spans": co.doc_dup_spans,
        # C4-style line-level dedup (keep global-first occurrence,
        # order-sensitive reassembly signature; Raffel et al. 2020)
        "corpus_line_dedup": co.corpus_line_dedup,
        # whale-group exact ranking (value-range buckets + offset
        # ladder) — byte-identical to events_user_rank, same oracle
        "events_user_rank_bucketed": an.events_user_rank_bucketed,
        # CUBE grain set (rollup + the (ALL, prio) slice), distribution
        # windows (PERCENT_RANK/CUME_DIST), and the INTERSECT/EXCEPT
        # set-operator pair over one user-hash flags exchange
        "revenue_cube": an.revenue_cube,
        "events_percent_rank": an.events_percent_rank,
        "events_user_days_intersect": an.events_user_days_intersect,
        "events_user_days_except": an.events_user_days_except,
        # fixed-point PageRank (exact int64 masses; CTE-chain oracle)
        "graph_pagerank": an.graph_pagerank,
        # degree-oriented exact triangle count (wedge-edge join)
        "graph_triangles": an.graph_triangles,
        # Pass-Join edit-distance similarity join (banded-DP verify)
        "dedup_edit_pairs": co.dedup_edit_pairs,
        # SemDeDup within-cluster semantic near-dup pruning
        "dedup_semantic": co.dedup_semantic,
        # global ORDER BY row_number (range buckets + offset ladder)
        "doc_global_rank": co.doc_global_rank,
        # interval-overlap counting over sessions (rank identity — no
        # pair emission; value-bucket exchange + answer-sized ladder)
        "events_session_overlap": an.events_session_overlap,
        # streaming watermark / late-data classifier (global exclusive
        # prefix-max over a deterministic md5-jittered arrival order)
        "events_late_arrivals": an.events_late_arrivals,
        # multi-source BFS hop distance (frontier-expansion rounds;
        # recursive-CTE oracle) — the traversal member of the graph family
        "graph_bfs_hops": an.graph_bfs_hops,
        # end-to-end exact n-gram dedup: pairs → distributed CC → keep
        # min-id rep; first oracle drive of connected_components_ds
        "dedup_ngram_keep": co.dedup_ngram_keep,
        # grouped OLS trend from 5 exact sufficient statistics (one
        # combiner pass, answer-sized big-int reduce; HUGEINT oracle)
        "events_value_trend": an.events_value_trend,
        # 2-D skyline / Pareto frontier (dominance filter with a
        # perfect local-skyline combiner; quadratic NOT EXISTS oracle)
        "orders_skyline": an.orders_skyline,
        # per-column data-quality profile: n_rows/n_null/exact distinct
        # in ONE pass (hash-partitioned unique counting)
        "documents_profile": co.table_profile,
        # PPJoin prefix-filtered exact similarity join at t=0.8 —
        # ~20% of postings indexed, same answer as the full join
        "dedup_ngram_pairs_prefix": co.dedup_ngram_pairs_prefix,
        # CUSUM change-point scan (cross-multiplied exact ints, all
        # argmax ties flagged; HUGEINT window oracle)
        "events_daily_cusum": an.events_daily_cusum,
        # declared-vs-detected language confusion matrix (corpus QA)
        "doc_lang_confusion": co.doc_lang_confusion,
        # PMI collocation mining (log-free exact rational ranking)
        "doc_bigram_pmi": co.doc_bigram_pmi,
        # winsorized robust mean from the quantile histogram (no
        # second pass); k-anonymity privacy audit
        "events_value_winsorized": an.events_value_winsorized,
        "customer_k_anonymity": an.customer_k_anonymity,
        # Apriori 2-itemset association rules with exact integer lift
        "orders_basket_rules": an.orders_basket_rules,
        # last-touch attribution (per-user ordered forward-fill scan)
        "events_attribution": an.events_attribution,
        # Flesch-style integer readability score (pure map)
        "doc_readability": co.doc_readability,
        # exact integer covariance matrix (one Gram matmul per batch,
        # block-count-sized exchange; the PCA/whitening reduce)
        "embedding_covariance": co.embedding_covariance,
        # Borda rank fusion of three quality signals (RANK() semantics
        # via broadcast histograms — no global sort)
        "doc_rank_fusion": co.doc_rank_fusion,
        # frequent 3-step path mining (sequential patterns)
        "events_top_paths": an.events_top_paths,
        # ordered STRING_AGG class (distinct partials, concat last)
        "corpus_source_langs": co.corpus_source_langs,
        # image perceptual-hash near-dup pairs (banded Hamming over
        # the binary payload column; pHash itself is the documented
        # deterministic stub — real DCT swaps into the decode seam)
        "image_phash_dupes": mm.image_phash_dupes,
        # Gini-impurity behavioral diversity (log-free entropy class)
        "events_user_gini": an.events_user_gini,
        # UNPIVOT/melt (reshape inverse of events_pivot_daily) and
        # dense-calendar resample with exact linear interpolation
        "events_unpivot_daily": an.events_unpivot_daily,
        "events_daily_gapfill": an.events_daily_gapfill,
        # PERCENTILE_CONT (×100-scaled exact interpolation) and the
        # grouped moment summary with exact variance numerator
        "events_value_quantiles_cont": an.events_value_quantiles_cont,
        "events_value_moments": an.events_value_moments,
        # degree assortativity (Newman) as exact sign·r² integers
        "graph_assortativity": an.graph_assortativity,
        # MERGE/upsert (CDC apply by key; one tagged doc_id exchange)
        "documents_upsert": co.documents_upsert,
        # ---- never driver-checked: pre-existing (q3 flagged by the
        # round-3 verdict; the rest sat past earlier caps) ----
        "q3_top_revenue": an.q3_top_revenue,
        "q5_local_supplier_volume": an.q5_local_supplier_volume,
        "q10_returned_customers": an.q10_returned_customers,
        "q14_promo_revenue": an.q14_promo_revenue,
        "q17_small_quantity_revenue": an.q17_small_quantity_revenue,
        "q18_large_orders": an.q18_large_orders,
        "q19_disjunctive_revenue": an.q19_disjunctive_revenue,
        "customer_order_counts": an.customer_order_counts,
        "nation_balance_outer": an.nation_balance_outer,
        "revenue_rollup": an.revenue_rollup,
        "events_retention": an.events_retention,
        "events_window_range": an.events_window_range,
        "events_transition_matrix": an.events_transition_matrix,
        "events_user_ntile": an.events_user_ntile,
        "events_cumulative_sum": an.events_cumulative_sum,
        "user_top_event": an.user_top_event,
        "doc_lm_score": co.doc_lm_score,
        # actor-pool model-inference stage (weights load once per actor)
        # + PII redaction map + the composed gate→dedup→PII→model chain
        "doc_quality_model": co.doc_quality_model,
        "doc_pii_scrub": co.doc_pii_scrub,
        "corpus_prepare": co.corpus_prepare,
        "doc_bigram_counts": co.doc_bigram_counts,
        "doc_term_heavy_hitters": co.doc_term_heavy_hitters,
        "doc_decontaminate": co.doc_decontaminate,
        # ================= driver cap (50) ends here =================
        # ---- never driver-checked; first candidates for round 5's
        # window.  events_outliers reuses the exact-quantile histogram
        # machinery (driver-validated via events_value_quantiles) and
        # is locally oracle-green at sf0.001+sf0.01; the others reuse
        # an oracle a sibling in the window (or a round-3 row)
        # validates, with byte-equality to the sibling pytest-covered --
        "events_outliers": an.events_outliers,
        "embedding_kmeans": co.embedding_kmeans,
        "doc_sample_weighted": co.doc_sample_weighted,
        "order_priority_semijoin_bloom": an.order_priority_semijoin_bloom,
        "events_time_since_last_salted":
            lambda sf: an.events_time_since_last(sf, salt_shift=33),
        "events_rolling_sum_salted":
            lambda sf: an.events_rolling_sum(sf, salt_shift=33),
        # shift 38 ≈ 76 h buckets — sized so a bucket holds many events
        # (the salt exists for whale entities; a too-fine bucket makes
        # everything boundary — see the sizing rule in the docstring)
        "events_sessions_salted":
            lambda sf: an.events_sessions(sf, salt_shift=38),
        # ---- least recently checked (green in round 2, cut by the
        # round-3 cap; green in the committed local sf0.01 gate) ----
        "q6_revenue": an.q6_revenue,
        "revenue_by_nation": an.revenue_by_nation,
        "top_customers": an.top_customers,
        "doc_extract": de.doc_extract,
        "doc_text_stats": co.doc_text_stats,
        "dedup_exact": co.dedup_exact,
        "dedup_ngram_pairs": co.dedup_ngram_pairs,
        "corpus_mix": co.corpus_mix,
        "events_sessions": an.events_sessions,
        "events_value_quantiles": an.events_value_quantiles,
        "multimodal_meta": mm.multimodal_decode_meta,
        "q1_lineitem": an.q1_lineitem,
        # ---- oracle-backed, green in round-3's driver artifact (and
        # in the committed local sf0.01 gate this round) ----
        "doc_lang_id": co.doc_lang_id,
        "doc_fingerprint": co.doc_fingerprint,
        "corpus_clean": co.corpus_clean,
        "doc_stats_resumable": _q_doc_stats_resumable,
        "doc_chunks": co.doc_chunks,
        "doc_term_df": co.doc_term_df,
        "doc_tfidf_top": co.doc_tfidf_top,
        "doc_split": co.doc_split,
        "doc_sample_stratified": co.doc_sample_stratified,
        "corpus_source_report": co.corpus_source_report,
        "embedding_pairs_brute": lambda sf: co.embedding_pairs_brute(sf, 0.4),
        "ann_brute_topk": lambda sf: co.ann_brute_topk(sf, 5, 10),
        "video_frame_sample": mm.video_frame_sample,
        "audio_segments": mm.audio_segments,
        "image_resize_meta": mm.image_resize_meta,
        "events_daily_counts": an.events_daily_counts,
        "events_pivot_daily": an.events_pivot_daily,
        "events_value_by_type": an.events_value_by_type,
        "events_props_stats": an.events_props_stats,
        "events_asof_join": an.events_asof_join,
        "events_value_bands": an.events_value_bands,
        "top_orders_per_priority": an.top_orders_per_priority,
        "order_priority_semijoin": an.order_priority_semijoin,
        "order_priority_antijoin": an.order_priority_antijoin,
        "events_time_since_last": an.events_time_since_last,
        "events_funnel": an.events_funnel,
        "events_rolling_sum": an.events_rolling_sum,
        "events_distinct_users": an.events_distinct_users,
        # ---- rows-only: crawl engine (SURVEY.md §2.1-2.4, §3) — the
        # synthetic pages corpus is not a registered view, so the driver
        # does a rows-only check; full parity vs the sequential oracle
        # lives in tests/test_crawl_e2e.py ----
        "crawl_extract": _q_crawl_extract,
        "crawl_schedule_order": _q_crawl_schedule,
        "crawl_url_seen": _q_crawl_url_seen,
        "crawl_report": _q_crawl_report,
        "crawl_failure_report": _q_crawl_failures,
        # frontier → training shards in one flow: the crawl's extracted
        # pages through clean → dedup → lang ID → token packing
        # (pipelines/export.py::corpus_from_crawl; crawl-dependent, so
        # rows-only like its input family — composition pytest covers it)
        "corpus_from_crawl": _q_corpus_from_crawl,
        # ---- structurally no-oracle: sketch/LSH families (planted-dup
        # + recall/precision pytest, tests/test_lsh_bench_scale.py) ----
        "dedup_minhash_pairs": lambda sf: co.dedup_minhash_verified(sf),
        "dedup_simhash_pairs": lambda sf: co.dedup_simhash_pairs(sf, 7),
        # threshold matched to the testdata's cosine distribution (near-
        # random vectors, max ~0.51) so the row is non-empty evidence;
        # band/bit knobs tuned for ~0.99 recall at 0.4 (p=0.63/plane)
        "dedup_embedding_lsh": lambda sf: co.dedup_embedding_pairs(
            sf, 0.4, bands=16, bits=3),
        "ann_ivf_topk": lambda sf: co.ann_ivf_topk(sf, 5, 10),
        # pytest-equivalence-covered (union-find ≡ distributed CC;
        # t-digest/HLL tolerance vs their exact siblings)
        "dedup_clusters": lambda sf: co.dedup_clusters(sf),
        "dedup_clusters_dist": lambda sf: co.dedup_clusters_distributed(sf),
        "events_value_quantiles_td": an.events_value_quantiles_tdigest,
        "events_distinct_users_hll": an.events_distinct_users_hll,
        # count-min one-pass heavy hitters (superset-of-exact pytest vs
        # doc_term_heavy_hitters; never-undercount property test)
        "doc_term_hh_cms": lambda sf: co.doc_term_heavy_hitters_cms(sf),
    }


def oracle_sql() -> dict[str, str]:
    from neocrawler_ray.functions import text_stats as ts
    from neocrawler_ray.pipelines import analytics as an
    from neocrawler_ray.pipelines import corpus_ops as co
    from neocrawler_ray.pipelines import doc_extract as de
    from neocrawler_ray.stages import multimodal as mm
    from neocrawler_ray.stages import quality_model as qm

    return {
        "orders_global_sort": an.ORDERS_GLOBAL_SORT_SQL,
        "events_pair_window": an.EVENTS_PAIR_WINDOW_SQL,
        "orders_zorder": an.orders_zorder_sql(),
        "events_value_outliers": an.EVENTS_VALUE_OUTLIERS_SQL,
        "events_ab_chisq": an.EVENTS_AB_CHISQ_SQL,
        "events_daily_counts_incremental": an.EVENTS_DAILY_COUNTS_SQL,

        "events_time_weighted_avg": an.EVENTS_TWA_SQL,
        "events_user_median": an.EVENTS_USER_MEDIAN_SQL,
        "events_window_distinct": an.events_window_distinct_sql(),
        "doc_extract": de.DOC_EXTRACT_SQL,
        "doc_text_stats": ts.text_stats_sql(),
        "doc_lang_id": ts.lang_id_markers_sql(),
        "doc_fingerprint": (
            "SELECT doc_id, "
            + ts.SIMPLEFP_SQL.format(col="text")
            + " AS fp FROM documents"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_md5, min(doc_id) AS doc_id "
            "FROM documents GROUP BY md5(text)"
        ),
        "dedup_ngram_pairs": co.dedup_ngram_pairs_sql(),
        "doc_dup_spans": co.doc_dup_spans_sql(),
        "corpus_line_dedup": co.corpus_line_dedup_sql(),
        "doc_decontaminate": co.doc_decontaminate_sql(),
        "doc_chunks": co.doc_chunks_sql(),
        "doc_term_df": co.doc_term_df_sql(),
        "doc_bigram_counts": co.doc_bigram_counts_sql(),
        "doc_term_heavy_hitters": co.doc_term_heavy_hitters_sql(),
        "doc_tfidf_top": co.doc_tfidf_top_sql(),
        "doc_stats_resumable": ts.text_stats_sql(),
        "doc_split": co.doc_split_sql(),
        "doc_sample_stratified": co.doc_sample_stratified_sql(),
        "corpus_mix": co.corpus_mix_sql(),
        "corpus_source_report": co.corpus_source_report_sql(),
        "corpus_clean": (
            "WITH stats AS (" + ts.text_stats_sql() + "), "
            "survivors AS (SELECT d.doc_id, md5(d.text) AS fp, s.n_tokens "
            " FROM documents d JOIN stats s USING (doc_id) "
            " WHERE s.quality_ok), "
            "keep AS (SELECT min(doc_id) AS doc_id FROM survivors "
            " GROUP BY fp) "
            "SELECT k.doc_id, s.n_tokens FROM keep k "
            "JOIN survivors s USING (doc_id)"
        ),
        "embedding_pairs_brute": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b "
            "FROM embeddings a, embeddings b "
            "WHERE a.vec_id < b.vec_id AND list_cosine_similarity("
            "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) "
            ">= 0.4"
        ),
        "ann_brute_topk": """
WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv
           FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.qid, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) sim2
      FROM embeddings e, q WHERE e.vec_id != q.qid)
SELECT qid, vec_id, CAST(r AS BIGINT) AS rank FROM
  (SELECT qid, vec_id,
          row_number() OVER (PARTITION BY qid ORDER BY sim2 DESC, vec_id) r
   FROM s) WHERE r <= 10
""".strip(),
        "multimodal_meta": mm.MULTIMODAL_META_SQL,
        "video_frame_sample": mm.FRAME_SAMPLE_SQL,
        "audio_segments": mm.AUDIO_SEGMENTS_SQL,
        "image_resize_meta": mm.IMAGE_RESIZE_SQL,
        "events_daily_counts": an.EVENTS_DAILY_COUNTS_SQL,
        "events_props_stats": an.EVENTS_PROPS_SQL,
        "events_sessions": an.EVENTS_SESSIONS_SQL,
        "events_sessions_salted": an.EVENTS_SESSIONS_SQL,
        "events_asof_join": an.EVENTS_ASOF_SQL,
        "events_value_bands": an.events_value_bands_sql(),
        "events_value_quantiles": an.EVENTS_QUANTILES_SQL,
        "top_orders_per_priority": an.top_orders_per_priority_sql(),
        "order_priority_semijoin": an.ORDER_PRIORITY_SEMIJOIN_SQL,
        "order_priority_antijoin": an.ORDER_PRIORITY_ANTIJOIN_SQL,
        "events_time_since_last": an.EVENTS_TIME_SINCE_LAST_SQL,
        "events_time_since_last_salted": an.EVENTS_TIME_SINCE_LAST_SQL,
        "events_rolling_sum_salted": an.events_rolling_sum_sql(),
        "events_distinct_users": an.EVENTS_DISTINCT_USERS_SQL,
        "events_funnel": an.EVENTS_FUNNEL_SQL,
        "events_rolling_sum": an.events_rolling_sum_sql(),
        "events_pivot_daily": an.EVENTS_PIVOT_SQL,
        "events_value_by_type": (
            "SELECT event_type, "
            "CAST(sum(CAST(floor(value*10000) AS BIGINT)) AS BIGINT) "
            "AS value_e4, count(*) AS n FROM events GROUP BY 1"
        ),
        "q1_lineitem": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(sum(CAST(floor(l_extendedprice*10000) AS BIGINT)) AS BIGINT)"
            " AS sum_price_e4, count(*) AS count_order "
            "FROM lineitem GROUP BY 1, 2"
        ),
        "q6_revenue": an.Q6_SQL,
        "q3_top_revenue": an.q3_top_revenue_sql(),
        "q5_local_supplier_volume": an.Q5_SQL,
        "events_retention": an.EVENTS_RETENTION_SQL,
        "q18_large_orders": an.q18_large_orders_sql(),
        "q14_promo_revenue": an.Q14_SQL,
        "doc_lm_score": co.doc_lm_score_sql(),
        "user_top_event": an.USER_TOP_EVENT_SQL,
        "doc_quality_model": qm.quality_model_sql(),
        "doc_pii_scrub": co.doc_pii_scrub_sql(),
        "q10_returned_customers": an.q10_returned_customers_sql(),
        "customer_order_counts": an.CUSTOMER_ORDER_COUNTS_SQL,
        "events_window_range": an.events_window_range_sql(),
        "events_transition_matrix": an.EVENTS_TRANSITION_SQL,
        "q19_disjunctive_revenue": an.q19_disjunctive_revenue_sql(),
        "q17_small_quantity_revenue": an.Q17_SQL,
        "revenue_rollup": an.REVENUE_ROLLUP_SQL,
        "events_user_ntile": an.events_user_ntile_sql(),
        "corpus_prepare": co.corpus_prepare_sql(),
        "nation_balance_outer": an.NATION_BALANCE_OUTER_SQL,
        "events_cumulative_sum": an.EVENTS_CUMULATIVE_SQL,
        "q2_min_price_supplier": an.Q2_SQL,
        "q7_volume_shipping": an.Q7_SQL,
        "q8_market_share": an.Q8_SQL,
        "q9_product_profit": an.Q9_SQL,
        "q11_important_parts": an.Q11_SQL,
        "q12_shipping_priority": an.Q12_SQL,
        "q15_top_supplier": an.Q15_SQL,
        "q16_supplier_diversity": an.Q16_SQL,
        "q20_dominant_suppliers": an.Q20_SQL,
        "q21_sole_late_supplier": an.q21_sole_late_supplier_sql(),
        "q22_idle_rich_customers": an.Q22_SQL,
        "doc_word_repetition": co.doc_word_repetition_sql(),
        "order_count_distribution": an.ORDER_COUNT_DISTRIBUTION_SQL,
        "events_user_rank": an.EVENTS_USER_RANK_SQL,
        "events_tumbling_counts": an.events_tumbling_counts_sql(),
        "events_hopping_counts": an.events_hopping_counts_sql(),
        "doc_pack_shards": co.doc_pack_shards_sql(),
        "order_priority_semijoin_bloom": an.ORDER_PRIORITY_SEMIJOIN_SQL,
        "events_user_rank_bucketed": an.EVENTS_USER_RANK_SQL,
        "revenue_cube": an.REVENUE_CUBE_SQL,
        "events_percent_rank": an.EVENTS_PERCENT_RANK_SQL,
        "events_user_days_intersect": an.EVENTS_USER_DAYS_INTERSECT_SQL,
        "events_user_days_except": an.EVENTS_USER_DAYS_EXCEPT_SQL,
        "graph_pagerank": an.GRAPH_PAGERANK_SQL,
        "graph_triangles": an.GRAPH_TRIANGLES_SQL,
        "dedup_edit_pairs": co.DEDUP_EDIT_PAIRS_SQL,
        "dedup_semantic": co.DEDUP_SEMANTIC_SQL,
        "doc_global_rank": co.DOC_GLOBAL_RANK_SQL,
        "events_session_overlap": an.EVENTS_SESSION_OVERLAP_SQL,
        "events_late_arrivals": an.EVENTS_LATE_ARRIVALS_SQL,
        "graph_bfs_hops": an.GRAPH_BFS_HOPS_SQL,
        "dedup_ngram_keep": co.DEDUP_NGRAM_KEEP_SQL,
        "events_value_trend": an.EVENTS_VALUE_TREND_SQL,
        "orders_skyline": an.ORDERS_SKYLINE_SQL,
        "documents_profile": co.DOCUMENTS_PROFILE_SQL,
        "dedup_ngram_pairs_prefix": co.DEDUP_NGRAM_PAIRS_PREFIX_SQL,
        "events_daily_cusum": an.EVENTS_DAILY_CUSUM_SQL,
        "doc_lang_confusion": co.DOC_LANG_CONFUSION_SQL,
        "doc_bigram_pmi": co.DOC_BIGRAM_PMI_SQL,
        "events_value_winsorized": an.EVENTS_VALUE_WINSORIZED_SQL,
        "customer_k_anonymity": an.CUSTOMER_K_ANONYMITY_SQL,
        "orders_basket_rules": an.ORDERS_BASKET_RULES_SQL,
        "events_attribution": an.EVENTS_ATTRIBUTION_SQL,
        "doc_readability": co.DOC_READABILITY_SQL,
        "embedding_covariance": co.EMBEDDING_COVARIANCE_SQL,
        "doc_rank_fusion": co.DOC_RANK_FUSION_SQL,
        "events_top_paths": an.EVENTS_TOP_PATHS_SQL,
        "corpus_source_langs": co.CORPUS_SOURCE_LANGS_SQL,
        "image_phash_dupes": mm.IMAGE_PHASH_DUPES_SQL,
        "events_user_gini": an.EVENTS_USER_GINI_SQL,
        "events_unpivot_daily": an.EVENTS_UNPIVOT_SQL,
        "events_daily_gapfill": an.EVENTS_DAILY_GAPFILL_SQL,
        "events_value_quantiles_cont": an.EVENTS_QUANTILES_CONT_SQL,
        "events_value_moments": an.EVENTS_VALUE_MOMENTS_SQL,
        "graph_assortativity": an.GRAPH_ASSORTATIVITY_SQL,
        "documents_upsert": co.DOCUMENTS_UPSERT_SQL,
        "events_outliers": an.EVENTS_OUTLIERS_SQL,
        "embedding_kmeans": co.EMBEDDING_KMEANS_SQL,
        "doc_sample_weighted": co.DOC_SAMPLE_WEIGHTED_SQL,
        "revenue_by_nation": (
            "SELECT n_name, "
            "CAST(sum(CAST(floor(o_totalprice*10000) AS BIGINT)) AS BIGINT) "
            "AS revenue_e4, count(*) AS n_orders FROM orders o "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY 1"
        ),
        "top_customers": (
            "SELECT a.c_custkey, c.c_name, a.revenue_e4, a.n_orders FROM "
            "(SELECT o_custkey AS c_custkey, "
            " CAST(sum(CAST(floor(o_totalprice*10000) AS BIGINT)) AS BIGINT) "
            " AS revenue_e4, count(*) AS n_orders FROM orders GROUP BY 1) a "
            "JOIN customer c ON a.c_custkey = c.c_custkey "
            "ORDER BY a.revenue_e4 DESC, a.c_custkey LIMIT 10"
        ),
    }
