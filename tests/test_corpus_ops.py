"""Training-data corpus operators: text stats, dedup families,
similarity search, multimodal plumbing, analytics aggregates.

SQL-checkable operators are verified against DuckDB here at sf0.001
(the driver re-checks at sf0.01); approximate operators are verified
against exact baselines / planted duplicates."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from neocrawler_ray.functions import dedup as dd
from neocrawler_ray.functions import similarity as sim
from neocrawler_ray.functions import text_stats as ts

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "nation", "supplier", "region", "part"):
        c.execute(
            f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].sort_values(sorted(df.columns))
    return df.reset_index(drop=True).astype({c: str for c in df.columns})


def assert_matches_sql(ray_res, con, sql):
    a = ray_res.to_pandas() if hasattr(ray_res, "to_pandas") else ray_res
    b = con.execute(sql).fetchdf()
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(_norm(a), _norm(b))


# --- pure-function unit tests ----------------------------------------


def test_minhash_jaccard_estimate_tracks_truth():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox leaps over the lazy dog " * 5
    sa, sb = dd.minhash_signature(a), dd.minhash_signature(b)
    est = dd.estimate_jaccard(sa, sb)
    true = dd.ngram_jaccard(a, b)
    assert abs(est - true) < 0.15
    assert dd.estimate_jaccard(sa, sa) == 1.0


def test_minhash_lsh_bands_collide_for_near_dups():
    a = " ".join(f"tok{i}" for i in range(200))
    b = " ".join(f"tok{i}" for i in range(200) if i != 100)  # ~99% jaccard
    c = " ".join(f"other{i}" for i in range(200))
    ba, bb, bc = (dd.band_keys(dd.minhash_signature(x)) for x in (a, b, c))
    assert set(ba) & set(bb)
    assert not set(ba) & set(bc)


def test_simhash_hamming_small_for_near_dups():
    a = " ".join(f"tok{i}" for i in range(200))
    b = " ".join(f"tok{i}" for i in range(200) if i != 100)
    c = " ".join(f"other{i}" for i in range(200))
    ha, hb, hc = dd.simhash64(a), dd.simhash64(b), dd.simhash64(c)
    assert dd.hamming64(ha, hb) <= 7  # short docs flip a few bits per edit
    assert dd.hamming64(ha, hc) > 10
    assert set(dd.simhash_bands(ha, 8)) & set(dd.simhash_bands(hb, 8))


def test_token_hash_cache_eviction_is_bounded(monkeypatch):
    """The eviction bit rotates per round: with a fixed `hash(k) & 1`
    predicate, even-hash keys were permanently unevictable and the cache
    grew to ~half the distinct vocabulary regardless of cap (ADVICE r3)."""
    monkeypatch.setattr(dd, "_TOKEN_HASH_CACHE", {})
    monkeypatch.setattr(dd, "_TOKEN_HASH_CACHE_CAP", 100)
    for start in range(0, 20_000, 50):
        toks = [f"w{i}" for i in range(start, start + 50)]
        out = dd._token_hashes(toks)
        assert len(out) == 50
    # steady state must stay within a small constant of the cap — the old
    # predicate converged on ~10k resident entries here (half of 20k)
    assert len(dd._TOKEN_HASH_CACHE) <= 2 * 100 + 50
    # and values stay correct after evictions
    assert dd._token_hashes(["w1"])[0] == dd._hash64("w1")


def test_connected_components_min_representative():
    comp = dd.connected_components([(5, 3), (3, 9), (20, 21)])
    assert comp[5] == comp[3] == comp[9] == 3
    assert comp[21] == 20


def test_rolling_fingerprint_shift_invariant_overlap():
    f1 = ts.rolling_fingerprint("hello world this is a document about rays")
    f2 = ts.rolling_fingerprint("PREFIX hello world this is a document about rays")
    # winnowing keeps smallest hashes → heavy overlap despite the shift
    assert len(set(f1) & set(f2)) >= 2


def test_lang_id_trigram_detects_cjk_and_english():
    s = pd.Series(["the cat and the dog in the house", "这是一个中文文档测试样本"])
    out = ts.lang_id_trigram(s)
    assert out.tolist() == ["en", "zh"]


def test_kmeans_and_probe_deterministic():
    rng = np.random.RandomState(0)
    x = rng.standard_normal((200, 8))
    c1 = sim.kmeans_fit(x, 4)
    c2 = sim.kmeans_fit(x, 4)
    assert np.array_equal(c1, c2)
    p = sim.probe_cells(x[:3], c1, 2)
    assert p.shape == (3, 2)


# --- Ray pipelines vs DuckDB -----------------------------------------


def test_text_stats_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_text_stats(SF), con, ts.text_stats_sql())


def test_lang_id_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_lang_id(SF), con, ts.lang_id_markers_sql())


def test_fingerprint_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(
        co.doc_fingerprint(SF), con,
        f"select doc_id, {ts.SIMPLEFP_SQL.format(col='text')} AS fp from documents",
    )


def test_dedup_exact_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(
        co.dedup_exact(SF), con,
        "select md5(text) text_md5, min(doc_id) doc_id from documents "
        "group by md5(text)",
    )


def test_dup_spans_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    out = co.doc_dup_spans(SF)
    assert_matches_sql(out, con, co.doc_dup_spans_sql())
    # exact-dup doc pairs must both be span-flagged (when long enough
    # to hold a span at all) — the op subsumes doc-level exact dedup
    import duckdb  # noqa: F401  (con fixture provides the connection)
    dups = con.execute(
        "select doc_id from documents where text in (select text from "
        "documents group by text having count(*) >= 2)").df()["doc_id"]
    flagged = out.set_index("doc_id")
    for d in dups:
        row = flagged.loc[int(d)]
        assert row["n_spans"] == 0 or row["has_cross_dup"] == 1


def test_corpus_line_dedup_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    out = co.corpus_line_dedup(SF)
    assert_matches_sql(out, con, co.corpus_line_dedup_sql())
    # the corpus must actually exercise the drop path, and an exact-dup
    # doc pair must have the LATER copy fully deduplicated away
    assert (out["n_lines"] - out["n_kept"]).sum() > 0
    dups = con.execute(
        "select min(doc_id) keep, max(doc_id) drop_ from documents "
        "group by text having count(*) >= 2 and min(doc_id) <> max(doc_id)"
    ).fetchall()
    idx = out.set_index("doc_id")
    for keep, drop in dups:
        assert idx.loc[int(drop), "n_kept"] == 0
        assert idx.loc[int(keep), "n_kept"] > 0


def test_corpus_line_dedup_first_occurrence_policy(ray_session, con):
    """Global totals sanity: kept lines == distinct line texts (every
    distinct line survives exactly once, everywhere else dropped)."""
    from neocrawler_ray.pipelines import corpus_ops as co

    out = co.corpus_line_dedup(SF)
    distinct = con.execute("""
        WITH toks AS (SELECT doc_id,
               regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
        expanded AS (SELECT doc_id, t, unnest(generate_series(0,
               CAST(ceil(len(t) / 10.0) AS BIGINT) - 1)) AS g
          FROM toks WHERE len(t) > 0)
        SELECT count(distinct array_to_string(
            t[g*10+1 : least((g+1)*10, len(t))], ' ')) FROM expanded
    """).fetchone()[0]
    assert int(out["n_kept"].sum()) == int(distinct)


def test_doc_extract_byte_identical(ray_session, con):
    from neocrawler_ray.pipelines import doc_extract as de

    out = de.doc_extract(SF).to_pandas().sort_values("doc_id")
    truth = con.execute(
        "select doc_id, text from documents order by doc_id"
    ).fetchdf()
    # corpus precondition for the no-escaping envelope
    assert not truth["text"].str.contains("[<&]", regex=True).any()
    assert out["text"].tolist() == truth["text"].tolist()  # byte identical
    assert_matches_sql(out, con, de.DOC_EXTRACT_SQL)


def test_multimodal_meta_matches_sql(ray_session, con):
    from neocrawler_ray.stages import multimodal as mm

    assert_matches_sql(mm.multimodal_decode_meta(SF), con, mm.MULTIMODAL_META_SQL)
    assert_matches_sql(mm.video_frame_sample(SF), con, mm.FRAME_SAMPLE_SQL)


def test_real_decode_gated():
    from neocrawler_ray.stages.multimodal import RealImageDecode

    try:
        import PIL  # noqa: F401
        RealImageDecode()  # importable → constructor must succeed
    except ImportError:
        with pytest.raises(NotImplementedError):
            RealImageDecode()


def test_analytics_match_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(
        an.events_daily_counts(SF), con,
        "select strftime(ts,'%Y-%m-%d') date, event_type, count(*) n "
        "from events group by 1,2",
    )
    assert_matches_sql(
        an.q1_lineitem(SF), con,
        "select l_returnflag, l_linestatus, "
        "cast(sum(cast(l_quantity as bigint)) as bigint) sum_qty, "
        "cast(sum(cast(floor(l_extendedprice*10000) as bigint)) as bigint) "
        "sum_price_e4, count(*) count_order from lineitem group by 1,2",
    )
    assert_matches_sql(
        an.revenue_by_nation(SF), con,
        "select n_name, cast(sum(cast(floor(o_totalprice*10000) as bigint)) "
        "as bigint) revenue_e4, count(*) n_orders from orders o "
        "join customer c on o.o_custkey=c.c_custkey "
        "join nation n on c.c_nationkey=n.n_nationkey group by 1",
    )


def test_value_bands_empty_table(ray_session, tmp_path):
    """Zero events → empty band frame (mirrors the SQL result), not a
    NaN-to-int crash in the min/max reduce."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    pq.write_table(
        pa.table({"value": pa.array([], pa.float64())}),
        str(tmp_path / "events.parquet"))
    out = an.events_value_bands(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["band", "sum_value_e4", "n"]


def test_doc_split_match_sql_and_ratios(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    out = co.doc_split(SF)
    assert_matches_sql(out, con, co.doc_split_sql())
    df = out.to_pandas()
    frac = df["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    assert frac.get("val", 0) > 0.03 and frac.get("test", 0) > 0.03


def test_custom_window_ops_match_sql(ray_session, con):
    """Sessionization, as-of join, interval-band join, exact grouped
    quantiles and grouped top-k vs their window-function SQL oracles."""
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_sessions(SF), con, an.EVENTS_SESSIONS_SQL)
    assert_matches_sql(an.events_asof_join(SF), con, an.EVENTS_ASOF_SQL)
    assert_matches_sql(an.events_value_bands(SF), con,
                       an.events_value_bands_sql())
    assert_matches_sql(an.events_value_quantiles(SF), con,
                       an.EVENTS_QUANTILES_SQL)
    assert_matches_sql(an.top_orders_per_priority(SF), con,
                       an.top_orders_per_priority_sql())
    assert_matches_sql(an.events_props_stats(SF), con, an.EVENTS_PROPS_SQL)
    assert_matches_sql(an.q6_revenue(SF), con, an.Q6_SQL)
    assert_matches_sql(an.order_priority_semijoin(SF), con,
                       an.ORDER_PRIORITY_SEMIJOIN_SQL)
    assert_matches_sql(an.events_distinct_users(SF), con,
                       an.EVENTS_DISTINCT_USERS_SQL)
    assert_matches_sql(an.events_funnel(SF), con, an.EVENTS_FUNNEL_SQL)
    assert_matches_sql(an.events_rolling_sum(SF), con,
                       an.events_rolling_sum_sql())
    assert_matches_sql(an.events_pivot_daily(SF), con, an.EVENTS_PIVOT_SQL)


def test_funnel_requires_strict_order(ray_session, tmp_path):
    """A later event must qualify when the earliest one predates the
    previous stage's entry (the case a min-per-stage partial would
    lose): clicks at t=5 and t=15 around a signup at t=10 still reach
    the click stage; purchase at t=12 (< click entry 15) must NOT."""
    from neocrawler_ray.pipelines import analytics as an
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        (1, 5, "click"), (1, 10, "signup"), (1, 15, "click"),
        (1, 12, "purchase"),
        (2, 1, "signup"), (2, 2, "click"), (2, 3, "purchase"),
        (3, 4, "click"), (3, 6, "purchase"),
    ]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(r[1], "m") for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = an.events_funnel(str(tmp_path)).set_index("stage")["users"]
    assert out["signup"] == 2   # users 1, 2
    assert out["click"] == 2    # user 1 via t=15, user 2
    assert out["purchase"] == 1  # user 2 only


def test_doc_term_df_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_term_df(SF), con, co.doc_term_df_sql())


def test_doc_bigram_counts_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_bigram_counts(SF), con,
                       co.doc_bigram_counts_sql())


def test_doc_bigram_counts_edge_texts(ray_session, tmp_path):
    """Multi-space runs, NULL text, single-token and empty docs must
    neither crash nor fabricate bigrams across the dropped gaps —
    adjacency is over the non-empty token stream (the SQL contract:
    list_filter before pairing)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["a  b   c", None, "", "solo", "a b"],
                         type=pa.string()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = co.doc_bigram_counts(str(tmp_path))
    got = dict(zip(out["bigram"], out["n"]))
    assert got == {"a b": 2, "b c": 1}


def test_q5_local_supplier_volume_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q5_local_supplier_volume(SF), con, an.Q5_SQL)


def test_doc_lm_score_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_lm_score(SF), con, co.doc_lm_score_sql())


def test_doc_lm_score_tiny_exact(ray_session, tmp_path):
    """Hand-checked corpus: counts are corpus-wide ('a b' appears in two
    docs), instances weight by the GLOBAL count, and docs with <2
    tokens drop out."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import corpus_ops as co

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["a b a b", "a b", "x", None], type=pa.string()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = (co.doc_lm_score(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # bigram counts: "a b"=3 (2 in d0 + 1 in d1), "b a"=1
    assert out.to_dict("list") == {
        "doc_id": [0, 1], "lm_score": [2 * 3 + 1 * 1, 3], "n_bigrams": [3, 1]}


def test_user_top_event_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.user_top_event(SF), con, an.USER_TOP_EVENT_SQL)


def test_user_top_event_tie_breaks_lexicographically(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import analytics as an

    ev = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2], type=pa.int64()),
        "event_type": pa.array(["error", "error", "click", "click",
                                "view", "view", "click"]),
    })
    pq.write_table(ev, tmp_path / "events.parquet")
    out = (an.user_top_event(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out.to_dict("list") == {
        "user_id": [1, 2], "top_event": ["click", "view"], "n": [2, 2]}


def test_doc_quality_model_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co
    from neocrawler_ray.stages.quality_model import quality_model_sql

    got = co.doc_quality_model(SF).to_pandas()
    # non-degenerate: both labels present
    assert 0 < got["keep"].sum() < len(got)
    assert_matches_sql(got, con, quality_model_sql())


def test_doc_pii_scrub_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_pii_scrub(SF), con, co.doc_pii_scrub_sql())


def test_doc_pii_scrub_planted(ray_session, tmp_path):
    """Planted PII: emails scrub first, phones count on the
    email-scrubbed text (digits inside an address never double-count),
    clean docs pass through byte-identical."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import corpus_ops as co

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "contact bob.smith+spam@mail-host.example.com for details",
            "call +1 (555) 867-5309 or 020 7946 0958 now",
            "user42@host99.org then dial 5551234567",
            "no pii here at all",
        ]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = (co.doc_pii_scrub(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["text_clean"].tolist() == [
        "contact <email> for details",
        "call <phone> or <phone> now",
        "<email> then dial <phone>",
        "no pii here at all",
    ]
    assert out["n_redactions"].tolist() == [1, 2, 2, 0]
    # and the DuckDB oracle agrees on the planted corpus too
    c = duckdb.connect()
    c.execute(f"create view documents as select * from "
              f"read_parquet('{tmp_path}/documents.parquet')")
    assert_matches_sql(out, c, co.doc_pii_scrub_sql())


def test_q18_large_orders_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.q18_large_orders(SF)
    assert len(got) > 0  # threshold must bite below the max qty sum
    assert_matches_sql(got, con, an.q18_large_orders_sql())


def test_q18_empty_survivor_set(ray_session, con):
    """A threshold above every order's quantity sum must yield an empty
    frame with the full schema (the broadcast semi-join sees an empty
    key array), not an error."""
    from neocrawler_ray.pipelines import analytics as an

    got = an.q18_large_orders(SF, min_qty=10**9)
    assert len(got) == 0
    assert list(got.columns) == ["c_custkey", "c_name", "o_orderkey",
                                 "o_orderdate", "totalprice_e4", "sum_qty"]


def test_q14_promo_revenue_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.q14_promo_revenue(SF)
    # non-degenerate: promo share strictly between 0 and the total
    assert 0 < got["promo_rev_e4"].iloc[0] < got["total_rev_e4"].iloc[0]
    assert_matches_sql(got, con, an.Q14_SQL)


def test_events_retention_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_retention(SF), con,
                       an.EVENTS_RETENTION_SQL)


def test_events_retention_counts_each_user_once_per_day(ray_session,
                                                        tmp_path):
    """Two events by one user on the same day are ONE retained user;
    cohort day is the user's first active day even when events arrive
    out of order across blocks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pa.array([
        # user 1: two events day 0, one day 2 (out of order)
        pd.Timestamp("2024-03-03 09:00"), pd.Timestamp("2024-03-01 08:00"),
        pd.Timestamp("2024-03-01 23:59"),
        # user 2: only day 1
        pd.Timestamp("2024-03-02 12:00"),
    ], type=pa.timestamp("us"))
    events = pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
        "event_type": pa.array(["view"] * 4),
        "value": pa.array([0.0] * 4),
        "props": pa.array(["{}"] * 4),
    })
    pq.write_table(events, tmp_path / "events.parquet")
    from neocrawler_ray.pipelines import analytics as an

    out = an.events_retention(str(tmp_path))
    rows = {(r.cohort_date, r.day_offset): r.n_users
            for r in out.itertuples()}
    assert rows == {("2024-03-01", 0): 1, ("2024-03-01", 2): 1,
                    ("2024-03-02", 0): 1}


def test_doc_decontaminate_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_decontaminate(SF), con,
                       co.doc_decontaminate_sql())


def test_doc_decontaminate_planted_overlap(ray_session, tmp_path):
    """A doc sharing exactly one 3-gram with the benchmark is flagged
    with n_shared=1; disjoint docs and the benchmark docs themselves
    are not emitted; short (<3-token) docs match on the whole-doc
    shingle only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 50], type=pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta",     # benchmark (id 0)
            "x alpha beta gamma y",       # shares 1 shingle with doc 0
            "nothing in common here",     # disjoint
            "tiny doc",                   # short: whole-doc shingle
            "alpha beta gamma delta",     # exact dup of a bench doc
            "tiny doc",                   # benchmark (id 50), short
        ], type=pa.string()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = co.doc_decontaminate(str(tmp_path)).to_pandas()
    got = dict(zip(out["doc_id"], out["n_shared"]))
    # doc 1: "alpha beta gamma" only; doc 3: whole-doc "tiny doc" from
    # bench doc 50; doc 4: both shingles of the 4-token bench doc 0
    assert got == {1: 1, 3: 1, 4: 2}


def test_doc_term_heavy_hitters_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    out = co.doc_term_heavy_hitters(SF)
    assert 0 < len(out) < 31  # nontrivial split at denom=30
    assert_matches_sql(out, con, co.doc_term_heavy_hitters_sql())


def test_doc_term_heavy_hitters_cross_block_candidate(ray_session,
                                                      tmp_path):
    """The candidate union must catch a term that is a GLOBAL heavy
    hitter while trailing the local threshold in most blocks — the
    pigeonhole guarantee the two-pass design rides on (it only needs
    ONE block where the term clears count_b*denom > |block|)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    # 40 docs of 10 unique filler tokens each; "hot" appears once per
    # doc (10% of a doc's 10 tokens locally... spread thin) plus one
    # doc where it dominates.  denom=6: global threshold ~1/6 of
    # instances — "hot" qualifies only via its dense doc's block.
    filler = [" ".join(f"w{d}_{i}" for i in range(9)) + " hot"
              for d in range(40)]
    dense = " ".join(["hot"] * 60)
    texts = filler + [dense]
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = co.doc_term_heavy_hitters(str(tmp_path), denom=6)
    # n = 40*10 + 60 = 460; hot = 100 occurrences; 100*6 > 460 → heavy
    got = dict(zip(out["term"], out["n_occ"]))
    assert got == {"hot": 100}


def test_hll_sketch_accuracy_bands():
    """Function-level HLL across regimes: linear-counting range, the
    crossover, and deep register-saturation cardinalities the pipeline
    tables can't reach; split-then-merge must equal one-shot."""
    from neocrawler_ray.functions import sketches as sk

    rng = np.random.default_rng(7)
    for n in (100, 5000, 200_000, 1_000_000):
        vals = np.unique(rng.integers(0, 2**62, size=n, dtype=np.int64))
        h = pd.util.hash_array(vals)
        merged = sk.hll_merge([sk.hll_from_hashes(h[i::8])
                               for i in range(8)])
        assert np.array_equal(merged, sk.hll_from_hashes(h))
        est = sk.hll_estimate(merged)
        assert abs(est - len(vals)) / len(vals) < 0.05
    assert sk.hll_estimate(sk.hll_from_hashes(np.array([], np.uint64))) == 0.0


def test_events_distinct_users_hll_tracks_exact(ray_session):
    from neocrawler_ray.pipelines import analytics as an

    exact = an.events_distinct_users(SF).set_index("event_type")
    approx = an.events_distinct_users_hll(SF).set_index("event_type")
    assert list(exact.index) == list(approx.index)
    for etype in exact.index:
        e = exact.loc[etype, "distinct_users"]
        a = approx.loc[etype, "distinct_users"]
        assert abs(a - e) <= max(3, 0.03 * e)


def test_session_gap_boundary(ray_session, tmp_path):
    """A gap of exactly 30 min stays in-session; 30 min + 1 µs splits.
    Also: an as-of purchase with no earlier click maps to -1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    base = 1_700_000_000_000_000  # epoch µs
    rows = {
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 7, 9],
        "ts": pa.array(
            [base, base + an.SESSION_GAP_US,               # same session
             base + 2 * an.SESSION_GAP_US + 1,             # splits
             base + 3 * an.SESSION_GAP_US + 2, base],      # splits again
            type=pa.timestamp("us")),
        "event_type": ["click", "purchase", "purchase", "click", "purchase"],
        "value": [1.0] * 5,
    }
    pq.write_table(pa.table(rows), str(tmp_path / "events.parquet"))

    sess = an.events_sessions(str(tmp_path)).to_pandas()
    sess = sess.sort_values(["user_id", "session_no"]).reset_index(drop=True)
    assert list(sess["n_events"]) == [2, 1, 1, 1]
    assert list(sess["session_no"]) == [1, 2, 3, 1]

    asof = an.events_asof_join(str(tmp_path)).to_pandas()
    asof = asof.sort_values("event_id").reset_index(drop=True)
    # purchase 2: prior click at base; purchase 3: same (click 4 is later);
    # purchase 5 (user 9): no click at all → -1
    assert list(asof["event_id"]) == [2, 3, 5]
    assert list(asof["prior_click_ts_us"]) == [base, base, -1]


def test_events_sessions_salted_matches_sql_and_unsalted(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    salted = an.events_sessions(SF, salt_shift=33)
    assert_matches_sql(salted, con, an.EVENTS_SESSIONS_SQL)
    plain = an.events_sessions(SF).to_pandas()
    pd.testing.assert_frame_equal(_norm(salted.to_pandas()), _norm(plain))


def test_events_sessions_salted_whale_chains(ray_session, tmp_path):
    """The salted path must reproduce the single-pass answer when
    sessions span bucket cuts: a long session chaining through several
    buckets, a cross-cut merge (gap < G over the boundary), a cross-cut
    split (gap > G), and a 3-session bucket whose interior session
    takes the ordinal-offset path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    B = 1 << 33          # bucket width at salt_shift=33 (~143 min)
    MIN = 60_000_000     # one minute in µs
    ts, uid = [], []
    # user 1: 25 events every 20 min → ONE session across ~3.4 buckets
    for k in range(25):
        ts.append(200 * B + 10 * MIN + k * 20 * MIN)
        uid.append(1)
    # user 2, bucket 100: s1 = {0, 1 min}, s2 = {32 min} (interior),
    # s3 = {63, 64 min}; bucket 101: s4 = {150, 151, 152 min} — the
    # 86-min gap over the cut splits
    for m in (0, 1, 32, 63, 64, 150, 151, 152):
        ts.append(100 * B + m * MIN)
        uid.append(2)
    # user 3: 140 min (bucket 100) + 155 min (bucket 101) — the 15-min
    # gap over the cut merges
    for m in (140, 155):
        ts.append(100 * B + m * MIN)
        uid.append(3)
    rows = {
        "event_id": list(range(1, len(ts) + 1)),
        "user_id": uid,
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_type": ["click"] * len(ts),
        "value": [1.0] * len(ts),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "events.parquet"))

    salted = (an.events_sessions(str(tmp_path), salt_shift=33).to_pandas()
              .sort_values(["user_id", "session_no"])
              .reset_index(drop=True))
    plain = (an.events_sessions(str(tmp_path)).to_pandas()
             .sort_values(["user_id", "session_no"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(salted, plain)
    got = [(r.user_id, r.session_no, r.n_events)
           for r in salted.itertuples()]
    assert got == [(1, 1, 25),
                   (2, 1, 2), (2, 2, 1), (2, 3, 2), (2, 4, 3),
                   (3, 1, 2)]


def test_minhash_pipeline_finds_planted_dups(ray_session, tmp_path):
    """Plant near-duplicates in a parquet table; LSH must find exactly
    the planted pairs and no cross-pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    rng = np.random.RandomState(7)
    texts, ids = [], []
    vocab = [f"w{i}" for i in range(500)]
    for d in range(40):
        words = [vocab[rng.randint(0, 500)] for _ in range(120)]
        texts.append(" ".join(words))
        ids.append(d)
    # plant: 100..103 are 1-word edits of docs 0..3
    for j in range(4):
        words = texts[j].split()
        words[10] = "EDITED"
        texts.append(" ".join(words))
        ids.append(100 + j)
    d = tmp_path / "planted"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet",
    )
    pairs = co.dedup_minhash_verified(str(d), jaccard_threshold=0.8)
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert found == {(j, 100 + j) for j in range(4)}

    clusters = co.dedup_clusters(str(d), jaccard_threshold=0.8)
    assert dict(zip(clusters["doc_id"], clusters["cluster_rep"])) == {
        j: j for j in range(4)
    } | {100 + j: j for j in range(4)}

    sh = co.dedup_simhash_pairs(str(d), max_hamming=7).to_pandas()
    sh_found = set(zip(sh["doc_a"], sh["doc_b"]))
    assert {(j, 100 + j) for j in range(4)} <= sh_found


def test_ngram_pairs_exact_vs_brute(ray_session, tmp_path):
    """dedup_ngram_pairs (inverted-index join) must equal the brute
    per-pair set Jaccard on a planted-dup corpus — exactly, including
    the integer intersection/union sizes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(vocab[rng.randint(0, 300)] for _ in range(80))
             for _ in range(30)]
    ids = list(range(30))
    for j in range(3):  # 100..102 are 1-word edits of 0..2
        w = texts[j].split()
        w[5] = "EDITED"
        texts.append(" ".join(w))
        ids.append(100 + j)
    texts.append("")          # empty doc: no shingles, no pairs
    ids.append(200)
    texts.append("one two")   # <3 tokens: whole-doc shingle
    ids.append(201)
    texts.append("one two")   # identical tiny doc → jaccard 1 pair
    ids.append(202)
    d = tmp_path / "planted"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet")

    out = (co.dedup_ngram_pairs(str(d)).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    sets = {i: set(dd.word_shingles(t)) for i, t in zip(ids, texts)}
    exp = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b:
                continue
            c = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if c >= 1 and 2 * c >= u:
                exp.append((a, b, c, u))
    expected = pd.DataFrame(
        exp, columns=["doc_a", "doc_b", "n_intersect", "n_union"]
    ).astype("int64")
    pd.testing.assert_frame_equal(out, expected)
    assert {(201, 202)} <= set(zip(out["doc_a"], out["doc_b"]))
    assert {(j, 100 + j) for j in range(3)} <= set(
        zip(out["doc_a"], out["doc_b"]))


def test_ngram_hot_shingle_guard(ray_session, tmp_path):
    """A stop shingle planted in EVERY doc (the template-boilerplate
    case that made round-3's pair stage quadratic in one partition) must
    be detected by the sampled df prepass, split into block-pair groups,
    and still produce the exact unguarded answer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(500)]
    n = 300
    texts, ids = [], []
    for i in range(n):
        body = " ".join(vocab[rng.randint(0, 500)] for _ in range(40))
        # the same 3-gram opens every document → df = 300 ≫ df_block
        texts.append("copyright footer boilerplate " + body)
        ids.append(i)
    for j in range(4):  # planted near-dups of 0..3
        w = texts[j].split()
        w[10] = "EDITED"
        texts.append(" ".join(w))
        ids.append(1000 + j)
    d = tmp_path / "hot"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet")

    # prepass (exact sample, mod=1) must flag the stop shingle with
    # nb = ceil(304/48) blocks
    hot = co._ngram_hot_shingles(str(d), df_block=48, sample_mod=1)
    stop = dd.shingle_hashes("copyright footer boilerplate")
    assert len(stop) == 1 and int(stop[0]) in hot
    assert hot[int(stop[0])] == -(-len(ids) // 48)

    guarded = (co.dedup_ngram_pairs(str(d), df_block=48, df_sample_mod=1)
               .to_pandas().sort_values(["doc_a", "doc_b"])
               .reset_index(drop=True))
    unguarded = (co.dedup_ngram_pairs(str(d), df_block=None)
                 .to_pandas().sort_values(["doc_a", "doc_b"])
                 .reset_index(drop=True))
    pd.testing.assert_frame_equal(guarded, unguarded)
    assert {(j, 1000 + j) for j in range(4)} <= set(
        zip(guarded["doc_a"], guarded["doc_b"]))
    # sampled prepass (the production default) also catches an
    # every-doc shingle at mod≪n
    hot_sampled = co._ngram_hot_shingles(str(d), df_block=48, sample_mod=4)
    assert int(stop[0]) in hot_sampled


def test_hot_shingle_guard_boundary_property(ray_session, tmp_path):
    """Property test of the sampled-df prepass AT ITS BOUNDARY (round-4
    verdict item): a shingle with true df just above ``df_block`` can be
    missed by the 1-in-mod sample, so the invariant that bounds the pair
    stage is a DICHOTOMY, probed here over mod × df × id-offset:

    - flagged hot → every (bi, bj) block-pair task the router sends its
      postings to emits ≤ K·df_block² pairs (block sizes recomputed with
      the router's own hash);
    - stays cold → its single-task emission df·(df−1)/2 ≤ K·df_block²,
      i.e. misses are confined to the harmless df ≤ 2·df_block zone
      (with K = 2, df·(df−1)/2 ≤ 2·df_block² exactly up to 2·df_block);
    - additionally, NO miss at df ≥ 2·df_block for any probed offset —
      the multiplicative-hash sample is equidistributed over contiguous
      id ranges, and the Chernoff bound P[miss] ≤ exp(−df/(8·mod))
      (documented in the prepass docstring) makes a big-df miss
      vanishingly unlikely even for adversarial id sets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    df_block, K = 16, 2
    gold = np.uint64(0x9E3779B97F4A7C15)
    planted = dd.shingle_hashes("alpha beta gamma")
    assert len(planted) == 1
    key = int(planted[0])

    for mod in (2, 5, 10):
        for n_df in (12, 17, 24, 32, 64):
            for off in (0, 54321):
                ids = np.arange(off, off + n_df, dtype=np.int64)
                texts = [
                    # one shared 3-gram; the tail's 3-grams are unique
                    # per doc so the planted shingle is the only one
                    # with df > 1
                    "alpha beta gamma " + " ".join(
                        f"u{i}x{j}" for j in range(6))
                    for i in ids]
                d = tmp_path / f"b{mod}_{n_df}_{off}"
                d.mkdir()
                pq.write_table(
                    pa.table({"doc_id": pa.array(ids, pa.int64()),
                              "text": pa.array(texts, pa.string())}),
                    d / "documents.parquet")
                hot = co._ngram_hot_shingles(str(d), df_block, mod)
                tag = f"mod={mod} df={n_df} off={off}"
                if key in hot:
                    nb = hot[key]
                    with np.errstate(over="ignore"):
                        blk = ((ids.astype(np.uint64) * gold)
                               >> np.uint64(33)) % np.uint64(nb)
                    sizes = np.bincount(blk.astype(np.int64),
                                        minlength=nb)
                    worst = 0
                    for bi in range(nb):
                        for bj in range(bi, nb):
                            w = (sizes[bi] * (sizes[bi] - 1) // 2
                                 if bi == bj else sizes[bi] * sizes[bj])
                            worst = max(worst, int(w))
                    assert worst <= K * df_block * df_block, (
                        f"{tag}: hot split leaves a {worst}-pair task")
                else:
                    assert n_df * (n_df - 1) // 2 <= K * df_block ** 2, (
                        f"{tag}: missed shingle emits "
                        f"{n_df * (n_df - 1) // 2} pairs in one task")
                    assert n_df < 2 * df_block, (
                        f"{tag}: sample missed a df ≥ 2·df_block shingle")


def test_ngram_pairs_match_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.dedup_ngram_pairs(SF), con,
                       co.dedup_ngram_pairs_sql())


def test_dedup_ngram_pairs_prefix_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = (co.dedup_ngram_pairs_prefix(SF).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert_matches_sql(got, con, co.DEDUP_NGRAM_PAIRS_PREFIX_SQL)


def test_prefix_join_equals_full_join_and_prunes(ray_session, tmp_path):
    """Prefix filtering must (a) return EXACTLY the unfiltered exact
    join's answer at the same threshold and (b) actually index fewer
    postings — the 25×-at-t=0.8 claim, checked here as a strict
    reduction on a planted near-dup corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(400)]
    texts = [" ".join(vocab[rng.randint(0, 400)] for _ in range(60))
             for _ in range(25)]
    ids = list(range(25))
    for j in range(4):  # 1-word edits → J ≈ 57/63 ≈ 0.9 ≥ 0.8
        w = texts[j].split()
        w[20] = "EDITED"
        texts.append(" ".join(w))
        ids.append(100 + j)
    d = tmp_path / "pp"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet")
    pref = (co.dedup_ngram_pairs_prefix(str(d)).to_pandas()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    full = (co.dedup_ngram_pairs(str(d), 4, 5).to_pandas()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(pref, full)
    assert len(pref) >= 4  # the planted edits all survive t = 0.8
    # pruning: prefix postings ≈ (1-t)·full postings
    n_full = sum(len(dd.shingle_hashes(t)) for t in texts)
    n_pref = sum(
        len(dd.shingle_hashes(t))
        - ((4 * len(dd.shingle_hashes(t)) + 4) // 5) + 1
        for t in texts if len(dd.shingle_hashes(t)))
    assert n_pref < 0.3 * n_full


def test_dedup_ngram_keep_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.dedup_ngram_keep(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert_matches_sql(got, con, co.DEDUP_NGRAM_KEEP_SQL)
    # the keep policy is consistent with the pair graph: every dropped
    # doc names a kept, strictly smaller representative
    dropped = got[got["kept"] == 0]
    reps = set(got[got["kept"] == 1]["doc_id"])
    assert (dropped["rep"] < dropped["doc_id"]).all()
    assert set(dropped["rep"]).issubset(reps)


def test_dedup_ngram_keep_transitive_chain(ray_session, tmp_path):
    """A ~ B and B ~ C but A !~ C directly: CC must still merge the
    chain into ONE component with rep A — a pairwise-threshold keep
    (drop the larger of each pair) would get this right only by
    accident; component closure is the point of the CC stage."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    base = [f"w{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[8:] + [f"x{i}" for i in range(8)])   # ~62% with a
    c = " ".join(base[16:] + [f"x{i}" for i in range(16)])  # ~52% w/ b
    lone = " ".join(f"z{i}" for i in range(40))
    d = tmp_path / "chain"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3, 9], pa.int64()),
                  "text": pa.array([a, b, c, lone], pa.string())}),
        d / "documents.parquet")
    pairs = (co.dedup_ngram_pairs(str(d)).to_pandas()
             [["doc_a", "doc_b"]].apply(tuple, axis=1).tolist())
    assert (1, 2) in pairs and (2, 3) in pairs and (1, 3) not in pairs
    got = (co.dedup_ngram_keep(str(d)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.to_dict("records") == [
        {"doc_id": 1, "rep": 1, "kept": 1},
        {"doc_id": 2, "rep": 1, "kept": 0},
        {"doc_id": 3, "rep": 1, "kept": 0},
        {"doc_id": 9, "rep": 9, "kept": 1}]


def test_embedding_pairs_brute_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    b = co.embedding_pairs_brute(SF, 0.4)
    sql = con.execute(
        "select a.vec_id vec_a, b.vec_id vec_b from embeddings a, embeddings b "
        "where a.vec_id < b.vec_id and list_cosine_similarity("
        "cast(a.embedding as double[]), cast(b.embedding as double[])) >= 0.4 "
        "order by 1,2"
    ).fetchdf()
    assert b.reset_index(drop=True).equals(sql.astype("int64"))


def test_embedding_lsh_finds_planted_near_dups(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    rng = np.random.RandomState(11)
    base = rng.standard_normal((30, 64))
    vecs = list(base)
    ids = list(range(30))
    for j in range(3):  # 100+j ≈ tiny perturbation of j
        vecs.append(base[j] + 0.01 * rng.standard_normal(64))
        ids.append(100 + j)
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float32()))}),
        d / "embeddings.parquet",
    )
    pairs = co.dedup_embedding_pairs(str(d), threshold=0.97)
    found = set(zip(pairs["vec_a"], pairs["vec_b"]))
    assert found == {(j, 100 + j) for j in range(3)}


def test_embedding_lsh_recall_at_threshold(ray_session, tmp_path):
    """Banded sign-LSH recall vs the exact brute baseline, with pairs
    planted AT the advertised threshold (cosine 0.955-0.985, not 0.999 —
    a single 16-plane table only kept ~27% of these)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    rng = np.random.RandomState(23)
    dim = 64
    base = rng.standard_normal((120, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, ids = list(base), list(range(120))
    for j in range(40):  # 1000+j at a controlled cosine to j
        v = base[j]
        w = rng.standard_normal(dim)
        w -= (w @ v) * v
        w /= np.linalg.norm(w)
        c = 0.955 + 0.03 * rng.rand()
        vecs.append(c * v + np.sqrt(1.0 - c * c) * w)
        ids.append(1000 + j)
    d = tmp_path / "emb_recall"
    d.mkdir()
    pq.write_table(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float32()))}),
        d / "embeddings.parquet",
    )
    brute = co.embedding_pairs_brute(str(d), threshold=0.97)
    lsh = co.dedup_embedding_pairs(str(d), threshold=0.97)
    bs = set(zip(brute["vec_a"], brute["vec_b"]))
    ls = set(zip(lsh["vec_a"], lsh["vec_b"]))
    assert len(bs) >= 10  # the plant produced a real ≥0.97 population
    assert ls <= bs  # cosine-verified buckets → no false positives
    assert len(ls & bs) / len(bs) >= 0.9  # banded recall bar (VERDICT #2)


def test_ann_brute_matches_sql_and_ivf_recall(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    brute = co.ann_brute_topk(SF)
    sql = con.execute("""
WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv
           FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.qid, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) s2
      FROM embeddings e, q WHERE e.vec_id != q.qid)
SELECT qid, vec_id, CAST(r AS BIGINT) rank FROM
  (SELECT qid, vec_id,
          row_number() OVER (PARTITION BY qid ORDER BY s2 DESC, vec_id) r
   FROM s) WHERE r <= 10 ORDER BY qid, rank
""").fetchdf()
    pd.testing.assert_frame_equal(_norm(brute), _norm(sql))

    ivf = co.ann_ivf_topk(SF)
    bs = set(map(tuple, brute[["qid", "vec_id"]].values))
    ivs = set(map(tuple, ivf[["qid", "vec_id"]].values))
    assert len(bs & ivs) / len(bs) >= 0.6  # random vectors: weak structure

    # clustered data → IVF should be near-exact
    rng = np.random.RandomState(3)
    cents = rng.standard_normal((8, 32)) * 5
    labels = rng.randint(0, 8, size=300)
    m = cents[labels] + rng.standard_normal((300, 32))
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"vec_id": pa.array(range(300), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in m],
                                        pa.list_(pa.float32()))}),
        os.path.join(d, "embeddings.parquet"),
    )
    b2 = co.ann_brute_topk(d, n_queries=5, k=10)
    i2 = co.ann_ivf_topk(d, n_queries=5, k=10, n_clusters=8, nprobe=2)
    bs2 = set(map(tuple, b2[["qid", "vec_id"]].values))
    is2 = set(map(tuple, i2[["qid", "vec_id"]].values))
    assert len(bs2 & is2) / len(bs2) >= 0.9


def test_corpus_clean_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(
        co.corpus_clean(SF), con,
        "WITH stats AS (" + ts.text_stats_sql() + "), "
        "survivors AS (SELECT d.doc_id, md5(d.text) AS fp, s.n_tokens "
        " FROM documents d JOIN stats s USING (doc_id) WHERE s.quality_ok), "
        "keep AS (SELECT min(doc_id) AS doc_id FROM survivors GROUP BY fp) "
        "SELECT k.doc_id, s.n_tokens FROM keep k JOIN survivors s USING (doc_id)",
    )


def test_doc_chunks_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_chunks(SF), con, co.doc_chunks_sql())
    # spot invariants: every doc appears; the last chunk is 1..window
    # tokens; non-last chunks are exactly window tokens
    df = co.doc_chunks(SF).to_pandas()
    last = df.sort_values(["doc_id", "chunk_idx"]).groupby("doc_id").tail(1)
    assert (last["chunk_tokens"] <= co.CHUNK_WINDOW).all()
    nonlast = df.merge(last[["doc_id", "chunk_idx"]], on="doc_id",
                       suffixes=("", "_last"))
    nonlast = nonlast[nonlast["chunk_idx"] < nonlast["chunk_idx_last"]]
    assert (nonlast["chunk_tokens"] == co.CHUNK_WINDOW).all()


def test_connected_components_ds_matches_union_find(ray_session):
    """Distributed CC (min-label + pointer jumping) ≡ driver union-find,
    including a long path graph that defeats pure neighbor relaxation."""
    import pyarrow as pa
    import ray

    from neocrawler_ray.pipelines import corpus_ops as co

    # chain 0-1-...-39 (diameter 39) + a triangle + an isolated pair
    pairs = [(i, i + 1) for i in range(39)]
    pairs += [(100, 101), (101, 102), (100, 102), (200, 201)]
    truth = dd.connected_components(pairs)

    ds = ray.data.from_arrow(pa.table(
        {"doc_a": pa.array([a for a, _ in pairs], pa.int64()),
         "doc_b": pa.array([b for _, b in pairs], pa.int64())}))
    out = co.connected_components_ds(ds, num_parts=4).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_rep"]))
    assert got == truth

    # empty input → empty, schema-stable
    empty = ray.data.from_arrow(pa.table(
        {"doc_a": pa.array([], pa.int64()),
         "doc_b": pa.array([], pa.int64())}))
    assert co.connected_components_ds(empty, num_parts=4).count() == 0


def test_dedup_clusters_distributed_matches_driver(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(400)]
    texts, ids = [], []
    for d in range(30):
        texts.append(" ".join(vocab[rng.randint(0, 400)] for _ in range(100)))
        ids.append(d)
    for j in range(3):  # dups of docs 0..2
        w = texts[j].split()
        w[5] = "EDIT"
        texts.append(" ".join(w))
        ids.append(100 + j)
    d = tmp_path / "ccd"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet")
    a = co.dedup_clusters(str(d))
    b = co.dedup_clusters_distributed(str(d), num_parts=4)
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_audio_segments_and_image_resize_match_sql(ray_session, con):
    from neocrawler_ray.stages import multimodal as mm

    assert_matches_sql(mm.audio_segments(SF), con, mm.AUDIO_SEGMENTS_SQL)
    assert_matches_sql(mm.image_resize_meta(SF), con, mm.IMAGE_RESIZE_SQL)
    # geometry invariant: resized dims fit the 256 box, aspect preserved
    df = mm.image_resize_meta(SF).to_pandas()
    assert ((df["out_w"] <= 256) & (df["out_h"] <= 256)).all()
    assert ((df["out_w"] == 256) | (df["out_h"] == 256)).all()


def test_tdigest_sketch_properties():
    """Pure-kernel t-digest invariants: centroid bound, total-weight
    conservation, merge ≈ whole-build, monotone quantiles."""
    from neocrawler_ray.functions import sketches as td

    rng = np.random.RandomState(5)
    vals = np.concatenate([rng.lognormal(0, 2, 20000),
                           rng.standard_normal(20000) * 1e6])
    m, w = td.from_values(vals, 200)
    assert len(m) <= 102  # k1 span c/2 + 2
    assert abs(w.sum() - len(vals)) < 1e-6
    assert (np.diff(m) > 0).all()
    # merging digests of shards ≈ one digest of the whole
    parts = [td.from_values(c, 200) for c in np.array_split(vals, 7)]
    mm_, ww_ = td.merge(parts, 200)
    qs = np.array([0.01, 0.25, 0.5, 0.75, 0.9, 0.99])
    sv = np.sort(vals)

    def rank_err(est):
        return np.abs(np.searchsorted(sv, est) / len(sv) - qs)

    assert rank_err(td.quantile(m, w, qs)).max() <= 0.02
    assert rank_err(td.quantile(mm_, ww_, qs)).max() <= 0.02
    # serialize round-trip
    m2, w2 = td.deserialize(td.serialize(m, w))
    assert np.array_equal(m2, m) and np.array_equal(w2, w)


def test_events_value_quantiles_tdigest_tolerance(ray_session):
    """The t-digest variant tracks the exact histogram op within 2 %
    rank error per (group, quantile) — the unbounded-domain swap-in
    documented at the events_value_quantiles seam."""
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    approx = an.events_value_quantiles_tdigest(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["v"] = np.floor(ev["value"].astype("float64") * 10000.0)
    assert set(approx["event_type"]) == set(ev["event_type"].astype(str))
    for (etype, q_pct, est) in approx.itertuples(index=False):
        sv = np.sort(ev.loc[ev["event_type"].astype(str) == etype,
                            "v"].to_numpy())
        rank = np.searchsorted(sv, est, side="right") / len(sv)
        assert abs(rank - q_pct / 100.0) <= 0.02 + 2.0 / len(sv), \
            (etype, q_pct, est, rank)


def test_tfidf_sample_mix_match_sql(ray_session, con):
    """Round-3b corpus-construction operators vs their SQL oracles:
    per-doc TF-IDF top terms (two-exchange join), hash-ordered
    stratified sample, and source-ratio mix."""
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_tfidf_top(SF), con, co.doc_tfidf_top_sql())
    assert_matches_sql(co.doc_sample_stratified(SF), con,
                       co.doc_sample_stratified_sql())
    assert_matches_sql(co.corpus_mix(SF), con, co.corpus_mix_sql())


def test_corpus_mix_ratio_semantics(ray_session):
    """Ratio 0 keeps nothing, ratio >= 1.0 keeps every row of that
    source, and the kept set is a subset of the source's docs."""
    from neocrawler_ray.pipelines import corpus_ops as co

    all_docs = co.corpus_mix(
        SF, ratios={}, default_ratio=1.0).to_pandas()
    none_docs = co.corpus_mix(
        SF, ratios={}, default_ratio=0.0).to_pandas()
    some = co.corpus_mix(
        SF, ratios={"src0": 0.0}, default_ratio=1.0).to_pandas()
    assert len(none_docs) == 0
    assert len(all_docs) == 500
    assert (some["source"] != "src0").all()
    assert len(some) == len(all_docs[all_docs["source"] != "src0"])


def test_q3_top_revenue_matches_sql(ray_session, con):
    """Q3-shaped customer ⋈ orders ⋈ lineitem top-k revenue."""
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q3_top_revenue(SF), con, an.q3_top_revenue_sql())


def test_antijoin_and_lag_match_sql(ray_session, con):
    """NOT EXISTS anti-join (negated co-partitioned existence) and the
    per-user LAG/inter-arrival window vs their SQL oracles; the anti-
    and semi-join counts partition the date-window orders exactly."""
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.order_priority_antijoin(SF), con,
                       an.ORDER_PRIORITY_ANTIJOIN_SQL)
    assert_matches_sql(an.events_time_since_last(SF), con,
                       an.EVENTS_TIME_SINCE_LAST_SQL)

    semi = an.order_priority_semijoin(SF)
    anti = an.order_priority_antijoin(SF)
    both = semi.merge(anti, on="o_orderpriority", how="outer").fillna(0)
    total = int((both["order_count_x"] + both["order_count_y"]).sum())
    n_window = con.execute(
        "SELECT count(*) FROM orders WHERE o_orderdate >= DATE '1996-01-01'"
        " AND o_orderdate < DATE '1999-01-01'").fetchone()[0]
    assert total == n_window


def test_whale_entity_salted_windows(ray_session, tmp_path):
    """The salt_shift path of the LAG and rolling-sum windows must be
    bit-identical to the single-pass kernels when one user's events span
    many time buckets (the whale-entity seam the round-3 verdict
    flagged).  The corpus plants a whale (one user, 600 events across
    ~40 buckets at shift=33, incl. ts ties and sparse single-event
    buckets so rolling frames chain across multiple buckets) plus two
    small users."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    rng = np.random.RandomState(3)
    base = np.int64(1_700_000_000_000_000)  # epoch us
    ts, uid = [], []
    # whale: bursts + long gaps → some buckets dense, some single-event
    t = base
    for i in range(600):
        t += int(rng.choice([0, 1_000, 50_000_000, 30_000_000_000],
                            p=[0.05, 0.55, 0.3, 0.1]))
        ts.append(t)
        uid.append(7)
    for u in (1, 2):  # small users inside the same time range
        t = base + u * 123_456
        for _ in range(20):
            t += int(rng.randint(1, 10_000_000_000))
            ts.append(t)
            uid.append(u)
    n = len(ts)
    d = tmp_path / "whale"
    d.mkdir()
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
            "value": pa.array(rng.uniform(0, 100, n), pa.float64()),
        }),
        d / "events.parquet")
    shift = 33  # ~8.6 s buckets → the whale spans many buckets

    def got(ds):
        return (ds.to_pandas().sort_values("event_id")
                .reset_index(drop=True))

    lag_plain = got(an.events_time_since_last(str(d)))
    lag_salt = got(an.events_time_since_last(str(d), salt_shift=shift))
    pd.testing.assert_frame_equal(lag_salt, lag_plain)

    for w in (3, 7):  # w=7 forces head corrections chained across
        # multiple sparse buckets
        r_plain = got(an.events_rolling_sum(str(d), window=w))
        r_salt = got(an.events_rolling_sum(str(d), window=w,
                                           salt_shift=shift))
        pd.testing.assert_frame_equal(r_salt, r_plain)

    # sanity vs an independent pandas oracle (not just self-consistency)
    ev = pd.DataFrame({"event_id": range(n), "user_id": uid,
                       "ts_us": np.array(ts, dtype="int64")})
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    exp_gap = ev.groupby("user_id")["ts_us"].diff().fillna(-1).astype("int64")
    expected = (pd.DataFrame({"event_id": ev["event_id"], "gap_us": exp_gap})
                .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(lag_salt, expected)


def test_corpus_source_report_matches_sql(ray_session, con):
    """Per-source health report (counts, quality passes, token sums,
    distinct languages) vs the composed text-stats SQL oracle."""
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.corpus_source_report(SF), con,
                       co.corpus_source_report_sql())


def test_q10_returned_customers_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.q10_returned_customers(SF)
    assert len(got) > 0
    assert_matches_sql(got, con, an.q10_returned_customers_sql())


def test_customer_order_counts_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.customer_order_counts(SF), con,
                       an.CUSTOMER_ORDER_COUNTS_SQL)


def test_customer_order_counts_zero_fill(ray_session, tmp_path):
    """LEFT-OUTER semantics: a customer with no orders survives with
    zero counts; an orphan order (custkey not in customer) drops."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import analytics as an

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
        "c_name": pa.array(["a", "b", "c"]),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 9], type=pa.int64()),
        "o_totalprice": pa.array([10.5, 2.25, 99.0], type=pa.float64()),
    }), tmp_path / "orders.parquet")
    out = (an.customer_order_counts(str(tmp_path)).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    assert out.to_dict("list") == {
        "c_custkey": [1, 2, 3], "c_name": ["a", "b", "c"],
        "n_orders": [2, 0, 0], "spent_e4": [127500, 0, 0]}


def test_events_window_range_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_window_range(SF), con,
                       an.events_window_range_sql())


def test_events_window_range_peers_share_frame(ray_session, tmp_path):
    """RANGE (not ROWS) semantics: rows with EQUAL ts are peers — each
    one's frame includes the other, even the later-positioned peer; and
    a row exactly window-start old is still inside (inclusive bound)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import analytics as an

    base = 1_700_000_000_000_000  # us
    ts = pa.array([base, base + 30_000_000, base + 30_000_000,
                   base + 60_000_000, base + 120_000_000],
                  type=pa.timestamp("us"))
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 7], type=pa.int64()),
        "ts": ts,
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0], type=pa.float64()),
    }), tmp_path / "events.parquet")
    out = (an.events_window_range(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # frames (60s inclusive): e0:{0} e1:{0,1,2} e2:{0,1,2} e3:{0..3}
    # e4:{3,4} (e3 is exactly 60s old -> included)
    assert out["win_sum_e4"].tolist() == [
        10000, 70000, 70000, 150000, 240000]
    assert out["win_n"].tolist() == [1, 3, 3, 4, 2]


def test_events_transition_matrix_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_transition_matrix(SF)
    assert len(got) > 0
    assert_matches_sql(got, con, an.EVENTS_TRANSITION_SQL)


def test_events_transition_matrix_tiny_exact(ray_session, tmp_path):
    """Transitions never cross users, and ties on ts order by
    event_id (the SQL oracle's declared total order)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import analytics as an

    base = 1_700_000_000_000_000
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "ts": pa.array([base, base, base + 1, base, base + 1],
                       type=pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "a", "x", "y"]),
    }), tmp_path / "events.parquet")
    out = (an.events_transition_matrix(str(tmp_path))
           .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    # user 1 ordered by (ts, event_id): a->b->a; user 2: x->y
    assert out.to_dict("list") == {
        "from_type": ["a", "b", "x"], "to_type": ["b", "a", "y"],
        "n": [1, 1, 1]}


def test_q19_disjunctive_revenue_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.q19_disjunctive_revenue(SF)
    assert got["n_items"].iloc[0] > 0
    assert_matches_sql(got, con, an.q19_disjunctive_revenue_sql())


def test_q19_no_matching_branch_is_zero(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    branches = (("Brand#99", 1, 50, 1, 50),)  # brand doesn't exist
    got = an.q19_disjunctive_revenue(SF, branches=branches)
    assert got["revenue_e4"].tolist() == [0]
    assert got["n_items"].tolist() == [0]
    assert_matches_sql(got, con, an.q19_disjunctive_revenue_sql(branches))


def test_q17_small_quantity_revenue_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.q17_small_quantity_revenue(SF)
    assert got["n_items"].iloc[0] > 0
    assert_matches_sql(got, con, an.Q17_SQL)


def test_q17_boundary_excluded(ray_session, tmp_path):
    """qty exactly 20% of the part's average is NOT below it — the
    integer form qty*5*n < Σqty must exclude the equality row."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import analytics as an

    # part 1: quantities 1,4,4,4,4,8 -> sum 25, n 6, avg ~4.167
    #   row qty=1: 1*5*6=30 > 25? no -> 30 < 25 false... choose sums
    # make avg exactly 5: qtys 1,5,5,9 -> sum 20, n 4; 0.2*avg = 1
    #   row qty=1: 1*5*4 = 20 == 20 -> excluded (not strictly below)
    # part 2: qtys 1,9 -> sum 10, n 2; row qty=1: 10 < 10 -> excluded;
    #   add qty=0 row? quantities >=1; use 1,19 -> sum 20 n 2:
    #   1*5*2=10 < 20 -> included
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
        "l_quantity": pa.array([1.0, 5.0, 5.0, 9.0, 1.0, 19.0]),
        "l_extendedprice": pa.array([10.0, 1.0, 1.0, 1.0, 100.0, 1.0]),
    }), tmp_path / "lineitem.parquet")
    got = an.q17_small_quantity_revenue(str(tmp_path))
    # only part 2's qty=1 row (price 100.0) qualifies
    assert got["revenue_e4"].tolist() == [1000000]
    assert got["n_items"].tolist() == [1]


def test_revenue_rollup_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.revenue_rollup(SF)
    # all three grains present and internally consistent
    total = got[(got["yr"] == "ALL") & (got["prio"] == "ALL")]
    fine = got[(got["yr"] != "ALL") & (got["prio"] != "ALL")]
    assert total["n_orders"].iloc[0] == fine["n_orders"].sum()
    assert total["revenue_e4"].iloc[0] == fine["revenue_e4"].sum()
    assert_matches_sql(got, con, an.REVENUE_ROLLUP_SQL)


def test_events_user_ntile_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_user_ntile(SF), con,
                       an.events_user_ntile_sql())


def test_events_user_ntile_remainder_sizes(ray_session, tmp_path):
    """NTILE group-size arithmetic: 6 rows into 4 tiles -> sizes
    2,2,1,1 (first n%k tiles get the extra row), and a user with fewer
    rows than tiles gets one per tile."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import analytics as an

    base = 1_700_000_000_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(8)), type=pa.int64()),
        "user_id": pa.array([1] * 6 + [2] * 2, type=pa.int64()),
        "ts": pa.array([base + i for i in range(8)],
                       type=pa.timestamp("us")),
    }), tmp_path / "events.parquet")
    out = (an.events_user_ntile(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out["tile"].tolist() == [1, 1, 2, 2, 3, 4, 1, 2]


def test_corpus_prepare_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.corpus_prepare(SF).to_pandas()
    assert len(got) > 0
    assert_matches_sql(got, con, co.corpus_prepare_sql())


def test_corpus_prepare_stage_chain_planted(ray_session, tmp_path):
    """The four stages compose in order: the junk doc dies at the gate,
    the duplicate loses to the lower doc_id, PII scrubs before scoring
    (the score sees '<email>', not the address), and the low-quality
    survivor is dropped by the model filter."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import corpus_ops as co

    good = ("the quick brown fox jumps over the lazy dog and then "
            "the fox naps by the old barn door for a while longer "
            "because it is a very sleepy fox indeed today ")
    pii = good + " contact someone@example.com for more"
    docs = pa.table({
        "doc_id": pa.array([5, 3, 9, 11], type=pa.int64()),
        # 5 and 3 are byte-identical dups (3 must win); 9 carries PII;
        # 11 is too short for the gate
        "text": pa.array([good, good, pii, "short junk"]),
        "lang": pa.array(["en", "en", "en", "en"]),
        "source": pa.array(["web", "web", "mail", "web"]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = (co.corpus_prepare(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [3, 9]
    assert out.loc[1, "n_redactions"] == 1
    assert "<email>" in out.loc[1, "text_clean"]
    assert "someone@example.com" not in out.loc[1, "text_clean"]
    c = duckdb.connect()
    c.execute(f"create view documents as select * from "
              f"read_parquet('{tmp_path}/documents.parquet')")
    assert_matches_sql(out, c, co.corpus_prepare_sql())


def test_nation_balance_outer_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.nation_balance_outer(SF)
    assert len(got) > 0
    assert_matches_sql(got, con, an.NATION_BALANCE_OUTER_SQL)


def test_nation_balance_outer_null_extends_both_sides(ray_session,
                                                      tmp_path):
    """Nations on only one side survive with the other side zeroed —
    in BOTH directions."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import analytics as an

    pq.write_table(pa.table({
        "c_nationkey": pa.array([1, 1, 2], type=pa.int32()),
        "c_acctbal": pa.array([10.5, 0.5, 3.0], type=pa.float64()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "s_nationkey": pa.array([2, 3], type=pa.int32()),
        "s_acctbal": pa.array([7.0, 9.25], type=pa.float64()),
    }), tmp_path / "supplier.parquet")
    out = an.nation_balance_outer(str(tmp_path))
    assert out["n_nationkey"].tolist() == [1, 2, 3]
    assert out["cust_bal_e4"].tolist() == [110000, 30000, 0]
    assert out["supp_bal_e4"].tolist() == [0, 70000, 92500]
    assert out["n_cust"].tolist() == [2, 1, 0]
    assert out["n_supp"].tolist() == [0, 1, 1]
    c = duckdb.connect()
    for t in ("customer", "supplier"):
        c.execute(f"create view {t} as select * from "
                  f"read_parquet('{tmp_path}/{t}.parquet')")
    assert_matches_sql(out, c, an.NATION_BALANCE_OUTER_SQL)


def test_events_cumulative_sum_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_cumulative_sum(SF), con,
                       an.EVENTS_CUMULATIVE_SQL)


def test_events_cumulative_sum_restarts_per_user(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import analytics as an

    base = 1_700_000_000_000_000
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "user_id": pa.array([1, 1, 2, 2], type=pa.int64()),
        "ts": pa.array([base, base + 1, base, base + 1],
                       type=pa.timestamp("us")),
        "value": pa.array([1.5, 2.0, 10.0, -3.0], type=pa.float64()),
    }), tmp_path / "events.parquet")
    out = (an.events_cumulative_sum(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert out["cum_sum_e4"].tolist() == [15000, 35000, 100000, 70000]


def test_q19_branches_sharing_a_brand_compose_like_sql(ray_session, con):
    """Two branches on the SAME brand with different quantity/size
    windows must OR together (regression: a per-part brand-code slot
    let the last branch win)."""
    from neocrawler_ray.pipelines import analytics as an

    branches = (("Brand#12", 1, 11, 1, 5),
                ("Brand#12", 20, 30, 1, 50),
                ("Brand#23", 10, 20, 1, 10))
    got = an.q19_disjunctive_revenue(SF, branches=branches)
    assert got["n_items"].iloc[0] > 0
    assert_matches_sql(got, con, an.q19_disjunctive_revenue_sql(branches))


def test_q19_empty_part_dimension(ray_session, tmp_path):
    """An empty part table must yield the zero row, not an index error
    in the batch tasks."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import analytics as an

    pq.write_table(pa.table({
        "p_partkey": pa.array([], type=pa.int64()),
        "p_brand": pa.array([], type=pa.string()),
        "p_size": pa.array([], type=pa.int64()),
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2], type=pa.int64()),
        "l_quantity": pa.array([5.0, 6.0]),
        "l_extendedprice": pa.array([10.0, 20.0]),
        "l_discount": pa.array([0.0, 0.0]),
    }), tmp_path / "lineitem.parquet")
    got = an.q19_disjunctive_revenue(str(tmp_path))
    assert got["revenue_e4"].tolist() == [0]
    assert got["n_items"].tolist() == [0]


def test_customer_order_counts_empty_name_customer(ray_session, tmp_path):
    """A customer whose name IS the empty string still left-joins
    (regression: the side tag used to be the name sentinel)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neocrawler_ray.pipelines import analytics as an

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], type=pa.int64()),
        "c_name": pa.array(["", "b"]),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1], type=pa.int64()),
        "o_totalprice": pa.array([4.5], type=pa.float64()),
    }), tmp_path / "orders.parquet")
    out = (an.customer_order_counts(str(tmp_path)).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    assert out.to_dict("list") == {
        "c_custkey": [1, 2], "c_name": ["", "b"],
        "n_orders": [1, 0], "spent_e4": [45000, 0]}


# --- TPC-H suite completion (round-4 continuation) --------------------


def test_q7_volume_shipping_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q7_volume_shipping(SF), con, an.Q7_SQL)


def test_q8_market_share_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q8_market_share(SF), con, an.Q8_SQL)


def test_q9_product_profit_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q9_product_profit(SF), con, an.Q9_SQL)


def test_q11_important_parts_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q11_important_parts(SF), con, an.Q11_SQL)


def test_q12_shipping_priority_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q12_shipping_priority(SF), con, an.Q12_SQL)


def test_q15_top_supplier_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q15_top_supplier(SF), con, an.Q15_SQL)


def test_q16_supplier_diversity_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q16_supplier_diversity(SF), con, an.Q16_SQL)


def test_q20_dominant_suppliers_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q20_dominant_suppliers(SF), con, an.Q20_SQL)


def test_q21_sole_late_supplier_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q21_sole_late_supplier(SF), con,
                       an.q21_sole_late_supplier_sql())


def test_q22_idle_rich_customers_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q22_idle_rich_customers(SF), con, an.Q22_SQL)


def test_q2_min_price_supplier_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.q2_min_price_supplier(SF), con, an.Q2_SQL)


def _write_tpch_tiny(tmp_path, orders=None, lineitem=None, supplier=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    if supplier is None:
        supplier = {"s_suppkey": [1, 2, 3],
                    "s_name": ["S1", "S2", "S3"],
                    "s_nationkey": [0, 0, 0]}
    pq.write_table(pa.table({
        "s_suppkey": pa.array(supplier["s_suppkey"], pa.int64()),
        "s_name": pa.array(supplier["s_name"], pa.string()),
        "s_nationkey": pa.array(supplier["s_nationkey"], pa.int32())}),
        tmp_path / "supplier.parquet")
    if orders is not None:
        pq.write_table(pa.table({
            "o_orderkey": pa.array(orders["o_orderkey"], pa.int64()),
            "o_orderstatus": pa.array(orders["o_orderstatus"], pa.string())}),
            tmp_path / "orders.parquet")
    if lineitem is not None:
        import pandas as pd_
        pq.write_table(pa.table({
            "l_orderkey": pa.array(lineitem["l_orderkey"], pa.int64()),
            "l_suppkey": pa.array(lineitem["l_suppkey"], pa.int64()),
            "l_shipdate": pa.array(
                [pd_.Timestamp(t) for t in lineitem["l_shipdate"]],
                pa.timestamp("us"))}),
            tmp_path / "lineitem.parquet")


def test_q21_unique_achiever_logic(ray_session, tmp_path):
    """Hand-checked: order 1 (F, two suppliers, unique last shipper S2)
    charges S2; order 2 (F, two suppliers TIED on the max date) charges
    nobody; order 3 (F, single supplier) charges nobody; order 4 (O
    status) is out of scope entirely."""
    from neocrawler_ray.pipelines import analytics as an

    _write_tpch_tiny(
        tmp_path,
        orders={"o_orderkey": [1, 2, 3, 4],
                "o_orderstatus": ["F", "F", "F", "O"]},
        lineitem={
            "l_orderkey": [1, 1, 2, 2, 3, 4, 4],
            "l_suppkey": [1, 2, 1, 2, 1, 1, 2],
            "l_shipdate": ["1996-01-01", "1996-06-01", "1996-03-01",
                           "1996-03-01", "1996-02-01", "1996-01-01",
                           "1996-09-01"]})
    out = an.q21_sole_late_supplier(str(tmp_path))
    assert out.to_dict("list") == {"s_name": ["S2"], "numwait": [1]}


def test_q15_preserves_ties(ray_session, tmp_path):
    """Two suppliers with IDENTICAL window revenue must both surface
    (the reference view + max() subquery keeps ties)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
        "s_nationkey": pa.array([0, 0, 0], pa.int32())}),
        tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 60.0, 40.0, 1.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64()),
        "l_shipdate": pa.array([pd.Timestamp(an.Q15_LO)] * 4,
                               pa.timestamp("us"))}),
        tmp_path / "lineitem.parquet")
    out = an.q15_top_supplier(str(tmp_path))
    assert out.to_dict("list") == {
        "s_suppkey": [1, 2], "s_name": ["S1", "S2"],
        "total_revenue_e4": [1000000, 1000000]}


def test_doc_word_repetition_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_word_repetition(SF), con,
                       co.doc_word_repetition_sql())


def test_doc_word_repetition_edge_texts(ray_session, tmp_path):
    """Multi-space runs collapse, NULL/empty/whitespace-only docs drop
    out, and the ratio floors exactly: 'a a b' → 3 words, 2 distinct,
    dup_ratio floor(1*10000/3)=3333."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["a  a b", None, "", "   ", "x x x x"],
                         type=pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = co.doc_word_repetition(str(tmp_path))
    assert out.to_dict("list") == {
        "doc_id": [0, 4], "n_words": [3, 4], "n_distinct_words": [2, 1],
        "top_word_count": [2, 4], "dup_ratio_e4": [3333, 7500]}


def test_order_count_distribution_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.order_count_distribution(SF), con,
                       an.ORDER_COUNT_DISTRIBUTION_SQL)


def test_events_user_rank_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_user_rank(SF), con, an.EVENTS_USER_RANK_SQL)


def test_events_user_rank_tie_semantics(ray_session, tmp_path):
    """Hand-checked tie behavior: totals 30, 20, 20, 10 must rank
    1, 2, 2, 4 (gapped) and dense-rank 1, 2, 2, 3 — ties share, rank
    skips, dense rank doesn't."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    pq.write_table(pa.table({
        "event_type": pa.array(["a"] * 5, pa.string()),
        "user_id": pa.array([1, 2, 3, 4, 2], pa.int64()),
        "value": pa.array([3.0, 1.0, 2.0, 1.0, 1.0], pa.float64())}),
        tmp_path / "events.parquet")
    out = (an.events_user_rank(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["total_e4"].tolist() == [30000, 20000, 20000, 10000]
    assert out["value_rank"].tolist() == [1, 2, 2, 4]
    assert out["value_dense_rank"].tolist() == [1, 2, 2, 3]


def test_events_tumbling_counts_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_tumbling_counts(SF), con,
                       an.events_tumbling_counts_sql())


def test_events_hopping_counts_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_hopping_counts(SF), con,
                       an.events_hopping_counts_sql())


def test_hopping_window_double_counts_tumbling(ray_session, con):
    """Every event lands in exactly 2 hopping windows, so the hopping
    grand totals must be exactly 2× the tumbling ones at equal hop —
    and each hopping window's count must equal the sum of its two
    constituent tumbling buckets."""
    from neocrawler_ray.pipelines import analytics as an

    tum = an.events_tumbling_counts(SF)
    hop = an.events_hopping_counts(SF, hop_us=an.TUMBLE_US)
    assert hop["n_events"].sum() == 2 * tum["n_events"].sum()
    assert hop["value_sum_e4"].sum() == 2 * tum["value_sum_e4"].sum()
    t = dict(zip(zip(tum["window_us"], tum["event_type"]),
                 tum["n_events"]))
    for w, et, n in zip(hop["window_us"], hop["event_type"],
                        hop["n_events"]):
        assert n == t.get((w, et), 0) + t.get((w + an.TUMBLE_US, et), 0)


def test_cms_primitives_never_undercount():
    import numpy as np

    from neocrawler_ray.functions import sketches as sk

    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**63, size=5000, dtype=np.int64).view(np.uint64)
    c = rng.integers(1, 50, size=5000).astype("int64")
    half = sk.cms_from_hashes(h[:2500], c[:2500])
    other = sk.cms_from_hashes(h[2500:], c[2500:])
    merged = sk.cms_merge([half, other])
    est = sk.cms_estimate(merged, h)
    assert (est >= c).all()
    # ε-bound: overcount ≤ e·N/w each with prob ≥ 1−e^−d; at this
    # density (5k keys into 2^16 counters) expect near-zero overshoot
    assert int((est - c).max()) <= int(np.e * c.sum() / sk.CMS_W_DEFAULT) + 1


def test_doc_term_heavy_hitters_cms_superset_of_exact(ray_session):
    """CMS one-pass heavy hitters must contain EVERY exact heavy
    hitter (pigeonhole candidates + never-undercount estimates), with
    per-term estimates ≥ the exact counts, and at this scale the
    sketch is wide enough that the sets coincide exactly."""
    from neocrawler_ray.pipelines import corpus_ops as co

    exact = co.doc_term_heavy_hitters(SF)
    approx = co.doc_term_heavy_hitters_cms(SF)
    ex = dict(zip(exact["term"], exact["n_occ"]))
    ap = dict(zip(approx["term"], approx["n_occ_est"]))
    missing = set(ex) - set(ap)
    assert not missing, f"CMS missed exact heavy hitters: {missing}"
    for t, n in ex.items():
        assert ap[t] >= n
    spurious = set(ap) - set(ex)
    assert len(spurious) <= max(2, len(ex) // 5), spurious


def test_doc_pack_shards_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    assert_matches_sql(co.doc_pack_shards(SF), con, co.doc_pack_shards_sql())


def test_doc_pack_shards_budget_respected(ray_session):
    """Shards are contiguous in doc_id, start at 0, never skip, and no
    shard's token total exceeds budget + its last doc's size (a doc
    never splits, so the only legal overshoot is the straddling doc)."""
    from neocrawler_ray.pipelines import corpus_ops as co

    out = co.doc_pack_shards(SF, budget=500)
    sid = out["shard_id"].to_numpy()
    assert sid[0] == 0
    assert ((sid[1:] - sid[:-1]) >= 0).all()
    assert set(sid) == set(range(sid.max() + 1))
    g = out.groupby("shard_id")["n_tokens"].sum()
    last = out.groupby("shard_id")["n_tokens"].last()
    assert (g <= 500 + last).all()


def test_bloom_primitives_no_false_negatives():
    import numpy as np

    from neocrawler_ray.functions import sketches as sk

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**63, 8000, dtype=np.int64).view(np.uint64)
    ins, probe = keys[:4000], keys[4000:]
    bits = sk.bloom_merge([sk.bloom_from_hashes(ins[:1000]),
                           sk.bloom_from_hashes(ins[1000:])])
    assert sk.bloom_might_contain(bits, ins).all()
    assert sk.bloom_might_contain(bits, probe).mean() < 0.05


def test_order_priority_semijoin_bloom_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.order_priority_semijoin_bloom(SF), con,
                       an.ORDER_PRIORITY_SEMIJOIN_SQL)


def test_semijoin_bloom_equals_exact(ray_session):
    from neocrawler_ray.pipelines import analytics as an

    a = an.order_priority_semijoin(SF)
    b = an.order_priority_semijoin_bloom(SF)
    pd.testing.assert_frame_equal(a, b)


def test_events_user_rank_bucketed_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_user_rank_bucketed(SF), con,
                       an.EVENTS_USER_RANK_SQL)


def test_events_user_rank_bucketed_equals_plain(ray_session):
    """The bucketed whale-group path must be row-identical to the
    one-partition-per-class op, including under heavy ties (2 buckets
    force many cross-bucket offsets)."""
    from neocrawler_ray.pipelines import analytics as an

    def norm(x):
        df = x.to_pandas() if hasattr(x, "to_pandas") else x
        return (df.sort_values(["event_type", "user_id"])
                .reset_index(drop=True))

    a = norm(an.events_user_rank(SF))
    b = norm(an.events_user_rank_bucketed(SF))
    pd.testing.assert_frame_equal(a, b)
    c = norm(an.events_user_rank_bucketed(SF, n_buckets=2))
    pd.testing.assert_frame_equal(a, c)


# --- CUBE / PERCENT_RANK / set operators (round 4 batch 2) -----------


def test_revenue_cube_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.revenue_cube(SF)
    assert_matches_sql(got, con, an.REVENUE_CUBE_SQL)
    # the four grains partition the fact rows: each grain's n_orders
    # sums to the grand total
    tot = int(got.loc[(got.yr == "ALL") & (got.prio == "ALL"),
                      "n_orders"].iloc[0])
    fine = got[(got.yr != "ALL") & (got.prio != "ALL")]
    by_y = got[(got.yr != "ALL") & (got.prio == "ALL")]
    by_p = got[(got.yr == "ALL") & (got.prio != "ALL")]
    assert fine["n_orders"].sum() == by_y["n_orders"].sum() == \
        by_p["n_orders"].sum() == tot


def test_events_percent_rank_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_percent_rank(SF), con,
                       an.EVENTS_PERCENT_RANK_SQL)


def test_percent_rank_kernel_vs_naive():
    from neocrawler_ray.pipelines.analytics import percent_rank_kernel

    rng = np.random.default_rng(7)
    for n in (1, 2, 5, 64):
        t = rng.integers(0, 8, size=n).astype("int64")  # force ties
        pr, cd = percent_rank_kernel(t)
        for i, v in enumerate(t):
            lt = int((t < v).sum())
            le = int((t <= v).sum())
            want_pr = 0.0 if n == 1 else lt / (n - 1)
            assert pr[i] == want_pr
            assert cd[i] == le / n
        assert (cd > 0).all() and (cd <= 1.0).all()


def test_events_user_days_setops_match_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    inter = an.events_user_days_intersect(SF)
    exc = an.events_user_days_except(SF)
    assert_matches_sql(inter, con, an.EVENTS_USER_DAYS_INTERSECT_SQL)
    assert_matches_sql(exc, con, an.EVENTS_USER_DAYS_EXCEPT_SQL)
    # set algebra: intersect and except are disjoint and their union is
    # all purchase user-days
    ikeys = set(zip(inter.user_id, inter.day))
    xkeys = set(zip(exc.user_id, exc.day))
    assert not (ikeys & xkeys)
    all_a = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT user_id, "
        "strftime(ts,'%Y-%m-%d') FROM events WHERE event_type='purchase')"
    ).fetchone()[0]
    assert len(ikeys) + len(xkeys) == all_a
    assert len(ikeys) > 0 and len(xkeys) > 0


def test_graph_pagerank_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.graph_pagerank(SF).to_pandas()
    assert_matches_sql(got, con, an.GRAPH_PAGERANK_SQL)
    # fixed-point floor losses are bounded: ≥99.9% of the total mass
    # survives three damped iterations, and node kinds partition the id
    # space
    assert got["pr_mass"].sum() >= 0.999 * an.PR_TOTAL
    assert set(got["kind"]) == {"part", "supplier"}
    # a supplier shipping many parts must out-rank one shipping few:
    # rank correlates positively with degree on the supplier side
    sup = got[got["kind"] == "supplier"]
    assert sup["pr_mass"].corr(sup["degree"]) > 0.5


def test_graph_pagerank_uniform_on_regular_graph(ray_session, tmp_path):
    """On a biregular graph (every part ships via every supplier) the
    stationary masses are equal within each side — the damped update
    must preserve that symmetry exactly in integer arithmetic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    rows = [(p, s) for p in range(6) for s in range(4)]
    pq.write_table(pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_orderkey": pa.array(range(len(rows)), pa.int64()),
        "l_linenumber": pa.array([1] * len(rows), pa.int32()),
        "l_quantity": pa.array([1.0] * len(rows)),
        "l_extendedprice": pa.array([1.0] * len(rows)),
        "l_discount": pa.array([0.0] * len(rows)),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": pa.array(["N"] * len(rows)),
        "l_linestatus": pa.array(["O"] * len(rows)),
        "l_shipdate": pa.array([0] * len(rows), pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    got = an.graph_pagerank(str(tmp_path)).to_pandas()
    assert got[got["kind"] == "part"]["pr_mass"].nunique() == 1
    assert got[got["kind"] == "supplier"]["pr_mass"].nunique() == 1


def test_graph_triangles_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.graph_triangles(SF)
    assert_matches_sql(got, con, an.GRAPH_TRIANGLES_SQL)
    assert int(got["n_triangles"].iloc[0]) > 0


def test_graph_triangles_known_graph(ray_session, tmp_path):
    """K4 plus a pendant edge: 4 triangles, 7 edges, 5 nodes.  Orders
    encode one edge each (the degree-orientation path must count each
    triangle exactly once regardless of which node is its apex)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(3, 4)]
    rows = [(o, p) for o, (u, v) in enumerate(edges) for p in (u, v)]
    n = len(rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([1.0] * n),
        "l_extendedprice": pa.array([1.0] * n),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    got = an.graph_triangles(str(tmp_path))
    assert got.to_dict("records") == [
        {"n_nodes": 5, "n_edges": 7, "n_triangles": 4}]


def test_events_value_winsorized_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_value_winsorized(SF)
    assert_matches_sql(got, con, an.EVENTS_VALUE_WINSORIZED_SQL)
    # the winsorized mean sits inside the clip band
    assert ((got["wmean_e4"] >= got["lo_e4"])
            & (got["wmean_e4"] <= got["hi_e4"])).all()


def test_winsorized_mean_resists_outlier(ray_session, tmp_path):
    """One absurd spike must not move the winsorized mean beyond the
    p90 cut (while the plain mean would explode)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    vals = [10.0] * 99 + [1_000_000.0]
    n = len(vals)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([0] * n, pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["m"] * n),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    got = an.events_value_winsorized(str(tmp_path))
    r = got.iloc[0]
    assert r["lo_e4"] == r["hi_e4"] == 100_000      # p10 = p90 = 10.0
    assert r["wmean_e4"] == 100_000                  # spike clipped away


def test_doc_rank_fusion_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.doc_rank_fusion(SF)
    assert_matches_sql(got, con, co.DOC_RANK_FUSION_SQL)
    # RANK() semantics: every rank ≥ 1, borda is the row sum
    assert (got[["r1", "r2", "r3"]] >= 1).all().all()
    assert (got["borda"] == got["r1"] + got["r2"] + got["r3"]).all()
    assert (got["borda"].diff().dropna() >= 0).all()


def test_doc_rank_fusion_tie_semantics(ray_session, tmp_path):
    """Two docs with identical metrics must share all three ranks
    (RANK(), not ROW_NUMBER) and tie-break the output order by id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    same = "alpha beta gamma. delta epsilon zeta."
    worse = "zzz."
    pq.write_table(pa.table({
        "doc_id": pa.array([5, 3, 9], pa.int64()),
        "text": pa.array([same, same, worse], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([len(same), len(same), len(worse)],
                            pa.int64()),
    }), tmp_path / "documents.parquet")
    got = co.doc_rank_fusion(str(tmp_path))
    assert got["doc_id"].tolist()[:2] == [3, 5]   # tied, id order
    assert (got.iloc[0][["r1", "r2", "r3", "borda"]]
            == got.iloc[1][["r1", "r2", "r3", "borda"]]).all()


def test_embedding_covariance_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.embedding_covariance(SF)
    assert_matches_sql(got, con, co.EMBEDDING_COVARIANCE_SQL)
    # diagonal entries are n·Σx² − (Σx)² ≥ 0 (variances)
    diag = got[got["i"] == got["j"]]
    assert len(diag) == co.COV_DIM and (diag["cov_scaled"] >= 0).all()


def test_embedding_covariance_multibatch_combine(ray_session, tmp_path):
    """3,000 rows force multiple map_batches partials (default batch
    size 1024): the summed Gram partials must equal a single-pass
    numpy computation exactly — the combiner seam the 500-row sf
    fixtures never cross."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    rng = np.random.RandomState(5)
    mat = rng.uniform(-1, 1, size=(3000, 64)).astype("float32")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(3000), pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        "label": pa.array([0] * 3000, pa.int32()),
    }), tmp_path / "embeddings.parquet")
    got = co.embedding_covariance(str(tmp_path))
    v = np.floor(mat.astype("float64") * 10000.0).astype("int64")
    g = v.T @ v
    sx = v.sum(axis=0)
    n = 3000
    iu, ju = np.triu_indices(64)
    want = n * g[iu, ju] - sx[iu] * sx[ju]
    assert (got["cov_scaled"].to_numpy() == want).all()


def test_embedding_covariance_known_vectors(ray_session, tmp_path):
    """Two perfectly anti-correlated coordinates must produce a
    negative off-diagonal exactly equal to −n·Σx² form."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    vecs = [[1.0, -1.0] + [0.0] * 62,
            [-1.0, 1.0] + [0.0] * 62,
            [2.0, -2.0] + [0.0] * 62]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(3), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32()),
    }), tmp_path / "embeddings.parquet")
    got = co.embedding_covariance(str(tmp_path))
    rec = {(r["i"], r["j"]): r["cov_scaled"]
           for r in got.to_dict("records")}
    # e4: x1 = (1e4, -1e4, 2e4), x2 = -x1; n=3
    # var_scaled = 3·6e8 − 2e4·2e4? Σx1 = 2e4, Σx1² = 6e8
    assert rec[(1, 1)] == 3 * 6 * 10**8 - (2 * 10**4) ** 2
    assert rec[(1, 2)] == -rec[(1, 1)]
    assert rec[(3, 3)] == 0  # constant-zero coordinate


def test_doc_readability_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = (co.doc_readability(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert_matches_sql(got, con, co.DOC_READABILITY_SQL)


def test_doc_readability_extremes(ray_session, tmp_path):
    """Short simple sentences must out-score a vowel-dense run-on, and
    the empty doc hits the w=0/s=0 guard without dividing by zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(
            ["The cat sat. It naps. We go.",
             "Autonomous heterogeneous organizations operationalize "
             "bureaucratic accountability expeditiously",
             ""], pa.string()),
    }), tmp_path / "documents.parquet")
    got = (co.doc_readability(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    rec = {r["doc_id"]: r for r in got.to_dict("records")}
    assert rec[1]["flesch_e3"] > rec[2]["flesch_e3"]
    assert rec[3]["words"] == 0 and rec[3]["flesch_e3"] == 206835


def test_events_value_quantiles_cont_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_value_quantiles_cont(SF)
    assert_matches_sql(got, con, an.EVENTS_QUANTILES_CONT_SQL)
    # the cont value brackets the disc value: disc·100 within one
    # inter-value step of cont at the same q
    disc = an.events_value_quantiles(SF)
    m = got.merge(disc, on=["event_type", "q_pct"])
    assert (m["value_e4x100"] >= m["value_e4"] * 100).all()


def test_quantiles_cont_small_exact(ray_session, tmp_path):
    """Four values 10,20,30,40: p50 sits at position 1.5 → exactly
    25.0 (interpolated), p90 at 2.7 → 37.0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    vals = [10.0, 20.0, 30.0, 40.0]
    n = len(vals)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([0] * n, pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["m"] * n),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    got = an.events_value_quantiles_cont(str(tmp_path))
    rec = {r["q_pct"]: r["value_e4x100"] for r in got.to_dict("records")}
    assert rec[50] == 25_0000 * 100   # 25.0 in e4 × 100
    assert rec[90] == 37_0000 * 100   # 37.0


def test_events_value_moments_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_value_moments(SF)
    assert_matches_sql(got, con, an.EVENTS_VALUE_MOMENTS_SQL)
    assert (got["var_num"] >= 0).all()
    assert (got["min_e4"] <= got["max_e4"]).all()


def test_events_unpivot_daily_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_unpivot_daily(SF)
    assert_matches_sql(got, con, an.EVENTS_UNPIVOT_SQL)
    # melt ∘ pivot round-trips to the long daily aggregate
    long = an.events_daily_counts(SF).sort_values(
        ["date", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.rename(columns={"n": "n"}), long, check_dtype=False)


def test_events_daily_gapfill_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_daily_gapfill(SF)
    assert_matches_sql(got, con, an.EVENTS_DAILY_GAPFILL_SQL)
    # dense calendar: per type, days are consecutive
    for _, g in got.groupby("event_type"):
        days = pd.to_datetime(g["day"]).diff().dropna()
        assert (days == pd.Timedelta(days=1)).all()


def test_events_daily_gapfill_planted_gap(ray_session, tmp_path):
    """Days 1 and 4 present (v=10, v=40): days 2 and 3 must be filled
    with exactly 20 and 30 (exact linear interpolation), flagged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    ev = [("2024-01-01", 10.0), ("2024-01-04", 40.0)]
    n = len(ev)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime([e[0] for e in ev]).values),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["m"] * n),
        "value": pa.array([e[1] for e in ev], pa.float64()),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    got = an.events_daily_gapfill(str(tmp_path))
    assert got[["day", "v_e4", "is_filled"]].to_dict("records") == [
        {"day": "2024-01-01", "v_e4": 100_000, "is_filled": 0},
        {"day": "2024-01-02", "v_e4": 200_000, "is_filled": 1},
        {"day": "2024-01-03", "v_e4": 300_000, "is_filled": 1},
        {"day": "2024-01-04", "v_e4": 400_000, "is_filled": 0}]


def test_events_user_gini_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_user_gini(SF)
    assert_matches_sql(got, con, an.EVENTS_USER_GINI_SQL)
    # impurity bounds: 0 (single-type user) … <1e6; a user with k
    # perfectly balanced types hits exactly (1 − 1/k)·1e6
    assert got["gini_e6"].between(0, 999_999).all()


def test_events_user_gini_known_distributions(ray_session, tmp_path):
    """Single-type user → 0; two balanced types → exactly 500000;
    four balanced types → exactly 750000."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    ev = ([(1, "a")] * 6
          + [(2, "a"), (2, "b")] * 3
          + [(3, "a"), (3, "b"), (3, "c"), (3, "d")])
    n = len(ev)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([i * 1000 for i in range(n)], pa.timestamp("us")),
        "user_id": pa.array([e[0] for e in ev], pa.int64()),
        "event_type": pa.array([e[1] for e in ev]),
        "value": pa.array([0.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    got = an.events_user_gini(str(tmp_path))
    rec = {r["user_id"]: r["gini_e6"] for r in got.to_dict("records")}
    assert rec == {1: 0, 2: 500_000, 3: 750_000}


def test_image_phash_dupes_matches_sql(ray_session, con):
    from neocrawler_ray.stages import multimodal as mm

    got = mm.image_phash_dupes(SF)
    assert_matches_sql(got, con, mm.IMAGE_PHASH_DUPES_SQL)


def _phash_fixture_texts() -> dict[int, str]:
    """image-kind ids (doc_id % 3 == 0): 0 = base, 6 = NEAR-duplicate
    (10 single-byte substitutions, NOT byte-identical — the real-pHash
    catch the md5 stub could never make), 9 = byte-identical copy,
    12 = unrelated text (Hamming 10, past the threshold)."""
    base = " ".join(
        f"token{i:04d} payload segment alpha beta gamma" for i in range(40))
    bb = bytearray(base.encode())
    for pos in range(50, 50 + 10 * 33, 33):
        bb[pos] = ord("Z")
    far = " ".join(
        f"different{i:04d} content entirely other words here"
        for i in range(40))
    return {0: base, 6: bb.decode(), 9: base, 12: far,
            1: "audio", 2: "video"}


def test_image_phash_dupes_planted(ray_session, tmp_path):
    """A planted NEAR-duplicate (10-byte edit of a 1.7 KB payload, not
    byte-identical) must be caught at small Hamming distance; the
    byte-identical copy at 0; the unrelated payload must not pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.stages import multimodal as mm

    texts = _phash_fixture_texts()
    ids = sorted(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["s"] * len(ids), pa.string()),
        "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
    }), tmp_path / "documents.parquet")
    got = mm.image_phash_dupes(str(tmp_path))
    assert got.to_dict("records") == [
        {"media_a": 0, "media_b": 6, "hamming": 2},
        {"media_a": 0, "media_b": 9, "hamming": 0},
        {"media_a": 6, "media_b": 9, "hamming": 2}]


def test_phash64_kernel_matches_sql_on_edges(con):
    """The numpy :func:`phash64` kernel and the generated-SQL hash agree
    bit-for-bit, including the edge payloads (empty, 1 byte, < 1024
    bytes, exactly/over 1024, multi-byte utf-8)."""
    import duckdb
    import pandas as pd

    from neocrawler_ray.stages import multimodal as mm

    texts = ["", "a", "hello world " * 50, "x" * 63, "x" * 1024,
             "x" * 1025, "Ünïcødé — テスト " * 30]
    doc_ids = [i * 3 for i in range(len(texts))]
    c2 = duckdb.connect()
    c2.register("documents", pd.DataFrame({"doc_id": doc_ids,
                                           "text": texts}))
    sql = mm.image_phash_dupes_sql()
    phs_sql = (sql[:sql.index("SELECT a.media_id")]
               + "SELECT media_id, ph FROM phs ORDER BY media_id")
    got = dict(c2.execute(phs_sql).fetchall())
    want = mm.phash64([t.encode() for t in texts])
    assert {i: int(v) for i, v in zip(doc_ids, want)} == \
        {k: int(v) for k, v in got.items()}


def test_corpus_source_langs_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.corpus_source_langs(SF)
    assert_matches_sql(got, con, co.CORPUS_SOURCE_LANGS_SQL)
    assert (got["langs"].str.split(",").str.len()
            == got["n_langs"]).all()


def test_corpus_source_langs_null_groups(ray_session, tmp_path):
    """NULL source is a kept group; a source whose langs are all NULL
    aggregates to NULL (string_agg semantics), not ''."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a", "b", "c"], pa.string()),
        "lang": pa.array(["en", None, None], pa.string()),
        "source": pa.array(["s1", None, "s2"], pa.string()),
        "n_chars": pa.array([1, 1, 1], pa.int64()),
    }), tmp_path / "documents.parquet")
    got = co.corpus_source_langs(str(tmp_path))
    assert len(got) == 3  # s1, s2 and the NULL-source group
    rec = {r["source"]: (r["n_langs"], r["langs"])
           for r in got.to_dict("records")}
    assert rec["s1"] == (1, "en")
    assert rec["s2"] == (0, None)
    assert rec[None] == (0, None)


def test_events_top_paths_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_top_paths(SF)
    assert_matches_sql(got, con, an.EVENTS_TOP_PATHS_SQL)
    assert len(got) == an.PATHS_TOP_K
    assert got["path"].str.count(">").eq(2).all()


def test_events_top_paths_user_boundaries(ray_session, tmp_path):
    """Triples never span users: two users with 2 events each produce
    ZERO paths; one user with a,b,c,d produces a>b>c and b>c>d."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    ev = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"),
          (2, 1, "x"), (2, 2, "y"), (3, 1, "y"), (3, 2, "x")]
    n = len(ev)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([e[1] * 1_000_000 for e in ev],
                       pa.timestamp("us")),
        "user_id": pa.array([e[0] for e in ev], pa.int64()),
        "event_type": pa.array([e[2] for e in ev]),
        "value": pa.array([0.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    got = an.events_top_paths(str(tmp_path))
    assert sorted(got["path"]) == ["a>b>c", "b>c>d"]
    assert (got["n"] == 1).all()


def test_events_attribution_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_attribution(SF)
    assert_matches_sql(got, con, an.EVENTS_ATTRIBUTION_SQL)
    assert "direct" in set(got["channel"]) or len(got) > 0


def test_events_attribution_known_stream(ray_session, tmp_path):
    """click → purchase → purchase → view → purchase for one user:
    the first two purchases credit 'click' (the touch carries across
    the intermediate purchase), the third credits 'view'; a user whose
    first event is a purchase credits 'direct'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    ev = [  # (user, t, type, value)
        (1, 1, "click", 0.0), (1, 2, "purchase", 10.0),
        (1, 3, "purchase", 20.0), (1, 4, "view", 0.0),
        (1, 5, "purchase", 30.0),
        (2, 1, "purchase", 5.0),
    ]
    n = len(ev)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([e[1] * 1_000_000 for e in ev],
                       pa.timestamp("us")),
        "user_id": pa.array([e[0] for e in ev], pa.int64()),
        "event_type": pa.array([e[2] for e in ev]),
        "value": pa.array([e[3] for e in ev], pa.float64()),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    got = an.events_attribution(str(tmp_path))
    rec = {r["channel"]: (r["n_purchases"], r["value_e4"])
           for r in got.to_dict("records")}
    assert rec == {"click": (2, 300_000), "view": (1, 300_000),
                   "direct": (1, 50_000)}


def test_orders_basket_rules_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.orders_basket_rules(SF)
    assert_matches_sql(got, con, an.ORDERS_BASKET_RULES_SQL)
    assert (got["support"] >= an.BASKET_MIN_SUPPORT).all()


def test_orders_basket_rules_planted_affinity(ray_session, tmp_path):
    """Parts 7 and 8 always co-occur across 10 baskets while part 9
    floats independently — (7, 8) must survive the support gate with
    lift > 1e6 (positive association) regardless of batch slicing
    (orders are split across blocks here: co-location must come from
    the exchange, not the input layout)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    rows = []
    for o in range(10):
        rows += [(o, 7), (o, 8)]
        if o % 2 == 0:
            rows.append((o, 9))
    # shuffle rows so one order's lines do NOT sit adjacently
    rng = np.random.RandomState(0)
    rows = [rows[i] for i in rng.permutation(len(rows))]
    n = len(rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([1.0] * n),
        "l_extendedprice": pa.array([1.0] * n),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    got = an.orders_basket_rules(str(tmp_path), min_support=5, k=5)
    rec = {(r["part_a"], r["part_b"]): r for r in got.to_dict("records")}
    assert (7, 8) in rec
    assert rec[(7, 8)]["support"] == 10
    assert rec[(7, 8)]["lift_e6"] == 1_000_000  # P(7,8)=P(7)P(8)=1
    if (7, 9) in rec:  # 9 appears in half the baskets: lift exactly 1
        assert rec[(7, 9)]["lift_e6"] == 1_000_000


def test_customer_k_anonymity_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.customer_k_anonymity(SF)
    assert_matches_sql(got, con, an.CUSTOMER_K_ANONYMITY_SQL)
    assert (got["meets_k"] == (got["n"] >= an.K_ANON_K)
            .astype("int64")).all()


def test_doc_bigram_pmi_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.doc_bigram_pmi(SF)
    assert_matches_sql(got, con, co.DOC_BIGRAM_PMI_SQL)
    assert (got["n_cooc"] >= co.PMI_MIN_COUNT).all()
    assert (got["pmi_e6"].diff().dropna() <= 0).all()


def test_doc_bigram_pmi_planted_collocation(ray_session, tmp_path):
    """A token pair that ALWAYS co-occurs ("hong kong") must out-rank a
    pair of independently frequent tokens."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    rng = np.random.RandomState(3)
    common = ["the", "of", "and", "to", "in"]
    texts = []
    for i in range(40):
        toks = [common[rng.randint(0, 5)] for _ in range(30)]
        toks[10:10] = ["hong", "kong"]   # always adjacent, only here
        texts.append(" ".join(toks))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    got = co.doc_bigram_pmi(str(tmp_path), min_count=5, k=10)
    assert got.iloc[0]["bigram"] == "hong kong"
    top_common = got[got["bigram"].str.split(" ").str[0].isin(common)]
    assert got.iloc[0]["pmi_e6"] > top_common["pmi_e6"].max()


def test_events_daily_cusum_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_daily_cusum(SF)
    assert_matches_sql(got, con, an.EVENTS_DAILY_CUSUM_SQL)
    # per type: exactly ≥1 peak, the statistic telescopes to 0 at the
    # last day (C_K = N·T − N·T)
    for _, g in got.groupby("event_type"):
        assert g["is_peak"].sum() >= 1
        assert g.sort_values("day")["cusum_scaled"].iloc[-1] == 0


def test_events_daily_cusum_planted_shift(ray_session, tmp_path):
    """A mean shift mid-series must put the CUSUM peak exactly on the
    last pre-shift day."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    days = [f"2024-01-{d:02d}" for d in range(1, 11)]
    vals = [10.0] * 5 + [20.0] * 5      # shift after day 5
    n = len(days)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(days).values),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["m"] * n),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    got = an.events_daily_cusum(str(tmp_path)).sort_values("day")
    peak_days = got[got["is_peak"] == 1]["day"].tolist()
    assert peak_days == ["2024-01-05"]


def test_doc_lang_confusion_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.doc_lang_confusion(SF)
    assert_matches_sql(got, con, co.DOC_LANG_CONFUSION_SQL)
    # structure: every declared lang appears, counts partition the
    # corpus, and the detector agrees on at least part of it (the
    # disagreement mass is exactly what the op exists to surface)
    assert got["n_docs"].sum() == 500
    diag = got[got["lang"] == got["lang_pred"]]["n_docs"].sum()
    assert diag > 0


def test_events_value_trend_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_value_trend(SF)
    assert_matches_sql(got, con, an.EVENTS_VALUE_TREND_SQL)
    assert (got["n"] > 0).all() and len(got) == 5


def test_events_value_trend_known_line(ray_session, tmp_path):
    """Points exactly on y = 2.5·x + 7 (x in hours) must recover
    slope_e6 = 2.5e4·1e6/1e4… i.e. slope in e4-units/hour = 25000,
    so slope_e6 = 25_000_000_000 — and a negative-slope group checks
    the toward-zero truncation against Python floor semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    xs = [0, 1, 2, 3, 10]
    up = [2.5 * x + 7 for x in xs]        # slope 2.5/hour, icept 7
    dn = [-1.25 * x + 3 for x in xs]      # negative slope
    n = len(xs) * 2
    ts = [x * 3_600_000_000 for x in xs] * 2
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["up"] * 5 + ["dn"] * 5),
        "value": pa.array(up + dn, pa.float64()),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    got = an.events_value_trend(str(tmp_path))
    rec = {r["event_type"]: r for r in got.to_dict("records")}
    assert rec["up"]["slope_e6"] == 25_000 * 1_000_000
    assert rec["up"]["icept_e4"] == 7 * 10_000
    assert rec["dn"]["slope_e6"] == -12_500 * 1_000_000
    assert rec["dn"]["icept_e4"] == 3 * 10_000


def test_table_profile_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.table_profile(SF)
    assert_matches_sql(got, con, co.DOCUMENTS_PROFILE_SQL)
    rec = {r["col_name"]: r for r in got.to_dict("records")}
    assert rec["doc_id"]["n_distinct"] == rec["doc_id"]["n_rows"]


def test_table_profile_nulls_and_dupes(ray_session, tmp_path):
    """Nulls are excluded from distinct (SQL COUNT(DISTINCT)
    semantics) and counted in n_null; duplicate values collapse."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a", "a", None, "b"], pa.string()),
        "lang": pa.array([None, None, None, "en"], pa.string()),
        "source": pa.array(["s", "s", "s", "s"], pa.string()),
        "n_chars": pa.array([1, 1, 0, 1], pa.int64()),
    }), tmp_path / "documents.parquet")
    got = co.table_profile(str(tmp_path))
    rec = {r["col_name"]: (r["n_rows"], r["n_null"], r["n_distinct"])
           for r in got.to_dict("records")}
    assert rec["text"] == (4, 1, 2)
    assert rec["lang"] == (4, 3, 1)
    assert rec["source"] == (4, 0, 1)
    assert rec["n_chars"] == (4, 0, 2)
    assert rec["doc_id"] == (4, 0, 4)


def test_orders_skyline_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.orders_skyline(SF)
    assert_matches_sql(got, con, an.ORDERS_SKYLINE_SQL)
    assert len(got) > 0
    # staircase invariant: sorted by price desc, dates strictly increase
    s = got.sort_values("o_totalprice", ascending=False)
    d = s["o_orderdate"].to_numpy().astype("int64")
    p = s["o_totalprice"].to_numpy()
    assert all(d[i] < d[i + 1] or p[i] == p[i + 1]
               for i in range(len(s) - 1))


def test_skyline2d_ties_and_dominance():
    """Equal-equal ties both survive; equal price + lower date is
    dominated; strictly-higher-price-and-date dominates."""
    from neocrawler_ray.pipelines.analytics import _skyline2d

    df = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5, 6],
        "o_totalprice": [10.0, 10.0, 10.0, 5.0, 5.0, 1.0],
        "o_orderdate": pd.to_datetime(
            ["2024-01-05", "2024-01-05", "2024-01-01",  # tie, tie, dom
             "2024-02-01", "2024-01-03",                # keep, dom
             "2024-03-01"]),                            # keep (max date)
    })
    keep = sorted(_skyline2d(df)["o_orderkey"].tolist())
    assert keep == [1, 2, 4, 6]


def test_graph_bfs_hops_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.graph_bfs_hops(SF).to_pandas()
    assert_matches_sql(got, con, an.GRAPH_BFS_HOPS_SQL)
    # seeds must be present at hop 0 and every hop value is in
    # {-1, 0..max_hops}
    sup0 = got[(got["kind"] == "supplier")
               & (got["key"] <= an.BFS_SEED_SUPPKEY_MAX)]
    assert (sup0["hops"] == 0).all() and len(sup0) > 0
    assert got["hops"].isin(list(range(-1, an.BFS_MAX_HOPS + 1))).all()
    # bipartite invariant: parts sit at odd hops, non-seed suppliers at
    # even hops (when reached)
    parts = got[(got["kind"] == "part") & (got["hops"] >= 0)]
    assert (parts["hops"] % 2 == 1).all()


def test_documents_upsert_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.documents_upsert(SF)
    assert_matches_sql(got, con, co.DOCUMENTS_UPSERT_SQL)
    upd = got[got["was_updated"] == 1]
    assert (upd["doc_id"] % co.UPSERT_MOD == 0).all()
    assert (upd["lang"] == "xx").all()
    # non-updated rows pass base values through untouched
    base = con.execute(
        "SELECT doc_id, lang FROM documents ORDER BY doc_id").fetchdf()
    keep = got[got["was_updated"] == 0].merge(base, on="doc_id")
    assert (keep["lang_x"] == keep["lang_y"]).all()


def test_graph_assortativity_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.graph_assortativity(SF)
    assert_matches_sql(got, con, an.GRAPH_ASSORTATIVITY_SQL)
    # sign·r² lives in [−1e6, 1e6]
    assert abs(int(got["r2_sign_e6"].iloc[0])) <= 1_000_000


def test_graph_assortativity_star_is_disassortative(ray_session,
                                                    tmp_path):
    """A star (one supplier, many parts) is maximally disassortative:
    every edge joins degree-1 to degree-k, so sign·r² = −10⁶ exactly
    (|r| = 1 on a two-point degree scatter)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    pairs = [(p, 1) for p in range(6)]
    n = len(pairs)
    pq.write_table(pa.table({
        "l_partkey": pa.array([p for p, _ in pairs], pa.int64()),
        "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([1.0] * n),
        "l_extendedprice": pa.array([1.0] * n),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    got = an.graph_assortativity(str(tmp_path))
    assert got.to_dict("records") == [
        {"n_edges": 12, "r2_sign_e6": -1_000_000}]


def test_graph_bfs_hops_no_seeds(ray_session, tmp_path):
    """No supplier key ≤ seed max → empty seed set must yield hops −1
    for every node (not a schema-loss crash), matching the oracle's
    unmatched LEFT JOIN arm."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    pairs = [(0, 50), (1, 60)]
    n = len(pairs)
    pq.write_table(pa.table({
        "l_partkey": pa.array([p for p, _ in pairs], pa.int64()),
        "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([1.0] * n),
        "l_extendedprice": pa.array([1.0] * n),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    got = an.graph_bfs_hops(str(tmp_path)).to_pandas()
    assert len(got) == 4 and (got["hops"] == -1).all()


def test_doc_bigram_pmi_below_min_count(ray_session, tmp_path):
    """Every bigram unique → the min-count gate empties every
    partition; the op must return an empty frame like the oracle,
    not crash on the schema-less pull."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    texts = [f"u{i} v{i} w{i}" for i in range(20)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")
    got = co.doc_bigram_pmi(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["bigram", "n_cooc", "pmi_e6"]


def test_doc_lang_confusion_keeps_null_lang(ray_session, tmp_path):
    """A NULL declared lang is the mislabeled row the op exists to
    surface — it must appear as its own group, not be dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["the of and to in with", "le la et des une"],
                         pa.string()),
        "lang": pa.array(["en", None], pa.string()),
        "source": pa.array(["s", "s"], pa.string()),
        "n_chars": pa.array([10, 10], pa.int64()),
    }), tmp_path / "documents.parquet")
    got = co.doc_lang_confusion(str(tmp_path))
    assert int(got["n_docs"].sum()) == 2
    assert got["lang"].isna().sum() == 1


def test_graph_bfs_hops_known_graph(ray_session, tmp_path):
    """Path p0-s1(seed), p0-s7, p2-s7 gives hops s1=0, p0=1, s7=2,
    p2=3; the disconnected edge p3-s9 stays unreached (-1 both)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    pairs = [(0, 1), (0, 7), (2, 7), (3, 9)]
    n = len(pairs)
    pq.write_table(pa.table({
        "l_partkey": pa.array([p for p, _ in pairs], pa.int64()),
        "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([1.0] * n),
        "l_extendedprice": pa.array([1.0] * n),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    got = an.graph_bfs_hops(str(tmp_path)).to_pandas()
    want = {("supplier", 1): 0, ("part", 0): 1, ("supplier", 7): 2,
            ("part", 2): 3, ("part", 3): -1, ("supplier", 9): -1}
    assert {(r["kind"], r["key"]): r["hops"]
            for _, r in got.iterrows()} == want


# --- edit-distance similarity join ------------------------------------


def test_banded_levenshtein_vs_full_dp():
    import random

    from neocrawler_ray.functions.dedup import banded_levenshtein

    def full(a, b):
        la, lb = len(a), len(b)
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev = dp[:]
            dp[0] = i
            for j in range(1, lb + 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (a[i - 1] != b[j - 1]))
        return dp[lb]

    rng = random.Random(1234)
    for _ in range(800):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 16)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 16)))
        k = rng.randint(0, 6)
        t = full(a, b)
        assert banded_levenshtein(a, b, k) == (t if t <= k else k + 1)
    # unicode codepoints, not bytes
    assert banded_levenshtein("héllo", "hèllo", 2) == 1


def test_dedup_edit_pairs_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.dedup_edit_pairs(SF).to_pandas()
    assert_matches_sql(got, con, co.DEDUP_EDIT_PAIRS_SQL)
    assert (got["dist"] <= co.EDIT_K).all()
    assert len(got) > 0


def test_dedup_edit_pairs_planted(ray_session, tmp_path):
    """Planted edits at every boundary the pigeonhole must survive:
    substitution mid-segment, insertion (length change), deletion,
    edits in k different segments, and an over-threshold pair that
    must NOT be reported."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = {
        0: base,
        1: base.replace("quick", "quack"),            # 1 substitution
        2: base[:20] + "X" + base[20:],                # 1 insertion
        3: base[:40] + base[41:],                      # 1 deletion
        4: base[:5] + "Z" + base[5:30] + "Q" + base[31:],  # 2 edits apart
        5: "a completely different sentence about databases and engines",
        6: base + " and far beyond the distant hills today",  # way over k
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["t"] * len(docs)),
        "n_chars": pa.array([len(v) for v in docs.values()], pa.int64()),
    }), tmp_path / "documents.parquet")
    got = co.dedup_edit_pairs(str(tmp_path)).to_pandas()
    pairs = {(a, b): d for a, b, d in
             zip(got["doc_a"], got["doc_b"], got["dist"])}
    assert pairs[(0, 1)] == 1          # quick→quack = 1 substitution (i→a)
    assert pairs[(0, 2)] == 1
    assert pairs[(0, 3)] == 1
    assert pairs[(0, 4)] == 2
    assert (0, 5) not in pairs
    assert (0, 6) not in pairs         # distance > k
    assert all(d <= co.EDIT_K for d in pairs.values())


# --- semantic dedup (SemDeDup) -----------------------------------------


def test_dedup_semantic_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.dedup_semantic(SF).to_pandas()
    assert_matches_sql(got, con, co.DEDUP_SEMANTIC_SQL)
    assert len(got) > 0
    assert set(got["kept"].unique()) <= {0, 1}
    assert (got["kept"] == 0).any()      # threshold actually drops rows


def test_dedup_semantic_planted(ray_session, tmp_path):
    """Within-cluster near-dups drop (lowest id survives); the same
    vector in ANOTHER cluster is untouched — SemDeDup never compares
    across clusters."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    d = 16
    # two orthogonal centroid seeds (ids 0, 1 become the codebook —
    # NOTE they are corpus rows too, so planted vectors must sit far
    # from their centroid or the centroid row itself dedups them)
    c0 = np.zeros(d, dtype=np.float32); c0[0] = 1.0
    c1 = np.zeros(d, dtype=np.float32); c1[1] = 1.0
    e2 = np.zeros(d, dtype=np.float32); e2[2] = 1.0
    # v: nearest c0 but only cos≈0.30 to it; v' = near-identical dup.
    # w: same e2 bulk but nearest c1 — cos(v, w)≈0.91 ≥ 0.9, yet the
    # pair is never compared because the clusters differ.
    v = (0.3 * c0 + 0.95 * e2).astype(np.float32)
    vp = (v + 1e-4).astype(np.float32)
    w = (0.3 * c1 + 0.95 * e2).astype(np.float32)
    rows = [c0, c1, v, vp, w]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(rows)), pa.int64()),
        "embedding": pa.array([r.tolist() for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    }), tmp_path / "embeddings.parquet")
    got = (co.dedup_semantic(str(tmp_path), k_clusters=2, threshold=0.9)
           .to_pandas().set_index("vec_id"))
    assert got.loc[2, "cluster"] == 0 and got.loc[4, "cluster"] == 1
    assert got.loc[2, "kept"] == 1 and got.loc[3, "kept"] == 0
    assert got.loc[4, "kept"] == 1   # cross-cluster near-dup untouched


# --- distributed global order-by rank ----------------------------------


def test_doc_global_rank_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.doc_global_rank(SF).to_pandas()
    assert_matches_sql(got, con, co.DOC_GLOBAL_RANK_SQL)
    n = len(got)
    assert sorted(got["global_rank"]) == list(range(1, n + 1))


def test_doc_global_rank_tie_stress(ray_session, tmp_path):
    """Heavy ties + tiny forced buckets: every n_chars value repeated
    many times, more buckets than distinct values — side='right'
    bucketing must keep each tie group whole and the doc_id tie-break
    exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    n = 300
    lens = [50 + (i % 3) * 10 for i in range(n)]     # 3 distinct values
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x" * l for l in lens]),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["t"] * n),
        "n_chars": pa.array(lens, pa.int64()),
    }), tmp_path / "documents.parquet")
    got = (co.doc_global_rank(str(tmp_path), n_buckets=16)
           .to_pandas().sort_values("global_rank").reset_index(drop=True))
    exp = sorted(range(n), key=lambda i: (-lens[i], i))
    assert got["doc_id"].tolist() == exp
    assert got["global_rank"].tolist() == list(range(1, n + 1))


# --- robust outlier detection (median + MAD) ---------------------------


def test_events_outliers_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_outliers(SF).to_pandas()
    assert_matches_sql(got, con, an.EVENTS_OUTLIERS_SQL)
    assert len(got) > 0


def test_events_outliers_robust_to_planted_whale(ray_session, tmp_path):
    """A mean/stddev gate would be dragged by the planted whale value;
    the median/MAD gate must flag exactly the whale and nothing else."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import analytics as an

    n = 101
    vals = [10.0 + (i % 5) * 0.1 for i in range(n - 1)] + [10_000.0]
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01T00:00:00") +
                        np.timedelta64(i, "m") for i in range(n)]),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n),
    }), tmp_path / "events.parquet")
    got = an.events_outliers(str(tmp_path)).to_pandas()
    assert got["event_id"].tolist() == [n - 1]


# --- distributed k-means (fixed-iteration Lloyd) ------------------------


def test_embedding_kmeans_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.embedding_kmeans(SF).to_pandas()
    assert_matches_sql(got, con, co.EMBEDDING_KMEANS_SQL)
    assert got["cluster"].nunique() == co.KMEANS_OP_K


def test_embedding_kmeans_empty_cluster_vanishes(ray_session, tmp_path):
    """Duplicate seeds: every row ties to the lower cid, so the second
    cluster empties after round 1 and must VANISH (not resurrect at its
    stale centroid) — the SQL-side semantics where its cid drops out of
    the rebuilt centroid table."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    d = 4
    rows = [np.zeros(d, dtype=np.float32),          # seed 0
            np.zeros(d, dtype=np.float32)]          # seed 1 (identical)
    rng = np.random.RandomState(3)
    rows += [rng.standard_normal(d).astype(np.float32) for _ in range(20)]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(rows)), pa.int64()),
        "embedding": pa.array([r.tolist() for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    }), tmp_path / "embeddings.parquet")
    got = (co.embedding_kmeans(str(tmp_path), k_clusters=2, n_iter=2)
           .to_pandas())
    assert (got["cluster"] == 0).all()


def test_doc_sample_weighted_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import corpus_ops as co

    got = co.doc_sample_weighted(SF)
    assert_matches_sql(got, con, co.DOC_SAMPLE_WEIGHTED_SQL)
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_doc_sample_weighted_favors_heavy_docs(ray_session, tmp_path):
    """Priority sampling property: with weights w and w' = 100w, the
    heavy stratum must dominate the sample far beyond its 50% count
    share (inclusion probability scales with weight)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neocrawler_ray.pipelines import corpus_ops as co

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    n_chars = np.where(ids < n // 2, 10, 1000).astype(np.int64)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids), "n_chars": pa.array(n_chars),
    }), tmp_path / "documents.parquet")
    got = co.doc_sample_weighted(str(tmp_path), n=100)
    heavy = (got["doc_id"].to_numpy() >= n // 2).sum()
    assert heavy >= 90   # E[heavy] ≈ 100·(100/101); uniform would give ~50


def test_session_overlap_match_sql_and_brute(ray_session, con):
    """Interval-overlap counts match the window-SQL oracle AND a brute
    O(n²) pair count (the oracle shares the rank identity with the Ray
    implementation, so only the brute check validates the identity:
    overlap = #starts<=end_i - #ends<start_i - 1)."""
    from neocrawler_ray.pipelines import analytics as an

    out = an.events_session_overlap(SF)
    assert_matches_sql(out, con, an.EVENTS_SESSION_OVERLAP_SQL)

    sess = an.events_sessions(SF).to_pandas()
    s = sess["start_us"].to_numpy("int64")
    e = sess["end_us"].to_numpy("int64")
    brute = ((s[None, :] <= e[:, None]) & (e[None, :] >= s[:, None])
             ).sum(axis=1) - 1
    truth = sess[["user_id", "session_no"]].copy()
    truth["overlap_cnt"] = brute.astype("int64")
    got = (out.to_pandas()
           .sort_values(["user_id", "session_no"]).reset_index(drop=True))
    want = (truth.sort_values(["user_id", "session_no"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["user_id", "session_no", "overlap_cnt"]].astype("int64"), want)


def test_session_overlap_single_bucket_edge(ray_session, con):
    """n_buckets=1 (no edges at all) must stay exact — everything rides
    the within-bucket searchsorted, the ladder is a single zero."""
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_session_overlap(SF, n_buckets=1), con,
                       an.EVENTS_SESSION_OVERLAP_SQL)


def test_late_arrivals_match_sql_and_sequential(ray_session, con):
    """Watermark classifier matches the window-SQL oracle AND a
    sequential replay of the streaming rule (the replay is the
    semantics; SQL and Ray share the prefix-max formulation)."""
    from neocrawler_ray.pipelines import analytics as an

    out = an.events_late_arrivals(SF)
    assert_matches_sql(out, con, an.EVENTS_LATE_ARRIVALS_SQL)

    got = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    # both classes must be populated or the op tests nothing
    assert 0.01 < got["is_late"].mean() < 0.9

    arr = con.execute(
        "SELECT event_id, epoch_us(ts) ts_us, epoch_us(ts) + "
        "CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 13))"
        f" AS BIGINT) % {an.LATE_JITTER_US} AS arrival_us FROM events "
        "ORDER BY arrival_us, event_id").fetchdf()
    wm = -1
    rows = []
    for eid, ts in zip(arr["event_id"].to_numpy("int64"),
                       arr["ts_us"].to_numpy("int64")):
        late = int(wm >= 0 and wm - ts > an.LATE_ALLOWED_US)
        wm = max(wm, ts)
        rows.append((eid, wm, late))
    seq = (pd.DataFrame(rows, columns=["event_id", "wm_us", "is_late"])
           .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["event_id", "wm_us", "is_late"]].astype("int64"), seq)


def test_late_arrivals_single_bucket(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_late_arrivals(SF, n_buckets=1), con,
                       an.EVENTS_LATE_ARRIVALS_SQL)


# --- global total-order sort (round 4 continuation 3) ----------------


def test_orders_global_sort_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.orders_global_sort(SF), con,
                       an.ORDERS_GLOBAL_SORT_SQL)


def test_orders_global_sort_two_buckets_and_contiguity(ray_session):
    """2 buckets force nearly every row's rn through a cross-bucket
    offset; rn must still be the exact permutation 1..n and ordering by
    rn must reproduce the lexicographic (price_e4, o_orderkey) order."""
    from neocrawler_ray.pipelines import analytics as an

    df = an.orders_global_sort(SF, n_buckets=2).to_pandas()
    n = len(df)
    assert sorted(df["rn"]) == list(range(1, n + 1))
    s = df.sort_values("rn").reset_index(drop=True)
    key = list(zip(s["price_e4"], s["o_orderkey"]))
    assert key == sorted(key)


def test_events_pair_window_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_pair_window(SF), con,
                       an.EVENTS_PAIR_WINDOW_SQL)


def test_events_pair_window_small_window_brute(ray_session, con):
    """A 10-minute window (different bucket grid, many more boundary
    crossings) must equal the brute-force SQL self-join."""
    from neocrawler_ray.pipelines import analytics as an

    w = 600_000_000
    sql = an.EVENTS_PAIR_WINDOW_SQL.replace(str(an.PAIR_WINDOW_US), str(w))
    assert_matches_sql(an.events_pair_window(SF, window_us=w), con, sql)


def test_orders_zorder_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.orders_zorder(SF), con, an.orders_zorder_sql())


def test_zorder_key_interleave_known_answers():
    from neocrawler_ray.pipelines import analytics as an

    x = np.array([0, 1, 0, 3, 0b101], dtype="int64")
    y = np.array([0, 0, 1, 3, 0b011], dtype="int64")
    # bit-by-bit reference: x on even positions, y on odd
    def ref(a, b):
        return sum((((a >> i) & 1) << (2 * i))
                   + (((b >> i) & 1) << (2 * i + 1)) for i in range(21))
    got = an.zorder_key(x, y)
    assert got.tolist() == [ref(a, b) for a, b in zip(x, y)]
    # locality: with y fixed, zkey is monotone in x (bit containment)
    xs = np.arange(64, dtype="int64")
    z = an.zorder_key(xs, np.zeros(64, dtype="int64"))
    assert (np.diff(z) > 0).all()


def test_events_value_outliers_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_value_outliers(SF), con,
                       an.EVENTS_VALUE_OUTLIERS_SQL)


def test_events_value_outliers_fences_consistent(ray_session):
    """Fences must equal a brute single-process PERCENTILE_CONT(25/75)
    computation: lo200 = 2q1 − 3(q3−q1), hi200 = 2q3 + 3(q3−q1)."""
    from neocrawler_ray.pipelines import analytics as an

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    out = an.events_value_outliers(SF)
    for _, r in out.iterrows():
        v = np.sort(np.floor(
            ev.loc[ev["event_type"] == r["event_type"], "value"]
            .to_numpy("float64") * 10000.0).astype("int64"))
        qx = {}
        for pct in (25, 75):
            pos = (len(v) - 1) * pct
            k, rem = pos // 100, pos % 100
            qx[pct] = int(v[k]) * (100 - rem) + int(v[k + 1 if rem else k]) * rem
        assert r["lo200"] == 2 * qx[25] - 3 * (qx[75] - qx[25])
        assert r["hi200"] == 2 * qx[75] + 3 * (qx[75] - qx[25])


def test_events_ab_chisq_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_ab_chisq(SF), con,
                       an.EVENTS_AB_CHISQ_SQL)


def test_events_ab_chisq_known_table(ray_session):
    """chi2 closed form on the emitted 2x2 table must reproduce the
    op's chi2_e6 (trunc toward zero), and cells must sum to the
    distinct-user count."""
    from neocrawler_ray.pipelines import analytics as an

    r = an.events_ab_chisq(SF).iloc[0]
    a, b, c, d = (int(r["a_conv"]), int(r["a_not"]),
                  int(r["b_conv"]), int(r["b_not"]))
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    assert a + b + c + d == ev["user_id"].nunique()
    n = a + b + c + d
    den = (a + b) * (c + d) * (a + c) * (b + d)
    num = n * (a * d - b * c) ** 2 * 1_000_000
    expect = 0 if den == 0 else (num // den if num >= 0 else -((-num) // den))
    assert int(r["chi2_e6"]) == expect


def test_events_daily_counts_incremental_matches_sql(ray_session, con,
                                                     tmp_path):
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_daily_counts_incremental(SF, workdir=str(tmp_path))
    assert_matches_sql(
        got, con,
        "SELECT strftime(ts, '%Y-%m-%d') AS date, event_type, "
        "count(*) AS n FROM events GROUP BY 1, 2")


def test_events_daily_counts_incremental_uses_checkpoint(ray_session,
                                                         tmp_path):
    """Prove the second run reads the checkpoint instead of rescanning
    the base: doctor the checkpoint with a sentinel row and observe it
    flow into the merged output."""
    import os

    from neocrawler_ray.pipelines import analytics as an

    wd = str(tmp_path)
    first = an.events_daily_counts_incremental(SF, workdir=wd)
    (ck,) = [f for f in os.listdir(wd) if f.startswith("base_")]
    path = os.path.join(wd, ck)
    doctored = pd.concat([pd.read_parquet(path), pd.DataFrame(
        {"date": ["1970-01-01"], "event_type": ["sentinel"],
         "n": [7]})], ignore_index=True)
    doctored.to_parquet(path)
    second = an.events_daily_counts_incremental(SF, workdir=wd)
    extra = second[second["event_type"] == "sentinel"]
    assert len(extra) == 1 and int(extra["n"].iloc[0]) == 7
    rest = (second[second["event_type"] != "sentinel"]
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(rest, first)


def test_events_time_weighted_avg_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_time_weighted_avg(SF), con,
                       an.EVENTS_TWA_SQL)


def test_events_time_weighted_avg_step_function(ray_session, tmp_path):
    """Hand-built stream: value 10 held for 3 s then value 40 for 1 s →
    twa = (10·3 + 40·1)/4 = 17.5; a zero-span user is excluded."""
    from neocrawler_ray.pipelines import analytics as an

    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 9, 9],
        "ts": pd.to_datetime([0, 3_000_000, 4_000_000, 5, 5], unit="us"),
        "event_type": ["a"] * 5,
        "value": [10.0, 40.0, 0.0, 1.0, 2.0],
        "props": [""] * 5,
    })
    ev.to_parquet(tmp_path / "events.parquet")
    got = an.events_time_weighted_avg(str(tmp_path))
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    got = got.sort_values("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == [7]
    assert got["twa_e4"].tolist() == [175000]  # 17.5 in e4
    assert got["span_us"].tolist() == [4_000_000]


def test_events_user_median_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_user_median(SF), con,
                       an.EVENTS_USER_MEDIAN_SQL)


def test_events_user_median_lower_convention(ray_session):
    """Even-count group picks the LOWER middle element, ties kept."""
    from neocrawler_ray.pipelines import analytics as an

    got = an.events_user_median(SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "value"])
    for _, r in got.iterrows():
        v = np.sort(np.floor(
            ev.loc[ev["user_id"] == r["user_id"], "value"]
            .to_numpy("float64") * 10000.0).astype("int64"))
        assert int(r["n"]) == len(v)
        assert int(r["median_e4"]) == int(v[(len(v) - 1) // 2])


def test_events_window_distinct_matches_sql(ray_session, con):
    from neocrawler_ray.pipelines import analytics as an

    assert_matches_sql(an.events_window_distinct(SF), con,
                       an.events_window_distinct_sql())


def test_events_window_distinct_bounds(ray_session):
    """Windowed distincts must be ≤ the window's row count and the
    per-window sum over types ≥ the window's global distinct count."""
    from neocrawler_ray.pipelines import analytics as an

    d = an.events_window_distinct(SF)
    c = an.events_tumbling_counts(SF)
    m = d.merge(c, on=["window_us", "event_type"])
    assert (m["n_users"] <= m["n_events"]).all()
    assert (m["n_users"] >= 1).all()


def test_session_ops_on_empty_tables(ray_session, tmp_path):
    """Zero-row inputs (schema preserved) must yield clean empty
    results — not schema-loss crashes — for every operator added in
    the fourth continuation; the IVM op's statistics prerequisite must
    fail with its documented message instead of an obscure one."""
    import pytest as _pt

    from neocrawler_ray.pipelines import analytics as an

    for t in ("events", "orders"):
        pd.read_parquet(f"{SF}/{t}.parquet").iloc[0:0].to_parquet(
            tmp_path / f"{t}.parquet")

    def as_df(x):
        return x.to_pandas() if hasattr(x, "to_pandas") else x

    d = str(tmp_path)
    assert len(as_df(an.orders_global_sort(d))) == 0
    assert len(as_df(an.events_pair_window(d))) == 0
    assert len(as_df(an.orders_zorder(d))) == 0
    assert len(as_df(an.events_value_outliers(d))) == 0
    assert len(as_df(an.events_time_weighted_avg(d))) == 0
    assert len(as_df(an.events_user_median(d))) == 0
    assert len(as_df(an.events_window_distinct(d))) == 0
    chs = as_df(an.events_ab_chisq(d))
    assert len(chs) == 1 and int(chs["chi2_e6"].iloc[0]) == 0
    with _pt.raises(ValueError, match="statistics|row groups"):
        an.events_daily_counts_incremental(d, workdir=str(tmp_path / "w"))


def test_multimodal_meta_null_text_matches_sql(ray_session, tmp_path):
    """A NULL-text document must agree with the oracle (COALESCE on the
    SQL side mirrors the Python fillna(''))."""
    import duckdb

    from neocrawler_ray.stages import multimodal as mm

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["abc", None, "defgh", None],
        "lang": ["en"] * 4, "source": ["s"] * 4,
        "n_chars": [3, 0, 5, 0]})
    docs.to_parquet(tmp_path / "documents.parquet")
    got = mm.multimodal_decode_meta(str(tmp_path))
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"'{tmp_path}/documents.parquet'")
    exp = c.execute(mm.MULTIMODAL_META_SQL).fetchdf()
    a = got.sort_values("media_id").reset_index(drop=True)
    b = (exp[a.columns].sort_values("media_id").reset_index(drop=True)
         .astype({col: a[col].dtype for col in a.columns}))
    pd.testing.assert_frame_equal(a, b)
    assert int(a.loc[a["media_id"] == 1, "n_bytes"].iloc[0]) == 0
