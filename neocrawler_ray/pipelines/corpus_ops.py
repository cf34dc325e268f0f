"""Ray Data pipelines for the training-data corpus operators.

Every function takes an ``sf_dir`` (a testdata directory holding
``documents.parquet`` / ``embeddings.parquet``) and returns a Dataset or
a small pandas DataFrame.  Design rules applied throughout (SURVEY.md
§4 scale notes):

- reads prune columns (``columns=[...]``) — a stats scan never loads
  more than (id, text);
- shuffles move digests/signatures/ids, never document bodies;
- per-batch work is vectorized (pandas str kernels / numpy matmuls);
- small sides (query matrices, candidate-id sets) are broadcast, not
  shuffled;
- final reduces operate on data proportional to the *answer*, not the
  corpus.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions import dedup as dd
from ..functions import similarity as sim
from ..functions import text_stats as ts


def _read(sf_dir: str, table: str, columns: list[str],
          rows_per_block: int = 50_000):
    """Column-pruned read with a row-aware block count.

    Ray's default splits any file into ~2×CPU blocks; for small dimension
    tables that floods downstream groupbys with per-block overhead.  One
    block per ``rows_per_block`` rows (min 1) keeps map parallelism where
    the data is and makes shuffles on small tables near-free; huge inputs
    still fan out wide (the count comes from parquet metadata, not a
    scan).  CPU-heavy per-row stages (minhash, sketching, DOM parsing)
    pass a small ``rows_per_block`` so they still use every core.
    Tables resolve through :mod:`..sources.tables`, so a ``{table}/``
    directory of part files works the same as one file."""
    from ..sources.tables import read_table

    return read_table(sf_dir, table, columns, rows_per_block)


def _hash_grouped(ds, key_cols: list[str], agg_fn, num_parts: int = 64):
    """High-cardinality distributed groupby.

    Ray's built-in ``groupby().agg`` runs a python-level reduce per
    distinct key (~600 rows/s at 5k keys — measured via ``ds.stats()``);
    for key counts ≫ cluster width that is the bottleneck.  Instead:
    coarse hash-partition on the key (same key → same partition, so
    semantics are exact), then one *vectorized pandas* groupby inside
    each of ``num_parts`` partitions.  The exchange volume is identical;
    the reduce is a C-speed kernel.  ``agg_fn(df) -> df`` must be a
    per-partition-complete aggregation."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        # one C-speed siphash kernel over the combined key column — every
        # dedup/window exchange funnels through this, so no per-row
        # Python (semantics only need "same key → same partition"; the
        # hash family itself is free to differ from the old crc32)
        key = df[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            key = key + "\x1f" + df[c].astype(str)
        df = df.copy()
        h = pd.util.hash_array(key.to_numpy(dtype=object), categorize=False)
        df["part"] = (h % num_parts).astype("int64")
        return df

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return agg_fn(df.drop(columns=["part"]))

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )



def _parts_for(sf_dir: str, table: str, rows_per_part: int = 2000,
               lo: int = 16, hi: int = 64) -> int:
    """Shuffle partition count sized to the table: ~1 partition per
    ``rows_per_part`` rows, clamped to [lo, hi].  64 partitions over a
    40k-row exchange is pure sort-task overhead (measured as the
    variance driver of the dedup ops on this VM); at corpus scale the
    cap rises with cluster width."""
    from ..sources.tables import table_rows

    return max(lo, min(hi, table_rows(sf_dir, table) // rows_per_part))


def _bucketed_pairs(ds, bucket_col: str, bucket_pairs, num_parts: int = 64):
    """Coarse-partitioned LSH-bucket pair generation.

    Shuffle by a ~``num_parts`` hash of the bucket key — one Ray group
    per raw bucket means tens of thousands of tiny groups whose
    per-group overhead dwarfs the work — then walk the buckets inside
    each partition with a vectorized pandas groupby.  Same exchange
    volume, partition-level compute.  ``bucket_pairs(df) -> df`` runs
    per bucket (only buckets with ≥2 members) and also defines the
    empty-output schema via ``bucket_pairs(df.iloc[0:0])``."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        col = df[bucket_col]
        if str(col.dtype).startswith(("int", "uint")):
            part = (col.astype("int64") % num_parts)
        else:
            h = pd.util.hash_array(
                col.astype(str).to_numpy(dtype=object), categorize=False)
            part = pd.Series(h % num_parts, index=df.index)
        df["part"] = part.astype("int64")
        return df

    def partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = [
            bucket_pairs(g) for _, g in df.groupby(bucket_col, sort=True)
            if len(g) > 1
        ]
        if not outs:
            return bucket_pairs(df.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    ds = ds.map_batches(add_part, batch_format="pandas")
    return ds.groupby("part").map_groups(partition_pairs, batch_format="pandas")


# --- text analysis ----------------------------------------------------


def doc_text_stats(sf_dir: str):
    """Exact token/char/punct/stopword counts + integer quality gate."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = ts.text_stats_frame(df["text"])
        out.insert(0, "doc_id", df["doc_id"].astype("int64").to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")


def doc_lang_id(sf_dir: str):
    """Marker-word language ID (SQL-mirrorable argmax)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64").to_numpy(),
             "lang_pred": ts.lang_id_markers(df["text"]).to_numpy(dtype=object)}
        )

    return ds.map_batches(fn, batch_format="pandas")


def doc_fingerprint(sf_dir: str):
    """Content fingerprint (simplefp) per document.

    Reference parity: the md5-of-alnum-content near-dup key of
    reference README.md:575-576 / instance/wiki/spider_extend.js:109-160.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64").to_numpy(),
             "fp": ts.simplefp(df["text"]).to_numpy(dtype=object)}
        )

    return ds.map_batches(fn, batch_format="pandas")


TERM_DF_TOP_K = 100


def doc_term_df(sf_dir: str, k: int = TERM_DF_TOP_K) -> pd.DataFrame:
    """Corpus document-frequency table: the top-``k`` terms by number of
    documents containing them — the IDF half of TF-IDF and the standard
    vocabulary/stopword report for a training corpus.

    Scale shape: per batch, each document collapses to its UNIQUE terms
    (one `str.split` + explode + drop_duplicates — the exchange carries
    one row per (doc, term), bounded by vocabulary growth, never by term
    occurrences), then per-batch partial df counts shrink that to one
    row per (term, block); a term-hash partition sums exactly; each
    partition emits only its own top-``k`` candidates (a global top-k
    winner must win its partition) and the driver reduces ≤ k × parts
    rows.  Ties break lexicographically for determinism."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # astype("string").fillna("") — astype(str) would render a NULL
        # text as the literal term 'nan' (oracle: string_split(NULL) → ∅)
        s = (df["text"].astype("string").fillna("")
             .astype(str).str.split(" ").explode())
        pairs = pd.DataFrame(
            {"doc_id": df["doc_id"].reindex(s.index).astype("int64"),
             "term": s})
        pairs = pairs[pairs["term"] != ""].drop_duplicates()
        out = pairs.groupby("term", as_index=False).size()
        return pd.DataFrame({"term": out["term"].astype(str),
                             "df": out["size"].astype("int64")})

    def topk_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", as_index=False)["df"].sum()
        g = g.sort_values(["df", "term"], ascending=[False, True],
                          kind="mergesort").head(k)
        g["df"] = g["df"].astype("int64")
        return g

    cands = _hash_grouped(ds.map_batches(partial, batch_format="pandas"),
                          ["term"], topk_part, num_parts=32).to_pandas()
    out = (cands.sort_values(["df", "term"], ascending=[False, True],
                             kind="mergesort").head(k)
           .reset_index(drop=True))
    out["df"] = out["df"].astype("int64")
    return out


def doc_term_df_sql(k: int = TERM_DF_TOP_K) -> str:
    return f"""
WITH u AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents)
SELECT term, CAST(count(*) AS BIGINT) AS df
FROM u WHERE term <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {k}
""".strip()


HH_DENOM = 30


def doc_term_heavy_hitters(sf_dir: str, denom: int = HH_DENOM) -> pd.DataFrame:
    """EXACT φ-heavy-hitters over corpus token instances: every term
    whose occurrence count exceeds ``1/denom`` of all token instances —
    the stopword/boilerplate detector for a training corpus, and the
    third member of the sketch family (HLL, t-digest, heavy hitters).

    Scale shape — two passes, ZERO shuffles:

    - pass 1 emits each block's LOCAL heavy hitters (``count_b · denom
      > |block|``).  Pigeonhole guarantee: a term with global count ·
      denom > n must exceed the threshold in at least one block (if it
      trailed in every block, summing gives count · denom ≤ n) — so
      the union of local candidates is a SUPERSET of the true answer,
      ≤ denom candidates per block, collected once on the driver.
      (Per-block counts are exact ``value_counts`` here; a block whose
      own vocabulary outgrew memory would swap in a streaming
      Misra–Gries summary with the same guarantee.)
    - pass 2 broadcasts the candidate set once via ``ray.put`` and
      re-counts ONLY candidates per block (plus each block's instance
      total under a sentinel key) — partials are candidate-sized, the
      driver reduce is answer-sized, and the integer threshold
      ``count · denom > n`` is decided exactly, no float ratio.
    """
    import numpy as np
    import ray

    ds = _read(sf_dir, "documents", ["text"])

    def _tokens(df: pd.DataFrame) -> pd.Series:
        s = (df["text"].astype("string").fillna("")
             .astype(str).str.split(" ").explode())
        return s[s != ""]

    def cand_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = _tokens(df)
        vc = s.value_counts(sort=False)
        keep = vc.index[vc.to_numpy(dtype="int64") * denom > len(s)]
        return pd.DataFrame({"term": pd.Series(keep, dtype=object)
                             .astype(str)})

    cands = np.unique(
        ds.map_batches(cand_partial, batch_format="pandas")
        .to_pandas()["term"].to_numpy(dtype=object))
    cand_ref = ray.put(cands)

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(cand_ref)  # zero-copy view of the shared array
        s = _tokens(df)
        vc = s.value_counts(sort=False)
        m = vc.index.isin(cs)
        # "" is unreachable as a term (empties filtered) — it carries
        # each block's instance total through the same partial stream
        return pd.DataFrame(
            {"term": np.concatenate((vc.index[m].to_numpy(dtype=object),
                                     np.array([""], dtype=object))),
             "c": np.concatenate((vc.to_numpy(dtype="int64")[m],
                                  np.array([len(s)], dtype="int64")))})

    part = (ds.map_batches(recount, batch_format="pandas").to_pandas()
            .groupby("term", as_index=False)["c"].sum())
    n_total = int(part.loc[part["term"] == "", "c"].sum())
    out = part[(part["term"] != "")
               & (part["c"].to_numpy(dtype="int64") * denom > n_total)]
    out = out.rename(columns={"c": "n_occ"}).sort_values("term")
    out["n_occ"] = out["n_occ"].astype("int64")
    return out.reset_index(drop=True)


def doc_term_heavy_hitters_sql(denom: int = HH_DENOM) -> str:
    return f"""
WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
 nz AS (SELECT term FROM t WHERE term <> ''),
 tot AS (SELECT count(*) AS n FROM nz)
SELECT term, CAST(count(*) AS BIGINT) AS n_occ
FROM nz, tot GROUP BY term, tot.n HAVING count(*) * {denom} > tot.n
ORDER BY term
""".strip()


BIGRAM_TOP_K = 100


def doc_bigram_counts(sf_dir: str, k: int = BIGRAM_TOP_K) -> pd.DataFrame:
    """N-gram language-model count table: the top-``k`` corpus bigrams
    by OCCURRENCE count (not document frequency) — the building block
    of count-based LM statistics, contamination probes, and boilerplate
    detection over a training corpus.

    Scale shape (mirrors :func:`doc_term_df`): per batch, one explode →
    drop empty tokens → vectorized adjacent-pair join within each doc →
    ``value_counts`` partial, so the exchange carries one row per
    (bigram, block) — bounded by bigram-vocabulary growth, never corpus
    tokens; a bigram-hash partition sums exactly; each partition emits
    only its own top-``k`` candidates (a global winner must win its
    partition) and the driver reduces ≤ k × parts rows.  Ties break
    lexicographically for determinism."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # astype("string").fillna("") — see doc_term_df (NULL → no tokens)
        s = (df["text"].astype("string").fillna("")
             .astype(str).str.split(" ").explode())
        s = s[s != ""]
        vals = s.to_numpy(dtype=object)
        idx = s.index.to_numpy()
        if len(vals) < 2:
            return pd.DataFrame({"bigram": pd.Series([], dtype=str),
                                 "c": pd.Series([], dtype="int64")})
        same_doc = idx[:-1] == idx[1:]
        left = pd.Series(vals[:-1][same_doc])
        big = left.str.cat(pd.Series(vals[1:][same_doc]), sep=" ")
        vc = big.value_counts(sort=False)
        return pd.DataFrame({"bigram": vc.index.astype(str),
                             "c": vc.to_numpy(dtype="int64")})

    def topk_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bigram", as_index=False)["c"].sum()
        g = g.sort_values(["c", "bigram"], ascending=[False, True],
                          kind="mergesort").head(k)
        g["c"] = g["c"].astype("int64")
        return g

    cands = _hash_grouped(ds.map_batches(partial, batch_format="pandas"),
                          ["bigram"], topk_part, num_parts=32).to_pandas()
    out = (cands.sort_values(["c", "bigram"], ascending=[False, True],
                             kind="mergesort").head(k)
           .reset_index(drop=True)
           .rename(columns={"c": "n"}))
    out["n"] = out["n"].astype("int64")
    return out[["bigram", "n"]]


def doc_bigram_counts_sql(k: int = BIGRAM_TOP_K) -> str:
    return f"""
WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ts
           FROM documents),
 b AS (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM t)
SELECT ts[i] || ' ' || ts[i + 1] AS bigram, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY 1 ORDER BY n DESC, bigram LIMIT {k}
""".strip()


CHUNK_WINDOW = 128   # tokens per training window
CHUNK_STRIDE = 96    # window - overlap (32-token overlap)


def doc_chunks(sf_dir: str):
    """Split documents into overlapping training windows (token-count
    based): window=128 tokens, stride=96.  Emits one row per chunk —
    (doc_id, chunk_idx, chunk_tokens) — fully vectorized per batch
    (token counts via the shared C-regex, chunk expansion via
    np.repeat/arange), and exactly mirrored by a DuckDB
    generate_series oracle.  At 100 TB this is a pure map stage: no
    shuffle, output ∝ corpus × (1/stride)."""
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["text"].astype("string").fillna("")
             .str.count(ts.TOKEN_PATTERN).to_numpy("int64"))
        ids = df["doc_id"].to_numpy("int64")
        n_chunks = np.where(
            n <= CHUNK_WINDOW, 1,
            1 + np.ceil((n - CHUNK_WINDOW) / CHUNK_STRIDE).astype("int64"))
        total = int(n_chunks.sum())
        rep_ids = np.repeat(ids, n_chunks)
        rep_n = np.repeat(n, n_chunks)
        # per-doc 0..n_chunks-1 via global arange minus repeated offsets
        offsets = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        chunk_idx = np.arange(total, dtype="int64") - offsets
        chunk_tokens = np.minimum(
            CHUNK_WINDOW, rep_n - chunk_idx * CHUNK_STRIDE)
        return pd.DataFrame(
            {"doc_id": pd.Series(rep_ids, dtype="int64"),
             "chunk_idx": pd.Series(chunk_idx, dtype="int64"),
             "chunk_tokens": pd.Series(chunk_tokens, dtype="int64")})

    return ds.map_batches(fn, batch_format="pandas")


DOC_CHUNKS_SQL = """
WITH stats AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{tok}')) AS BIGINT) AS n
  FROM documents),
expanded AS (
  SELECT doc_id, n,
         unnest(generate_series(0,
             CASE WHEN n <= {win} THEN 0
                  ELSE CAST(ceil((n - {win}) / {stride}.0) AS BIGINT) END
         )) AS g
  FROM stats)
SELECT doc_id,
       CAST(g AS BIGINT) AS chunk_idx,
       CAST(LEAST({win}, n - g * {stride}) AS BIGINT) AS chunk_tokens
FROM expanded
""".strip()


def doc_chunks_sql() -> str:
    return DOC_CHUNKS_SQL.format(
        tok=ts.TOKEN_PATTERN, win=CHUNK_WINDOW, stride=CHUNK_STRIDE)


def corpus_clean(sf_dir: str, min_tokens: int | None = None):
    """End-to-end training-data cleaning: quality gate → exact dedup.

    The composed flagship shape of the LLM-data layer — one streaming
    pipeline: read (id, text) → vectorized quality stats + content
    digest per batch → drop low-quality rows → hash-partitioned
    keep-one (min doc_id per digest).  The shuffle carries only
    (digest, id, n_tokens); text never leaves the scan stage.  Returns
    surviving (doc_id, n_tokens) — exact ints, SQL-mirrorable.

    ``min_tokens`` swaps the prose-prior gate (stopword/punct ratios —
    wrong for navigational crawl text) for a plain length floor; the
    default keeps the oracle-checked behavior."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        stats = ts.text_stats_frame(df["text"])
        out = pd.DataFrame(
            {"text_md5": dd.md5_hex_series(df["text"]).astype(object),
             "doc_id": df["doc_id"].astype("int64").to_numpy(),
             "n_tokens": stats["n_tokens"].to_numpy()}
        )
        ok = (stats["n_tokens"].to_numpy() >= min_tokens
              if min_tokens is not None
              else stats["quality_ok"].to_numpy())
        return out[ok].reset_index(drop=True)

    ds = ds.map_batches(gate, batch_format="pandas")

    def keep_one(df: pd.DataFrame) -> pd.DataFrame:
        first = (df.sort_values(["text_md5", "doc_id"])
                 .groupby("text_md5", as_index=False).first())
        return first[["doc_id", "n_tokens"]].astype(
            {"doc_id": "int64", "n_tokens": "int64"})

    return _hash_grouped(ds, ["text_md5"], keep_one,
                         num_parts=_parts_for(sf_dir, "documents"))


SPLIT_BOUNDS = (80, 90)  # train < 80 ≤ val < 90 ≤ test, buckets 0-99


def doc_split(sf_dir: str):
    """Deterministic train/val/test assignment (80/10/10): bucket =
    avalanche of the first three md5(doc_id) hex chars, so membership is
    pseudorandom, stable across runs/cluster sizes, and joinable from
    any other table — the standard hash-split for training corpora.
    Pure map stage: no shuffle, no state.  The char-combine form (not
    hex→int) exists so the SAME expression runs in ANSI SQL (ascii +
    substr) for the oracle."""
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        h = dd.md5_hex_series(ids.astype(str))
        # U3 → three unicode codepoints per row, no Python char loop
        c = np.array(h.to_numpy(), dtype="U3").view(np.uint32).reshape(-1, 3)
        c = c.astype("int64")
        bucket = ((c[:, 0] * 131 + c[:, 1]) * 131 + c[:, 2]) % 100
        split = np.select(
            [bucket < SPLIT_BOUNDS[0], bucket < SPLIT_BOUNDS[1]],
            ["train", "val"], default="test")
        return pd.DataFrame(
            {"doc_id": ids.to_numpy(),
             "bucket": bucket.astype("int64"),
             "split": pd.Series(split, dtype=object)})

    return ds.map_batches(fn, batch_format="pandas")


def doc_split_sql() -> str:
    lo, hi = SPLIT_BOUNDS
    return f"""
SELECT doc_id, b AS bucket,
       CASE WHEN b < {lo} THEN 'train'
            WHEN b < {hi} THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id,
             ((ascii(substr(h,1,1))*131 + ascii(substr(h,2,1)))*131
              + ascii(substr(h,3,1))) % 100 AS b
      FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) h FROM documents))
""".strip()


# --- dedup ------------------------------------------------------------


def dedup_exact(sf_dir: str):
    """Exact dedup: md5(text) → min(doc_id) survivor per content key.

    Per-batch combiner first (local min per digest), then the global
    groupby reduces combiner rows — classic partial aggregation so the
    all-to-all carries one row per distinct digest per block.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(dd.exact_dedup_batch, batch_format="pandas")
    return _hash_grouped(
        ds, ["text_md5"],
        lambda df: df.groupby("text_md5", as_index=False, sort=True)["doc_id"]
        .min().astype({"doc_id": "int64"}),
        num_parts=_parts_for(sf_dir, "documents"),
    )


def dedup_minhash_pairs(sf_dir: str, threshold: float = 0.7,
                        collapse: bool = True):
    """MinHash+LSH near-dup candidate pairs with estimated Jaccard.

    shingle → 128-perm signature → 16 band keys (map_batches, ~1 KB/doc
    emitted) → groupby(band_key) → per-bucket pair generation → global
    pair dedup (a pair found in several bands collapses to one row).

    ``collapse=False`` skips the final pair-dedup exchange and returns
    the raw per-band pairs (a pair may appear once per agreeing band) —
    for consumers that group by pair downstream anyway
    (:func:`dedup_minhash_verified`), saving one all-to-all round.
    """
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)
    ds = ds.map_batches(dd.minhash_batch, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # Unique-signature walk (same shape as the simhash pair stage):
        # dup-heavy buckets repeat identical signatures, so the pairwise
        # agreement matrix runs over UNIQUE signatures (u ≪ m) and
        # identical-signature groups expand to est=1.0 pairs by pure
        # gathers — per-bucket work is O(u²·P/chunk + |output|), with no
        # per-pair python loop.
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"),
             "doc_b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")})
        m = len(df)
        if m < 2:
            return empty
        ids_all = df["doc_id"].to_numpy(dtype="int64")
        order0 = np.argsort(ids_all)
        ids_all = ids_all[order0]
        sig_mat = np.frombuffer(
            b"".join(df["sig"].iloc[order0].tolist()), dtype=np.uint64
        ).reshape(m, dd.MINHASH_PERMS)
        uh, inv = np.unique(sig_mat, axis=0, return_inverse=True)
        inv = np.asarray(inv).ravel()  # numpy 2.0.x returns (m,1) for axis!=None
        u = len(uh)
        order = np.argsort(inv, kind="stable")  # ids stay ascending per group
        sids, sinv = ids_all[order], inv[order]
        starts = np.searchsorted(sinv, np.arange(u))
        ends = np.append(starts[1:], m)
        sizes = ends - starts
        out_a, out_b, out_e = [], [], []
        for g in np.nonzero(sizes > 1)[0]:
            gi = sids[starts[g]:ends[g]]
            ii, jj = np.triu_indices(len(gi), k=1)
            keep = gi[ii] != gi[jj]
            out_a.append(gi[ii][keep])
            out_b.append(gi[jj][keep])
            out_e.append(np.ones(int(keep.sum()), dtype=np.float64))
        for lo in range(0, u, 256):
            hi = min(lo + 256, u)
            est = (uh[lo:hi, None, :] == uh[None, :, :]).mean(axis=2)
            cand = (est >= threshold) & (
                np.arange(lo, hi)[:, None] < np.arange(u)[None, :])
            ii, jj = np.nonzero(cand)
            if len(ii) == 0:
                continue
            gi = ii + lo
            both1 = (sizes[gi] == 1) & (sizes[jj] == 1)
            if both1.any():
                a = sids[starts[gi[both1]]]
                b = sids[starts[jj[both1]]]
                keep = a != b
                out_a.append(np.minimum(a, b)[keep])
                out_b.append(np.maximum(a, b)[keep])
                out_e.append(est[ii[both1], jj[both1]][keep])
            for t in np.nonzero(~both1)[0]:
                a = sids[starts[gi[t]]:ends[gi[t]]]
                b = sids[starts[jj[t]]:ends[jj[t]]]
                aa = np.repeat(a, len(b))
                bb = np.tile(b, len(a))
                keep = aa != bb
                out_a.append(np.minimum(aa, bb)[keep])
                out_b.append(np.maximum(aa, bb)[keep])
                out_e.append(
                    np.full(int(keep.sum()), est[ii[t], jj[t]],
                            dtype=np.float64))
        if not out_a:
            return empty
        return pd.DataFrame(
            {"doc_a": pd.Series(np.concatenate(out_a), dtype="int64"),
             "doc_b": pd.Series(np.concatenate(out_b), dtype="int64"),
             "est_jaccard": pd.Series(np.concatenate(out_e),
                                      dtype="float64")}
        )

    parts = _parts_for(sf_dir, "documents")
    pairs = _bucketed_pairs(ds, "band_key", bucket_pairs, num_parts=parts)
    if not collapse:
        # cheap local dedup only (same pair from two bands usually sits
        # in different partitions; the consumer's pair-group dedupes)
        return pairs.map_batches(
            lambda df: df.drop_duplicates(["doc_a", "doc_b"]),
            batch_format="pandas")
    # same pair surfaces once per agreeing band → collapse
    return _hash_grouped(
        pairs, ["doc_a", "doc_b"],
        lambda df: df.groupby(["doc_a", "doc_b"], as_index=False, sort=True)
        ["est_jaccard"].max(),
        num_parts=parts,
    )


def _attach_pair_payloads(cands, payloads, payload_type,
                          num_parts: int):
    """Candidate-pair × per-doc payload co-grouped join — the shared
    machinery of every verify-stage near-dup op (minhash verify, edit
    distance, prefix join):

    1. explode each (doc_a, doc_b) candidate into two
       (doc_id, pair_key, side) rows;
    2. union with the per-doc payload rows and hash-partition by
       doc_id; inside each partition dedupe pair sides (a pair found by
       k bands / k shingle partitions arrives k times — dedupe BEFORE
       attaching so the pair_key exchange never ships a payload k
       times) and forward each side's payload by sorted binary search
       (no per-partition Python dict — the round-2 fetch-index shape).

    ``cands``: Dataset with int64 columns doc_a, doc_b.
    ``payloads``: Dataset with columns (doc_id int64,
    payload ``payload_type``) — one row per doc, payload computed AT
    THE SCAN so nothing re-tokenizes downstream.
    Returns Dataset[(pair_key, side, payload)] ready for a
    pair_key-keyed verify (callers still drop_duplicates per side:
    a pair's copies may arrive via several upstream partitions)."""
    empty_payload = b"" if payload_type == pa.binary() else ""
    union_schema = pa.schema(
        [("doc_id", pa.int64()), ("pair_key", pa.string()),
         ("side", pa.int64()), ("payload", payload_type)])
    attach_schema = pa.schema(
        [("pair_key", pa.string()), ("side", pa.int64()),
         ("payload", payload_type)])
    as_bytes = payload_type == pa.binary()

    def explode(df: pd.DataFrame) -> pa.Table:
        pk = (df["doc_a"].astype(str) + ":"
              + df["doc_b"].astype(str)).tolist()
        return pa.Table.from_pydict(
            {"doc_id": df["doc_a"].astype("int64").tolist()
             + df["doc_b"].astype("int64").tolist(),
             "pair_key": pk + pk,
             "side": [0] * len(df) + [1] * len(df),
             "payload": [empty_payload] * (2 * len(df))},
            schema=union_schema)

    def payload_rows(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pydict(
            {"doc_id": df["doc_id"].astype("int64").tolist(),
             "pair_key": [""] * len(df),
             "side": [-1] * len(df),
             "payload": df["payload"].tolist()},
            schema=union_schema)

    unioned = (cands.map_batches(explode, batch_format="pandas")
               .union(payloads.map_batches(payload_rows,
                                           batch_format="pandas")))

    def attach(df: pd.DataFrame) -> pa.Table:
        import numpy as np

        pr = df[df["side"] >= 0]
        if pr.empty:
            return attach_schema.empty_table()
        pr = pr.drop_duplicates(["pair_key", "side"])
        sh = df[df["side"] < 0]
        sh_ids = sh["doc_id"].to_numpy(dtype="int64")
        order = np.argsort(sh_ids, kind="stable")
        sh_ids = sh_ids[order]
        sh_pay = sh["payload"].to_numpy()[order]
        q = pr["doc_id"].to_numpy(dtype="int64")
        pos = np.searchsorted(sh_ids, q)
        ok = pos < len(sh_ids)
        ok[ok] = sh_ids[pos[ok]] == q[ok]
        if as_bytes:
            att = [bytes(sh_pay[p]) if o else b""
                   for p, o in zip(pos, ok)]
        else:
            att = [str(sh_pay[p]) if o else ""
                   for p, o in zip(pos, ok)]
        return pa.Table.from_pydict(
            {"pair_key": pr["pair_key"].tolist(),
             "side": pr["side"].tolist(),
             "payload": att},
            schema=attach_schema)

    return _hash_grouped(unioned, ["doc_id"], attach,
                         num_parts=num_parts)


def dedup_minhash_verified(sf_dir: str, lsh_threshold: float = 0.7,
                           jaccard_threshold: float = 0.8) -> pd.DataFrame:
    """LSH candidates verified with exact n-gram Jaccard — DISTRIBUTED.

    Dup-heavy web corpora make the candidate set O(corpus), so nothing
    here may land on the driver until the final (answer-sized) frame.
    Shape: a co-grouped join with no broadcast and no driver loop —

    1. explode each candidate pair into two (doc_id, pair_key, side)
       rows;
    2. union with the corpus rows, whose payload is the SORTED UNIQUE
       shingle-hash set computed AT THE SCAN (uint64 bytes — text never
       enters the exchange, and nothing re-shingles downstream; this
       recovered the round-2 2× cost regression), and hash-partition by
       doc_id; inside each partition forward payloads to the pair-side
       rows (co-located semi-join);
    3. hash-partition the (pair_key, side, shingle-set) rows by pair_key
       and compute exact set Jaccard per pair inside ``map_groups``.

    The Jaccard is over blake2b-64 shingle hashes — identical to
    ``ngram_jaccard`` barring a 64-bit collision.  Returns a pandas
    frame (doc_a, doc_b, jaccard) ∝ the answer."""
    import numpy as np

    # uncollapsed band pairs: verify's pair-key group dedupes them, so
    # the LSH stage's pair-collapse all-to-all round is pure overhead
    # here (round-3 advice: the op's cost was exchange-count-bound)
    cands = dedup_minhash_pairs(sf_dir, lsh_threshold, collapse=False)

    # small blocks: shingle-hashing is the verify path's CPU stage —
    # the default row-aware block count gives ONE task at small sf
    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=256)

    def shingle_rows(df: pd.DataFrame) -> pa.Table:
        # shingle-hash at the scan: the corpus side of the exchange
        # carries sorted uint64 hash sets, computed once, in parallel,
        # where the text already is
        return pa.Table.from_pydict(
            {"doc_id": df["doc_id"].astype("int64").tolist(),
             "payload": [dd.shingle_hashes(str(t)).tobytes()
                         for t in df["text"].fillna("")]},
            schema=pa.schema([("doc_id", pa.int64()),
                              ("payload", pa.binary())]))

    # verify exchanges move (doc_id → payload) rows + candidate-volume
    # pair rows — far fewer than corpus shingle rows, so size the
    # all-to-all to that, not to corpus row count (the shingle CPU runs
    # before the exchange, parallel by block count)
    parts = _parts_for(sf_dir, "documents", rows_per_part=600, lo=8)
    co_located = _attach_pair_payloads(
        cands, docs.map_batches(shingle_rows, batch_format="pandas"),
        pa.binary(), num_parts=parts)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # a pair found by k bands carries k duplicate rows per side
        # (collapse=False upstream) — first row per side wins
        df = df.drop_duplicates(["pair_key", "side"])
        out_a, out_b, out_j = [], [], []
        for pk, g in df.groupby("pair_key", sort=False):
            if len(g) < 2:
                continue
            blobs = g.sort_values("side")["payload"].tolist()
            sa = np.frombuffer(blobs[0], dtype=np.uint64)
            sb = np.frombuffer(blobs[1], dtype=np.uint64)
            # payloads are sorted unique sets by construction
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac = (inter / union) if union else 1.0
            if jac >= jaccard_threshold:
                a, b = pk.split(":")
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(jac)
        return pd.DataFrame(
            {"doc_a": pd.Series(out_a, dtype="int64"),
             "doc_b": pd.Series(out_b, dtype="int64"),
             "jaccard": pd.Series(out_j, dtype="float64")})

    out = _hash_grouped(co_located, ["pair_key"], verify,
                        num_parts=parts).to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    return (out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
            [["doc_a", "doc_b", "jaccard"]])


def _ngram_hot_shingles(sf_dir: str, df_block: int,
                        sample_mod: int) -> dict[int, int]:
    """Sampled document-frequency prepass for the hot-shingle guard.

    Reads 1-in-``sample_mod`` docs (deterministic multiplicative hash of
    doc_id) and counts shingle occurrences; a shingle whose *estimated*
    df (= sample count × mod) exceeds ``df_block`` is "hot" and gets its
    postings split into ``nb = ceil(est_df / df_block)`` blocks by the
    router.  Correctness does NOT depend on the estimate: every posting
    consults the same broadcast map, so block membership is globally
    consistent — a missed borderline shingle just stays unsplit (old
    behavior, ≤ ~few×df_block² task work), an over-split one only adds
    routing copies.  Miss-probability bound (property-tested at the
    boundary in test_hot_shingle_guard_boundary_property): a miss needs
    sample count ≤ df_block/mod, so for df ≥ 2·df_block Chernoff gives
    P[miss] ≤ exp(−(df − df_block)²/(2·df·mod)) ≤ exp(−df/(8·mod)) —
    and a shingle that CAN be missed with non-vanishing probability has
    df ≤ ~2·df_block, whose unsplit single-task emission df²/2 ≤
    2·df_block² is within the guard's design bound anyway.  (For
    contiguous doc_id ranges the multiplicative-hash sample is
    near-equidistributed, making even boundary misses rare in
    practice.)  Cost: one extra pass over
    the text column with 1/mod of the shingle CPU and a (distinct-
    sampled-shingle, count) exchange — the price of bounding the
    pair-stage's per-task work at scale."""
    import numpy as np

    gold = np.uint64(0x9E3779B97F4A7C15)
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=512)

    def sample_counts(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype="int64").astype(np.uint64)
        with np.errstate(over="ignore"):
            keep = ((ids * gold) >> np.uint64(33)) % np.uint64(
                sample_mod) == 0
        sub = df[keep]
        sets = [dd.shingle_hashes(str(t)) for t in sub["text"].fillna("")]
        all_sh = (np.concatenate(sets) if sets
                  else np.empty(0, dtype=np.uint64))
        uh, c = np.unique(all_sh, return_counts=True)
        return pd.DataFrame({"shingle": uh, "c": c.astype("int64")})

    counts = ds.map_batches(sample_counts, batch_format="pandas")

    def reduce_hot(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("shingle", as_index=False)["c"].sum()
        return g[g["c"] * sample_mod > df_block].astype({"c": "int64"})

    hot = _hash_grouped(counts, ["shingle"], reduce_hot,
                        num_parts=8).to_pandas()
    if hot.empty:
        return {}
    nb = np.minimum(
        np.ceil(hot["c"].to_numpy(dtype="float64") * sample_mod / df_block),
        65535).astype("int64")
    return dict(zip(
        (int(s) for s in hot["shingle"].to_numpy(dtype=np.uint64)),
        (int(x) for x in nb)))


def dedup_ngram_pairs(sf_dir: str, threshold_num: int = 1,
                      threshold_den: int = 2, df_block: int | None = 1024,
                      df_sample_mod: int = 50):
    """EXACT all-pairs n-gram Jaccard ≥ threshold via a distributed
    shingle inverted-index join (no LSH, no candidates missed).

    The classic exact set-similarity shape (generalizes the reference's
    exact content-dedup key, README.md:575-576, to graded overlap):

    1. scan → per doc the SORTED UNIQUE 3-word-shingle hash set; emit
       one (shingle, doc_id, set_size) row per shingle — text never
       enters an exchange, and set_size rides each row so union sizes
       need no broadcast/second join;
    2. hash-partition by shingle; inside each partition emit the
       co-occurring (doc_a, doc_b, sa, sb) pairs per shingle group
       (vectorized: size-2 groups — the common case — by pure gathers,
       larger groups via triu), then locally pre-count per pair
       (combiner) so the pair exchange carries one row per (pair,
       partition);
    3. hash-partition by pair; ``n_intersect`` = summed counts,
       ``n_union = sa + sb − n_intersect``; keep pairs with
       ``threshold_den·n_intersect ≥ threshold_num·n_union``.

    All output columns are int64 (intersection/union sizes, not a float
    ratio) so the equality with the DuckDB string-shingle oracle is
    exact — the hashed-shingle and string-shingle Jaccards agree barring
    a 64-bit collision.  Cost: Σ df(shingle)² pair emissions.  Run
    ``dedup_exact`` first on exact-dup-heavy corpora so d identical docs
    don't contribute s·d² rows here.

    **Hot-shingle guard** (template/stop shingles — the round-3 scale
    hole): a shingle shared by d documents would emit d²/2 pairs inside
    ONE partition task (5×10⁹ for d=10⁵).  A sampled df prepass
    (:func:`_ngram_hot_shingles`) finds shingles with estimated
    df > ``df_block``; the router splits their postings into
    ``nb = ceil(df/df_block)`` blocks by a doc_id hash and replicates
    each posting to its ``nb`` block-pair groups keyed
    ``(shingle, bi, bj)`` — the d²/2 pairs spread over nb(nb+1)/2 tasks
    of ≤ df_block² pair emissions each, with replication cost
    d·nb ≈ d²/df_block rows (∝ pairs/df_block).  Exactness preserved: a
    pair sharing a hot shingle lands in exactly one (bi, bj) group (its
    blocks are fixed functions of the doc_ids).  ``df_block=None``
    disables the guard (and the prepass scan).
    """
    import numpy as np

    # fine blocks: reduce-task parallelism in Ray's groupby tracks
    # the block count, and the pair stage is the skewed hot stage —
    # 128-row blocks at sf0.1 gave 40 reduce tasks vs 9 and cut the
    # op 2.6x in a matched window (straggler spread, not less work)
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=128)
    explode_schema = pa.schema(
        [("shingle", pa.uint64()), ("doc_id", pa.int64()),
         ("size", pa.int64())])

    def explode(df: pd.DataFrame) -> pa.Table:
        sets = [dd.shingle_hashes(str(t)) for t in df["text"].fillna("")]
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        ids = df["doc_id"].astype("int64").to_numpy()
        return pa.Table.from_pydict(
            {"shingle": np.concatenate(sets) if sets else
             np.empty(0, dtype=np.uint64),
             "doc_id": np.repeat(ids, lens),
             "size": np.repeat(lens, lens)},
            schema=explode_schema)

    rows = ds.map_batches(explode, batch_format="pandas")
    # partition count sized to shingle work, not doc rows (~150
    # docs of shingles per partition balances the hot buckets)
    parts = _parts_for(sf_dir, "documents", rows_per_part=150)

    from ..sources.tables import table_rows

    # a shingle's df cannot exceed the doc count, so corpora smaller than
    # df_block provably have no hot shingles — skip the prepass scan
    hot_map = ({} if df_block is None
               or table_rows(sf_dir, "documents") <= df_block
               else _ngram_hot_shingles(sf_dir, df_block, df_sample_mod))
    if hot_map:
        import ray

        hot_keys = np.sort(np.fromiter(hot_map.keys(), dtype=np.uint64,
                                       count=len(hot_map)))
        hot_nbs = np.fromiter((hot_map[int(k)] for k in hot_keys),
                              dtype=np.int64, count=len(hot_map))
        # broadcast once: the hot set is small (shingles with df >
        # df_block), read zero-copy by every route task
        hot_ref = ray.put((hot_keys, hot_nbs))
    else:
        hot_ref = None
    gold = np.uint64(0x9E3779B97F4A7C15)

    def route(df: pd.DataFrame) -> pd.DataFrame:
        """Partition postings: cold shingles by shingle hash; hot ones
        replicated to their (shingle, bi, bj) block-pair groups.  bpack
        = blk<<32 | bi<<16 | bj (0 for cold rows)."""
        sh = df["shingle"].to_numpy(dtype=np.uint64)
        ids = df["doc_id"].to_numpy(dtype="int64")
        szs = df["size"].to_numpy(dtype="int64")
        if hot_ref is not None and len(sh):
            import ray

            hk, hn = ray.get(hot_ref)
            pos = np.searchsorted(hk, sh)
            pos[pos == len(hk)] = 0
            is_hot = hk[pos] == sh
        else:
            is_hot = np.zeros(len(sh), dtype=bool)
        cold = ~is_hot
        nc = int(cold.sum())
        frames = [pd.DataFrame(
            {"shingle": sh[cold], "doc_id": ids[cold], "size": szs[cold],
             "bpack": np.zeros(nc, dtype="int64"),
             "part": (sh[cold] % np.uint64(parts)).astype("int64")})]
        if nc < len(sh):
            hs, hid, hsz = sh[is_hot], ids[is_hot], szs[is_hot]
            nbs = hn[pos[is_hot]]
            with np.errstate(over="ignore"):
                blk = ((hid.astype(np.uint64) * gold) >> np.uint64(33)
                       ) % nbs.astype(np.uint64)
            blk = blk.astype(np.int64)
            reps = nbs
            starts = np.cumsum(reps) - reps
            total = int(reps.sum())
            j = np.arange(total, dtype=np.int64) - np.repeat(starts, reps)
            r_blk = np.repeat(blk, reps)
            bi = np.minimum(r_blk, j)
            bj = np.maximum(r_blk, j)
            r_sh = np.repeat(hs, reps)
            with np.errstate(over="ignore"):
                mix = (r_sh
                       ^ (bi.astype(np.uint64)
                          * np.uint64(0xFF51AFD7ED558CCD))
                       ^ (bj.astype(np.uint64)
                          * np.uint64(0xC4CEB9FE1A85EC53)))
            frames.append(pd.DataFrame(
                {"shingle": r_sh,
                 "doc_id": np.repeat(hid, reps),
                 "size": np.repeat(hsz, reps),
                 "bpack": (r_blk << 32) | (bi << 16) | bj,
                 "part": (mix % np.uint64(parts)).astype("int64")}))
        return (pd.concat(frames, ignore_index=True)
                if len(frames) > 1 else frames[0])

    def partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"),
             "doc_b": pd.Series(dtype="int64"),
             "n": pd.Series(dtype="int64"),
             "sa": pd.Series(dtype="int64"),
             "sb": pd.Series(dtype="int64")})
        if len(df) < 2:
            return empty
        sh = df["shingle"].to_numpy(dtype=np.uint64)
        bp = df["bpack"].to_numpy(dtype="int64")
        gk = bp & 0xFFFFFFFF          # (bi<<16 | bj) — the subgroup key
        blk = bp >> 32
        order = np.lexsort((df["doc_id"].to_numpy(), gk, sh))
        sh, gk, blk = sh[order], gk[order], blk[order]
        ids = df["doc_id"].to_numpy(dtype="int64")[order]
        szs = df["size"].to_numpy(dtype="int64")[order]
        newgrp = np.r_[True, (sh[1:] != sh[:-1]) | (gk[1:] != gk[:-1])]
        starts = np.flatnonzero(newgrp)
        counts = np.diff(np.r_[starts, len(sh)])
        out_a, out_b, out_sa, out_sb = [], [], [], []
        # fast path: cold size-2 groups (ids ascending per group)
        two = starts[(counts == 2) & (gk[starts] == 0)]
        if len(two):
            out_a.append(ids[two]); out_b.append(ids[two + 1])
            out_sa.append(szs[two]); out_sb.append(szs[two + 1])
        rest = (counts > 2) | ((counts == 2) & (gk[starts] != 0))
        for s, c in zip(starts[rest], counts[rest]):
            c = int(c)
            gi, gs = ids[s:s + c], szs[s:s + c]
            g_gk = int(gk[s])
            b_i, b_j = (g_gk >> 16) & 0xFFFF, g_gk & 0xFFFF
            if b_i == b_j:
                # cold group, or a hot shingle's intra-block pairs
                ii, jj = np.triu_indices(c, k=1)
                out_a.append(gi[ii]); out_b.append(gi[jj])
                out_sa.append(gs[ii]); out_sb.append(gs[jj])
            else:
                # hot cross-block group: side-bi rows × side-bj rows
                am = blk[s:s + c] == b_i
                a_ids, a_szs = gi[am], gs[am]
                b_ids, b_szs = gi[~am], gs[~am]
                if not (len(a_ids) and len(b_ids)):
                    continue
                aa = np.repeat(a_ids, len(b_ids))
                asz = np.repeat(a_szs, len(b_ids))
                bb = np.tile(b_ids, len(a_ids))
                bsz = np.tile(b_szs, len(a_ids))
                lo = aa < bb  # blocks are disjoint doc sets → aa != bb
                out_a.append(np.where(lo, aa, bb))
                out_b.append(np.where(lo, bb, aa))
                out_sa.append(np.where(lo, asz, bsz))
                out_sb.append(np.where(lo, bsz, asz))
        if not out_a:
            return empty
        part = pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b),
             "sa": np.concatenate(out_sa), "sb": np.concatenate(out_sb)})
        # local combiner: one row per pair per partition
        return (part.groupby(["doc_a", "doc_b"], as_index=False, sort=True)
                .agg(n=("sa", "size"), sa=("sa", "first"),
                     sb=("sb", "first"))
                .astype({"doc_a": "int64", "doc_b": "int64", "n": "int64",
                         "sa": "int64", "sb": "int64"})
                [["doc_a", "doc_b", "n", "sa", "sb"]])

    def drop_part(df: pd.DataFrame) -> pd.DataFrame:
        return partition_pairs(df.drop(columns=["part"]))

    partial = (rows.map_batches(route, batch_format="pandas")
               .groupby("part")
               .map_groups(drop_part, batch_format="pandas"))

    tn, td = int(threshold_num), int(threshold_den)

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["doc_a", "doc_b"], as_index=False, sort=True)
             .agg(n_intersect=("n", "sum"), sa=("sa", "first"),
                  sb=("sb", "first")))
        g["n_union"] = g["sa"] + g["sb"] - g["n_intersect"]
        g = g[td * g["n_intersect"] >= tn * g["n_union"]]
        return (g[["doc_a", "doc_b", "n_intersect", "n_union"]]
                .astype("int64"))

    return _hash_grouped(partial, ["doc_a", "doc_b"], reduce_pairs,
                         num_parts=parts)


def dedup_ngram_pairs_sql(threshold_num: int = 1,
                          threshold_den: int = 2) -> str:
    """DuckDB oracle for :func:`dedup_ngram_pairs` — string shingles,
    same tokenization (``\\S+`` on lowercased text, 3-word grams,
    <3-token docs collapse to one whole-doc shingle)."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(CASE
           WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
           WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
           ELSE list_transform(generate_series(1, len(t) - 2),
                               i -> array_to_string(t[i:i+2], ' '))
         END) AS s
  FROM toks
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.s, b.s)) AS c,
         len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(c AS BIGINT) AS n_intersect,
       CAST(u AS BIGINT) AS n_union
FROM pairs WHERE c >= 1 AND {threshold_den} * c >= {threshold_num} * u
ORDER BY doc_a, doc_b
""".strip()


DECON_BENCH_MOD = 50     # every 50th doc_id stands in for the eval set
DECON_MIN_OVERLAP = 1


def doc_decontaminate(sf_dir: str, bench_mod: int = DECON_BENCH_MOD,
                      min_overlap: int = DECON_MIN_OVERLAP):
    """Benchmark decontamination scan: corpus documents sharing ≥
    ``min_overlap`` distinct 3-word shingles with the evaluation set —
    the standard pre-training hygiene pass that keeps test data out of
    the training corpus.

    The "benchmark" here is carved from ``documents`` by id
    (``doc_id % bench_mod == 0``) so the op is deterministic and
    SQL-checkable; in production it is its own small table and the
    first pass reads that instead.

    Scale shape — ZERO shuffles on the corpus side:

    - pass 1 reduces the benchmark to its distinct shingle-hash union
      (eval sets are tiny by construction; per-batch ``np.unique``
      partials, one driver union) and broadcasts it once via
      ``ray.put`` as a sorted uint64 array;
    - pass 2 streams the corpus: each batch computes per-doc sorted
      unique shingle hashes and counts membership against the broadcast
      set with one ``np.searchsorted`` per doc — no exchange, output is
      flagged docs only.

    Equality of overlap COUNTS with the string-shingle SQL oracle rides
    on 64-bit shingle-hash injectivity over the observed vocabulary —
    the same assumption the green ``dedup_ngram_pairs`` oracle row
    already banks on (a collision would merge two distinct shingles).
    """
    import numpy as np
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=512)

    def bench_partial(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = df["doc_id"].to_numpy("int64")
        m = (ids % bench_mod) == 0
        hs = [dd.shingle_hashes(str(t))
              for t in df.loc[m, "text"].astype("string").fillna("")]
        u = (np.unique(np.concatenate(hs)) if hs
             else np.empty(0, dtype=np.uint64))
        # uint64 carried as its int64 bit pattern (Arrow-safe); order is
        # preserved because we only re-unique on the driver
        return pd.DataFrame({"h": u.view(np.int64)})

    bench_h = (ds.map_batches(bench_partial, batch_format="pandas")
               .to_pandas()["h"].to_numpy("int64").view(np.uint64))
    bench_ref = ray.put(np.unique(bench_h))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        keys = ray.get(bench_ref)  # zero-copy view of the shared array
        ids = df["doc_id"].to_numpy("int64")
        sel = np.nonzero(ids % bench_mod != 0)[0]
        texts = df["text"].astype("string").fillna("")
        # per-doc tokenize+hash (intrinsic, like the minhash scan), then
        # ONE searchsorted over the batch's concatenated shingles and a
        # reduceat segment-sum of hits per doc — no per-doc membership
        hs_list = [dd.shingle_hashes(str(texts.iloc[i])) for i in sel]
        lens = np.fromiter((len(h) for h in hs_list), dtype=np.int64,
                           count=len(hs_list))
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "n_shared": pd.Series([], dtype="int64")})
        if len(keys) == 0 or lens.sum() == 0:
            return empty
        flat = np.concatenate([h for h in hs_list if len(h)])
        pos = np.searchsorted(keys, flat)
        hit = ((pos < len(keys))
               & (keys[np.minimum(pos, len(keys) - 1)] == flat))
        ne = np.nonzero(lens)[0]
        starts = np.concatenate(([0], np.cumsum(lens[ne])[:-1]))
        n_shared = np.add.reduceat(hit, starts, dtype=np.int64)
        keep = n_shared >= min_overlap
        return pd.DataFrame(
            {"doc_id": pd.Series(ids[sel[ne[keep]]], dtype="int64"),
             "n_shared": pd.Series(n_shared[keep], dtype="int64")})

    return ds.map_batches(scan, batch_format="pandas")


def doc_decontaminate_sql(bench_mod: int = DECON_BENCH_MOD,
                          min_overlap: int = DECON_MIN_OVERLAP) -> str:
    """String-shingle oracle — same tokenization/edge semantics as
    :func:`dedup_ngram_pairs_sql`."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(CASE
           WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
           WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
           ELSE list_transform(generate_series(1, len(t) - 2),
                               i -> array_to_string(t[i:i+2], ' '))
         END) AS s
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {bench_mod} = 0
), corpus AS (
  SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % {bench_mod} <> 0
)
SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM corpus c JOIN bench b USING (g)
GROUP BY 1 HAVING count(*) >= {min_overlap}
ORDER BY 1
""".strip()


DUP_SPAN_W = 8           # span width in tokens (ExactSubstr-style gate)


def doc_dup_spans(sf_dir: str, w: int = DUP_SPAN_W) -> pd.DataFrame:
    """ExactSubstr-style duplicated-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, how many of its distinct ``w``-token spans occur in at
    least one OTHER document — the substring-level dedup signal that
    catches boilerplate/quotation overlap exact- and near-dup doc
    matching both miss.  Docs with fewer than ``w`` tokens contribute
    no spans (a "duplicated span of length w" is undefined for them);
    every doc still gets an output row.

    Scale shape: the scan collapses each doc to its DISTINCT span
    hashes (uint64 — one vectorized multiply-add chain over ``w``
    shifted token-hash views, never span strings), so the exchange
    carries one 16-byte row per (doc, distinct span) — the same
    universe the minhash/ngram family ships.  A span-hash partition
    counts docs per span and emits per-doc partial dup counts
    (answer-∝ rows: ≤ one per (doc, partition)); a doc_id partition
    sums them.  Unlike ``dedup_ngram_pairs`` there is NO pair
    emission — a hot boilerplate span costs one linear count, so the
    df² hot-key guard is structurally unnecessary here.  Per-doc
    totals come from the same scan kernel as a pure map (no
    exchange).  Output is corpus-doc-sized, like every per-doc query
    in this module (at 10^8 docs the caller writes it to partitioned
    Parquet instead of collecting a DataFrame).
    """
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def span_sets(texts) -> list[np.ndarray]:
        return [dd.span_hashes(t, w) for t in texts]

    def explode(df: pd.DataFrame) -> pa.Table:
        sets = span_sets(df["text"].fillna(""))
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        ids = df["doc_id"].astype("int64").to_numpy()
        return pa.Table.from_pydict(
            {"span": np.concatenate(sets) if sets else
             np.empty(0, dtype=np.uint64),
             "doc_id": np.repeat(ids, lens)},
            schema=pa.schema([("span", pa.uint64()),
                              ("doc_id", pa.int64())]))

    def dup_partial(df: pd.DataFrame) -> pd.DataFrame:
        # rows are unique (span, doc) ⇒ per-span row count == doc count.
        # The per-doc TOTAL rides the same exchange: a doc's span rows
        # are scattered over span partitions, but their per-partition
        # counts SUM to n_spans — so the tokenize kernel runs exactly
        # once over the corpus (a second totals scan used to re-run it).
        cnt = df.groupby("span")["doc_id"].transform("size")
        tot = (df.groupby("doc_id", as_index=False).size()
               .rename(columns={"size": "tot_partial"}))
        dup = (df[cnt >= 2].groupby("doc_id", as_index=False).size()
               .rename(columns={"size": "dup_partial"}))
        out = tot.merge(dup, on="doc_id", how="left")
        out["dup_partial"] = out["dup_partial"].fillna(0)
        return out.astype({"doc_id": "int64", "tot_partial": "int64",
                           "dup_partial": "int64"})

    def dup_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)[
            ["dup_partial", "tot_partial"]].sum()
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                             "dup_spans": g["dup_partial"].astype("int64"),
                             "n_spans": g["tot_partial"].astype("int64")})

    parts = _parts_for(sf_dir, "documents", rows_per_part=500)
    partials = _hash_grouped(ds.map_batches(explode, batch_format="pandas"),
                             ["span"], dup_partial, num_parts=parts)
    dups = _hash_grouped(partials, ["doc_id"], dup_sum,
                         num_parts=max(4, parts // 4)).to_pandas()
    if "doc_id" not in dups.columns:  # all-empty-block schema loss
        dups = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "dup_spans": pd.Series([], dtype="int64"),
                             "n_spans": pd.Series([], dtype="int64")})
    # zero-span docs (< w tokens) never enter the explode: a pruned
    # doc_id-only scan (no text decode) supplies the left side
    tot = (_read(sf_dir, "documents", ["doc_id"]).to_pandas()
           .astype({"doc_id": "int64"}))

    out = tot.merge(dups, on="doc_id", how="left")
    out["n_spans"] = out["n_spans"].fillna(0).astype("int64")
    out["dup_spans"] = out["dup_spans"].fillna(0).astype("int64")
    out["has_cross_dup"] = (out["dup_spans"] > 0).astype("int64")
    return (out.sort_values("doc_id", kind="mergesort")
            .reset_index(drop=True))


def doc_dup_spans_sql(w: int = DUP_SPAN_W) -> str:
    """String-span oracle — same tokenization as the ngram family
    (``\\S+`` on lowercased text); <w-token docs yield zero spans."""
    return f"""
WITH toks AS (
  SELECT doc_id, coalesce(regexp_extract_all(lower(text), '\\S+'),
                          CAST([] AS VARCHAR[])) AS t
  FROM documents
), sp AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) < {w} THEN CAST([] AS VARCHAR[])
           ELSE list_transform(generate_series(1, len(t) - {w - 1}),
                               i -> array_to_string(t[i:i+{w - 1}], ' '))
         END) AS s
  FROM toks
), u AS (
  SELECT doc_id, unnest(s) AS span FROM sp
), d AS (
  SELECT span FROM u GROUP BY span HAVING count(*) >= 2
), dc AS (
  SELECT doc_id, count(*) AS c FROM u
  WHERE span IN (SELECT span FROM d) GROUP BY doc_id
)
SELECT sp.doc_id,
       CAST(len(sp.s) AS BIGINT) AS n_spans,
       CAST(coalesce(dc.c, 0) AS BIGINT) AS dup_spans,
       CAST(CASE WHEN coalesce(dc.c, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS has_cross_dup
FROM sp LEFT JOIN dc USING (doc_id)
ORDER BY sp.doc_id
""".strip()


LINE_TOKENS = 10         # "line" unit for C4-style line-level dedup


def corpus_line_dedup(sf_dir: str,
                      line_tokens: int = LINE_TOKENS) -> pd.DataFrame:
    """C4-style line-level corpus deduplication (Raffel et al. 2020
    §2.2: "we discarded all but one of any three-sentence span
    occurring more than once in the data set"; same family as
    RefinedWeb/Dolma line dedup).  The testdata corpus has no
    newline/sentence structure, so the "line" unit is a fixed
    non-overlapping window of ``line_tokens`` whitespace tokens
    (trailing partial line kept) — the segmentation ``doc_chunks``
    already mirrors in SQL.  Policy: an occurrence of a line survives
    iff it is the GLOBAL FIRST occurrence of that exact line text
    (min (doc_id, line_idx)); every later occurrence, in the same or
    another document, is removed.  Output per document: line counts,
    surviving token count, and ``out_sig`` — the md5 of the surviving
    lines' md5s concatenated in line order, i.e. an
    order-sensitive signature of the reassembled document that the
    oracle recomputes independently from line text.  Documents with
    zero tokens have no lines and are dropped (mirrored by the
    oracle's ``len(t) > 0``).

    Scale shape (two digest exchanges, one corpus scan): the scan
    collapses each line occurrence to (md5(line), doc_id, line_idx,
    line_len) — 50-ish bytes, text never leaves the scan.  Exchange 1
    partitions by line hash; within a partition one vectorized sort +
    ``duplicated()`` marks the global-first occurrence (same hash →
    same partition, so partition-local first IS global first).
    Exchange 2 re-keys every marked occurrence by doc_id and folds
    each document's verdict vector into the per-doc row — no pair
    emission, no driver-side state; a boilerplate line duplicated in
    10^6 docs costs one linear group, not a quadratic walk.  The
    reassembly itself emits a 128-bit signature instead of text so no
    exchange carries document bodies; a production variant that must
    WRITE the deduped text would route the kept-line texts through
    exchange 2 (one unavoidable O(corpus-bytes) shuffle) and
    ``write_parquet`` per doc-hash partition.  Reference anchor: this
    generalizes the reference's per-page content fingerprint dedup
    (spider/core/spider.js:411 md5-of-content) from whole-document to
    sub-document granularity.
    """
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64").to_numpy()
        line_texts: list[str] = []
        line_lens: list[int] = []
        counts = np.empty(len(df), dtype=np.int64)
        for j, t in enumerate(df["text"].fillna("")):
            toks = t.lower().split()
            n = len(toks)
            k = -(-n // line_tokens)
            counts[j] = k
            for g in range(k):
                seg = toks[g * line_tokens:(g + 1) * line_tokens]
                line_texts.append(" ".join(seg))
                line_lens.append(len(seg))
        total = int(counts.sum())
        offsets = np.repeat(np.cumsum(counts) - counts, counts)
        return pd.DataFrame(
            {"line_h": dd.md5_hex_series(
                pd.Series(line_texts, dtype="string")).astype(object),
             "doc_id": np.repeat(ids, counts),
             "line_idx": np.arange(total, dtype=np.int64) - offsets,
             "line_len": np.asarray(line_lens, dtype=np.int64)})

    def mark_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["line_h", "doc_id", "line_idx"],
                            kind="mergesort")
        return df.assign(
            kept=(~df["line_h"].duplicated()).astype("int64"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "line_idx"], kind="mergesort")
        g = df.groupby("doc_id", sort=True)
        kd = df[df["kept"].astype(bool)]
        kg = kd.groupby("doc_id")
        base = pd.DataFrame(
            {"doc_id": g.size().index.astype("int64"),
             "n_lines": g.size().to_numpy("int64"),
             "n_kept": g["kept"].sum().to_numpy("int64")})
        base["kept_tokens"] = (base["doc_id"]
                               .map(kg["line_len"].sum())
                               .fillna(0).astype("int64"))
        sig_src = base["doc_id"].map(kg["line_h"].agg("".join)).fillna("")
        base["out_sig"] = dd.md5_hex_series(
            sig_src.astype("string")).astype(object)
        return base

    parts = _parts_for(sf_dir, "documents", rows_per_part=500)
    marked = _hash_grouped(ds.map_batches(explode, batch_format="pandas"),
                           ["line_h"], mark_first, num_parts=parts)
    out = _hash_grouped(marked, ["doc_id"], finish,
                        num_parts=max(4, parts // 4)).to_pandas()
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def corpus_line_dedup_sql(line_tokens: int = LINE_TOKENS) -> str:
    """Oracle recomputes the same policy from line TEXT (no internal
    hashes shared with the Ray side except md5-of-line, which both
    sides derive independently from the same string)."""
    L = line_tokens
    return f"""
WITH toks AS (
  SELECT doc_id, coalesce(regexp_extract_all(lower(text), '\\S+'),
                          CAST([] AS VARCHAR[])) AS t
  FROM documents
), expanded AS (
  SELECT doc_id, t,
         unnest(generate_series(0,
             CAST(ceil(len(t) / {L}.0) AS BIGINT) - 1)) AS g
  FROM toks WHERE len(t) > 0
), lines AS (
  SELECT doc_id,
         CAST(g AS BIGINT) AS line_idx,
         array_to_string(t[g*{L}+1 : least((g+1)*{L}, len(t))], ' ')
           AS line_text,
         CAST(least({L}, len(t) - g*{L}) AS BIGINT) AS line_len
  FROM expanded
), marked AS (
  SELECT doc_id, line_idx, line_len, md5(line_text) AS line_h,
         CASE WHEN row_number() OVER (PARTITION BY line_text
                ORDER BY doc_id, line_idx) = 1 THEN 1 ELSE 0 END AS kept
  FROM lines
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN kept = 1 THEN line_len END), 0)
            AS BIGINT) AS kept_tokens,
       md5(coalesce(string_agg(CASE WHEN kept = 1 THEN line_h END, ''
            ORDER BY line_idx), '')) AS out_sig
FROM marked
GROUP BY doc_id
ORDER BY doc_id
""".strip()


def dedup_clusters(sf_dir: str, lsh_threshold: float = 0.7,
                   jaccard_threshold: float = 0.8) -> pd.DataFrame:
    """Near-dup cluster assignment: union-find over verified pairs.

    Output rows only for docs in a non-trivial cluster; representative
    is the min doc_id (deterministic keep-one policy)."""
    pairs = dedup_minhash_verified(sf_dir, lsh_threshold, jaccard_threshold)
    comp = dd.connected_components(
        list(zip(pairs["doc_a"].tolist(), pairs["doc_b"].tolist()))
    )
    items = sorted(comp.items())
    return pd.DataFrame(
        {"doc_id": pd.Series([k for k, _ in items], dtype="int64"),
         "cluster_rep": pd.Series([v for _, v in items], dtype="int64")}
    )


def connected_components_ds(pairs, max_iters: int = 40,
                            num_parts: int = 16):
    """Distributed connected components over a near-dup pair Dataset —
    the 100-TB path for cluster assignment when the dup graph is itself
    corpus-sized (the driver union-find in
    ``functions.dedup.connected_components`` is the answer-sized
    default).

    Iterative min-label propagation WITH pointer-jumping: per round
    ``label(x) <- min(label(x), min_{(x,y) in E} label(y),
    label(label(x)))`` until fixpoint — the shortcut term halves label
    chains, so convergence is O(log n) rounds even on path graphs (pure
    neighbor relaxation would be O(diameter)).  One round = exactly TWO
    hash-partitioned exchanges (a fused relay co-group carrying both
    neighbor and pointer messages, then a min-reduce); convergence is
    detected from the monotone per-round label sum (labels only ever
    decrease), so no extra shuffle.  Returns a Dataset (doc_id,
    cluster_rep) for every node in a non-trivial component, rep =
    component min."""
    import numpy as np

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": pd.concat([df["doc_a"], df["doc_b"]]).astype("int64"),
             "dst": pd.concat([df["doc_b"], df["doc_a"]]).astype("int64")})

    edges = pairs.map_batches(undirect, batch_format="pandas").materialize()
    if edges.count() == 0:
        import ray

        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "cluster_rep": pa.array([], pa.int64())}))

    # labels0: node -> min(node, direct neighbors)
    def local_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src", as_index=False)["dst"].min()
        g["dst"] = np.minimum(g["dst"], g["src"])
        return g.rename(columns={"src": "node", "dst": "label"}).astype(
            {"node": "int64", "label": "int64"})

    labels = _hash_grouped(edges, ["src"], local_min,
                           num_parts=num_parts).materialize()

    def lab_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["node"].to_numpy("int64"),
             "src": np.full(len(df), -1, dtype="int64"),
             "val": df["label"].to_numpy("int64")})

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["dst"].to_numpy("int64"),
             "src": df["src"].to_numpy("int64"),
             "val": np.full(len(df), -1, dtype="int64")})

    # pointer-jumping rows: x asks key=label(x) for ITS label — same
    # message shape as an edge row, so one relay co-group serves both
    def ptr_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["label"].to_numpy("int64"),
             "src": df["node"].to_numpy("int64"),
             "val": np.full(len(df), -1, dtype="int64")})

    def relay(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["src"] < 0]
        lmap = dict(zip(lab["key"], lab["val"]))
        ed = df[df["src"] >= 0]
        if ed.empty:
            return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "label": pd.Series(dtype="int64")})
        return pd.DataFrame(
            {"node": ed["src"].to_numpy("int64"),
             "label": ed["key"].map(lmap).to_numpy("int64")})

    def merge_min(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("node", as_index=False)["label"].min()
                .astype({"node": "int64", "label": "int64"}))

    prev_sum = None
    edge_msgs = edges.map_batches(edge_rows, batch_format="pandas")
    for _ in range(max_iters):
        unioned = (labels.map_batches(lab_rows, batch_format="pandas")
                   .union(edge_msgs)
                   .union(labels.map_batches(ptr_rows, batch_format="pandas")))
        # materialize between the two exchanges: one execution per
        # shuffle keeps the per-round plan flat (a fused
        # union→aggregate→union→aggregate plan measurably stalls the
        # streaming executor on small inputs)
        messages = _hash_grouped(unioned, ["key"], relay,
                                 num_parts=num_parts).materialize()
        # repartition the carried state: unions SUM block counts and
        # aggregates preserve them, so without this the per-round block
        # (and task) count compounds ~2.5× per round — measured as
        # exponentially growing round times on a 40-node chain
        labels = _hash_grouped(labels.union(messages), ["node"], merge_min,
                               num_parts=num_parts) \
            .repartition(num_parts).materialize()
        # labels are node-unique and only ever decrease ⇒ the label sum
        # strictly decreases iff anything changed this round
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["node"].astype("int64"),
             "cluster_rep": df["label"].astype("int64")})

    return labels.map_batches(rename, batch_format="pandas")


def dedup_clusters_distributed(sf_dir: str, lsh_threshold: float = 0.7,
                               jaccard_threshold: float = 0.8,
                               num_parts: int = 16) -> pd.DataFrame:
    """Cluster assignment via the distributed CC path (the driver
    union-find variant is :func:`dedup_clusters`).  At test scale the
    verified-pair frame round-trips through ``from_arrow``; at corpus
    scale the pairs would stay a Dataset end to end."""
    import ray

    pairs = dedup_minhash_verified(sf_dir, lsh_threshold, jaccard_threshold)
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_a": pa.array(pairs["doc_a"], pa.int64()),
             "doc_b": pa.array(pairs["doc_b"], pa.int64())}))
    out = connected_components_ds(ds, num_parts=num_parts).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def dedup_ngram_keep(sf_dir: str, threshold_num: int = 1,
                     threshold_den: int = 2,
                     num_parts: int | None = None):
    """End-to-end EXACT n-gram dedup: keep one representative per
    near-dup component — the materializing tail of the dedup family,
    and the first ORACLE-checkable drive of the distributed
    connected-components stage (:func:`connected_components_ds`;
    previously pytest-only via an equivalence test).

    Pipeline: :func:`dedup_ngram_pairs` (exact inverted-index join,
    itself oracle-green) → pointer-jumping CC over the pair Dataset →
    one doc_id-hash exchange joining component reps onto the full
    corpus id column.  Output per document: its component
    representative ``rep`` (own id for singletons) and
    ``kept = (doc_id == rep)`` — the deterministic keep-min policy of
    :func:`dedup_clusters`, here verified against a recursive-CTE
    min-label-propagation DuckDB oracle end to end.

    Scale shape: everything corpus-sized moves as 8-16 byte id rows
    (pairs, labels, the final rep join); text never leaves the scan
    stage inside ``dedup_ngram_pairs``.  Reference: generalizes the
    reference's exact content-dedup keep-first policy
    (README.md:575-576) to graded-overlap components."""
    import numpy as np

    # CC rounds cost ~2 exchanges each regardless of data volume — size
    # the label partitions to the corpus (pair graphs are ≤ node-sized)
    # so small inputs don't pay 16-way sort-task overhead per round
    if num_parts is None:
        num_parts = _parts_for(sf_dir, "documents",
                               rows_per_part=2000, lo=4, hi=32)
    pairs = dedup_ngram_pairs(sf_dir, threshold_num, threshold_den)
    comp = connected_components_ds(pairs, num_parts=num_parts)
    docs = _read(sf_dir, "documents", ["doc_id"])

    def corpus_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy("int64"),
             "rep": np.full(len(df), -1, dtype="int64")})

    def comp_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy("int64"),
             "rep": df["cluster_rep"].to_numpy("int64")})

    def settle(df: pd.DataFrame) -> pd.DataFrame:
        # each doc_id has exactly one corpus row (rep = -1) and at most
        # one component row (rep ≥ 0): max() picks the component rep
        # when present, then -1 singletons fall back to their own id
        g = df.groupby("doc_id", as_index=False)["rep"].max()
        ids = g["doc_id"].to_numpy("int64")
        rep = g["rep"].to_numpy("int64")
        rep = np.where(rep < 0, ids, rep)
        return pd.DataFrame(
            {"doc_id": ids, "rep": rep,
             "kept": (ids == rep).astype("int64")})

    tagged = (docs.map_batches(corpus_rows, batch_format="pandas")
              .union(comp.map_batches(comp_rows, batch_format="pandas")))
    return _hash_grouped(tagged, ["doc_id"], settle, num_parts=num_parts)


def dedup_ngram_keep_sql(threshold_num: int = 1,
                         threshold_den: int = 2) -> str:
    """Recursive-CTE oracle: min-label propagation over the undirected
    pair graph (seeded (u, u), labels flood along edges, component rep
    = min reachable id), LEFT-joined onto the corpus."""
    pairs = dedup_ngram_pairs_sql(threshold_num, threshold_den)
    return f"""
WITH RECURSIVE
p AS (SELECT doc_a, doc_b FROM ({pairs}) t),
edges AS (SELECT doc_a AS u, doc_b AS v FROM p
          UNION SELECT doc_b, doc_a FROM p),
walk(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, w.lab FROM walk w JOIN edges e ON e.u = w.node),
r AS (SELECT node, min(lab) AS rep FROM walk GROUP BY node)
SELECT d.doc_id,
       CAST(COALESCE(r.rep, d.doc_id) AS BIGINT) AS rep,
       CAST(CASE WHEN COALESCE(r.rep, d.doc_id) = d.doc_id
            THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM documents d LEFT JOIN r ON r.node = d.doc_id
ORDER BY d.doc_id
""".strip()


DEDUP_NGRAM_KEEP_SQL = dedup_ngram_keep_sql()


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs: 64-bit sketch, band blocking, verify
    true Hamming distance inside each band bucket.

    Band count adapts to the budget: any pair within ``max_hamming``
    shares at least one of ``bands`` exact band keys iff
    ``bands > max_hamming`` (pigeonhole), so 4 bands serve d≤3 (the
    classic web-dedup setting) and 8 bands serve d≤7 (short docs flip
    more bits per edit).  More bands ⇒ smaller band keys ⇒ more random
    bucket collisions — that trade is the caller's knob."""
    bands = 4 if max_hamming < 4 else 8
    ds = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=256)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        hs = dd.simhash64_batch(df["text"].fillna("").tolist())
        ids = df["doc_id"].to_numpy(dtype="int64")
        w = 64 // bands
        mask = np.uint64((1 << w) - 1)
        shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(w))
        band_vals = (hs[:, None] >> shifts[None, :]) & mask  # (n, bands)
        band_keys = [
            f"{b}:{v:04x}"
            for row in band_vals for b, v in enumerate(row)
        ]
        return pd.DataFrame(
            {"band_key": pd.Series(band_keys, dtype="string"),
             "doc_id": pd.Series(np.repeat(ids, bands), dtype="int64"),
             # uint64 simhash carried as its int64 bit pattern (Arrow-safe)
             "simhash": pd.Series(
                 np.repeat(hs.view(np.int64), bands), dtype="int64")}
        )

    ds = ds.map_batches(sketch, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        df = df.sort_values("doc_id")
        ids = df["doc_id"].to_numpy(dtype="int64")
        hs = df["simhash"].to_numpy(dtype="int64").view(np.uint64)
        # Dup-heavy buckets repeat sketches: compute the pairwise Hamming
        # matrix over UNIQUE sketches (u ≪ m when templates repeat) and
        # expand matches back to doc pairs — expansion is proportional to
        # the emitted pairs, so per-bucket work drops from O(m²) to
        # O(u² + |output|).  This removed a 95 s hot-partition skew at
        # sf0.1 (one template bucket held thousands of identical hashes).
        uh, inv = np.unique(hs, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        sids, sinv = ids[order], inv[order]
        starts = np.searchsorted(sinv, np.arange(len(uh)))
        ends = np.append(starts[1:], len(sids))
        out_a, out_b, out_d = [], [], []
        # d = 0: all intra-group pairs (ids ascend within a group)
        for g in range(len(uh)):
            m = ends[g] - starts[g]
            if m > 1:
                gi = sids[starts[g]:ends[g]]
                ii, jj = np.triu_indices(m, k=1)
                out_a.append(gi[ii])
                out_b.append(gi[jj])
                out_d.append(np.zeros(len(ii), dtype=np.int64))
        # d ≥ 1: Hamming over unique sketches, chunked + SWAR popcount.
        # Most qualifying unique-pairs join two SINGLETON groups, so that
        # case expands with pure gathers; only pairs touching a multi-doc
        # group (rare) fall back to a per-pair loop.
        u = len(uh)
        sizes = ends - starts
        for lo in range(0, u, 1024):
            hi = min(lo + 1024, u)
            d = dd.popcount64(uh[lo:hi, None] ^ uh[None, :])
            cand = (d <= max_hamming) & (
                np.arange(lo, hi)[:, None] < np.arange(u)[None, :])
            ii, jj = np.nonzero(cand)
            if len(ii) == 0:
                continue
            gi = ii + lo
            both1 = (sizes[gi] == 1) & (sizes[jj] == 1)
            if both1.any():
                a = sids[starts[gi[both1]]]
                b = sids[starts[jj[both1]]]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))
                out_d.append(d[ii[both1], jj[both1]].astype(np.int64))
            for k in np.nonzero(~both1)[0]:
                a = sids[starts[gi[k]]:ends[gi[k]]]
                b = sids[starts[jj[k]]:ends[jj[k]]]
                aa = np.repeat(a, len(b))
                bb = np.tile(b, len(a))
                out_a.append(np.minimum(aa, bb))
                out_b.append(np.maximum(aa, bb))
                out_d.append(np.full(len(aa), d[ii[k], jj[k]], dtype=np.int64))
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"doc_a": pd.Series(np.concatenate(out_a), dtype="int64"),
             "doc_b": pd.Series(np.concatenate(out_b), dtype="int64"),
             "hamming": pd.Series(np.concatenate(out_d), dtype="int64")}
        )

    parts = _parts_for(sf_dir, "documents")
    pairs = _bucketed_pairs(ds, "band_key", bucket_pairs, num_parts=parts)
    # the pair stream is candidate-sized (≪ corpus rows): a corpus-sized
    # partition count here only multiplies fixed shuffle-task overhead —
    # same sizing rule that recovered dedup_minhash_verified in round 4
    return _hash_grouped(
        pairs, ["doc_a", "doc_b"],
        lambda df: df.groupby(["doc_a", "doc_b"], as_index=False, sort=True)
        ["hamming"].min().astype({"hamming": "int64"}),
        num_parts=max(2, min(parts, 8)),
    )


def dedup_embedding_pairs(sf_dir: str, threshold: float = 0.97,
                          bands: int = dd.EMB_LSH_BANDS,
                          bits: int = dd.EMB_LSH_BITS):
    """Embedding-cosine near-dup pairs via BANDED random-hyperplane LSH.

    Each vector emits one row per band (8 bands × 10 sign bits — see
    ``dedup.cosine_lsh_band_keys`` for the recall math: ≈0.99 at cosine
    0.97 vs ≈0.27 for a single 16-plane table); candidates are pairs
    sharing ANY band bucket, cosine-verified inside the bucket, then a
    tiny pair-keyed groupby collapses multi-band hits.  The shuffle
    volume is bands × (key, id, vector) — the standard multi-band LSH
    trade of bounded replication for recall; hyperplanes are a seeded
    module constant, identical in every task."""
    import numpy as np

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"bucket": pd.Series(dtype="int64"),
                 "vec_id": pd.Series(dtype="int64"),
                 "vec": pd.Series(dtype=object)})
        m = sim.batch_to_matrix(df["embedding"].to_numpy())
        planes = dd.hyperplanes(m.shape[1], bands * bits)
        keys = dd.cosine_lsh_band_keys(m, planes, bands, bits)  # (n, bands)
        # vectors travel the two exchanges as packed float64 bytes, not
        # per-element pickled ndarrays (~2x less pickle).  float64 — not
        # float32 — so the in-bucket cosine verify computes on exactly
        # the values the brute/oracle paths use: a pair whose true cosine
        # sits within float32 rounding of the threshold must not flip
        vec_bytes = np.array(
            [row.tobytes() for row in m], dtype=object)
        return pd.DataFrame(
            {"bucket": pd.Series(keys.reshape(-1), dtype="int64"),
             "vec_id": pd.Series(
                 np.repeat(df["vec_id"].to_numpy(dtype=np.int64), bands),
                 dtype="int64"),
             "vec": pd.Series(vec_bytes.repeat(bands), dtype=object)}
        )

    ds = ds.map_batches(key, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"),
                 "vec_b": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")})
        df = df.sort_values("vec_id")
        ids = df["vec_id"].to_numpy(dtype="int64")
        m = np.frombuffer(
            b"".join(df["vec"].tolist()), dtype=np.float64
        ).reshape(len(df), -1)
        m = sim.normalize_rows(m)
        s = m @ m.T
        hit = (s >= threshold) & (ids[:, None] < ids[None, :])
        ii, jj = np.nonzero(hit)
        return pd.DataFrame(
            {"vec_a": pd.Series(ids[ii], dtype="int64"),
             "vec_b": pd.Series(ids[jj], dtype="int64"),
             "cosine": pd.Series(s[ii, jj], dtype="float64")}
        )

    parts = _parts_for(sf_dir, "embeddings")
    pairs = _bucketed_pairs(ds, "bucket", bucket_pairs, num_parts=parts)
    # a pair surfaces once per agreeing band → collapse on the pair key
    pairs = _hash_grouped(
        pairs, ["vec_a", "vec_b"],
        lambda df: df.groupby(["vec_a", "vec_b"], as_index=False, sort=True)
        ["cosine"].max(),
        num_parts=parts,
    )
    df = pairs.to_pandas()
    if df.empty:  # stable schema even when the corpus has no near-dups
        df = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                           "vec_b": pd.Series(dtype="int64"),
                           "cosine": pd.Series(dtype="float64")})
    return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def embedding_pairs_brute(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """All-pairs cosine ≥ threshold, brute force vs a broadcast matrix.

    The full (id, vector) matrix is broadcast once and each batch
    compares only against ids greater than its own (each pair emitted
    exactly once).  This is the oracle-scale exactness baseline for
    :func:`dedup_embedding_pairs`; at 100 TB the broadcast side must be
    a filtered candidate subset, not the corpus.
    Returns (vec_a, vec_b) ids only → SQL-comparable."""
    import numpy as np

    all_df = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    all_df = all_df.sort_values("vec_id")
    ids_all = all_df["vec_id"].to_numpy(dtype="int64")
    m_all = sim.normalize_rows(sim.batch_to_matrix(all_df["embedding"].to_numpy()))

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def pairs_fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(dtype="int64")
        m = sim.normalize_rows(sim.batch_to_matrix(df["embedding"].to_numpy()))
        s = m @ m_all.T
        hit = (s >= threshold) & (ids[:, None] < ids_all[None, :])
        ii, jj = np.nonzero(hit)
        return pd.DataFrame(
            {"vec_a": pd.Series(ids[ii], dtype="int64"),
             "vec_b": pd.Series(ids_all[jj], dtype="int64")}
        )

    out = ds.map_batches(pairs_fn, batch_format="pandas").to_pandas()
    if out.empty:
        out = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                            "vec_b": pd.Series(dtype="int64")})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


# --- similarity search ------------------------------------------------


def _query_vectors(sf_dir: str, n_queries: int):
    """First ``n_queries`` vec_ids as the query set (deterministic)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def only_q(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.less(batch["vec_id"], n_queries))

    q = ds.map_batches(only_q, batch_format="pyarrow").to_pandas()
    q = q.sort_values("vec_id")
    return q["vec_id"].tolist(), sim.batch_to_matrix(q["embedding"].to_numpy())


def ann_brute_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pd.DataFrame:
    """Brute-force cosine top-k (exact baseline): per-block local top-k
    against the broadcast query matrix, tiny global reduce.

    Returns (qid, vec_id, rank) — ids only, so the DuckDB oracle
    (list_cosine_similarity + row_number) compares exactly."""
    qids, qmat = _query_vectors(sf_dir, n_queries)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cands = ds.map_batches(
        sim.BruteTopK,
        fn_constructor_kwargs=dict(query_ids=qids, query_matrix=qmat, k=k),
        batch_format="pandas",
        concurrency=(1, 8),  # autoscale with block count (1 block at test SFs)
        num_cpus=0.5,  # light stage: never starve the upstream read
    ).to_pandas()
    out = sim.global_topk(cands, k)
    return out[["qid", "vec_id", "rank"]]


def ann_ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                 n_clusters: int = 16, nprobe: int = 8) -> pd.DataFrame:
    """IVF top-k (scale path): coarse codebook from a driver sample,
    cell assignment in map_batches, probe only nprobe cells per query."""
    import numpy as np

    qids, qmat = _query_vectors(sf_dir, n_queries)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # k-means sample: deterministic id-hash filter, NOT limit(2048) —
    # limit takes the first file region and biases the codebook toward
    # whatever cluster structure that region happens to hold
    from ..sources.tables import table_rows

    total = table_rows(sf_dir, "embeddings")
    cap = min(1.0, 4096.0 / max(1, total))
    thresh = int(cap * (1 << 32))

    def sample_filter(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["vec_id"].to_numpy().astype(np.uint64)
        keep = ((ids * np.uint64(2654435761)) % np.uint64(1 << 32)
                < np.uint64(thresh))
        return batch.filter(pa.array(keep))

    sample = ds.map_batches(sample_filter, batch_format="pyarrow").to_pandas()
    centroids = sim.kmeans_fit(
        sim.batch_to_matrix(sample["embedding"].to_numpy()), n_clusters
    )
    assigned = ds.map_batches(
        sim.IVFAssign, fn_constructor_kwargs=dict(centroids=centroids),
        batch_format="pandas", concurrency=(1, 8), num_cpus=0.5,
    )
    probes = sim.probe_cells(qmat, centroids, nprobe)
    probe_sets = [set(map(int, row)) for row in probes]

    class ProbedTopK(sim.BruteTopK):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for qi, cells in enumerate(probe_sets):
                hit = batch[batch["ivf_cell"].isin(cells)]
                if hit.empty:
                    continue
                ids = hit["vec_id"].to_numpy(dtype=np.int64)
                m = sim.batch_to_matrix(hit["embedding"].to_numpy())
                sims = sim.cosine_matrix(self.q[qi:qi + 1], m)[0]
                sims[ids == self.qids[qi]] = -np.inf
                # mirror BruteTopK: the masked self-row (or any non-finite
                # sim) must never receive a rank when the probed cells
                # hold fewer than k vectors
                finite = np.isfinite(sims)
                ids_f, sims_f = ids[finite], sims[finite]
                kk = min(self.k, len(ids_f))
                if kk:
                    # same boundary-tie rule as BruteTopK: everything at
                    # or above the k-th sim, ordered (sim desc, id asc),
                    # then cut — a bare argpartition drops tied
                    # candidates arbitrarily per block
                    kth = -np.partition(-sims_f, kk - 1)[kk - 1]
                    cand = np.flatnonzero(sims_f >= kth)
                    order = np.lexsort((ids_f[cand], -sims_f[cand]))
                    idx = cand[order][:kk]
                else:
                    idx = []
                outs.append(pd.DataFrame(
                    {"qid": pd.Series([self.qids[qi]] * len(idx), dtype="int64"),
                     "vec_id": pd.Series(ids_f[idx], dtype="int64"),
                     "sim": pd.Series(sims_f[idx], dtype="float64")}
                ))
            if not outs:
                return pd.DataFrame(
                    {"qid": pd.Series(dtype="int64"),
                     "vec_id": pd.Series(dtype="int64"),
                     "sim": pd.Series(dtype="float64")})
            return pd.concat(outs, ignore_index=True)

    cands = assigned.map_batches(
        ProbedTopK,
        fn_constructor_kwargs=dict(query_ids=qids, query_matrix=qmat, k=k),
        batch_format="pandas", concurrency=(1, 8), num_cpus=0.5,
    ).to_pandas()
    out = sim.global_topk(cands, k)
    return out[["qid", "vec_id", "rank"]]


# --- TF-IDF / stratified sampling / source mixing ---------------------
#
# Training-corpus construction operators beyond dedup: per-document
# salient-term scoring, deterministic per-stratum sampling, and
# source-ratio mixing.  All three keep the driver answer-sized and the
# exchanges bounded by (doc, term) pairs or ids — never text.


TFIDF_TOP_M = 5


def doc_tfidf_top(sf_dir: str, m: int = TFIDF_TOP_M):
    """Top-``m`` salient terms per document by a log-free TF-IDF
    surrogate: ``score = floor(tf * 1_000_000 / df)``.

    The log-free form exists for bit-exact cross-engine parity: ``tf``
    and ``df`` are small exact integers, ``tf * 1e6`` is exactly
    representable, and IEEE double division + floor round identically
    in numpy and DuckDB — whereas ``ln()`` is libm-dependent and can
    flip a fixed-point floor on the last ulp.  Ranking by tf/df orders
    identically to tf·log(N/df) whenever df differs (monotone in both
    factors); it is the standard relevance shape, not a toy.

    Scale shape (two MapReduce rounds, the canonical TF-IDF plan):

    1. per batch, each document collapses to (doc_id, term, tf) —
       exact because a document's text is one row (the exchange
       carries unique terms per doc, never occurrences);
    2. hash-partition by term: df = group size per term (exact — all
       rows of a term co-locate), attached to the pairs in-partition
       (no second scan);
    3. hash-partition by doc_id: score + per-doc top-``m`` (ties break
       term-lexicographic).  Output ∝ m × docs; nothing corpus-sized
       on the driver.
    """
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_pairs(df: pd.DataFrame) -> pd.DataFrame:
        s = (df["text"].astype("string").fillna("")
             .astype(str).str.split(" ").explode())
        pairs = pd.DataFrame(
            {"doc_id": df["doc_id"].reindex(s.index).astype("int64"),
             "term": s})
        pairs = pairs[pairs["term"] != ""]
        out = pairs.groupby(["doc_id", "term"], as_index=False).size()
        return pd.DataFrame({"doc_id": out["doc_id"].astype("int64"),
                             "term": out["term"].astype(str),
                             "tf": out["size"].astype("int64")})

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["df"] = (df.groupby("term")["doc_id"].transform("size")
                    .astype("int64"))
        return df

    def topm(df: pd.DataFrame) -> pd.DataFrame:
        score = np.floor(
            df["tf"].to_numpy("float64") * 1_000_000.0
            / df["df"].to_numpy("float64")).astype("int64")
        df = df.assign(score=score)
        df = df.sort_values(["doc_id", "score", "term"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("doc_id", as_index=False, sort=False).head(m)
        return df[["doc_id", "term", "tf", "df", "score"]]

    with_df = _hash_grouped(
        ds.map_batches(tf_pairs, batch_format="pandas"),
        ["term"], attach_df, num_parts=32)
    return _hash_grouped(with_df, ["doc_id"], topm, num_parts=32)


def doc_tfidf_top_sql(m: int = TFIDF_TOP_M) -> str:
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) tf
       FROM toks WHERE term <> '' GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS BIGINT) df FROM tf GROUP BY 1),
s AS (SELECT tf.doc_id, tf.term, tf.tf, dft.df,
             CAST(floor(tf.tf * 1000000.0 / dft.df) AS BIGINT) score
      FROM tf JOIN dft USING (term))
SELECT doc_id, term, tf, df, score FROM
  (SELECT *, row_number() OVER (PARTITION BY doc_id
       ORDER BY score DESC, term) r FROM s)
WHERE r <= {m}
""".strip()


SAMPLE_PER_STRATUM = 20


def doc_sample_stratified(sf_dir: str, n: int = SAMPLE_PER_STRATUM):
    """Deterministic stratified sample: the ``n`` documents per language
    with the smallest ``md5(doc_id)`` — a seedless, order-free,
    cluster-size-independent pick (the hash IS the random order, as in
    :func:`doc_split`), used for per-language eval-set carving.

    Scale shape: each batch keeps at most ``n`` rows per stratum (only
    a batch's n smallest hashes can win globally — a combiner, so the
    exchange carries ≤ n × strata × blocks id-rows), then one
    hash-partition by stratum selects exactly (same stratum → same
    partition).  Output = n × strata rows.
    """
    from ..functions import dedup as _dd

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        out = pd.DataFrame(
            {"lang": df["lang"].astype(str).to_numpy(),
             "doc_id": ids.to_numpy(),
             "h": _dd.md5_hex_series(ids.astype(str)).to_numpy(dtype=object)})
        out = out.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        return out.groupby("lang", as_index=False, sort=False).head(n)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        df = df.groupby("lang", as_index=False, sort=False).head(n)
        r = df.groupby("lang").cumcount() + 1
        return pd.DataFrame({"lang": df["lang"].astype(str),
                             "doc_id": df["doc_id"].astype("int64"),
                             "rank": r.astype("int64")})

    return _hash_grouped(ds.map_batches(keyed, batch_format="pandas"),
                         ["lang"], pick, num_parts=16)


def doc_sample_stratified_sql(n: int = SAMPLE_PER_STRATUM) -> str:
    return f"""
SELECT lang, doc_id, CAST(r AS BIGINT) AS rank FROM
  (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) r FROM documents)
WHERE r <= {n}
""".strip()


# source → sampling ratio for corpus_mix; sources absent from the map
# use MIX_DEFAULT_RATIO.  A ratio ≥ 1.0 keeps every row.
MIX_RATIOS = {"src0": 0.25, "src1": 0.5, "src2": 0.75}
MIX_DEFAULT_RATIO = 0.5


def _ratio_hex(r: float) -> str:
    """Keep-threshold for ``substr(md5(id),1,4) < threshold``: the first
    4 hex chars of md5 are uniform over 0..65535, so a ratio maps to
    ``%04x`` of ``floor(r * 65536)``.  Ratios ≥ 1.0 return ``"g"`` —
    lexicographically above every hex string, i.e. keep-all — so the
    same single compare handles the no-op case in both engines."""
    import numpy as np

    b = int(np.floor(r * 65536.0))
    return "g" if b >= 65536 else format(max(b, 0), "04x")


def corpus_mix(sf_dir: str, ratios: dict[str, float] | None = None,
               default_ratio: float = MIX_DEFAULT_RATIO):
    """Source-ratio corpus mixing: keep a deterministic
    ``ratios[source]`` fraction of each source's documents — the
    data-mixture step of training-corpus assembly (up/down-weighting
    crawls vs curated sources).

    Membership is ``md5(doc_id)``-hashed (stable across runs, cluster
    sizes and shard layouts; joinable from any table), so reruns and
    incremental appends select consistently.  Pure map stage: no
    shuffle, no state, output ∝ Σ ratio·|source|.
    """
    from ..functions import dedup as _dd

    rat = dict(MIX_RATIOS if ratios is None else ratios)
    thr_map = {s: _ratio_hex(r) for s, r in rat.items()}
    dflt = _ratio_hex(default_ratio)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        h4 = _dd.md5_hex_series(ids.astype(str)).str.slice(0, 4)
        thr = df["source"].astype(str).map(thr_map).fillna(dflt)
        keep = (h4 < pd.Series(thr, dtype="string")).fillna(False)
        kept = df[keep.to_numpy(dtype=bool)]
        return pd.DataFrame(
            {"doc_id": kept["doc_id"].astype("int64"),
             "source": kept["source"].astype(str)})

    return ds.map_batches(fn, batch_format="pandas")


def corpus_mix_sql(ratios: dict[str, float] | None = None,
                   default_ratio: float = MIX_DEFAULT_RATIO) -> str:
    rat = dict(MIX_RATIOS if ratios is None else ratios)
    cases = " ".join(
        f"WHEN '{s}' THEN '{_ratio_hex(r)}'" for s, r in sorted(rat.items()))
    return f"""
SELECT doc_id, source FROM
  (SELECT doc_id, source,
          substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) h4 FROM documents)
WHERE h4 < CASE source {cases} ELSE '{_ratio_hex(default_ratio)}' END
""".strip()


def corpus_source_report(sf_dir: str) -> pd.DataFrame:
    """Per-source corpus health report: document count, quality-gate
    pass count, total tokens, and distinct language count — the
    dashboard a training-data pipeline reads before choosing mix
    ratios (pairs with :func:`corpus_mix`).

    Scale shape: the text-stats kernel runs where the text lives; each
    batch collapses to one row per (source, lang) — counts and token
    sums are additive, and distinct-language needs the (source, lang)
    key itself, so the long partial IS the minimal exchange (≤ sources
    × langs × blocks rows).  The driver reduce is answer-sized.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        stats = ts.text_stats_frame(df["text"])
        tmp = pd.DataFrame(
            {"source": df["source"].astype(str).to_numpy(),
             "lang": df["lang"].astype(str).to_numpy(),
             "n_tokens": stats["n_tokens"].to_numpy(),
             "ok": stats["quality_ok"].to_numpy().astype("int64")})
        g = tmp.groupby(["source", "lang"], as_index=False).agg(
            p_n=("ok", "size"), p_ok=("ok", "sum"),
            p_tokens=("n_tokens", "sum"))
        return g.astype({"p_n": "int64", "p_ok": "int64",
                         "p_tokens": "int64"})

    long = (ds.map_batches(partial, batch_format="pandas")).to_pandas()
    bylang = long.groupby(["source", "lang"], as_index=False).sum()
    out = bylang.groupby("source", as_index=False).agg(
        n_docs=("p_n", "sum"), n_quality_ok=("p_ok", "sum"),
        sum_tokens=("p_tokens", "sum"), n_langs=("lang", "nunique"))
    for c in ("n_docs", "n_quality_ok", "sum_tokens", "n_langs"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def corpus_source_report_sql() -> str:
    return f"""
WITH stats AS ({ts.text_stats_sql()})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (s.quality_ok) AS BIGINT) AS n_quality_ok,
       CAST(sum(s.n_tokens) AS BIGINT) AS sum_tokens,
       CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs
FROM documents d JOIN stats s USING (doc_id)
GROUP BY d.source ORDER BY d.source
""".strip()


def doc_lm_score(sf_dir: str):
    """Per-document count-based LM familiarity score: for every bigram
    instance in a doc, add the CORPUS-WIDE occurrence count of that
    bigram — a cheap n-gram language-model likelihood proxy (high =
    boilerplate/templated text, low = rare constructions), the standard
    count-based cousin of perplexity filtering for training-data
    curation.  Docs with fewer than 2 tokens have no bigrams and drop
    out (mirrors the oracle's inner join).

    Scale shape — the global counts are never built as a separate
    table: each block collapses to per-(doc, bigram) instance counts
    (combiner), ONE bigram-hash exchange co-locates every occurrence of
    a bigram, so the partition derives the bigram's global count with a
    C-speed ``transform("sum")`` over its own rows and immediately
    re-collapses to per-doc partial scores (partition-sized, not
    instance-sized); a second doc-hash exchange sums partials exactly.
    Nothing corpus-sized ever reaches the driver — the result stays a
    Dataset with one row per scoring-eligible doc."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        df = df.reset_index(drop=True)
        s = (df["text"].astype("string").fillna("")
             .astype(str).str.split(" ").explode())
        s = s[s != ""]
        vals = s.to_numpy(dtype=object)
        idx = s.index.to_numpy()
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "bigram": pd.Series(dtype=object),
                              "o": pd.Series(dtype="int64")})
        if len(vals) < 2:
            return empty
        same_doc = idx[:-1] == idx[1:]
        if not same_doc.any():
            return empty
        docs = df["doc_id"].to_numpy("int64")[idx[:-1][same_doc]]
        left = pd.Series(vals[:-1][same_doc])
        big = left.str.cat(pd.Series(vals[1:][same_doc]), sep=" ")
        g = (pd.DataFrame({"doc_id": docs, "bigram": big.to_numpy(object)})
             .groupby(["doc_id", "bigram"], as_index=False).size()
             .rename(columns={"size": "o"}))
        return g.astype({"doc_id": "int64", "o": "int64"})

    def per_bigram_part(df: pd.DataFrame) -> pd.DataFrame:
        # all partials of a bigram are in this partition → its global
        # count is an in-partition sum; weight each doc's instances by it
        tot = df.groupby("bigram")["o"].transform("sum")
        w = df["o"].to_numpy("int64") * tot.to_numpy("int64")
        g = (pd.DataFrame({"doc_id": df["doc_id"].to_numpy("int64"),
                           "p_score": w,
                           "p_n": df["o"].to_numpy("int64")})
             .groupby("doc_id", as_index=False)[["p_score", "p_n"]].sum())
        return g.astype({"doc_id": "int64", "p_score": "int64",
                         "p_n": "int64"})

    def per_doc_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)[["p_score", "p_n"]].sum()
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                             "lm_score": g["p_score"].astype("int64"),
                             "n_bigrams": g["p_n"].astype("int64")})

    partials = _hash_grouped(
        ds.map_batches(pair_partial, batch_format="pandas"),
        ["bigram"], per_bigram_part, num_parts=_parts_for(sf_dir, "documents"))
    return _hash_grouped(partials, ["doc_id"], per_doc_part,
                         num_parts=_parts_for(sf_dir, "documents"))


def doc_lm_score_sql() -> str:
    return """
WITH t AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ts
           FROM documents),
 b AS (SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bigram
       FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
             FROM t)),
 c AS (SELECT bigram, count(*) AS n FROM b GROUP BY 1)
SELECT b.doc_id, CAST(sum(c.n) AS BIGINT) AS lm_score,
       CAST(count(*) AS BIGINT) AS n_bigrams
FROM b JOIN c USING (bigram) GROUP BY 1
""".strip()


def doc_quality_model(sf_dir: str, concurrency: int = 4):
    """Learned-filter plumbing: score every document with the
    deterministic linear quality model as an ACTOR-POOL
    ``map_batches`` stage (weights load once per actor in
    ``QualityModel.__init__``, batches score as one int64 matvec) —
    the standard shape for classifier/toxicity/perplexity filters over
    a 100-TB corpus.  Pure map, zero shuffles; returns a Dataset of
    (doc_id, quality_score, keep).  See
    :mod:`..stages.quality_model` for the exact-integer model and its
    bit-identical DuckDB mirror."""
    from ..stages.quality_model import QualityModel

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # autoscaling pool (1..N): a small input shouldn't pin N idle
    # actors; a 100-TB read fans out to enough blocks to fill the pool
    return ds.map_batches(QualityModel, batch_format="pandas",
                          concurrency=(1, concurrency))


# conservative patterns that parse identically under Python re (Ray
# side) and RE2 (DuckDB oracle): no lookaround, no backrefs
PII_EMAIL = r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z][a-z]+"
PII_PHONE = r"\+?[0-9][0-9() \-]{6,}[0-9]"


def _pii_scrub_series(texts: pd.Series):
    """Shared email→phone two-step scrub: returns (clean, n_redactions).
    The ordering is a correctness invariant (digits inside an address
    must never double-count as a phone) — kept in ONE place so
    :func:`doc_pii_scrub` and :func:`corpus_prepare` can't drift from
    each other or from the shared SQL oracle fragments."""
    t = texts.astype("string").fillna("")
    n_email = t.str.count(PII_EMAIL).astype("int64")
    c1 = t.str.replace(PII_EMAIL, "<email>", regex=True)
    n_phone = c1.str.count(PII_PHONE).astype("int64")
    clean = c1.str.replace(PII_PHONE, "<phone>", regex=True)
    return clean, (n_email + n_phone).astype("int64")


def doc_pii_scrub(sf_dir: str):
    """PII redaction pass: replace email addresses and phone-like
    digit runs with ``<email>`` / ``<phone>`` tokens and count the
    redactions — a mandatory pre-training hygiene map over web text.
    Pure vectorized map (pandas C-regex per batch), zero shuffles.
    Emails are scrubbed FIRST and phones counted on the email-scrubbed
    text, so digits inside an address never double-count; the SQL
    oracle applies the same two-step order.  (The synthetic corpus
    itself contains no PII — the planted-PII pytest is where the
    redaction behavior is actually exercised; over real web text this
    is the hot path.)"""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        clean, n_red = _pii_scrub_series(df["text"])
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "text_clean": clean.astype(str),
             "n_redactions": n_red})

    return ds.map_batches(fn, batch_format="pandas")


def doc_pii_scrub_sql() -> str:
    return f"""
WITH s1 AS (SELECT doc_id,
                   regexp_replace(coalesce(text, ''), '{PII_EMAIL}',
                                  '<email>', 'g') AS c1,
                   len(regexp_extract_all(coalesce(text, ''),
                                          '{PII_EMAIL}')) AS ne
            FROM documents)
SELECT doc_id,
       regexp_replace(c1, '{PII_PHONE}', '<phone>', 'g') AS text_clean,
       CAST(ne + len(regexp_extract_all(c1, '{PII_PHONE}')) AS BIGINT)
           AS n_redactions
FROM s1
""".strip()


def corpus_prepare(sf_dir: str, concurrency: int = 4):
    """The composed end-to-end corpus-preparation pipeline — the four
    hygiene stages a real pre-training corpus runs, as ONE streaming
    Dataset flow: quality gate → exact dedup (keep min doc_id per
    content digest) → PII scrub → quality-model filter.  Returns the
    surviving corpus (doc_id, lang, source, text_clean, quality_score,
    n_redactions).

    Scale shape: the gate drops junk rows AT THE SCAN (nothing dead
    rides further); ONE content-sized digest-hash exchange performs the
    keep-one — unlike ``corpus_clean`` (which emits only ids, so its
    exchange ships digests), the composed pipeline must move each
    surviving document's payload exactly once to wherever its digest
    group lands; the PII scrub then streams per batch, and the
    quality-model stage runs as the actor pool in passthrough mode
    (weights built once per actor, payload columns flow through).
    Nothing corpus-sized ever reaches the driver — the result stays a
    Dataset.  The DuckDB oracle nests the same four steps as CTEs, so
    every stage boundary is bit-checked, not just the final rows."""
    from ..stages.quality_model import QualityModel

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        # filter FIRST: the per-row md5 is the slowest kernel here, so
        # only gate survivors pay it
        keep = ts.text_stats_frame(df["text"])["quality_ok"].to_numpy()
        kept = df[keep]
        return pd.DataFrame(
            {"text_md5": dd.md5_hex_series(kept["text"])
             .to_numpy(dtype=object),
             "doc_id": kept["doc_id"].astype("int64").to_numpy(),
             "text": kept["text"].astype(str).to_numpy(dtype=object),
             "lang": kept["lang"].astype(str).to_numpy(dtype=object),
             "source": kept["source"].astype(str).to_numpy(dtype=object)})

    def keep_one(df: pd.DataFrame) -> pd.DataFrame:
        first = (df.sort_values(["text_md5", "doc_id"])
                 .groupby("text_md5", as_index=False).first())
        return first[["doc_id", "text", "lang", "source"]].astype(
            {"doc_id": "int64"})

    survivors = _hash_grouped(ds.map_batches(gate, batch_format="pandas"),
                              ["text_md5"], keep_one,
                              num_parts=_parts_for(sf_dir, "documents"))

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        clean, n_red = _pii_scrub_series(df["text"])
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "lang": df["lang"].astype(str),
             "source": df["source"].astype(str),
             # the model scores the SCRUBBED text, so the column keeps
             # the name the scoring stage expects
             "text": clean.astype(str),
             "n_redactions": n_red})

    scored = (survivors.map_batches(scrub, batch_format="pandas")
              .map_batches(QualityModel, batch_format="pandas",
                           fn_constructor_kwargs={"passthrough": True},
                           concurrency=(1, concurrency)))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        kept = df[df["keep"].to_numpy()]
        return pd.DataFrame(
            {"doc_id": kept["doc_id"].astype("int64"),
             "lang": kept["lang"].astype(str),
             "source": kept["source"].astype(str),
             "text_clean": kept["text"].astype(str),
             "quality_score": kept["quality_score"].astype("int64"),
             "n_redactions": kept["n_redactions"].astype("int64")})

    return scored.map_batches(finish, batch_format="pandas")


def corpus_prepare_sql() -> str:
    from ..stages.quality_model import quality_model_sql

    return f"""
WITH stats AS ({ts.text_stats_sql()}),
 gate AS (SELECT d.doc_id, d.text, d.lang, d.source
          FROM documents d JOIN stats s USING (doc_id)
          WHERE s.quality_ok),
 ded AS (SELECT gate.*, row_number() OVER (PARTITION BY md5(text)
                                           ORDER BY doc_id) rn
         FROM gate),
 win AS (SELECT doc_id, text, lang, source FROM ded WHERE rn = 1),
 p1 AS (SELECT doc_id, lang, source,
               regexp_replace(text, '{PII_EMAIL}', '<email>', 'g') AS c1,
               len(regexp_extract_all(text, '{PII_EMAIL}')) AS ne
        FROM win),
 p2 AS (SELECT doc_id, lang, source,
               regexp_replace(c1, '{PII_PHONE}', '<phone>', 'g') AS text,
               CAST(ne + len(regexp_extract_all(c1, '{PII_PHONE}'))
                    AS BIGINT) AS n_redactions
        FROM p1),
 qm AS ({quality_model_sql(table="p2")})
SELECT p2.doc_id, p2.lang, p2.source, p2.text AS text_clean,
       qm.quality_score, p2.n_redactions
FROM p2 JOIN qm USING (doc_id) WHERE qm.keep
""".strip()


def doc_word_repetition(sf_dir: str) -> pd.DataFrame:
    """Per-document lexical repetition signals — the Gopher-style
    within-doc quality gate family (duplicate-word fraction + the top
    word's share): docs whose tokens are dominated by a few repeated
    words are boilerplate/spam candidates a training-data pipeline
    filters before dedup.

    Scale shape: a PURE MAP stage — one explode + one per-(doc, word)
    C-speed groupby per batch, no exchange at all (every signal is
    intra-document); ``dup_ratio_e4`` is integer floor-division so the
    DuckDB oracle matches bit-for-bit.  Zero-word docs drop out (the
    ratio is undefined), mirroring the SQL inner unnest."""
    import numpy as np

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)  # explode() keys rows by position
        s = (df["text"].astype("string").fillna("")
             .astype(str).str.split(" ").explode())
        s = s[s != ""]
        if len(s) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "n_words": pd.Series([], dtype="int64"),
                 "n_distinct_words": pd.Series([], dtype="int64"),
                 "top_word_count": pd.Series([], dtype="int64"),
                 "dup_ratio_e4": pd.Series([], dtype="int64")})
        per = (pd.DataFrame({"i": s.index.to_numpy(),
                             "w": s.to_numpy(dtype=object)})
               .groupby(["i", "w"], sort=False).size())
        agg = per.groupby(level=0).agg(["sum", "size", "max"])
        n_words = agg["sum"].to_numpy("int64")
        n_dist = agg["size"].to_numpy("int64")
        top = agg["max"].to_numpy("int64")
        doc_ids = df["doc_id"].to_numpy("int64")[
            agg.index.to_numpy("int64")]
        return pd.DataFrame(
            {"doc_id": doc_ids,
             "n_words": n_words,
             "n_distinct_words": n_dist,
             "top_word_count": top,
             "dup_ratio_e4": (n_words - n_dist) * 10000 // n_words})

    out = (ds.map_batches(stats, batch_format="pandas").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    return out


def doc_word_repetition_sql() -> str:
    return """
WITH w AS (SELECT doc_id,
                  unnest(list_filter(string_split(text, ' '),
                                     x -> x <> '')) AS word
           FROM documents),
per AS (SELECT doc_id, word, count(*) c FROM w GROUP BY 1, 2)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_distinct_words,
       CAST(max(c) AS BIGINT) AS top_word_count,
       CAST((sum(c) - count(*)) * 10000 // sum(c) AS BIGINT) AS dup_ratio_e4
FROM per GROUP BY doc_id ORDER BY doc_id
""".strip()


CMS_MERGE_FANIN = 16


def doc_term_heavy_hitters_cms(sf_dir: str, denom: int = None,
                               w: int = None, d: int = None) -> pd.DataFrame:
    """Approximate φ-heavy-hitters in ONE pass via a count-min sketch —
    the streaming sibling of :func:`doc_term_heavy_hitters` (whose
    exact pass 2 re-scans the corpus to re-count candidates; here the
    merged sketch answers the recount, trading a bounded overcount for
    the second scan).  Completes the sketch family: HLL (distinct),
    t-digest (quantiles), CMS (frequencies).

    Guarantees: candidates come from the same per-block pigeonhole as
    the exact op (a global heavy hitter must be heavy in some block),
    so no true heavy hitter is missed; CMS estimates never undercount,
    so the result is a SUPERSET of the exact answer whose spurious
    extras overshoot by ≤ e·N/w each (w = 2^16 here → at most a
    handful at any realistic vocabulary skew).

    Scale shape: each block emits ONE fixed-size sketch row (d·w int64
    counters as bytes, keyed to one of {fanin} merge buckets) plus its
    ≤ denom pigeonhole candidates; sketch rows merge inside the keyed
    exchange (elementwise add — a deeper tree generalizes the single
    level if block count × sketch size outgrows one task) and the
    driver folds the ≤ {fanin} merged tables + dedups candidates —
    nothing corpus-sized anywhere."""
    import numpy as np

    from ..functions import sketches as sk
    from ..functions.dedup import _token_hashes

    if denom is None:
        denom = HH_DENOM
    w = w or sk.CMS_W_DEFAULT
    d = d or sk.CMS_D_DEFAULT

    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = (df["text"].astype("string").fillna("")
             .astype(str).str.split(" ").explode())
        s = s[s != ""]
        vc = s.value_counts(sort=False)
        terms = vc.index.to_numpy(dtype=object)
        counts = vc.to_numpy(dtype="int64")
        hashes = _token_hashes(list(terms))
        table = sk.cms_from_hashes(hashes, counts, w, d)
        n_block = int(counts.sum())
        cand = counts * denom > n_block
        sub = (n_block + len(df)) % CMS_MERGE_FANIN  # spread merge load
        rows = {
            "term": np.r_[np.array([""], dtype=object), terms[cand]],
            "h": np.r_[np.zeros(1, dtype="int64"),
                       hashes[cand].view(np.int64)],
            "c": np.r_[np.array([n_block], dtype="int64"),
                       counts[cand]],
            "sub": np.r_[np.array([sub], dtype="int64"),
                         np.full(int(cand.sum()), -1, dtype="int64")],
            "blob": np.r_[np.array([table.tobytes()], dtype=object),
                          np.full(int(cand.sum()), b"", dtype=object)],
        }
        return pd.DataFrame(rows)

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        # a partition may hold BOTH sketch rows and (if the hash of the
        # "-1" key lands on it) candidate rows — keep both: merged
        # sketch + deduped candidates
        sketch = df[df["sub"] >= 0]
        cands = df[df["sub"] < 0].drop_duplicates("term")
        frames = [cands.reset_index(drop=True)]
        if len(sketch):
            tables = [np.frombuffer(b, dtype=np.int64).reshape(d, w)
                      for b in sketch["blob"]]
            merged = sk.cms_merge(tables)
            frames.append(pd.DataFrame(
                {"term": pd.Series([""], dtype=object),
                 "h": np.zeros(1, dtype="int64"),
                 "c": np.array([int(sketch["c"].sum())], dtype="int64"),
                 "sub": np.zeros(1, dtype="int64"),
                 "blob": pd.Series([merged.tobytes()], dtype=object)}))
        return pd.concat(frames, ignore_index=True)

    folded = _hash_grouped(ds.map_batches(partial, batch_format="pandas"),
                           ["sub"], merge_part,
                           num_parts=CMS_MERGE_FANIN).to_pandas()
    sketch = folded[folded["blob"].map(len) > 0]
    cands = folded[folded["blob"].map(len) == 0].drop_duplicates("term")
    if len(sketch) == 0 or len(cands) == 0:
        return pd.DataFrame({"term": pd.Series(dtype=str),
                             "n_occ_est": pd.Series(dtype="int64")})
    table = sk.cms_merge(
        [np.frombuffer(b, dtype=np.int64).reshape(d, w)
         for b in sketch["blob"]])
    n_total = int(sketch["c"].sum())
    est = sk.cms_estimate(table, cands["h"].to_numpy("int64").view(np.uint64))
    # Python-int threshold on the answer-sized frame (no overflowable
    # numpy product; mirrors the exact op's integer-exact compare)
    keep = np.array([int(e) * denom > n_total for e in est], dtype=bool)
    out = pd.DataFrame({"term": cands["term"].to_numpy(dtype=object)[keep]
                        .astype(str),
                        "n_occ_est": est[keep]})
    return out.sort_values("term").reset_index(drop=True)


PACK_BUDGET_TOKENS = 4096
PACK_BUCKET = 1024  # doc_ids per prefix-sum bucket


def doc_pack_shards(sf_dir: str,
                    budget: int = PACK_BUDGET_TOKENS) -> pd.DataFrame:
    """Pack documents (in doc_id order) into fixed token-budget output
    shards — the training-data sharding step that turns a cleaned
    corpus into balanced sequence-packing inputs.  A doc's shard is
    ``(tokens before it) // budget``: a GLOBAL running sum, i.e. the
    distributed parallel-prefix shape (per-bucket local sums + an
    answer-sized offset ladder), not a per-entity window.

    Scale shape — two passes over the (tiny) per-doc count table, one
    over the corpus:

    - one corpus scan emits (doc_id, n_tokens) — two int64 columns;
    - bucket totals (``doc_id // {bucket}`` per bucket) reduce to the
      driver, which prefix-sums them into per-bucket offsets (one
      int64 per bucket; a deeper offset tree generalizes if the
      bucket ladder itself outgrows one node);
    - ONE bucket-keyed exchange sorts each bucket by doc_id, local-
      cumsums, adds the broadcast offset, and floor-divides — exact
      int64 arithmetic, so the DuckDB window oracle matches
      bit-for-bit."""
    import numpy as np
    import ray

    from ..functions.text_stats import TOKEN_PATTERN

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["text"].astype("string").fillna("")
             .astype(str).str.count(TOKEN_PATTERN).astype("int64"))
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "n_tokens": n,
                             "bucket": df["doc_id"].astype("int64")
                             // PACK_BUCKET})

    # materialize: the two-int64-column count table is consumed twice
    # (bucket totals + the keyed exchange) — without this the lazy
    # read + regex count would re-run over the whole corpus
    tok = ds.map_batches(counts, batch_format="pandas").materialize()

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bucket", as_index=False)["n_tokens"].sum()
        return g.rename(columns={"n_tokens": "t"}).astype(
            {"bucket": "int64", "t": "int64"})

    totals = (tok.map_batches(bucket_partial, batch_format="pandas")
              .to_pandas().groupby("bucket")["t"].sum().sort_index())
    # offsets[b] = tokens in all buckets before b (Python-int prefix:
    # the grand total is compared nowhere, but stay overflow-safe)
    offsets, acc = {}, 0
    for b, t in totals.items():
        offsets[int(b)] = acc
        acc += int(t)
    off_ref = ray.put(offsets)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        out = []
        for b, grp in df.groupby("bucket", sort=False):
            grp = grp.sort_values("doc_id", kind="mergesort")
            n = grp["n_tokens"].to_numpy("int64")
            before = np.cumsum(n) - n + off[int(b)]
            out.append(pd.DataFrame(
                {"doc_id": grp["doc_id"].to_numpy("int64"),
                 "n_tokens": n,
                 "shard_id": before // budget}))
        if not out:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_tokens": pd.Series([], dtype="int64"),
                                 "shard_id": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    fin = _hash_grouped(tok, ["bucket"], assign, num_parts=16).to_pandas()
    return fin.sort_values("doc_id").reset_index(drop=True)


def doc_pack_shards_sql(budget: int = PACK_BUDGET_TOKENS) -> str:
    from ..functions.text_stats import TOKEN_PATTERN

    return f"""
WITH t AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}'))
                       AS BIGINT) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
                 AS before
      FROM t)
SELECT doc_id, n_tokens, CAST(before // {budget} AS BIGINT) AS shard_id
FROM c ORDER BY doc_id
""".strip()


# --- edit-distance similarity join (Pass-Join) --------------------------

EDIT_K = 4          # edit-distance threshold (the SQL oracle mirrors it)
EDIT_MIN_CHARS = 20  # docs shorter than this skip the join (a sub-k-long
#                      doc pairs with every other short doc — a hot
#                      trivial bucket; both sides of the oracle filter)


def _edit_segments(length: int, k: int = EDIT_K) -> list[tuple[int, int]]:
    """Even split of a ``length``-char string into k+1 contiguous
    segments (first ``length mod (k+1)`` segments one char longer) —
    the Pass-Join partition scheme (Li, Deng, Feng 2011): if
    ed(a, b) ≤ k, then b contains at least one of a's k+1 segments
    verbatim (each edit destroys at most one segment), at a position
    shifted by at most k."""
    segs = k + 1
    base, rem = divmod(length, segs)
    out, p = [], 0
    for i in range(segs):
        ln = base + (1 if i < rem else 0)
        out.append((p, ln))
        p += ln
    return out


def dedup_edit_pairs(sf_dir: str, k: int = EDIT_K,
                     min_chars: int = EDIT_MIN_CHARS):
    """Edit-distance similarity join: all doc pairs with full-text
    Levenshtein distance ≤ ``k`` — the METRIC near-dup operator next to
    the set-based families (Jaccard n-gram / MinHash) and the bitwise
    one (SimHash).  Candidates come from Pass-Join segment pigeonhole
    (index side: each doc's k+1 even segments keyed by (segment#,
    doc-length, content); probe side: every substring of the doc that
    could equal segment i of a doc whose length differs by ≤ k, shifted
    by ≤ k); verification is the banded O(len·k) DP
    (:func:`..functions.dedup.banded_levenshtein`), never the full
    quadratic matrix.

    Scale shape: THREE key-hash exchanges, none carrying text except
    where a candidate needs it — (1) segment-key rows (ids only;
    ≤ (k+1)·(2k+1)² ≈ 405 short rows per probe doc at k=4 — the
    documented enumeration constant; Pass-Join's multi-match-aware
    selection can cut it ~4× if it ever dominates) produce candidate
    id pairs, deduped per partition; (2) pair sides ∪ doc texts
    co-partition on doc_id to attach payloads (the
    dedup_minhash_verified attach shape); (3) pair-key partitions run
    the banded DP.  A segment shared verbatim by d docs emits ≤ d·p
    candidate rows in its one partition (p = probes matching it) —
    the same hot-key shape as dedup_ngram_pairs, whose df-block
    sub-partition guard applies if a corpus has megadup segments.

    Reference: the reference engine dedups only by exact content md5
    (spider/spider.js content_md5); this operator is part of the
    training-data layer's near-dup family, not a reference port."""
    import numpy as np

    from ..functions.dedup import banded_levenshtein

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"],
                 rows_per_block=512)

    key_schema = pa.schema([("key", pa.string()), ("doc_id", pa.int64()),
                            ("probe", pa.bool_())])

    def emit_keys(df: pd.DataFrame) -> pa.Table:
        # segment CONTENT rides as an 8-byte blake2b digest, not the raw
        # substring: full-text segments are ~len/(k+1) chars, and the
        # raw form puts ~100 MB through the key exchange at 500 docs
        # (measured 16 s → 6 s).  A digest collision can only ADD a
        # candidate (the banded-DP verify rejects it), never lose one.
        from hashlib import blake2b

        def seg_key(i: int, ls: int, seg: str) -> str:
            h = blake2b(seg.encode("utf-8", "surrogatepass"),
                        digest_size=8).hexdigest()
            return f"{i}|{ls}|{h}"

        df = df[df["n_chars"] >= min_chars]
        keys: list[str] = []
        ids: list[int] = []
        probe: list[bool] = []
        for did, t in zip(df["doc_id"].astype("int64"),
                          df["text"].fillna("")):
            t = str(t)
            l = len(t)
            seen: set[str] = set()
            for i, (st, ln) in enumerate(_edit_segments(l, k)):
                if ln == 0:
                    continue
                kk = seg_key(i, l, t[st:st + ln])
                if kk not in seen:
                    seen.add(kk)
                    keys.append(kk)
                    ids.append(int(did))
                    probe.append(False)
            pseen: set[str] = set()
            for ls in range(max(min_chars, l - k), l + k + 1):
                for i, (st, ln) in enumerate(_edit_segments(ls, k)):
                    if ln == 0:
                        continue
                    for dlt in range(-k, k + 1):
                        p0 = st + dlt
                        if p0 < 0 or p0 + ln > l:
                            continue
                        kk = seg_key(i, ls, t[p0:p0 + ln])
                        if kk not in pseen:
                            pseen.add(kk)
                            keys.append(kk)
                            ids.append(int(did))
                            probe.append(True)
        return pa.Table.from_pydict(
            {"key": keys, "doc_id": ids, "probe": probe}, schema=key_schema)

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def cand_pairs(df: pd.DataFrame) -> pa.Table:
        import numpy as np

        # prefilter in C before any per-key Python: almost every key is
        # a singleton (one doc's unique segment) — only keys carrying
        # BOTH an index row and a probe row can produce a candidate.
        # A python groupby over all keys measured 10.4 s at 166k keys;
        # the run-boundary scan below leaves a handful of groups.
        df = df.sort_values("key", kind="mergesort")
        k_arr = df["key"].to_numpy()
        if len(k_arr) == 0:
            return pair_schema.empty_table()
        new = np.concatenate([[True], k_arr[1:] != k_arr[:-1]])
        gid = np.cumsum(new) - 1
        pr_m = df["probe"].to_numpy()
        n_g = int(gid[-1]) + 1
        has_p = np.zeros(n_g, dtype=bool)
        has_i = np.zeros(n_g, dtype=bool)
        np.logical_or.at(has_p, gid, pr_m)
        np.logical_or.at(has_i, gid, ~pr_m)
        df = df[(has_p & has_i)[gid]]

        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for _, g in df.groupby("key", sort=False):
            pm = g["probe"].to_numpy()
            idx_ids = g["doc_id"].to_numpy("int64")[~pm]
            pr_ids = g["doc_id"].to_numpy("int64")[pm]
            if len(idx_ids) == 0 or len(pr_ids) == 0:
                continue
            A = np.repeat(idx_ids, len(pr_ids))
            B = np.tile(pr_ids, len(idx_ids))
            lo, hi = np.minimum(A, B), np.maximum(A, B)
            m = lo < hi
            out_a.append(lo[m])
            out_b.append(hi[m])
        if not out_a:
            return pair_schema.empty_table()
        pairs = (pd.DataFrame({"doc_a": np.concatenate(out_a),
                               "doc_b": np.concatenate(out_b)})
                 .drop_duplicates())
        return pa.Table.from_pandas(pairs, schema=pair_schema,
                                    preserve_index=False)

    parts = _parts_for(sf_dir, "documents", rows_per_part=600, lo=8)
    cands = _hash_grouped(docs.map_batches(emit_keys, batch_format="pandas"),
                          ["key"], cand_pairs, num_parts=parts)

    # attach texts via the shared pair-payload join: explode pairs to
    # (pair_key, side, doc_id) rows, co-partition with (doc_id, text)
    # rows, then verify per pair_key
    def doc_rows(df: pd.DataFrame) -> pa.Table:
        df = df[df["n_chars"] >= min_chars]
        return pa.Table.from_pydict(
            {"doc_id": df["doc_id"].astype("int64").tolist(),
             "payload": [str(t) for t in df["text"].fillna("")]},
            schema=pa.schema([("doc_id", pa.int64()),
                              ("payload", pa.string())]))

    co = _attach_pair_payloads(
        cands, docs.map_batches(doc_rows, batch_format="pandas"),
        pa.string(), num_parts=parts)

    out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("dist", pa.int64())])

    def verify(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["pair_key", "side"])
        oa: list[int] = []
        ob: list[int] = []
        od: list[int] = []
        for pk, g in df.groupby("pair_key", sort=False):
            if len(g) < 2:
                continue
            texts = g.sort_values("side")["payload"].tolist()
            d = banded_levenshtein(texts[0], texts[1], k)
            if d <= k:
                a_s, b_s = pk.split(":")
                oa.append(int(a_s))
                ob.append(int(b_s))
                od.append(d)
        return pa.Table.from_pydict({"doc_a": oa, "doc_b": ob, "dist": od},
                                    schema=out_schema)

    return _hash_grouped(co, ["pair_key"], verify, num_parts=max(8, parts // 2))


def dedup_edit_pairs_sql(k: int = EDIT_K,
                         min_chars: int = EDIT_MIN_CHARS) -> str:
    return f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= {k}
WHERE a.n_chars >= {min_chars} AND b.n_chars >= {min_chars}
  AND levenshtein(a.text, b.text) <= {k}
""".strip()


DEDUP_EDIT_PAIRS_SQL = dedup_edit_pairs_sql()


# --- semantic dedup (SemDeDup) ------------------------------------------

SEMDEDUP_K = 8          # centroid count (the SQL oracle mirrors it)
SEMDEDUP_THRESHOLD = 0.35  # within-cluster cosine dup threshold


def dedup_semantic(sf_dir: str, k_clusters: int = SEMDEDUP_K,
                   threshold: float = SEMDEDUP_THRESHOLD):
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    call a row a duplicate iff a LOWER-id row in the SAME cluster has
    cosine similarity ≥ ``threshold`` — semantic near-dup pruning that
    never compares across clusters, so the all-pairs cost is bounded by
    the largest cluster, not the corpus.

    For cross-engine exactness the centroids are not k-means fit but
    the embeddings of the ``k_clusters`` smallest vec_ids (a
    deterministic, SQL-expressible codebook; the IVF op keeps the
    k-means path).  Assignment is argmax cosine with ties to the
    smallest centroid id — bit-identical to the oracle's
    ``row_number() OVER (ORDER BY sim DESC, cid)`` pick because both
    sides compute float64 cosines on exactly-widened float32 inputs
    (testdata margins: min |sim − threshold| ≥ 7.8e-6 and min
    argmax gap ≥ 4.7e-5 across sf0.001-0.1, ~1e9 ULPs).

    Scale shape: the codebook is tiny and broadcast (closure capture
    here; ``ray.put`` on a real cluster); ONE cluster-key exchange
    ships each row once as (vec_id, cluster, float32 vector bytes —
    exact to widen, half the float64 bandwidth); each cluster partition
    runs one C matmul over its members.  Per-cluster all-pairs is the
    published SemDeDup design point — k_clusters grows with the corpus
    so cluster size stays bounded; a megacluster would take the same
    df-block sub-partition guard as dedup_ngram_pairs.

    Reference: the reference engine dedups only by exact content md5
    (spider/spider.js content_md5); this operator is part of the
    training-data layer's near-dup family, not a reference port."""
    import numpy as np

    cents = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def cent_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.less(batch["vec_id"], k_clusters))

    cdf = (cents.map_batches(cent_filter, batch_format="pyarrow")
           .to_pandas().sort_values("vec_id"))
    C = sim.batch_to_matrix(cdf["embedding"].to_numpy())  # (k, d) float64

    assign_schema = pa.schema([("vec_id", pa.int64()),
                               ("cluster", pa.int64()),
                               ("vb", pa.binary())])

    def assign(df: pd.DataFrame) -> pa.Table:
        ids = df["vec_id"].to_numpy(dtype="int64")
        m = sim.batch_to_matrix(df["embedding"].to_numpy())
        s = sim.cosine_matrix(m, C)
        cl = np.argmax(s, axis=1)  # first max → smallest centroid id
        vb = [r.astype(np.float32).tobytes() for r in m]
        return pa.Table.from_pydict(
            {"vec_id": ids, "cluster": cl.astype("int64"), "vb": vb},
            schema=assign_schema)

    out_schema = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64()),
                            ("kept", pa.int64())])

    def per_cluster(df: pd.DataFrame) -> pa.Table:
        ov: list[np.ndarray] = []
        oc: list[np.ndarray] = []
        ok: list[np.ndarray] = []
        for cl, g in df.groupby("cluster", sort=False):
            g = g.sort_values("vec_id")
            ids = g["vec_id"].to_numpy(dtype="int64")
            m = np.stack([np.frombuffer(b, dtype=np.float32).astype(np.float64)
                          for b in g["vb"]])
            s = sim.cosine_matrix(m, m)
            # dup iff any strictly-earlier (lower-id) member is ≥ thr:
            # strict lower triangle of the sorted-by-id sim matrix
            hit = (s >= threshold) & np.tri(len(ids), k=-1, dtype=bool)
            dup = hit.any(axis=1)
            ov.append(ids)
            oc.append(np.full(len(ids), int(cl), dtype="int64"))
            ok.append((~dup).astype("int64"))
        if not ov:
            return out_schema.empty_table()
        return pa.Table.from_pydict(
            {"vec_id": np.concatenate(ov), "cluster": np.concatenate(oc),
             "kept": np.concatenate(ok)}, schema=out_schema)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    parts = max(8, min(64, k_clusters))
    return _hash_grouped(ds.map_batches(assign, batch_format="pandas"),
                         ["cluster"], per_cluster, num_parts=parts)


def dedup_semantic_sql(k_clusters: int = SEMDEDUP_K,
                       threshold: float = SEMDEDUP_THRESHOLD) -> str:
    return f"""
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id < {k_clusters}),
s AS (SELECT e.vec_id, c.cid,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) AS sim
      FROM embeddings e, c),
a AS (SELECT vec_id, cid FROM
        (SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY sim DESC, cid) AS r FROM s)
      WHERE r = 1),
d AS (SELECT x.vec_id
      FROM a x JOIN a y ON x.cid = y.cid AND y.vec_id < x.vec_id
      JOIN embeddings ex ON ex.vec_id = x.vec_id
      JOIN embeddings ey ON ey.vec_id = y.vec_id
      WHERE list_cosine_similarity(CAST(ex.embedding AS DOUBLE[]),
                                   CAST(ey.embedding AS DOUBLE[]))
            >= {threshold}
      GROUP BY x.vec_id)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
       CAST(a.vec_id NOT IN (SELECT vec_id FROM d) AS BIGINT) AS kept
FROM a
""".strip()


DEDUP_SEMANTIC_SQL = dedup_semantic_sql()


# --- distributed global order-by rank -----------------------------------

GLOBAL_RANK_BUCKETS = 32


def doc_global_rank(sf_dir: str, n_buckets: int = GLOBAL_RANK_BUCKETS):
    """Global ROW_NUMBER over a total order — every document ranked by
    (n_chars DESC, doc_id ASC) across the whole corpus.  The missing
    piece next to the per-group window ops: a GLOBAL ``ORDER BY`` +
    ``row_number()`` with no partition key at all, which naively
    funnels the corpus through one sort task.

    Decomposition (the events_user_rank_bucketed shape, ungrouped):
    rows are bucketed by n_chars VALUE RANGE from per-block sampled
    edges (sampling skew shifts only balance, never correctness —
    ``side="right"`` pins every tie group to ONE bucket, so the
    doc_id tie-break never crosses a boundary); each bucket partition
    sorts locally and numbers its rows; bucket row-counts reduce to an
    answer-sized (n_buckets) descending offset ladder broadcast into a
    final map.  Nothing corpus-sized touches the driver and no single
    task holds more than one bucket.

    Reference: neocrawler's scheduler orders its whole queue by
    priority weight before popping (scheduler.js zset range over the
    full queue) — this is that global-order shape over Parquet."""
    import numpy as np
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["n_chars"].to_numpy("int64"))
        k = min(64, len(v))
        idx = np.linspace(0, len(v) - 1, k).astype(int)
        return pd.DataFrame({"v": v[idx]})

    samp = ds.map_batches(sample, batch_format="pandas").to_pandas()
    v = np.sort(samp["v"].to_numpy("int64"))
    qs = np.linspace(0, len(v) - 1,
                     min(n_buckets, max(1, len(v))) + 1)[1:-1].astype(int)
    edges = np.unique(v[qs]) if len(v) else np.empty(0, dtype="int64")
    edges_ref = ray.put(edges)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        e = ray.get(edges_ref)
        df = df[["doc_id", "n_chars"]].copy()
        df["bucket"] = np.searchsorted(
            e, df["n_chars"].to_numpy("int64"), side="right").astype("int64")
        return df

    def local_rank(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b, grp in df.groupby("bucket", sort=False):
            grp = grp.sort_values(["n_chars", "doc_id"],
                                  ascending=[False, True])
            out.append(pd.DataFrame(
                {"bucket": np.full(len(grp), int(b), dtype="int64"),
                 "doc_id": grp["doc_id"].to_numpy("int64"),
                 "n_chars": grp["n_chars"].to_numpy("int64"),
                 "l_rank": np.arange(1, len(grp) + 1, dtype="int64")}))
        if not out:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype="int64"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "n_chars": pd.Series([], dtype="int64"),
                 "l_rank": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    ranked = _hash_grouped(ds.map_batches(add_bucket, batch_format="pandas"),
                           ["bucket"], local_rank,
                           num_parts=min(32, n_buckets)).materialize()

    # answer-sized ladder: offset(b) = rows in strictly-HIGHER buckets
    # (higher bucket index ⇔ larger n_chars ⇔ earlier in the DESC order)
    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bucket", as_index=False).agg(n=("doc_id", "size"))
        return g.astype({"bucket": "int64", "n": "int64"})

    summ = (ranked.map_batches(bucket_counts, batch_format="pandas")
            .to_pandas().groupby("bucket", as_index=False)["n"].sum()
            .sort_values("bucket", ascending=False))
    cr = summ["n"].cumsum().shift(fill_value=0).to_numpy("int64")
    offs = {int(b): int(r) for b, r in zip(summ["bucket"], cr)}
    offs_ref = ray.put(offs)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(offs_ref)
        ro = np.array([o[int(b)] for b in df["bucket"]], dtype="int64")
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy("int64"),
             "n_chars": df["n_chars"].to_numpy("int64"),
             "global_rank": df["l_rank"].to_numpy("int64") + ro})

    return ranked.map_batches(finish, batch_format="pandas")


DOC_GLOBAL_RANK_SQL = (
    "SELECT doc_id, n_chars, "
    "CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) "
    "AS global_rank FROM documents"
)


# --- distributed k-means (fixed-iteration Lloyd) -------------------------

KMEANS_OP_K = 8
KMEANS_OP_ITERS = 2


def embedding_kmeans(sf_dir: str, k_clusters: int = KMEANS_OP_K,
                     n_iter: int = KMEANS_OP_ITERS):
    """Distributed Lloyd k-means over the embedding table with a FIXED
    iteration count and deterministic seeds — the iterative-ML-loop
    shape (like :func:`..pipelines.analytics.graph_pagerank` but with
    float state): per round, assignment is embarrassingly parallel and
    the only synchronization is an answer-sized (k × d) centroid
    reduce; nothing corpus-sized ever leaves the map stages and there
    is NO shuffle at all — cluster sums are commutative partials.

    Seeds are the ``k_clusters`` smallest vec_ids and assignment is
    argmin squared-euclidean with ties to the smallest centroid id, so
    a chained-CTE DuckDB oracle reproduces every round bit-for-bit
    (assignment margins measured ≥ 6.7e-6 across sf0.001-0.1 — ~1e6×
    the cross-engine float-sum noise in the centroid means).  A cluster
    that empties VANISHES for later rounds (exactly the SQL side, where
    its cid drops out of the rebuilt centroid table).

    The IVF path (:func:`ann_ivf_topk`) keeps its driver-side k-means
    on a sample; this is the full-corpus distributed variant whose
    per-round cost is one pass.

    Returns (vec_id, cluster) after ``n_iter`` reassignment rounds."""
    import numpy as np

    cents = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def cent_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.less(batch["vec_id"], k_clusters))

    cdf = (cents.map_batches(cent_filter, batch_format="pyarrow")
           .to_pandas().sort_values("vec_id"))
    C = sim.batch_to_matrix(cdf["embedding"].to_numpy())  # (k, d)
    alive = np.ones(len(C), dtype=bool)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def assign_of(Ck: np.ndarray, live: np.ndarray):
        def dists(m: np.ndarray) -> np.ndarray:
            d = ((m[:, None, :] - Ck[None, :, :]) ** 2).sum(axis=2)
            d[:, ~live] = np.inf
            return d
        return dists

    for _ in range(n_iter):
        dists = assign_of(C, alive)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            m = sim.batch_to_matrix(df["embedding"].to_numpy())
            a = np.argmin(dists(m), axis=1)
            rows_c, rows_n, rows_s = [], [], []
            for c in np.unique(a):
                sub = m[a == c]
                rows_c.append(int(c))
                rows_n.append(len(sub))
                rows_s.append(sub.sum(axis=0).tobytes())
            return pd.DataFrame({"cluster": pd.Series(rows_c, dtype="int64"),
                                 "n": pd.Series(rows_n, dtype="int64"),
                                 "svec": rows_s})

        # answer-sized reduce: ≤ k rows per block reach the driver
        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        newC = C.copy()
        alive = np.zeros(len(C), dtype=bool)
        for c, g in parts.groupby("cluster"):
            n = int(g["n"].sum())
            s = np.sum([np.frombuffer(b, dtype=np.float64) for b in g["svec"]],
                       axis=0)
            newC[int(c)] = s / n
            alive[int(c)] = True
        C = newC

    dists = assign_of(C, alive)

    def final_assign(df: pd.DataFrame) -> pd.DataFrame:
        m = sim.batch_to_matrix(df["embedding"].to_numpy())
        a = np.argmin(dists(m), axis=1)
        return pd.DataFrame({"vec_id": df["vec_id"].to_numpy("int64"),
                             "cluster": a.astype("int64")})

    return ds.map_batches(final_assign, batch_format="pandas")


def embedding_kmeans_sql(k_clusters: int = KMEANS_OP_K,
                         n_iter: int = KMEANS_OP_ITERS, dim: int = 64) -> str:
    """Chained-CTE Lloyd: a0 assigns to the seed rows; each round
    rebuilds centroids as per-dimension averages (index-join unnest —
    DuckDB lacks WITH ORDINALITY) and reassigns."""
    parts = [f"""
WITH c0 AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings WHERE vec_id < {k_clusters}),
a0 AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
                                         c.cv), c.cid) AS r
        FROM embeddings e, c0 c) WHERE r = 1)"""]
    for i in range(1, n_iter + 1):
        parts.append(f""",
d{i} AS (SELECT a{i-1}.cid, i.dim,
                avg(CAST(e.embedding AS DOUBLE[])[i.dim]) AS m
         FROM a{i-1} JOIN embeddings e USING (vec_id),
              (SELECT unnest(range(1, {dim + 1})) AS dim) i
         GROUP BY a{i-1}.cid, i.dim),
c{i} AS (SELECT cid, list(m ORDER BY dim) AS cv FROM d{i} GROUP BY cid),
a{i} AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
                                         c.cv), c.cid) AS r
        FROM embeddings e, c{i} c) WHERE r = 1)""")
    parts.append(f"""
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM a{n_iter}""")
    return "".join(parts).strip()


EMBEDDING_KMEANS_SQL = embedding_kmeans_sql()


# --- weighted sampling without replacement (priority sampling) -----------

WEIGHTED_SAMPLE_N = 50


def doc_sample_weighted(sf_dir: str, n: int = WEIGHTED_SAMPLE_N):
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield, Lund, Thorup 2004): each doc draws priority u/w where u
    is a deterministic md5(doc_id) uniform and w = n_chars; the sample
    is the n SMALLEST priorities — longer docs draw stochastically
    smaller priorities, so inclusion probability rises with weight
    (the scheme behind unbiased subset-sum estimation; here the
    training-data use is "sample docs ∝ size/quality weight").

    Cross-engine exactness without trusting libm: u is the first 13
    md5 hex digits — a 52-BIT integer, exactly representable in
    float64 — and the priority is ONE IEEE division of that integer by
    the int weight, which both engines round identically (no ln/pow
    anywhere, unlike the Efraimidis-Spirakis exponential form).
    doc_id breaks priority ties (md5 collisions at 2^-52).

    Scale shape: per-block vectorized hex→int + one lexsort keeps the
    n smallest; the driver reduce sees n × blocks rows (answer-sized).
    Zero shuffle."""
    import numpy as np

    from ..functions import dedup as _dd

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    pow16 = (16 ** np.arange(12, -1, -1)).astype(np.int64)

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_chars"] > 0]
        ids = df["doc_id"].astype("int64").to_numpy()
        h = _dd.md5_hex_series(pd.Series(ids).astype(str))
        # vectorized 13-hex-digit → int64: ASCII nibbles dot powers of 16
        a = np.frombuffer("".join(s[:13] for s in h).encode("ascii"),
                          dtype=np.uint8).reshape(-1, 13).astype(np.int64)
        nib = a - 48 - 39 * (a >= 97)
        u = nib @ pow16                       # < 2^52, float64-exact
        prio = u.astype(np.float64) / df["n_chars"].to_numpy("int64")
        keep = np.lexsort((ids, prio))[:n]
        return pd.DataFrame({"doc_id": ids[keep],
                             "prio": prio[keep]})

    cand = ds.map_batches(local_top, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["prio", "doc_id"], kind="mergesort").head(n)
    return pd.DataFrame(
        {"doc_id": cand["doc_id"].to_numpy("int64"),
         "rank": np.arange(1, len(cand) + 1, dtype="int64")})


def doc_sample_weighted_sql(n: int = WEIGHTED_SAMPLE_N) -> str:
    return f"""
WITH k AS (SELECT doc_id,
                  CAST(CAST(concat('0x',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                       AS BIGINT) AS DOUBLE)
                  / CAST(n_chars AS DOUBLE) AS prio
           FROM documents WHERE n_chars > 0)
SELECT doc_id, CAST(r AS BIGINT) AS rank FROM
  (SELECT doc_id, row_number() OVER (ORDER BY prio, doc_id) AS r FROM k)
WHERE r <= {n}
""".strip()


DOC_SAMPLE_WEIGHTED_SQL = doc_sample_weighted_sql()


# --- table profiler (data-quality scan) -----------------------------------


def table_profile(sf_dir: str, table: str = "documents",
                  num_parts: int = 32):
    """Per-column data-quality profile — n_rows / n_null / n_distinct
    for every column in ONE pass over the table: the ingest-validation
    scan a 100-TB pipeline runs before anything else (schema drift,
    null regressions, key-cardinality checks).

    Exact-distinct shape: each batch emits its per-column UNIQUE
    64-bit value hashes (nulls masked out, SQL COUNT(DISTINCT)
    semantics) plus one tiny per-column count partial, all into one
    exchange hash-partitioned on (col, h) — same key ⇒ same partition,
    so per-partition unique counts sum to the exact global distinct.
    Count partials ride the same exchange under a sentinel hash.  The
    reduce output is answer-sized (columns × partitions rows).
    Distinctness is counted over 64-bit hashes: collision probability
    is birthday-bounded (~d²/2⁶⁵ — negligible below ~10⁸ distincts;
    carry two independent hashes for the 128-bit upgrade at frontier
    scale).  Text bodies never leave the scan stage — only their
    hashes enter the exchange.

    Reference: the reference's monitor/stat pages report per-day row
    counts only (monitor.js); this is the per-column generalization."""
    import numpy as np

    from ..sources.tables import read_table

    ds = read_table(sf_dir, table, None)
    cols = ds.schema().names

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out_col, out_h, out_n, out_nn = [], [], [], []
        for i, c in enumerate(cols):
            s = df[c]
            mask = s.notna()
            vals = s[mask]
            if vals.dtype == object and len(vals) and isinstance(
                    vals.iloc[0], (list, np.ndarray, tuple)):
                # list-typed columns (embeddings): hash a stable byte
                # repr — hash_pandas_object raises on unhashable objects
                vals = vals.map(
                    lambda v: np.asarray(v, dtype=np.float64).tobytes())
            h = pd.util.hash_pandas_object(
                vals, index=False).to_numpy(dtype="uint64")
            uh = np.unique(h).view("int64")
            out_col.append(np.full(len(uh), i, dtype="int64"))
            out_h.append(uh)
            out_n.append(np.full(len(uh), -1, dtype="int64"))
            out_nn.append(np.full(len(uh), -1, dtype="int64"))
            # one count-partial row per column per batch (sentinel h)
            out_col.append(np.array([i], dtype="int64"))
            out_h.append(np.array([np.iinfo("int64").min], dtype="int64"))
            out_n.append(np.array([len(s)], dtype="int64"))
            out_nn.append(np.array([int((~mask).sum())], dtype="int64"))
        return pd.DataFrame(
            {"col": np.concatenate(out_col), "h": np.concatenate(out_h),
             "n": np.concatenate(out_n), "nn": np.concatenate(out_nn)})

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        is_cnt = df["n"] >= 0
        cnt = (df[is_cnt].groupby("col", as_index=False)
               [["n", "nn"]].sum())
        dis = (df[~is_cnt][["col", "h"]].drop_duplicates()
               .groupby("col", as_index=False).size()
               .rename(columns={"size": "nd"}))
        m = cnt.merge(dis, on="col", how="outer").fillna(0)
        return m.astype({"col": "int64", "n": "int64", "nn": "int64",
                         "nd": "int64"})

    parts = _hash_grouped(
        ds.map_batches(partial, batch_format="pandas"),
        ["col", "h"], reduce_part, num_parts=num_parts).to_pandas()
    g = parts.groupby("col", as_index=False)[["n", "nn", "nd"]].sum()
    g["col_name"] = g["col"].map(dict(enumerate(cols)))
    g = g.sort_values("col_name").reset_index(drop=True)
    return pd.DataFrame(
        {"col_name": g["col_name"].astype(object),
         "n_rows": g["n"].astype("int64"),
         "n_null": g["nn"].astype("int64"),
         "n_distinct": g["nd"].astype("int64")})


def table_profile_sql(table: str = "documents",
                      cols: tuple[str, ...] = (
                          "doc_id", "lang", "n_chars", "source", "text"),
                      ) -> str:
    parts = [
        f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
        f"COUNT(*) - COUNT({c}) AS n_null, "
        f"COUNT(DISTINCT {c}) AS n_distinct FROM {table}"
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


DOCUMENTS_PROFILE_SQL = table_profile_sql()


# --- PPJoin-style prefix-filtered exact similarity join --------------------


def dedup_ngram_pairs_prefix(sf_dir: str, threshold_num: int = 4,
                             threshold_den: int = 5,
                             num_parts: int | None = None,
                             df_order_block: int = 32,
                             df_sample_mod: int = 20):
    """EXACT n-gram Jaccard self-join at a HIGH threshold via PREFIX
    FILTERING (Chaudhuri/Bayardo/Xiao's all-pairs trick) — same answer
    as :func:`dedup_ngram_pairs` at the same threshold, but only each
    document's prefix enters the inverted index.

    Guarantee: order every shingle set by a fixed global total order;
    for J(a,b) ≥ t = tn/td the overlap has ≥ ⌈t·|x|⌉ elements for BOTH
    sides, so the smallest common element sits within the first
    |x| − ⌈t·|x|⌉ + 1 elements of EACH side — index only those
    prefixes and no qualifying pair is missed, for ANY total order.

    The order used is the classic DF-ASCENDING one (rare shingles
    first, est-df bucket then hash): a sampled-df prepass
    (:func:`_ngram_hot_shingles` with ``df_block=df_order_block``,
    1-in-``df_sample_mod`` docs) finds the boilerplate shingles and
    pushes them to the BACK of every document, so prefixes hold each
    document's rarest shingles.  That is what makes the filter prune:
    two documents sharing only template boilerplate never co-occur in
    the prefix index (their prefixes are their distinctive content),
    while a plain hash order admits every boilerplate pair as a
    candidate.  The estimate is correctness-free: any order prunes
    exactly (a missed borderline shingle costs candidates, never
    answers); the payload/verify path is order-independent.

    Candidates are then verified with the exact set intersection via
    the same co-grouped payload join as :func:`dedup_minhash_verified`
    (shingle sets computed AT SCAN, shipped once per candidate side;
    nothing corpus-sized on the driver).  Output and oracle are
    byte-identical to ``dedup_ngram_pairs(tn, td)``.

    Measured crossover (BASELINE.md §prefix-crossover, 32 cpus,
    tools/bench_prefix_crossover.py): on a template-heavy corpus
    (3 050 docs = 20 boilerplate templates ≈ half of each doc's
    shingles + genuinely unique tails + 50 planted true near-dups —
    the template-crawl shape this op exists for) the unfiltered join
    pays Σdf² ≈ 6.7×10⁷ template-pair emissions and takes 20.8 s,
    while the df-ascending prefixes hold only the unique tails:
    8.2 s, identical 50-pair answer (2.5×).  On the dup-light sf0.1
    table the unfiltered join is still faster (2.0 s vs 2.8 s) — the
    df prepass and payload verify don't pay for themselves there.
    Disclosed negative result: a corpus whose "unique" parts reuse
    other corpus text plants mid-df (2–30) shingles shared across
    random doc pairs, and NO prefix order can exclude a rare-but-
    shared shingle from both prefixes — measured ~0.8-1.0M candidate
    pairs under hash, hot/cold and near-exact df orders alike
    (BASELINE.md discloses the losing run).  Prefix filtering wins
    exactly when high-df boilerplate dominates Σdf²; it is not a
    universal improvement over the inverted-index join."""
    import numpy as np

    tn, td = int(threshold_num), int(threshold_den)
    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=256)

    # sampled-df prepass → (sorted hot-shingle array, df bucket) for the
    # df-ascending total order; small (boilerplate vocab is bounded) so
    # it rides task closures as two numpy arrays
    hot = _ngram_hot_shingles(sf_dir, df_order_block, df_sample_mod)
    if hot:
        hot_sh = np.array(sorted(hot), dtype=np.uint64)
        hot_rank = np.array([hot[int(s)] for s in hot_sh], dtype=np.int64)
    else:
        hot_sh = np.empty(0, dtype=np.uint64)
        hot_rank = np.empty(0, dtype=np.int64)

    # ONE text scan emits BOTH row kinds — prefix postings (kind 0)
    # and the full sorted shingle-hash payload (kind 1) the verify
    # stage needs — so the expensive tokenize+hash runs once per doc,
    # not twice (the round's review flagged the second scan as the
    # dominant cost on dup-light corpora)
    scan_schema = pa.schema(
        [("shingle", pa.int64()), ("doc_id", pa.int64()),
         ("payload", pa.binary()), ("kind", pa.int64())])

    def scan_rows(df: pd.DataFrame) -> pa.Table:
        out_sh, out_id = [], []
        pay_id, pay = [], []
        for i, t in zip(df["doc_id"].astype("int64"),
                        df["text"].fillna("")):
            h = dd.shingle_hashes(str(t))  # sorted unique uint64
            s = len(h)
            if s == 0:
                continue  # empty set can never pair (oracle: c >= 1)
            # prefix length |x| − ⌈t·|x|⌉ + 1 in integer arithmetic
            plen = s - ((tn * s + td - 1) // td) + 1
            # df-ascending total order: est-df bucket (0 for unsampled/
            # rare) then hash — searchsorted membership, no dict walk
            if len(hot_sh):
                pos = np.searchsorted(hot_sh, h)
                pos[pos == len(hot_sh)] = 0
                rank = np.where(hot_sh[pos] == h, hot_rank[pos], 0)
                pre = h[np.lexsort((h, rank))][:max(plen, 1)]
            else:
                pre = h[:max(plen, 1)]
            out_sh.append(pre.view("int64"))
            out_id.append(np.full(len(pre), i, dtype="int64"))
            pay_id.append(int(i))
            pay.append(h.tobytes())
        post_sh = (np.concatenate(out_sh) if out_sh
                   else np.array([], dtype="int64"))
        post_id = (np.concatenate(out_id) if out_id
                   else np.array([], dtype="int64"))
        n_post = len(post_sh)
        # numpy → Arrow zero-copy for the (large) posting columns; only
        # the per-DOC payload rows touch Python objects
        return pa.Table.from_arrays(
            [pa.concat_arrays([pa.array(post_sh, pa.int64()),
                               pa.array(np.zeros(len(pay_id),
                                                 dtype="int64"))]),
             pa.concat_arrays([pa.array(post_id, pa.int64()),
                               pa.array(np.asarray(pay_id,
                                                   dtype="int64"))]),
             pa.concat_arrays([pa.array(np.full(n_post, b"",
                                                dtype=object),
                               pa.binary()),
                               pa.array(pay, pa.binary())]),
             pa.concat_arrays([pa.array(np.zeros(n_post, dtype="int64")),
                               pa.array(np.ones(len(pay_id),
                                                dtype="int64"))])],
            schema=scan_schema)

    scan_ds = docs.map_batches(scan_rows,
                               batch_format="pandas").materialize()

    import pyarrow.compute as pc

    def only_postings(tb: pa.Table) -> pa.Table:
        return (tb.filter(pc.equal(tb.column("kind"), 0))
                .select(["shingle", "doc_id"]))

    def cand_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64")})
        if len(df) < 2:
            return empty
        sh = df["shingle"].to_numpy("int64")
        ids = df["doc_id"].to_numpy("int64")
        order = np.lexsort((ids, sh))
        sh, ids = sh[order], ids[order]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        counts = np.diff(np.r_[starts, len(sh)])
        out_a, out_b = [], []
        for s, c in zip(starts[counts > 1], counts[counts > 1]):
            g = ids[s:s + int(c)]
            ii, jj = np.triu_indices(int(c), k=1)
            out_a.append(g[ii]); out_b.append(g[jj])
        if not out_a:
            return empty
        p = pd.DataFrame({"doc_a": np.concatenate(out_a),
                          "doc_b": np.concatenate(out_b)})
        # local combiner: a pair sharing k prefix shingles in this
        # partition ships once
        return p.drop_duplicates().astype("int64")

    cands = _hash_grouped(
        scan_ds.map_batches(only_postings, batch_format="pyarrow"),
        ["shingle"], cand_pairs, num_parts=num_parts or 32)

    def payload_rows(tb: pa.Table) -> pa.Table:
        p = tb.filter(pc.equal(tb.column("kind"), 1))
        return p.select(["doc_id", "payload"])

    parts = _parts_for(sf_dir, "documents", rows_per_part=600, lo=8)
    co_located = _attach_pair_payloads(
        cands, scan_ds.map_batches(payload_rows, batch_format="pyarrow"),
        pa.binary(), num_parts=parts)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # candidate volume here is prefix-df-bounded, not answer-sized —
        # no pandas groupby loop: one sort, group boundaries by diff,
        # and a searchsorted membership count per pair (both sides are
        # ALREADY sorted from the scan, so no intersect1d re-sort)
        cols = {"doc_a": "int64", "doc_b": "int64",
                "n_intersect": "int64", "n_union": "int64"}
        df = (df.drop_duplicates(["pair_key", "side"])
              .sort_values(["pair_key", "side"], kind="stable"))
        pk = df["pair_key"].to_numpy()
        pay = df["payload"].to_numpy()
        starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        ends = np.r_[starts[1:], len(pk)]
        keep_pk, keep_c, keep_u = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sa = np.frombuffer(pay[s], dtype=np.uint64)
            sb = np.frombuffer(pay[s + 1], dtype=np.uint64)
            pos = np.searchsorted(sb, sa)
            ok = pos < len(sb)
            c = int(np.count_nonzero(sb[pos[ok]] == sa[ok]))
            u = len(sa) + len(sb) - c
            if c >= 1 and td * c >= tn * u:
                keep_pk.append(pk[s]); keep_c.append(c); keep_u.append(u)
        if not keep_pk:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        ab = pd.Series(keep_pk).str.split(":", expand=True)
        return pd.DataFrame(
            {"doc_a": ab[0], "doc_b": ab[1],
             "n_intersect": keep_c, "n_union": keep_u}).astype(cols)

    # verify partitions sized to CANDIDATE volume (prefix-df-bounded),
    # not corpus rows — the old parts//2 left 4 tasks holding ~50k
    # pairs each on mid-df corpora
    return _hash_grouped(co_located, ["pair_key"], verify,
                         num_parts=max(parts, 32))


def dedup_ngram_pairs_prefix_sql(threshold_num: int = 4,
                                 threshold_den: int = 5) -> str:
    """Same oracle as the unfiltered exact join at this threshold —
    prefix filtering is a pure candidate-pruning optimization."""
    return dedup_ngram_pairs_sql(threshold_num, threshold_den)


DEDUP_NGRAM_PAIRS_PREFIX_SQL = dedup_ngram_pairs_prefix_sql()


# --- language confusion matrix (corpus QA) ---------------------------------


def doc_lang_confusion(sf_dir: str):
    """Declared-vs-detected language confusion matrix — the corpus QA
    table that catches mislabeled scrapes before they poison a
    per-language training mix (composes :func:`doc_lang_id`'s
    marker-word argmax with the table's declared ``lang``).

    One combiner map_batches (detect + local (lang, pred) counts) →
    answer-sized reduce; text never leaves the scan stage."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: a NULL declared lang is exactly the mislabeled
        # row this op exists to surface (SQL GROUP BY keeps it too)
        return (pd.DataFrame(
            {"lang": df["lang"].astype(object),
             "lang_pred": ts.lang_id_markers(df["text"]).to_numpy(
                 dtype=object)})
            .groupby(["lang", "lang_pred"], as_index=False, dropna=False)
            .agg(n_docs=("lang_pred", "size")))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    g = (parts.groupby(["lang", "lang_pred"], as_index=False,
                       dropna=False)["n_docs"]
         .sum().sort_values(["lang", "lang_pred"]).reset_index(drop=True))
    g["n_docs"] = g["n_docs"].astype("int64")
    return g


def doc_lang_confusion_sql() -> str:
    inner = ts.lang_id_markers_sql()
    return f"""
WITH p AS ({inner})
SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN p ON p.doc_id = d.doc_id
GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


DOC_LANG_CONFUSION_SQL = doc_lang_confusion_sql()


# --- PMI collocation mining -------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP_K = 50


def doc_bigram_pmi(sf_dir: str, min_count: int = PMI_MIN_COUNT,
                   k: int = PMI_TOP_K, num_parts: int = 16):
    """Top-``k`` collocations by pointwise mutual information — the
    standard "these two tokens belong together" statistic (phrase
    mining, tokenizer-merge candidates, boilerplate discovery).

    Log-free exact form: PMI's argument p(xy)/(p(x)p(y)) =
    c_xy·N_uni² / (N_big·c_x·c_y), a ratio of exact integers; ranking
    and the emitted ``pmi_e6`` use toward-zero truncated big-int
    division, so the HUGEINT oracle is bit-identical (the log is
    monotone — ranks are unchanged by skipping it).

    Shape: unigram and bigram occurrence counts are vocab-partitioned
    exchanges with per-batch ``value_counts`` combiners (one row per
    (gram, block) ships) — exactly TWO corpus scans; N_uni is the
    unigram total and N_big rides the bigram exchange as a sentinel
    row (a real bigram always contains a space, so "" is free), never
    materializing the unfiltered bigram vocabulary; the ``min_count``
    gate bounds the scored candidate set (Zipf tail cut) which joins
    its two unigram counts driver-side — at frontier scale that join
    is the term-hash exchange ``doc_tfidf_top`` already implements."""
    import numpy as np

    ds = _read(sf_dir, "documents", ["text"])

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = (df["text"].astype("string").fillna("")
             .astype(str).str.split(" ").explode())
        s = s[s != ""]
        vc = s.value_counts(sort=False)
        return pd.DataFrame({"term": vc.index.astype(str),
                             "c": vc.to_numpy(dtype="int64")})

    def big_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = (df["text"].astype("string").fillna("")
             .astype(str).str.split(" ").explode())
        s = s[s != ""]
        vals = s.to_numpy(dtype=object)
        idx = s.index.to_numpy()
        if len(vals) < 2:
            return pd.DataFrame({"bigram": pd.Series([], dtype=str),
                                 "c": pd.Series([], dtype="int64")})
        same_doc = idx[:-1] == idx[1:]
        left = pd.Series(vals[:-1][same_doc])
        big = left.str.cat(pd.Series(vals[1:][same_doc]), sep=" ")
        vc = big.value_counts(sort=False)
        # N_big rides the same exchange as a sentinel row: "" can never
        # be a real bigram (tokens are non-empty, joined with a space)
        return pd.DataFrame(
            {"bigram": np.append(vc.index.astype(str).to_numpy(dtype=object),
                                 ""),
             "c": np.append(vc.to_numpy(dtype="int64"),
                            int(vc.sum()))})

    def sum_terms(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(df.columns[0], as_index=False)["c"].sum()
        g["c"] = g["c"].astype("int64")
        return g

    uni = _hash_grouped(ds.map_batches(uni_partial, batch_format="pandas"),
                        ["term"], sum_terms, num_parts=num_parts).to_pandas()
    if "term" not in uni.columns:  # empty corpus: schema-less frame
        return pd.DataFrame({"bigram": pd.Series(dtype=object),
                             "n_cooc": pd.Series(dtype="int64"),
                             "pmi_e6": pd.Series(dtype="int64")})
    # N_uni is exactly the unigram count total — no extra scan
    n_uni = int(uni["c"].sum())

    def big_gate(df: pd.DataFrame) -> pd.DataFrame:
        g = sum_terms(df)
        return g[(g["c"] >= min_count) | (g["bigram"] == "")]

    big = _hash_grouped(ds.map_batches(big_partial, batch_format="pandas"),
                        ["bigram"], big_gate,
                        num_parts=num_parts).to_pandas()
    if "bigram" not in big.columns:  # min_count emptied every partition
        big = pd.DataFrame({"bigram": pd.Series(dtype=object),
                            "c": pd.Series(dtype="int64")})
    n_big = int(big[big["bigram"] == ""]["c"].sum())
    big = big[big["bigram"] != ""]

    ucount = dict(zip(uni["term"], uni["c"].map(int)))
    rows = []
    for bg, cxy in zip(big["bigram"], big["c"].map(int)):
        a, b = bg.split(" ")
        cx, cy = ucount[a], ucount[b]
        pmi_e6 = _td(cxy * n_uni * n_uni * 1_000_000, n_big * cx * cy)
        rows.append((bg, cxy, pmi_e6))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:k]
    return pd.DataFrame(
        {"bigram": pd.Series([r[0] for r in rows], dtype="object"),
         "n_cooc": pd.Series([r[1] for r in rows], dtype="int64"),
         "pmi_e6": pd.Series([r[2] for r in rows], dtype="int64")})


def _td(num: int, den: int) -> int:
    """Toward-zero integer division (DuckDB ``//`` semantics)."""
    q = abs(num) // abs(den)
    return -q if (num < 0) != (den < 0) else q


def doc_bigram_pmi_sql(min_count: int = PMI_MIN_COUNT,
                       k: int = PMI_TOP_K) -> str:
    return f"""
WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ts
           FROM documents),
uni AS (SELECT unnest(ts) AS term FROM t),
uc AS (SELECT term, CAST(count(*) AS HUGEINT) AS c FROM uni GROUP BY 1),
nu AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM uni),
b AS (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM t),
bp AS (SELECT ts[i] AS a, ts[i + 1] AS bb FROM b),
nb AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM bp),
bc AS (SELECT a, bb, CAST(count(*) AS HUGEINT) AS c FROM bp
       GROUP BY 1, 2 HAVING count(*) >= {min_count})
SELECT bc.a || ' ' || bc.bb AS bigram,
       CAST(bc.c AS BIGINT) AS n_cooc,
       CAST(bc.c * nu.n * nu.n * 1000000 // (nb.n * ua.c * ub.c)
            AS BIGINT) AS pmi_e6
FROM bc, nu, nb
JOIN uc ua ON ua.term = bc.a
JOIN uc ub ON ub.term = bc.bb
ORDER BY pmi_e6 DESC, bigram LIMIT {k}
""".strip()


DOC_BIGRAM_PMI_SQL = doc_bigram_pmi_sql()


# --- readability scoring ----------------------------------------------------


def doc_readability(sf_dir: str):
    """Flesch-style readability score per document from three integer
    text statistics — words (``\\S+`` runs), sentences (``[.!?]+``
    runs, floored at 1), and a vowel-group syllable proxy — the
    classic "is this text human-grade prose?" quality gate next to
    the length/punct heuristics in ``doc_text_stats``.

    Exactness: score_e3 = 206835 − ⌊1015·w/s⌋ − ⌊84600·y/w⌋ with each
    division truncated toward zero (DuckDB ``//``), so the oracle is
    bit-identical — no float.  Pure map stage: three compiled-regex
    counts per batch (C kernels), no shuffle, output ∝ corpus rows."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        t = df["text"].astype("string").fillna("")
        w = t.str.count(r"\S+").to_numpy("int64")
        s = t.str.count(r"[.!?]+").to_numpy("int64")
        y = t.str.count(r"[aeiouAEIOU]+").to_numpy("int64")
        s1 = np.maximum(s, 1)
        w1 = np.maximum(w, 1)
        score = (206835 - (1015 * w) // s1 - (84600 * y) // w1)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64").to_numpy(),
             "words": w, "sentences": s, "vowel_groups": y,
             "flesch_e3": score.astype("int64")})

    return ds.map_batches(fn, batch_format="pandas")


DOC_READABILITY_SQL = """
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS BIGINT)
           AS y
  FROM documents
)
SELECT doc_id, w AS words, s AS sentences, y AS vowel_groups,
       CAST(206835 - (1015 * w) // greatest(s, 1)
                   - (84600 * y) // greatest(w, 1) AS BIGINT)
         AS flesch_e3
FROM c ORDER BY doc_id
""".strip()


# --- exact distributed covariance (Gram) matrix -----------------------------

COV_DIM = 64


def embedding_covariance(sf_dir: str, dim: int = COV_DIM):
    """Exact covariance matrix of the embedding table in one pass —
    the reduce behind PCA / whitening / Mahalanobis outlier gates on a
    100-TB embedding store.  Upper triangle only (symmetric), entries
    as the cross-multiplied integer cov_scaled(i,j) = n·Σxᵢxⱼ −
    Σxᵢ·Σxⱼ over the shared e4 fixed point — no float anywhere, so
    the HUGEINT oracle matches bit-for-bit (int64 output is safe to
    ~10⁷ rows at e4 scale; beyond that widen the column).

    Shape: the sufficient statistic is ONE int64 Gram matmul per batch
    (V[n×d] → VᵀV, a C BLAS-like kernel; Σxᵢ rides along), so the
    exchange carries d²/2 + d numbers per BLOCK — completely
    independent of row count, the ideal combiner; the driver finishes
    in Python big ints.  Per-batch overflow bound: e4² ≤ 10⁸ per term
    × 50k rows = 5·10¹² ≪ int64."""
    import numpy as np

    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"i": pd.Series(dtype="int64"),
                                 "j": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        mat = np.stack([np.asarray(e, dtype="float64")
                        for e in df["embedding"]])
        v = np.floor(mat * 10000.0).astype("int64")   # shared e4 floor
        g = v.T @ v                                    # d×d int64 Gram
        sx = v.sum(axis=0)
        iu, ju = np.triu_indices(dim)
        rows = {"i": np.concatenate([iu + 1,
                                     np.arange(1, dim + 1),
                                     np.array([0])]),
                "j": np.concatenate([ju + 1,
                                     np.full(dim, -1),
                                     np.array([-2])]),
                "v": np.concatenate([g[iu, ju], sx,
                                     np.array([len(df)])])}
        return pd.DataFrame(rows).astype("int64")

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts[parts["j"] == -2]["v"].sum())
    sx = (parts[parts["j"] == -1].groupby("i")["v"]
          .apply(lambda s: sum(int(x) for x in s)).to_dict())
    gsum = (parts[parts["j"] > 0].groupby(["i", "j"])["v"]
            .apply(lambda s: sum(int(x) for x in s)))
    out_i, out_j, out_v = [], [], []
    for (i, j), sxy in gsum.items():
        out_i.append(int(i)); out_j.append(int(j))
        out_v.append(n * int(sxy) - sx[i] * sx[j])
    out = pd.DataFrame({"i": out_i, "j": out_j, "cov_scaled": out_v})
    out = out.sort_values(["i", "j"]).reset_index(drop=True)
    return out.astype({"i": "int64", "j": "int64",
                       "cov_scaled": "int64"})


EMBEDDING_COVARIANCE_SQL = f"""
WITH e AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
  FROM embeddings
),
n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM e),
sums AS (SELECT i, CAST(sum(v[i]) AS HUGEINT) AS s
         FROM e, generate_series(1, {COV_DIM}) g(i) GROUP BY i),
x AS (SELECT g1.i AS i, g2.j AS j,
             CAST(sum(CAST(e.v[g1.i] AS HUGEINT) * e.v[g2.j])
                  AS HUGEINT) AS sxy
      FROM e, generate_series(1, {COV_DIM}) g1(i),
           generate_series(1, {COV_DIM}) g2(j)
      WHERE g1.i <= g2.j GROUP BY 1, 2)
SELECT x.i, x.j,
       CAST(n.n * x.sxy - sa.s * sb.s AS BIGINT) AS cov_scaled
FROM x, n
JOIN sums sa ON sa.i = x.i
JOIN sums sb ON sb.i = x.j
ORDER BY x.i, x.j
""".strip()


# --- rank fusion (Borda) over quality metrics --------------------------------

BORDA_TOP_K = 50


def doc_rank_fusion(sf_dir: str, k: int = BORDA_TOP_K):
    """Borda-count rank fusion of three per-document quality signals —
    readability (flesch_e3), length (n_chars) and type-token ratio —
    the standard way to combine heterogeneous scores into one corpus
    ordering without tuning weights (classic IR rank aggregation).

    Exactness: each signal's GLOBAL rank uses RANK() semantics (1 +
    count of strictly-better rows — ties share), computed WITHOUT a
    global sort: one slim metrics Dataset (4 ints/doc, materialized
    once), per-metric value histograms (exchange ∝ distinct values,
    not rows; a value-hash exchange at frontier scale), the
    descending-prefix "better than" table broadcast via ``ray.put``,
    and a zero-shuffle ``searchsorted`` map assigns all three ranks.
    Borda = r1+r2+r3; top-k by (borda, doc_id) with per-block top-k
    partials.  All-integer → the window-function oracle matches
    bit-for-bit."""
    import numpy as np

    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].astype("string").fillna("")
        w = t.str.count(r"\S+").to_numpy("int64")
        s = t.str.count(r"[.!?]+").to_numpy("int64")
        y = t.str.count(r"[aeiouAEIOU]+").to_numpy("int64")
        f = (206835 - (1015 * w) // np.maximum(s, 1)
             - (84600 * y) // np.maximum(w, 1))
        # split on ' ' exactly like the oracle's string_split (a \s+
        # split would disagree on tab/newline-delimited tokens)
        dt = t.map(lambda x: len({w for w in x.split(" ") if w})
                   if x else 0).to_numpy("int64")
        ttr = (1_000_000 * dt) // np.maximum(w, 1)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64").to_numpy(),
             "f": f.astype("int64"),
             "c": df["n_chars"].astype("int64").to_numpy(),
             "t": ttr.astype("int64")})

    m = ds.map_batches(metrics, batch_format="pandas").materialize()

    def hist(col):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            vc = df[col].value_counts(sort=False)
            return pd.DataFrame({"v": vc.index.to_numpy("int64"),
                                 "n": vc.to_numpy("int64")})
        h = (m.map_batches(fn, batch_format="pandas").to_pandas()
             .groupby("v", as_index=False)["n"].sum())
        h = h.sort_values("v", ascending=False).reset_index(drop=True)
        vals = h["v"].to_numpy("int64")          # descending
        better = np.r_[0, h["n"].to_numpy("int64").cumsum()[:-1]]
        return vals, better

    tables = {c: hist(c) for c in ("f", "c", "t")}
    refs = ray.put(tables)

    def rank_map(df: pd.DataFrame) -> pd.DataFrame:
        tabs = ray.get(refs)
        out = {"doc_id": df["doc_id"].to_numpy("int64")}
        borda = np.zeros(len(df), dtype="int64")
        for i, col in enumerate(("f", "c", "t"), start=1):
            vals, better = tabs[col]
            # vals is DESC-sorted: index of first exact match
            idx = np.searchsorted(-vals, -df[col].to_numpy("int64"))
            r = better[idx] + 1
            out[f"r{i}"] = r.astype("int64")
            borda += r
        out["borda"] = borda
        d = pd.DataFrame(out)
        # per-block top-k partial: a global winner wins its block
        return d.sort_values(["borda", "doc_id"]).head(k)

    parts = m.map_batches(rank_map, batch_format="pandas").to_pandas()
    out = (parts.sort_values(["borda", "doc_id"]).head(k)
           .reset_index(drop=True))
    return out.astype({"doc_id": "int64", "r1": "int64", "r2": "int64",
                       "r3": "int64", "borda": "int64"})


def doc_rank_fusion_sql(k: int = BORDA_TOP_K) -> str:
    return f"""
WITH d0 AS (
  SELECT doc_id, COALESCE(text, '') AS text, n_chars FROM documents
), m AS (
  SELECT doc_id,
    206835
      - (1015 * CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT))
        // greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
                    AS BIGINT), 1)
      - (84600 * CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+'))
                 AS BIGINT))
        // greatest(CAST(len(regexp_extract_all(text, '\\S+'))
                    AS BIGINT), 1) AS f,
    n_chars AS c,
    (1000000 * CAST(len(list_distinct(list_filter(
         string_split(text, ' '), x -> x <> ''))) AS BIGINT))
      // greatest(CAST(len(regexp_extract_all(text, '\\S+'))
                  AS BIGINT), 1) AS t
  FROM d0
)
SELECT doc_id,
       CAST(RANK() OVER (ORDER BY f DESC) AS BIGINT) AS r1,
       CAST(RANK() OVER (ORDER BY c DESC) AS BIGINT) AS r2,
       CAST(RANK() OVER (ORDER BY t DESC) AS BIGINT) AS r3,
       CAST(RANK() OVER (ORDER BY f DESC)
            + RANK() OVER (ORDER BY c DESC)
            + RANK() OVER (ORDER BY t DESC) AS BIGINT) AS borda
FROM m ORDER BY borda, doc_id LIMIT {k}
""".strip()


DOC_RANK_FUSION_SQL = doc_rank_fusion_sql()


# --- ordered string aggregation ----------------------------------------------


def corpus_source_langs(sf_dir: str):
    """Per-source ordered roster of the distinct languages it carries,
    as one comma-joined string — the STRING_AGG / array_agg operator
    class (ordered reassembly of grouped values), used for compact
    manifest/report columns.

    Shape: per-batch distinct (source, lang) partials → answer-sized
    driver reduce → deterministic lexicographic join.  Ordered
    aggregation is only mergeable once the value set is deduped —
    hence distinct-partials first, concat LAST (the same
    order-sensitivity discipline as `corpus_line_dedup`'s reassembly
    signature)."""
    ds = _read(sf_dir, "documents", ["source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["source", "lang"]].drop_duplicates()

    parts = (ds.map_batches(partial, batch_format="pandas")
             .to_pandas().drop_duplicates())
    rows = []
    # dropna=False: a NULL source is a group the manifest must show
    # (SQL GROUP BY keeps it); string_agg over zero non-null langs is
    # NULL, mirrored by None here
    for src, g in parts.groupby("source", sort=True, dropna=False):
        langs = sorted(g["lang"].dropna().astype(str))
        rows.append((src if pd.notna(src) else None, len(langs),
                     ",".join(langs) if langs else None))
    return pd.DataFrame(
        {"source": pd.Series([r[0] for r in rows], dtype=object),
         "n_langs": pd.Series([r[1] for r in rows], dtype="int64"),
         "langs": pd.Series([r[2] for r in rows], dtype=object)})


CORPUS_SOURCE_LANGS_SQL = """
SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs
FROM documents GROUP BY source ORDER BY source
""".strip()


# --- MERGE / upsert (CDC apply) ----------------------------------------------

UPSERT_MOD = 10


def documents_upsert(sf_dir: str, num_parts: int = 16):
    """SQL MERGE / upsert semantics — apply a change-set to a base
    table by key (the CDC-apply operator every incremental corpus
    refresh needs): updated rows take the change-set's values, the
    rest pass through, with a provenance flag.

    The change-set is carved deterministically from the corpus itself
    (every ``doc_id % 10 == 0`` re-labeled ``lang='xx'`` with a
    re-measured n_chars) so the op needs no external data; the MERGE
    itself is ONE doc_id-hash exchange over a tagged union — base rows
    flag 0, update rows flag 1, per-partition "update wins" coalesce —
    the exact shape a real change-feed apply uses at 100 TB (text
    never ships: only the changed columns ride the update rows).

    Reference: the reference re-crawls a URL and overwrites its HBase
    row by rowkey (spider.js save path) — this is that upsert as a
    set operation."""
    base = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def base_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "lang": df["lang"].astype(object),
             "n_chars": df["n_chars"].astype("int64"),
             "flag": 0})

    def update_rows(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["doc_id"].astype("int64") % UPSERT_MOD) == 0
        g = df[m]
        return pd.DataFrame(
            {"doc_id": g["doc_id"].astype("int64"),
             "lang": "xx",
             "n_chars": g["n_chars"].astype("int64") + 1,
             "flag": 1})

    tagged = (base.map_batches(base_rows, batch_format="pandas")
              .union(base.map_batches(update_rows,
                                      batch_format="pandas")))

    def coalesce(df: pd.DataFrame) -> pd.DataFrame:
        # update wins: sort by flag desc, first row per key
        d = (df.sort_values(["doc_id", "flag"],
                            ascending=[True, False])
             .groupby("doc_id", as_index=False).first())
        return (d.rename(columns={"flag": "was_updated"})
                .astype({"doc_id": "int64", "n_chars": "int64",
                         "was_updated": "int64"}))

    out = _hash_grouped(tagged, ["doc_id"], coalesce,
                        num_parts=num_parts).to_pandas()
    return (out.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "lang", "n_chars", "was_updated"]])


DOCUMENTS_UPSERT_SQL = f"""
WITH u AS (
  SELECT doc_id, 'xx' AS lang, n_chars + 1 AS n_chars
  FROM documents WHERE doc_id % {UPSERT_MOD} = 0
)
SELECT d.doc_id,
       COALESCE(u.lang, d.lang) AS lang,
       CAST(COALESCE(u.n_chars, d.n_chars) AS BIGINT) AS n_chars,
       CAST(CASE WHEN u.doc_id IS NOT NULL THEN 1 ELSE 0 END
            AS BIGINT) AS was_updated
FROM documents d LEFT JOIN u ON u.doc_id = d.doc_id
ORDER BY d.doc_id
""".strip()
