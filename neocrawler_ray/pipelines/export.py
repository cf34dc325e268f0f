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


# --- crawl → training-corpus bridge ------------------------------------------


def corpus_from_crawl(extracted_dir: str, workdir: str | None = None):
    """END-TO-END bridge from the crawl's extracted pages to packed
    training shards — the composition that ties the repo's two halves
    together: frontier → fetch-sim → rule-engine extract (the
    reference's pipeline) feeding straight into the LLM-data layer
    (clean → exact dedup → language ID → token-budget shard packing),
    all over the SAME Dataset machinery.

    Stages (every one an existing oracle-green operator — the bridge
    adds glue, not logic):

    1. read the crawl's ``extracted/`` Parquet (valid rows only),
       shape it documents-like — ``doc_id`` = int63 md5 of
       (url, nav_round), ``source`` = domain — and write it as a
       corpus directory under ``workdir`` (the write is the crawl/
       corpus seam: at 100 TB both sides stream Parquet, and a
       failed bridge run resumes from the written corpus);
    2. :func:`corpus_ops.corpus_clean` with a token-length gate
       (crawl text is navigational — the prose stopword prior would
       drop everything) + exact dedup (keep-one per content digest);
    3. :func:`corpus_ops.doc_lang_id` — marker-word language ID;
    4. :func:`corpus_ops.doc_pack_shards` — global parallel-prefix
       token packing into fixed-budget shards.

    Returns the manifest: one row per SURVIVING document —
    (doc_id, url, source, lang_pred, n_tokens, shard_id), doc_id
    order.  The final joins run on the answer-sized kept set
    driver-side (at frontier scale: doc_id-hash exchanges, the
    corpus layer's existing seam)."""
    import hashlib
    import tempfile

    import numpy as np
    import pyarrow as pa
    import ray

    from ..pipelines import corpus_ops as co

    workdir = workdir or tempfile.mkdtemp(prefix="crawl_corpus_",
                                          dir="/tmp")
    doc_dir = os.path.join(workdir, "documents.parquet")

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string()),
         ("n_chars", pa.int64()), ("url", pa.string())])

    def shape(df: pd.DataFrame) -> pa.Table:
        ok = (df["valid"].astype("int64") == 1) & df["text"].notna()
        df = df[ok]
        keys = (df["url"].astype(str) + "#"
                + df["nav_round"].astype(str))
        ids = np.array(
            [int.from_bytes(hashlib.md5(k.encode()).digest()[:8],
                            "big") >> 1 for k in keys], dtype="int64")
        return pa.Table.from_pydict(
            {"doc_id": ids,
             "text": df["text"].astype(str).tolist(),
             "lang": ["und"] * len(df),
             "source": df["domain"].astype(str).tolist(),
             "n_chars": df["text"].astype(str).str.len()
                .astype("int64").tolist(),
             "url": df["url"].astype(str).tolist()},
            schema=schema)

    ds = ray.data.read_parquet(
        extracted_dir,
        columns=["url", "nav_round", "domain", "valid", "text"])
    # _SUCCESS markers gate resume: a merely NON-EMPTY directory can be
    # a crashed partial write_parquet — resuming from it would silently
    # pack a truncated corpus (the same atomic-completion discipline as
    # the per-chunk os.replace above)
    doc_ok = os.path.join(doc_dir, "_SUCCESS")
    if not os.path.exists(doc_ok):
        if os.path.isdir(doc_dir):
            import shutil

            shutil.rmtree(doc_dir)
        ds.map_batches(shape, batch_format="pandas") \
            .write_parquet(doc_dir)
        open(doc_ok, "w").close()

    # min_tokens gate: crawl text is navigational (no stopword prior)
    kept = co.corpus_clean(workdir, min_tokens=3).to_pandas()
    if "doc_id" not in kept.columns:  # nothing survived: empty manifest
        return pd.DataFrame(
            {c: pd.Series(dtype="int64" if c in
                          ("doc_id", "n_tokens", "shard_id") else object)
             for c in ("doc_id", "url", "source", "lang_pred",
                       "n_tokens", "shard_id")})

    # materialize the CLEANED corpus (broadcast kept-id membership →
    # streaming filter → Parquet): packing and language ID must see
    # only surviving docs, and the written clean set is the resumable
    # artifact a re-run restarts from
    clean_dir = os.path.join(workdir, "clean")
    clean_docs = os.path.join(clean_dir, "documents.parquet")
    kept_ref = ray.put(
        pd.Series(kept["doc_id"]).sort_values().to_numpy("int64"))

    def keep_only(tb: pa.Table) -> pa.Table:
        import numpy as np

        ids = tb.column("doc_id").to_numpy()
        ks = ray.get(kept_ref)
        pos = np.searchsorted(ks, ids)
        ok = pos < len(ks)
        ok[ok] = ks[pos[ok]] == ids[ok]
        return tb.filter(pa.array(ok))

    clean_ok = os.path.join(clean_docs, "_SUCCESS")
    if not os.path.exists(clean_ok):
        if os.path.isdir(clean_docs):
            import shutil

            shutil.rmtree(clean_docs)
        ray.data.read_parquet(doc_dir) \
            .map_batches(keep_only, batch_format="pyarrow") \
            .write_parquet(clean_docs)
        open(clean_ok, "w").close()

    lang = co.doc_lang_id(clean_dir).to_pandas()
    shards = co.doc_pack_shards(clean_dir)
    urls = (ray.data.read_parquet(clean_docs,
                                  columns=["doc_id", "url", "source"])
            .to_pandas().drop_duplicates("doc_id"))
    m = (kept.merge(lang, on="doc_id")
         .merge(shards[["doc_id", "shard_id"]], on="doc_id")
         .merge(urls, on="doc_id"))
    m = m.sort_values("doc_id").reset_index(drop=True)
    return m[["doc_id", "url", "source", "lang_pred", "n_tokens",
              "shard_id"]].astype(
        {"doc_id": "int64", "n_tokens": "int64", "shard_id": "int64"})
