"""Prefix-filter crossover benchmark (VERDICT r4 item: demonstrate
`dedup_ngram_pairs_prefix` beating the unfiltered exact join).

Builds a TEMPLATE-HEAVY variant of the documents table — the corpus
shape the prefix join exists for: every page shares one of a few large
boilerplate templates (high-df shingles, drawn from the real sf
documents text) plus a genuinely unique tail (df-1 shingles), with
planted true near-duplicates.  On such a corpus the unfiltered exact
join pays Sigma df^2 pair emissions over the template vocabulary
(~67M here) while the df-ascending prefix index contains only the
unique tails, so candidates collapse to the planted pairs.

Why tails must be UNIQUE tokens and not sf text snippets: reusing
corpus text for the "unique" part plants mid-df (2..30) shingles
shared across random doc pairs, and NO prefix order can exclude a
rare-but-shared shingle from both prefixes — measured on such a
corpus the prefix op admits ~0.8-1M candidate pairs and loses 4x
(run disclosed in BASELINE.md).  Template-plus-unique-tail is the
real template-crawl shape, not a benchmark trick.

Usage:  python tools/bench_prefix_crossover.py
Prints one JSON line with both wall times and the answer-parity bit.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_corpus(dest: str, sf_dir: str = "/root/testdata/sf0.1",
                 n_docs: int = 3000, n_templates: int = 20,
                 n_planted: int = 50) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["text"]).column("text").to_pylist()
    texts = [t or "" for t in src]
    templates = []
    for t in range(n_templates):
        parts = [texts[(t * 97 + j * 13) % len(texts)][:150]
                 for j in range(6)]
        templates.append(" ".join(parts))
    out = []
    for i in range(n_docs):
        # unique tail: tokens no other doc can share (deterministic,
        # no RNG) -> tail shingles have df=1 except for planted copies
        tail = " ".join(f"u{i}x{j}" for j in range(130))
        out.append(templates[i % n_templates] + " " + tail)
    for k in range(n_planted):
        out.append(out[k * 37].replace("the", "teh", 1))
    n_all = len(out)
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n_all), pa.int64()),
        "text": pa.array(out, pa.string()),
        "lang": pa.array(["en"] * n_all),
        "source": pa.array(["bench"] * n_all),
        "n_chars": pa.array([len(t) for t in out], pa.int64()),
    }), os.path.join(dest, "documents.parquet"))
    return n_all


def main() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from neocrawler_ray.pipelines import corpus_ops as co

    d = "/tmp/nc_prefix_crossover"
    n_all = build_corpus(d)

    def run(fn):
        t0 = time.time()
        r = fn(d)
        r = r.to_pandas() if hasattr(r, "to_pandas") else r
        return time.time() - t0, r

    tp, a = run(co.dedup_ngram_pairs_prefix)
    tu, b = run(lambda s: co.dedup_ngram_pairs(s, 4, 5))
    a_ = (a.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
          [["doc_a", "doc_b", "n_intersect", "n_union"]])
    b_ = (b.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
          [["doc_a", "doc_b", "n_intersect", "n_union"]])
    print(json.dumps({
        "corpus_docs": n_all,
        "prefix_sec": round(tp, 2), "prefix_pairs": len(a_),
        "unfiltered_sec": round(tu, 2), "unfiltered_pairs": len(b_),
        "same_answer": bool(a_.equals(b_)),
        "speedup": round(tu / tp, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
