"""Bench-scale (sf0.1) brute-force cross-checks for the no-oracle LSH
family (VERDICT r2 item 7): the DuckDB gate can't express MinHash/LSH
pipelines, so the hard signal is recall/precision against exact
baselines at the scale the bench runs — planted near-duplicates over
the real sf0.1 tables, since the synthetic corpora carry no natural
near-dups (max pairwise cosine ≈ 0.51).

Recall bars come from the documented band math:
- MinHash: 128 perms, 16 bands × 8 rows → P(candidate | jaccard s)
  = 1-(1-s^8)^16 ≈ 0.95 at s = 0.8, ≈ 0.99 at s = 0.85.
- sign-LSH: 8 tables × 10 planes (defaults in dedup.py) ≈ 0.99 at
  cosine 0.97.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from neocrawler_ray.functions import dedup as dd

SF01 = "/root/testdata/sf0.1"
PLANT_BASE = 10_000_000

pytestmark = pytest.mark.slow


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


@pytest.fixture(scope="module")
def planted_docs(tmp_path_factory):
    """sf0.1 documents + 60 planted near-dups (~5% token mutation) —
    returns (dir, truth) with truth = {(orig_id, planted_id): exact
    blake2b-shingle jaccard}."""
    tbl = pq.read_table(f"{SF01}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    rng = np.random.RandomState(7)
    # pick 60 docs with enough text that a 5% mutation stays a near-dup
    donors = [i for i, t in enumerate(texts) if t and len(t.split()) >= 80][:60]
    assert len(donors) == 60
    new_ids, new_texts, truth = [], [], {}
    for j, i in enumerate(donors):
        toks = texts[i].split()
        # varied mutation rates spread the true jaccard over ~0.82-0.97
        # (3-gram shingles: each mutated token kills ~3 shingles)
        n_mut = max(1, len(toks) // (25, 40, 60, 100)[j % 4])
        for pos in rng.choice(len(toks), size=n_mut, replace=False):
            toks[pos] = f"zzqx{j}m{pos}"
        mutated = " ".join(toks)
        pid = PLANT_BASE + j
        new_ids.append(pid)
        new_texts.append(mutated)
        truth[(ids[i], pid)] = _jaccard(
            dd.shingle_hashes(texts[i]), dd.shingle_hashes(mutated))
    d = tmp_path_factory.mktemp("sf01_planted")
    pq.write_table(
        pa.table({"doc_id": pa.array(ids + new_ids, pa.int64()),
                  "text": pa.array(texts + new_texts, pa.string())}),
        d / "documents.parquet")
    return str(d), truth, dict(zip(ids + new_ids, texts + new_texts))


def test_minhash_verified_recall_precision_sf01(ray_session, planted_docs):
    from neocrawler_ray.pipelines import corpus_ops as co

    d, truth, text_of = planted_docs
    found = co.dedup_minhash_verified(d, lsh_threshold=0.7,
                                      jaccard_threshold=0.8)
    pairs = {(int(a), int(b)): float(j)
             for a, b, j in zip(found["doc_a"], found["doc_b"],
                                found["jaccard"])}

    # recall vs the planted truth: band math predicts ≥0.95 at s=0.8 and
    # ≈0.99 above 0.85 — require ≥0.9 over all truth pairs ≥ 0.8
    truth_pos = {k for k, j in truth.items() if j >= 0.8}
    assert len(truth_pos) >= 40  # the plant produced a real population
    hit = truth_pos & set(pairs)
    assert len(hit) / len(truth_pos) >= 0.9

    # precision: every reported pair re-verifies EXACTLY on the driver —
    # the distributed verify (shingle-at-scan, doc_id/pair_key exchanges)
    # must agree with a direct two-text computation, at bench scale
    assert pairs  # non-empty
    for (a, b), j in pairs.items():
        exact = _jaccard(dd.shingle_hashes(text_of[a]),
                         dd.shingle_hashes(text_of[b]))
        assert exact >= 0.8
        assert abs(exact - j) < 1e-12


@pytest.fixture(scope="module")
def planted_embeddings(tmp_path_factory):
    """sf0.1 embeddings + 50 planted pairs at cosine 0.955-0.985 (the
    advertised-threshold band that exposed the round-1 recall bug)."""
    tbl = pq.read_table(f"{SF01}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float64) for v in
            tbl.column("embedding").to_pylist()]
    rng = np.random.RandomState(11)
    new_ids, new_vecs = [], []
    for j in range(50):
        v = vecs[j] / np.linalg.norm(vecs[j])
        w = rng.standard_normal(len(v))
        w -= (w @ v) * v
        w /= np.linalg.norm(w)
        c = 0.955 + 0.03 * rng.rand()
        new_ids.append(PLANT_BASE + j)
        new_vecs.append(c * v + np.sqrt(1.0 - c * c) * w)
    d = tmp_path_factory.mktemp("sf01_emb")
    pq.write_table(
        pa.table({"vec_id": pa.array(ids + new_ids, pa.int64()),
                  "embedding": pa.array(
                      [list(map(float, v)) for v in vecs + new_vecs],
                      pa.list_(pa.float32()))}),
        d / "embeddings.parquet")
    return str(d)


def test_embedding_lsh_recall_sf01(ray_session, planted_embeddings):
    from neocrawler_ray.pipelines import corpus_ops as co

    brute = co.embedding_pairs_brute(planted_embeddings, threshold=0.97)
    lsh = co.dedup_embedding_pairs(planted_embeddings, threshold=0.97)
    bs = set(zip(brute["vec_a"], brute["vec_b"]))
    ls = set(zip(lsh["vec_a"], lsh["vec_b"]))
    assert len(bs) >= 20  # plant produced a real ≥0.97 population
    assert ls <= bs  # bucket-local cosine verify → no false positives
    assert len(ls & bs) / len(bs) >= 0.9  # banded multi-table recall bar
