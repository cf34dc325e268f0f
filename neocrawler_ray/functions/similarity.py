"""Similarity search over an embedding column (``list<float>``).

Two paths, both Ray-Data-first:

- **Brute-force cosine top-k** (the exactness baseline): the query
  matrix is broadcast once (``ray.put`` by the pipeline layer / captured
  in the actor), each ``map_batches`` computes a (B×Q) float64 matmul
  and emits only its local top-k candidate rows (q_id, vec_id, sim) —
  a k·Q-row table per block, so the final global reduce is tiny no
  matter how many blocks the corpus has.
- **IVF** (the scale path): deterministic k-means (seeded, fixed
  iterations) builds a coarse codebook once; vectors are assigned to
  their nearest centroid inside ``map_batches`` (making the list
  partitionable by ``ivf_cell``), and queries probe only the
  ``nprobe`` nearest cells.  Recall is tested against the brute path.

Cosine here is ``dot(a,b)/(|a||b|)`` in float64 — the same definition
DuckDB's ``list_cosine_similarity`` uses, so the brute path has a SQL
oracle (ranks compared, not raw floats).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

KMEANS_SEED = 1234


def sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(Na, Nb) squared euclidean distances WITHOUT the O(Na·Nb·D)
    broadcast tensor the naive ``(a[:,None]-b[None])**2`` builds (at the
    documented 100k-sample × 1024-centroid × 128-dim codebook fit that
    tensor is ~100 GB): the expansion ||a||² − 2a·b + ||b||² is one
    matmul + two norm vectors.  Clamped at 0 (rounding can dip
    epsilon-negative).

    Determinism: the expansion's rounding depends on the BLAS build, so
    near-tied distances could flip argmin/argsort across machines (a
    "stable" argsort only stabilizes EXACT ties).  Distances are
    therefore snapped to a fixed absolute 2⁻³⁰ grid (~1e-9; unit-ish
    embeddings have d ∈ [0, 4], and the expansion's error is ~1e-13
    relative) — epsilon-neighbors become exact ties, which the callers'
    stable argmin/argsort then break by index, identically on every
    BLAS.  Genuinely distinct distances are ≫ one grid step apart."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    d = (np.einsum("ij,ij->i", a, a)[:, None]
         - 2.0 * (a @ b.T)
         + np.einsum("ij,ij->i", b, b)[None, :])
    np.maximum(d, 0.0, out=d)
    # snap to the 2^-30 grid (power of two: exact in binary fp)
    d *= 1073741824.0
    np.rint(d, out=d)
    d *= 9.313225746154785e-10  # 2.0**-30
    return d


def batch_to_matrix(embeddings) -> np.ndarray:
    """Arrow ``list<float>`` / object column → (B, D) float64 matrix.
    An empty column yields an explicit (0, 0) 2-D matrix — ``np.array``
    of an empty list is 1-D and crashes every axis=1 kernel downstream
    (Ray Data can emit empty blocks)."""
    if isinstance(embeddings, np.ndarray) and embeddings.ndim == 2:
        return embeddings.astype(np.float64)
    if len(embeddings) == 0:
        return np.empty((0, 0), dtype=np.float64)
    return np.array([np.asarray(e, dtype=np.float64) for e in embeddings])


def normalize_rows(vecs: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return vecs / norms


def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(Na, Nb) cosine similarities, float64 end to end."""
    na = np.linalg.norm(a, axis=1, keepdims=True)
    nb = np.linalg.norm(b, axis=1, keepdims=True)
    na[na == 0] = 1.0
    nb[nb == 0] = 1.0
    return (a @ b.T) / (na * nb.T)


class BruteTopK:
    """``map_batches`` actor: local top-k per query against a broadcast
    query matrix.  Setup (materializing the query matrix) happens once
    per actor in ``__init__``, not per batch."""

    def __init__(self, query_ids: list[int], query_matrix: np.ndarray, k: int,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.qids = np.asarray(query_ids, dtype=np.int64)
        self.q = np.asarray(query_matrix, dtype=np.float64)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy(dtype=np.int64)
        m = batch_to_matrix(batch[self.vec_col].to_numpy())
        rows_q, rows_v, rows_s = [], [], []
        if not len(ids):
            return pd.DataFrame(
                {"qid": pd.Series(rows_q, dtype="int64"),
                 self.id_col: pd.Series(rows_v, dtype="int64"),
                 "sim": pd.Series(rows_s, dtype="float64")})
        sims = cosine_matrix(self.q, m)  # (Q, B)
        # exclude self-matches
        self_mask = ids[None, :] == self.qids[:, None]
        sims[self_mask] = -np.inf
        k = min(self.k, sims.shape[1])
        # local top-k per query with the DOCUMENTED tie-break: an
        # argpartition cut alone drops boundary ties arbitrarily (dup
        # embeddings are common in a dedup corpus), so take everything
        # at/above the k-th similarity, then order (sim desc, id asc)
        # and keep k — still O(B) selection + O(c log c) on the tied
        # candidate set
        kth = -np.partition(-sims, k - 1, axis=1)[:, k - 1]
        for qi in range(sims.shape[0]):
            cand = np.flatnonzero(sims[qi] >= kth[qi])
            order = np.lexsort((ids[cand], -sims[qi, cand]))
            for j in cand[order][:k]:
                if np.isfinite(sims[qi, j]):
                    rows_q.append(self.qids[qi])
                    rows_v.append(ids[j])
                    rows_s.append(sims[qi, j])
        return pd.DataFrame(
            {"qid": pd.Series(rows_q, dtype="int64"),
             self.id_col: pd.Series(rows_v, dtype="int64"),
             "sim": pd.Series(rows_s, dtype="float64")}
        )


def global_topk(candidates: pd.DataFrame, k: int,
                id_col: str = "vec_id") -> pd.DataFrame:
    """Reduce per-block candidates → global top-k per query with the
    deterministic tie-break (sim desc, id asc). Adds a 1-based rank."""
    df = candidates.sort_values(
        ["qid", "sim", id_col], ascending=[True, False, True], kind="mergesort"
    )
    df = df.groupby("qid", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("qid").cumcount().astype("int64") + 1
    return df[["qid", id_col, "rank", "sim"]]


# --- IVF --------------------------------------------------------------


def kmeans_fit(sample: np.ndarray, n_clusters: int, n_iter: int = 10,
               seed: int = KMEANS_SEED) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample.

    At 100 TB the sample is a ``ds.limit(...)`` / random-sample pull of
    ~100k rows — the codebook itself stays tiny and is broadcast."""
    rng = np.random.RandomState(seed)
    x = np.asarray(sample, dtype=np.float64)
    n = x.shape[0]
    k = min(n_clusters, n)
    centroids = x[rng.choice(n, size=k, replace=False)]
    for _ in range(n_iter):
        assign = sq_dists(x, centroids).argmin(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


class IVFAssign:
    """``map_batches`` actor: nearest-centroid cell id per row (adds an
    ``ivf_cell`` column the pipeline can partition / filter on)."""

    def __init__(self, centroids: np.ndarray, vec_col: str = "embedding"):
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        if not len(batch):
            out["ivf_cell"] = pd.Series([], dtype="int64")
            return out
        m = batch_to_matrix(batch[self.vec_col].to_numpy())
        d = sq_dists(m, self.centroids)
        out["ivf_cell"] = d.argmin(axis=1).astype("int64")
        return out


def probe_cells(query_matrix: np.ndarray, centroids: np.ndarray,
                nprobe: int) -> np.ndarray:
    """(Q, nprobe) nearest cells per query — the filter pushed to the read."""
    q = np.asarray(query_matrix, dtype=np.float64)
    d = sq_dists(q, centroids)
    return np.argsort(d, axis=1, kind="stable")[:, :nprobe]
