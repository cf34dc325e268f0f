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


def batch_to_matrix(embeddings) -> np.ndarray:
    """Arrow ``list<float>`` / object column → (B, D) float64 matrix."""
    if isinstance(embeddings, np.ndarray) and embeddings.ndim == 2:
        return embeddings.astype(np.float64)
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
        sims = cosine_matrix(self.q, m)  # (Q, B)
        # exclude self-matches
        self_mask = ids[None, :] == self.qids[:, None]
        sims[self_mask] = -np.inf
        k = min(self.k, sims.shape[1])
        # local top-k per query (argpartition = O(B), not a full sort)
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in idx[qi]:
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
        d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
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
        m = batch_to_matrix(batch[self.vec_col].to_numpy())
        d = ((m[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        out = batch.copy()
        out["ivf_cell"] = d.argmin(axis=1).astype("int64")
        return out


def probe_cells(query_matrix: np.ndarray, centroids: np.ndarray,
                nprobe: int) -> np.ndarray:
    """(Q, nprobe) nearest cells per query — the filter pushed to the read."""
    q = np.asarray(query_matrix, dtype=np.float64)
    d = ((q[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return np.argsort(d, axis=1, kind="stable")[:, :nprobe]
