"""Deduplication operators for the training-data pipeline layer.

Five dedup families over the ``documents`` / ``embeddings`` tables, each
designed Ray-Data-first for 100 TB:

- **exact**: md5(text) key → hash-partitioned ``groupby.min(doc_id)``.
  The shuffle moves 16-byte digests + int64 ids, never document bodies,
  and batches are locally pre-deduped (combiner) before the exchange.
  (Generalizes the reference's exact URL dedup — the URL-seen set,
  reference pipeline.js:127-172 — from urls to contents.)
- **MinHash + LSH**: word-shingle → 128-perm minhash signature (numpy,
  one matrix op per doc) → band keys; candidate pairs come from a
  groupby on band hash, so only (band_key, doc_id, signature) rows are
  shuffled (~1 KB/doc), never text.  Estimated Jaccard from signature
  agreement gates the output pairs.
- **SimHash**: 64-bit weighted word-hash sketch; 4×16-bit band blocking
  (any pair within Hamming distance 3 shares ≥1 exact band) → verify
  true Hamming distance within buckets.
- **n-gram Jaccard**: exact verification kernel for candidate pairs
  (used downstream of LSH; exact-by-construction, pytest-verified).
- **embedding near-dup**: random-hyperplane LSH buckets over unit
  vectors → within-bucket cosine ≥ threshold pairs (brute variant for
  oracle-scale checks).

All randomized structures are seeded module constants, so every run —
and every actor — derives identical hash families (required for
cross-batch bucketing and for resumability).
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pandas as pd

_WORD_RE = re.compile(r"\S+")

MINHASH_PERMS = 128
MINHASH_SEED = 0xC0FFEE
LSH_BANDS = 16  # 16 bands × 8 rows ≈ threshold ~ (1/16)^(1/8) ≈ 0.71
SIMHASH_BANDS = 4

_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(MINHASH_SEED)
_PERM_A = _rng.randint(1, _MERSENNE, size=MINHASH_PERMS, dtype=np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=MINHASH_PERMS, dtype=np.uint64)
_EMPTY_SIG = np.full(MINHASH_PERMS, _MERSENNE, dtype=np.uint64)


def _hash64(token: str) -> int:
    return struct.unpack("<Q", hashlib.blake2b(token.encode(), digest_size=8).digest())[0]


def word_shingles(text: str, k: int = 3) -> list[str]:
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


# k-gram combine: positional multiply-add chain + murmur3 finalizer —
# vectorized replacement for blake2b(" ".join(gram)); any injective-ish
# 64-bit hash of the token-hash tuple preserves set-Jaccard semantics
_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def _fmix64(x: np.ndarray) -> np.ndarray:
    """murmur3 64-bit finalizer, vectorized (full avalanche)."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(33))
        x = x * np.uint64(0xFF51AFD7ED558CCD)
        x = x ^ (x >> np.uint64(33))
        x = x * np.uint64(0xC4CEB9FE1A85EC53)
        x = x ^ (x >> np.uint64(33))
    return x


def shingle_hashes_from_token_hashes(th: np.ndarray, k: int = 3) -> np.ndarray:
    """SORTED UNIQUE uint64 k-gram shingle hashes from per-token hashes.

    One vectorized multiply-add chain over k shifted views — no loop
    over shingles.  Mirrors ``word_shingles`` edge semantics: fewer
    than k tokens → one shingle of all tokens; empty → empty."""
    n = len(th)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    kk = min(k, n)
    m = n - kk + 1
    with np.errstate(over="ignore"):
        acc = th[:m].astype(np.uint64, copy=True)
        for j in range(1, kk):
            acc = acc * _SHINGLE_MIX + th[j:m + j]
    return np.unique(_fmix64(acc))


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Sorted unique shingle-hash set of a document (the Jaccard
    universe for minhash + the distributed verify payload)."""
    toks = _WORD_RE.findall(text.lower())
    return shingle_hashes_from_token_hashes(_token_hashes(toks), k)


def span_hashes(text: str, w: int) -> np.ndarray:
    """Sorted unique uint64 hashes of a doc's ``w``-token spans — the
    ExactSubstr-style dedup universe (``pipelines.corpus_ops.
    doc_dup_spans``).  Unlike :func:`shingle_hashes` there is NO
    whole-doc collapse: fewer than ``w`` tokens means zero spans (a
    "duplicated span of length w" is undefined for shorter docs).
    Same multiply-add chain + murmur3 finalizer as the shingle kernel,
    so one span == one vectorized window, never a span string."""
    th = _token_hashes(_WORD_RE.findall(str(text).lower()))
    n = len(th)
    if n < w:
        return np.empty(0, dtype=np.uint64)
    m = n - w + 1
    with np.errstate(over="ignore"):
        acc = th[:m].astype(np.uint64, copy=True)
        for j in range(1, w):
            acc = acc * _SHINGLE_MIX + th[j:m + j]
    return np.unique(_fmix64(acc))


def _sig_matrix(shingle_sets: list[np.ndarray],
                perm_chunk: int = 32) -> np.ndarray:
    """(n_docs, P) minhash signature matrix for a batch of shingle-hash
    sets: ONE concatenated array + ``np.minimum.reduceat`` per perm
    chunk — no per-document python loop (the per-doc (P×S) matmul it
    replaces spent most of its time in numpy call overhead at web-page
    shingle counts).  Empty docs get the empty-signature sentinel."""
    n = len(shingle_sets)
    sig = np.empty((n, MINHASH_PERMS), dtype=np.uint64)
    sig[:] = _MERSENNE
    nonempty = [i for i, h in enumerate(shingle_sets) if len(h)]
    if not nonempty:
        return sig
    concat = np.concatenate([shingle_sets[i] for i in nonempty])
    lens = np.array([len(shingle_sets[i]) for i in nonempty], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    rows = np.array(nonempty, dtype=np.int64)
    for lo in range(0, MINHASH_PERMS, perm_chunk):
        hi = min(lo + perm_chunk, MINHASH_PERMS)
        with np.errstate(over="ignore"):
            m = (_PERM_A[lo:hi, None] * concat[None, :]
                 + _PERM_B[lo:hi, None]) % _MERSENNE
        sig[rows, lo:hi] = np.minimum.reduceat(m, starts, axis=1).T
    return sig


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """128-perm minhash over word k-shingles: sig[p] = min_h (a_p*h+b_p mod M)."""
    h = shingle_hashes(text, k)
    if h.size == 0:
        return _EMPTY_SIG.copy()
    return _sig_matrix([h])[0]


def band_keys(sig: np.ndarray, bands: int = LSH_BANDS) -> list[str]:
    """LSH band keys: md5 of each band's signature bytes, prefixed with
    the band index so different bands never collide into one bucket.
    (Scalar reference form; the pipeline uses :func:`band_keys_matrix`.)"""
    r = len(sig) // bands
    return [
        f"{b}:{hashlib.md5(sig[b * r:(b + 1) * r].tobytes()).hexdigest()[:16]}"
        for b in range(bands)
    ]


def band_keys_matrix(sigs: np.ndarray, bands: int = LSH_BANDS) -> np.ndarray:
    """(n, bands) int64 LSH bucket keys, fully vectorized: fold each
    band's rows with the multiply-add chain + finalizer, then xor a
    band-index avalanche so different bands never share a bucket.
    Same bucketing semantics as :func:`band_keys` (equal band
    signature ⟺ equal key, barring 64-bit collisions)."""
    n, p = sigs.shape
    r = p // bands
    cube = sigs.reshape(n, bands, r)
    with np.errstate(over="ignore"):
        acc = cube[:, :, 0].astype(np.uint64, copy=True)
        for j in range(1, r):
            acc = acc * _SHINGLE_MIX + cube[:, :, j]
        acc = _fmix64(acc) ^ _fmix64(
            np.arange(bands, dtype=np.uint64) + np.uint64(1))[None, :]
    return acc.view(np.int64)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.count_nonzero(sig_a == sig_b)) / float(len(sig_a))


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (the verify kernel behind LSH)."""
    sa, sb = set(word_shingles(text_a, k)), set(word_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


# --- simhash ----------------------------------------------------------


# worker-global token→hash memo: corpus vocabularies are Zipfian, so
# across the docs of a batch (and across batches on one worker) most
# blake2b calls are cache hits — measured as the dominant cost of the
# original per-doc sketch.  Bounded: when over cap, a pseudo-random
# HALF is evicted (never the whole dict) so steady-state memory stays
# ~cap/2–cap and the hot Zipf head survives eviction with p=1/2 per
# round instead of being flushed wholesale (a full clear() caused a
# periodic rehash spike on large-vocabulary corpora).  The eviction
# predicate bit ROTATES per round (_TOKEN_EVICT_ROUND): str hash is
# fixed per process, so a fixed `hash(k) & 1` would make even-hash keys
# permanently unevictable and the cache would converge on ~half the
# distinct vocabulary regardless of cap, with every over-cap call doing
# a full scan that deletes nothing.
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_CAP = 1_000_000
_TOKEN_EVICT_ROUND = 0


def _token_hashes(tokens) -> np.ndarray:
    global _TOKEN_EVICT_ROUND
    cache = _TOKEN_HASH_CACHE
    if len(cache) > _TOKEN_HASH_CACHE_CAP:
        _TOKEN_EVICT_ROUND = (_TOKEN_EVICT_ROUND + 1) % 64
        shift = _TOKEN_EVICT_ROUND
        for k in [k for k in cache if (hash(k) >> shift) & 1]:
            del cache[k]
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, tk in enumerate(tokens):
        h = cache.get(tk)
        if h is None:
            h = cache[tk] = _hash64(tk)
        out[i] = h
    return out


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized 64-bit SimHash (Charikar sketch) for a batch of docs.

    ONE flat pass over every token instance of the batch: the classic
    per-token-TYPE weighted vote ``counts @ (2*bits-1)`` equals summing
    each INSTANCE's ±1 bit vector, i.e. ``votes = 2*bitsum - n_inst``
    — so no per-doc value_counts / Series machinery is needed.  Steps:
    tokenize per doc (C regex, intrinsic), hash the whole batch's
    instances through the worker-global memo, unpackbits once on the
    uint64 byte view, and ``np.add.reduceat`` over doc boundaries.
    Bit-identical to the scalar ``simhash64``.
    """
    res = np.zeros(len(texts), dtype=np.uint64)
    tok_lists = [_WORD_RE.findall(str(t).lower()) for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    nonempty = np.nonzero(lens)[0]
    if len(nonempty) == 0:
        return res
    flat: list[str] = []
    for i in nonempty:
        flat.extend(tok_lists[i])
    hashes = _token_hashes(flat)
    # little-endian byte view + bitorder="little" ⇒ column i == bit i
    bits = np.unpackbits(
        hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    ne_lens = lens[nonempty]
    starts = np.concatenate(([0], np.cumsum(ne_lens)[:-1]))
    bitsum = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
    votes = 2 * bitsum - ne_lens[:, None]
    res[nonempty] = np.packbits(
        (votes > 0).astype(np.uint8), axis=1, bitorder="little"
    ).view(np.uint64)[:, 0]
    return res


def simhash64(text: str) -> int:
    """64-bit SimHash over word counts (single-doc convenience)."""
    return int(simhash64_batch([text])[0])


def simhash_bands(h: int, bands: int = SIMHASH_BANDS) -> list[str]:
    w = 64 // bands
    return [f"{b}:{(h >> (b * w)) & ((1 << w) - 1):04x}" for b in range(bands)]


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over a uint64 array (any shape).

    ~6 elementwise ops per lane — measured ~3-4x faster than the
    byte-table gather (``popb[x.view(uint8)].sum``) it replaced in the
    simhash pair matrix, because it never materializes an 8x byte view
    or does fancy-index gathers."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(
        np.int64)


# --- embedding near-dup ----------------------------------------------

_HYPERPLANE_SEED = 0x5EED
# BANDED sign-LSH (like minhash bands): a pair is a candidate if ANY band
# of EMB_LSH_BITS sign bits matches exactly.  A single wide sign pattern
# has recall p^bits with p = 1 - theta/pi per plane — at cosine 0.97
# (theta ≈ 0.245 rad, p ≈ 0.922) a lone 16-bit table keeps only ~27% of
# true pairs; 8 bands × 10 bits keep 1-(1-p^10)^8 ≈ 0.99 (≈0.98 at 0.96).
# More bits/band ⇒ finer buckets (fewer random collisions at corpus
# scale); more bands ⇒ higher recall — both are caller knobs.
EMB_LSH_BANDS = 8
EMB_LSH_BITS = 10


def hyperplanes(dim: int, n_planes: int = EMB_LSH_BANDS * EMB_LSH_BITS) -> np.ndarray:
    """Seeded random hyperplanes (deterministic per dim) for cosine LSH."""
    rng = np.random.RandomState(_HYPERPLANE_SEED + dim)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def cosine_lsh_band_keys(vecs: np.ndarray, planes: np.ndarray,
                         bands: int = EMB_LSH_BANDS,
                         bits: int = EMB_LSH_BITS) -> np.ndarray:
    """(n, bands) int64 bucket keys; key = band_index<<bits | sign-pattern
    so different bands never collide into one bucket."""
    signs = (vecs @ planes[:bands * bits].T) > 0  # (n, bands*bits)
    signs = signs.reshape(len(vecs), bands, bits).astype(np.int64)
    patt = (signs << np.arange(bits, dtype=np.int64)[None, None, :]).sum(axis=2)
    return patt + (np.arange(bands, dtype=np.int64)[None, :] << bits)


# --- batch-level kernels (used inside map_batches) --------------------


def md5_hex_series(texts: pd.Series) -> pd.Series:
    return pd.Series(
        [hashlib.md5(str(t).encode()).hexdigest() for t in texts.fillna("")],
        index=texts.index, dtype="string",
    )


def exact_dedup_batch(df: pd.DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> pd.DataFrame:
    """Combiner for exact dedup: local (text_md5 → min id) per batch.

    Emits only (text_md5, doc_id); the global ``groupby("text_md5")``
    then reduces combiner outputs — the exchange never carries text.
    """
    out = pd.DataFrame(
        {"text_md5": md5_hex_series(df[text_col]), id_col: df[id_col]}
    )
    return (
        out.groupby("text_md5", as_index=False, sort=False)[id_col]
        .min()
        .astype({id_col: "int64"})
    )


def minhash_batch(df: pd.DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3) -> pd.DataFrame:
    """Per-batch minhash: one output row per (doc, band).

    Per doc only the C-regex tokenize runs in Python; shingle hashing,
    the signature matrix and band keys are single vectorized kernels
    over the whole batch (``_sig_matrix`` / ``band_keys_matrix``)."""
    texts = df[text_col].fillna("").tolist()
    ids = df[id_col].to_numpy(dtype=np.int64)
    sets = [
        shingle_hashes_from_token_hashes(
            _token_hashes(_WORD_RE.findall(str(t).lower())), k)
        for t in texts
    ]
    sigs = _sig_matrix(sets)
    keys = band_keys_matrix(sigs)  # (n, bands)
    n, bands = keys.shape
    sig_bytes = np.array([s.tobytes() for s in sigs], dtype=object)
    return pd.DataFrame(
        {"band_key": pd.Series(keys.reshape(-1), dtype="int64"),
         id_col: pd.Series(np.repeat(ids, bands), dtype="int64"),
         "sig": pd.Series(sig_bytes.repeat(bands), dtype=object)}
    )


def candidate_pairs_from_bucket(ids: list[int], sigs: list[bytes],
                                threshold: float) -> list[tuple[int, int, float]]:
    """Within one LSH bucket: all pairs whose estimated Jaccard passes.

    Bucket sizes are bounded in practice (identical band ⇒ near-dup
    cluster); a hot bucket is itself the answer, not a skew bug.
    """
    order = np.argsort(ids)
    ids_s = [ids[i] for i in order]
    sig_arr = [np.frombuffer(sigs[i], dtype=np.uint64) for i in order]
    out = []
    for i in range(len(ids_s)):
        for j in range(i + 1, len(ids_s)):
            if ids_s[i] == ids_s[j]:
                continue
            est = estimate_jaccard(sig_arr[i], sig_arr[j])
            if est >= threshold:
                out.append((ids_s[i], ids_s[j], est))
    return out


def connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over near-dup pairs → {id: cluster_representative}.

    Driver-side: the pair list is tiny relative to the corpus (only
    near-dups).  Representative = min id in component (deterministic).
    """
    parent: dict[int, int] = {}
    seen: set[int] = set()

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in seen}


# --- edit distance (banded) -------------------------------------------


def banded_levenshtein(a: str, b: str, k: int) -> int:
    """Ukkonen banded Levenshtein: the exact distance if ≤ ``k``, else
    ``k + 1`` (the caller only needs "within threshold or not").

    Cost is O(len · k) instead of O(len²): only the |i−j| ≤ k diagonal
    band is computed.  Each DP row is vectorized — substitution /
    deletion are array shifts, and the insertion recurrence
    ``cur[j] = min(cur[j], cur[j-1]+1)`` (a sequential scan in the
    naive form) is rewritten as a prefix-min over ``cur[j] − j``, which
    ``np.minimum.accumulate`` computes in C.  Distances are over
    unicode CODEPOINTS (numpy '<U1' arrays), matching DuckDB's
    ``levenshtein``; a byte-level DP would disagree on non-ASCII
    text."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la == 0 or lb == 0:
        m = max(la, lb)
        return m if m <= k else k + 1
    B = np.array(list(b))
    inf = np.int32(k + 1)
    idx = np.arange(lb + 1, dtype=np.int32)
    prev = np.full(lb + 1, inf, dtype=np.int32)
    j0 = min(lb, k)
    prev[:j0 + 1] = idx[:j0 + 1]
    for i in range(1, la + 1):
        cur = np.full(lb + 1, inf, dtype=np.int32)
        jlo, jhi = max(1, i - k), min(lb, i + k)
        sub = prev[jlo - 1:jhi] + (B[jlo - 1:jhi] != a[i - 1])
        dele = prev[jlo:jhi + 1] + np.int32(1)
        np.minimum(sub, dele, out=cur[jlo:jhi + 1])
        lo = jlo
        if i <= k:
            cur[0] = i
            lo = 0
        t = cur[lo:jhi + 1] - idx[lo:jhi + 1]
        np.minimum.accumulate(t, out=t)
        cur[lo:jhi + 1] = t + idx[lo:jhi + 1]
        if int(cur[lo:jhi + 1].min()) > k:
            return k + 1
        prev = cur
    d = int(prev[lb])
    return d if d <= k else k + 1
