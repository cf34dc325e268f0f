"""Mergeable quantile sketches — the scale seam for unbounded value
domains.

``events_value_quantiles`` (pipelines/analytics.py) is exact because its
exchange is bounded by the DISTINCT fixed-point value count; on an
unbounded/continuous domain that bound disappears, and the standard
answer is a mergeable t-digest sketch (Dunning & Ertl, "Computing
Extremely Accurate Quantiles Using t-Digests", arXiv:1902.04023 — the
k1 scale function variant).  This module implements the merging
t-digest as pure numpy array kernels so it can ride ``map_batches``
partials and ``_hash_grouped`` combines without per-value Python:

- :func:`compress` — weighted points → ≤ ~compression/2+2 centroids by
  one vectorized k-scale bucket assignment + ``np.add.reduceat`` (no
  insertion loop; sorting dominates, which the per-batch path already
  pays anywhere).
- digests serialize to a single ``bytes`` payload (means ‖ weights,
  float64), so a partial is ONE row per (group, block) on the exchange
  regardless of row count or value cardinality.

Error model: k1 buckets give ~O(1/compression) rank error at mid
quantiles and tighter tails (the scale function concentrates centroids
near q→0/1).  The pytest tolerance check asserts rank error ≤ 2 %
against the exact histogram path at compression=200.
"""

from __future__ import annotations

import numpy as np

DEFAULT_COMPRESSION = 200


def _k_scale(q: np.ndarray, compression: float) -> np.ndarray:
    """k1 scale function: k(q) = (c / 2π) · asin(2q − 1)."""
    return compression / (2.0 * np.pi) * np.arcsin(
        np.clip(2.0 * q - 1.0, -1.0, 1.0))


def compress(means: np.ndarray, weights: np.ndarray,
             compression: float = DEFAULT_COMPRESSION
             ) -> tuple[np.ndarray, np.ndarray]:
    """Merge weighted points (or centroids) into t-digest centroids.

    Points are sorted by mean; each lands in bucket ``floor(k(q_mid))``
    of its midpoint quantile, and buckets collapse to their weighted
    mean.  k spans [−c/4, c/4], so ≤ c/2 + 2 centroids come out."""
    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    total = w.sum()
    q_mid = (np.cumsum(w) - 0.5 * w) / total
    b = np.floor(_k_scale(q_mid, compression)).astype(np.int64)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(b)) + 1))
    sum_w = np.add.reduceat(w, starts)
    sum_mw = np.add.reduceat(m * w, starts)
    return sum_mw / sum_w, sum_w


def from_values(values: np.ndarray,
                compression: float = DEFAULT_COMPRESSION
                ) -> tuple[np.ndarray, np.ndarray]:
    """Digest of raw values (each a weight-1 point)."""
    v = np.asarray(values, dtype=np.float64)
    return compress(v, np.ones(v.size, dtype=np.float64), compression)


def merge(digests: list[tuple[np.ndarray, np.ndarray]],
          compression: float = DEFAULT_COMPRESSION
          ) -> tuple[np.ndarray, np.ndarray]:
    """Merge any number of digests: concatenate centroids, re-compress."""
    if not digests:
        return (np.empty(0), np.empty(0))
    m = np.concatenate([d[0] for d in digests])
    w = np.concatenate([d[1] for d in digests])
    return compress(m, w, compression)


def quantile(means: np.ndarray, weights: np.ndarray, qs) -> np.ndarray:
    """Estimate quantiles by linear interpolation between centroid
    midpoints (the standard t-digest query)."""
    qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
    if means.size == 0:
        return np.full(qs.shape, np.nan)
    cw = np.cumsum(weights) - 0.5 * weights
    return np.interp(qs * weights.sum(), cw, means,
                     left=means[0], right=means[-1])


def serialize(means: np.ndarray, weights: np.ndarray) -> bytes:
    """means ‖ weights as float64 bytes — one exchange payload."""
    return np.concatenate(
        [np.asarray(means, np.float64), np.asarray(weights, np.float64)]
    ).tobytes()


def deserialize(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    arr = np.frombuffer(blob, dtype=np.float64)
    half = arr.size // 2
    return arr[:half], arr[half:]


# ---------------------------------------------------------------------------
# HyperLogLog — mergeable distinct-count sketch (Flajolet, Fusy, Gandouet,
# Meunier, "HyperLogLog: the analysis of a near-optimal cardinality
# estimation algorithm", AofA 2007; linear-counting small-range correction
# per Heule, Nunkesser, Hall, "HyperLogLog in Practice", EDBT 2013).
#
# Same exchange contract as the t-digest above: a partial is ONE fixed-size
# bytes row (2^p uint8 registers) per (group, block) regardless of row
# count, merge is an elementwise max (associative + commutative + idempotent
# — retries and replays are harmless), and the estimate is answer-sized on
# the driver.  Standard error ≈ 1.04 / sqrt(2^p)  (~1.6 % at p = 12).
# ---------------------------------------------------------------------------

HLL_P_DEFAULT = 12


def hll_from_hashes(hashes: np.ndarray, p: int = HLL_P_DEFAULT) -> np.ndarray:
    """Build a register array from pre-hashed uint64 values.

    Top ``p`` bits pick the register; the rank is the position of the
    first set bit in the remaining ``64-p`` bits (computed exactly via
    ``np.frexp`` — valid only while ``64-p <= 53`` keeps the suffix
    inside float64's integer range, hence the ``p >= 11`` floor: below
    it a suffix just under a power of two can round up and understate
    the rank by one)."""
    if not 11 <= p <= 18:
        raise ValueError("p out of range (frexp rank exact only for 11..18)")
    h = np.asarray(hashes, dtype=np.uint64)
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if h.size == 0:
        return reg
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    bit_len = np.frexp(w.astype(np.float64))[1]  # 0 when w == 0
    rank = ((64 - p) - bit_len + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(registers: list[np.ndarray]) -> np.ndarray:
    """Elementwise max over register arrays (must share the same p)."""
    out = registers[0].copy()
    for r in registers[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(reg: np.ndarray) -> float:
    """Cardinality estimate with the linear-counting low-range switch."""
    m = reg.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.ldexp(1.0, -reg.astype(np.int64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency sketch (Cormode, Muthukrishnan,
# "An improved data stream summary: the count-min sketch and its
# applications", J. Algorithms 2005).
#
# Same exchange contract as the t-digest / HLL above: a partial is ONE
# fixed-size row of d·w int64 counters per block regardless of row count,
# merge is elementwise ADD (associative + commutative), and point estimates
# (min over the d rows) are answer-sized on the driver.  Estimates never
# undercount; the overcount is ≤ e·N/w with probability ≥ 1 − e^−d over
# the hash draw (here fixed multiply-shift constants, so the whole sketch
# is deterministic and replays are byte-identical).
# ---------------------------------------------------------------------------

CMS_W_DEFAULT = 1 << 16
CMS_D_DEFAULT = 4

# fixed odd multipliers + offsets (multiply-shift hashing: uint64 multiply
# wraps mod 2^64, top log2(w) bits index the row's counters)
_CMS_A = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                   0x165667B19E3779F9, 0xD6E8FEB86659FD93], dtype=np.uint64)
_CMS_B = np.array([0x2545F4914F6CDD1D, 0x9D8A075B4B9E3F21,
                   0x5851F42D4C957F2D, 0x14057B7EF767814F], dtype=np.uint64)


def cms_indices(hashes: np.ndarray, w: int = CMS_W_DEFAULT,
                d: int = CMS_D_DEFAULT) -> np.ndarray:
    """(d, n) counter indices for pre-hashed uint64 keys.  ``w`` must
    be a power of two ≥ 2: the top log2(w) bits index the row, so any
    other width would silently confine indices to the next power of
    two below it (and w=1 would need an undefined 64-bit shift)."""
    if w < 2 or w & (w - 1):
        raise ValueError("CMS width must be a power of two >= 2")
    h = np.asarray(hashes, dtype=np.uint64)
    shift = np.uint64(64 - int(w).bit_length() + 1)
    out = np.empty((d, h.size), dtype=np.int64)
    for i in range(d):
        out[i] = ((h * _CMS_A[i] + _CMS_B[i]) >> shift).astype(np.int64)
    return out


def cms_from_hashes(hashes: np.ndarray, counts: np.ndarray,
                    w: int = CMS_W_DEFAULT,
                    d: int = CMS_D_DEFAULT) -> np.ndarray:
    """Build a (d, w) sketch from (key-hash, count) pairs."""
    table = np.zeros((d, w), dtype=np.int64)
    if len(hashes) == 0:
        return table
    idx = cms_indices(hashes, w, d)
    c = np.asarray(counts, dtype=np.int64)
    for i in range(d):
        np.add.at(table[i], idx[i], c)
    return table


def cms_merge(tables: list[np.ndarray]) -> np.ndarray:
    """Elementwise sum (all tables must share (d, w))."""
    out = tables[0].copy()
    for t in tables[1:]:
        out += t
    return out


def cms_estimate(table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates (min over depth rows) — never undercounts."""
    d, w = table.shape
    if len(hashes) == 0:
        return np.zeros(0, dtype=np.int64)
    idx = cms_indices(hashes, w, d)
    est = table[0][idx[0]]
    for i in range(1, d):
        np.minimum(est, table[i][idx[i]], out=est)
    return est.astype(np.int64)


# ---------------------------------------------------------------------------
# Bloom filter — mergeable membership sketch (Bloom, "Space/time trade-offs
# in hash coding with allowable errors", CACM 1970).  Partial = one
# fixed-size bit array per block, merge = elementwise OR (associative,
# commutative, idempotent — replay-safe), no false negatives.  Used as the
# EXCHANGE PREFILTER in bloom-assisted joins: the big side drops rows whose
# key cannot be in the build side before shuffling; an exact in-partition
# test removes the ≤ (1 − e^{−kn/m})^k false positives, so results stay
# exact while the exchange carries only plausible rows.
# ---------------------------------------------------------------------------

BLOOM_M_DEFAULT = 1 << 20   # bits
BLOOM_K_DEFAULT = 4


def _bloom_bit_positions(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(k, n) bit indices via double hashing h1 + i·h2 (Kirsch &
    Mitzenmacher: two hash functions suffice)."""
    h = np.asarray(hashes, dtype=np.uint64)
    h1 = h * _CMS_A[0] + _CMS_B[0]
    h2 = (h * _CMS_A[1] + _CMS_B[1]) | np.uint64(1)
    out = np.empty((k, h.size), dtype=np.int64)
    for i in range(k):
        out[i] = ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)
    return out


def bloom_from_hashes(hashes: np.ndarray, m: int = BLOOM_M_DEFAULT,
                      k: int = BLOOM_K_DEFAULT) -> np.ndarray:
    """Bit array (uint8-packed, m/8 bytes) for pre-hashed uint64 keys.

    ``m`` must be a multiple of 8: positions are taken mod m but the
    array packs m//8 bytes, and ``bloom_might_contain`` reconstructs
    m as bits.size·8 — a ragged m either IndexErrors on insert or
    silently yields FALSE NEGATIVES from the m mismatch, breaking the
    no-false-negative contract the exact bloom semi-join relies on."""
    if m % 8 != 0 or m <= 0:
        raise ValueError(f"bloom m must be a positive multiple of 8, got {m}")
    bits = np.zeros(m // 8, dtype=np.uint8)
    if len(hashes) == 0:
        return bits
    pos = _bloom_bit_positions(hashes, m, k).ravel()
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def bloom_merge(arrays: list[np.ndarray]) -> np.ndarray:
    out = arrays[0].copy()
    for a in arrays[1:]:
        np.bitwise_or(out, a, out=out)
    return out


def bloom_might_contain(bits: np.ndarray, hashes: np.ndarray,
                        k: int = BLOOM_K_DEFAULT) -> np.ndarray:
    """Vectorized membership mask (no false negatives)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    m = bits.size * 8
    pos = _bloom_bit_positions(hashes, m, k)
    ok = np.ones(pos.shape[1], dtype=bool)
    for i in range(k):
        p = pos[i]
        ok &= (bits[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
    return ok
