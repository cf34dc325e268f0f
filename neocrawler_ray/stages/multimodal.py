"""Multimodal (binary-column) stages — schema, plumbing and stub decode.

Media payloads are opaque ``binary`` columns with typed metadata,
processed by actor-pool ``map_batches`` stages exactly as image/audio
decode would run at 100 TB: small ``batch_size`` (payloads are wide),
decoder state built once per actor in ``__init__``, zero-copy Arrow in,
Arrow out.  The real decoders (PIL / libav) are NOT in this container,
so ``RealImageDecode`` raises ``NotImplementedError`` unless PIL is
importable; the deterministic ``FakeDecode`` keeps every piece of
Ray-side plumbing (schema, batching, actor signature, output layout)
real and testable — and its arithmetic is mirrored in SQL so the
oracle verifies the full pipeline.

The synthetic ``media`` table derives from ``documents``:
``payload = utf-8 bytes of text``, ``kind = doc_id % 3 ∈
{image, audio, video}`` — no external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("meta", pa.string()),
    ]
)

KINDS = ("image", "audio", "video")


def media_from_documents(sf_dir: str):
    """documents → synthetic media table (deterministic payloads)."""
    from ..sources.tables import read_table

    ds = read_table(sf_dir, "documents", ["doc_id", "text", "source"],
                    rows_per_block=100)

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {"media_id": ids,
             "kind": pd.Series([KINDS[int(i) % 3] for i in ids], dtype="string"),
             "payload": pd.Series(
                 [str(t).encode("utf-8") for t in df["text"].fillna("")],
                 index=df.index, dtype=object),
             "meta": pd.Series(
                 ['{"source": "' + str(s) + '"}' for s in df["source"]],
                 index=df.index, dtype="string")}
        )

    return ds.map_batches(synth, batch_format="pandas")


class FakeDecode:
    """Deterministic stand-in decoder (actor-pool stage).

    width/height/n_frames are pure integer functions of the payload
    length, so the stage is SQL-mirrorable:
      width    = 64 + n_bytes % 577
      height   = 64 + n_bytes % 431
      n_frames = n_bytes // 100 + 1   (video) else 1
    """

    def __init__(self):
        # real decoders open codec contexts here, once per actor
        self.decoded_batches = 0

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        self.decoded_batches += 1
        n_bytes = np.array(
            [len(p) if p is not None else 0 for p in df["payload"]],
            dtype="int64",
        )
        kinds = df["kind"].astype(str).to_numpy()
        width = 64 + n_bytes % 577
        height = 64 + n_bytes % 431
        n_frames = np.where(kinds == "video", n_bytes // 100 + 1, 1).astype("int64")
        return pd.DataFrame(
            {"media_id": df["media_id"].astype("int64").to_numpy(),
             "kind": pd.Series(kinds, dtype="string"),
             "n_bytes": n_bytes,
             "width": width,
             "height": height,
             "n_frames": n_frames}
        )


class RealImageDecode:
    """Real decode path — gated on PIL availability (not in container).

    The stage contract matches :class:`FakeDecode`; deployments with
    pillow installed get pixel dimensions from the actual codec."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401
            self._image_mod = Image
        except ImportError as e:  # pragma: no cover - container has no PIL
            raise NotImplementedError(
                "image decoding requires pillow; use FakeDecode in this "
                "environment"
            ) from e

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:  # pragma: no cover
        import io

        rows = []
        for mid, payload in zip(df["media_id"], df["payload"]):
            im = self._image_mod.open(io.BytesIO(payload))
            rows.append((int(mid), "image", len(payload), im.width, im.height, 1))
        return pd.DataFrame(
            rows, columns=["media_id", "kind", "n_bytes", "width", "height",
                           "n_frames"]
        )


def multimodal_decode_meta(sf_dir: str):
    """media table → FakeDecode actor pool → typed metadata rows."""
    ds = media_from_documents(sf_dir)
    return ds.map_batches(
        FakeDecode, batch_format="pandas", batch_size=64, concurrency=(1, 8),
        num_cpus=0.5,
    )


def video_frame_sample(sf_dir: str, step: int = 5):
    """Frame sampling for 'video' payloads: flat-map each video row to
    its sampled frame indices (0, step, 2·step, …)."""
    ds = multimodal_decode_meta(sf_dir)

    def frames(df: pd.DataFrame) -> pd.DataFrame:
        vids = df[df["kind"] == "video"]
        out_id, out_idx = [], []
        for mid, nf in zip(vids["media_id"], vids["n_frames"]):
            for fi in range(0, int(nf), step):
                out_id.append(int(mid))
                out_idx.append(fi)
        return pd.DataFrame(
            {"media_id": pd.Series(out_id, dtype="int64"),
             "frame_idx": pd.Series(out_idx, dtype="int64")}
        )

    return ds.map_batches(frames, batch_format="pandas")


AUDIO_MS_PER_BYTE = 10     # deterministic fake duration model
AUDIO_SEGMENT_MS = 30_000  # 30-second training segments


def audio_segments(sf_dir: str):
    """Segment 'audio' payloads into fixed 30 s training windows.

    Duration is a deterministic function of payload size
    (``n_bytes × 10 ms``; a real decoder would read the container
    header in the actor), flat-mapped to one row per segment —
    (media_id, segment_idx, seg_ms), vectorized with np.repeat/arange
    like :func:`~neocrawler_ray.pipelines.corpus_ops.doc_chunks`."""
    ds = multimodal_decode_meta(sf_dir)

    def segs(df: pd.DataFrame) -> pd.DataFrame:
        aud = df[df["kind"] == "audio"]
        dur = aud["n_bytes"].to_numpy("int64") * AUDIO_MS_PER_BYTE
        ids = aud["media_id"].to_numpy("int64")
        n_segs = np.maximum(1, -(-dur // AUDIO_SEGMENT_MS))
        total = int(n_segs.sum())
        rep_ids = np.repeat(ids, n_segs)
        rep_dur = np.repeat(dur, n_segs)
        offsets = np.repeat(np.cumsum(n_segs) - n_segs, n_segs)
        idx = np.arange(total, dtype="int64") - offsets
        seg_ms = np.minimum(AUDIO_SEGMENT_MS, rep_dur - idx * AUDIO_SEGMENT_MS)
        return pd.DataFrame(
            {"media_id": pd.Series(rep_ids, dtype="int64"),
             "segment_idx": pd.Series(idx, dtype="int64"),
             "seg_ms": pd.Series(seg_ms, dtype="int64")})

    return ds.map_batches(segs, batch_format="pandas")


RESIZE_MAX = 256


def image_resize_meta(sf_dir: str):
    """Resize planning for 'image' payloads: integer fit-within-256
    target dimensions preserving aspect ratio (the geometry step a real
    resize stage computes before touching pixels — exactly mirrored in
    SQL so the plumbing is oracle-checked)."""
    ds = multimodal_decode_meta(sf_dir)

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        img = df[df["kind"] == "image"]
        w = img["width"].to_numpy("int64")
        h = img["height"].to_numpy("int64")
        out_w = np.where(w >= h, RESIZE_MAX, (w * RESIZE_MAX) // h)
        out_h = np.where(w >= h, (h * RESIZE_MAX) // w, RESIZE_MAX)
        return pd.DataFrame(
            {"media_id": img["media_id"].to_numpy("int64"),
             "width": w, "height": h,
             "out_w": pd.Series(out_w, dtype="int64"),
             "out_h": pd.Series(out_h, dtype="int64")})

    return ds.map_batches(plan, batch_format="pandas")


AUDIO_SEGMENTS_SQL = """
SELECT media_id,
       CAST(g AS BIGINT) AS segment_idx,
       CAST(LEAST(30000, dur - g * 30000) AS BIGINT) AS seg_ms
FROM (
  SELECT doc_id AS media_id,
         CAST(octet_length(encode(COALESCE(text, ''))) * 10 AS BIGINT) AS dur,
         unnest(generate_series(0,
             CAST(GREATEST(1, CEIL(octet_length(encode(COALESCE(text, ''))) * 10 / 30000.0))
                  AS BIGINT) - 1)) AS g
  FROM documents WHERE doc_id % 3 = 1
)
""".strip()

IMAGE_RESIZE_SQL = """
SELECT doc_id AS media_id,
  CAST(64 + octet_length(encode(COALESCE(text, ''))) % 577 AS BIGINT) AS width,
  CAST(64 + octet_length(encode(COALESCE(text, ''))) % 431 AS BIGINT) AS height,
  CAST(CASE WHEN (64 + octet_length(encode(COALESCE(text, ''))) % 577)
                 >= (64 + octet_length(encode(COALESCE(text, ''))) % 431)
       THEN 256
       ELSE ((64 + octet_length(encode(COALESCE(text, ''))) % 577) * 256)
            // (64 + octet_length(encode(COALESCE(text, ''))) % 431) END AS BIGINT) AS out_w,
  CAST(CASE WHEN (64 + octet_length(encode(COALESCE(text, ''))) % 577)
                 >= (64 + octet_length(encode(COALESCE(text, ''))) % 431)
       THEN ((64 + octet_length(encode(COALESCE(text, ''))) % 431) * 256)
            // (64 + octet_length(encode(COALESCE(text, ''))) % 577)
       ELSE 256 END AS BIGINT) AS out_h
FROM documents WHERE doc_id % 3 = 0
""".strip()


MULTIMODAL_META_SQL = """
SELECT doc_id AS media_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n_bytes,
  CAST(64 + octet_length(encode(COALESCE(text, ''))) % 577 AS BIGINT) AS width,
  CAST(64 + octet_length(encode(COALESCE(text, ''))) % 431 AS BIGINT) AS height,
  CAST(CASE WHEN doc_id % 3 = 2
       THEN octet_length(encode(COALESCE(text, ''))) // 100 + 1 ELSE 1 END AS BIGINT) AS n_frames
FROM documents
""".strip()

FRAME_SAMPLE_SQL = """
SELECT media_id, CAST(unnest(range(0, n_frames, 5)) AS BIGINT) AS frame_idx
FROM (
  SELECT doc_id AS media_id,
    CAST(CASE WHEN doc_id % 3 = 2
         THEN octet_length(encode(COALESCE(text, ''))) // 100 + 1 ELSE 1 END AS BIGINT) AS n_frames
  FROM documents
  WHERE doc_id % 3 = 2
)
""".strip()


# --- perceptual-hash image near-dup -----------------------------------------

PHASH_MAX_HAMMING = 3

# 8×32 integer DCT-II basis: W[u][i] = round(cos((2i+1)·u·π/64) · 4096)
# — the top-left 8 frequency rows of the classic 32-point DCT, written
# down as a LITERAL so the numpy kernel and the generated SQL oracle
# share byte-identical constants on every machine (a runtime cos()
# could differ in the last ulp across libm builds).  The nearest value
# to a rounding boundary is 0.022 away — safe.
PHASH_DCT_BASIS = (
    (4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096,
     4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096,
     4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096),
    (4091, 4052, 3973, 3857, 3703, 3513, 3290, 3035, 2751, 2440, 2106,
     1751, 1380, 995, 601, 201, -201, -601, -995, -1380, -1751, -2106,
     -2440, -2751, -3035, -3290, -3513, -3703, -3857, -3973, -4052,
     -4091),
    (4076, 3920, 3612, 3166, 2598, 1931, 1189, 401, -401, -1189, -1931,
     -2598, -3166, -3612, -3920, -4076, -4076, -3920, -3612, -3166,
     -2598, -1931, -1189, -401, 401, 1189, 1931, 2598, 3166, 3612,
     3920, 4076),
    (4052, 3703, 3035, 2106, 995, -201, -1380, -2440, -3290, -3857,
     -4091, -3973, -3513, -2751, -1751, -601, 601, 1751, 2751, 3513,
     3973, 4091, 3857, 3290, 2440, 1380, 201, -995, -2106, -3035,
     -3703, -4052),
    (4017, 3406, 2276, 799, -799, -2276, -3406, -4017, -4017, -3406,
     -2276, -799, 799, 2276, 3406, 4017, 4017, 3406, 2276, 799, -799,
     -2276, -3406, -4017, -4017, -3406, -2276, -799, 799, 2276, 3406,
     4017),
    (3973, 3035, 1380, -601, -2440, -3703, -4091, -3513, -2106, -201,
     1751, 3290, 4052, 3857, 2751, 995, -995, -2751, -3857, -4052,
     -3290, -1751, 201, 2106, 3513, 4091, 3703, 2440, 601, -1380,
     -3035, -3973),
    (3920, 2598, 401, -1931, -3612, -4076, -3166, -1189, 1189, 3166,
     4076, 3612, 1931, -401, -2598, -3920, -3920, -2598, -401, 1931,
     3612, 4076, 3166, 1189, -1189, -3166, -4076, -3612, -1931, 401,
     2598, 3920),
    (3857, 2106, -601, -3035, -4091, -3290, -995, 1751, 3703, 3973,
     2440, -201, -2751, -4052, -3513, -1380, 1380, 3513, 4052, 2751,
     201, -2440, -3973, -3703, -1751, 995, 3290, 4091, 3035, 601,
     -2106, -3857),
)

# low-pass half-width: each of the 1024 pooled cells is replaced by the
# SUM of itself ± 16 neighbors (boundary windows shorter) before the
# DCT.  Byte-pooled "luma" is white-noise-like (no 1/f spectrum, unlike
# real images), so without this the low-frequency coefficients carry no
# dominant structure and near-median bits flip under tiny edits; the
# smoothing manufactures the spectral concentration real pHash relies
# on.  Measured on sf0.01 document text: a 3-byte edit of a 2 KB
# payload lands at median Hamming 2 (88% ≤ 3, max 6), while distinct
# documents sit ≥ 8 apart.
PHASH_SMOOTH = 16


def luma_grids(payloads) -> np.ndarray:
    """Deterministic "decode" to a smoothed 32×32 luma grid per payload:
    byte k of an n-byte payload belongs to cell ``k·1024 // n``
    (row-major), the cell value is the floor-average of its bytes — the
    block-average downsample a real decode+resize produces, minus the
    codec — and the ±:data:`PHASH_SMOOTH` sliding-window sum low-passes
    the cell sequence (see the constant's comment).  All integer, so
    the SQL oracle reproduces it exactly.  Returns (B, 32, 32) int64;
    empty payloads decode to the zero grid."""
    out = np.zeros((len(payloads), 32, 32), dtype=np.int64)
    idx = np.arange(1024)
    lo = np.maximum(idx - PHASH_SMOOTH, 0)
    hi = np.minimum(idx + PHASH_SMOOTH + 1, 1024)
    for r, p in enumerate(payloads):
        if not p:
            continue
        buf = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
        n = len(buf)
        # vectorized per payload: the Python loop is per-IMAGE, the work
        # per iteration is numpy over the payload's bytes
        cell = np.arange(n, dtype=np.int64) * 1024 // n
        sums = np.bincount(cell, weights=buf, minlength=1024).astype(np.int64)
        cnts = np.bincount(cell, minlength=1024)
        pooled = sums // np.maximum(cnts, 1)
        cs = np.concatenate([[0], np.cumsum(pooled)])
        out[r] = (cs[hi] - cs[lo]).reshape(32, 32)
    return out


def phash64(payloads) -> np.ndarray:
    """Real 64-bit DCT perceptual hash over the decoded luma grid —
    the exact-integer variant of the classic pHash (Zauner 2010:
    32×32 luma → 2-D DCT → keep the top-left 8×8 low-frequency block →
    median-threshold bits): ``F = W·G·Wᵀ`` with the 8×32 integer basis
    (int64 exact: |F| ≤ 4096²·8415·1024 < 2⁵⁸), bit(u,v) =
    [2·F > m₁+m₂] with m₁/m₂ the 32nd/33rd order statistics of the 64
    kept coefficients (exact integer median test, DC included — a
    fixed documented convention shared with the SQL oracle).  A local
    edit spreads its energy over all 1024 DCT coefficients while the
    kept 64 carry the smoothed coarse structure, so near-duplicate
    payloads land at small Hamming distance — exactly where the
    banding looks (measured robustness in :data:`PHASH_SMOOTH`'s
    comment)."""
    W = np.asarray(PHASH_DCT_BASIS, dtype=np.int64)
    grids = luma_grids(payloads)
    coef = np.einsum("ui,bij,vj->buv", W, grids, W).reshape(len(grids), 64)
    two_med = np.sort(coef, axis=1)[:, 31:33].sum(axis=1)
    bits = (2 * coef > two_med[:, None])
    powers = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    return (bits.astype(np.uint64) * powers).sum(axis=1, dtype=np.uint64)


def image_phash_dupes(sf_dir: str, max_hamming: int = PHASH_MAX_HAMMING):
    """Image near-dup pairs by 64-bit DCT perceptual hash with banded
    blocking — the multimodal member of the dedup family (SimHash's
    shape over the binary payload column).

    The hash is :func:`phash64` — a REAL perceptual hash (block-average
    luma decode → integer 2-D DCT-II → median-threshold bits), not a
    payload fingerprint: near-identical payloads land within small
    Hamming distance (planted-near-dup pytest), while the exact-integer
    arithmetic keeps the DuckDB oracle bit-for-bit
    (:func:`image_phash_dupes_sql` reproduces the hash in SQL from the
    same literal basis table).  A deployment with real codecs swaps the
    luma-grid decode inside the same actor seam; banding/verify/output
    are unchanged.  Pigeonhole: 4 bands of 16 bits find every pair
    with distance ≤ 3; per-bucket Hamming verify is a vectorized
    XOR+popcount over unique hashes."""
    import numpy as np

    from ..functions import dedup as dd
    from ..pipelines.corpus_ops import _hash_grouped

    media = media_from_documents(sf_dir)
    # pigeonhole completeness needs bands > max_hamming: 4×16-bit
    # bands serve d ≤ 3, 8×8-bit bands serve d ≤ 7 (the simhash op's
    # rule); larger d is rejected rather than silently lossy
    if max_hamming >= 8:
        raise ValueError("max_hamming > 7 needs more than 8 bands")
    bands = 4 if max_hamming < 4 else 8
    w = 64 // bands
    mask = np.uint64((1 << w) - 1)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        img = df[df["kind"] == "image"]
        ids = img["media_id"].to_numpy("int64")
        hs = phash64(list(img["payload"]))
        shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(w))
        band_vals = (hs[:, None] >> shifts[None, :]) & mask
        keys = [f"{b}:{v:04x}" for row in band_vals
                for b, v in enumerate(row)]
        return pd.DataFrame(
            {"band_key": pd.Series(keys, dtype="string"),
             "media_id": pd.Series(np.repeat(ids, bands), dtype="int64"),
             "ph": pd.Series(np.repeat(hs.view("int64"), bands),
                             dtype="int64")})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        for _, g in df.groupby("band_key", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("media_id")
            ids = g["media_id"].to_numpy("int64")
            hs = g["ph"].to_numpy("int64").view(np.uint64)
            uh, inv = np.unique(hs, return_inverse=True)
            ii, jj = np.triu_indices(len(uh))
            dist = dd.popcount64(uh[ii] ^ uh[jj])
            for i_, j_, d_ in zip(ii[dist <= max_hamming],
                                  jj[dist <= max_hamming],
                                  dist[dist <= max_hamming]):
                a_ids = ids[inv == i_]
                if i_ == j_:
                    if len(a_ids) < 2:
                        continue
                    x, y = np.triu_indices(len(a_ids), k=1)
                    out_a.append(a_ids[x]); out_b.append(a_ids[y])
                    out_d.append(np.zeros(len(x), dtype="int64"))
                else:
                    b_ids = ids[inv == j_]
                    aa = np.repeat(a_ids, len(b_ids))
                    bb = np.tile(b_ids, len(a_ids))
                    lo = np.minimum(aa, bb)
                    hi = np.maximum(aa, bb)
                    out_a.append(lo); out_b.append(hi)
                    out_d.append(np.full(len(aa), int(d_), dtype="int64"))
        if not out_a:
            return pd.DataFrame({"media_a": pd.Series(dtype="int64"),
                                 "media_b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        return pd.DataFrame({"media_a": np.concatenate(out_a),
                             "media_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_d)})

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return (df.drop_duplicates(["media_a", "media_b"])
                .sort_values(["media_a", "media_b"]))

    buckets = _hash_grouped(
        media.map_batches(sketch, batch_format="pandas"),
        ["band_key"], bucket_pairs, num_parts=16)
    out = _hash_grouped(buckets, ["media_a", "media_b"], dedupe,
                        num_parts=8).to_pandas()
    if "media_a" not in out.columns:  # all-empty blocks lose the schema
        out = pd.DataFrame({"media_a": pd.Series(dtype="int64"),
                            "media_b": pd.Series(dtype="int64"),
                            "hamming": pd.Series(dtype="int64")})
    return (out.sort_values(["media_a", "media_b"])
            .reset_index(drop=True)
            .astype({"media_a": "int64", "media_b": "int64",
                     "hamming": "int64"}))


def image_phash_dupes_sql(max_hamming: int = PHASH_MAX_HAMMING) -> str:
    """DuckDB reproduction of :func:`phash64` + the quadratic Hamming
    join — an independent re-execution of the whole pipeline (decode
    pooling, DCT, median threshold, pairing), sharing only the literal
    ``PHASH_DCT_BASIS`` constants with the engine.  All arithmetic is
    integer-exact on both sides, so hashes match bit-for-bit:
    byte k → cell k·1024//n (hex-substr byte extraction), cell value =
    floor-average, ±16 window SUM low-pass (window function over the
    zero-filled 1024-cell frame), two-stage DCT R[u,j] = Σᵢ W[u,i]·g[i,j]
    then F[u,v] = Σⱼ W[v,j]·R[u,j], bit = 2F > m₁+m₂ (32nd+33rd order
    stats), ph = Σ bit·2^(8u+v)."""
    w_rows = ", ".join(
        f"({u}, {i}, {PHASH_DCT_BASIS[u][i]})"
        for u in range(8) for i in range(32))
    return f"""
WITH img AS (
  SELECT doc_id AS media_id,
         hex(encode(COALESCE(text, ''))) AS hx,
         octet_length(encode(COALESCE(text, ''))) AS n
  FROM documents WHERE doc_id % 3 = 0
),
bytes AS (
  SELECT media_id, n, k,
         CAST(('0x' || substr(hx, 2 * k + 1, 2)) AS BIGINT) AS b
  FROM img, UNNEST(range(n)) AS t(k)
),
pooled AS (
  SELECT media_id, k * 1024 // n AS c, SUM(b) // COUNT(*) AS g0
  FROM bytes GROUP BY 1, 2
),
-- zero-filled 1024-cell frame, then the ±{PHASH_SMOOTH} window SUM
idx(c) AS (SELECT unnest(range(1024))),
frame AS (
  SELECT g.media_id, g.c, COALESCE(p.g0, 0) AS g0
  FROM (SELECT i.media_id, idx.c FROM img i CROSS JOIN idx) g
  LEFT JOIN pooled p ON p.media_id = g.media_id AND p.c = g.c
),
smooth AS (
  SELECT media_id, c,
         SUM(g0) OVER (PARTITION BY media_id ORDER BY c
                       ROWS BETWEEN {PHASH_SMOOTH} PRECEDING
                            AND {PHASH_SMOOTH} FOLLOWING) AS g
  FROM frame
),
w(u, i, wv) AS (VALUES {w_rows}),
rowt AS (
  SELECT s.media_id, wu.u AS cu, s.c % 32 AS gj, SUM(wu.wv * s.g) AS r
  FROM smooth s JOIN w wu ON wu.i = s.c // 32
  GROUP BY 1, 2, 3
),
coef AS (
  SELECT r.media_id, r.cu, wv.u AS cv, SUM(wv.wv * r.r) AS f
  FROM rowt r JOIN w wv ON wv.i = r.gj
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT media_id, cu, cv, f,
         row_number() OVER (PARTITION BY media_id ORDER BY f) AS rn
  FROM coef
),
med AS (
  SELECT media_id, SUM(f) FILTER (WHERE rn IN (32, 33)) AS m2
  FROM ranked GROUP BY 1
),
phs AS (
  SELECT c.media_id,
         CAST(SUM(CASE WHEN 2 * c.f > m.m2
                  THEN CAST(1 AS UBIGINT) << CAST(c.cu * 8 + c.cv AS INT)
                  ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS ph
  FROM coef c JOIN med m USING (media_id)
  GROUP BY 1
)
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
FROM phs a JOIN phs b ON a.media_id < b.media_id
WHERE bit_count(xor(a.ph, b.ph)) <= {max_hamming}
ORDER BY 1, 2
""".strip()


IMAGE_PHASH_DUPES_SQL = image_phash_dupes_sql()
