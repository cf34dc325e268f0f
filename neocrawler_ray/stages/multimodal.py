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


def image_phash_dupes(sf_dir: str, max_hamming: int = PHASH_MAX_HAMMING):
    """Image near-dup pairs by 64-bit perceptual hash with banded
    blocking — the multimodal member of the dedup family (SimHash's
    shape over the binary payload column).

    The pHash itself is the documented deterministic STUB of this
    module (no image libs in the container): md5-fold of the payload
    bytes, which makes only EXACT payload duplicates collide at
    Hamming 0 — a real deployment swaps in a DCT pHash inside the
    same actor-pool decode seam (:class:`PilDecode`) and everything
    downstream (banding, verify, output) is unchanged, because a real
    pHash's near-dups land near in Hamming space exactly where the
    banding looks.  Pigeonhole: 4 bands of 16 bits find every pair
    with distance ≤ 3; per-bucket Hamming verify is a vectorized
    XOR+popcount over unique hashes.  Oracle: DuckDB md5/substr fold
    + bit_count(xor) quadratic join over the image-kind rows."""
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
        import hashlib

        img = df[df["kind"] == "image"]
        ids = img["media_id"].to_numpy("int64")
        hs = np.array(
            [int(hashlib.md5(p).hexdigest()[:16], 16)
             for p in img["payload"]], dtype="uint64")
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


IMAGE_PHASH_DUPES_SQL = f"""
WITH img AS (
  SELECT doc_id AS media_id,
         CAST(('0x' || substr(md5(COALESCE(text, '')), 1, 16))
              AS UBIGINT) AS ph
  FROM documents WHERE doc_id % 3 = 0
)
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
FROM img a JOIN img b ON a.media_id < b.media_id
WHERE bit_count(xor(a.ph, b.ph)) <= {PHASH_MAX_HAMMING}
ORDER BY 1, 2
""".strip()
