"""Batched model-inference stage: a deterministic linear quality
classifier over text features, run as a Ray Data ACTOR-POOL
``map_batches`` stage — the plumbing pattern every learned
quality/toxicity/language filter uses in a training-data pipeline
(load weights once per actor, score vectorized batches forever).

The "model" here is integer-linear on the exact-count features of
:mod:`..functions.text_stats`, so a DuckDB oracle reproduces every
score bit-for-bit — the point is to exercise the real inference
plumbing (per-actor setup cost, vectorized scoring, stable output
schema), not to pretend this container has a real classifier.  A real
checkpoint would only change ``__init__`` (deserialize weights) and
``_score`` (matmul) — the Ray-side shape is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# integer weights + threshold: score = 100·n_stopwords + 10·n_tokens
# − 40·n_punct − n_chars, keep = score > 400 (calibrated to a ~2:1
# keep/drop split on the synthetic corpus so both labels are exercised)
QM_W_STOPWORDS = 100
QM_W_TOKENS = 10
QM_W_PUNCT = -40
QM_W_CHARS = -1
QM_THRESHOLD = 400


class QualityModel:
    """Callable class for ``map_batches(QualityModel, concurrency=N)``.

    ``__init__`` is the once-per-actor model load (here: building the
    weight vector and compiling the feature regexes via the shared
    text_stats module import); ``__call__`` scores one Arrow-backed
    pandas batch fully vectorized."""

    def __init__(self, passthrough: bool = False) -> None:
        # once per actor, NOT once per batch — the analogue of
        # deserializing a real checkpoint
        from ..functions import text_stats as ts

        self._features = ts.text_stats_frame
        self._w = np.array(
            [QM_W_CHARS, QM_W_TOKENS, QM_W_PUNCT, QM_W_STOPWORDS],
            dtype="int64")
        # passthrough: keep every input column alongside the score —
        # the mid-pipeline mode (composed stages need the payload to
        # keep flowing); default emits the compact (id, score, keep)
        # scoring report
        self._passthrough = passthrough

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        f = self._features(df["text"])
        feats = np.stack(
            [f["n_chars"].to_numpy("int64"),
             f["n_tokens"].to_numpy("int64"),
             f["n_punct"].to_numpy("int64"),
             f["n_stopwords"].to_numpy("int64")], axis=1)
        score = feats @ self._w  # one int64 matvec per batch
        if self._passthrough:
            out = df.reset_index(drop=True).copy()
            out["quality_score"] = score.astype("int64")
            out["keep"] = score > QM_THRESHOLD
            return out
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "quality_score": score.astype("int64"),
             "keep": score > QM_THRESHOLD})


def quality_model_sql(table: str = "documents") -> str:
    """DuckDB mirror: the same integer-linear score over the same
    regex feature counts as text_stats_sql."""
    from ..functions import text_stats as ts

    toks = f"len(regexp_extract_all(text, '{ts.TOKEN_PATTERN}'))"
    punct = f"len(regexp_extract_all(text, '{ts.PUNCT_PATTERN}'))"
    stops = f"len(regexp_extract_all(text, '{ts.STOPWORD_PATTERN}'))"
    score = (f"({QM_W_CHARS}) * length(text) + {QM_W_TOKENS} * {toks} "
             f"+ ({QM_W_PUNCT}) * {punct} + {QM_W_STOPWORDS} * {stops}")
    return f"""
SELECT doc_id, CAST({score} AS BIGINT) AS quality_score,
       ({score}) > {QM_THRESHOLD} AS keep
FROM {table}
""".strip()
