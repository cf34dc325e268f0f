"""Text-analysis functions for the training-data pipeline layer.

Vectorized (pandas/numpy over Arrow batches) implementations of the
text-quality operators a 100 TB corpus pipeline needs on top of the
crawl engine: token counting, quality scoring, language ID and document
fingerprinting.  The crawl reference only has the content-fingerprint
idea (``simplefp`` content dedup, reference README.md:575-576 and
instance/wiki/spider_extend.js:109-160); the rest generalizes the same
"cheap scalar scan per document" shape.

Every function here is deliberately expressible in ANSI SQL (same
regexes, same integer arithmetic) so the DuckDB oracle can verify the
Ray pipeline bit-for-bit:

- counts are exact int64 (no float ratios in comparable outputs);
- the quality gate is an integer-threshold predicate;
- the marker-based language scores use fixed argmax ordering;
- fingerprints are md5 over a canonical alnum-only form.

The char-trigram language profile (``lang_id_trigram``) is the "real"
scale implementation (profiles built once per actor); it has no SQL
mirror and is verified by pytest only.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# Tokenization / quality regexes — keep RE2-compatible (no lookahead)
# so the exact same pattern string runs in DuckDB's regexp_* functions.
TOKEN_PATTERN = r"\S+"
# BPE-ish pre-tokenizer: word / number / punctuation-run chunks with an
# optional leading space (GPT-2 style minus the lookahead clauses).
BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"
PUNCT_PATTERN = r"[!-/:-@\[-`{-~]"
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")
STOPWORD_PATTERN = r"\b(" + "|".join(STOPWORDS) + r")\b"

# Marker words per language for the SQL-mirrorable classifier.  Fixed
# argmax order = tie-break order (first wins).
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", r"\b(the|a|and|of|is|to)\b"),
    ("de", r"\b(der|die|das|und|ist|ein)\b"),
    ("fr", r"\b(le|la|les|et|est|un)\b"),
    ("es", r"\b(el|los|las|y|es|una)\b"),
]
CJK_PATTERN = r"[一-鿿]"

# Quality gate thresholds (integer arithmetic only):
#   n_chars >= 100, n_tokens >= 20, 10*n_stopwords >= n_tokens,
#   4*n_punct <= n_tokens  (≈ stopword ratio ≥ 0.1, punct ratio ≤ 0.25)
QUALITY_MIN_CHARS = 100
QUALITY_MIN_TOKENS = 20


def text_stats_frame(texts: pd.Series) -> pd.DataFrame:
    """All exact-count statistics for a batch of documents.

    Returns int64 columns ``n_chars, n_tokens, n_bpe_tokens, n_punct,
    n_stopwords`` and bool ``quality_ok``.
    """
    t = texts.astype("string").fillna("")
    n_chars = t.str.len().astype("int64")
    n_tokens = t.str.count(TOKEN_PATTERN).astype("int64")
    n_bpe = t.str.count(BPE_PATTERN).astype("int64")
    n_punct = t.str.count(PUNCT_PATTERN).astype("int64")
    n_stop = t.str.count(STOPWORD_PATTERN).astype("int64")
    ok = (
        (n_chars >= QUALITY_MIN_CHARS)
        & (n_tokens >= QUALITY_MIN_TOKENS)
        & (10 * n_stop >= n_tokens)
        & (4 * n_punct <= n_tokens)
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_bpe_tokens": n_bpe,
            "n_punct": n_punct,
            "n_stopwords": n_stop,
            "quality_ok": ok.astype(bool),
        }
    )


def text_stats_sql(table: str = "documents", text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """The DuckDB mirror of :func:`text_stats_frame` (same patterns).
    NULL text mirrors the Python ``fillna('')`` — without COALESCE every
    count would be NULL and quality_ok NULL instead of 0/False."""
    stop_sql = STOPWORD_PATTERN
    text_col = f"COALESCE({text_col}, '')"
    return f"""
SELECT {id_col},
  CAST(length({text_col}) AS BIGINT) AS n_chars,
  CAST(len(regexp_extract_all({text_col}, '{TOKEN_PATTERN}')) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all({text_col}, '{BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
  CAST(len(regexp_extract_all({text_col}, '{PUNCT_PATTERN}')) AS BIGINT) AS n_punct,
  CAST(len(regexp_extract_all({text_col}, '{stop_sql}')) AS BIGINT) AS n_stopwords,
  (length({text_col}) >= {QUALITY_MIN_CHARS}
   AND len(regexp_extract_all({text_col}, '{TOKEN_PATTERN}')) >= {QUALITY_MIN_TOKENS}
   AND 10 * len(regexp_extract_all({text_col}, '{stop_sql}'))
       >= len(regexp_extract_all({text_col}, '{TOKEN_PATTERN}'))
   AND 4 * len(regexp_extract_all({text_col}, '{PUNCT_PATTERN}'))
       <= len(regexp_extract_all({text_col}, '{TOKEN_PATTERN}'))
  ) AS quality_ok
FROM {table}
""".strip()


def lang_id_markers(texts: pd.Series) -> pd.Series:
    """Marker-word language ID (SQL-mirrorable variant).

    score(lang) = count of that language's marker words; CJK characters
    count for ``zh``.  Argmax in fixed order en→de→fr→es→zh, ``und`` if
    every score is 0.  Ties resolve to the earliest language — the SQL
    mirror replicates this with a CASE chain of ``>=`` comparisons.
    """
    t = texts.astype("string").fillna("")
    scores = [t.str.count(pat).astype("int64") for _, pat in LANG_MARKERS]
    scores.append(t.str.count(CJK_PATTERN).astype("int64"))
    names = [n for n, _ in LANG_MARKERS] + ["zh"]
    arr = np.stack([s.to_numpy() for s in scores], axis=1)
    best = arr.argmax(axis=1)  # first max wins == fixed tie-break order
    out = np.array(names, dtype=object)[best]
    out[arr.max(axis=1) == 0] = "und"
    return pd.Series(out, index=texts.index, dtype="string")


def lang_id_markers_sql(table: str = "documents", text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    # NULL text scores NULL in every CASE arm and would fall through to
    # the ELSE ('zh'); the Python side fillna('') says 'und' — COALESCE
    text_col = f"COALESCE({text_col}, '')"
    exprs = [
        f"len(regexp_extract_all({text_col}, '{pat}'))" for _, pat in LANG_MARKERS
    ]
    exprs.append(f"len(regexp_extract_all({text_col}, '{CJK_PATTERN}'))")
    names = [n for n, _ in LANG_MARKERS] + ["zh"]
    s = {n: e for n, e in zip(names, exprs)}
    # argmax with first-wins tie-break in declaration order
    return f"""
SELECT {id_col},
  CASE
    WHEN {s['en']} = 0 AND {s['de']} = 0 AND {s['fr']} = 0
         AND {s['es']} = 0 AND {s['zh']} = 0 THEN 'und'
    WHEN {s['en']} >= {s['de']} AND {s['en']} >= {s['fr']}
         AND {s['en']} >= {s['es']} AND {s['en']} >= {s['zh']} THEN 'en'
    WHEN {s['de']} >= {s['fr']} AND {s['de']} >= {s['es']}
         AND {s['de']} >= {s['zh']} THEN 'de'
    WHEN {s['fr']} >= {s['es']} AND {s['fr']} >= {s['zh']} THEN 'fr'
    WHEN {s['es']} >= {s['zh']} THEN 'es'
    ELSE 'zh'
  END AS lang_pred
FROM {table}
""".strip()


# --- trigram profile classifier (scale path, no SQL mirror) -----------

_TRIGRAM_PROFILES: dict[str, dict[str, float]] = {
    # tiny built-in profiles from marker-word text; real deployments load
    # profiles from a model file in the actor __init__.
    "en": {"the": 3, "and": 2, " th": 3, "he ": 3, " a ": 2, "ing": 1},
    "de": {"der": 3, "die": 3, "und": 2, "ein": 2, "sch": 1, "ich": 1},
    "fr": {"le ": 3, "les": 2, "est": 2, " et": 2, "une": 1, "ion": 1},
    "es": {"el ": 3, "los": 2, " es": 2, " y ": 2, "una": 1, "ión": 1},
}


def lang_id_trigram(texts: pd.Series) -> pd.Series:
    """Character n-gram profile scorer (deterministic, pure python).

    For each doc: score(lang) = Σ profile weights of trigrams present,
    CJK density short-circuits to ``zh``.  This is the per-actor scale
    implementation; profiles are module constants so there is zero
    per-batch setup.
    """
    cjk = re.compile(CJK_PATTERN)
    out = []
    for raw in texts.fillna(""):
        s = str(raw).lower()
        if s and len(cjk.findall(s)) * 10 >= len(s):
            out.append("zh")
            continue
        grams = {s[i:i + 3] for i in range(max(0, len(s) - 2))}
        best_lang, best_score = "und", 0.0
        for lang, prof in _TRIGRAM_PROFILES.items():
            score = sum(w for g, w in prof.items() if g in grams)
            if score > best_score:
                best_lang, best_score = lang, score
        out.append(best_lang)
    return pd.Series(out, index=texts.index, dtype="string")


# --- fingerprints ------------------------------------------------------

_ALNUM_ONLY = re.compile(r"[^a-z0-9]")


def simplefp(texts: pd.Series) -> pd.Series:
    """Content fingerprint: md5 of the lowercased alnum-only text.

    Re-expresses the reference's ``simplefp`` content-dedup key
    (reference README.md:575-576: md5 of CJK/alnum-only content used for
    near-dup upsert in the mongo pipeline example).
    """
    return pd.Series(
        [
            hashlib.md5(_ALNUM_ONLY.sub("", str(t).lower()).encode()).hexdigest()
            for t in texts.fillna("")
        ],
        index=texts.index,
        dtype="string",
    )


SIMPLEFP_SQL = "md5(regexp_replace(lower({col}), '[^a-z0-9]', '', 'g'))"


def rolling_fingerprint(text: str, window: int = 8,
                        keep: int = 4) -> list[int]:
    """Winnowing-style document fingerprint: polynomial rolling hash of
    every ``window``-byte span, keep the ``keep`` smallest (sorted).

    Used for cheap containment checks between documents; pytest-verified
    (no SQL mirror).
    """
    data = _ALNUM_ONLY.sub("", text.lower()).encode()
    if len(data) < window:
        data = data + b"\0" * (window - len(data))
    B, M = 1000003, (1 << 61) - 1
    h = 0
    pow_w = pow(B, window - 1, M)
    hashes = []
    for i, b in enumerate(data):
        if i < window:
            h = (h * B + b) % M
            if i == window - 1:
                hashes.append(h)
        else:
            h = ((h - data[i - window] * pow_w) * B + b) % M
            hashes.append(h)
    hashes.sort()
    return hashes[:keep]
