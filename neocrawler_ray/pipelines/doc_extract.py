"""Rule-engine extraction over a documents-derived pages table.

This pipeline proves the extraction engine's byte-identical invariant in
a form the DuckDB oracle can check: each ``documents`` row is wrapped in
a deterministic HTML envelope, pushed through the *same* CSS rule engine
the crawl uses (functions/extract.py: ``extract_data`` — reference
extractor.js:215-294 / ``cssSelector`` extractor.js:316-367), and the
extracted ``text`` must equal the original document text byte for byte
(``SELECT doc_id, trim(text) AS text FROM documents``).

It is also the shape of a real warc→text stage at 100 TB: read only
(id, text/html) columns, one vectorized ``map_batches`` that parses and
extracts per row with a pre-compiled rule (compiled in the actor's
``__init__``), no shuffle at all.
"""

from __future__ import annotations

import pandas as pd

from ..functions.dom import parse_html
from ..functions.extract import extract_data

DOC_EXTRACT_RULE = {
    "rule": {
        "title": {"base": "content", "mode": "css", "expression": "title",
                  "pick": "text", "index": 1},
        "text": {"base": "content", "mode": "css", "expression": "div.doc",
                 "pick": "text", "index": 1},
        "source": {"base": "url", "mode": "regex",
                   "expression": r".*?src=([a-z0-9]+).*", "index": 1},
    },
    "require": ["text"],
}


def wrap_document_html(doc_id: int, text: str, source: str) -> str:
    """Deterministic HTML envelope (no escaping needed: the synthetic
    corpus text is alnum+space; asserted by the pipeline test)."""
    return (
        f"<html><head><title>doc {doc_id}</title></head><body>"
        f'<div class="doc"><p>{text}</p></div>'
        f"<footer>generated</footer></body></html>"
    )


def extract_batch(df: pd.DataFrame,
                  rule: dict | None = None) -> pd.DataFrame:
    """html envelope → rule-engine extraction, one batch."""
    rule = rule or DOC_EXTRACT_RULE
    out_id, out_title, out_text, out_src = [], [], [], []
    for doc_id, text, source in zip(
        df["doc_id"], df["text"].fillna(""), df["source"].fillna("")
    ):
        url = f"http://docs.example/view?id={doc_id}&src={source}"
        html = wrap_document_html(int(doc_id), str(text), str(source))
        dom = parse_html(html)
        data, _lacks = extract_data(url, html, rule, None, dom)
        out_id.append(int(doc_id))
        out_title.append(data.get("title") or "")
        out_text.append(data.get("text") or "")
        out_src.append(data.get("source") or "")
    return pd.DataFrame(
        {"doc_id": pd.Series(out_id, dtype="int64"),
         "title": pd.Series(out_title, dtype="string"),
         "text": pd.Series(out_text, dtype="string"),
         "source_re": pd.Series(out_src, dtype="string")}
    )


def doc_extract(sf_dir: str):
    """documents → html envelope → rule engine → (doc_id, title, text,
    source_re); the oracle rebuilds title/source with SQL string fns.

    TASK-mode map_batches, not an actor pool: the stage holds no
    per-worker state worth amortizing (the rule is a tiny dict; the DOM
    engine caches compiled selectors at module level inside the warm
    worker processes), so a pool's only observable effect was its own
    spawn cost — ~1.5 s of the op's wall time at sf0.1.  A stage that
    genuinely loads state (model weights, big indexes) should stay a
    callable class with ``concurrency=N``; see stages/multimodal.py."""
    from ..sources.tables import read_table

    # CPU-heavy per-row DOM stage: small blocks keep every core busy
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "source"],
                    rows_per_block=100)
    return ds.map_batches(extract_batch, batch_format="pandas",
                          num_cpus=0.5)


DOC_EXTRACT_SQL = """
SELECT doc_id,
  'doc ' || CAST(doc_id AS VARCHAR) AS title,
  trim(text) AS text,
  regexp_extract('http://docs.example/view?id=' || CAST(doc_id AS VARCHAR)
                 || '&src=' || source,
                 'src=([a-z0-9]+)', 1) AS source_re
FROM documents
""".strip()
# the oracle rebuilds the SAME url the corpus feeds the rule engine and
# applies the rule's own regex to it — a bare regexp_extract(source, ...)
# would find the first alnum run ANYWHERE in the value, silently
# diverging from the M10 rule semantics for sources that don't start
# with [a-z0-9]
