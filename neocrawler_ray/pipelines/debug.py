"""Single-URL debug mode — the reference's ``run.js -a test -l URL``
golden-output path (reference run.js:80-90, spider/index.js:132-164,
pipeline.js:516-544): wrap the url, download it, extract, and write
``debug-page.html`` + ``debug-result.json`` instead of sinking.

Runs fully locally (the stage classes are plain callables — no Ray
session needed), which is exactly what a rule author wants when
iterating on an ``extract_rule``.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..config import CrawlSettings, RuleSet
from ..functions.extract import detect_link
from ..stages.extract_stage import ExtractBatch
from ..stages.fetch import (FetchSim, browser_rules_map, build_robots_map,
                            cookie_rules_map, proxy_rules_map)


def test_single_url(corpus_dir: str, url: str, out_dir: str,
                    settings: CrawlSettings | None = None) -> dict:
    """Debug-crawl one url against the pages corpus; returns the
    extracted record and writes the reference's two debug artifacts."""
    settings = settings or CrawlSettings()
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(corpus_dir, "rules.json")) as f:
        rules = json.load(f)
    with open(os.path.join(corpus_dir, "meta.json")) as f:
        meta = json.load(f)

    # wrapLink (spider/spider.js:317-345): url → rule match
    urllib_key, _rule = detect_link(url, rules)
    if urllib_key is None:
        return {"url": url, "error": "no driller rule matches"}

    def batch_for(retry: int) -> pa.Table:
        return pa.table(
            {
                "seq": pa.array([0], pa.int64()),
                "wave": pa.array([0], pa.int32()),
                "url": pa.array([url], pa.string()),
                "urllib": pa.array(["urllib:" + urllib_key], pa.string()),
                "version": pa.array([settings.wave_version(0)], pa.int64()),
                "drill_relation": pa.array(["*"], pa.string()),
                "retry": pa.array([retry], pa.int64()),
            }
        )

    fetch = FetchSim(corpus_dir, build_robots_map(corpus_dir),
                     meta.get("pages_shards", 16),
                     browser_map=browser_rules_map(rules),
                     proxy_map=proxy_rules_map(rules),
                     cookie_map=cookie_rules_map(rules))
    extract = ExtractBatch(rules, settings, frontier_shards=[],
                           push_to_frontier=False)
    # retryCrawl inline (spider/spider.js:350-362): a transient transport
    # failure (the simulated proxy's 503 draw) re-fetches with retry+1 up
    # to download_retry, exactly like the crawl's T6 loop — so the debug
    # tool shows the page a real crawl would eventually get, plus how
    # many attempts it took
    for attempt in range(settings.download_retry + 1):
        fetched = fetch(batch_for(attempt))
        if fetched.column("status")[0].as_py() != 503:
            break
    # a jshandle url expands to one row per navigation round (S6); the
    # debug tool shows the FINAL round — the page after the full click
    # budget, like the reference's phantomjs debug dump — which is the
    # last row of the expansion (nav_last=True)
    result = extract(fetched).to_pylist()[-1]
    result["attempts"] = attempt + 1

    html = fetched.column("html")[-1].as_py()
    if html is not None:  # debug-page.html (pipeline.js:523-527)
        with open(os.path.join(out_dir, "debug-page.html"), "wb") as f:
            f.write(html)
    if (fetched.num_rows > 1
            or browser_rules_map(rules).get("urllib:" + urllib_key)):
        # browser (jshandle) debug: per drill round the reference dumps
        # a screenshot + the rendered html (page_test_action,
        # lib/phantomjs/phantomjs-bridge.js:204-211 — debug-pageK.png +
        # debug-browser-pageK.html).  The screenshot analog is a
        # deterministic DOM wireframe raster of that round's content
        # (functions/raster.py): same page → same bytes, different
        # click rounds → visibly different boxes.
        from ..functions.raster import render_page_png

        rounds = fetched.column("nav_round").to_pylist()
        htmls = fetched.column("html").to_pylist()
        for rnd, rhtml in zip(rounds, htmls):
            if rhtml is None:
                continue
            with open(os.path.join(
                    out_dir, f"debug-browser-page{rnd}.html"), "wb") as f:
                f.write(rhtml)
            render_page_png(
                os.path.join(out_dir, f"debug-page{rnd}.png"), rhtml)
    record = {k: v for k, v in result.items() if k != "content_bin"}
    if record.get("extracted_json"):
        record["extracted_data"] = json.loads(record.pop("extracted_json"))
    with open(os.path.join(out_dir, "debug-result.json"), "w") as f:
        # debug-result.json = extracted_info minus content (pipeline.js:529-543)
        json.dump(record, f, ensure_ascii=False, indent=1, default=str)
    return record
