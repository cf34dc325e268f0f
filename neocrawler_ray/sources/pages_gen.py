"""Deterministic synthetic Common-Crawl-style pages corpus.

Builds the ``pages(url, warc_ts, html:binary, text, lang)`` Parquet table
from BASELINE.json's input_hint, plus the matching driller-rule set and
seeds — the whole web graph a crawl run explores.  Everything is a pure
function of ``(seed, n_pages, n_domains)``: no wall-clock, no network, no
external data.

Graph shape (mirrors the reference README's 4-level example,
reference README.md:256-259: home → category → list → detail):

- ``D`` domains ``site{d}.example`` with host ``www.site{d}.example``;
  domain 0 is a mega-domain holding ~40% of all pages (skew exercise).
- home ``/`` → categories ``/cat_{c}.html`` → lists
  ``/cat_{c}/list_{p}.html`` → details ``/cat_{c}/item_{k}.html?id={k}``.
- List pages carry wash-fodder links (``#top``, ``javascript:void(0)``),
  periodic dead links (404 path), and — on the mega domain — links into
  ``/private/`` which robots.txt disallows, plus ``<img>`` links to binary
  ``/img/*.jpg`` pages (binary-format rule).
- Every ~97th item is a deliberately short page (<500 chars → fails
  validateContent, exercising retry → crawled_failure).
- Domain 1 serves gzip transfer-encoded bodies; domain 2 (when
  ``n_domains >= 4``) is a jshandle/browser domain — raw ``html`` is a
  JS shell, the real DOM (with click-revealed ``jsnav`` link blocks)
  lives in ``html_rendered`` (S6, downloader.js:312-437).
- The last domain (when ``n_domains >= 3``) is Chinese-language with
  GBK-encoded html that declares ``<meta charset="gbk">`` while its
  RULE ``encoding`` is deliberately wrong (``utf-8``) — exercising the
  M13 page-declared-charset precedence (downloader.js:272-285).

The ``text`` column is the byte-identical parity target: for detail pages
it is exactly the concatenated descendant text of ``div.product`` (the
``text_main`` extract field), computed here *directly from the source
strings* — independently of the engine's DOM/extractor — so the parity
test is not a tautology.  For branch pages it is the page title.

Output layout: ``{out}/pages/shard={k}/part.parquet`` with
``k = md5(host) % pages_shards`` so fetch-sim actors can cache per-host
partitions without re-reading the corpus (SURVEY.md §2.4 J4).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

# bump whenever generated corpus bytes change, so /tmp corpus caches
# regenerate (v2: domain 1 gzip transfer-encoded; v3: domain 2 is a
# jshandle/browser-rendered domain with an html_rendered column + a.more
# navigate links, and the zh domain declares its charset via
# <meta charset="gbk"> while its RULE encoding is deliberately wrong;
# v4: domain 3 routes through the simulated proxy pool (use_proxy —
# deterministic transient 503s that the retry loop re-draws past);
# v5: jshandle list rule carries an injected `script` whose md5-keyed
# jsinject block reveals one extra item per list page (README.md:181-195
# script hook made observable), and domain 3 detail pages require the
# rule's cookie via a require-cookie marker (downloader.js:117-123))
GEN_VERSION = 6

# the jshandle list rule's injected JS (README.md:181-195): its md5
# prefix keys the jsinject blocks the "browser" reveals when this exact
# script ran in the page
INJECT_SCRIPT = "document.querySelectorAll('.more').forEach(a=>a.click());"
INJECT_KEY = hashlib.md5(INJECT_SCRIPT.encode()).hexdigest()[:8]

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        # browser-rendered DOM for jshandle pages (None elsewhere): the
        # fetch-sim analog of the reference's phantomjs downloader
        # output (downloader.js:312-437) — the raw `html` column holds
        # the unrendered JS shell a plain HTTP fetch would see
        ("html_rendered", pa.binary()),
    ]
)

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu ember quartz lattice vector raster kernel tensor stream "
    "shard batch arrow filter bucket token polite frontier drill crawl spider"
).split()

_ZH_VOCAB = list("数据处理引擎网络爬虫调度队列页面抓取解析链接内容规则示例文本中文网站商品价格")

_BASE_TS = datetime(2025, 1, 1)

COLORS = ["red", "blue", "green", "black", "white", "silver"]


def _host_shard(host: str, n: int) -> int:
    return int(hashlib.md5(host.encode()).hexdigest()[:8], 16) % n


def _para(rng: random.Random, n_words: int, zh: bool) -> str:
    if n_words > 400:
        # heavy-corpus fast path: numpy draw seeded from the stream rng —
        # same determinism contract, ~100× faster for benchmark page
        # weights.  Emitted as many small <span> elements, not one text
        # blob: real pages cost per DOM NODE, not per byte, so benchmark
        # realism means element-rich markup (~1 node / 5 words).
        import numpy as np

        vocab = _ZH_VOCAB if zh else _VOCAB
        nrng = np.random.RandomState(rng.randrange(2**31))
        idx = nrng.randint(0, len(vocab), size=n_words * (6 if zh else 1))
        sep = "" if zh else " "
        words = [vocab[i] for i in idx]
        step = 5
        return "".join(
            f"<span>{sep.join(words[i:i + step])}</span>"
            for i in range(0, len(words), step)
        )
    if zh:
        # CJK text is denser (no spaces, ~2 chars/word): pad to a char count
        # comparable to the EN variant so pages clear the reference's
        # 500-char validateContent floor (extractor.js:397)
        return "".join(rng.choice(_ZH_VOCAB) for _ in range(n_words * 6))
    return " ".join(rng.choice(_VOCAB) for _ in range(n_words))


def _detail_product_html_and_text(title, price, t1, t2, color, wt, p1, p2):
    # NOTE: no whitespace between elements inside .product — the text parity
    # formula below depends on it.
    html = (
        '<div class="product">'
        f'<h1 class="title">{title}</h1>'
        f'<span class="price">${price}</span>'
        f'<ul class="tags"><li>{t1}</li><li>{t2}</li></ul>'
        f'<div class="spec"><span class="k">color</span><span class="v">{color}</span></div>'
        f'<div class="spec"><span class="k">weight</span><span class="v">{wt}g</span></div>'
        f'<div class="body"><p>{p1}</p><p>{p2}</p></div>'
        "</div>"
    )
    text = f"{title}${price}{t1}{t2}color{color}weight{wt}g{p1}{p2}"
    return html, text


def _domain_plan(n_pages: int, n_domains: int) -> list[int]:
    """Page budget per domain: domain 0 gets ~40%, the rest uniform."""
    mega = int(n_pages * 0.4)
    rest = (n_pages - mega) // max(1, n_domains - 1)
    return [mega] + [rest] * (n_domains - 1)


def generate_corpus(
    out_dir: str,
    n_pages: int = 5000,
    n_domains: int = 20,
    seed: int = 42,
    pages_shards: int = 16,
    page_weight: int = 1,
) -> dict:
    """Write pages + rules + meta under ``out_dir``; returns meta dict.

    ``page_weight`` multiplies the filler-paragraph sizes (navigation
    chrome, non-extracted body copy) so benchmark corpora can match the
    50-150 KB DOM weight of real Common-Crawl pages while the parity
    corpora stay small; the extracted-text parity construction is
    untouched by it."""
    rng = random.Random(seed)
    rows: list[dict] = []
    rules: dict[str, dict[str, dict]] = {}
    budgets = _domain_plan(n_pages, n_domains)

    for d in range(n_domains):
        zh = n_domains >= 3 and d == n_domains - 1
        domain = f"site{d}.example"
        host = f"www.{domain}"
        base = f"http://{host}"
        n_d = max(budgets[d], 25)
        items_per_list = 8
        n_cats = max(2, int((n_d / 20) ** 0.5))
        n_lists = max(1, (n_d - 1 - n_cats) // ((items_per_list + 1) * n_cats))
        lang = "zh" if zh else "en"
        encoding = "gbk" if zh else "utf-8"
        # M13: the zh domain declares its real charset in the page itself
        # (<meta charset="gbk">) while its RULE encoding is deliberately
        # wrong — the engine must trust the page's declaration first,
        # like the reference trusts the content-type header's charset
        # over the configured one (downloader.js:272-285)
        meta_tag = '<meta charset="gbk">' if zh else ""
        rule_encoding = "utf-8" if zh else encoding
        # domain 1 serves gzip transfer-encoded responses (reference
        # downloader.js:250-307 gunzip path); mtime=0 keeps bytes
        # deterministic across generations
        gzipped = n_domains >= 2 and d == 1
        # domain 2 is the jshandle/browser domain (S6): a plain HTTP
        # fetch sees only a JS shell (no links, fails validateContent);
        # the real DOM lives in html_rendered (downloader.js:312-437)
        jsd = n_domains >= 4 and d == 2
        # domain 3 fetches through the simulated proxy pool (T8/J5):
        # ~1/8 of first attempts draw the bad proxy slot → 503 → T6
        # retry re-draws next wave (proxyrouter/index.js:62-141 vote-out)
        proxied = n_domains >= 5 and d == 3
        shell = (
            "<html><head><title>loading</title>"
            '<script src="/app.js"></script></head>'
            '<body><div id="app">loading</div>'
            "<noscript>This page requires JavaScript</noscript>"
            "</body></html>"
        )

        def page(url, html_str, text, binary: bytes | None = None,
                 cookie_marker: str = ""):
            # cookie_marker prefixes the RAW body (what the HTTP fetch
            # sees): for jshandle pages that's the JS shell, so a fetch
            # failing the cookie gate never reaches the rendered DOM —
            # the v6 cookie×browser interaction corpus (fetch.py
            # apply_browser's gate)
            rendered = None
            if binary is not None:
                body = binary
            else:
                if jsd:
                    rendered = html_str.encode(encoding)
                    body = (cookie_marker + shell).encode(encoding)
                else:
                    body = (cookie_marker + html_str).encode(encoding)
                if gzipped:
                    body = gzip.compress(body, mtime=0)
            rows.append(
                {
                    "url": url,
                    "warc_ts": _BASE_TS + timedelta(seconds=len(rows)),
                    "html": body,
                    "text": text,
                    "lang": lang if binary is None else "",
                    "html_rendered": rendered,
                }
            )

        # robots.txt (mega domain disallows /private/)
        robots = "User-agent: *\n"
        if d == 0:
            robots += "Disallow: /private/\n"
        page(f"{base}/robots.txt", robots, "", binary=robots.encode())

        # home
        title = f"home - {domain}"
        cats_html = "".join(
            f'<li><a class="cat" href="cat_{c}.html">cat {c}</a></li>'
            for c in range(n_cats)
        )
        filler = _para(rng, 80 * page_weight, zh)
        page(
            f"{base}/",
            f"<html><head>{meta_tag}<title>{title}</title></head><body>\n"
            f'<div id="crumb">root</div>\n<ul class="cats">{cats_html}</ul>\n'
            f'<p class="filler">{filler}</p>\n</body></html>',
            title,
        )

        for c in range(n_cats):
            # category page
            title = f"cat_{c} - {domain}"
            lists_html = "".join(
                f'<li><a class="list" href="cat_{c}/list_{p}.html">page {p}</a></li>'
                for p in range(1, n_lists + 1)
            )
            filler = _para(rng, 80 * page_weight, zh)
            page(
                f"{base}/cat_{c}.html",
                f"<html><head>{meta_tag}<title>{title}</title></head><body>\n"
                f'<div id="crumb">home</div>\n<ul class="lists">{lists_html}</ul>\n'
                f'<p class="filler">{filler}</p>\n</body></html>',
                title,
            )

            for p in range(1, n_lists + 1):
                # list page
                title = f"cat_{c} list {p} - {domain}"
                k_lo = (p - 1) * items_per_list
                ks = list(range(k_lo, k_lo + items_per_list))
                # jshandle domain: the last two item links exist ONLY in
                # click-revealed jsnav blocks of the rendered DOM — one
                # per navigation round (phantomjs-bridge.js:172-207) —
                # so URL-seen parity is sensitive to navigate_rule /
                # stoppage handling
                nav_ks = ks[-2:] if jsd else []
                items_html = "".join(
                    f'<li><a class="item" href="item_{k}.html?id={k}&utm=feed">Item {k}</a></li>'
                    for k in ks
                    if k not in nav_ks
                )
                extras = ""
                if jsd:
                    extras += '<a class="more" href="javascript:void(0)">more</a>'
                    for step, k in enumerate(nav_ks, start=1):
                        extras += (
                            f'<div class="jsnav" data-step="{step}">'
                            f'<a class="item" href="item_{k}.html?id={k}&utm=js">'
                            f"Item {k}</a></div>"
                        )
                    # script-injected content: revealed only when the
                    # rule's `script` hashes to the block's data-key
                    # (flat single <a> — the no-nested-div contract)
                    kinj = 900000 + c * 1000 + p
                    extras += (
                        f'<div class="jsinject" data-key="{INJECT_KEY}">'
                        f'<a class="item" href="item_{kinj}.html?id={kinj}'
                        f'&utm=inj">Item {kinj}</a></div>'
                    )
                if p % 3 == 0:
                    dead = 1_000_000 + p
                    extras += f'<a class="dead" href="item_{dead}.html?id={dead}">gone</a>'
                if d == 0 and p % 4 == 0:
                    extras += f'<a class="priv" href="/private/secret_{p}.html">private</a>'
                if d == 0:
                    extras += f'<img class="photo" src="/img/pic_{c}_{p}.jpg">'
                nxt = (
                    f'<a class="next" href="list_{p + 1}.html">next page</a>'
                    if p < n_lists
                    else ""
                )
                filler = _para(rng, 80 * page_weight, zh)
                # v6: jshandle LIST pages sit behind the rule's session
                # cookie; every 5th≡2 list demands a premium cookie the
                # rule does NOT carry → the browser path must serve the
                # login stub (no jsnav/jsinject discovery from that
                # list), exercising the cookie→browser dispatch order
                # end-to-end
                ck_list = ""
                if jsd:
                    ck_list = ("<!--require-cookie:premium=gold-->"
                               if p % 5 == 2
                               else f"<!--require-cookie:session=js{d}-->")
                page(
                    f"{base}/cat_{c}/list_{p}.html",
                    f"<html><head>{meta_tag}<title>{title}</title></head><body>\n"
                    f'<div id="crumb">cat_{c}</div>\n<ul class="items">{items_html}</ul>\n'
                    f'{nxt}{extras}<a href="#top">top</a>'
                    f'<a href="javascript:void(0)">noop</a>\n'
                    f'<p class="filler">{filler}</p>\n</body></html>',
                    title,
                    cookie_marker=ck_list,
                )

                item_ks = list(range(k_lo, k_lo + items_per_list))
                if jsd:
                    # the jsinject-revealed detail page (same product
                    # machinery → text-parity invariant holds for it)
                    item_ks.append(900000 + c * 1000 + p)
                for k in item_ks:
                    # the proxied domain's detail pages additionally
                    # require the rule's cookie (M15 gate): the marker
                    # comment is invisible to the DOM tokenizer, so text
                    # parity holds.  Every 7th≡3 item demands a cookie
                    # the rule does NOT carry → deterministic login-stub
                    # failures that make the gate observable in e2e
                    # parity (like the zh domain's wrong rule encoding)
                    ck = ""
                    if proxied:
                        ck = ("<!--require-cookie:premium=gold-->"
                              if k % 7 == 3
                              else f"<!--require-cookie:auth=tok{d}-->")
                    item_url = f"{base}/cat_{c}/item_{k}.html?id={k}"
                    if k % 97 == 13:  # deliberately short → fails validation
                        title = f"Item {k}"
                        page(
                            item_url,
                            f'{ck}<html><body><div class="product">'
                            f'<h1 class="title">{title}</h1></div></body></html>',
                            title,
                        )
                        continue
                    title = (
                        f"商品 {k} {_para(rng, 2, True)}" if zh else
                        f"Item {k} {_para(rng, 2, False)}"
                    )
                    price = 10 + (k * 7 + c) % 990
                    t1, t2 = f"tag{k % 11}", f"tag{(k + 5) % 11}"
                    color = COLORS[k % len(COLORS)]
                    wt = 100 + (k * 13) % 900
                    p1, p2 = _para(rng, 40, zh), _para(rng, 30, zh)
                    product, text = _detail_product_html_and_text(
                        title, price, t1, t2, color, wt, p1, p2
                    )
                    k2 = k_lo + (k + 1 - k_lo) % items_per_list
                    filler = _para(rng, 70 * page_weight, zh)
                    page(
                        item_url,
                        f"{ck}<html><head>{meta_tag}<title>{title} - {domain}"
                        f"</title></head><body>\n"
                        f'<div id="crumb">cat_{c}</div>\n{product}\n'
                        f'<div class="related"><a class="item" '
                        f'href="item_{k2}.html?id={k2}&utm=rel">related</a></div>\n'
                        f'<p class="filler">{filler}</p>\n</body></html>',
                        text,
                    )

        # binary image pages for the mega domain
        if d == 0:
            for c in range(n_cats):
                for p in range(1, n_lists + 1):
                    blob = (f"JPEGDATA:{c}:{p}:".encode() + bytes(
                        (k * 37 + c + p) % 256 for k in range(120)
                    ))
                    page(f"{base}/img/pic_{c}_{p}.jpg", "", "", binary=blob)

        # ---- driller rules for this domain (README.md:164-250 schema) ----
        esc = domain.replace(".", r"\.")
        rules[domain] = {
            "home": _rule(
                domain, "home", rf"^http://www\.{esc}/$", "branch",
                drill=["a.cat"], seed=[f"{base}/"], priority=1, weight=10,
                encoding=rule_encoding, jshandle=jsd, use_proxy=proxied,
            ),
            "category": _rule(
                domain, "category", rf"^http://www\.{esc}/cat_\d+\.html$",
                "branch", drill=["a.list"], priority=1, weight=8,
                encoding=rule_encoding, jshandle=jsd, use_proxy=proxied,
            ),
            "list": _rule(
                domain, "list", rf"^http://www\.{esc}/cat_\d+/list_\d+\.html$",
                "branch",
                drill=["a.item", "a.next", "a.dead", "a.priv", "img.photo"],
                priority=1, weight=6, encoding=rule_encoding,
                use_proxy=proxied,
                schedule_rule="LIFO" if d == 1 else "FIFO",
                jshandle=jsd,
                navigate_rule=["a.more"] if jsd else None,
                stoppage=3 if jsd else -1,
                script=INJECT_SCRIPT if jsd else None,
                cookie=([{"name": "session", "value": f"js{d}"}]
                        if jsd else None),
                seed=(
                    [f"{base}/cat_0/list_#.html#1#2#1"] if d == 0 else []
                ),
            ),
            "detail": _rule(
                domain, "detail", rf"^http://www\.{esc}/cat_\d+/item_\d+\.html",
                # jshandle detail pages don't drill: the jsnav links are
                # then reachable ONLY through the browser's navigation
                # rounds, so navigate_rule handling is observable in the
                # URL-seen set
                "node", drill=[] if jsd else ["a.item"], priority=2, weight=5,
                id_parameter=["id"], encoding=rule_encoding, jshandle=jsd,
                use_proxy=proxied,
                cookie=([{"name": "auth", "value": f"tok{d}"}]
                        if proxied else None),
                validation_keywords=["product"],
                extract_rule={
                    "category": "product",
                    "rule": {
                        "text_main": {"mode": "css", "expression": "div.product",
                                       "pick": "text", "index": 1},
                        "title": {"mode": "css", "expression": "h1.title",
                                   "pick": "text", "index": 1},
                        "price": {"mode": "regex", "base": "content",
                                   "expression": r"\$(\d+)", "index": 1},
                        "item_id": {"mode": "regex", "base": "url",
                                     "expression": r"id=(\d+)", "index": 1},
                        "source": {"mode": "value", "expression": "synthetic"},
                        "tags": {"mode": "css", "expression": ".tags li",
                                  "pick": "text", "index": -1},
                        "specs": {"mode": "css", "expression": "div.spec",
                                   "index": -1,
                                   "subset": {
                                       "category": "spec",
                                       "relate": "title",
                                       "rule": {
                                           "k": {"mode": "css",
                                                  "expression": "span.k",
                                                  "pick": "text", "index": 1},
                                           "v": {"mode": "css",
                                                  "expression": "span.v",
                                                  "pick": "text", "index": 1},
                                       },
                                       "require": ["k", "v"],
                                   }},
                    },
                    "require": ["text_main", "title", ["price", "item_id"]],
                },
            ),
        }
        if d == 0:
            rules[domain]["private"] = _rule(
                domain, "private", rf"^http://www\.{esc}/private/", "node",
                priority=3, weight=0, encoding=encoding,
            )
            rules[domain]["image"] = _rule(
                domain, "image", rf"^http://www\.{esc}/img/.+\.jpg$", "node",
                priority=3, weight=0, fmt="binary", encoding=encoding,
            )

    # ---- write partitioned pages ----------------------------------------
    os.makedirs(out_dir, exist_ok=True)
    by_shard: dict[int, list[dict]] = {}
    for r in rows:
        host = r["url"].split("/")[2]
        by_shard.setdefault(_host_shard(host, pages_shards), []).append(r)
    for k, shard_rows in sorted(by_shard.items()):
        pdir = os.path.join(out_dir, "pages", f"shard={k}")
        os.makedirs(pdir, exist_ok=True)
        tbl = pa.Table.from_pylist(shard_rows, schema=PAGES_SCHEMA)
        pq.write_table(tbl, os.path.join(pdir, "part.parquet"))
    with open(os.path.join(out_dir, "rules.json"), "w") as f:
        json.dump(rules, f, ensure_ascii=False, indent=1)
    meta = {
        "n_pages": len(rows),
        "n_domains": n_domains,
        "seed": seed,
        "pages_shards": pages_shards,
        "page_weight": page_weight,
        "gen_version": GEN_VERSION,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _rule(domain, alias, url_pattern, type_, *, drill=None, seed=None,
          priority=1, weight=0, id_parameter=None, validation_keywords=None,
          extract_rule=None, fmt="html", encoding="utf-8",
          schedule_rule="FIFO", jshandle=False, navigate_rule=None,
          stoppage=-1, use_proxy=False, script=None, cookie=None) -> dict:
    """A driller rule in the reference's config schema (README.md:164-250;
    jshandle/navigate_rule/stoppage defaults per
    webconfig/controllers/rule.js:13-30)."""
    return {
        "domain": domain,
        "alias": alias,
        "url_pattern": url_pattern,
        "type": type_,
        "format": fmt,
        "encoding": encoding,
        "save_page": False,
        "jshandle": jshandle,
        "navigate_rule": navigate_rule or [],
        "stoppage": stoppage,
        "use_proxy": use_proxy,
        # injected-JS hook (README.md:181-195) and request cookies
        # (downloader.js:117-123) — both observable in the corpus model
        "script": script or "",
        "cookie": cookie or [],
        "drill_rules": drill or [],
        "drill_relation": {"base": "content", "mode": "css",
                            "expression": "#crumb", "pick": "text", "index": 1},
        "extract_rule": extract_rule or {
            "rule": {
                "text_main": {"mode": "css", "expression": "title",
                               "pick": "text", "index": 1}
            }
        },
        "validation_keywords": validation_keywords or [],
        "id_parameter": id_parameter or [],
        "priority": priority,
        "weight": weight,
        "schedule_interval": 86400,
        "schedule_rule": schedule_rule,
        "seed": seed or [],
        "active": True,
    }


# --------------------------------------------------------------------------
# sf_dir → cached corpus (tests/bench/queries derive corpus scale from the
# driver's sf directory name; corpus is generated once into a /tmp cache)
# --------------------------------------------------------------------------

_SF_PARAMS = {
    "sf0.001": dict(n_pages=500, n_domains=5),
    "sf0.01": dict(n_pages=5000, n_domains=20),
    "sf0.1": dict(n_pages=50000, n_domains=50),
}


def corpus_for_sf(sf_dir: str, cache_root: str = "/tmp/neocrawler_ray_corpus",
                  page_weight: int = 1) -> str:
    """Deterministically generate (or reuse) the synthetic crawl corpus
    matching an sf testdata dir; returns the corpus dir.  A
    ``page_weight > 1`` corpus (bench profile) caches separately."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    if page_weight > 1:
        tag = f"{tag}-w{page_weight}"
    params = dict(_SF_PARAMS.get(tag.split("-")[0], _SF_PARAMS["sf0.01"]))
    if page_weight > 1:
        # bench profile: few rule-sets over many heavy pages — the shape
        # of a Common-Crawl-scale crawl (a handful of generic extract
        # rules, millions of hosts); per-rule scheduler cost is exercised
        # by the parity corpora, page volume by this one
        params["n_domains"] = min(params["n_domains"], 8)
    out = os.path.join(cache_root, tag)
    marker = os.path.join(out, "meta.json")
    shards = 64 if page_weight > 1 else 16  # bench profile: wider fetch locality
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if (meta.get("n_pages") and meta.get("seed") == 42
                and meta.get("page_weight", 1) == page_weight
                and meta.get("pages_shards", 16) == shards
                and meta.get("gen_version") == GEN_VERSION):
            return out
    generate_corpus(out, seed=42, page_weight=page_weight,
                    pages_shards=shards, **params)
    return out
