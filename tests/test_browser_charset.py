"""S6 browser path + M13 page-declared charset (round-3 behaviors).

- ``apply_browser`` / ``navigate_steps``: click-budget gating of the
  ``jsnav`` blocks (reference phantomjs-bridge.js:172-207 runs a
  navigation round while ``drill_count < stoppage-1``).
- ``sniff_charset`` / ``decode_body``: the page's own ``<meta charset>``
  wins over the rule ``encoding`` (reference downloader.js:272-285
  trusts the response's content-type charset over the configured one).
- Oracle-level observability: removing ``navigate_rule`` (or lowering
  ``stoppage``) shrinks the discovered URL set by exactly the
  click-revealed links.

No Ray needed: the oracle is sequential and the functions are pure.
The engine side of the same behaviors is covered by the e2e parity
tests (tests/test_crawl_e2e.py), which run the distributed crawl over
the same 4-domain corpus (domain 2 jshandle, domain 3 meta-charset).
"""

import gzip
import json
import re
import shutil

import pytest

from neocrawler_ray.config import CrawlSettings
from neocrawler_ray.functions.extract import decode_body, sniff_charset
from neocrawler_ray.sources.pages_gen import generate_corpus
from neocrawler_ray.stages.fetch import (apply_browser, browser_rules_map,
                                         navigate_steps)

# ---------------------------------------------------------------------------
# pure functions
# ---------------------------------------------------------------------------

RENDERED = (
    b'<html><body><ul><li><a class="item" href="item_1.html">one</a></li>'
    b'</ul><a class="more" href="javascript:void(0)">more</a>'
    b'<div class="jsnav" data-step="1"><a class="item" href="item_2.html">'
    b"two</a></div>"
    b'<div class="jsnav" data-step="2"><a class="item" href="item_3.html">'
    b"three</a></div></body></html>"
)


def test_apply_browser_falls_back_to_raw():
    assert apply_browser(b"shell", None, 2) == b"shell"


def test_apply_browser_step_gating():
    no_nav = apply_browser(b"shell", RENDERED, 0)
    one = apply_browser(b"shell", RENDERED, 1)
    both = apply_browser(b"shell", RENDERED, 2)
    assert b"item_1" in no_nav and b"item_2" not in no_nav
    assert b"item_2" in one and b"item_3" not in one
    assert b"item_2" in both and b"item_3" in both
    # budget beyond available steps keeps everything
    assert apply_browser(b"shell", RENDERED, 9) == both


def test_apply_browser_script_injection_gating():
    """README.md:181-195 `script` hook: a jsinject block is revealed only
    when the rule's script hashes to the block's data-key."""
    import hashlib

    from neocrawler_ray.stages.fetch import rule_script_key

    script = "window.__nc = 1;"
    key = hashlib.md5(script.encode()).hexdigest()[:8]
    rendered = RENDERED.replace(
        b"</body>",
        f'<div class="jsinject" data-key="{key}">'
        f'<a class="item" href="item_inj.html">inj</a></div></body>'
        .encode())
    assert rule_script_key({"script": script}) == key
    assert rule_script_key({}) is None
    with_script = apply_browser(b"shell", rendered, 2, key)
    assert b"item_inj" in with_script and b"item_3" in with_script
    # no script / wrong script → block stripped (steps unaffected)
    assert b"item_inj" not in apply_browser(b"shell", rendered, 2, None)
    assert b"item_inj" not in apply_browser(b"shell", rendered, 2, "deadbeef")
    assert b"item_3" in apply_browser(b"shell", rendered, 2, None)


def test_cookie_gate():
    """M15 made observable (downloader.js:117-123): a require-cookie page
    is served only when the rule's cookie header carries the pair."""
    from neocrawler_ray.stages.fetch import (LOGIN_STUB, apply_cookie_gate,
                                             rule_cookie_header)

    body = b"<!--require-cookie:auth=tok3--><html><body>secret</body></html>"
    rule = {"cookie": [{"name": "auth", "value": "tok3"}]}
    hdr = rule_cookie_header(rule)
    assert hdr == "auth=tok3"
    assert apply_cookie_gate(body, hdr) == body
    assert apply_cookie_gate(body, "") == LOGIN_STUB
    assert apply_cookie_gate(body, "auth=wrong") == LOGIN_STUB
    assert apply_cookie_gate(body, "a=b;auth=tok3") == body
    # unmarked pages pass through untouched
    assert apply_cookie_gate(b"<html>x</html>", "") == b"<html>x</html>"
    assert apply_cookie_gate(None, hdr) is None


def test_navigate_steps_defaults():
    # reference defaults (webconfig/controllers/rule.js:29-30):
    # navigate_rule [] + stoppage -1 → no navigation rounds
    assert navigate_steps({"navigate_rule": [], "stoppage": -1}) == 0
    assert navigate_steps({}) == 0
    # stoppage 3 with a rule → 2 click rounds (phantomjs-bridge.js:172)
    assert navigate_steps({"navigate_rule": ["a.more"], "stoppage": 3}) == 2
    # empty-string rule is "no navigation" (bridge checks [0] != '')
    assert navigate_steps({"navigate_rule": [""], "stoppage": 3}) == 0
    # string form tolerated
    assert navigate_steps({"navigate_rule": "a.more", "stoppage": 2}) == 1


def test_browser_rules_map_keys_and_steps():
    rules = {
        "site.example": {
            "list": {"jshandle": True, "navigate_rule": ["a.more"],
                     "stoppage": 3},
            "detail": {"jshandle": True},
            "plain": {"jshandle": False},
        }
    }
    m = browser_rules_map(rules)
    assert m == {
        "urllib:driller:site.example:list": (2, None),
        "urllib:driller:site.example:detail": (0, None),
    }


ZH = "数据处理引擎网络爬虫"


def test_sniff_charset():
    html = f'<html><head><meta charset="gbk"><title>{ZH}</title>'.encode("gbk")
    assert sniff_charset(html) == "gbk"
    assert sniff_charset(b"<html><head><title>t</title>") is None
    # http-equiv form
    html2 = (b'<html><head><meta http-equiv="Content-Type" '
             b'content="text/html; charset=GB2312">')
    assert sniff_charset(html2) == "GB2312"
    # unknown name → ignored
    assert sniff_charset(b'<meta charset="no-such-enc">') is None
    # "charset=" inside an unrelated attribute VALUE must not win —
    # attributes are parsed, not substring-matched
    desc = (b'<meta name="description" '
            b'content="how to convert charset=gbk files">')
    assert sniff_charset(desc) is None
    assert sniff_charset(desc + b'<meta charset="utf-8">') == "utf-8"
    # unknown declaration first, real one later in head → later one wins
    assert sniff_charset(
        b'<meta charset="bogus-enc"><meta charset="gbk">') == "gbk"


def test_decode_body_meta_overrides_rule_encoding():
    html = f'<html><head><meta charset="gbk"></head><body>{ZH}</body>'.encode(
        "gbk")
    assert ZH in decode_body(html, {"encoding": "utf-8"})
    # no meta → rule encoding applies
    raw = f"<html><body>{ZH}</body></html>".encode("gbk")
    assert ZH in decode_body(raw, {"encoding": "gbk"})
    # gzip transfer decode runs before the sniff
    assert ZH in decode_body(gzip.compress(html, mtime=0),
                             {"encoding": "utf-8"})


# ---------------------------------------------------------------------------
# oracle-level observability (sequential — no Ray)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("jscorpus"))
    generate_corpus(out, n_pages=400, n_domains=4, seed=42)
    return out


def _settings():
    return CrawlSettings(num_frontier_shards=1, max_waves=60)


def _oracle_seen_urls(corpus_dir):
    from neocrawler_ray.pipelines.oracle import run_oracle

    res = run_oracle(corpus_dir, _settings())
    urls = {r["url"] for r in res["schedule_log"]}
    finished = {r["url"]: r for r in res["extracted"]}
    return urls, finished


def _edit_list_rule(src, dst, **patch):
    shutil.copytree(src, dst)
    path = f"{dst}/rules.json"
    with open(path) as f:
        rules = json.load(f)
    rules["site2.example"]["list"].update(patch)
    with open(path, "w") as f:
        json.dump(rules, f, ensure_ascii=False)
    return dst


ITEM_RE = re.compile(r"^http://www\.site2\.example/cat_\d+/item_\d+\.html")


def test_navigate_rule_drives_discovery(corpus, tmp_path):
    full_urls, full_rows = _oracle_seen_urls(corpus)
    no_nav = _edit_list_rule(corpus, str(tmp_path / "nonav"),
                             navigate_rule=[])
    nonav_urls, _ = _oracle_seen_urls(no_nav)
    one_step = _edit_list_rule(corpus, str(tmp_path / "onestep"), stoppage=2)
    one_urls, _ = _oracle_seen_urls(one_step)

    # click-revealed links exist only with navigation enabled, and the
    # stoppage budget gates them step by step: none ⊂ one-step ⊂ full
    assert nonav_urls < one_urls < full_urls
    for diff in (one_urls - nonav_urls, full_urls - one_urls):
        assert diff and all(ITEM_RE.match(u) for u in diff)

    # jshandle pages crawl to completion off the RENDERED dom: the raw
    # shell would fail validateContent, so a finish with product text
    # proves the browser path served html_rendered
    js_details = [r for u, r in full_rows.items()
                  if ITEM_RE.match(u) and r["final_state"] == "crawled_finish"]
    assert js_details and all(r["text"] for r in js_details)


def test_zh_pages_decode_despite_wrong_rule_encoding(corpus):
    # domain 3 (zh): rule encoding is deliberately utf-8 while the bytes
    # are GBK + <meta charset="gbk"> — extraction must still produce the
    # generator's parity text (it would be mojibake without the sniff)
    import pyarrow.dataset as pads

    _, rows = _oracle_seen_urls(corpus)
    pages = pads.dataset(f"{corpus}/pages").to_table(columns=["url", "text"])
    truth = dict(zip(pages.column("url").to_pylist(),
                     pages.column("text").to_pylist()))
    zh_finished = [
        r for u, r in rows.items()
        if u.startswith("http://www.site3.example/cat_")
        and "item_" in u and r["final_state"] == "crawled_finish"
    ]
    assert zh_finished
    for r in zh_finished:
        assert r["text"] == truth[r["url"]]
        assert any("一" <= ch <= "鿿" for ch in r["text"])


# ---------------------------------------------------------------------------
# T8/J5 simulated proxy pool (observable-effect model of
# proxyrouter/index.js:62-141 vote-out + redraw)
# ---------------------------------------------------------------------------


def test_proxy_fetch_failed_rate_and_redraw():
    from neocrawler_ray.stages.fetch import PROXY_POOL, proxy_fetch_failed

    urls = [f"http://www.p.example/item_{i}.html" for i in range(4000)]
    fails0 = [u for u in urls if proxy_fetch_failed(u, 0)]
    # deterministic
    assert fails0 == [u for u in urls if proxy_fetch_failed(u, 0)]
    # ~1/POOL of first attempts draw the bad slot
    assert 0.6 / PROXY_POOL < len(fails0) / len(urls) < 1.6 / PROXY_POOL
    # a retry is a fresh draw: most failed urls succeed on attempt 1
    redraw_ok = [u for u in fails0 if not proxy_fetch_failed(u, 1)]
    assert len(redraw_ok) / len(fails0) > 0.7


def test_proxy_domain_transient_failures_recover(tmp_path):
    """Oracle run over the 5-domain corpus: the use_proxy domain shows
    503 first attempts that the T6 retry loop re-draws past — rows with
    retries > 0 that still end crawled_finish.  Engine-side parity is
    covered by the e2e suite over the same 5-domain corpus."""
    corpus5 = str(tmp_path / "proxycorpus")
    generate_corpus(corpus5, n_pages=500, n_domains=5, seed=42)
    from neocrawler_ray.pipelines.oracle import run_oracle

    res = run_oracle(corpus5, _settings())
    site3 = [r for r in res["extracted"]
             if r["url"].startswith("http://www.site3.example/")]
    assert site3
    first_503 = [r for r in site3 if r["status"] == 503]
    recovered = [r for r in site3
                 if r["retries"] > 0 and r["final_state"] == "crawled_finish"]
    assert first_503 and recovered
    # other domains never draw the proxy pool
    assert all(r["status"] != 503 for r in res["extracted"]
               if r["url"].startswith("http://www.site1.example/"))


def test_cookie_gate_blocks_browser_rendering():
    """A rule combining ``cookie`` and ``jshandle``: a fetch that fails
    the cookie gate must serve the LOGIN STUB, not the rendered DOM —
    the browser renders what the server answered (fetch.py:apply_browser
    gate), and a gated fetch performs no click rounds."""
    from neocrawler_ray.stages.fetch import (LOGIN_STUB, apply_browser,
                                             apply_cookie_gate)

    raw = (b"<!--require-cookie:sid=42--><html><body>"
           b"<div id='app'>js shell</div></body></html>")
    rendered = (b"<html><body>secret"
                b'<div class="jsnav" data-step="1"><a href="/x">x</a></div>'
                b"</body></html>")
    gated = apply_cookie_gate(raw, "")          # wrong/missing cookie
    assert gated == LOGIN_STUB
    assert apply_browser(gated, rendered, 2, None) == LOGIN_STUB
    ok = apply_cookie_gate(raw, "sid=42")       # right cookie
    assert ok == raw
    assert b"secret" in apply_browser(ok, rendered, 2, None)
