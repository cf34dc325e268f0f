"""Synthetic corpus generator: determinism, schema, parity invariant."""

import json
import re

import pyarrow.dataset as pads

from neocrawler_ray.functions.extract import decode_body, extract_page
from neocrawler_ray.sources.pages_gen import PAGES_SCHEMA, generate_corpus


def _gen(tmp_path, name, **kw):
    out = str(tmp_path / name)
    meta = generate_corpus(out, n_pages=300, n_domains=4, seed=42, **kw)
    return out, meta


def test_deterministic(tmp_path):
    a, meta_a = _gen(tmp_path, "a")
    b, meta_b = _gen(tmp_path, "b")
    assert meta_a == meta_b
    ta = pads.dataset(f"{a}/pages").to_table().sort_by("url")
    tb = pads.dataset(f"{b}/pages").to_table().sort_by("url")
    assert ta.equals(tb)
    assert json.load(open(f"{a}/rules.json")) == json.load(open(f"{b}/rules.json"))


def test_schema_and_shape(tmp_path):
    out, meta = _gen(tmp_path, "c")
    tbl = pads.dataset(f"{out}/pages").to_table()
    assert tbl.schema.equals(PAGES_SCHEMA.with_metadata(tbl.schema.metadata or {})) or [
        (f.name, str(f.type)) for f in tbl.schema
    ] == [(f.name, str(f.type)) for f in PAGES_SCHEMA]
    urls = tbl.column("url").to_pylist()
    assert meta["n_pages"] == len(urls) == len(set(urls))
    # every host has a robots.txt; mega domain disallows /private/
    robots = [u for u in urls if u.endswith("/robots.txt")]
    assert len(robots) == 4
    mega = tbl.filter(
        pads.field("url") == "http://www.site0.example/robots.txt"
    )
    assert b"Disallow: /private/" in mega.column("html")[0].as_py()
    # binary image pages exist on the mega domain
    assert any("/img/" in u for u in urls)


def test_text_parity_invariant(tmp_path):
    """pages.text is byte-identical to the engine's text_main extraction —
    the BASELINE.json input_hint invariant, checked generator-vs-engine."""
    out, _ = _gen(tmp_path, "d")
    rules = json.load(open(f"{out}/rules.json"))
    tbl = pads.dataset(f"{out}/pages").to_table()
    checked = 0
    for r in tbl.to_pylist():
        url = r["url"]
        if not re.search(r"item_\d+\.html", url) or "/private/" in url:
            continue
        dom = ".".join(url.split("/")[2].split(".")[1:])
        rule = rules[dom]["detail"]
        content = decode_body(r["html"], rule)
        if len(content) < 500:
            continue
        _, _, data, lacks = extract_page(url, content, rule, "*", True, rules)
        assert data["text_main"] == r["text"], url
        assert lacks == []
        checked += 1
    assert checked > 100


def test_gzip_transfer_domain(tmp_path):
    """Domain 1 stores gzip transfer-encoded bodies (M13 gunzip path);
    robots/binary pages stay raw."""
    out, _ = _gen(tmp_path, "gz")
    tbl = pads.dataset(f"{out}/pages").to_table(columns=["url", "html"])
    gz = plain = 0
    for u, h in zip(tbl.column("url").to_pylist(),
                    tbl.column("html").to_pylist()):
        if "site1.example" not in u:
            continue
        if u.endswith("robots.txt"):
            assert not h.startswith(b"\x1f\x8b")
        elif u.endswith(".html") or u.rstrip("/").endswith("site1.example"):
            assert h.startswith(b"\x1f\x8b"), u
            gz += 1
        else:
            plain += 1
    assert gz >= 5
