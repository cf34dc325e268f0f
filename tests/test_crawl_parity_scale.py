"""Bench-scale crawl parity — the hard-signal cross-check for the
crawl family, whose outputs are structurally invisible to the DuckDB
gate (VERDICT r2 "missing #4"): re-assert schedule-order and URL-seen
parity vs the sequential oracle on a 10× larger, 20-domain corpus
(every special domain live: mega/robots, gzip+LIFO, browser/jshandle,
simulated proxy, zh meta-charset — plus 15 plain ones), driven through
the same multi-shard Ray path the bench measures."""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from neocrawler_ray.config import CrawlSettings
from neocrawler_ray.sources.pages_gen import generate_corpus

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus_scale"))
    generate_corpus(out, n_pages=5000, n_domains=20, seed=11)
    return out


def _settings():
    return CrawlSettings(num_frontier_shards=8, max_waves=60)


def _schedule_rows(out_dir):
    files = sorted(
        glob.glob(f"{out_dir}/schedule/wave_*.parquet"),
        key=lambda p: int(p.split("_")[-1].split(".")[0]),
    )
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return [
        (r["wave"], r["seq"], r["url"], r["urllib"]) for r in tbl.to_pylist()
    ]


def test_schedule_and_seen_parity_at_scale(corpus, tmp_path_factory,
                                           ray_session):
    from neocrawler_ray.pipelines.crawl import CrawlJob
    from neocrawler_ray.pipelines.oracle import run_oracle

    ora = run_oracle(corpus, _settings())
    out = str(tmp_path_factory.mktemp("engine_scale"))
    totals = CrawlJob(corpus, _settings(), out).run()

    eng = _schedule_rows(out)
    assert len(eng) > 5000  # the corpus actually got crawled (+ retries)
    assert eng == [
        (r["wave"], r["seq"], r["url"], r["urllib"])
        for r in ora["schedule_log"]
    ]
    assert totals["waves"] == ora["waves"]
    seen = pq.read_table(f"{out}/url_seen").column("url_md5").to_pylist()
    assert set(seen) == set(ora["url_seen"].keys())
    assert len(seen) == len(set(seen))
