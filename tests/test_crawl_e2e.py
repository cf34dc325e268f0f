"""End-to-end parity: distributed multi-shard Ray crawl ≡ sequential
oracle (schedule order, URL-seen set, byte-identical text), plus
resume-from-checkpoint equivalence (FIXTURES.md §4, SURVEY.md §5)."""

import glob

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from neocrawler_ray.config import CrawlSettings
from neocrawler_ray.sources.pages_gen import generate_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus"))
    generate_corpus(out, n_pages=400, n_domains=4, seed=42)
    return out


def _settings(**kw):
    base = dict(num_frontier_shards=4, fetch_concurrency=2,
                extract_concurrency=2, max_waves=60)
    base.update(kw)
    return CrawlSettings(**base)


def _schedule_rows(out_dir):
    files = sorted(
        glob.glob(f"{out_dir}/schedule/wave_*.parquet"),
        key=lambda p: int(p.split("_")[-1].split(".")[0]),
    )
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return [
        (r["wave"], r["seq"], r["url"], r["urllib"]) for r in tbl.to_pylist()
    ]


@pytest.fixture(scope="module")
def oracle_result(corpus):
    from neocrawler_ray.pipelines.oracle import run_oracle

    return run_oracle(corpus, _settings())


@pytest.fixture(scope="module")
def engine_out(corpus, tmp_path_factory, ray_session):
    from neocrawler_ray.pipelines.crawl import CrawlJob

    out = str(tmp_path_factory.mktemp("engine_out"))
    job = CrawlJob(corpus, _settings(), out)
    totals = job.run()
    return out, totals


def test_schedule_order_parity(engine_out, oracle_result):
    out, totals = engine_out
    eng = _schedule_rows(out)
    ora = [
        (r["wave"], r["seq"], r["url"], r["urllib"])
        for r in oracle_result["schedule_log"]
    ]
    assert eng == ora
    assert totals["waves"] == oracle_result["waves"]


def test_url_seen_parity(engine_out, oracle_result):
    out, _ = engine_out
    seen = pq.read_table(f"{out}/url_seen").column("url_md5").to_pylist()
    assert set(seen) == set(oracle_result["url_seen"].keys())
    assert len(seen) == len(set(seen))


def test_text_and_state_parity(engine_out, oracle_result):
    out, _ = engine_out
    ext = pads.dataset(f"{out}/extracted").to_table(
        columns=["url", "text", "final_state", "status"]
    ).to_pylist()
    by_url = {e["url"]: e for e in oracle_result["extracted"]}
    assert len(ext) == len(by_url)
    for r in ext:
        o = by_url[r["url"]]
        assert r["text"] == o["text"], r["url"]          # byte-identical
        assert r["final_state"] == o["final_state"]
        assert r["status"] == o["status"]
    # coverage: every non-robots corpus page was crawled successfully or
    # deliberately failed (short/dead/robots fixtures)
    assert sum(1 for r in ext if r["final_state"] == "crawled_finish") > 300


def test_resume_from_checkpoint(corpus, tmp_path_factory, ray_session,
                                engine_out, oracle_result):
    """Kill after wave 2, resume with fresh actors → identical final
    schedule log + URL-seen set as the uninterrupted run."""
    from neocrawler_ray.pipelines.crawl import CrawlJob

    out_full, _ = engine_out
    out = str(tmp_path_factory.mktemp("resume_out"))
    job1 = CrawlJob(corpus, _settings(), out)
    job1.run(max_waves=3)  # "killed" after wave 2 checkpoint
    job2 = CrawlJob(corpus, _settings(), out, resume=True)
    assert job2.start_wave == 3
    job2.run()

    assert _schedule_rows(out) == _schedule_rows(out_full)
    seen_r = set(pq.read_table(f"{out}/url_seen").column("url_md5").to_pylist())
    seen_f = set(
        pq.read_table(f"{out_full}/url_seen").column("url_md5").to_pylist()
    )
    assert seen_r == seen_f
