"""``ray job submit`` entrypoint for the crawl engine.

On a real cluster (the north-star deployment: fixed N / 4N nodes):

    ray job submit --working-dir . -- \
        python tools/crawl_job.py --sf-dir /data/sf100 \
            --out /data/crawl_out --page-weight 48

The script connects to the cluster the job runner provides
(``RAY_ADDRESS``; ``auto`` when launched by the job agent, ``local``
in this sandbox), builds/locates the deterministic pages corpus for the
testdata directory, runs the wave loop with per-shard checkpoints, and
prints one JSON metrics line.  ``--resume`` restores the newest
checkpoint manifest and continues — a killed job rerun with the same
``--out`` skips completed waves (reference parity: the
scheduler/spider processes restart against durable redis/ssdb state,
scheduler/index.js:124-157).

Exit code is non-zero when the run aborts (e.g. the T7 circuit
breaker), so job-level retry policies see the failure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("GRAFT_SF_DIR",
                                           "/root/testdata/sf0.001"))
    ap.add_argument("--out", default=None,
                    help="output/checkpoint dir (default: a /tmp rundir "
                         "derived from --sf-dir, stable across reruns so "
                         "--resume finds its checkpoints)")
    ap.add_argument("--page-weight", type=int,
                    default=int(os.environ.get("GRAFT_PAGE_WEIGHT", "12")))
    ap.add_argument("--resume", action="store_true",
                    help="restore the newest checkpoint and continue")
    ap.add_argument("--max-waves", type=int, default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from neocrawler_ray.config import CrawlSettings
    from neocrawler_ray.pipelines.crawl import CrawlJob
    from neocrawler_ray.sources.pages_gen import corpus_for_sf

    corpus = corpus_for_sf(args.sf_dir, page_weight=args.page_weight)
    # the default out dir keys on page_weight too: --resume with a
    # different weight must land in a fresh dir, never restore shard
    # state built against a different corpus
    out = args.out or os.path.join(
        "/tmp", "nc_job_" + args.sf_dir.strip("/").replace("/", "_")
        + f"_w{args.page_weight}")
    settings = CrawlSettings(
        schedule_quantity_limitation=20000,
        politeness_per_host_per_wave=50000,
        extract_batch_size=40,
        max_waves=100,
    )

    t0 = time.perf_counter()
    job = CrawlJob(corpus, settings, out, resume=args.resume)
    totals = job.run(max_waves=args.max_waves)
    dt = time.perf_counter() - t0
    aborted = "aborted_wave" in totals
    print(json.dumps({
        "status": "aborted" if aborted else "ok",
        **({"aborted_wave": totals["aborted_wave"]} if aborted else {}),
        "sec": round(dt, 3),
        "scheduled_urls": totals.get("scheduled", 0),
        "waves": totals.get("waves", 0),
        "urls_per_sec": round(totals.get("scheduled", 0) / dt, 1) if dt else 0,
        "resumed_from_wave": job.start_wave,
        "out": out,
    }))
    ray.shutdown()
    return 2 if aborted else 0


if __name__ == "__main__":
    sys.exit(main())
