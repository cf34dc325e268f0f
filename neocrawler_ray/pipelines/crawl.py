"""Crawl job — the wave loop tying scheduler, fetch-sim, extract and the
frontier actor pool together (the new-engine lifecycle of SURVEY.md §3).

Each wave is one Ray Data pipeline::

    scheduled batch (from frontier pops, deterministic order)
      → ray.data.from_arrow(blocks)
      → map_batches(FetchSim,  concurrency=F)   # actor pool, robots + lookup
      → map_batches(ExtractBatch, concurrency=E) # actor pool, rules broadcast
      → materialize (wave-sized, quota-bounded) → write wave Parquet

Link discovery flows back into the frontier shards during the extract
stage (seq-tagged buffers) and is applied in deterministic order by
``commit_wave`` — making the parallel run order-equivalent to the
reference's sequential scheduler+spider (parity target: schedule order +
URL-seen set, SURVEY.md §2.9).

Checkpoint/resume (north_rule): after every wave each shard snapshots
(cuckoo bytes + queues + url state + metrics) to
``ckpt/shard={i}/wave_{k}.pkl``; the driver writes an atomic manifest with
the rule ``first_schedule`` clocks.  ``resume=True`` restores the latest
complete wave and continues — waves already written are skipped (their
Parquet output is the resumable unit).
"""

from __future__ import annotations

import json
import os
import pickle

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlSettings, RuleSet
from ..stages.extract_stage import extract_batch_task
from ..stages.fetch import build_robots_map, fetch_sim_batch
from ..state.frontier import FrontierShard
from .scheduler import run_schedule_wave, shard_for_url

SCHED_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("wave", pa.int32()),
        ("url", pa.string()),
        ("urllib", pa.string()),
        ("version", pa.int64()),
        ("referer", pa.string()),
        ("drill_relation", pa.string()),
    ]
)


def _scheduled_to_table(scheduled: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(
        [
            {
                "seq": s["seq"],
                "wave": s["wave"],
                "url": s["url"],
                "urllib": s["urllib"],
                "version": int(s["version"]),
                "referer": s.get("referer") or "",
                "drill_relation": s.get("drill_relation") or "*",
            }
            for s in scheduled
        ],
        schema=SCHED_SCHEMA,
    )


class CrawlJob:
    def __init__(self, corpus_dir: str, settings: CrawlSettings,
                 out_dir: str, resume: bool = False, plugin=None):
        import ray

        self.corpus_dir = corpus_dir
        self.settings = settings
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

        with open(os.path.join(corpus_dir, "rules.json")) as f:
            self.rules = json.load(f)
        with open(os.path.join(corpus_dir, "meta.json")) as f:
            self.corpus_meta = json.load(f)
        self.ruleset = RuleSet(self.rules)
        self.entries = self.ruleset.priority_list(settings.max_weight)
        self.total_rates = sum(e["rate"] for e in self.entries)

        S = settings.num_frontier_shards
        RemoteShard = ray.remote(FrontierShard)
        self.shards = [
            RemoteShard.options(max_restarts=2).remote(i, self.rules, settings)
            for i in range(S)
        ]
        self.robots_ref = ray.put(build_robots_map(corpus_dir))
        self.rules_ref = ray.put(self.rules)
        self.run_token = f"{os.getpid()}-{id(self)}"

        # spider_extend surface (SURVEY.md §2.10): assembly runs once on
        # the driver (spider/index.js:43); batch hooks ride into the actors
        self.plugin = plugin
        if plugin is not None:
            plugin.assembly({"corpus_dir": corpus_dir, "out_dir": out_dir})

        self.start_wave = 0
        if resume:
            self.start_wave = self._restore_checkpoint()

    # ------------------------------------------------------------------
    def _call(self, shard, method, *args):
        import ray

        return ray.get(getattr(shard, method).remote(*args))

    # --- checkpoint -----------------------------------------------------
    @property
    def ckpt_dir(self) -> str:
        return self.settings.checkpoint_dir or os.path.join(self.out_dir, "ckpt")

    def _write_checkpoint(self, wave: int) -> None:
        import ray

        blobs = ray.get([s.snapshot.remote() for s in self.shards])
        for i, blob in enumerate(blobs):
            d = os.path.join(self.ckpt_dir, f"shard={i}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".wave_{wave}.pkl.tmp")
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, os.path.join(d, f"wave_{wave}.pkl"))
        manifest = {
            "last_complete_wave": wave,
            "first_schedule": {e["key"]: e["first_schedule"] for e in self.entries},
            "num_shards": len(self.shards),
        }
        tmp = os.path.join(self.ckpt_dir, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.ckpt_dir, "manifest.json"))

    def _restore_checkpoint(self) -> int:
        import ray

        path = os.path.join(self.ckpt_dir, "manifest.json")
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            manifest = json.load(f)
        wave = manifest["last_complete_wave"]
        futures = []
        for i, shard in enumerate(self.shards):
            p = os.path.join(self.ckpt_dir, f"shard={i}", f"wave_{wave}.pkl")
            with open(p, "rb") as f:
                futures.append(shard.restore.remote(f.read()))
        ray.get(futures)
        for e in self.entries:
            e["first_schedule"] = manifest["first_schedule"].get(e["key"], 0)
        return wave + 1

    # ------------------------------------------------------------------
    def run(self, max_waves: int | None = None) -> dict:
        """Run the wave loop until the frontier drains (or max_waves).

        Returns summary metrics.  Wave outputs land in
        ``out/extracted/wave={k}/`` and ``out/schedule/wave={k}.parquet``.
        """
        import ray

        s = self.settings
        max_waves = max_waves if max_waves is not None else s.max_waves
        pages_shards = self.corpus_meta.get("pages_shards", 16)
        totals: dict[str, int] = {}
        wave = self.start_wave

        while wave < max_waves:
            scheduled = run_schedule_wave(
                wave, self.entries, self.total_rates, self.shards, s,
                backlog_len=0, call=self._call,
            )
            if not scheduled:
                break
            version = s.wave_version(wave)

            # spider marks 'crawling' on queue pickup (spider/index.js:55-59)
            by_shard: dict[int, list[str]] = {}
            for row in scheduled:
                by_shard.setdefault(
                    shard_for_url(row["url"], len(self.shards)), []
                ).append(row["url"])
            ray.get(
                [
                    self.shards[sid].mark_states.remote(urls, "crawling", version)
                    for sid, urls in by_shard.items()
                ]
            )

            # schedule-order log (parity artifact + resumable output unit)
            sched_tbl = _scheduled_to_table(scheduled)
            sdir = os.path.join(self.out_dir, "schedule")
            os.makedirs(sdir, exist_ok=True)
            pq.write_table(sched_tbl, os.path.join(sdir, f"wave_{wave}.parquet"))

            # ---- the wave pipeline --------------------------------------
            n = sched_tbl.num_rows
            target_blocks = max(1, min(s.fetch_concurrency * 4,
                                       (n + s.extract_batch_size - 1)
                                       // s.extract_batch_size))
            chunk = (n + target_blocks - 1) // target_blocks
            blocks = [sched_tbl.slice(i, chunk) for i in range(0, n, chunk)]
            ds = ray.data.from_arrow(blocks)
            # task-mode stages with worker-global singletons: worker
            # processes (and their pages-partition / compiled-rules
            # caches) persist across waves, unlike per-wave actor pools
            ds = ds.map_batches(
                fetch_sim_batch,
                fn_kwargs=dict(
                    run_token=self.run_token,
                    corpus_dir=self.corpus_dir,
                    robots_map=self.robots_ref,
                    pages_shards=pages_shards,
                    plugin=self.plugin,
                ),
                batch_format="pyarrow",
                batch_size=s.extract_batch_size,
            )
            ds = ds.map_batches(
                extract_batch_task,
                fn_kwargs=dict(
                    run_token=self.run_token,
                    rules_ref=self.rules_ref,
                    settings=s,
                    frontier_shards=self.shards,
                    plugin=self.plugin,
                ),
                batch_format="pyarrow",
                batch_size=s.extract_batch_size,
            )
            mat = ds.materialize()  # wave-sized (quota-bounded): safe to pin
            mat.write_parquet(os.path.join(self.out_dir, "extracted", f"wave={wave}"))
            if self.plugin is not None:
                # pipeline.js:573-575 sink hook, driver-side per wave
                for b in mat.iter_batches(batch_format="pyarrow"):
                    self.plugin.sink_batch(b)
                self.plugin.alert("crawl_finish_alert", {"wave": wave, "n": n})

            # ---- deterministic frontier commit + checkpoint -------------
            counts = ray.get(
                [shard.commit_wave.remote(version) for shard in self.shards]
            )
            for c in counts:
                for k, v in c.items():
                    totals[k] = totals.get(k, 0) + v
            totals["scheduled"] = totals.get("scheduled", 0) + n
            self._write_checkpoint(wave)
            wave += 1

        totals["waves"] = wave
        self._finalize(totals)
        return totals

    # ------------------------------------------------------------------
    def _finalize(self, totals: dict) -> None:
        import ray

        # URL-seen set (parity artifact)
        rows = ray.get([s.seen_table.remote() for s in self.shards])
        seen = [
            {"url_md5": kk, "url": u} for shard_rows in rows for kk, u in shard_rows
        ]
        seen.sort(key=lambda r: r["url_md5"])
        tbl = pa.Table.from_pylist(
            seen, schema=pa.schema([("url_md5", pa.string()), ("url", pa.string())])
        )
        pq.write_table(tbl, os.path.join(self.out_dir, "url_seen.parquet"))
        stats = ray.get([s.stats.remote() for s in self.shards])
        with open(os.path.join(self.out_dir, "metrics.json"), "w") as f:
            json.dump({"totals": totals, "shards": stats}, f, indent=1, default=str)
