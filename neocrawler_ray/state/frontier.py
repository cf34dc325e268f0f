"""Frontier shard — the stateful heart of the crawl engine.

One :class:`FrontierShard` owns every URL whose top-level-domain hashes to
it (``md5(tld) % num_shards``) — chosen so the URL-seen check, the
per-(domain,rule) queues, and per-host politeness accounting are all
shard-local (SURVEY.md §4 "work partitioning").  Because a driller rule is
keyed by its domain, each rule's urllib queue lives entirely on one shard.

The shard re-expresses, with exact per-call-site constants, the
reference's Redis-backed state machine:

- per-URL state record keyed by ``md5(url)`` with ``records`` ring of the
  last 3 states (reference: spider/spider.js:380-460,
  scheduler/index.js:417-480);
- scheduler-side admission ``checkURL`` — 60-min crawling/schedule lock,
  ``hit``/``crawled_failure`` bypass (scheduler/index.js:336-410);
- link-save admission — 10-min crawling/schedule lock, 2-day ``hit``
  lock, immediate re-admit of ``crawled_failure``, status→``hit``
  *without* touching ``last`` (spider/pipeline.js:119-193);
- FIFO/LIFO pops per rule's ``schedule_rule`` (scheduler/index.js:219-247);
- the (dormant-in-the-reference) branch-new-version fast path is
  replicated verbatim: ``url_info`` never carries ``type``, so the
  condition never fires — same as the reference (SURVEY.md §2.3 T2).

Plain Python class: unit-testable directly and wrapped via ``ray.remote``
by the crawl pipeline.  All timestamps are logical epoch-millis supplied
by the caller (the wave clock) — never wall clock — so runs are
deterministic and resumable.
"""

from __future__ import annotations

import pickle
from collections import deque

from ..config import CrawlSettings
from ..functions.urls import detect_link, transform_link, url_host, url_md5
from .cuckoo import CuckooFilter


class FrontierShard:
    def __init__(self, shard_id: int, rules: dict, settings: CrawlSettings,
                 seen_capacity: int = 1 << 17):
        self.shard_id = shard_id
        self.rules = rules
        self.settings = settings
        self.url_info: dict[str, dict] = {}
        self.queues: dict[str, deque[str]] = {}
        # T6 retry loop (spider/spider.js:350-372 retryCrawl): failed
        # attempts below download_retry re-enter the NEXT wave directly —
        # (url, retry_count) per rule, bypassing scheduler quota and
        # checkURL exactly as the reference's re-emit into the spider's
        # own download queue does
        self.retry_queues: dict[str, deque[tuple[str, int]]] = {}
        self.seen = CuckooFilter(capacity=seen_capacity, seed=1000 + shard_id)
        # wave link/result buffer: applied in deterministic (seq) order at
        # commit_wave — makes parallel extract order-equivalent to the
        # reference's sequential pipeline.save (SURVEY.md §7.2)
        self._buffer: list[tuple] = []
        # per-wave per-host politeness counters (reset by begin_wave)
        self._host_counts: dict[str, int] = {}
        self.metrics: dict[str, int] = {}
        # cumulative per-method wall seconds (NC_PROFILE diagnostics)
        self.perf: dict[str, float] = {}

    def begin_wave(self) -> None:
        """Reset wave-local politeness budgets (called at each wave start)."""
        self._host_counts = {}

    def update_rules(self, rules: dict) -> bool:
        """T5 hot-reload: swap the rule snapshot (wave-boundary only —
        the shard is quiescent between commit and the next schedule)."""
        self.rules = rules
        return True

    # ------------------------------------------------------------------
    # T6 retry drain — retryCrawl re-emits into the spider's own queue
    # (spider/spider.js:350-362); the wave analog is "first in next wave"
    # ------------------------------------------------------------------
    def drain_retries(self, urllib_key: str, now: int) -> list[tuple]:
        """Pop ALL pending retries for one rule (FIFO).  Returns
        ``(url, version, referer, drill_relation, retry)`` rows; marks
        each picked url ``crawling`` like any scheduled pickup."""
        q = self.retry_queues.get(urllib_key)
        out: list[tuple] = []
        while q:
            url, retry = q.popleft()
            info = self.url_info.get(url_md5(url)) or {}
            out.append(
                (url,
                 int(info.get("version") or 0),
                 info.get("referer", ""),
                 info.get("drill_relation", "*") or "*",
                 retry)
            )
            self.update_link_state(url, "crawling", False, now)
        return out

    def drain_retries_many(self, urllib_keys: list[str],
                           now: int) -> list[list[tuple]]:
        """Batched ``drain_retries`` — one RPC per shard per wave."""
        import time

        _t0 = time.perf_counter()
        out = [self.drain_retries(k, now) for k in urllib_keys]
        self._ptick("drain", _t0)
        return out

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def _rule_for_urllib(self, urllib_key: str) -> dict | None:
        from ..functions.urls import parse_urllib_key

        da = parse_urllib_key(urllib_key)
        if da is None:
            return None
        return (self.rules.get(da[0]) or {}).get(da[1])

    def _bump(self, event: str, n: int = 1) -> None:
        self.metrics[event] = self.metrics.get(event, 0) + n

    # ------------------------------------------------------------------
    # updateLinkState — scheduler/index.js:417-480 & spider/spider.js:380-460
    # ------------------------------------------------------------------
    def update_link_state(self, link: str, state: str, version, now: int,
                          kk: str | None = None) -> bool:
        if kk is None:
            kk = url_md5(link)
        info = self.url_info.get(kk)
        if info is not None:
            records = info.get("records", [])
            records = (records + [state])[-3:]
            info["records"] = records
            info["last"] = now
            info["status"] = state
            if version:
                info["version"] = version
            return True
        urllib_key, _rule = detect_link(link, self.rules)
        if urllib_key is None:
            return False
        info = {
            "url": link,
            "trace": "urllib:" + urllib_key,
            "referer": "",
            "create": now,
            "records": [],
            "last": now,
            "status": state,
        }
        if version:
            info["version"] = version
        self.url_info[kk] = info
        self.seen.add(kk)
        return True

    # ------------------------------------------------------------------
    # seed push — scheduler reSchedule path (scheduler/index.js:163-198):
    # state-stamp then straight onto the scheduled queue (bypasses checkURL)
    # ------------------------------------------------------------------
    def push_seed(self, link: str, version: int, now: int) -> bool:
        ok = self.update_link_state(link, "schedule", version, now)
        if ok:
            self._bump("seed_scheduled")
        return ok

    # ------------------------------------------------------------------
    # checkURL — scheduler/index.js:336-410
    # ------------------------------------------------------------------
    def push_seeds(self, links: list[str], version: int, now: int) -> list[bool]:
        """Batched ``push_seed`` (one RPC per shard per rule instead of one
        per seed) — same per-link semantics and within-shard order.  The
        spider-side ``crawling`` mark (spider/index.js:55-59) is folded in
        for accepted seeds: every scheduled url is picked up this wave, and
        ``schedule``/``crawling`` take the same lock branch in checkURL, so
        admission decisions are unchanged — one RPC replaces two."""
        out = []
        for link in links:
            ok = self.push_seed(link, version, now)
            if ok:
                self.update_link_state(link, "crawling", False, now)
            out.append(ok)
        return out

    def _check_url(self, url: str, interval: int, now: int, _depth: int = 0):
        if _depth > 4:
            return None
        kk = url_md5(url)
        info = self.url_info.get(kk)
        if info is None:
            return None  # 'not exists in urlinfo' → dropped
        trace = info.get("trace")
        if trace:
            rule = self._rule_for_urllib(trace)
            t_url = transform_link(url, rule)
            if t_url != url:
                return self._check_url(t_url, interval, now, _depth + 1)
            if rule is None:
                # stale trace repair (scheduler/index.js:355-370)
                urllib_key, _r = detect_link(url, self.rules)
                if urllib_key is None:
                    return None
                info["trace"] = "urllib:" + urllib_key
                return self._check_url(url, interval, now, _depth + 1)
        status = info.get("status")
        last = int(info.get("last") or 0)
        version = int(info.get("version") or 0)
        type_ = info.get("type")  # never populated — dormant, as in reference
        if status not in ("crawled_failure", "hit"):
            real_interval = interval * 1000
            if status in ("crawling", "schedule"):
                real_interval = self.settings.scheduler_lock_ms
            if status == "crawled_finish" and type_ == "branch" and version > last:
                real_interval = 0
            if now - last < real_interval:
                return None
        if not self.update_link_state(url, "schedule", False, now, kk=kk):
            return None
        return url, kk

    # ------------------------------------------------------------------
    # doScheduleExt pop loop — scheduler/index.js:205-260, plus the wave
    # re-expression of politeness (per-host budget per wave; SURVEY §2.3 T4)
    # ------------------------------------------------------------------
    def schedule_pop(self, urllib_key: str, ct: int, lifo: bool, interval: int,
                     now: int):
        """Pop up to ``ct`` admissible urls from one rule's queue.

        Returns ``(accepted, left)`` where ``accepted`` is COLUMNAR —
        four parallel lists ``(urls, versions, referers, drill_relations)``
        — and ``left`` the unmet quota carried to the next rule
        (leftover-carry parity).  The columnar shape keeps the driver's
        emit loop a plain ``list.extend`` (no per-row tuple transpose) and
        pickles as 4 primitive lists instead of O(rows) tuple objects.
        Urls failing checkURL are dropped from the queue exactly as the
        reference pops-without-requeue does.  When the head url's host has
        exhausted its politeness budget this wave, draining stops and the
        queue keeps its remaining urls (deterministic wave politeness).
        """
        q = self.queues.get(urllib_key)
        a_url: list = []
        a_ver: list = []
        a_ref: list = []
        a_rel: list = []
        count = 0
        budget = self.settings.politeness_per_host_per_wave
        host_budget = self._host_counts
        while q and count < ct:
            head = q[-1] if lifo else q[0]
            if budget > 0:
                host = url_host(head) or ""
                if host_budget.get(host, 0) >= budget:
                    self._bump("politeness_deferred")
                    break
            url = q.pop() if lifo else q.popleft()
            ok_kk = self._check_url(url, interval, now)
            if ok_kk is not None:
                ok, kk = ok_kk
                info = self.url_info[kk]
                a_url.append(ok)
                a_ver.append(int(info.get("version") or 0))
                a_ref.append(info.get("referer", ""))
                a_rel.append(info.get("drill_relation", "*"))
                # spider pickup mark folded into the pop (see push_seeds)
                self.update_link_state(ok, "crawling", False, now, kk=kk)
                count += 1
                h = url_host(ok) or ""
                host_budget[h] = host_budget.get(h, 0) + 1
            else:
                self._bump("check_rejected")
        left = ct - count if count < ct else 0
        return (a_url, a_ver, a_ref, a_rel), left

    def schedule_wave_spec(self, drain_keys: list[str],
                           pop_reqs: list[tuple], now: int):
        """One RPC per shard per SPECULATIVE wave: the retry drains
        followed by every one of this shard's rule pops (zero assumed
        carry), in exactly the order the per-call plan used to submit
        them (drains first, pops in serve order — per-shard actor
        ordering made that sequence; here it's a plain loop).  Collapses
        the ~(1 drain + k pops) actor tasks per shard per wave into one
        — the per-task submit/return overhead across ~53 tasks/wave was
        a measured slice of the schedule join.  Returns
        ``((drain_results, accepted_list), lefts)``: the few-byte
        per-rule lefts ride the second ``num_returns=2`` object so the
        driver plans repairs before pulling the payload."""
        import time

        drains = self.drain_retries_many(drain_keys, now)
        _t0 = time.perf_counter()
        accepted_list: list = []
        lefts: list[int] = []
        qlens: list[int] = []
        for urllib_key, ct, lifo, interval in pop_reqs:
            accepted, left = self.schedule_pop(
                urllib_key, ct, lifo, interval, now)
            accepted_list.append(accepted)
            lefts.append(left)
            # post-pop queue length: lets the driver prove which repair
            # continuations are pure carry pass-throughs (empty queue ⇒
            # pop is a state-free no-op) and skip their RPC hop entirely
            q = self.queues.get(urllib_key)
            qlens.append(len(q) if q else 0)
        self._ptick("pop", _t0)
        return (drains, accepted_list), (lefts, qlens)

    def schedule_pop_run(self, reqs: list[tuple], left_in: int, now: int):
        """A run of consecutive same-shard ``schedule_pop``s in one RPC,
        chaining the leftover-carry exactly as the driver loop would
        (reqs: ``(urllib_key, ct_base, lifo, interval)``)."""
        import time

        _t0 = time.perf_counter()
        out = []
        left = left_in
        for urllib_key, ct_base, lifo, interval in reqs:
            accepted, left = self.schedule_pop(
                urllib_key, ct_base + left, lifo, interval, now)
            out.append(accepted)
        self._ptick("pop", _t0)
        return out, left

    def schedule_pop_run_chained(self, reqs: list[tuple], prev, delta: int,
                                 now: int):
        """``schedule_pop_run`` whose leftover comes from the PREVIOUS
        run's result — a plain value locally, a Ray-resolved ObjectRef
        when the driver submits the whole pop chain without joining
        between runs (the leftover scalar travels shard-to-shard as
        task-argument dataflow), plus ``delta`` quota accumulated
        driver-side for provably-empty rules skipped in between."""
        left_in = (prev[1] if isinstance(prev, (tuple, list))
                   else int(prev)) + delta
        return self.schedule_pop_run(reqs, left_in, now)

    def queue_len(self, urllib_key: str) -> int:
        q = self.queues.get(urllib_key)
        return len(q) if q else 0

    def total_queued(self) -> int:
        return sum(len(q) for q in self.queues.values())

    # ------------------------------------------------------------------
    # wave result buffering + deterministic commit
    # ------------------------------------------------------------------
    def buffer_results(self, rows: list[tuple]) -> int:
        """Buffer per-page wave results for this shard.

        Row: ``(seq, kind, payload)`` where kind is:
        - ``'link'``: payload = (gidx, lidx, urllib_key, dst_url, page_url,
          drill_relation, version)
        - ``'state'``: payload = (page_url, final_state)
        - ``'retry'``: payload = (page_url, urllib_key, next_retry) — a
          sub-limit failed attempt; re-enqueued for the next wave instead
          of a state write (retryCrawl semantics — a page emits either a
          state row or a retry row, never both)
        Applied in (seq, kind-order links-then-state/retry, gidx, lidx)
        order at commit_wave.
        """
        self._buffer.extend(rows)
        return len(self._buffer)

    def _ptick(self, name: str, t0: float) -> float:
        import time

        t1 = time.perf_counter()
        self.perf[name] = self.perf.get(name, 0.0) + (t1 - t0)
        return t1

    def perf_stats(self) -> dict:
        return dict(self.perf)

    def commit_wave(self, now: int) -> dict:
        """Apply buffered link saves + state transitions in deterministic
        order; clears the buffer.  Returns per-event counts."""
        import time

        _t0 = time.perf_counter()
        kind_rank = {"link": 0, "state": 1, "retry": 1}
        self._buffer.sort(
            key=lambda r: (r[0], kind_rank[r[1]], r[2][:2] if r[1] == "link" else ())
        )
        counts = {"links_saved": 0, "links_rejected": 0, "states": 0,
                  "retries_queued": 0}
        for _seq, kind, payload in self._buffer:
            if kind == "link":
                (_g, _l, urllib_key, dst, page_url, drill_relation, version) = payload
                if self._save_link(urllib_key, dst, page_url, drill_relation,
                                   version, now):
                    counts["links_saved"] += 1
                else:
                    counts["links_rejected"] += 1
            elif kind == "retry":
                page_url, urllib_key, next_retry = payload
                self.retry_queues.setdefault(urllib_key, deque()).append(
                    (page_url, next_retry))
                counts["retries_queued"] += 1
            else:
                page_url, final_state = payload
                self.update_link_state(page_url, final_state, False, now)
                counts["states"] += 1
        self._buffer.clear()
        for k, v in counts.items():
            self._bump(k, v)
        self._ptick("commit", _t0)
        return counts

    def commit_wave_and_checkpoint(self, now: int, ckpt_dir: str,
                                   wave: int,
                                   do_ckpt: bool = True) -> dict:
        """Wave barrier with the north_rule's per-partition checkpoint
        written BY THE SHARD (atomic rename) — snapshot bytes never ship
        through the driver.  The snapshot is taken synchronously (state
        is quiescent at the barrier) but the FILE IO runs on a shard-local
        thread so variable disk latency never blocks the next wave's RPCs;
        the driver writes the manifest for wave k only after the k+1
        barrier (or ``finish_checkpoints``) has joined the writer, so a
        manifest never references an unwritten file.  Single-node paths
        here; on a cluster the same call targets shared storage."""
        import os
        import threading

        import time as _time

        counts = self.commit_wave(now)
        _t = _time.perf_counter()
        if not do_ckpt:
            # checkpoint-cadence skip (deployment knob): state still
            # commits; resume replays the uncheckpointed waves
            # deterministically from the last snapshot
            return counts
        blob = self.snapshot()
        _t = self._ptick("snapshot", _t)
        self.finish_checkpoints()  # prior wave durable before this writes
        _t = self._ptick("ckpt_join", _t)

        def _write() -> None:
            d = os.path.join(ckpt_dir, f"shard={self.shard_id}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".wave_{wave}.pkl.tmp")
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, os.path.join(d, f"wave_{wave}.pkl"))

        t = threading.Thread(target=_write, daemon=True)
        t.start()
        self._ckpt_thread = t
        return counts

    def finish_checkpoints(self) -> bool:
        """Join the in-flight checkpoint write (durability barrier)."""
        t = getattr(self, "_ckpt_thread", None)
        if t is not None:
            t.join()
            self._ckpt_thread = None
        return True

    # ------------------------------------------------------------------
    # save_links single-link admission — spider/pipeline.js:119-193
    # ------------------------------------------------------------------
    def _save_link(self, urllib_key: str, link: str, page_url: str,
                   drill_relation: str, version: int, now: int) -> bool:
        rule = self._rule_for_urllib(urllib_key)
        if rule is None:
            return False
        final_link = transform_link(link, rule)
        kk = url_md5(final_link)
        info = self.url_info.get(kk)
        if info is not None:
            validate = True
            status = info.get("status")
            last = int(info.get("last") or 0)
            t_version = info.get("version")
            type_ = info.get("type")  # dormant, as in reference
            if status != "crawled_failure":
                real_interval = int(rule.get("schedule_interval", 3600)) * 1000
                if status in ("crawling", "schedule"):
                    real_interval = self.settings.linksave_lock_ms
                if status == "hit":
                    real_interval = self.settings.linksave_hit_lock_ms
                if (status == "crawled_finish" and type_ == "branch"
                        and version > last):
                    real_interval = 0
                if now - last < real_interval:
                    validate = False
            if validate:
                info["status"] = "hit"  # note: 'last' NOT updated (parity)
            if t_version is None or version > int(t_version):
                info["version"] = version
        else:
            info = {
                "url": link,  # original link (pre-transform), as in reference
                "version": version,
                "trace": urllib_key,
                "referer": page_url,
                "create": now,
                "records": [],
                "last": now,
                "status": "hit",
            }
            if self.settings.keep_link_relation:
                info["drill_relation"] = drill_relation or "*"
            self.url_info[kk] = info
            self.seen.add(kk)
            validate = True
        if validate:
            # speculative-scheduler exactness guard (scheduler.py
            # run_schedule_wave docstring): every url must be reachable
            # from exactly ONE rule's queue.  Link routing is first-match
            # per URL so this holds by construction — EXCEPT after a T5
            # rules hot-reload reroutes an existing url to a different
            # rule, which is legitimate (and tolerated by the reference's
            # scheduler), so a mismatch is counted, not asserted: the
            # re-queued url sits in only the NEW rule's queue (its old
            # entry was consumed, and schedule/crawling lock states block
            # re-queue while one is pending), so spec-pop disjointness
            # still holds; the counter makes any other source of
            # multi-rule traffic visible in stats() instead of killing
            # the actor mid-commit.
            if info.get("trace") != urllib_key:
                self._bump("trace_reroutes", 1)
            self.queues.setdefault(urllib_key, deque()).append(final_link)
        return validate

    # ------------------------------------------------------------------
    # spider-side state marks (spider/index.js:55-59, :80)
    # ------------------------------------------------------------------
    def mark_states(self, urls: list[str], state: str, now: int) -> int:
        n = 0
        for u in urls:
            if self.update_link_state(u, state, False, now):
                n += 1
        return n

    # ------------------------------------------------------------------
    # introspection / reports
    # ------------------------------------------------------------------
    def spill_cold_state(self, now: int, keep_ms: int,
                         spill_dir: str | None = None) -> int:
        """10^10-frontier memory bound: evict rich per-URL state for
        quiescent urls, keeping only cuckoo membership.

        An entry is cold when its terminal state (``crawled_finish`` /
        ``crawled_failure``) is older than ``keep_ms`` — i.e. every
        policy decision the frontier could make for it (interval
        recrawl, lock expiry; T2 constants) would be "re-admit" anyway,
        so dropping the rich record and letting a future re-discovery
        re-admit it through the brand-new-url path is policy-equivalent.
        The cuckoo filter still answers "seen" forever (the north_rule's
        membership structure); evicted rows optionally land in a
        per-shard Parquet spill for lineage.  Returns #evicted."""
        import pyarrow as pa
        import pyarrow.parquet as pq_
        import os

        # policy-equivalence guard: an entry is only droppable once EVERY
        # decision the frontier could make for it is "re-admit" — so the
        # effective keep window is clamped per entry to at least the
        # rule's recrawl interval and the 2-day linksave hit lock (an
        # early-evicted crawled_finish url re-discovered before its
        # interval would otherwise recrawl via the brand-new-url path)
        hit_lock = self.settings.linksave_hit_lock_ms
        interval_cache: dict[str, int] = {}

        def _keep_for(info: dict) -> int:
            trace = info.get("trace") or ""
            keep = interval_cache.get(trace)
            if keep is None:
                rule = self._rule_for_urllib(trace) or {}
                keep = max(keep_ms,
                           int(rule.get("schedule_interval", 3600)) * 1000,
                           hit_lock)
                interval_cache[trace] = keep
            return keep

        cold = [
            kk for kk, info in self.url_info.items()
            if info.get("status") in ("crawled_finish", "crawled_failure")
            and now - int(info.get("last") or 0) >= _keep_for(info)
        ]
        if spill_dir and cold:
            os.makedirs(spill_dir, exist_ok=True)
            rows = [
                {"url_md5": kk, "url": self.url_info[kk].get("url") or "",
                 "status": self.url_info[kk].get("status") or "",
                 "last": int(self.url_info[kk].get("last") or 0)}
                for kk in cold
            ]
            pq_.write_table(
                pa.Table.from_pylist(rows),
                os.path.join(spill_dir,
                             f"shard={self.shard_id}-spill-{now}.parquet"),
            )
        for kk in cold:
            del self.url_info[kk]
        self._bump("state_spilled", len(cold))
        return len(cold)

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "urls_seen": len(self.url_info),
            "queued": self.total_queued(),
            "queue_keys": {k: len(v) for k, v in self.queues.items() if v},
            **self.metrics,
        }

    def seen_table(self) -> list[tuple[str, str]]:
        """(url_md5, url) rows — the exact URL-seen set for parity tests."""
        return [(kk, info["url"]) for kk, info in self.url_info.items()]

    def write_seen(self, seen_dir: str) -> int:
        """Write this shard's URL-seen partition (md5-sorted) directly —
        the 10^10-URL finalize never ships seen sets through the driver."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq_

        rows = sorted(self.seen_table())
        tbl = pa.Table.from_pydict(
            {"url_md5": [r[0] for r in rows], "url": [r[1] for r in rows]},
            schema=pa.schema([("url_md5", pa.string()), ("url", pa.string())]),
        )
        os.makedirs(seen_dir, exist_ok=True)
        pq_.write_table(
            tbl, os.path.join(seen_dir, f"shard={self.shard_id}.parquet"))
        return tbl.num_rows

    def dump_states(self) -> list[dict]:
        return [
            {"url_md5": kk, **{f: info.get(f) for f in
                               ("url", "trace", "status", "version", "last",
                                "referer", "drill_relation")}}
            for kk, info in self.url_info.items()
        ]

    # ------------------------------------------------------------------
    # checkpoint — north_rule: per-partition snapshot, exact resume
    # ------------------------------------------------------------------
    def snapshot(self) -> bytes:
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "url_info": self.url_info,
                "queues": {k: list(v) for k, v in self.queues.items()},
                "retry_queues": {k: list(v)
                                 for k, v in self.retry_queues.items()},
                "seen": self.seen.to_bytes(),
                "metrics": self.metrics,
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    def restore(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        self.shard_id = d["shard_id"]
        self.url_info = d["url_info"]
        self.queues = {k: deque(v) for k, v in d["queues"].items()}
        self.retry_queues = {
            k: deque(tuple(x) for x in v)
            for k, v in d.get("retry_queues", {}).items()}
        self.seen = CuckooFilter.from_bytes(d["seen"])
        self.metrics = d["metrics"]
        self._buffer = []
