"""Scheduling wave — the reference's SuperScheduler round, driver-side.

Re-expresses scheduler/index.js:124-260 (``doSchedule`` →
``reSchedule``/``doScheduleExt``) as one deterministic, sequential quota
loop per wave.  The loop itself is O(#rules) and cheap; all heavy work
(queue pops, admission checks) happens inside the frontier shards.
Keeping the quota computation sequential on the driver preserves the
reference's single-scheduler total order of scheduling decisions
(README.md:130, SURVEY.md §2.9) — the parity target.

Quota parity (scheduler/index.js:88, 124-157, 205-260):
- ``rate = (max_weight + weight) / priority`` per rule;
- ``balance = schedule_quantity_limitation - backlog``; ``avg = balance /
  total_rates``;
- rules served sorted by rate desc; per rule ``ct = ceil(avg*rate) +
  leftover``; unmet quota carries to the next rule;
- a rule re-seeds when ``now - first_schedule >= interval*1000``; seed
  urls are state-stamped and enter the wave directly (bypassing checkURL),
  exactly like ``reSchedule``'s direct rpush.
"""

from __future__ import annotations

import math

from ..config import CrawlSettings
from ..functions.urls import expand_seed, url_md5, url_tld

__all__ = ["shard_for_domain", "shard_for_url", "run_schedule_wave"]


def shard_for_domain(domain: str, num_shards: int) -> int:
    return int(url_md5(domain)[:8], 16) % num_shards


def shard_for_url(url: str, num_shards: int) -> int:
    tld = url_tld(url) or ""
    return shard_for_domain(tld, num_shards)


def run_schedule_wave(
    wave: int,
    priority_entries: list[dict],
    total_rates: float,
    shards: list,
    settings: CrawlSettings,
    backlog_len: int = 0,
    call=None,
    queue_lens: dict | None = None,
    retry_lens: dict | None = None,
    calls=None,
    cast=None,
):
    """One scheduler round.  ``shards[i]`` may be a local
    :class:`FrontierShard` or a Ray actor handle — pass ``call`` to invoke
    remotely (``call(shard, method, *args) -> result``); defaults to direct
    method calls.  ``calls(requests)`` (optional) evaluates a batch of
    ``(shard, method, *args)`` requests whose results are ORDER-INDEPENDENT
    (begin_wave resets, per-shard seed pushes, per-shard retry drains) —
    the engine passes a parallel ``ray.get``-on-futures implementation so
    these don't pay one round trip per shard; semantics are identical to
    the sequential default.  ``cast(requests)`` (optional) is the
    submit-only variant for calls whose RESULTS are unused
    (``begin_wave``): the engine submits the actor tasks without joining
    them — Ray actors run one caller's tasks in submission order, so a
    later drain/pop on the same shard still happens-after its
    begin_wave (and after the previous wave's still-in-flight commit,
    which is what lets the commit barrier overlap this schedule).

    Returns ``scheduled``: ordered list of dicts
    ``{seq, url, urllib, version, referer, drill_relation, wave}`` — the
    wave's crawl batch AND the schedule-order parity log.
    """
    if call is None:
        def call(shard, method, *args):
            return getattr(shard, method)(*args)
    if calls is None:
        def calls(requests):
            return [call(sh, m, *a) for sh, m, *a in requests]
    if cast is None:
        cast = calls

    num_shards = len(shards)
    version = settings.wave_version(wave)
    now = version
    balance = max(0, settings.schedule_quantity_limitation - backlog_len)
    avg_rate = balance / total_rates if total_rates else 0.0

    scheduled: list[dict] = []
    left = 0
    cast([(shard, "begin_wave") for shard in shards])

    # --- T6 retry drain (spider/spider.js:350-362) --------------------
    # retryCrawl re-emits a failed urlinfo straight into the spider's
    # own download queue — it crawls before the next scheduler round's
    # output and consumes no quota.  Wave analog: drain every rule's
    # retry queue first, in serve order, FIFO within a rule.  RPCs are
    # batched one-per-shard and run in parallel; rows are emitted in
    # entry serve order regardless of RPC completion order.
    drain_entries = [
        e for e in priority_entries
        if retry_lens is None or retry_lens.get("urllib:" + e["key"])
    ]
    if drain_entries:
        by_shard_keys: dict[int, list[str]] = {}
        for e in drain_entries:
            sid = shard_for_domain(e["domain"], num_shards)
            by_shard_keys.setdefault(sid, []).append("urllib:" + e["key"])
        sids = sorted(by_shard_keys)
        results = calls([(shards[sid], "drain_retries_many",
                          by_shard_keys[sid], now) for sid in sids])
        drained = {
            k: rows
            for sid, res in zip(sids, results)
            for k, rows in zip(by_shard_keys[sid], res)
        }
        for e in drain_entries:
            urllib_key = "urllib:" + e["key"]
            for url, ver, referer, relation, rcount in drained[urllib_key]:
                scheduled.append(
                    {
                        "seq": len(scheduled),
                        "url": url,
                        "urllib": urllib_key,
                        "version": ver,
                        "referer": referer,
                        "drill_relation": relation or "*",
                        "wave": wave,
                        "retry": rcount,
                    }
                )

    def flush_run(run_sid, run_reqs, run_keys, left_in):
        """One RPC for a run of consecutive same-shard pops (the shard
        chains the leftover-carry internally — exact driver-loop
        semantics, O(#shard-changes) round trips instead of O(#rules))."""
        results, left_out = call(shards[run_sid], "schedule_pop_run",
                                 run_reqs, left_in, now)
        for urllib_key, accepted in zip(run_keys, results):
            for url, ver, referer, drill_relation in accepted:
                scheduled.append(
                    {
                        "seq": len(scheduled),
                        "url": url,
                        "urllib": urllib_key,
                        "version": ver,
                        "referer": referer,
                        "drill_relation": drill_relation or "*",
                        "wave": wave,
                        "retry": 0,
                    }
                )
        return left_out

    run_sid, run_reqs, run_keys = None, [], []
    for entry in priority_entries:
        urllib_key = "urllib:" + entry["key"]
        # --- reSchedule (seed refresh) --------------------------------
        if now - entry["first_schedule"] >= entry["interval"] * 1000:
            if run_reqs:
                left = flush_run(run_sid, run_reqs, run_keys, left)
                run_sid, run_reqs, run_keys = None, [], []
            links = [link for seed in entry["seed"]
                     for link in expand_seed(seed)]
            # one batched RPC per shard; the schedule log is rebuilt in
            # original seed order from the returned accept flags, and
            # within-shard push order is preserved — both invariants the
            # sequential oracle checks
            by_shard: dict[int, list[int]] = {}
            for idx, link in enumerate(links):
                by_shard.setdefault(shard_for_url(link, num_shards), []).append(idx)
            accepted_flags = [False] * len(links)
            items = sorted(by_shard.items())
            flag_lists = calls([
                (shards[sid], "push_seeds", [links[i] for i in idxs],
                 version, now)
                for sid, idxs in items
            ])
            for (sid, idxs), flags in zip(items, flag_lists):
                for i, ok in zip(idxs, flags):
                    accepted_flags[i] = ok
            for link, ok in zip(links, accepted_flags):
                if ok:
                    scheduled.append(
                        {
                            "seq": len(scheduled),
                            "url": link,
                            "urllib": urllib_key,
                            "version": version,
                            "referer": "",
                            "drill_relation": "*",
                            "wave": wave,
                            "retry": 0,
                        }
                    )
            entry["first_schedule"] = version
        # --- doScheduleExt (quota pop) --------------------------------
        ct_base = math.ceil(avg_rate * entry["rate"])
        sid = shard_for_domain(entry["domain"], num_shards)
        if queue_lens is not None and not queue_lens.get(urllib_key):
            # provably-empty queue (post-commit length): the pop would
            # accept nothing and carry the full quota — but any pending
            # same-shard run must flush first to keep the chain exact
            if run_reqs:
                left = flush_run(run_sid, run_reqs, run_keys, left)
                run_sid, run_reqs, run_keys = None, [], []
            left += ct_base
            continue
        if run_reqs and sid != run_sid:
            left = flush_run(run_sid, run_reqs, run_keys, left)
            run_sid, run_reqs, run_keys = None, [], []
        run_sid = sid
        run_reqs.append(
            (urllib_key, ct_base, entry["rule"] == "LIFO", entry["interval"]))
        run_keys.append(urllib_key)
    if run_reqs:
        flush_run(run_sid, run_reqs, run_keys, left)
    return scheduled
