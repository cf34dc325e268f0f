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
import time as _time

from ..config import CrawlSettings
from ..functions.urls import expand_seed, url_md5, url_tld

__all__ = ["shard_for_domain", "shard_for_url", "run_schedule_wave"]

# NC_PROFILE sub-phase accumulators (read+reset by the crawl loop)
PHASES: dict[str, float] = {}


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
    cast=None,
    submit=None,
    resolve=None,
    submit2=None,
    speculative: bool = False,
    columnar: bool = False,
):
    """One scheduler round.  ``shards[i]`` may be a local
    :class:`FrontierShard` or a Ray actor handle.

    The round is submitted as ONE asynchronous plan and joined once:

    - ``submit(shard, method, *args) -> token`` queues a shard call and
      returns an opaque token; ``resolve(tokens) -> results`` realizes
      them all.  The engine passes Ray ``.remote`` / ``ray.get``.
    - The leftover-carry between consecutive pop runs never touches the
      driver: each run is submitted as ``schedule_pop_run_chained`` with
      the PREVIOUS run's token as an argument (Ray resolves it on the
      receiving shard), so the quota chain is shard-to-shard dataflow
      with no per-run driver round trip.
    - ``cast(requests)`` is the submit-only variant for calls whose
      results are unused (``begin_wave``).

    Ordering semantics are EXACTLY the sequential driver loop's: per
    shard, tasks execute in submission order (Ray actor guarantee /
    immediate execution in the local default), which is the reference's
    serve order; cross-shard state is disjoint (every url lives on one
    shard), so the only cross-shard dependency is the leftover scalar —
    carried by the token chain.  The defaults execute synchronously, so
    the sequential oracle path is byte-identical to before.

    Returns ``scheduled``: ordered list of dicts
    ``{seq, url, urllib, version, referer, drill_relation, wave, retry}``
    — the wave's crawl batch AND the schedule-order parity log.  With
    ``columnar=True`` (the engine's hot path) the same rows come back as
    one dict of parallel column lists (plus scalar ``wave``; ``seq`` is
    the list index) — skipping the 62k-dict materialization the oracle
    and tests still get by default.

    ``speculative=True`` replaces the leftover-chained pop plan — whose
    critical path is one actor hop per run, ~#rules hops per wave —
    with ONE parallel round of per-rule ``schedule_pop(ct_base)`` calls
    plus rare driver-issued "repair" pops, and is byte-identical to the
    chained plan whenever the caller proves politeness can never bind
    (``politeness_per_host_per_wave == 0`` or ≥ the wave's total quota
    bound — the gate in crawl.py).  Why exact:

    - per-rule state (queue, url states) is disjoint, and with
      politeness provably idle there is NO cross-rule shard state, so
      pops commute across rules and only the leftover-carry couples
      them;
    - speculation under-quotes (``left_in=0`` → ct ≤ true quota), so it
      never over-pops — no rollback exists or is needed;
    - ``pop(ct)`` then ``pop(delta)`` ≡ ``pop(ct+delta)`` (the pop loop
      is a pure continuation over queue + url state), so a rule that
      consumed its whole speculative quota is topped up by one repair
      pop for the true carry; a rule that stopped early exhausted its
      queue, and extra quota could not have popped more — its true
      leftover just joins the carry arithmetic on the driver.

    Repairs are issued only for quota-limited rules reached with a
    positive carry; with wave quota sized above the frontier's actual
    yield (the recommended large-cluster setting) they are rare.

    The exactness argument additionally assumes **each url is queued
    under exactly one rule's queue** (repair pops run AFTER later
    rules' speculative pops, so a url_info row shared across two rules
    would see ``_check_url`` outcomes in a different order than the
    chained plan).  This holds by construction: link routing is
    first-match per URL (``_save_link`` routes a url_md5 to the first
    matching urllib key and the seen-filter drops re-routes), and
    ``FrontierShard._save_link`` carries a debug assertion that a
    url_md5 never enters a second queue.

    One coupling survives even one-queue-per-url: ``push_seeds``
    touches url_info rows directly, so on a wave where some rule's
    reSchedule is due, a seed of rule B that detect_link routes to rule
    A's queue would see A's REPAIR pop (which runs after the first
    resolve, i.e. after B's seed push executed on the shard) observe
    the freshly stamped state — a different ``_check_url`` order than
    the chained plan, where A's carry pop precedes B's push.  Seed
    waves are rare (first wave + every ``interval``), so the plan
    DOWNGRADES ITSELF to the exact chained form on any wave with a due
    seed refresh — speculation only ever runs on pop-only waves, where
    the argument above is complete.
    """
    if submit is None:
        def submit(shard, method, *args):
            return getattr(shard, method)(*args)
    if resolve is None:
        def resolve(tokens):
            return list(tokens)
    if submit2 is None:
        # sync default: run now, hand back (rows, left) separately so the
        # chain carries only the scalar (the Ray impl maps this to
        # ``num_returns=2`` — the next shard pulls a few-byte left ref,
        # not the previous run's accepted rows)
        def submit2(shard, method, *args):
            res = submit(shard, method, *args)
            return res[0], res[1]
    if cast is None:
        def cast(requests):
            for sh, m, *a in requests:
                submit(sh, m, *a)

    _p0 = _time.perf_counter()
    num_shards = len(shards)
    version = settings.wave_version(wave)
    now = version
    balance = max(0, settings.schedule_quantity_limitation - backlog_len)
    avg_rate = balance / total_rates if total_rates else 0.0

    cast([(shard, "begin_wave") for shard in shards])

    tokens: list = []

    def _submit(sh, m, *a) -> int:
        tokens.append(submit(sh, m, *a))
        return len(tokens) - 1

    steps: list[tuple] = []
    spec_lefts: list = []  # per-spec-pop few-byte left refs/values

    # seed-refresh waves keep the chained plan (see the docstring's
    # exactness argument: repair pops must not run after a later rule's
    # push_seeds has stamped shared url_info state)
    if speculative and any(
            now - e["first_schedule"] >= e["interval"] * 1000
            for e in priority_entries):
        speculative = False

    # --- T6 retry drain (spider/spider.js:350-362) --------------------
    # retryCrawl re-emits a failed urlinfo straight into the spider's
    # own download queue — it crawls before the next scheduler round's
    # output and consumes no quota.  Wave analog: drain every rule's
    # retry queue first, in serve order, FIFO within a rule.  One
    # batched task per shard, submitted before any pops (per-shard
    # execution order = submission order).
    drain_entries = list(priority_entries)
    drain_tok: dict[str, tuple[int, int]] = {}
    if speculative:
        # --- COMBINED per-shard plan: one schedule_wave_spec RPC per
        # shard carries its drains AND every one of its rule pops (zero
        # assumed carry), replacing ~(#shards drains + #rules pops)
        # actor tasks per wave — the per-task submit/return overhead
        # across ~53 tasks was a measured slice of the schedule join.
        # Per-shard execution order is identical to the per-call plan
        # (drains first, pops in serve order); cross-shard order was
        # already concurrent.  num_returns=2 splits the payload from the
        # few-byte per-rule lefts so repairs submit BEFORE the driver
        # pulls the accepted rows.
        shard_drains: dict[int, list[str]] = {}
        shard_pops: dict[int, list[tuple]] = {}
        pop_pos: dict[str, tuple[int, int]] = {}
        for e in priority_entries:
            k = "urllib:" + e["key"]
            sid = shard_for_domain(e["domain"], num_shards)
            shard_drains.setdefault(sid, []).append(k)
            reqs = shard_pops.setdefault(sid, [])
            pop_pos[k] = (sid, len(reqs))
            reqs.append((k, math.ceil(avg_rate * e["rate"]),
                         e["rule"] == "LIFO", e["interval"]))
        shard_tok: dict[int, int] = {}
        shard_ltok: dict[int, int] = {}
        for sid in sorted(shard_pops):
            payload_tok, lefts_tok = submit2(
                shards[sid], "schedule_wave_spec",
                shard_drains[sid], shard_pops[sid], now)
            tokens.append(payload_tok)
            shard_tok[sid] = len(tokens) - 1
            spec_lefts.append(lefts_tok)
            shard_ltok[sid] = len(spec_lefts) - 1
        for sid, keys in shard_drains.items():
            for pos, k in enumerate(keys):
                drain_tok[k] = (shard_tok[sid], pos)
        if drain_entries:
            steps.append(("drain",))
        for e in priority_entries:
            k = "urllib:" + e["key"]
            sid, pos = pop_pos[k]
            steps.append(("spec", shard_tok[sid], k, sid,
                          e["rule"] == "LIFO", e["interval"],
                          (shard_ltok[sid], pos)))
    elif drain_entries:
        by_shard_keys: dict[int, list[str]] = {}
        for e in drain_entries:
            sid = shard_for_domain(e["domain"], num_shards)
            by_shard_keys.setdefault(sid, []).append("urllib:" + e["key"])
        for sid in sorted(by_shard_keys):
            ti = _submit(shards[sid], "drain_retries_many",
                         by_shard_keys[sid], now)
            for pos, k in enumerate(by_shard_keys[sid]):
                drain_tok[k] = (ti, pos)
        steps.append(("drain",))

    # --- quota pops: runs of consecutive same-shard rules -------------
    prev = 0            # previous run's token (result value or ObjectRef)
    run_sid: int | None = None
    run_reqs: list[tuple] = []
    run_keys: list[str] = []

    def submit_run() -> None:
        nonlocal prev, run_sid, run_reqs, run_keys
        if not run_reqs:
            return
        out_tok, left_tok = submit2(
            shards[run_sid], "schedule_pop_run_chained",
            list(run_reqs), prev, 0, now)
        tokens.append(out_tok)
        steps.append(("pops", len(tokens) - 1, list(run_keys)))
        prev = left_tok
        run_sid, run_reqs, run_keys = None, [], []

    for entry in (() if speculative else priority_entries):
        urllib_key = "urllib:" + entry["key"]
        # --- reSchedule (seed refresh) --------------------------------
        if now - entry["first_schedule"] >= entry["interval"] * 1000:
            submit_run()  # earlier rules' pops precede this on the shard
            links = [link for seed in entry["seed"]
                     for link in expand_seed(seed)]
            # one batched task per shard; the schedule log is rebuilt in
            # original seed order from the returned accept flags, and
            # within-shard push order is preserved — both invariants the
            # sequential oracle checks
            by_shard: dict[int, list[int]] = {}
            for idx, link in enumerate(links):
                by_shard.setdefault(
                    shard_for_url(link, num_shards), []).append(idx)
            seed_parts = []
            for sid, idxs in sorted(by_shard.items()):
                ti = _submit(shards[sid], "push_seeds",
                             [links[i] for i in idxs], version, now)
                seed_parts.append((ti, idxs))
            steps.append(("seeds", urllib_key, links, seed_parts))
            entry["first_schedule"] = version
        # --- doScheduleExt (quota pop) --------------------------------
        ct_base = math.ceil(avg_rate * entry["rate"])
        sid = shard_for_domain(entry["domain"], num_shards)
        lifo = entry["rule"] == "LIFO"
        if run_reqs and sid != run_sid:
            submit_run()
        run_sid = sid
        run_reqs.append((urllib_key, ct_base, lifo, entry["interval"]))
        run_keys.append(urllib_key)
    submit_run()

    _p1 = _time.perf_counter()
    PHASES["sched_submit"] = PHASES.get("sched_submit", 0.0) + (_p1 - _p0)
    # the few-byte left refs resolve as soon as every pop has RUN (both
    # num_returns=2 objects materialize together) — without paying for
    # the accepted-row payload pull, which happens after the repairs
    # are already submitted
    spec_left_vals = resolve(spec_lefts) if spec_lefts else []
    _t_lefts = _time.perf_counter()

    # --- speculative repair plan --------------------------------------
    # Reconstruct the true leftover-carry in serve order.  Rules that
    # stopped early (queue exhausted) contribute their unmet quota as a
    # driver-known int; rules that consumed their whole speculative
    # quota are entitled to the carry and get a "repair" continuation
    # pop.  Repairs chain shard-to-shard through the previous repair's
    # few-byte left ref (``schedule_pop_run_chained`` with ct_base=0,
    # known carry as ``delta``) — no driver round trip per repair, one
    # resolve for all of them.  A repair whose true carry turns out 0
    # degenerates to pop(0): a no-op, so maybe-zero submissions are
    # safe.  (A pre-submitted hop-per-rule chain was tried and measured
    # SLOWER: chain depth grows from the ~2-3 actual repairs to #rules
    # per wave, and at ~10 ms per cross-actor dataflow hop the longer
    # chain costs more than the post-resolve round trip it hides.)
    # Ordering is unchanged by the early submission: lefts-ready ⇒ every
    # speculative pop (and, by per-shard submission order, every drain)
    # has completed, so repairs still run after ALL spec pops.
    # Round-5 pruning: the combined plan also returns each rule's
    # POST-POP queue length.  A repair continuation against an empty
    # queue is a provable no-op — ``schedule_pop`` on an empty deque
    # mutates nothing and returns ([], full quota as left) — so the
    # driver forwards the carry without the RPC hop.  Measured at the
    # bench: 44 of 56 repair hops per run were exactly these
    # pass-throughs (the frontier drains most waves, so the unmet carry
    # snowballed through every later empty rule).  Only rules with rows
    # still queued get a real chained repair.
    repair_for_step: dict[int, int] = {}
    repair_out: list = []
    if speculative:
        carry_known = 0
        pending_left = None  # previous repair's left (token or value)
        for si, step in enumerate(steps):
            if step[0] != "spec":
                continue
            _, ti, urllib_key, sid, lifo, interval, (lj, pos) = step
            lefts_l, qlens_l = spec_left_vals[lj]
            left = lefts_l[pos]
            if left > 0:
                carry_known += left
            elif ((carry_known > 0 or pending_left is not None)
                  and qlens_l[pos] > 0):
                out_tok, left_tok = submit2(
                    shards[sid], "schedule_pop_run_chained",
                    [(urllib_key, 0, lifo, interval)],
                    pending_left if pending_left is not None else 0,
                    carry_known, now)
                repair_for_step[si] = len(repair_out)
                repair_out.append(out_tok)
                pending_left = left_tok
                carry_known = 0
                PHASES["sched_repairs_n"] = (
                    PHASES.get("sched_repairs_n", 0) + 1)
    _t_rsub = _time.perf_counter()
    results = resolve(tokens)
    _t_join2 = _time.perf_counter()
    repair_out = resolve(repair_out) if repair_out else []
    _p3 = _time.perf_counter()
    PHASES["sched_join"] = (PHASES.get("sched_join", 0.0)
                            + (_t_lefts - _p1) + (_t_join2 - _t_rsub))
    PHASES["sched_repair"] = (PHASES.get("sched_repair", 0.0)
                              + (_t_rsub - _t_lefts) + (_p3 - _t_join2))

    # --- emit the schedule log in serve order --------------------------
    # columnar accumulation (6 list appends/row beats a dict alloc — the
    # emit loop measured 0.3 s/wave driver-serial at 62k attempts); the
    # dict rows the oracle/tests consume are materialized once at the end
    c_url: list = []
    c_ulib: list = []
    c_ver: list = []
    c_ref: list = []
    c_rel: list = []
    c_retry: list = []

    def _emit(url, urllib_key, ver, referer, relation, retry):
        c_url.append(url)
        c_ulib.append(urllib_key)
        c_ver.append(ver)
        c_ref.append(referer)
        c_rel.append(relation or "*")
        c_retry.append(retry)

    def _emit_many(cols, urllib_key):
        # bulk path for pop results — already COLUMNAR from the shard
        # (4 parallel lists), so the emit is pure list.extend with no
        # per-row transpose; the emit loop is driver-serial
        u, v, rf, rl = cols
        c_url.extend(u)
        c_ulib.extend([urllib_key] * len(u))
        c_ver.extend(v)
        c_ref.extend(rf)
        c_rel.extend((r or "*") for r in rl)
        c_retry.extend([0] * len(u))

    for si, step in enumerate(steps):
        if step[0] == "drain":
            for e in drain_entries:
                k = "urllib:" + e["key"]
                ti, pos = drain_tok[k]
                # combined spec plan: results[ti] = (drains, accepted)
                rows = (results[ti][0][pos] if speculative
                        else results[ti][pos])
                for url, ver, referer, relation, rcount in rows:
                    _emit(url, k, ver, referer, relation, rcount)
        elif step[0] == "seeds":
            _, urllib_key, links, seed_parts = step
            accepted_flags = [False] * len(links)
            for ti, idxs in seed_parts:
                for i, ok in zip(idxs, results[ti]):
                    accepted_flags[i] = ok
            for link, ok in zip(links, accepted_flags):
                if ok:
                    _emit(link, urllib_key, version, "", "*", 0)
        elif step[0] == "spec":
            _, ti, urllib_key, sid, lifo, interval, (_lj, pos) = step
            accepted = results[ti][1][pos]
            if si in repair_for_step:
                rep = repair_out[repair_for_step[si]][0]
                accepted = tuple(a + b for a, b in zip(accepted, rep))
            if accepted[0]:
                _emit_many(accepted, urllib_key)
        else:
            _, ti, keys = step
            out = results[ti]
            for urllib_key, accepted in zip(keys, out):
                if accepted[0]:
                    _emit_many(accepted, urllib_key)
    if columnar:
        scheduled = {"wave": wave, "url": c_url, "urllib": c_ulib,
                     "version": c_ver, "referer": c_ref,
                     "drill_relation": c_rel, "retry": c_retry}
    else:
        scheduled = [
            {"seq": i, "url": u, "urllib": k, "version": v, "referer": rf,
             "drill_relation": rl, "wave": wave, "retry": rt}
            for i, (u, k, v, rf, rl, rt) in enumerate(
                zip(c_url, c_ulib, c_ver, c_ref, c_rel, c_retry))
        ]
    PHASES["sched_emit"] = (PHASES.get("sched_emit", 0.0)
                            + (_time.perf_counter() - _p3))
    return scheduled
