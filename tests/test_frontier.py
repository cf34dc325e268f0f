"""Unit tests: cuckoo filter, frontier policies (per-call-site lock
constants, FIXTURES.md §5), weighted quota + leftover carry, FIFO/LIFO,
politeness, snapshot/restore."""

from neocrawler_ray.config import CrawlSettings, RuleSet
from neocrawler_ray.functions.urls import url_md5
from neocrawler_ray.pipelines.scheduler import run_schedule_wave
from neocrawler_ray.state.cuckoo import CuckooFilter
from neocrawler_ray.state.frontier import FrontierShard

DOMAIN = "site0.example"
RULES = {
    DOMAIN: {
        "list": {
            "domain": DOMAIN, "alias": "list",
            "url_pattern": r"^http://www\.site0\.example/list_\d+",
            "type": "branch", "id_parameter": [], "schedule_interval": 3600,
            "schedule_rule": "FIFO", "priority": 1, "weight": 10,
            "seed": ["http://www.site0.example/list_#.html#1#3#1"],
            "active": True,
        },
        "detail": {
            "domain": DOMAIN, "alias": "detail",
            "url_pattern": r"^http://www\.site0\.example/item_\d+",
            "type": "node", "id_parameter": ["id"], "schedule_interval": 3600,
            "schedule_rule": "FIFO", "priority": 2, "weight": 0, "seed": [],
            "active": True,
        },
    }
}


def mk_shard(**kw):
    settings = CrawlSettings(**kw)
    return FrontierShard(0, RULES, settings), settings


# --------------------------- cuckoo ---------------------------------------
def test_cuckoo_basic_and_snapshot():
    cf = CuckooFilter(capacity=4096, seed=3)
    keys = [f"url-{i}" for i in range(3000)]
    for k in keys:
        cf.add(k)
    assert all(k in cf for k in keys)
    # false-positive rate sane on unseen keys
    fp = sum(f"other-{i}" in cf for i in range(3000))
    assert fp < 60  # 16-bit fingerprints → ~<<2% expected
    blob = cf.to_bytes()
    cf2 = CuckooFilter.from_bytes(blob)
    assert all(k in cf2 for k in keys)
    assert len(cf2) == len(cf)


def test_cuckoo_overflow_spills_exactly():
    cf = CuckooFilter(capacity=64, seed=3)
    keys = [f"k{i}" for i in range(400)]  # way past capacity
    for k in keys:
        cf.add(k)
    assert all(k in cf for k in keys)  # spill set guarantees no false negatives


# --------------------------- link-save policy -----------------------------
URLLIB = f"urllib:driller:{DOMAIN}:detail"
LINK = "http://www.site0.example/item_1?id=1"


def _save(shard, now, version=1, link=LINK):
    return shard._save_link(URLLIB, link, "http://ref", "*", version, now)


def test_save_link_new_and_hit_lock():
    shard, s = mk_shard()
    assert _save(shard, now=1000)
    assert shard.queue_len(URLLIB) == 1
    info = shard.url_info[url_md5(LINK)]
    assert info["status"] == "hit" and info["last"] == 1000
    # re-save within 2-day hit lock → rejected (pipeline.js:141-143)
    assert not _save(shard, now=1000 + s.linksave_hit_lock_ms - 1)
    assert shard.queue_len(URLLIB) == 1
    # after the lock expires → admitted again
    assert _save(shard, now=1000 + s.linksave_hit_lock_ms)
    assert shard.queue_len(URLLIB) == 2


def test_save_link_crawling_10min_lock_and_failure_readmit():
    shard, s = mk_shard()
    _save(shard, now=0)
    info = shard.url_info[url_md5(LINK)]
    info["status"] = "crawling"
    info["last"] = 0
    # within 10-min link-save lock (pipeline.js:138-140) → rejected
    assert not _save(shard, now=s.linksave_lock_ms - 1)
    # after → admitted
    assert _save(shard, now=s.linksave_lock_ms)
    # crawled_failure → re-admitted immediately (pipeline.js:135 guard)
    info["status"] = "crawled_failure"
    info["last"] = 10**12
    assert _save(shard, now=10**12 + 1)


def test_save_link_tolerates_hot_reload_reroute():
    """A T5 rules hot-reload can legitimately reroute an existing url to
    a different rule (url_pattern change) while its stored trace still
    points at the old rule; _save_link must queue it under the NEW key
    and count the reroute, not crash the actor (round-4 review)."""
    shard, s = mk_shard()
    _save(shard, now=0)
    info = shard.url_info[url_md5(LINK)]
    assert info["trace"] == URLLIB
    # url finished a failed crawl → re-admittable immediately
    info["status"] = "crawled_failure"
    info["last"] = 10**12
    other = f"urllib:driller:{DOMAIN}:list"
    assert shard._save_link(other, LINK, "http://ref/", "*", 2, 10**12 + 1)
    assert shard.queue_len(other) == 1
    assert shard.stats().get("trace_reroutes") == 1


def test_save_link_id_parameter_canonicalization():
    shard, _ = mk_shard()
    assert _save(shard, 0, link="http://www.site0.example/item_2?id=2&utm=x")
    assert shard.queues[URLLIB][-1] == "http://www.site0.example/item_2?id=2"
    # canonical dup → same record, hit-locked
    assert not _save(shard, 1, link="http://www.site0.example/item_2?id=2&utm=y")


def test_save_link_version_semantics():
    shard, _ = mk_shard()
    _save(shard, 0, version=5)
    info = shard.url_info[url_md5(LINK)]
    assert info["version"] == 5
    _save(shard, 1, version=3)  # older version → kept
    assert info["version"] == 5
    _save(shard, 2, version=9)  # newer → bumped even when hit-locked
    assert info["version"] == 9


# --------------------------- checkURL / schedule_pop ----------------------
def test_schedule_pop_60min_lock_and_hit_bypass():
    shard, s = mk_shard()
    _save(shard, now=0)
    # status 'hit' bypasses the interval check (scheduler/index.js:379)
    acc, left = shard.schedule_pop(URLLIB, 5, False, 3600, now=1)
    assert acc[0] == [LINK] and left == 4
    info = shard.url_info[url_md5(LINK)]
    # pop folds the spider pickup mark (spider/index.js:55-59) in — the url
    # leaves the pop already 'crawling'; both states hit the same 60-min
    # scheduler lock branch (scheduler/index.js:381-383)
    assert info["status"] == "crawling"
    # re-queue while locked: 60-min scheduler lock
    shard.queues.setdefault(URLLIB, __import__("collections").deque()).append(LINK)
    acc, _ = shard.schedule_pop(URLLIB, 5, False, 3600, now=1 + s.scheduler_lock_ms - 1)
    assert acc[0] == []  # dropped, not re-queued (pop-without-requeue parity)
    assert shard.queue_len(URLLIB) == 0


def test_schedule_pop_crawled_finish_interval():
    shard, _ = mk_shard()
    _save(shard, now=0)
    info = shard.url_info[url_md5(LINK)]
    info["status"] = "crawled_finish"
    info["last"] = 0
    from collections import deque
    shard.queues[URLLIB] = deque([LINK])
    # within rule schedule_interval → dropped
    acc, _ = shard.schedule_pop(URLLIB, 5, False, 3600, now=3600 * 1000 - 1)
    assert acc[0] == []
    shard.queues[URLLIB] = deque([LINK])
    acc, _ = shard.schedule_pop(URLLIB, 5, False, 3600, now=3600 * 1000)
    assert acc[0] == [LINK]


def test_schedule_pop_fifo_lifo_and_politeness():
    shard, _ = mk_shard(politeness_per_host_per_wave=2)
    shard.begin_wave()
    urls = [f"http://www.site0.example/item_{i}?id={i}" for i in range(5)]
    for i, u in enumerate(urls):
        shard._save_link(URLLIB, u, "http://ref", "*", 1, now=i)
    # FIFO pop, politeness budget 2/host/wave → only 2 accepted, rest kept
    acc, left = shard.schedule_pop(URLLIB, 10, False, 3600, now=100)
    assert acc[0] == urls[:2]
    assert left == 8
    assert shard.queue_len(URLLIB) == 3
    # next wave: budget resets; LIFO pops from the tail
    shard.begin_wave()
    acc, _ = shard.schedule_pop(URLLIB, 2, True, 3600, now=200)
    assert acc[0] == [urls[4], urls[3]]


# --------------------------- wave quota loop ------------------------------
def test_run_schedule_wave_quota_and_seeds():
    settings = CrawlSettings(
        schedule_quantity_limitation=10, num_frontier_shards=1,
        politeness_per_host_per_wave=0,
    )
    shard = FrontierShard(0, RULES, settings)
    ruleset = RuleSet(RULES)
    entries = ruleset.priority_list()
    # rates: list=(100+10)/1=110, detail=(100+0)/2=50 → list served first
    assert [e["alias"] for e in entries] == ["list", "detail"]
    total = ruleset.total_rates
    # preload detail queue
    for i in range(8):
        shard._save_link(URLLIB, f"http://www.site0.example/item_{i}?id={i}",
                         "http://ref", "*", 1, now=0)
    sched = run_schedule_wave(0, entries, total, [shard], settings)
    # wave 0: list rule reseeds (3 range-expanded seeds, bypass quota),
    # list queue empty → ct_list=ceil(10/160*110)=7 unmet → left=7;
    # detail ct = ceil(10/160*50)+7 = 11 → pops all 8 queued
    urls = [s["url"] for s in sched]
    assert urls[:3] == [f"http://www.site0.example/list_{i}.html" for i in (1, 2, 3)]
    assert len(sched) == 3 + 8
    assert [s["seq"] for s in sched] == list(range(11))
    # determinism: fresh run gives identical schedule
    shard2 = FrontierShard(0, RULES, CrawlSettings(
        schedule_quantity_limitation=10, num_frontier_shards=1,
        politeness_per_host_per_wave=0))
    for i in range(8):
        shard2._save_link(URLLIB, f"http://www.site0.example/item_{i}?id={i}",
                          "http://ref", "*", 1, now=0)
    entries2 = RuleSet(RULES).priority_list()
    sched2 = run_schedule_wave(0, entries2, total, [shard2], settings)
    assert sched == sched2


def _quota_wave(speculative: bool):
    settings = CrawlSettings(
        schedule_quantity_limitation=10, num_frontier_shards=1,
        politeness_per_host_per_wave=0,
    )
    shard = FrontierShard(0, RULES, settings)
    for i in range(8):
        shard._save_link(URLLIB, f"http://www.site0.example/item_{i}?id={i}",
                         "http://ref", "*", 1, now=0)
    ruleset = RuleSet(RULES)
    return run_schedule_wave(0, ruleset.priority_list(), ruleset.total_rates,
                             [shard], settings, speculative=speculative)


def test_speculative_schedule_equals_chained():
    """The parallel-pop speculative plan is byte-identical to the
    leftover-chained plan, INCLUDING the repair path: the list rule's
    empty queue leaves carry 7, and the detail rule (quota-limited at
    ct_base=4) needs a repair pop to absorb it — without the repair it
    would schedule 4 of its 8 queued urls instead of all 8."""
    assert _quota_wave(True) == _quota_wave(False)


def test_speculative_schedule_no_carry_case():
    """Zero-carry waves need no repairs: deep queues, quota-limited
    everywhere — speculation alone is exact."""
    settings = CrawlSettings(
        schedule_quantity_limitation=4, num_frontier_shards=1,
        politeness_per_host_per_wave=0,
    )

    def run(spec):
        shard = FrontierShard(0, RULES, settings)
        for i in range(50):
            shard._save_link(
                URLLIB, f"http://www.site0.example/item_{i}?id={i}",
                "http://ref", "*", 1, now=0)
        rs = RuleSet(RULES)
        # advance first_schedule so no reseed floods the tiny quota
        entries = rs.priority_list()
        for e in entries:
            e["first_schedule"] = 10**18
        return run_schedule_wave(0, entries, rs.total_rates, [shard],
                                 settings, speculative=spec)

    a, b = run(True), run(False)
    assert a == b and len(a) > 0


# --------------------------- snapshot/restore -----------------------------
def test_snapshot_restore_roundtrip():
    shard, settings = mk_shard()
    for i in range(20):
        shard._save_link(URLLIB, f"http://www.site0.example/item_{i}?id={i}",
                         "http://ref", "*", 1, now=i)
    blob = shard.snapshot()
    clone = FrontierShard(0, RULES, settings)
    clone.restore(blob)
    assert clone.url_info == shard.url_info
    assert {k: list(v) for k, v in clone.queues.items()} == {
        k: list(v) for k, v in shard.queues.items()
    }
    assert all(url_md5(f"http://www.site0.example/item_{i}?id={i}") in clone.seen
               for i in range(20))


def test_spill_cold_state_keeps_membership(tmp_path):
    from neocrawler_ray.functions.urls import url_md5

    shard, s = mk_shard()
    _save(shard, now=0)
    kk = url_md5(LINK)
    shard.url_info[kk]["status"] = "crawled_finish"
    shard.url_info[kk]["last"] = 0
    shard.queues[URLLIB].clear()  # simulate the url having been crawled

    # too fresh → kept
    assert shard.spill_cold_state(now=10, keep_ms=100) == 0
    # keep_ms below the policy clamp (rule interval / 2-day hit lock):
    # still kept — an early eviction would let a re-discovered
    # crawled_finish url recrawl before its interval via the new-url path
    assert shard.spill_cold_state(now=1000, keep_ms=100) == 0
    # cold past the clamp → evicted, membership survives in the cuckoo
    cold_now = s.linksave_hit_lock_ms + 1000
    n = shard.spill_cold_state(now=cold_now, keep_ms=100,
                               spill_dir=str(tmp_path))
    assert n == 1 and kk not in shard.url_info and kk in shard.seen
    import glob

    assert glob.glob(str(tmp_path / "shard=*-spill-*.parquet"))
    # re-discovery re-admits through the brand-new-url path (policy for a
    # long-expired crawled_finish url is "re-admit" either way)
    assert shard._save_link(URLLIB, LINK, "http://ref/", "*",
                            version=cold_now + 1000, now=cold_now + 1000)
    assert shard.queue_len(URLLIB) == 1
