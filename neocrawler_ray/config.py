"""Run configuration for the crawl engine.

Mirrors the reference's ``instance/*/settings.json`` knobs (reference:
README.md:100-120) plus the engine's own distribution knobs (shard counts,
actor-pool sizes).  Rules are re-read at wave boundaries when
``rules.json`` changes on disk (T5-lite re-expression of the reference's
120 s hot-reload poll, scheduler/index.js:63-120).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlSettings:
    # --- reference settings (README.md:100-120) -------------------------
    schedule_quantity_limitation: int = 200      # max urls per scheduler round
    schedule_interval: int = 60                  # logical seconds per wave
    download_retry: int = 3                      # app-level retry limit
    keep_link_relation: bool = True
    # T7 circuit breaker (extractor.js:416-423): when enabled, the run
    # aborts (with a final checkpoint) once the running ±failure counter
    # exceeds ``circuit_breaker_factor × schedule_quantity_limitation``
    # — the wave-model analog of the reference's
    # ``cumulative_failure > spider_concurrency*1.5`` then process.exit
    to_much_fail_exit: bool = False
    circuit_breaker_factor: float = 1.5
    # T5 rules hot-reload (scheduler/index.js:63-120 polls every 120 s):
    # wave-boundary re-read of rules.json when its mtime/digest changes
    rules_reload: bool = True

    # --- reference policy constants (per call-site — SURVEY.md §7.3) ----
    scheduler_lock_ms: int = 60 * 60 * 1000      # scheduler/index.js:381-383
    linksave_lock_ms: int = 10 * 60 * 1000       # spider/pipeline.js:138-140
    linksave_hit_lock_ms: int = 2 * 24 * 60 * 60 * 1000  # pipeline.js:141-143
    max_weight: int = 100                        # scheduler/index.js:47 rate numerator base

    # --- politeness (wave-model re-expression of spider_request_delay +
    #     per-host serialization, SURVEY.md §2.3 T4) ----------------------
    politeness_per_host_per_wave: int = 50

    # --- engine distribution knobs --------------------------------------
    num_frontier_shards: int = 8
    fetch_concurrency: int = 4
    extract_concurrency: int = 4
    extract_batch_size: int = 256
    max_waves: int = 50
    logical_epoch_ms: int = 1_735_689_600_000    # 2025-01-01T00:00:00Z, logical clock base

    # checkpoint cadence: snapshot every Nth wave (1 = every wave, the
    # parity/default setting).  Resume restores the last checkpointed
    # wave and deterministically replays the ≤N-1 waves after it, so
    # recovery work is bounded by the knob; throughput runs can trade
    # snapshot pickling/IO per wave for a slightly longer replay
    checkpoint_every: int = 1

    # --- frontier memory bound (0 = disabled; parity runs keep full state)
    # evict terminal per-URL state older than this many logical ms after
    # each wave commit; cuckoo membership is permanent (see
    # FrontierShard.spill_cold_state)
    state_spill_keep_ms: int = 0

    # --- paths ----------------------------------------------------------
    checkpoint_dir: str | None = None
    output_dir: str | None = None

    def wave_version(self, wave: int) -> int:
        """Deterministic logical timestamp for a wave (replaces the
        reference's wall-clock ``schedule_version``, scheduler/index.js:126)."""
        return self.logical_epoch_ms + wave * self.schedule_interval * 1000


@dataclass
class RuleSet:
    """Broadcastable driller-rule snapshot: {domain: {alias: rule}}."""

    rules: dict[str, dict[str, dict]] = field(default_factory=dict)

    @staticmethod
    def from_json_file(path: str) -> "RuleSet":
        import json

        with open(path) as f:
            return RuleSet(json.load(f))

    def priority_list(self, max_weight: int = 100) -> list[dict]:
        """Rule serve-order entries sorted by rate desc (stable), rate =
        (max_weight + weight) / priority.  Parity: scheduler/index.js:88,
        489-491."""
        entries = []
        for domain, aliases in self.rules.items():
            for alias, rule in aliases.items():
                if not rule.get("active", True):
                    continue
                rate = (max_weight + float(rule.get("weight", 0))) / float(
                    rule.get("priority", 1)
                )
                entries.append(
                    {
                        "key": f"driller:{domain}:{alias}",
                        "rate": rate,
                        "rule": rule.get("schedule_rule", "FIFO"),
                        "interval": int(rule.get("schedule_interval", 3600)),
                        "first_schedule": 0,
                        "seed": rule.get("seed", []),
                        "domain": domain,
                        "alias": alias,
                    }
                )
        entries.sort(key=lambda e: -e["rate"])
        return entries

    @property
    def total_rates(self) -> float:
        return sum(e["rate"] for e in self.priority_list())
