"""Cuckoo filter — the approximate URL-seen membership structure.

Replaces the reference's exact Redis URL-state hash (reference:
README.md:757-762, spider/spider.js:380-460) as the *fast-path seen gate*
at the 10^10-URL design point (BASELINE.json north_rule): each frontier
shard holds one filter sized for its share of the frontier; rich per-URL
state lives beside it and can be compacted/spilled, but the membership
question "have we ever admitted this url_md5?" is answered here in O(1)
with ~1 byte/key.

Standard partial-key cuckoo filter (Fan et al., CoNEXT'14 — public
algorithm): power-of-two bucket count, 4 slots/bucket, 16-bit
fingerprints, alternate bucket ``i2 = i1 ^ hash(fp)``, bounded eviction
with a deterministic (seeded) kick sequence so snapshots are reproducible.
On eviction failure the final victim fingerprint is kept in a
(bucket, fingerprint) stash, so the filter NEVER false-negatives and
behaves deterministically for the parity tests.  Snapshot/restore is raw
``numpy`` bytes + the stash — per-shard checkpoint material.
"""

from __future__ import annotations

import hashlib
import pickle
import random

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500
_MULT = np.uint64(0x5BD1E995)

# On-disk state-format version for persisted/checkpointed filters.  Bump
# whenever the fingerprint derivation (or table layout) changes: mixing
# snapshots across schemes produces both false positives AND
# contract-breaking lookup misses.  v2 = fingerprint remap onto
# [1, 0xFFFF] (the old `| 1` scheme — v1 — confined fps to odd values).
STATE_FORMAT_VERSION = 2


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, seed: int = 7):
        n_buckets = 1
        while n_buckets * _SLOTS < capacity / 0.95:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        # stash of evicted (bucket_index, fingerprint) pairs after a failed
        # kick walk — the unplaced entry is the last VICTIM, not the item
        # being inserted, so it must be kept by (index, fp), not by key
        self.stash: list[tuple[int, int]] = []
        self.count = 0
        self._seed = seed
        self._rng = random.Random(seed)

    # -- hashing --------------------------------------------------------
    def _fp_index(self, item: bytes | str) -> tuple[np.uint16, int]:
        if isinstance(item, str):
            item = item.encode()
        h = hashlib.md5(item).digest()
        # never-0 via REMAP onto [1, 0xFFFF] — the old `| 1` confined
        # fingerprints to the 32,768 odd values, doubling the filter's
        # false-positive rate (each fp is a URL silently never crawled
        # at the 10^10 design point)
        fp = np.uint16((int.from_bytes(h[0:2], "little") % 0xFFFF) + 1)
        i1 = int.from_bytes(h[2:10], "little") & int(self.mask)
        return fp, i1

    def _alt(self, i: int, fp: np.uint16) -> int:
        return int((np.uint64(i) ^ (np.uint64(fp) * _MULT)) & self.mask)

    # -- ops ------------------------------------------------------------
    def add(self, item: bytes | str) -> None:
        fp, i1 = self._fp_index(item)
        i2 = self._alt(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return
        # evict: deterministic kick walk
        i = self._rng.choice((i1, i2))
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = self._rng.randrange(_SLOTS)
            cur, self.table[i, slot] = self.table[i, slot], np.uint16(cur)
            i = self._alt(i, cur)
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = cur
                self.count += 1
                return
        # table too full: stash the final victim by (bucket, fp) so no key
        # ever false-negatives
        self.stash.append((int(i), int(cur)))
        self.count += 1

    def __contains__(self, item: bytes | str) -> bool:
        fp, i1 = self._fp_index(item)
        i2 = self._alt(i1, fp)
        if fp in self.table[i1] or fp in self.table[i2]:
            return True
        if self.stash:
            f = int(fp)
            for idx, sfp in self.stash:
                if sfp == f and (idx == i1 or idx == i2):
                    return True
        return False

    def __len__(self) -> int:
        return self.count

    # -- snapshot (per-shard checkpoint material) ------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "n_buckets": self.n_buckets,
                "table": self.table.tobytes(),
                "stash": self.stash,
                "count": self.count,
                "seed": self._seed,
                "rng_state": self._rng.getstate(),
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    @staticmethod
    def from_bytes(blob: bytes) -> "CuckooFilter":
        d = pickle.loads(blob)
        cf = CuckooFilter.__new__(CuckooFilter)
        cf.n_buckets = d["n_buckets"]
        cf.mask = np.uint64(cf.n_buckets - 1)
        cf.table = np.frombuffer(d["table"], dtype=np.uint16).reshape(
            cf.n_buckets, _SLOTS
        ).copy()
        cf.stash = d["stash"]
        cf.count = d["count"]
        cf._seed = d["seed"]
        cf._rng = random.Random()
        cf._rng.setstate(d["rng_state"])
        return cf
