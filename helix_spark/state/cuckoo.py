"""Cuckoo filter over xxhash64 URL hashes — the deletable half of the seen set.

The bloom filter (bloom.py) is append-only and covers *ever seen*. The cuckoo
filter covers the *in-flight* subset (queued but not yet verified): entries
are inserted at admission and DELETED once the URL is verified and lands in
the report — mirroring the reference's null→StatusCode transition in
``_processedUrls`` (/root/reference/Bot/Block/CoordinatorBlock.cs:268-273,
284). Deletion is the property blooms lack and why the north rule names a
cuckoo filter.

Standard design (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014): b buckets × 4 slots × 16-bit fingerprints, partial-key cuckoo
hashing with bounded eviction. Insert/delete are batch-vectorized in numpy
where possible, with a bounded per-collision loop (driver/executor side —
never per-URL Python in the Spark hot path; probing is fully vectorized).
"""

from __future__ import annotations

import numpy as np

_MULT = np.uint64(0x9E3779B97F4A7C15)
SLOTS = 4
MAX_KICKS = 500


def _fingerprint(h: np.ndarray) -> np.ndarray:
    fp = ((h >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)  # 0 = empty slot marker


class CuckooFilter:
    def __init__(self, num_buckets: int, table: np.ndarray | None = None):
        assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be a power of 2"
        self.num_buckets = num_buckets
        self.table = (
            table if table is not None else np.zeros((num_buckets, SLOTS), dtype=np.uint16)
        )
        self._rng = np.random.default_rng(42)  # deterministic eviction choice

    @classmethod
    def sized_for(cls, expected_n: int) -> "CuckooFilter":
        need = int(expected_n / (SLOTS * 0.95)) + 1
        b = 1
        while b < need:
            b <<= 1
        return cls(max(b, 8))

    # ------------------------------------------------------------ index math
    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h % np.uint64(self.num_buckets)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        fph = (fp.astype(np.uint64) * _MULT) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return ((i1.astype(np.uint64) ^ fph) % np.uint64(self.num_buckets)).astype(np.int64)

    # --------------------------------------------------------------- inserts
    def _compact(self) -> None:
        """Pack nonzero fingerprints to the left of each bucket (slot order
        carries no meaning) so vectorized placement can use fill counts."""
        self.table = np.ascontiguousarray(np.sort(self.table, axis=1)[:, ::-1])

    def insert_hashes(self, hashes: np.ndarray) -> int:
        """Bulk-vectorized insert; returns number that failed (filter
        near-full). Failures are safe: the filter is a prefilter — a missed
        insert only costs an exact-join probe later.

        Vectorization: per round, items are grouped by target bucket; each
        item's slot = bucket fill + its stable rank within the batch group.
        Items that overflow a bucket retry their alternate bucket next
        round; the final stragglers go through the per-item cuckoo-kick
        path (a tiny minority)."""
        h = hashes.astype(np.uint64)
        fp_all = _fingerprint(h)
        i1_all = self._i1(h)
        i2_all = self._i2(i1_all, fp_all)
        pending_fp, pending_idx, pending_alt = fp_all, i1_all, i2_all
        for _round in range(4):
            if len(pending_fp) == 0:
                break
            self._compact()
            fill = (self.table != 0).sum(axis=1)
            order = np.argsort(pending_idx, kind="stable")
            sidx = pending_idx[order]
            sfp = pending_fp[order]
            salt = pending_alt[order]
            group_start = np.searchsorted(sidx, sidx, side="left")
            rank = np.arange(len(sidx)) - group_start
            slot = fill[sidx] + rank
            ok = slot < SLOTS
            self.table[sidx[ok], slot[ok]] = sfp[ok]
            # overflowed items retry at their alternate bucket
            pending_fp = sfp[~ok]
            pending_idx = salt[~ok]
            pending_alt = sidx[~ok]
        failed = 0
        for j in range(len(pending_fp)):
            if not self._insert_one(int(pending_idx[j]), int(pending_fp[j])):
                failed += 1
        return failed

    def _insert_one(self, i1: int, fp: int) -> bool:
        for idx in (i1, int(self._i2(np.array([i1]), np.array([fp], dtype=np.uint16))[0])):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        idx = i1
        for _ in range(MAX_KICKS):
            slot = int(self._rng.integers(0, SLOTS))
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = int(self._i2(np.array([idx]), np.array([fp], dtype=np.uint16))[0])
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False

    # --------------------------------------------------------------- queries
    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        fp = _fingerprint(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        t = self.table
        hit1 = (t[i1] == fp[:, None]).any(axis=1)
        hit2 = (t[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    # --------------------------------------------------------------- deletes
    def delete_hashes(self, hashes: np.ndarray) -> int:
        """Bulk-vectorized delete of one matching fingerprint per hash;
        returns count deleted. Two batch items sharing (bucket, fingerprint)
        may clear the same slot once — acceptable for a prefilter (shifts
        the false-positive rate, never correctness: the exact anti-join is
        the source of truth)."""
        h = hashes.astype(np.uint64)
        fp = _fingerprint(h)
        deleted = 0
        idx = self._i1(h)
        for _pass in (0, 1):
            rows = self.table[idx]
            hit = rows == fp[:, None]
            any_hit = hit.any(axis=1)
            first = np.argmax(hit, axis=1)
            self.table[idx[any_hit], first[any_hit]] = 0
            deleted += int(any_hit.sum())
            if _pass == 0:
                miss = ~any_hit
                idx, fp = self._i2(idx, fp)[miss], fp[miss]
        return deleted

    # ----------------------------------------------------------------- serde
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, num_buckets: int, blob: bytes) -> "CuckooFilter":
        table = np.frombuffer(blob, dtype=np.uint16).reshape(num_buckets, SLOTS).copy()
        return cls(num_buckets, table)

    @property
    def load_factor(self) -> float:
        return float((self.table != 0).sum()) / self.table.size
