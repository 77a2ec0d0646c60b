"""Cuckoo-filter backend for the sharded URL-seen prefilter — the other
half of the north rule's "partitioned bloom/cuckoo URL-seen set".

Same contract as ``crabspark.seen.Bloom`` (add_dataframe / might_contain /
save / load / merge), same routing-only role in ``filter_unseen``: a
filter MISS means *definitely new* (skips the anti-join shuffle), a HIT
means *maybe seen* (takes the exact path). What cuckoo adds over bloom:

- **deletion** (``delete_array``): a re-crawl that evicts churned URLs
  (see queries.q_capture_churn) can remove them from the prefilter
  instead of rebuilding it; bloom bits can never be cleared.
- **bounded lookup**: exactly 2 bucket probes per key vs k bit probes.

Geometry (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014, public): 4-slot buckets, 16-bit fingerprints, partial-key
cuckooing — bucket count a power of two so the XOR alternate index stays
in range. Per-key state is 2 bytes at ~95% max occupancy.

Correctness invariant (the one that matters for the crawl): a cuckoo
filter has NO false negatives only while every insert SUCCEEDS. An insert
that fails after the kick budget would silently drop a key and later
report it "definitely new" — a false drop in the crawl. This
implementation therefore flips a sticky ``saturated`` flag on the first
failed insert; a saturated filter answers might_contain=True for
EVERYTHING, degrading routing to the plain exact anti-join (correct,
just slower) instead of corrupting the crawl. The flag persists through
save/load and merge.

Distributed construction mirrors Bloom.add_dataframe: each partition
builds a filter of the SAME geometry executor-side and ships its table
(nb x 4 uint16, O(1) in row count); the driver merges by re-inserting
occupied slots — partial-key cuckooing makes (bucket index, fingerprint)
sufficient to recompute both candidate buckets, so merge needs no keys.

Batch inserts are vectorized for the common case: pass 1 scatters into
primary buckets (rank-within-bucket vs free slots), pass 2 scatters the
remainder into alternate buckets, and only the conflict tail (rare below
~70% load) takes the per-item kick loop.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_SLOTS = 4
_MAX_KICKS = 500
_FP_MULT = np.uint64(0x5BD1E995)  # odd multiplier for the fp->offset hash


def _geometry(capacity: int) -> int:
    """Bucket count: next power of two holding `capacity` at ~84% load
    (pow2 rounding usually lands well below the ~95% cuckoo ceiling)."""
    need = max(1024, int(capacity / (_SLOTS * 0.84)))
    return 1 << int(need - 1).bit_length()


def _hashes(sha1_hex: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h1, fp) per key from the sha1 hex digest — same nibble-decode
    trick as seen._positions (UCS4 view + where + matmul, no per-row
    int()); h1 from the first 15 nibbles, fp (nonzero uint16) from the
    next 15."""
    s = np.asarray(sha1_hex, dtype="U40")
    if len(s) == 0:
        return (np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint16))
    # uint8 branchless decode — same rationale as seen._positions (the
    # int64 np.where variant was memory-bus-bound)
    codes = s.view(np.uint32).reshape(len(s), -1)[:, :30].astype(np.uint8)
    codes |= 0x20  # fold 'A'-'F' onto 'a'-'f' (digits keep bit 5)
    nib = codes - (codes > ord("9")).astype(np.uint8) * np.uint8(39)
    nib -= np.uint8(ord("0"))
    nib = nib.astype(np.uint64)
    pw = np.array([16] * 15, dtype=np.uint64) ** np.arange(
        14, -1, -1, dtype=np.uint64
    )
    h1 = (nib[:, :15] * pw).sum(axis=1)  # < 2^60
    h2 = (nib[:, 15:30] * pw).sum(axis=1)
    fp = (h2 % np.uint64(65535)).astype(np.uint16) + np.uint16(1)  # never 0
    return h1, fp


def _alt_index(idx: np.ndarray, fp: np.ndarray, nb: int) -> np.ndarray:
    """Partial-key alternate bucket: i2 = i1 XOR H(fp), involutive."""
    off = (fp.astype(np.uint64) * _FP_MULT) % np.uint64(nb)
    return (idx.astype(np.uint64) ^ off) % np.uint64(nb)


class CuckooFilter:
    def __init__(self, capacity: int, table: np.ndarray | None = None):
        self.nb = _geometry(capacity)
        self.table = (
            table
            if table is not None
            else np.zeros((self.nb, _SLOTS), dtype=np.uint16)
        )
        self.saturated = False
        # insert/delete bookkeeping for the delete-safety guard: a delete
        # that misses, or more deletes than inserts, means the caller is
        # deleting keys that were never inserted — which silently evicts
        # colliding LIVE keys (false negatives). Flip `saturated` instead:
        # the filter degrades to answer-True-for-everything and the exact
        # anti-join failsafe downstream stays correct (round-5 advisor).
        self.n_inserted = 0
        self.n_deleted = 0

    # --- vectorized batch insert -----------------------------------------
    def add_array(self, sha1_hex: np.ndarray) -> None:
        if len(sha1_hex) == 0 or self.saturated:
            return
        self.n_inserted += len(sha1_hex)
        h1, fp = _hashes(np.asarray(sha1_hex))
        i1 = (h1 % np.uint64(self.nb)).astype(np.int64)
        rem = self._insert_at(i1, fp)
        if rem.any():
            i2 = _alt_index(i1[rem], fp[rem], self.nb).astype(np.int64)
            fp2 = fp[rem]
            rem2 = self._insert_at(i2, fp2)
            if rem2.any():
                for j in np.flatnonzero(rem2):
                    if not self._kick_insert(int(i2[j]), int(fp2[j])):
                        self.saturated = True
                        return

    def _insert_at(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Vectorized slot fill at the given buckets; returns mask of
        items that did not fit (bucket full after contention)."""
        remaining = np.ones(len(idx), dtype=bool)
        # at most _SLOTS passes: each pass writes one item per bucket
        for _ in range(_SLOTS):
            if not remaining.any():
                break
            ridx = np.flatnonzero(remaining)
            b = idx[ridx]
            free_slot = np.argmax(self.table[b] == 0, axis=1)
            has_free = self.table[b, free_slot] == 0
            cand = ridx[has_free]
            if len(cand) == 0:
                break
            # one writer per bucket per pass
            uniq, upos = np.unique(idx[cand], return_index=True)
            rows = cand[upos]
            slot = np.argmax(self.table[idx[rows]] == 0, axis=1)
            self.table[idx[rows], slot] = fp[rows]
            remaining[rows] = False
        return remaining

    def _kick_insert(self, idx: int, fp: int) -> bool:
        """Classic per-item eviction chain (the rare tail)."""
        rng = np.random.default_rng(fp * 2654435761 % (2**32))
        for _ in range(_MAX_KICKS):
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                self.table[idx, empty[0]] = fp
                return True
            victim_slot = int(rng.integers(_SLOTS))
            victim_fp = int(self.table[idx, victim_slot])
            self.table[idx, victim_slot] = fp
            fp = victim_fp
            idx = int(
                _alt_index(
                    np.array([idx], dtype=np.uint64),
                    np.array([fp], dtype=np.uint16),
                    self.nb,
                )[0]
            )
        return False

    # --- probe ------------------------------------------------------------
    def might_contain(self, sha1_hex: pd.Series) -> pd.Series:
        if len(sha1_hex) == 0:
            return pd.Series([], dtype=bool, index=sha1_hex.index)
        if self.saturated:
            return pd.Series(True, index=sha1_hex.index)
        h1, fp = _hashes(sha1_hex.to_numpy())
        i1 = (h1 % np.uint64(self.nb)).astype(np.int64)
        i2 = _alt_index(i1, fp, self.nb).astype(np.int64)
        hit = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        return pd.Series(hit, index=sha1_hex.index)

    # --- deletion ----------------------------------------------------------
    def delete_array(self, sha1_hex: np.ndarray) -> int:
        """Remove one stored copy per key (keys must have been inserted —
        deleting a never-inserted key can evict a colliding key's
        fingerprint, the standard cuckoo caveat). Returns #removed.
        No-op (0) on a saturated filter: its table already under-represents
        the inserted set, so deletes would deepen the corruption."""
        if len(sha1_hex) == 0 or self.saturated:
            return 0
        h1, fp = _hashes(np.asarray(sha1_hex))
        i1 = (h1 % np.uint64(self.nb)).astype(np.int64)
        i2 = _alt_index(i1, fp, self.nb).astype(np.int64)
        removed = 0
        for a, b, f in zip(i1, i2, fp):  # deletes are rare-path; per-item
            for idx in (int(a), int(b)):
                slots = np.flatnonzero(self.table[idx] == f)
                if len(slots):
                    self.table[idx, slots[0]] = 0
                    removed += 1
                    break
        self.n_deleted += removed
        if removed < len(sha1_hex) or self.n_deleted > self.n_inserted:
            self.saturated = True
        return removed

    # --- merge / distributed construction ----------------------------------
    def merge_table(
        self,
        other_table: np.ndarray,
        other_saturated: bool = False,
        other_inserted: int = 0,
    ) -> None:
        """Fold another filter OF THE SAME GEOMETRY in by re-inserting its
        occupied slots — (bucket, fp) is enough under partial-key
        cuckooing. Saturation is sticky across merges; insert counts
        accumulate so the delete-safety guard stays meaningful after a
        distributed build."""
        self.n_inserted += other_inserted
        if other_saturated:
            self.saturated = True
            return
        if self.saturated:
            return
        idx, slot = np.nonzero(other_table)
        fps = other_table[idx, slot]
        rem = self._insert_at(idx.astype(np.int64), fps)
        if rem.any():
            i2 = _alt_index(
                idx[rem].astype(np.uint64), fps[rem], self.nb
            ).astype(np.int64)
            rem2 = self._insert_at(i2, fps[rem])
            if rem2.any():
                f2 = fps[rem]
                for j in np.flatnonzero(rem2):
                    if not self._kick_insert(int(i2[j]), int(f2[j])):
                        self.saturated = True
                        return

    def add_dataframe(self, df: DataFrame, sha1_col: str = "url_sha1") -> None:
        """Distributed build, same shape as Bloom.add_dataframe: each
        partition builds a same-geometry filter executor-side and ships
        its table (nb x 4 x 2 bytes — O(1) in rows); the driver merges."""
        nb = self.nb

        def build(it):
            part = CuckooFilter(1)
            part.nb = nb
            part.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
            any_rows = False
            for pdf in it:
                arr = pdf[sha1_col].dropna().to_numpy()
                if len(arr):
                    any_rows = True
                    part.add_array(arr)
            if any_rows:
                yield pd.DataFrame(
                    {
                        "table": [part.table.tobytes()],
                        "saturated": [bool(part.saturated)],
                        "n_inserted": [part.n_inserted],
                    }
                )

        rows = (
            df.select(sha1_col)
            .mapInPandas(
                build,
                schema="table binary, saturated boolean, n_inserted long",
            )
            .collect()
        )
        for r in rows:
            self.merge_table(
                np.frombuffer(r["table"], dtype=np.uint16).reshape(
                    nb, _SLOTS
                ),
                bool(r["saturated"]),
                int(r["n_inserted"]),
            )

    # --- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        tmp = path + f".tmp-{os.getpid()}"
        np.savez(
            tmp,
            kind=np.array(["cuckoo"]),
            table=self.table,
            nb=np.int64(self.nb),
            saturated=np.int64(1 if self.saturated else 0),
            n_inserted=np.int64(self.n_inserted),
            n_deleted=np.int64(self.n_deleted),
        )
        os.replace(tmp + ".npz", path)

    @classmethod
    def load(cls, path: str, capacity: int, fpp: float = 0.0) -> "CuckooFilter":
        """fpp accepted-and-ignored for Bloom signature parity; saved
        geometry wins over the current config (same rule as Bloom.load)."""
        with np.load(path, allow_pickle=False) as z:
            table = z["table"]
            nb = int(z["nb"])
            saturated = bool(int(z["saturated"]))
            n_ins = int(z["n_inserted"]) if "n_inserted" in z else 0
            n_del = int(z["n_deleted"]) if "n_deleted" in z else 0
        f = cls(capacity, table=table)
        f.nb = nb
        f.saturated = saturated
        f.n_inserted = n_ins
        f.n_deleted = n_del
        return f
