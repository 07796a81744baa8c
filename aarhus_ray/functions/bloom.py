"""Distributed Bloom filter over an int64 key column — the big-keyset
fallback for broadcast semi/anti joins (SURVEY.md §2.4, VERDICT round-2
Missing #5).

The broadcast-keyset join collects the fact side's DISTINCT keys to the
driver; fine to ~10^7 keys, a scale-killer beyond. The Bloom form keeps
driver state at a fixed ``2^LOG2_BITS`` bits regardless of fact size:

1. build: one map over the fact keys emits a per-batch bit array (fixed
   size); the driver ORs them — a mergeable sketch, same plan shape as the
   HLL in sketches.py.
2. probe: Bloom membership has NO false negatives, so anti-join rows that
   test negative are definitely absent and pass through immediately; the
   (bounded, probe-side) positive candidates are then verified EXACTLY by
   one pruned scan of the fact side restricted to candidate keys. Results
   are therefore exact — the Bloom only bounds what the driver holds.

Sizing: 2^23 bits (1 MiB) with k=4 probes holds ~10^6 keys at <2% false
positives; the candidate-verification pass makes the fp rate a pure
performance knob, never a correctness one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import _mix64

LOG2_BITS = 23  # 1 MiB of bits per filter
N_PROBES = 4
_SALT = np.uint64(0xA5A5A5A5DEADBEEF)


def _positions(keys: np.ndarray) -> list[np.ndarray]:
    """k bit positions per key (double hashing: h1 + i*h2, both splitmix64
    finalized — frozen)."""
    x = keys.astype(np.int64).astype(np.uint64)
    h1 = _mix64(x)
    h2 = _mix64(x ^ _SALT) | np.uint64(1)
    mask = np.uint64((1 << LOG2_BITS) - 1)
    return [((h1 + np.uint64(i) * h2) & mask).astype(np.int64) for i in range(N_PROBES)]


def build_bloom(ds: ray.data.Dataset, col: str) -> np.ndarray:
    """Distributed build: per-batch fixed-size bit arrays, OR-merged on the
    driver (driver traffic = n_blocks × 1 MiB, independent of key count)."""
    nbytes = 1 << (LOG2_BITS - 3)

    def partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        ks = batch[col].to_numpy(zero_copy_only=False)
        if len(ks):
            for pos in _positions(ks):
                np.bitwise_or.at(bits, pos >> 3, np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    out = np.zeros(nbytes, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").to_pandas()["bloom"]:
        np.bitwise_or(out, np.frombuffer(b, dtype=np.uint8), out=out)
    return out


def bloom_contains(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership test: True = maybe present (verify exactly),
    False = DEFINITELY absent."""
    res = np.ones(len(keys), dtype=bool)
    for pos in _positions(keys):
        res &= (bits[pos >> 3] & np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))) != 0
    return res
