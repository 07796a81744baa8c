"""Mergeable sketches (SURVEY.md §2.5 "approximate (optional)").

HyperLogLog distinct-count over any string column: one sketch per batch
inside map_batches (vectorized register update), merged on the driver —
the canonical pre-aggregated plan (ray_guide: "sketches are designed to be
mergeable"). Deterministic (blake2b hashing, no RNG).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

HLL_P = 12  # 2^12 registers → ~1.6% standard error
_M = 1 << HLL_P


def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_update(registers: np.ndarray, values: list[str]) -> None:
    """Vectorized register update for a batch of strings."""
    if not values:
        return
    h = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(v.encode("utf-8"), digest_size=8).digest(), "big")
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = leading zeros of the remaining 64-P bits, + 1
    lz = np.zeros(len(h), dtype=np.uint8)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < np.uint64(1 << (64 - shift))
        lz[mask] += shift
        cur[mask] = cur[mask] << np.uint64(shift)
    rank = np.minimum(lz + 1, 64 - HLL_P + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rank)


def hll_estimate(registers: np.ndarray) -> float:
    m = float(_M)
    est = _alpha(_M) * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            est = m * np.log(m / zeros)  # linear counting for small n
    return float(est)


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(_M, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, s, out=out)
    return out


def distinct_count_hll(sf_dir: str, table: str = "events", column: str = "props") -> pd.DataFrame:
    """Approximate distinct count of a column: per-batch HLL sketches →
    driver merge. Returns (estimate, exact is NOT computed here — the
    driver's rows-only check just pins determinism and shape)."""
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=[column])

    def sketch(batch: pa.Table) -> pa.Table:
        regs = np.zeros(_M, dtype=np.uint8)
        hll_update(regs, [v for v in batch[column].to_pylist() if v is not None])
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    blobs = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()["sketch"]
    merged = hll_merge([np.frombuffer(b, dtype=np.uint8) for b in blobs])
    return pd.DataFrame(
        {"table_name": [table], "column_name": [column], "approx_distinct": [round(hll_estimate(merged))]}
    )


def distinct_count_exact(sf_dir: str, table: str = "events", column: str = "props") -> pd.DataFrame:
    """EXACT distinct count of a column — the accuracy anchor for the HLL
    sketch (hash-checked against ``COUNT(DISTINCT ...)``; a pytest pins the
    sketch's relative error against this). Plan: per-batch distinct values
    (vectorized np.unique — the shuffle carries only within-batch-distinct
    strings) → groupby(value) → count groups. Fully distributed; only the
    scalar count reaches the driver."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=[column])

    def batch_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({column: pc.unique(batch[column].drop_null())})

    n = ds.map_batches(batch_distinct, batch_format="pyarrow").groupby(column).count().count()
    return pd.DataFrame(
        {
            "table_name": [table],
            "column_name": [column],
            "n_distinct": pd.Series([n], dtype="int64"),
        }
    )
