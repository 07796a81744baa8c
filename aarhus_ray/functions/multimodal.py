"""Multimodal-column plumbing (opaque binary payloads + typed metadata).

The sandbox has no image/audio codecs, so DECODE IS A DETERMINISTIC FAKE
(clearly marked below) — but the Ray-side plumbing is real and tested:
binary column construction, actor-pool map_batches over bytes with small
batch sizes (large payloads), schema of the feature output. A real deploy
swaps ``_fake_decode`` for PIL/ffmpeg in the actor __init__/__call__ —
nothing else changes.

Payloads here are ``cast(text AS BLOB)`` of documents.text so the DuckDB
oracle can verify the metadata path (byte length, fake dimensions) exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder (deterministic fake — see module docstring). A real
    image decoder would return (width, height, channels, pixel stats); this
    derives them from the bytes so tests/oracles are exact."""
    n = len(payload)
    return {
        "n_bytes": n,
        "fake_width": n % 256,
        "fake_height": (n // 256) % 256,
        "checksum": hashlib.md5(payload).hexdigest(),
    }


def make_payload_table(sf_dir: str) -> ray.data.Dataset:
    """documents.text → (doc_id, payload: binary) — the multimodal input
    shape (opaque bytes column + id)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_binary(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pc.cast(batch["text"], pa.binary())}
        )

    return ds.map_batches(to_binary, batch_format="pyarrow")


class DecodeUDF:
    """Actor-pool decode stage: bytes → features. In production the codec
    loads once here (__init__); batches stay SMALL (payloads are wide)."""

    def __init__(self):
        self.decode = _fake_decode  # real codec handle goes here

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = [self.decode(p) for p in payloads]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
                "fake_width": pa.array([f["fake_width"] for f in feats], pa.int64()),
                "fake_height": pa.array([f["fake_height"] for f in feats], pa.int64()),
                "checksum": pa.array([f["checksum"] for f in feats], pa.string()),
            }
        )


def decode_features(sf_dir: str) -> pd.DataFrame:
    """Binary-payload decode pipeline: build payload column → actor-pool
    decode (batch_size=64: payload batches sized by bytes, not rows) →
    feature table."""
    ds = make_payload_table(sf_dir)
    out = ds.map_batches(
        DecodeUDF, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
