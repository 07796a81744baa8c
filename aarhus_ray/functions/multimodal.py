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


class ResizeUDF:
    """Actor-pool resize stage (STUB kernel, real plumbing): bytes →
    resized bytes + metadata. The deterministic fake 'resize' truncates
    the payload to the byte budget of target_w × target_h and records
    both geometries; a real deploy swaps the body for PIL's
    Image.resize + re-encode — schema, batch sizing and actor shape are
    identical."""

    def __init__(self, target_w: int = 64, target_h: int = 64):
        self.target_w = target_w
        self.target_h = target_h
        self.budget = target_w * target_h  # stand-in for the decoded size

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        resized = [p[: self.budget] for p in payloads]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "orig_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "resized_bytes": pa.array([len(r) for r in resized], pa.int64()),
                "target_w": pa.array([self.target_w] * len(payloads), pa.int64()),
                "target_h": pa.array([self.target_h] * len(payloads), pa.int64()),
                "resized_checksum": pa.array(
                    [hashlib.md5(r).hexdigest() for r in resized], pa.string()
                ),
            }
        )


def resize_features(sf_dir: str, target_w: int = 64, target_h: int = 64) -> pd.DataFrame:
    """Image-resize pipeline shape: payload column → actor-pool resize
    (small batches — payloads are wide) → geometry + checksum table."""
    ds = make_payload_table(sf_dir)
    out = ds.map_batches(
        ResizeUDF,
        fn_constructor_args=(target_w, target_h),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def frame_sample(sf_dir: str, frame_bytes: int = 256, every_n: int = 4, max_frames: int = 3) -> pd.DataFrame:
    """Video-frame-sampling pipeline shape: treat each payload as a frame
    stream (fixed ``frame_bytes`` per fake frame), emit every ``every_n``-th
    frame up to ``max_frames`` — one OUTPUT ROW PER FRAME (flat_map shape,
    the layout a caption/embedding stage downstream would consume). STUB
    frame extraction (byte slicing) with real fan-out plumbing; a real
    deploy swaps the slicer for ffmpeg keyframe extraction."""
    ds = make_payload_table(sf_dir)

    def sample(batch: pa.Table) -> pa.Table:
        ids_out, fidx_out, off_out, sum_out = [], [], [], []
        for did, p in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
            n_frames = max(1, len(p) // frame_bytes)
            taken = 0
            for fi in range(0, n_frames, every_n):
                if taken >= max_frames:
                    break
                frame = p[fi * frame_bytes : (fi + 1) * frame_bytes]
                ids_out.append(did)
                fidx_out.append(fi)
                off_out.append(fi * frame_bytes)
                sum_out.append(hashlib.md5(frame).hexdigest())
                taken += 1
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(fidx_out, pa.int64()),
                "byte_offset": pa.array(off_out, pa.int64()),
                "frame_checksum": pa.array(sum_out, pa.string()),
            }
        )

    out = ds.map_batches(sample, batch_format="pyarrow", batch_size=64).to_pandas()
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
