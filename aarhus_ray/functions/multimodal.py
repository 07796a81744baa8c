"""Multimodal-column plumbing (opaque binary payloads + typed metadata).

The sandbox has no image/audio codec LIBRARIES, so the generic decode is a
DETERMINISTIC FAKE (clearly marked below) — but two formats need none, so
they run REAL codecs end-to-end: P6 PPM (images, `ppm_*`) and RIFF/WAVE
16-bit PCM (audio, `wav_*`), each a genuine parser with validation and
error paths. For everything else the Ray-side plumbing is real and tested:
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


PH_BITS = 64
PH_BANDS = 9   # pigeonhole: <= PH_T bit errors across 9 bands leave one intact
PH_T = 8       # hamming threshold for a near-dup pair
_PH_OFF = [(b * PH_BITS) // PH_BANDS for b in range(PH_BANDS + 1)]


def _phash_batch(batch: pa.Table) -> pa.Table:
    """Per-doc 64-bit perceptual hash of the binary payload (the aHash
    recipe a real image pipeline runs on decoded luma, frozen here on the
    raw bytes): split the byte stream into 64 cells by index
    (cell = idx*64 // n), bit c set iff cell mean > global mean —
    compared in exact integer cross-multiplied form
    (cell_sum * n > total * cell_len), so any engine replays it."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    payloads = batch["payload"].to_pylist()
    hashes = np.empty(len(ids), dtype=np.uint64)
    for i, p in enumerate(payloads):
        a = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
        n = len(a)
        if n == 0:
            hashes[i] = 0
            continue
        cell = np.arange(n, dtype=np.int64) * PH_BITS // n
        cs = np.bincount(cell, weights=a, minlength=PH_BITS).astype(np.int64)
        cl = np.bincount(cell, minlength=PH_BITS).astype(np.int64)
        bits = (cs * n) > (int(a.sum()) * cl)
        hashes[i] = np.dot(bits.astype(np.uint64), np.left_shift(np.uint64(1), np.arange(PH_BITS, dtype=np.uint64)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "phash": pa.array(hashes.view(np.int64), pa.int64()),
        }
    )


def _phash_band_rows(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    ph = batch["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
    rows_id, rows_key, rows_ph = [], [], []
    for b in range(PH_BANDS):
        off, size = _PH_OFF[b], _PH_OFF[b + 1] - _PH_OFF[b]
        val = (ph >> np.uint64(off)) & np.uint64((1 << size) - 1)
        key = (np.uint64(b) << np.uint64(56)) | val
        rows_id.append(ids)
        rows_key.append(key.view(np.int64))
        rows_ph.append(ph.view(np.int64))
    return pa.table(
        {
            "band_key": pa.array(np.concatenate(rows_key), pa.int64()),
            "doc_id": pa.array(np.concatenate(rows_id), pa.int64()),
            "phash": pa.array(np.concatenate(rows_ph), pa.int64()),
        }
    )


def _phash_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    rows = []
    recs = sorted(zip(g["doc_id"].astype(int), g["phash"].astype(np.int64).to_numpy().view(np.uint64)))
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            if recs[i][0] == recs[j][0]:
                continue
            h = bin(int(recs[i][1]) ^ int(recs[j][1])).count("1")
            if h <= PH_T:
                rows.append((recs[i][0], recs[j][0], h))
    return pd.DataFrame(
        {
            "doc_a": pd.Series([r[0] for r in rows], dtype="int64"),
            "doc_b": pd.Series([r[1] for r in rows], dtype="int64"),
            "hamming": pd.Series([r[2] for r in rows], dtype="int64"),
        }
    )


def phash_pairs(sf_dir: str) -> pd.DataFrame:
    """Binary-payload near-dup pairs by perceptual hash + banded LSH
    (the image-dedup shape of the MinHash pipeline): 64-bit aHash per
    payload, PH_BANDS band keys per doc, ``groupby(band_key)`` count →
    hot buckets → per-bucket pair expansion with an in-reducer hamming
    verify. COMPLETE by pigeonhole: ≤ PH_T bit errors across PH_BANDS >
    PH_T bands leave at least one band identical, so every pair with
    hamming ≤ PH_T shares a bucket — the banding only bounds the
    exchange, exactly the Misra-Gries/MinHash contract. Output
    (doc_a < doc_b, hamming) sorted; the SQL oracle replays the full
    hash (ASCII payloads → ascii(substr()) byte sums) and brute-forces
    the pair scan."""
    import pyarrow.compute as pc

    hashed = (
        make_payload_table(sf_dir)
        .repartition(16)
        .map_batches(_phash_batch, batch_format="pyarrow")
    )
    banded = hashed.map_batches(_phash_band_rows, batch_format="pyarrow").materialize()
    counts = banded.groupby("band_key").count()
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["count()"], pa.scalar(2, pa.int64()))),
        batch_format="pyarrow",
    ).to_pandas()
    if len(hot) == 0:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
    hot_keys = pa.array(sorted(hot["band_key"].tolist()), pa.int64())
    raw = (
        banded.map_batches(
            lambda t: t.filter(pc.is_in(t["band_key"], value_set=hot_keys)),
            batch_format="pyarrow",
        )
        .groupby("band_key")
        .map_groups(_phash_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    # the verified pair stream is small by LSH construction (bounded by
    # true near-dups + banding false positives) — dedup it driver-side
    if len(raw) == 0:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
    pairs = (
        raw.groupby(["doc_a", "doc_b"], as_index=False)["hamming"].max()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    for c in pairs.columns:
        pairs[c] = pairs[c].astype("int64")
    return pairs


def phash_table(sf_dir: str) -> pd.DataFrame:
    """The per-payload 64-bit perceptual hash as a first-class output
    (doc_id, phash, n_bytes): the artifact an image-dedup pipeline
    persists and joins against (the pairing machinery over it is
    ``phash_pairs``; on this corpus the aHash spectrum has no pairs
    under PH_T — verified, and pinned by the planted-fixture pair test).
    The SQL oracle rebuilds every bit: ASCII payloads let ascii(substr())
    replay the byte stream, the cell split is closed-form integer
    arithmetic, and the bit assembly is a bit_or of BIGINT shifts —
    bit 63 wraps to the sign bit identically in numpy's int64 view."""
    out = (
        make_payload_table(sf_dir)
        .repartition(16)
        .map_batches(_phash_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    out = out.merge(docs.rename(columns={"n_chars": "n_bytes"}), on="doc_id")
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out[["doc_id", "phash", "n_bytes"]]


# ---- REAL image codec path (PPM P6) -------------------------------------
# The sandbox has no compressed-image codecs, but PPM P6 is a real,
# fully-specified binary image format needing none — so this family's
# decode/resize are REAL codec work (header parse, raster reshape, NN
# index math), not fakes. The pixel CONTENT is a SQL-replayable recipe
# (pixel i of doc d = (d·PPM_A + i·PPM_B) mod 256), so DuckDB verifies
# the decoded pixel math end-to-end without ever seeing the bytes.
# JPEG/PNG remain the documented real-deploy swap (same actor shape).

PPM_W, PPM_H = 16, 12
PPM_A, PPM_B = 2654435761, 40503  # Knuth/Fibonacci odd constants (frozen)


def ppm_encode(doc_id: int) -> bytes:
    """Deterministic P6 image for one doc: header + raw RGB raster whose
    byte i is (doc_id·PPM_A + i·PPM_B) mod 256."""
    n = PPM_W * PPM_H * 3
    i = np.arange(n, dtype=np.int64)
    # doc_id reduced mod 256 BEFORE the multiply (congruent, so emitted
    # bytes are unchanged) — keeps the recipe int64/BIGINT-exact at any
    # corpus scale instead of wrapping at doc_id ≳ 3.5e9 (the geo_point
    # overflow rule; cf. WAV's d mod 2^16)
    vals = (((doc_id % 256) * PPM_A + i * PPM_B) % 256).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (PPM_W, PPM_H) + vals.tobytes()


def ppm_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL P6 decoder: parse the whitespace-delimited header (magic,
    width, height, maxval; ``#`` comments allowed per spec), then reshape
    the raster. Raises on malformed input — a codec, not a checksum."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, raster.reshape(h, w, 3)


def make_ppm_table(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, payload: binary) with REAL P6 PPM bytes per doc."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_ppm(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array([ppm_encode(int(d)) for d in ids], pa.binary()),
            }
        )

    return ds.map_batches(to_ppm, batch_format="pyarrow")


class PpmDecodeUDF:
    """Actor-pool REAL-decode stage: P6 bytes → per-channel integer sums.
    The codec "loads" in __init__ (where PIL/ffmpeg would); batches stay
    small because payloads are wide."""

    def __init__(self):
        self.decode = ppm_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)}
        ws, hs, sums = [], [], []
        for p in batch["payload"].to_pylist():
            w, h, img = self.decode(p)
            ws.append(w)
            hs.append(h)
            sums.append(img.astype(np.int64).sum(axis=(0, 1)))
        s = np.asarray(sums, dtype=np.int64).reshape(-1, 3)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "sum_r": pa.array(s[:, 0], pa.int64()),
                "sum_g": pa.array(s[:, 1], pa.int64()),
                "sum_b": pa.array(s[:, 2], pa.int64()),
            }
        )


def ppm_decode_stats(sf_dir: str) -> pd.DataFrame:
    """Real-codec decode pipeline: synthesize P6 bytes → actor-pool
    decode → per-image channel sums, verified pixel-exactly by the SQL
    recipe replay (the bytes round-trip through a genuine encoder and
    parser in between — corrupt either and the hash breaks)."""
    out = (
        make_ppm_table(sf_dir)
        .map_batches(PpmDecodeUDF, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def ppm_resize_stats(sf_dir: str) -> pd.DataFrame:
    """Real nearest-neighbor resize to half size: decode P6, take pixels
    at (2y, 2x) — true index math on a true raster — then channel sums of
    the (H/2)×(W/2) output, SQL-replayed via the source-index recipe."""

    class ResizeNN:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            sums = []
            for p in batch["payload"].to_pylist():
                w, h, img = ppm_decode(p)
                half = img[0:h:2, 0:w:2, :]
                sums.append(half.astype(np.int64).sum(axis=(0, 1)))
            s = np.asarray(sums, dtype=np.int64).reshape(-1, 3)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "out_w": pa.array(np.full(len(ids), PPM_W // 2), pa.int64()),
                    "out_h": pa.array(np.full(len(ids), PPM_H // 2), pa.int64()),
                    "sum_r": pa.array(s[:, 0], pa.int64()),
                    "sum_g": pa.array(s[:, 1], pa.int64()),
                    "sum_b": pa.array(s[:, 2], pa.int64()),
                }
            )

    out = (
        make_ppm_table(sf_dir)
        .map_batches(ResizeNN, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# ---- REAL audio codec: RIFF/WAVE 16-bit PCM (round 4) ----------------------
# Same honest pattern as the P6 path above: WAV needs no external codec, so
# the engine synthesizes a REAL RIFF container (fmt chunk, a skippable
# LIST/INFO chunk, data chunk) around a deterministic SQL-replayable signal
# — sample i of doc d is ((d mod 2^16)·WAV_A + i·WAV_B) mod 2^16 − 2^15 —
# then parses it back with a genuine chunk-walking parser (validates magic,
# PCM format, bit depth; skips unknown chunks with odd-size padding per the
# RIFF spec; raises on malformed input). The integer features (sum|s|, peak,
# zero crossings, per-frame energy) certify the encode→parse→math path
# end-to-end; MP3/FLAC remain the documented real-deploy swap in the same
# actor shape. doc_id is reduced mod 2^16 BEFORE the multiply, so the recipe
# stays exact in int64/BIGINT at any corpus scale (cf. the geo_point fix).

WAV_SR = 8000
WAV_N = 256  # samples per doc (mono, 16-bit)
WAV_A, WAV_B = 2246822519, 3266489917  # xxhash64 primes 2/3 (frozen)
WAV_FRAME = 64  # frame length for the windowed-energy op


def wav_samples(doc_id: int) -> np.ndarray:
    """The frozen synthetic signal for one doc, int16."""
    i = np.arange(WAV_N, dtype=np.int64)
    vals = ((doc_id % 65536) * WAV_A + i * WAV_B) % 65536 - 32768
    return vals.astype(np.int16)


def wav_encode(doc_id: int) -> bytes:
    """REAL RIFF/WAVE container: fmt_ chunk (PCM, mono, 16-bit), a LIST/INFO
    chunk the decoder must SKIP (proves chunk walking, including the odd-size
    pad byte), then the data chunk with little-endian int16 samples."""
    import struct

    data = wav_samples(doc_id).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_SR, WAV_SR * 2, 2, 16)
    info = b"INFOISFT" + struct.pack("<I", 7) + b"aarhus\x00"  # 7 is odd: pad
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL chunk-walking WAV parser: validates RIFF/WAVE magic, walks
    (id, size) chunks honoring the odd-size pad byte, requires fmt_ before
    data, and rejects non-PCM / non-16-bit / truncated input. Returns
    (sample_rate, int16 samples). A codec, not a checksum."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # odd sizes are padded per RIFF
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sr, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported (non-PCM) audio format {audio_format}")
    if channels != 1 or bits != 16:
        raise ValueError(f"unsupported layout: {channels}ch {bits}-bit")
    if len(data) % 2:
        raise ValueError("data chunk is not whole int16 samples")
    return sr, np.frombuffer(data, dtype="<i2")


def make_wav_table(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, payload: binary) with REAL RIFF/WAVE bytes per doc."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_wav(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array([wav_encode(int(d)) for d in ids], pa.binary()),
            }
        )

    return ds.map_batches(to_wav, batch_format="pyarrow")


class WavDecodeUDF:
    """Actor-pool REAL-decode stage: WAV bytes → integer signal features.
    zero_crossings counts sign-bit changes ((s[i-1]<0) != (s[i]<0)) so the
    SQL replay is branch-free and exact."""

    def __init__(self):
        self.decode = wav_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        srs, ns, sums, peaks, zcs = [], [], [], [], []
        for p in batch["payload"].to_pylist():
            sr, s = self.decode(p)
            a = np.abs(s.astype(np.int64))
            neg = s < 0
            srs.append(sr)
            ns.append(len(s))
            sums.append(int(a.sum()))
            peaks.append(int(a.max()))
            zcs.append(int(np.count_nonzero(neg[1:] != neg[:-1])))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(srs, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "sum_abs": pa.array(sums, pa.int64()),
                "peak": pa.array(peaks, pa.int64()),
                "zero_crossings": pa.array(zcs, pa.int64()),
            }
        )


def wav_decode_stats(sf_dir: str) -> pd.DataFrame:
    """Real-audio-codec pipeline: synthesize RIFF bytes → actor-pool
    chunk-walking decode → per-doc integer signal features, verified
    sample-exactly by the SQL recipe replay (corrupt the encoder, the
    parser, or the feature math and the hash breaks)."""
    out = (
        make_wav_table(sf_dir)
        .map_batches(WavDecodeUDF, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def wav_frame_energy(sf_dir: str) -> pd.DataFrame:
    """Windowed feature extraction on the decoded signal (the VAD/energy
    shape): non-overlapping frames of WAV_FRAME samples → per-frame
    sum|s| and peak. One output row per (doc, frame); frame math is true
    index arithmetic on the parsed samples, SQL-replayed via i // frame."""

    class FrameEnergy:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            nf = WAV_N // WAV_FRAME
            out_id, out_fr, out_sum, out_peak = [], [], [], []
            for d, p in zip(ids, batch["payload"].to_pylist()):
                _, s = wav_decode(p)
                a = np.abs(s.astype(np.int64)).reshape(nf, WAV_FRAME)
                out_id.extend([int(d)] * nf)
                out_fr.extend(range(nf))
                out_sum.extend(a.sum(axis=1).tolist())
                out_peak.extend(a.max(axis=1).tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "frame": pa.array(out_fr, pa.int64()),
                    "sum_abs": pa.array(out_sum, pa.int64()),
                    "peak": pa.array(out_peak, pa.int64()),
                }
            )

    out = (
        make_wav_table(sf_dir)
        .map_batches(FrameEnergy, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 4))
        .to_pandas()
        .sort_values(["doc_id", "frame"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# ---- REAL video container: YUV4MPEG2 / Y4M, 4:2:0 planar (round 4) ---------
# The video leg of the op-164/170 pattern: Y4M is a fully-specified
# uncompressed container (mjpegtools/ffmpeg interchange format) needing no
# codec — a tokenized ASCII stream header (`YUV4MPEG2 W.. H.. F..:.. Ip
# A1:1 C420jpeg\n`), then per frame a `FRAME` line (with optional
# x-parameters a parser must skip) followed by the raw planar Y/U/V raster.
# The engine synthesizes honest Y4M bytes around a SQL-replayable recipe —
# byte j of frame f of doc d = ((d mod 256)·Y4M_A + f·Y4M_C + j·Y4M_B)
# mod 256 over the concatenated Y|U|V planes — parses them back with a
# genuine tokenizing parser (validates magic/colorspace, skips unknown
# header and frame parameters, raises on truncation), and emits integer
# per-plane and per-sampled-frame features. H.264/VP9 remain the
# documented real-deploy swap in the same actor shape. doc_id is reduced
# mod 256 BEFORE the multiply (the geo_point overflow rule), so the
# recipe stays exact in int64/BIGINT at any corpus scale.

Y4M_W, Y4M_H = 16, 8
Y4M_FRAMES = 6
Y4M_FPS = (25, 1)
Y4M_A, Y4M_B, Y4M_C = 2654435761, 40503, 2246822519  # frozen odd constants
Y4M_YBYTES = Y4M_W * Y4M_H                 # 128
Y4M_CBYTES = (Y4M_W // 2) * (Y4M_H // 2)   # 32 per chroma plane (4:2:0)
Y4M_FBYTES = Y4M_YBYTES + 2 * Y4M_CBYTES   # 192 bytes per frame
Y4M_STRIDE = 2  # frame-sampling stride for the frames op


def y4m_frame_bytes(doc_id: int, frame: int) -> np.ndarray:
    """The frozen synthetic Y|U|V raster for one frame, uint8."""
    j = np.arange(Y4M_FBYTES, dtype=np.int64)
    vals = ((doc_id % 256) * Y4M_A + frame * Y4M_C + j * Y4M_B) % 256
    return vals.astype(np.uint8)


def y4m_encode(doc_id: int) -> bytes:
    """REAL YUV4MPEG2 container: tokenized stream header (including the
    interlace/aspect tokens a parser must tolerate), then per frame a
    FRAME line — even frames carry an x-parameter the decoder must skip —
    followed by the raw 4:2:0 planar raster."""
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n" % (
        Y4M_W, Y4M_H, Y4M_FPS[0], Y4M_FPS[1],
    )
    parts = [head]
    for f in range(Y4M_FRAMES):
        parts.append(b"FRAME Xaarhus\n" if f % 2 == 0 else b"FRAME\n")
        parts.append(y4m_frame_bytes(doc_id, f).tobytes())
    return b"".join(parts)


def y4m_decode(payload: bytes) -> tuple[int, int, int, int, list[np.ndarray]]:
    """REAL tokenizing Y4M parser: validates the YUV4MPEG2 magic, reads
    the W/H/F header tokens (skipping I/A/X and other unknown tokens per
    spec), requires a 4:2:0 colorspace, then walks FRAME lines — skipping
    frame-level x-parameters — and slices exact plane-sized rasters.
    Raises on bad magic, unsupported colorspace, malformed FRAME lines,
    or truncated rasters. Returns (w, h, fps_num, fps_den, frames) with
    each frame the concatenated Y|U|V bytes as uint8."""
    nl = payload.index(b"\n")
    tokens = payload[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps_num, fps_den = 30, 1
    cspace = b"420jpeg"  # the spec default when C is absent
    for tok in tokens[1:]:
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif key == b"C":
            cspace = val
        # I (interlace), A (aspect), X (extensions): tolerated, ignored
    if w is None or h is None:
        raise ValueError("missing W or H header token")
    if not cspace.startswith(b"420"):
        raise ValueError(f"unsupported colorspace C{cspace.decode()}")
    fbytes = w * h + 2 * ((w // 2) * (h // 2))
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        line = payload[pos:fnl]
        if line != b"FRAME" and not line.startswith(b"FRAME "):
            raise ValueError(f"malformed FRAME line {line[:20]!r}")
        raster = payload[fnl + 1 : fnl + 1 + fbytes]
        if len(raster) < fbytes:
            raise ValueError("truncated frame raster")
        frames.append(np.frombuffer(raster, dtype=np.uint8))
        pos = fnl + 1 + fbytes
    return w, h, fps_num, fps_den, frames


def make_y4m_table(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, payload: binary) with REAL Y4M bytes per doc."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_y4m(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array([y4m_encode(int(d)) for d in ids], pa.binary()),
            }
        )

    return ds.map_batches(to_y4m, batch_format="pyarrow")


class Y4mDecodeUDF:
    """Actor-pool REAL-decode stage: Y4M bytes → per-plane integer sums
    over all frames (the whole-clip feature shape)."""

    def __init__(self):
        self.decode = y4m_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ws, hs, fns, fds, nfs, sy, su, sv = [], [], [], [], [], [], [], []
        for p in batch["payload"].to_pylist():
            w, h, fn, fd, frames = self.decode(p)
            ws.append(w)
            hs.append(h)
            fns.append(fn)
            fds.append(fd)
            nfs.append(len(frames))
            m = np.stack(frames).astype(np.int64)
            yb, cb = w * h, (w // 2) * (h // 2)
            sy.append(int(m[:, :yb].sum()))
            su.append(int(m[:, yb : yb + cb].sum()))
            sv.append(int(m[:, yb + cb :].sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "fps_num": pa.array(fns, pa.int64()),
                "fps_den": pa.array(fds, pa.int64()),
                "n_frames": pa.array(nfs, pa.int64()),
                "sum_y": pa.array(sy, pa.int64()),
                "sum_u": pa.array(su, pa.int64()),
                "sum_v": pa.array(sv, pa.int64()),
            }
        )


def y4m_decode_stats(sf_dir: str) -> pd.DataFrame:
    """Real-video-container pipeline: synthesize Y4M bytes → actor-pool
    tokenizing decode → per-doc per-plane integer sums across all frames,
    verified byte-exactly by the SQL recipe replay (corrupt the encoder,
    the parser, the plane slicing, or the sums and the hash breaks)."""
    out = (
        make_y4m_table(sf_dir)
        .map_batches(Y4mDecodeUDF, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def y4m_frame_luma(sf_dir: str, stride: int = Y4M_STRIDE) -> pd.DataFrame:
    """Frame sampling on the decoded clip (the keyframe-extraction shape):
    every ``stride``-th frame → per (doc, frame) luma sum and peak. The
    sampling is true index arithmetic on the PARSED frame list, and the
    luma slice is the real Y-plane prefix of the 4:2:0 raster."""

    class FrameLuma:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            out_id, out_fr, out_sum, out_peak = [], [], [], []
            for d, p in zip(ids, batch["payload"].to_pylist()):
                w, h, _, _, frames = y4m_decode(p)
                yb = w * h
                for f in range(0, len(frames), stride):
                    yplane = frames[f][:yb].astype(np.int64)
                    out_id.append(int(d))
                    out_fr.append(f)
                    out_sum.append(int(yplane.sum()))
                    out_peak.append(int(yplane.max()))
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "frame": pa.array(out_fr, pa.int64()),
                    "sum_y": pa.array(out_sum, pa.int64()),
                    "peak_y": pa.array(out_peak, pa.int64()),
                }
            )

    out = (
        make_y4m_table(sf_dir)
        .map_batches(FrameLuma, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 4))
        .to_pandas()
        .sort_values(["doc_id", "frame"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out
