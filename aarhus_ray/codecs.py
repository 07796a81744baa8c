"""Index-encoding kernels: delta, Stream-VByte, LEB128 varint, block-max
skip lists (BASELINE.json:6 "delta + varint (Stream-VByte) compressed docID
gaps and block-max skip lists"). Pure NumPy, fully vectorized — no Ray here.

Stream-VByte (Lemire et al., "Stream VByte: faster byte-oriented integer
compression") splits control bits from data bytes: one control byte packs
four 2-bit length codes; the data stream holds each value's low bytes
little-endian. We use the 64-bit-capable **1-2-4-8 variant** (code c → the
value occupies 2**c bytes), because docIDs here are uint64
(``(partition_id << 40) | row``, SURVEY.md §1.3) and gaps across partition
boundaries exceed 32 bits. tf runs use classic LEB128 varint.

Posting-list blob format (frozen; per term):
    repeat per block of <=SKIP_BLOCK postings:
        u32  docs_nbytes
        svb  gaps of doc_ids   (gap 0 of block k = doc_id - last_doc_id of
                                block k-1; for block 0, the absolute doc_id)
        leb  tfs               (one varint per posting in the block)
Blocks decode independently given the previous block's last doc_id, which is
exactly what the skip list stores — so Block-Max WAND can jump.

Skip-list blob format (frozen; per term): n_blocks records of
    (last_doc_id: <u8, byte_offset: <u8, count: <u4, block_max_score: <f8)
where byte_offset points at the block's u32 length prefix in the postings
blob and count is the number of postings in the block.
"""

from __future__ import annotations

import sys

import numpy as np

from . import K1, B, SKIP_BLOCK

assert sys.byteorder == "little", "codecs assume a little-endian host"

_U8 = np.uint64
SKIP_DTYPE = np.dtype(
    [("last_doc_id", "<u8"), ("offset", "<u8"), ("count", "<u4"), ("max_score", "<f8")]
)


# ---------------------------------------------------------------- delta

def delta_encode(sorted_vals: np.ndarray, base: int = 0) -> np.ndarray:
    """Gaps of an ascending uint64 array; first gap is vs ``base``."""
    v = np.asarray(sorted_vals, dtype=np.uint64)
    out = np.empty_like(v)
    if len(v):
        out[0] = v[0] - _U8(base)
        np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray, base: int = 0) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64) + _U8(base)


# ---------------------------------------------------------------- Stream-VByte (1-2-4-8)

_SVB_LEN = np.array([1, 2, 4, 8], dtype=np.int64)


def svb_encode(values: np.ndarray) -> bytes:
    """Encode uint64 values → control stream || data stream."""
    v = np.ascontiguousarray(values, dtype="<u8")
    n = len(v)
    if n == 0:
        return b""
    codes = np.zeros(n, dtype=np.uint8)
    codes[v > 0xFF] = 1
    codes[v > 0xFFFF] = 2
    codes[v > 0xFFFFFFFF] = 3
    lens = _SVB_LEN[codes]
    pad = (-n) % 4
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, np.uint8)])
    q = codes.reshape(-1, 4)
    control = (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6)).astype(np.uint8)
    bytes8 = v.view(np.uint8).reshape(n, 8)
    mask = np.arange(8)[None, :] < lens[:, None]
    return control.tobytes() + bytes8[mask].tobytes()


def svb_decode(buf: bytes | np.ndarray, n: int) -> np.ndarray:
    """Decode n uint64 values from an svb_encode blob."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    nc = (n + 3) // 4
    control = raw[:nc]
    data = raw[nc:]
    codes = np.empty(nc * 4, dtype=np.uint8)
    codes[0::4] = control & 3
    codes[1::4] = (control >> 2) & 3
    codes[2::4] = (control >> 4) & 3
    codes[3::4] = (control >> 6) & 3
    lens = _SVB_LEN[codes[:n]]
    ends = np.cumsum(lens)
    out = np.zeros((n, 8), dtype=np.uint8)
    mask = np.arange(8)[None, :] < lens[:, None]
    out[mask] = data[: ends[-1]]
    return out.view("<u8").ravel().astype(np.uint64, copy=False)


def svb_encoded_size(buf_or_lens) -> int:
    return len(buf_or_lens)


# ---------------------------------------------------------------- LEB128 varint

_MAX_VARINT_BYTES = 10


def varint_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, _MAX_VARINT_BYTES):
        nb += v >= _U8(1 << (7 * k))
    out = np.zeros((n, _MAX_VARINT_BYTES), dtype=np.uint8)
    for k in range(_MAX_VARINT_BYTES):
        np.bitwise_and(v >> _U8(7 * k), _U8(0x7F), casting="unsafe", out=out[:, k])
    cont = np.arange(_MAX_VARINT_BYTES)[None, :] < (nb - 1)[:, None]
    out |= cont.astype(np.uint8) << 7
    sel = np.arange(_MAX_VARINT_BYTES)[None, :] < nb[:, None]
    return out[sel].tobytes()


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    data = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(data) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (data & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    out = np.zeros(len(ends), dtype=np.uint64)
    for k in range(int(lens.max())):
        m = lens > k
        out[m] |= (data[starts[m] + k].astype(np.uint64) & _U8(0x7F)) << _U8(7 * k)
    return out


# ---------------------------------------------------------------- posting blobs

def tf_upper_bound(tf, idf: float) -> float | np.ndarray:
    """dl-independent BM25 upper bound for a tf (the standard BMW bound:
    minimize the denominator over dl → k1*(1-b))."""
    tf = np.asarray(tf, dtype=np.float64)
    return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B))


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, idf: float) -> tuple[bytes, bytes]:
    """(sorted doc_ids, tfs, global idf) → (postings_blob, skips_blob)."""
    n = len(doc_ids)
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    n_blocks = (n + SKIP_BLOCK - 1) // SKIP_BLOCK
    skips = np.zeros(n_blocks, dtype=SKIP_DTYPE)
    parts: list[bytes] = []
    offset = 0
    prev_last = 0
    for bi in range(n_blocks):
        lo, hi = bi * SKIP_BLOCK, min(n, (bi + 1) * SKIP_BLOCK)
        gaps = delta_encode(doc_ids[lo:hi], base=prev_last)
        docs_blob = svb_encode(gaps)
        tf_blob = varint_encode(tfs[lo:hi])
        parts.append(np.uint32(len(docs_blob)).tobytes())
        parts.append(docs_blob)
        parts.append(tf_blob)
        skips[bi]["last_doc_id"] = doc_ids[hi - 1]
        skips[bi]["offset"] = offset
        skips[bi]["count"] = hi - lo
        skips[bi]["max_score"] = tf_upper_bound(int(tfs[lo:hi].max()), idf)
        offset += 4 + len(docs_blob) + len(tf_blob)
        prev_last = int(doc_ids[hi - 1])
    return b"".join(parts), skips.tobytes()


def decode_block(postings: memoryview | bytes, skip_entry, prev_last: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block given its skip entry and the previous block's last
    doc_id. Returns (doc_ids, tfs)."""
    off = int(skip_entry["offset"])
    cnt = int(skip_entry["count"])
    raw = np.frombuffer(postings, dtype=np.uint8)
    docs_nbytes = int.from_bytes(raw[off : off + 4].tobytes(), "little")
    gaps = svb_decode(raw[off + 4 : off + 4 + docs_nbytes], cnt)
    doc_ids = delta_decode(gaps, base=prev_last)
    # tf varints self-delimit: decode from after the docs blob up to the
    # block end; varint_decode stops exactly at cnt values because the tf
    # stream is the remainder of the block.
    tf_start = off + 4 + docs_nbytes
    tfs = _decode_tfs(raw, tf_start, cnt)
    return doc_ids, tfs


def _decode_tfs(raw: np.ndarray, start: int, cnt: int) -> np.ndarray:
    # Scan continuation bits to find the end of cnt varints; bound the scan
    # to cnt * max-varint-width so per-block decode stays O(block), not O(list).
    seg = raw[start : start + cnt * _MAX_VARINT_BYTES]
    last_flags = (seg & 0x80) == 0
    ends = np.flatnonzero(last_flags)
    stop = ends[cnt - 1] + 1
    return varint_decode(seg[:stop])


def decode_postings(postings: bytes, skips_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Full-list decode (used by merges and the brute-force scorer)."""
    skips = np.frombuffer(skips_blob, dtype=SKIP_DTYPE)
    all_docs, all_tfs = [], []
    prev_last = 0
    for entry in skips:
        d, t = decode_block(postings, entry, prev_last)
        all_docs.append(d)
        all_tfs.append(t)
        prev_last = int(entry["last_doc_id"])
    if not all_docs:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    return np.concatenate(all_docs), np.concatenate(all_tfs)
