"""Posting-list construction + salted-key merge + segment assembly
(BASELINE.json:6 — "per-partition posting-list construction with delta +
varint (Stream-VByte) compressed docID gaps and block-max skip lists; a
groupby(term)-aggregate shuffle with salted-key skew splitting merges
partial postings into globally sorted segments").

Three Ray stages:

1. ``PostingsEncoder`` (actor pool, map_batches): docs batch → one encoded
   partial row per (term, salt) present in the batch. Partials are
   pre-aggregated and compressed BEFORE the shuffle (SURVEY.md §4.1), so the
   all-to-all moves ~10× less than raw (term, doc, tf) triples.
   Heavy (Zipf-head) terms get ``salt = pid * n_salts // P`` — a function of
   the doc partition, NOT random — so each salt shard owns a contiguous,
   already-sorted docID subrange and the final assembly is pure
   concatenation (SURVEY.md §4.2). Light terms use salt 0. The shuffle key
   is ``bucket = blake2b64(term || salt) % n_shards`` so each heavy term's
   shards land on different reducers.

2. ``MergeShard`` (groupby("bucket").map_groups): merge all partials of each
   (term, salt) into one superpartial. Python loops only over distinct terms
   in the bucket; decode/concat/encode are NumPy.

3. ``AssembleSegment`` (groupby("seg_id").map_groups): per term-range
   segment, concatenate superpartials in (salt, min_doc_id) order, compute
   global df → idf → block-max skips, write ``dict.parquet`` /
   ``postings.bin`` / ``skips.bin`` atomically, emit a manifest row.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .. import codecs
from ..bm25 import idf as idf_fn
from ..partition import DOC_ID_PARTITION_SHIFT, hash64
from ..textnorm import tokenize_batch
from ..state import manifest as mf

PARTIAL_COLUMNS = [
    "term", "seg_id", "salt", "bucket", "min_doc_id",
    "doc_ids", "tfs", "df_partial", "max_tf",
]


def seg_dir(out_dir: str, seg_id: int) -> str:
    return os.path.join(out_dir, "segments", f"seg={seg_id:04d}")


class PostingsEncoder:
    """Actor-pool stage: (doc_id, text) batches → encoded partial postings."""

    def __init__(
        self,
        boundaries: list[str],
        heavy_terms: list[str],
        num_partitions: int,
        n_salts: int,
        n_shards: int,
    ):
        self.boundaries = np.array(boundaries, dtype=object)
        self.heavy = frozenset(heavy_terms)
        self.P = num_partitions
        self.n_salts = max(1, n_salts)
        self.n_shards = max(1, n_shards)

    def _salt_of_pid(self, pids: np.ndarray) -> np.ndarray:
        return (pids.astype(np.uint64) * np.uint64(self.n_salts) // np.uint64(self.P)).astype(
            np.uint32
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        token_lists = tokenize_batch(batch["text"].to_pylist())
        counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(token_lists))
        flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in token_lists if t]) if counts.sum() else np.empty(0, object)
        flat_docs = np.repeat(doc_ids, counts)
        if len(flat_terms) == 0:
            return pa.Table.from_pylist([], schema=self._schema())
        df = pd.DataFrame({"term": flat_terms, "doc": flat_docs})
        tf = (
            df.groupby(["term", "doc"], sort=True, observed=True)
            .size()
            .reset_index(name="tf")
        )
        terms = tf["term"].to_numpy()
        docs = tf["doc"].to_numpy().astype(np.uint64)
        tfs = tf["tf"].to_numpy().astype(np.uint64)
        pids = (docs >> np.uint64(DOC_ID_PARTITION_SHIFT)).astype(np.uint32)
        salts = np.where(
            np.fromiter((t in self.heavy for t in terms), dtype=bool, count=len(terms)),
            self._salt_of_pid(pids),
            np.uint32(0),
        ).astype(np.uint32)
        # contiguous (term, salt) runs: `terms` is sorted; within a term,
        # docs ascend and salt is monotone in pid=doc>>40, so salt runs are
        # contiguous too.
        key_change = np.ones(len(terms), dtype=bool)
        key_change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
        starts = np.flatnonzero(key_change)
        ends = np.append(starts[1:], len(terms))
        rows = {k: [] for k in PARTIAL_COLUMNS}
        for s, e in zip(starts, ends):
            term = terms[s]
            salt = int(salts[s])
            d = docs[s:e]
            rows["term"].append(term)
            rows["seg_id"].append(int(np.searchsorted(self.boundaries, term, side="right")))
            rows["salt"].append(salt)
            rows["bucket"].append(hash64(f"{term}#{salt}") % self.n_shards)
            rows["min_doc_id"].append(int(d[0]))
            rows["doc_ids"].append(codecs.svb_encode(codecs.delta_encode(d)))
            rows["tfs"].append(codecs.varint_encode(tfs[s:e]))
            rows["df_partial"].append(e - s)
            rows["max_tf"].append(int(tfs[s:e].max()))
        return pa.table(
            {
                "term": pa.array(rows["term"], pa.string()),
                "seg_id": pa.array(rows["seg_id"], pa.uint32()),
                "salt": pa.array(rows["salt"], pa.uint32()),
                "bucket": pa.array(rows["bucket"], pa.uint32()),
                "min_doc_id": pa.array(rows["min_doc_id"], pa.uint64()),
                "doc_ids": pa.array(rows["doc_ids"], pa.binary()),
                "tfs": pa.array(rows["tfs"], pa.binary()),
                "df_partial": pa.array(rows["df_partial"], pa.uint32()),
                "max_tf": pa.array(rows["max_tf"], pa.uint32()),
            }
        )

    @staticmethod
    def _schema() -> pa.Schema:
        return pa.schema(
            [
                ("term", pa.string()),
                ("seg_id", pa.uint32()),
                ("salt", pa.uint32()),
                ("bucket", pa.uint32()),
                ("min_doc_id", pa.uint64()),
                ("doc_ids", pa.binary()),
                ("tfs", pa.binary()),
                ("df_partial", pa.uint32()),
                ("max_tf", pa.uint32()),
            ]
        )


def _decode_partial(doc_blob, tf_blob, n: int) -> tuple[np.ndarray, np.ndarray]:
    gaps = codecs.svb_decode(doc_blob, n)
    return codecs.delta_decode(gaps), codecs.varint_decode(tf_blob)


def _merge_rows(doc_blobs, tf_blobs, dfs, mins) -> tuple[np.ndarray, np.ndarray]:
    """Decode partials, concatenate in min_doc_id order; partials own
    disjoint docID ranges (each doc lives in exactly one batch/shard), so
    ordered concat is already sorted — verified, with argsort fallback."""
    order = np.argsort(np.asarray(mins, dtype=np.uint64), kind="stable")
    d_parts, t_parts = [], []
    for i in order:
        d, t = _decode_partial(doc_blobs[i], tf_blobs[i], int(dfs[i]))
        d_parts.append(d)
        t_parts.append(t)
    docs = np.concatenate(d_parts)
    tfs = np.concatenate(t_parts)
    if len(docs) > 1 and not np.all(docs[1:] > docs[:-1]):
        o = np.argsort(docs, kind="stable")
        docs, tfs = docs[o], tfs[o]
    return docs, tfs


class MergeShard:
    """groupby("bucket").map_groups — merge partials per (term, salt)."""

    __name__ = "MergeShard"  # map_groups wraps plain callables

    def __call__(self, group: pa.Table) -> pa.Table:
        tbl = group
        terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
        salts = tbl["salt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((salts, terms))
        doc_blobs = tbl["doc_ids"].to_pylist()
        tf_blobs = tbl["tfs"].to_pylist()
        dfs = tbl["df_partial"].to_numpy(zero_copy_only=False)
        mins = tbl["min_doc_id"].to_numpy(zero_copy_only=False)
        seg_ids = tbl["seg_id"].to_numpy(zero_copy_only=False)
        t_s, s_s = terms[order], salts[order]
        change = np.ones(len(order), dtype=bool)
        change[1:] = (t_s[1:] != t_s[:-1]) | (s_s[1:] != s_s[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(order))
        out = {k: [] for k in PARTIAL_COLUMNS}
        for s, e in zip(starts, ends):
            idx = order[s:e]
            docs, tfs = _merge_rows(
                [doc_blobs[i] for i in idx],
                [tf_blobs[i] for i in idx],
                dfs[idx],
                mins[idx],
            )
            out["term"].append(t_s[s])
            out["seg_id"].append(int(seg_ids[idx[0]]))
            out["salt"].append(int(s_s[s]))
            out["bucket"].append(0)
            out["min_doc_id"].append(int(docs[0]))
            out["doc_ids"].append(codecs.svb_encode(codecs.delta_encode(docs)))
            out["tfs"].append(codecs.varint_encode(tfs))
            out["df_partial"].append(len(docs))
            out["max_tf"].append(int(tfs.max()))
        return pa.table(
            {
                "term": pa.array(out["term"], pa.string()),
                "seg_id": pa.array(out["seg_id"], pa.uint32()),
                "salt": pa.array(out["salt"], pa.uint32()),
                "bucket": pa.array(out["bucket"], pa.uint32()),
                "min_doc_id": pa.array(out["min_doc_id"], pa.uint64()),
                "doc_ids": pa.array(out["doc_ids"], pa.binary()),
                "tfs": pa.array(out["tfs"], pa.binary()),
                "df_partial": pa.array(out["df_partial"], pa.uint32()),
                "max_tf": pa.array(out["max_tf"], pa.uint32()),
            }
        )


class AssembleSegment:
    """groupby("seg_id").map_groups — write one globally term-sorted segment.

    Resume-aware: if the segment directory already exists with a valid
    manifest entry, returns the existing manifest row without rewriting.
    """

    __name__ = "AssembleSegment"  # map_groups wraps plain callables

    def __init__(self, out_dir: str, n_docs: int, skip_segs: tuple[int, ...] = ()):  # noqa: D401
        self.out_dir = out_dir
        self.n_docs = n_docs
        self.skip_segs = frozenset(skip_segs)

    def __call__(self, group: pa.Table) -> pa.Table:
        timer = mf.StageTimer()
        sid = int(group["seg_id"][0].as_py())
        sdir = seg_dir(self.out_dir, sid)
        if sid in self.skip_segs and os.path.isdir(sdir):
            return self._manifest_table(sid, len(group), 0, 0, 0.0, "cached")
        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        salts = group["salt"].to_numpy(zero_copy_only=False)
        mins = group["min_doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((mins, salts, terms))
        doc_blobs = group["doc_ids"].to_pylist()
        tf_blobs = group["tfs"].to_pylist()
        dfs = group["df_partial"].to_numpy(zero_copy_only=False)
        t_s = terms[order]
        change = np.ones(len(order), dtype=bool)
        change[1:] = t_s[1:] != t_s[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(order))
        dict_rows = {
            "term": [], "df": [], "offset": [], "length": [],
            "skip_offset": [], "skip_length": [], "max_tf": [], "max_score": [],
        }
        postings_parts: list[bytes] = []
        skips_parts: list[bytes] = []
        p_off = 0
        s_off = 0
        for s, e in zip(starts, ends):
            idx = order[s:e]
            docs, tfs = _merge_rows(
                [doc_blobs[i] for i in idx],
                [tf_blobs[i] for i in idx],
                dfs[idx],
                mins[idx],
            )
            df = len(docs)
            term_idf = idf_fn(df, self.n_docs)
            blob, skips = codecs.encode_postings(docs, tfs, term_idf)
            max_tf = int(tfs.max())
            dict_rows["term"].append(t_s[s])
            dict_rows["df"].append(df)
            dict_rows["offset"].append(p_off)
            dict_rows["length"].append(len(blob))
            dict_rows["skip_offset"].append(s_off)
            dict_rows["skip_length"].append(len(skips))
            dict_rows["max_tf"].append(max_tf)
            dict_rows["max_score"].append(float(codecs.tf_upper_bound(max_tf, term_idf)))
            postings_parts.append(blob)
            skips_parts.append(skips)
            p_off += len(blob)
            s_off += len(skips)
        tmp = sdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        dict_tbl = pa.table(
            {
                "term": pa.array(dict_rows["term"], pa.string()),
                "df": pa.array(dict_rows["df"], pa.uint64()),
                "offset": pa.array(dict_rows["offset"], pa.uint64()),
                "length": pa.array(dict_rows["length"], pa.uint64()),
                "skip_offset": pa.array(dict_rows["skip_offset"], pa.uint64()),
                "skip_length": pa.array(dict_rows["skip_length"], pa.uint64()),
                "max_tf": pa.array(dict_rows["max_tf"], pa.uint32()),
                "max_score": pa.array(dict_rows["max_score"], pa.float64()),
            }
        )
        pq.write_table(dict_tbl, os.path.join(tmp, "dict.parquet"))
        with open(os.path.join(tmp, "postings.bin"), "wb") as f:
            f.write(b"".join(postings_parts))
        with open(os.path.join(tmp, "skips.bin"), "wb") as f:
            f.write(b"".join(skips_parts))
        if os.path.isdir(sdir):
            import shutil

            shutil.rmtree(sdir)
        os.replace(tmp, sdir)
        checksum = mf.file_checksum(os.path.join(sdir, "postings.bin"))
        bytes_out = sum(
            os.path.getsize(os.path.join(sdir, f))
            for f in ("dict.parquet", "postings.bin", "skips.bin")
        )
        row = mf.ManifestRow(
            stage="segment",
            partition_id=sid,
            input_rows=len(group),
            output_rows=len(starts),
            bytes_out=bytes_out,
            wall_s=timer.elapsed(),
            checksum=checksum,
            status="done",
        )
        mf.append_manifest(self.out_dir, row)
        return self._manifest_table(sid, len(group), len(starts), bytes_out, row.wall_s, "done", checksum)

    @staticmethod
    def _manifest_table(sid, in_rows, out_rows, bytes_out, wall_s, status, checksum=""):
        return pa.table(
            {
                "stage": ["segment"],
                "partition_id": pa.array([sid], pa.uint32()),
                "input_rows": pa.array([in_rows], pa.uint64()),
                "output_rows": pa.array([out_rows], pa.uint64()),
                "bytes_out": pa.array([bytes_out], pa.uint64()),
                "wall_s": pa.array([wall_s], pa.float64()),
                "checksum": [checksum],
                "status": [status],
            }
        )
