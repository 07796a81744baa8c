"""Frozen text normalization + tokenization (BASELINE.json:6 "tokenization").

Frozen v1 semantics (SURVEY.md §2.2): NFKC normalize, casefold, then tokens
are maximal runs of ``[a-z0-9]+``. No stemming, no stopword removal — any
change here changes doc lengths, dfs and therefore the top-k goldens.

Query text goes through exactly the same code objects (SURVEY.md §3.2 —
"MUST be the same code objects").
"""

from __future__ import annotations

import re
import unicodedata

TOKEN_RE = re.compile(r"[a-z0-9]+")


def normalize_text(text: str) -> str:
    return unicodedata.normalize("NFKC", text).casefold()


def tokenize(text: str) -> list[str]:
    """Normalized-then-tokenized terms of one document or query."""
    return TOKEN_RE.findall(normalize_text(text))


def tokenize_batch(texts) -> list[list[str]]:
    """Vectorized-ish helper: tokenize an iterable of strings."""
    norm = unicodedata.normalize
    find = TOKEN_RE.findall
    return [find(norm("NFKC", t).casefold()) if t else [] for t in texts]


def tokenize_flat(col, doc_ids):
    """Flat (term, doc_id) pairs + per-row token COUNTS, Arrow-native.

    Returns ``(flat_terms: pa.StringArray, flat_docs: np.uint64[],
    counts: np.int64[] per input row)``. Token ORDER within a doc is
    unspecified — callers group by (term, doc), so only the multiset
    matters. This is the hot-path form of ``tokenize_batch``: for ASCII
    rows (the overwhelming case for web text after extraction) NFKC is
    the identity and casefold == lower, so the whole pipeline runs as
    Arrow kernels (ascii_lower → split_pattern_regex → list_flatten)
    with ZERO per-token Python objects — the allocation storm that made
    the build memory-bandwidth-bound. Non-ASCII rows take the frozen
    Python path (``tokenize_batch``) row-by-row, so outputs are
    byte-identical to the batch form (property-tested in
    tests/test_pipeline.py)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    n = len(col)
    counts = np.zeros(n, dtype=np.int64)
    if n == 0:
        return pa.array([], pa.string()), np.empty(0, np.uint64), counts
    ascii_mask = np.asarray(pc.string_is_ascii(col).to_numpy(zero_copy_only=False), dtype=bool)

    def _arrow_part(sub: pa.Array, sub_docs: np.ndarray):
        toks = pc.split_pattern_regex(pc.ascii_lower(sub), pattern="[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, pa.scalar("", pa.string()))
        keep_np = np.asarray(keep.to_numpy(zero_copy_only=False), dtype=bool)
        flat = flat.filter(keep)
        parent = parent[keep_np]
        c = np.bincount(parent, minlength=len(sub)).astype(np.int64)
        return flat, sub_docs[parent], c

    if ascii_mask.all():
        flat, flat_docs, counts = _arrow_part(col, doc_ids)
        return flat, flat_docs, counts

    parts_t, parts_d = [], []
    a_idx = np.flatnonzero(ascii_mask)
    na_idx = np.flatnonzero(~ascii_mask)
    if len(a_idx):
        f, fd, c = _arrow_part(col.take(pa.array(a_idx)), doc_ids[a_idx])
        counts[a_idx] = c
        parts_t.append(f)
        parts_d.append(fd)
    if len(na_idx):
        tk = tokenize_batch(col.take(pa.array(na_idx)).to_pylist())
        c = np.fromiter((len(t) for t in tk), dtype=np.int64, count=len(tk))
        counts[na_idx] = c
        parts_t.append(pa.array([w for t in tk for w in t], pa.string()))
        parts_d.append(np.repeat(doc_ids[na_idx], c))
    flat = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts_t])
    return flat, np.concatenate(parts_d).astype(np.uint64), counts
