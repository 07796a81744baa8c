"""Block-Max WAND top-k (Ding & Suel, "Faster top-k document retrieval using
block-max indexes", SIGIR 2011) over the frozen posting-blob format in
codecs.py. Exact: returns identical (doc_id, score) top-k as exhaustive BM25
(property-tested against bm25.brute_force_topk in tests/test_wand.py).

Exactness argument for the frozen total order (score DESC, doc_id ASC):
docIDs are visited ascending, so any later candidate loses a score tie to
every doc already in the heap; skipping a pivot whenever its upper bound is
<= the current threshold (kth best score) is therefore lossless, and heap
replacement requires a strictly greater score.

Per-doc float accumulation happens in sorted-term order — the same order the
brute-force scorer uses — so scores are bit-identical.
"""

from __future__ import annotations

import heapq

import numpy as np

from . import codecs
from .bm25 import score_tf

_EXHAUSTED = 1 << 62


class TermCursor:
    __slots__ = (
        "term", "idf", "max_score", "postings", "skips",
        "bi", "block_docs", "block_tfs", "pos", "exhausted",
    )

    def __init__(self, term: str, idf: float, max_score: float, postings, skips: np.ndarray):
        self.term = term
        self.idf = idf
        self.max_score = max_score
        self.postings = postings
        self.skips = skips
        self.bi = 0
        self.pos = 0
        self.exhausted = len(skips) == 0
        if not self.exhausted:
            self._decode(0)

    def _decode(self, bi: int) -> None:
        prev_last = int(self.skips[bi - 1]["last_doc_id"]) if bi > 0 else 0
        self.block_docs, self.block_tfs = codecs.decode_block(
            self.postings, self.skips[bi], prev_last
        )
        self.bi = bi
        self.pos = 0

    @property
    def doc(self) -> int:
        return _EXHAUSTED if self.exhausted else int(self.block_docs[self.pos])

    @property
    def tf(self) -> int:
        return int(self.block_tfs[self.pos])

    def block_bound(self, target: int) -> tuple[float, int]:
        """(block_max_score, block_last_doc_id) of the block that would
        contain the first doc >= target; (0, EXHAUSTED) if past the end.
        No decode — skip-list only."""
        lasts = self.skips["last_doc_id"]
        nbi = self.bi + int(np.searchsorted(lasts[self.bi :], target, side="left"))
        if nbi >= len(self.skips):
            return 0.0, _EXHAUSTED
        return float(self.skips[nbi]["max_score"]), int(lasts[nbi])

    def advance(self, target: int) -> None:
        """Move to the first posting with doc_id >= target."""
        if self.exhausted:
            return
        lasts = self.skips["last_doc_id"]
        if int(lasts[self.bi]) >= target:
            if int(self.block_docs[self.pos]) >= target:
                return
            self.pos += int(
                np.searchsorted(self.block_docs[self.pos :], target, side="left")
            )
            return
        nbi = self.bi + int(np.searchsorted(lasts[self.bi :], target, side="left"))
        if nbi >= len(self.skips):
            self.exhausted = True
            return
        self._decode(nbi)
        self.pos = int(np.searchsorted(self.block_docs, target, side="left"))


def wand_topk(cursors: list[TermCursor], doclen_of, avgdl: float, k: int = 10):
    """Block-Max WAND over prepared cursors. ``doclen_of(doc_id) -> int``.
    Returns (doc_ids, scores) in the frozen order (score DESC, doc_id ASC).
    """
    heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
    live = [c for c in cursors if not c.exhausted]
    while True:
        live = [c for c in live if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.doc)
        threshold = heap[0][0] if len(heap) == k else 0.0
        acc = 0.0
        p = -1
        for i, c in enumerate(live):
            acc += c.max_score
            if acc > threshold:
                p = i
                break
        if p < 0:
            break
        pivot = live[p].doc
        while p + 1 < len(live) and live[p + 1].doc == pivot:
            p += 1
        # block-max refinement (skip-list only, no decode)
        bms = 0.0
        min_block_last = _EXHAUSTED
        for c in live[: p + 1]:
            bm, blast = c.block_bound(pivot)
            bms += bm
            min_block_last = min(min_block_last, blast)
        if bms <= threshold:
            nxt = min_block_last + 1
            if p + 1 < len(live):
                nxt = min(nxt, live[p + 1].doc)
            nxt = max(nxt, pivot + 1)
            for c in live[: p + 1]:
                c.advance(nxt)
            continue
        if live[0].doc == pivot:
            # all cursors [0..p] aligned on pivot → score it exactly,
            # accumulating in sorted-term order (float determinism)
            dl = float(doclen_of(pivot))
            contribs = sorted(
                (c.term, float(score_tf(c.tf, dl, avgdl, c.idf))) for c in live[: p + 1]
            )
            score = 0.0
            for _, v in contribs:
                score += v
            if len(heap) < k:
                heapq.heappush(heap, (score, -pivot))
            elif score > heap[0][0]:
                heapq.heapreplace(heap, (score, -pivot))
            for c in live[: p + 1]:
                c.advance(pivot + 1)
        else:
            for c in live[: p + 1]:
                if c.doc < pivot:
                    c.advance(pivot)
    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    doc_ids = np.array([-d for _, d in out], dtype=np.uint64)
    scores = np.array([s for s, _ in out], dtype=np.float64)
    return doc_ids, scores
