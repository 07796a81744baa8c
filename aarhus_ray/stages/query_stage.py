"""Query-side actor stages (SURVEY.md §3.2).

``QueryScorer`` is an actor-pool map_batches stage: one segment's dictionary,
postings and skip lists plus the global doclen sidecar load ONCE in
``__init__``; each __call__ scores a batch of queries with Block-Max WAND
(or exhaustive BM25 with method="brute" — the in-test oracle) and emits
<= k (query_id, doc_id, score) rows per query.

``UrlResolver`` resolves doc_id → url on the tiny final top-k table by
lazily loading only the docs/pid files its doc_ids actually touch (doc_id
encodes the partition, SURVEY.md §1.3) — a broadcast-free lookup that stays
cheap at cluster scale.
"""

from __future__ import annotations

import glob
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import codecs
from ..bm25 import brute_force_topk
from ..partition import DOC_ID_PARTITION_SHIFT
from ..state import manifest as mf
from ..textnorm import tokenize
from ..wand import TermCursor, block_max_topk, dense_accum_topk, wand_topk
from .postings_stage import seg_dir

# per-Segment decoded-position cache budget (values, not entries): head
# terms carry corpus-scale streams, ~4M int64 values ≈ 32 MB
_POS_CACHE_VALS = 1 << 22


def _min_cover_span(lists: list[np.ndarray]) -> int:
    """Minimum span (max−min) over one position picked from each sorted
    list — the k-sorted-lists minimal covering window, via merge + sliding
    two-pointer. O(total · log total) for the merge; the pointer sweep is
    linear in total occurrences of the query's terms in ONE doc (small)."""
    k = len(lists)
    if k == 1:
        return 0
    pos = np.concatenate(lists)
    lab = np.concatenate([np.full(len(p), i, dtype=np.int32) for i, p in enumerate(lists)])
    o = np.argsort(pos, kind="stable")
    pos, lab = pos[o], lab[o]
    count = np.zeros(k, dtype=np.int64)
    have, left, best = 0, 0, np.iinfo(np.int64).max
    for right in range(len(pos)):
        c = lab[right]
        count[c] += 1
        if count[c] == 1:
            have += 1
        while have == k:
            span = int(pos[right] - pos[left])
            if span < best:
                best = span
            cl = lab[left]
            count[cl] -= 1
            if count[cl] == 0:
                have -= 1
            left += 1
    return best


def _min_ordered_span(lists: list[np.ndarray]) -> int:
    """Minimum (last − first) over picks p0 < p1 < … < p_{n−1}, one from
    each sorted list IN ORDER — the ordered-span primitive behind Lucene's
    ``span_near(in_order=true)``. Greedy chain: for each start p0, the
    smallest completing last position is reached by repeatedly taking the
    first occurrence strictly after the previous pick (optimal because the
    chain is monotone); if a chain fails from p0 it fails from every later
    start, so the scan short-circuits. O(|l0| · n log m). Duplicate terms
    in the sequence reuse one list — the strict-increase rule handles them
    exactly like the SQL self-join replay (p_{i+1} > p_i)."""
    best = np.iinfo(np.int64).max
    for p0 in lists[0]:
        cur = int(p0)
        for lst in lists[1:]:
            j = int(np.searchsorted(lst, cur + 1))
            if j == len(lst):
                return best
            cur = int(lst[j])
        span = cur - int(p0)
        if span < best:
            best = span
    return best


def _clean_span_exists(lists: list[np.ndarray], excl: np.ndarray, limit: int) -> bool:
    """Does an ordered pick p0 < p1 < … < p_{n−1} (one per sorted list)
    exist with p_{n−1} − p0 ≤ limit and NO ``excl`` position inside the
    inclusive window [p0, p_{n−1}]? The Lucene SpanNotQuery predicate
    (pre=post=0). Per start p0 the greedy first-after chain reaches the
    MINIMAL last position; any other chain from p0 ends later, so its
    window is a superset — if the greedy window is dirty every window
    from p0 is, making greedy-per-start exact (property-tested against
    enumeration). A failed chain fails from every later start too
    (monotone), so the scan short-circuits."""
    for p0 in lists[0]:
        cur = int(p0)
        for lst in lists[1:]:
            j = int(np.searchsorted(lst, cur + 1))
            if j == len(lst):
                return False
            cur = int(lst[j])
        if cur - int(p0) <= limit:
            lo = int(np.searchsorted(excl, int(p0)))
            if lo == len(excl) or int(excl[lo]) > cur:
                return True
    return False


def _containing_span_exists(lists: list[np.ndarray], inner: np.ndarray, limit: int) -> bool:
    """Does an ordered pick p0 < … < p_{n−1} (one per sorted list) exist
    with p_{n−1} − p0 ≤ limit and SOME ``inner`` position inside the
    inclusive window [p0, p_{n−1}]? Lucene SpanContainingQuery. Per start
    p0: the greedy chain reaches the MINIMAL last g; any element L of the
    LAST list with g ≤ L ≤ p0+limit is also achievable (swap only the
    final pick — the (n−2)th greedy pick is < g ≤ L, order holds), and no
    valid chain from p0 ends past p0+limit — so the achievable windows
    from p0 are exactly [p0, L] for those L, and the widest one decides
    containment (property-tested vs enumeration)."""
    if len(inner) == 0:
        return False
    for p0 in lists[0]:
        cur = int(p0)
        for lst in lists[1:]:
            j = int(np.searchsorted(lst, cur + 1))
            if j == len(lst):
                return False
            cur = int(lst[j])
        if cur - int(p0) > limit:
            continue
        # widest achievable window end from p0: for n == 1 the span IS
        # the single position; for n >= 2 any last-list element in
        # [g, p0+limit] works (swap only the final pick)
        if len(lists) == 1:
            lmax = cur
        else:
            last = lists[-1]
            hi = int(np.searchsorted(last, int(p0) + limit, side="right")) - 1
            lmax = max(int(last[hi]), cur) if hi >= 0 else cur
        lo = int(np.searchsorted(inner, int(p0)))
        if lo < len(inner) and int(inner[lo]) <= lmax:
            return True
    return False


def _within_span_exists(
    big_lists: list[np.ndarray],
    little_lists: list[np.ndarray],
    big_limit: int,
    little_limit: int,
) -> bool:
    """Does an ordered LITTLE pick (one per sorted little list, strictly
    increasing, last − first ≤ little_limit) exist FULLY INSIDE the
    inclusive window [b0, b_{n−1}] of some valid ordered BIG pick
    (last − first ≤ big_limit)? The Lucene SpanWithinQuery predicate —
    the dual of ``_containing_span_exists`` (the kept span is the inner
    one). Exactness: per big start p0 the achievable windows are exactly
    [p0, L] for last-list L in [greedy end, p0+big_limit] (the
    widest-achievable-window argument from _containing_span_exists), so
    only the WIDEST needs checking; inside a fixed window the greedy
    first-after little chain from each start q0 is minimal-end, so it
    fits the window/limit iff any chain from q0 does (property-tested
    against enumeration). A failed big chain fails from every later
    start (monotone) — the scan short-circuits."""
    for p0 in big_lists[0]:
        cur = int(p0)
        for lst in big_lists[1:]:
            j = int(np.searchsorted(lst, cur + 1))
            if j == len(lst):
                return False
            cur = int(lst[j])
        if cur - int(p0) > big_limit:
            continue
        if len(big_lists) == 1:
            lmax = cur
        else:
            last = big_lists[-1]
            hi = int(np.searchsorted(last, int(p0) + big_limit, side="right")) - 1
            lmax = max(int(last[hi]), cur) if hi >= 0 else cur
        starts = little_lists[0]
        for q0 in starts[(starts >= int(p0)) & (starts <= lmax)]:
            cur2 = int(q0)
            ok = True
            for lst in little_lists[1:]:
                j = int(np.searchsorted(lst, cur2 + 1))
                if j == len(lst) or int(lst[j]) > lmax:
                    ok = False
                    break
                cur2 = int(lst[j])
            if ok and cur2 - int(q0) <= little_limit:
                return True
    return False


def _lev1_same(mat: np.ndarray, qb: np.ndarray) -> np.ndarray:
    """Rows of ``mat`` (n × m byte matrix) within substitution distance 1
    of ``qb`` (m bytes): at most one mismatched position."""
    return (mat != qb).sum(axis=1) <= 1


def _lev1_del(mat: np.ndarray, qb: np.ndarray) -> np.ndarray:
    """Rows of length m+1 that reach ``qb`` (length m) by deleting ONE
    char. Classic d=1 shortcut: if it matches at all, it matches at the
    longest-common-prefix split — so compute lcp per row (cumprod of
    equality) and check the shifted suffix there. Fully vectorized."""
    n, w = mat.shape
    m = len(qb)
    if m == 0:
        return np.ones(n, dtype=bool)
    cmp = mat[:, :m] == qb
    lcp = cmp.cumprod(axis=1).sum(axis=1)  # first-mismatch index, 0..m
    s = mat[:, 1:] == qb  # t[j+1] == q[j]
    rs = np.flip(np.flip(s, axis=1).cumprod(axis=1), axis=1)  # all s[:, j:]
    rs_full = np.concatenate([rs, np.ones((n, 1), dtype=rs.dtype)], axis=1)
    return rs_full[np.arange(n), lcp].astype(bool)


def _lev1_ins(mat: np.ndarray, qb: np.ndarray) -> np.ndarray:
    """Rows of length m−1 that reach ``qb`` (length m) by inserting ONE
    char (equivalently: deleting one char of q). Same lcp trick."""
    n, w = mat.shape
    if w == 0:
        return np.ones(n, dtype=bool)
    cmp = mat == qb[:w]
    lcp = cmp.cumprod(axis=1).sum(axis=1)
    s = mat == qb[1:]  # t[j] == q[j+1]
    rs = np.flip(np.flip(s, axis=1).cumprod(axis=1), axis=1)
    rs_full = np.concatenate([rs, np.ones((n, 1), dtype=rs.dtype)], axis=1)
    return rs_full[np.arange(n), lcp].astype(bool)


def parse_query_string(text: str):
    """Frozen mini query language (the Lucene/ES ``query_string`` subset
    this engine supports), shared verbatim by the scorer and the oracle
    generator so the two sides can never drift:

      ``"a b c"``  exact phrase, MUST          ``+tok``  MUST
      ``-tok``     MUST_NOT                    ``tok``   SHOULD (w=1)
      ``tok^2.5``  boosted SHOULD              ``pre*``  prefix SHOULD group

    Returns (phrases, must, must_not, should) where ``phrases`` is a list
    of raw phrase strings, must/must_not are token lists, and ``should``
    is a list of (item, weight) with a trailing ``*`` marking an
    unexpanded prefix item. Negative boosts are rejected (they would
    invalidate score upper bounds, as in mode="boost")."""
    import re as _re

    phrases = [p for p in _re.findall(r'"([^"]*)"', text)]
    rest = _re.sub(r'"[^"]*"', " ", text)
    must: list[str] = []
    must_not: list[str] = []
    should: list[tuple[str, float]] = []
    for raw in rest.split():
        if raw.startswith("+"):
            must.extend(tokenize(raw[1:]))
            continue
        if raw.startswith("-"):
            must_not.extend(tokenize(raw[1:]))
            continue
        stem, sep, ws = raw.rpartition("^")
        w = 1.0
        if sep:
            try:
                w = float(ws)
            except ValueError:
                stem = raw
        else:
            stem = raw
        if w < 0:
            raise ValueError(f"negative boost in query_string item {raw!r}")
        if stem.endswith("*"):
            toks = tokenize(stem[:-1])
            if len(toks) == 1:
                should.append((toks[0] + "*", w))
        else:
            for t in tokenize(stem):
                should.append((t, w))
    return phrases, must, must_not, should


def _lev_dp(a: str, b: str) -> int:
    """Plain Levenshtein (scalar DP) — fallback for non-ASCII terms only;
    the hot path is the vectorized byte-matrix form above."""
    if abs(len(a) - len(b)) > 1:
        return 2
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _lev_dist_cap(a: str, b: str, cap: int) -> int:
    """Capped Levenshtein (scalar DP): returns the exact distance when it
    is ≤ ``cap``, else any value > ``cap``. Fallback for non-ASCII terms
    in the d≤2 fuzzy expansion (``_lev_dp`` hard-codes the d≤1 length
    shortcut)."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _lev_le2(mat: np.ndarray, qb: np.ndarray) -> np.ndarray:
    """Rows of ``mat`` (n × L byte matrix) within Levenshtein distance ≤ 2
    of ``qb`` (m bytes) — the maxEdits=2 expansion kernel. Full DP with
    the row dimension vectorized over the n terms; the sequential
    insertion chain D[i][j] = min(D[i][j−1]+1, …) closes in one
    vectorized pass via the lazy-evaluation identity
    ``D[i][j] = min_{k≤j}(base[k] + (j−k))`` (min-accumulate of
    ``base − j`` plus ``j``). m · 3 vector ops over (n, L+1) int16 —
    bounded by the dictionary bucket, never the corpus."""
    n, L = mat.shape
    m = len(qb)
    j = np.arange(L + 1, dtype=np.int16)
    prev = np.broadcast_to(j, (n, L + 1)).astype(np.int16)
    for i in range(1, m + 1):
        base = np.empty((n, L + 1), dtype=np.int16)
        base[:, 0] = i
        np.minimum(
            prev[:, :-1] + (mat != qb[i - 1]),
            prev[:, 1:] + np.int16(1),
            out=base[:, 1:],
        )
        prev = np.minimum.accumulate(base - j, axis=1) + j
    return prev[:, L] <= 2


class DoclenTable:
    """Sorted (doc_id → doclen) arrays loaded from docs/ parquet.

    ``pids`` restricts the load to those partitions' sidecar files — the
    cluster-shape path (SCALE.md §sizing: 10^12 docs → ~5 TB of doclens;
    a doc-range-sharded scorer holds only the ranges it serves). Default
    (None) loads everything: exact full-corpus scoring, required by the
    goldens."""

    def __init__(self, out_dir: str, pids: list[int] | None = None):
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        if pids is not None:
            want = {f"pid={p:04d}.parquet" for p in pids}
            files = [f for f in files if os.path.basename(f) in want]
        tables = [pq.read_table(f, columns=["doc_id", "doclen"]) for f in files]
        if not tables:
            self.doc_ids = np.empty(0, np.uint64)
            self.doclens = np.empty(0, np.uint32)
            return
        tbl = pa.concat_tables(tables)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dls = tbl["doclen"].to_numpy(zero_copy_only=False).astype(np.uint32)
        order = np.argsort(ids, kind="stable")
        self.doc_ids = ids[order]
        self.doclens = dls[order]

    def lookup(self, doc_ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.doc_ids, doc_ids)
        return self.doclens[pos]

    def lookup_one(self, doc_id: int) -> int:
        return int(self.doclens[int(np.searchsorted(self.doc_ids, doc_id))])


class Segment:
    """One on-disk segment mapped into memory."""

    def __init__(self, out_dir: str, seg_id: int):
        sdir = seg_dir(out_dir, seg_id)
        d = pq.read_table(os.path.join(sdir, "dict.parquet"))
        self.postings = np.memmap(os.path.join(sdir, "postings.bin"), dtype=np.uint8, mode="r")
        self.skips_raw = np.memmap(os.path.join(sdir, "skips.bin"), dtype=np.uint8, mode="r")
        self.dict: dict[str, tuple] = {}
        terms = d["term"].to_pylist()
        cols = {
            name: d[name].to_numpy(zero_copy_only=False)
            for name in ("df", "offset", "length", "skip_offset", "skip_length", "max_tf")
        }
        for i, t in enumerate(terms):
            self.dict[t] = (
                int(cols["df"][i]),
                int(cols["offset"][i]),
                int(cols["length"][i]),
                int(cols["skip_offset"][i]),
                int(cols["skip_length"][i]),
                int(cols["max_tf"][i]),
            )
        # sorted term list for dictionary RANGE SCANS (prefix expansion).
        # dict.parquet rows arrive in merge order (normally sorted already
        # within a term-range shard); sort defensively once per load.
        self.terms_sorted: list[str] = sorted(terms)
        # fuzzy-expansion buckets (lazy): byte-length → (n × L uint8
        # matrix, aligned term list); non-ASCII terms go to a scalar-DP
        # fallback list. Built once per segment load, ~vocab bytes.
        self._fuzzy_buckets: dict[int, tuple[np.ndarray, list[str]]] | None = None
        self._fuzzy_fallback: list[str] = []
        # positional sidecar (present only on positions=True builds)
        self.pos_dict: dict[str, tuple[int, int]] | None = None
        if "pos_offset" in d.column_names:
            po = d["pos_offset"].to_numpy(zero_copy_only=False)
            pl = d["pos_length"].to_numpy(zero_copy_only=False)
            self.pos_dict = {t: (int(po[i]), int(pl[i])) for i, t in enumerate(terms)}
            self.pos_raw = np.memmap(os.path.join(sdir, "pos.bin"), dtype=np.uint8, mode="r")
            self._pos_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            self._pos_cached_vals = 0

    def fuzzy1_candidates(self, tok: str) -> list[str]:
        """Dictionary terms within Levenshtein distance ≤ 1 of ``tok``.
        ASCII terms are checked VECTORIZED per byte-length bucket (only the
        three buckets |t|−1, |t|, |t|+1 are touched — the d≤1 length
        pigeonhole); rare non-ASCII terms fall back to a scalar DP. At web
        scale the production upgrade is a build-time SymSpell
        deletion-neighborhood index (O(|tok|) probes instead of an O(bucket)
        scan); the bucket scan here is the exact, dependency-free form and
        its cost is bounded by the DICTIONARY (vocabulary) size, not the
        corpus."""
        if self._fuzzy_buckets is None:
            buckets: dict[int, list[str]] = {}
            for t in self.terms_sorted:
                if t.isascii():
                    buckets.setdefault(len(t), []).append(t)
                else:
                    self._fuzzy_fallback.append(t)
            self._fuzzy_buckets = {
                L: (
                    np.frombuffer("".join(ts).encode("ascii"), dtype=np.uint8).reshape(
                        len(ts), L
                    ),
                    ts,
                )
                for L, ts in buckets.items()
                if L > 0
            }
        out: list[str] = []
        if tok.isascii():
            qb = np.frombuffer(tok.encode("ascii"), dtype=np.uint8)
            m = len(qb)
            for L, fn in ((m, _lev1_same), (m + 1, _lev1_del), (m - 1, _lev1_ins)):
                got = self._fuzzy_buckets.get(L)
                if got is None or L <= 0:
                    continue
                mat, ts = got
                for i in np.flatnonzero(fn(mat, qb)):
                    out.append(ts[int(i)])
            out.extend(t for t in self._fuzzy_fallback if _lev_dp(tok, t) <= 1)
        else:
            out.extend(t for t in self.terms_sorted if _lev_dp(tok, t) <= 1)
        return out

    def fuzzy2_candidates(self, tok: str) -> list[str]:
        """Dictionary terms within Levenshtein distance ≤ 2 of ``tok`` —
        the Lucene FuzzyQuery(maxEdits=2) expansion. Shares
        ``fuzzy1_candidates``'s lazily-built per-byte-length buckets; the
        d≤2 length pigeonhole touches the five buckets |t|−2 … |t|+2,
        each checked with the vectorized full-DP kernel (``_lev_le2``).
        Cost is bounded by the DICTIONARY slice in those buckets, not the
        corpus; the web-scale upgrade is the same build-time SymSpell
        deletion-neighborhood index as d≤1 (with 2-deletion variants)."""
        if self._fuzzy_buckets is None:
            self.fuzzy1_candidates(tok)  # builds the shared buckets
        out: list[str] = []
        if tok.isascii():
            qb = np.frombuffer(tok.encode("ascii"), dtype=np.uint8)
            m = len(qb)
            for L in range(max(1, m - 2), m + 3):
                got = self._fuzzy_buckets.get(L)
                if got is None:
                    continue
                mat, ts = got
                for i in np.flatnonzero(_lev_le2(mat, qb)):
                    out.append(ts[int(i)])
            out.extend(t for t in self._fuzzy_fallback if _lev_dist_cap(tok, t, 2) <= 2)
        else:
            out.extend(t for t in self.terms_sorted if _lev_dist_cap(tok, t, 2) <= 2)
        return out

    def term_entry(self, term: str):
        return self.dict.get(term)

    def term_postings(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        e = self.dict.get(term)
        if e is None:
            return None
        _, off, length, s_off, s_len, _ = e
        blob = bytes(self.postings[off : off + length])
        skips = bytes(self.skips_raw[s_off : s_off + s_len])
        return codecs.decode_postings(blob, skips)

    def term_positions(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """Decoded positional stream of a term: (vals, bounds) where posting
        i's sublist is vals[bounds[i]:bounds[i+1]] = [count, first_pos,
        ascending deltas...]. Cached per segment (the boundary parse is the
        sequential part — codecs.pos_bounds)."""
        if self.pos_dict is None:
            return None
        e = self.pos_dict.get(term)
        if e is None:
            return None
        got = self._pos_cache.get(term)
        if got is None:
            off, length = e
            vals = codecs.varint_decode(bytes(self.pos_raw[off : off + length]))
            bounds = codecs.pos_bounds(vals, self.dict[term][0])
            got = (vals, bounds)
            # bounded cache: head terms carry corpus-scale position streams,
            # so charge by decoded values (~4M ≈ 32 MB), not entry count
            if self._pos_cached_vals + len(vals) > _POS_CACHE_VALS:
                self._pos_cache.clear()
                self._pos_cached_vals = 0
            self._pos_cache[term] = got
            self._pos_cached_vals += len(vals)
        return got

    def term_skips(self, term: str) -> np.ndarray:
        _, _, _, s_off, s_len, _ = self.dict[term]
        return np.frombuffer(
            self.skips_raw[s_off : s_off + s_len].tobytes(), dtype=codecs.SKIP_DTYPE
        )

    def cursor(self, term: str, idf_val: float) -> TermCursor | None:
        """Cursor over THIS shard's postings; block bounds derived from the
        caller-supplied global idf (skips store max_tf, not scores)."""
        e = self.dict.get(term)
        if e is None:
            return None
        _, off, length, s_off, s_len, _ = e
        skips = self.term_skips(term)
        bounds = codecs.tf_upper_bound(skips["max_tf"], idf_val)
        postings = self.postings[off : off + length]
        return TermCursor(term, idf_val, float(bounds.max()), postings, skips, bounds)


class QueryScorer:
    """Scores whole queries against the TERM-SHARDED index: segments hold
    disjoint term ranges (BASELINE.json:6 "globally sorted segments"), so a
    query's terms may live in different segments and per-segment top-k would
    split a document's score — the scorer therefore GATHERS each term's
    cursor from the segment that owns it and runs one WAND over the full doc
    space. Actors here are replicas (throughput), not shards (each query is
    scored exactly once, completely).

    Segment files are memory-mapped, so replica actors on one node share
    page cache. At cluster scale the gather becomes a routed postings fetch
    from the segment holders; the per-query cost is O(query terms), which is
    the standard term-sharded trade-off."""

    def __init__(
        self,
        out_dir: str,
        seg_ids: list[int] | None = None,
        k: int = 10,
        method: str = "wand",
        shared_ref=None,
        doc_range: tuple[int, int] | None = None,
        pids: list[int] | None = None,
        mode: str = "or",
        filter_ids: np.ndarray | None = None,
        near_window: int = 8,
        min_should_match: int = 1,
        span_slop: int = 2,
        terms_set_mod: int = 3,
        max_gaps: int = 2,
    ):
        """``doc_range=(lo, hi)`` + ``pids`` activate the DOC-SHARDED mode
        (cluster scorer-state path, SCALE.md): this scorer holds only the
        doclens of its partitions and scores each query over doc_ids in
        [lo, hi) — memory bounded by the doc range, results merged across
        ranges by the caller (exact: every doc is scored wholly inside
        exactly one range, unlike per-term-segment top-k which splits doc
        scores). idf/df stay GLOBAL (summed over all shards). Default
        (None): full-corpus scoring, the goldens' exact path.

        ``filter_ids`` (sorted uint64 array) restricts RESULTS to the given
        doc set — the facet-filter path (e.g. lang='en'). Frozen semantics:
        the filter changes only eligibility, never the statistics — idf/df/
        avgdl/N stay GLOBAL, as in mainstream engines, so a doc's score is
        identical with and without a filter. The mask is applied to each
        term's postings at gather time, BEFORE any top-k selection, so
        WAND's unfiltered block maxima remain admissible upper bounds and
        pruning stays exact (a filtered block's true max can only be
        lower)."""
        from ..affinity import pin_worker

        pin_worker()  # opt-in core pinning (AARHUS_PIN_CPUS=1); no-op default
        stats = mf.read_stats(out_dir)
        self.out_dir = out_dir
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        self.k = k
        self.method = method
        if mode not in ("or", "and", "phrase", "near", "span_near", "span_not",
                        "span_containing", "span_or", "span_within",
                        "span_multi", "prefix",
                        "fuzzy", "fuzzy2", "boost",
                        "boolean", "msm", "terms_set", "wildcard", "regexp",
                        "query_string", "phrase_prefix", "intervals"):
            raise ValueError(
                f"mode must be 'or', 'and', 'phrase', 'near', 'span_near', "
                f"'span_not', 'span_containing', 'span_or', 'span_within', "
                f"'span_multi', 'prefix', 'fuzzy', 'fuzzy2', "
                f"'boost', 'boolean', 'msm', 'terms_set', 'wildcard', 'regexp', "
                f"'query_string', 'phrase_prefix' or 'intervals', not {mode!r}"
            )
        if mode == "and" and method not in ("wand", "brute"):
            raise ValueError(f"conjunctive scoring supports wand/brute, not {method!r}")
        if mode in ("prefix", "fuzzy", "fuzzy2", "boost", "boolean", "msm", "terms_set",
                    "wildcard", "regexp", "query_string") and method not in ("wand", "brute"):
            raise ValueError(f"{mode} scoring supports wand/brute, not {method!r}")
        if mode in ("phrase", "near", "span_near", "span_not", "span_containing",
                    "span_or", "span_within", "span_multi",
                    "phrase_prefix", "intervals") and method != "wand":
            raise ValueError(f"{mode} scoring supports method='wand', not {method!r}")
        self.mode = mode
        self.near_window = int(near_window)
        self.min_should_match = int(min_should_match)
        self.span_slop = int(span_slop)
        self.terms_set_mod = int(terms_set_mod)
        self.max_gaps = int(max_gaps)
        self.doc_range = (
            (np.uint64(doc_range[0]), np.uint64(doc_range[1])) if doc_range is not None else None
        )
        if doc_range is not None and method not in ("wand", "brute"):
            raise ValueError(f"doc-sharded scoring supports wand/brute, not {method!r}")
        if filter_ids is not None and method == "wand_daat":
            raise ValueError("facet filters support wand/brute (the cursor "
                             "DAAT path reads segments directly)")
        self.filter_ids = (
            np.ascontiguousarray(filter_ids, dtype=np.uint64) if filter_ids is not None else None
        )
        # Lucene-style deletes (pipelines/maintain.delete_documents): a
        # sorted EXCLUDE set loaded from tombstones/. Visibility-only —
        # df/idf/avgdl/N stay the pre-delete globals until compact_index
        # purges (the standard LSM trade; compaction restores fresh-build
        # statistics). Applied at gather time exactly like filter_ids, so
        # WAND block maxima stay admissible and all methods stay
        # bit-identical. None (no tombstones dir) costs nothing.
        self.exclude_ids = mf.read_tombstones(out_dir)
        if self.exclude_ids is not None and method == "wand_daat":
            raise ValueError("an index with tombstones supports wand/brute "
                             "(the cursor DAAT path reads segments directly)")
        if seg_ids is None:
            from ..pipelines.query import list_segments

            seg_ids = list_segments(out_dir)
        self.segments = [Segment(out_dir, sid) for sid in seg_ids]
        self._shared_impacts: dict[str, tuple] = {}
        if shared_ref is not None:
            import ray as _ray

            # zero-copy read-only views over the shared object-store copy
            dl_ids, dl_lens, impacts = _ray.get(shared_ref)
            self.doclens = DoclenTable.__new__(DoclenTable)
            self.doclens.doc_ids = dl_ids
            self.doclens.doclens = dl_lens
            self._shared_impacts = impacts
        else:
            self.doclens = DoclenTable(out_dir, pids=pids if doc_range is not None else None)
        # actor-lifetime term cache: term → (doc_ids, contribs, skips) with
        # contribs = the per-posting BM25 contribution score_tf(tf, dl,
        # avgdl, idf) — query-INDEPENDENT, so it is computed once. Zipf-head
        # terms appear in most queries; caching their decode + doclen align
        # + scoring per actor dominates QPS. Bounded by total cached
        # postings (evict-all beyond the cap keeps it dumb + deterministic).
        self._term_cache: dict[str, tuple] = {}
        self._cached_postings = 0
        self._cache_cap = 32_000_000
        # dense-accumulation state (wand.dense_accum_topk): per-term global
        # position arrays + one reusable float64 scratch over the doc space
        self._pos_cache: dict[str, np.ndarray] = {}
        self._dense_scratch: np.ndarray | None = None

    def _slice_to_range(self, doc_ids, contribs_or_tfs, lasts, bmax):
        """Restrict term arrays to [lo, hi). Postings slice exactly; skip
        blocks keep every block INTERSECTING the range — a partially-covered
        block's max is an upper bound over a superset, so WAND pruning stays
        admissible (exact), merely a little less tight at the range edges.
        uint64 needles throughout (int needles would promote the comparison
        to float64 and corrupt doc_ids >= 2^53)."""
        lo, hi = self.doc_range
        i0 = int(np.searchsorted(doc_ids, lo, side="left"))
        i1 = int(np.searchsorted(doc_ids, hi, side="left"))
        b1 = int(np.searchsorted(lasts, hi, side="left"))
        b0 = int(np.searchsorted(lasts, lo, side="left"))
        b1 = min(b1 + 1, len(lasts))
        return doc_ids[i0:i1], contribs_or_tfs[i0:i1], lasts[b0:b1], bmax[b0:b1]

    def _member_mask(self, doc_ids: np.ndarray, table: np.ndarray | None = None) -> np.ndarray:
        """Boolean membership of doc_ids (sorted) in a sorted id set
        (default: the facet filter set) — vectorized searchsorted,
        O(n log m)."""
        table = self.filter_ids if table is None else table
        pos = np.searchsorted(table, doc_ids)
        ok = pos < len(table)
        ok[ok] = table[pos[ok]] == doc_ids[ok]
        return ok

    def _visible_mask(self, doc_ids: np.ndarray) -> np.ndarray | None:
        """Combined eligibility mask (facet include ∧ tombstone exclude),
        or None when neither is active."""
        m = None
        if self.filter_ids is not None:
            m = self._member_mask(doc_ids)
        if self.exclude_ids is not None:
            ex = ~self._member_mask(doc_ids, self.exclude_ids)
            m = ex if m is None else (m & ex)
        return m

    def _apply_filter(self, got: tuple) -> tuple:
        """Mask a term's postings to the visible set (facet filter minus
        tombstones); skip blocks stay as-is (an unfiltered block max is a
        valid upper bound over the subset)."""
        doc_ids, vals, lasts, bmax = got
        m = self._visible_mask(doc_ids)
        if m is None:
            return got
        return doc_ids[m], vals[m], lasts, bmax

    def _term_arrays(self, term: str, owners: list["Segment"]):
        from ..bm25 import idf as idf_fn
        from ..bm25 import score_tf

        if self.doc_range is None and self.filter_ids is None and self.exclude_ids is None:
            got = self._shared_impacts.get(term)
            if got is not None:
                return got
        got = self._term_cache.get(term)
        if got is None:
            shared = self._shared_impacts.get(term)
            if shared is not None:
                # doc-sharded mode over shared full-corpus impacts: slice the
                # zero-copy views to this scorer's range (cluster analogue:
                # the node's impact replica holds only its range)
                got = self._slice_to_range(*shared) if self.doc_range is not None else shared
                got = self._apply_filter(got)
            else:
                doc_ids, tfs = self._gather_postings(term, owners)
                idf_val = idf_fn(self._global_df(term, owners), self.n_docs)
                skips_cat = np.concatenate([seg.term_skips(term) for seg in owners])
                lasts = skips_cat["last_doc_id"].copy()
                bmax = codecs.tf_upper_bound(skips_cat["max_tf"], idf_val)
                if len(lasts) > 1 and not np.all(lasts[1:] >= lasts[:-1]):
                    o = np.argsort(lasts, kind="stable")  # shards out of order
                    lasts, bmax = lasts[o], bmax[o]
                if self.doc_range is not None:
                    # slice BEFORE the doclen lookup: the range table only
                    # holds in-range docs (searchsorted on others misindexes)
                    doc_ids, tfs, lasts, bmax = self._slice_to_range(doc_ids, tfs, lasts, bmax)
                dls = self.doclens.lookup(doc_ids)
                contribs = score_tf(tfs, dls.astype(np.float64), self.avgdl, idf_val)
                got = (doc_ids, contribs, lasts, bmax)
            self._charge_cache(len(got[0]))
            self._term_cache[term] = got
        return got

    def _charge_cache(self, n_postings: int) -> None:
        """Charge a new cached array (term arrays OR dense position arrays)
        against the shared cap; evict-all on overflow keeps both caches
        bounded together (a long-lived worker serving many distinct head
        terms must not grow without bound — _pos_cache entries are
        postings-length too)."""
        if self._cached_postings + n_postings > self._cache_cap:
            self._term_cache.clear()
            self._pos_cache.clear()
            self._cached_postings = 0
        self._cached_postings += n_postings

    def _owners(self, term: str) -> list[Segment]:
        """All shards holding postings of this term. Heavy terms are salted
        into several (term-range × docID-range) shards; shard order in
        self.segments is bucket order = (seg_id, salt) ascending, and salt
        ascends with docID range, so concatenation in this order is already
        docID-sorted."""
        return [seg for seg in self.segments if term in seg.dict]

    def _global_df(self, term: str, owners: list[Segment]) -> int:
        return sum(seg.dict[term][0] for seg in owners)

    def _gather_postings(self, term: str, owners: list[Segment]):
        parts = [seg.term_postings(term) for seg in owners]
        doc_ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        if len(doc_ids) > 1 and not np.all(doc_ids[1:] > doc_ids[:-1]):
            o = np.argsort(doc_ids, kind="stable")
            doc_ids, tfs = doc_ids[o], tfs[o]
        if self.doc_range is not None:
            lo, hi = self.doc_range
            i0 = int(np.searchsorted(doc_ids, lo, side="left"))
            i1 = int(np.searchsorted(doc_ids, hi, side="left"))
            doc_ids, tfs = doc_ids[i0:i1], tfs[i0:i1]
        m = self._visible_mask(doc_ids)
        if m is not None:
            doc_ids, tfs = doc_ids[m], tfs[m]
        return doc_ids, tfs

    def _score_query_conj(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Conjunctive (AND) BM25 top-k: only docs containing EVERY query
        term are candidates; any out-of-vocabulary term empties the result.
        The candidate set is the posting-list intersection, built
        smallest-list-first with vectorized searchsorted membership (the
        galloping-intersection analogue: O(|smallest| · log |larger|), so a
        Zipf-head term AND a rare term costs the rare list's length, not the
        head's). Scores are the SAME per-doc contributions as disjunctive
        scoring, accumulated in sorted-term order — conjunctive top-k is
        bit-identical to disjunctive scores filtered to all-terms docs
        (property-tested against brute_force_topk(conjunctive=True))."""
        toks = set(tokenize(text))
        if not toks:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        owners = {}
        for t in toks:
            segs = self._owners(t)
            if not segs:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            owners[t] = segs
        terms = sorted(owners)
        if self.method == "brute":
            postings = {t: self._gather_postings(t, owners[t]) for t in terms}
            dfs = {t: self._global_df(t, owners[t]) for t in terms}
            return brute_force_topk(
                terms, postings, dfs, self.doclens.lookup, self.n_docs,
                self.avgdl, self.k, conjunctive=True,
            )
        entries = [self._term_arrays(t, owners[t]) for t in terms]
        # fused intersection + contribution gather: ONE searchsorted per
        # term total (smallest-list-first), keeping each term's contribs
        # aligned to the shrinking candidate set — the old shape re-ran
        # searchsorted over every FULL posting list a second time for
        # scoring (60% of conj wall in profile). Final accumulation stays
        # in SORTED-TERM order, so per-doc float addition order — the
        # bit-identity invariant vs brute — is unchanged (property-tested).
        order_by_len = sorted(range(len(entries)), key=lambda i: len(entries[i][0]))
        first = order_by_len[0]
        cand = entries[first][0]
        kept: dict[int, np.ndarray] = {first: entries[first][1]}
        for i in order_by_len[1:]:
            if len(cand) == 0:
                break
            d_ids, contribs = entries[i][0], entries[i][1]
            pos = np.searchsorted(d_ids, cand)
            ok = pos < len(d_ids)
            ok[ok] = d_ids[pos[ok]] == cand[ok]
            cand = cand[ok]
            for j in kept:
                kept[j] = kept[j][ok]
            kept[i] = contribs[pos[ok]]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        for i in range(len(entries)):  # sorted-term order
            scores += kept[i]
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _score_query_msm(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """minimum_should_match (Lucene/Elasticsearch's core boolean knob,
        generalizing OR and AND): only docs containing at least
        ``min_should_match`` DISTINCT in-vocabulary query terms are
        candidates (m=1 ≡ disjunctive, m=n_terms ≡ conjunctive — both
        property-tested). Scores are the unchanged per-doc BM25
        contributions of the terms the doc DOES contain, accumulated in
        sorted-term order, so msm results are the disjunctive scoring
        filtered to ≥m-matched docs (the mainstream-engine semantics:
        the knob gates eligibility, never statistics).

        The candidate count comes from one vectorized pass — concatenate
        the terms' (docID-sorted, disjoint-per-term) posting doc_ids and
        np.unique(return_counts): multiplicity == distinct matched terms.
        Cost is the same postings union a disjunctive query reads; at
        cluster scale the doc-sharded scorer path applies unchanged
        (counts are per-doc facts, computed wholly inside one range)."""
        toks = set(tokenize(text))
        m = self.min_should_match
        owners = {}
        for t in toks:
            segs = self._owners(t)
            if segs:
                owners[t] = segs
        terms = sorted(owners)
        if not terms or len(terms) < m:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        if self.method == "brute":
            postings = {t: self._gather_postings(t, owners[t]) for t in terms}
            dfs = {t: self._global_df(t, owners[t]) for t in terms}
            return brute_force_topk(
                terms, postings, dfs, self.doclens.lookup, self.n_docs,
                self.avgdl, self.k, min_match=m,
            )
        entries = [self._term_arrays(t, owners[t]) for t in terms]
        # fused: one unique(return_inverse) + one bincount replaces the
        # per-term full-list searchsorted scoring round (the conj-fusion
        # sibling). bincount's C loop adds weights in FLAT input order =
        # concatenation in sorted-term order, so each doc's float
        # accumulation order — the brute bit-identity invariant — is the
        # per-term loop's exactly (property-tested m=1 ≡ or, m=n ≡ and).
        cand, inv, counts = np.unique(
            np.concatenate([e[0] for e in entries]),
            return_inverse=True,
            return_counts=True,
        )
        scores_all = np.bincount(
            inv, weights=np.concatenate([e[1] for e in entries]), minlength=len(cand)
        )
        keep = counts >= m
        cand, scores = cand[keep], scores_all[keep]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _score_query_terms_set(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """terms_set query (ES `terms_set` with minimum_should_match_field):
        minimum_should_match where the REQUIRED match count is a PER-DOC
        fact read from a docvalue, not a query constant — each doc states
        how many of the query's terms it demands. The synthetic stand-in
        for a stored required_matches field is the frozen rule
        required(doc) = 1 + doclen(doc) % terms_set_mod (deterministic,
        SQL-replayable). Candidates and scoring are exactly the msm shape
        — one vectorized postings-union distinct-count, gated per doc,
        scores the unchanged disjunctive BM25 sums of the matched terms
        (the knob gates eligibility, never statistics). The doclen gather
        is the scorer's existing doclen table — per-doc facts resolve
        wholly inside one doc range at cluster scale."""
        toks = set(tokenize(text))
        owners = {}
        for t in toks:
            segs = self._owners(t)
            if segs:
                owners[t] = segs
        terms = sorted(owners)
        if not terms:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        entries = [self._term_arrays(t, owners[t]) for t in terms]
        # same fused unique+bincount shape as msm (see there for the
        # accumulation-order argument); only the gate differs (per-doc)
        cand, inv, counts = np.unique(
            np.concatenate([e[0] for e in entries]),
            return_inverse=True,
            return_counts=True,
        )
        scores_all = np.bincount(
            inv, weights=np.concatenate([e[1] for e in entries]), minlength=len(cand)
        )
        required = 1 + self.doclens.lookup(cand) % self.terms_set_mod
        keep = counts >= required
        cand, scores = cand[keep], scores_all[keep]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _conj_candidates(self, terms: list[str], entries: list[tuple]) -> np.ndarray:
        """Posting-list intersection, smallest-list-first (vectorized
        searchsorted membership — shared by the AND and phrase modes)."""
        order_by_len = sorted(range(len(entries)), key=lambda i: len(entries[i][0]))
        cand = entries[order_by_len[0]][0]
        for i in order_by_len[1:]:
            if len(cand) == 0:
                break
            d_ids = entries[i][0]
            pos = np.searchsorted(d_ids, cand)
            ok = pos < len(d_ids)
            ok[ok] = d_ids[pos[ok]] == cand[ok]
            cand = cand[ok]
        return cand

    def _texts_of(self, doc_ids: np.ndarray) -> list[str]:
        """Fetch candidate texts from the docs/ checkpoint, partition-pruned
        via the docID scheme (same shape as UrlResolver). Per-pid tables are
        cached for the scorer's lifetime — bounded by the pids its
        candidates actually touch."""
        if not hasattr(self, "_doc_text_cache"):
            self._doc_text_cache: dict[int, tuple[np.ndarray, list[str]]] = {}
        out: list[str] = []
        for d in doc_ids:
            pid = int(d >> np.uint64(DOC_ID_PARTITION_SHIFT))
            got = self._doc_text_cache.get(pid)
            if got is None:
                tbl = pq.read_table(
                    os.path.join(self.out_dir, "docs", f"pid={pid:04d}.parquet"),
                    columns=["doc_id", "text"],
                )
                got = (
                    tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
                    tbl["text"].to_pylist(),
                )
                self._doc_text_cache[pid] = got
            ids, texts = got
            out.append(texts[int(np.searchsorted(ids, d))])
        return out

    def _positions_of_docs(self, term: str, owners_of_term, cand: np.ndarray):
        """Absolute within-doc positions of ``term`` for each candidate doc
        (aligned list; cand sorted). Each candidate lives in exactly one
        docID-disjoint shard; positions decode from that shard's sidecar."""
        out: list[np.ndarray | None] = [None] * len(cand)
        for seg in owners_of_term:
            d_ids, _ = seg.term_postings(term)
            idx = np.searchsorted(d_ids, cand)
            ok = idx < len(d_ids)
            ok[ok] = d_ids[idx[ok]] == cand[ok]
            if not ok.any():
                continue
            vals, bounds = seg.term_positions(term)
            for ci in np.flatnonzero(ok):
                i = int(idx[ci])
                sub = vals[bounds[i] + 1 : bounds[i + 1]].astype(np.int64)
                out[ci] = np.cumsum(sub)  # deltas → absolute, ascending
        return out

    def _verify_near_positions(
        self, terms: list[str], owners, cand: np.ndarray, window: int
    ) -> np.ndarray:
        """Proximity check over the positional sidecar: candidate ci
        survives iff some choice of one occurrence per term spans < window
        tokens (min cover span ≤ window−1; classic k-sorted-lists sliding
        window). No checkpoint text is touched."""
        pos_by_term = {t: self._positions_of_docs(t, owners[t], cand) for t in terms}
        keep = np.zeros(len(cand), dtype=bool)
        for ci in range(len(cand)):
            lists = [pos_by_term[t][ci] for t in terms]
            if any(p is None or len(p) == 0 for p in lists):
                continue
            keep[ci] = _min_cover_span(lists) <= window - 1
        return keep

    def _verify_span_positions(
        self, seq: list[str], owners, cand: np.ndarray, slop: int
    ) -> np.ndarray:
        """Ordered-proximity check over the positional sidecar: candidate
        ci survives iff some strictly-increasing pick of one occurrence per
        SEQUENCE position spans ≤ len(seq)−1+slop tokens (Lucene
        span_near in_order=true). slop=0 degenerates to exact phrase."""
        pos_by_term = {t: self._positions_of_docs(t, owners[t], cand) for t in set(seq)}
        limit = len(seq) - 1 + slop
        keep = np.zeros(len(cand), dtype=bool)
        for ci in range(len(cand)):
            lists = [pos_by_term[t][ci] for t in seq]
            if any(p is None or len(p) == 0 for p in lists):
                continue
            keep[ci] = _min_ordered_span(lists) <= limit
        return keep

    def _verify_phrase_positions(self, seq: list[str], owners, cand: np.ndarray) -> np.ndarray:
        """Index-native adjacency check: consecutive positional
        intersection (pos(t_{i+1}) ∩ (survivors+1)) — the classic phrase
        algorithm over a positional index; no checkpoint text is touched."""
        pos_by_term = {t: self._positions_of_docs(t, owners[t], cand) for t in set(seq)}
        keep = np.zeros(len(cand), dtype=bool)
        for ci in range(len(cand)):
            cur = pos_by_term[seq[0]][ci]
            for t in seq[1:]:
                if cur is None or len(cur) == 0:
                    break
                cur = np.intersect1d(cur + 1, pos_by_term[t][ci], assume_unique=True)
            keep[ci] = cur is not None and len(cur) > 0
        return keep

    def _verify_phrase(self, seq: list[str], owners, cand: np.ndarray) -> np.ndarray:
        """Adjacency filter over conjunctive candidates: positional
        sidecar when every owning shard carries one, else re-tokenize
        candidate texts from the docs/ checkpoint (the two-engine shape
        shared by phrase mode and query_string phrase clauses)."""
        if len(cand) == 0 or len(seq) <= 1:
            return cand
        if all(seg.pos_dict is not None for t in owners for seg in owners[t]):
            # positional index: verify adjacency from pos.bin (no
            # checkpoint fetch, no re-tokenization)
            return cand[self._verify_phrase_positions(seq, owners, cand)]
        texts = self._texts_of(cand)
        keep = np.zeros(len(cand), dtype=bool)
        L = len(seq)
        for i, doc_text in enumerate(texts):
            toks = tokenize(doc_text)
            if len(toks) < L:
                continue
            arr = np.asarray(toks, dtype=object)
            idx = np.flatnonzero(arr[: len(arr) - L + 1] == seq[0])
            for off in range(1, L):
                if len(idx) == 0:
                    break
                idx = idx[arr[idx + off] == seq[off]]
            keep[i] = len(idx) > 0
        return cand[keep]

    def _score_query_phrase(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Exact phrase retrieval WITHOUT a positional index: candidates are
        the conjunctive posting-list intersection of the phrase's terms;
        adjacency is verified by re-tokenizing each candidate's stored text
        from the docs/ checkpoint (partition-pruned fetch); survivors rank
        by the ordinary BM25 sum of the phrase's DISTINCT terms, frozen
        order (score DESC, doc_id ASC).

        Scale posture (SCALE.md): verification cost is O(candidates ×
        doclen) — right for selective phrases (any phrase with one rare
        term). A stopword-only phrase at 10^12 docs wants the positional
        posting sidecar (pos.bin per segment, delta-varint positions);
        this verify-from-checkpoint form is the standard fallback engines
        ship when the index carries no positions."""
        seq = tokenize(text)
        if not seq:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        owners = {}
        for t in set(seq):
            segs = self._owners(t)
            if not segs:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            owners[t] = segs
        terms = sorted(owners)
        entries = [self._term_arrays(t, owners[t]) for t in terms]
        cand = self._conj_candidates(terms, entries)
        cand = self._verify_phrase(seq, owners, cand)
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        for doc_ids, contribs, _, _ in entries:  # sorted-term order
            scores += contribs[np.searchsorted(doc_ids, cand)]
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _score_query_span(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Ordered proximity (span_near, in_order=true): a doc qualifies
        iff the query's tokens occur AS A SEQUENCE — one occurrence per
        query position, positions strictly increasing — within
        len(seq)−1+span_slop consecutive tokens. slop=0 ≡ phrase; unlike
        mode="near", "query the" and "the query" are different queries.
        Candidates are the conjunctive intersection of the DISTINCT terms
        (a necessary condition); the ordered-span predicate verifies from
        the positional sidecar when every owning shard carries one, else by
        re-tokenizing candidate texts from the docs/ checkpoint (the same
        two-engine shape as phrase/near, pinned equal by test). An OOV term
        empties the result; a single-token query degenerates to AND
        (span 0 ≤ slop). Survivors rank by the BM25 sum of the distinct
        terms, frozen (score DESC, doc_id ASC) order."""
        seq = tokenize(text)
        if not seq:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        owners = {}
        for t in set(seq):
            segs = self._owners(t)
            if not segs:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            owners[t] = segs
        terms = sorted(owners)
        entries = [self._term_arrays(t, owners[t]) for t in terms]
        cand = self._conj_candidates(terms, entries)
        if len(cand) and len(seq) > 1:
            if all(seg.pos_dict is not None for t in owners for seg in owners[t]):
                cand = cand[self._verify_span_positions(seq, owners, cand, self.span_slop)]
            else:
                texts = self._texts_of(cand)
                limit = len(seq) - 1 + self.span_slop
                keep = np.zeros(len(cand), dtype=bool)
                for i, doc_text in enumerate(texts):
                    arr = np.asarray(tokenize(doc_text), dtype=object)
                    lists = [np.flatnonzero(arr == t) for t in seq]
                    if any(len(p) == 0 for p in lists):
                        continue
                    keep[i] = _min_ordered_span(lists) <= limit
                cand = cand[keep]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        for doc_ids, contribs, _, _ in entries:  # sorted-term order
            scores += contribs[np.searchsorted(doc_ids, cand)]
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _score_query_span_not(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Lucene ``span_not`` (pre=post=0): query text is
        ``include_seq ! exclude_terms`` — a doc qualifies iff some ordered
        occurrence of the include sequence (strictly increasing picks
        within len(seq)−1+span_slop tokens, the span_near predicate) has
        NO exclude-term occurrence inside its inclusive position window.
        Candidates are the conjunctive intersection of the INCLUDE terms;
        exclusion only vetoes spans — an OOV or absent exclude term vetoes
        nothing (degenerates to span_near, pinned by test), while
        ``t ! t`` is provably empty (every window contains its own pick).
        Survivors rank by the BM25 sum of the DISTINCT INCLUDE terms
        (Lucene scores SpanNot by the include span), frozen
        (score DESC, doc_id ASC). Verification reads the positional
        sidecar when every owning shard (include AND exclude) carries one,
        else re-tokenizes candidate texts from the docs/ checkpoint — the
        two-engine shape shared by phrase/near/span_near."""
        if "!" not in text:
            raise ValueError("span_not query must be 'include_seq ! exclude_terms'")
        inc_part, exc_part = text.split("!", 1)
        seq = tokenize(inc_part)
        excl_terms = sorted(set(tokenize(exc_part)))
        if not seq:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        owners = {}
        for t in set(seq):
            segs = self._owners(t)
            if not segs:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            owners[t] = segs
        # exclude terms gate nothing; absent/OOV ones simply have no
        # positions to veto with
        excl_owners = {t: self._owners(t) for t in excl_terms}
        excl_owners = {t: s for t, s in excl_owners.items() if s}
        terms = sorted(owners)
        entries = [self._term_arrays(t, owners[t]) for t in terms]
        cand = self._conj_candidates(terms, entries)
        if len(cand):
            limit = len(seq) - 1 + self.span_slop
            all_segs = list(owners.values()) + list(excl_owners.values())
            if all(seg.pos_dict is not None for segs in all_segs for seg in segs):
                pos_by_term = {
                    t: self._positions_of_docs(t, owners[t], cand) for t in set(seq)
                }
                excl_by_term = {
                    t: self._positions_of_docs(t, excl_owners[t], cand)
                    for t in excl_owners
                }
                keep = np.zeros(len(cand), dtype=bool)
                for ci in range(len(cand)):
                    lists = [pos_by_term[t][ci] for t in seq]
                    if any(p is None or len(p) == 0 for p in lists):
                        continue
                    ex = [
                        p
                        for p in (excl_by_term[t][ci] for t in excl_owners)
                        if p is not None and len(p)
                    ]
                    excl = (
                        np.sort(np.concatenate(ex))
                        if ex
                        else np.empty(0, np.int64)
                    )
                    keep[ci] = _clean_span_exists(lists, excl, limit)
                cand = cand[keep]
            else:
                texts = self._texts_of(cand)
                keep = np.zeros(len(cand), dtype=bool)
                for i, doc_text in enumerate(texts):
                    arr = np.asarray(tokenize(doc_text), dtype=object)
                    lists = [np.flatnonzero(arr == t) for t in seq]
                    if any(len(p) == 0 for p in lists):
                        continue
                    excl = np.sort(
                        np.concatenate(
                            [np.flatnonzero(arr == t) for t in excl_terms]
                        )
                    ) if excl_terms else np.empty(0, np.int64)
                    keep[i] = _clean_span_exists(lists, excl, limit)
                cand = cand[keep]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        for doc_ids, contribs, _, _ in entries:  # sorted-term order
            scores += contribs[np.searchsorted(doc_ids, cand)]
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _score_query_span_containing(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Lucene ``span_containing``: query text is ``big_seq @
        little_terms`` — a doc qualifies iff some ordered occurrence of
        the BIG sequence (within len(seq)−1+span_slop tokens, the
        span_near predicate) CONTAINS an occurrence of any little term in
        its inclusive position window. The dual of span_not: the inner
        occurrence is required instead of vetoed, so an OOV/absent little
        term yields NO matches (containment needs a position — the
        opposite degeneracy, pinned by test), while ``t @ t`` degenerates
        to span_near on t (every single-pick window contains its own
        pick). Survivors rank by the BM25 sum of the DISTINCT BIG terms
        (Lucene scores the big span). Verification reads pos.bin when
        every owning shard carries one, else re-tokenizes candidate texts
        — the span family's two-engine shape."""
        if "@" not in text:
            raise ValueError("span_containing query must be 'big_seq @ little_terms'")
        big_part, little_part = text.split("@", 1)
        seq = tokenize(big_part)
        little_terms = sorted(set(tokenize(little_part)))
        if not seq or not little_terms:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        owners = {}
        for t in set(seq):
            segs = self._owners(t)
            if not segs:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            owners[t] = segs
        little_owners = {t: self._owners(t) for t in little_terms}
        little_owners = {t: s for t, s in little_owners.items() if s}
        if not little_owners:  # no little occurrence anywhere: no containment
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        terms = sorted(owners)
        entries = [self._term_arrays(t, owners[t]) for t in terms]
        cand = self._conj_candidates(terms, entries)
        if len(cand):
            limit = len(seq) - 1 + self.span_slop
            all_segs = list(owners.values()) + list(little_owners.values())
            if all(seg.pos_dict is not None for segs in all_segs for seg in segs):
                pos_by_term = {
                    t: self._positions_of_docs(t, owners[t], cand) for t in set(seq)
                }
                little_by_term = {
                    t: self._positions_of_docs(t, little_owners[t], cand)
                    for t in little_owners
                }
                keep = np.zeros(len(cand), dtype=bool)
                for ci in range(len(cand)):
                    lists = [pos_by_term[t][ci] for t in seq]
                    if any(p is None or len(p) == 0 for p in lists):
                        continue
                    inn = [
                        p
                        for p in (little_by_term[t][ci] for t in little_owners)
                        if p is not None and len(p)
                    ]
                    inner = (
                        np.sort(np.concatenate(inn))
                        if inn
                        else np.empty(0, np.int64)
                    )
                    keep[ci] = _containing_span_exists(lists, inner, limit)
                cand = cand[keep]
            else:
                texts = self._texts_of(cand)
                keep = np.zeros(len(cand), dtype=bool)
                for i, doc_text in enumerate(texts):
                    arr = np.asarray(tokenize(doc_text), dtype=object)
                    lists = [np.flatnonzero(arr == t) for t in seq]
                    if any(len(p) == 0 for p in lists):
                        continue
                    inner = np.sort(
                        np.concatenate(
                            [np.flatnonzero(arr == t) for t in little_terms]
                        )
                    )
                    keep[i] = _containing_span_exists(lists, inner, limit)
                cand = cand[keep]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        for doc_ids, contribs, _, _ in entries:  # sorted-term order
            scores += contribs[np.searchsorted(doc_ids, cand)]
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _score_query_span_or(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Lucene ``span_or`` over whole sequences: query text is
        ``seq1 | seq2 | …`` — a doc qualifies iff ANY alternative ordered
        sequence occurs within len(alt)−1+span_slop consecutive tokens
        (the span_near predicate, each alternative with its OWN window).
        Unlike intervals (SpanOr per SLOT inside one SpanNear), the
        union here is over COMPLETE span clauses — the other Lucene
        composition. An alternative with an OOV term can never match and
        drops out silently; all alternatives dead ⇒ empty. ``t | t`` ≡
        span_near(t) (pinned by test). Survivors rank by the BM25 sum of
        the DISTINCT terms across ALL alternatives (absent terms
        contribute 0 — the intervals-family scoring rule), frozen
        (score DESC, doc_id ASC). Verification per alternative reads the
        positional sidecar when every owning shard carries one, else
        re-tokenizes candidate texts — the span family's two-engine
        shape."""
        alts = [seq for part in text.split("|") if (seq := tokenize(part))]
        if not alts:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        matched: np.ndarray | None = None
        # scoring vocabulary: every in-vocab term of EVERY alternative —
        # a dead alternative (one OOV member) contributes no MATCHES, but
        # its live terms still score (doc-level BM25 over the union
        # vocabulary; the SQL oracle's qd has the same rows)
        vocab_owners: dict[str, list] = {}
        for seq in alts:
            for t in set(seq):
                if t not in vocab_owners:
                    segs = self._owners(t)
                    if segs:
                        vocab_owners[t] = segs
        for seq in alts:
            owners = {}
            live = True
            for t in set(seq):
                segs = vocab_owners.get(t)
                if not segs:
                    live = False
                    break
                owners[t] = segs
            if not live:
                continue  # dead alternative: contributes no matches
            terms = sorted(owners)
            entries = [self._term_arrays(t, owners[t]) for t in terms]
            cand = self._conj_candidates(terms, entries)
            if len(cand) and len(seq) > 1:
                if all(seg.pos_dict is not None for t in owners for seg in owners[t]):
                    cand = cand[
                        self._verify_span_positions(seq, owners, cand, self.span_slop)
                    ]
                else:
                    texts = self._texts_of(cand)
                    limit = len(seq) - 1 + self.span_slop
                    keep = np.zeros(len(cand), dtype=bool)
                    for i, doc_text in enumerate(texts):
                        arr = np.asarray(tokenize(doc_text), dtype=object)
                        lists = [np.flatnonzero(arr == t) for t in seq]
                        if any(len(p) == 0 for p in lists):
                            continue
                        keep[i] = _min_ordered_span(lists) <= limit
                    cand = cand[keep]
            if len(cand):
                matched = cand if matched is None else np.union1d(matched, cand)
        if matched is None or len(matched) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(matched), dtype=np.float64)
        for t in sorted(vocab_owners):  # sorted-term accumulation (frozen)
            doc_ids, contribs, _, _ = self._term_arrays(t, vocab_owners[t])
            idx = np.searchsorted(doc_ids, matched)
            ok = idx < len(doc_ids)
            ok[ok] = doc_ids[idx[ok]] == matched[ok]
            scores[ok] += contribs[idx[ok]]
        from ..bm25 import topk_select

        return topk_select(matched, scores, self.k)

    def _score_query_span_within(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Lucene ``span_within``: query text is ``little_seq < big_seq``
        — a doc qualifies iff some ordered occurrence of the LITTLE
        sequence (within len(little)−1+span_slop tokens) lies FULLY
        INSIDE the inclusive position window of some ordered BIG-sequence
        occurrence (within len(big)−1+span_slop tokens). The dual of
        span_containing: the kept span is the INNER one, so survivors
        rank by the BM25 sum of the DISTINCT LITTLE terms (Lucene scores
        SpanWithin by the little clause). An OOV little OR big term ⇒
        empty (both spans need positions); ``t < t`` ≡ span_near(t)
        (every single-position little sits inside its own big window —
        pinned by test). Candidates are the conjunctive intersection of
        little ∪ big terms; enclosure is verified from the positional
        sidecar when every owning shard carries one, else by
        re-tokenizing candidate texts (_within_span_exists — exact by
        the widest-achievable-window + greedy-inside-window arguments)."""
        if "<" not in text:
            raise ValueError("span_within query must be 'little_seq < big_seq'")
        little_part, big_part = text.split("<", 1)
        little = tokenize(little_part)
        big = tokenize(big_part)
        if not little or not big:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        owners = {}
        for t in set(little) | set(big):
            segs = self._owners(t)
            if not segs:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            owners[t] = segs
        terms = sorted(owners)
        entries = {t: self._term_arrays(t, owners[t]) for t in terms}
        cand = self._conj_candidates(terms, [entries[t] for t in terms])
        if len(cand):
            big_limit = len(big) - 1 + self.span_slop
            little_limit = len(little) - 1 + self.span_slop
            keep = np.zeros(len(cand), dtype=bool)
            if all(seg.pos_dict is not None for t in owners for seg in owners[t]):
                pos_by_term = {
                    t: self._positions_of_docs(t, owners[t], cand)
                    for t in set(little) | set(big)
                }
                for ci in range(len(cand)):
                    big_lists = [pos_by_term[t][ci] for t in big]
                    little_lists = [pos_by_term[t][ci] for t in little]
                    if any(
                        p is None or len(p) == 0 for p in big_lists + little_lists
                    ):
                        continue
                    keep[ci] = _within_span_exists(
                        big_lists, little_lists, big_limit, little_limit
                    )
            else:
                texts = self._texts_of(cand)
                for ci, doc_text in enumerate(texts):
                    arr = np.asarray(tokenize(doc_text), dtype=object)
                    big_lists = [np.flatnonzero(arr == t) for t in big]
                    little_lists = [np.flatnonzero(arr == t) for t in little]
                    if any(len(p) == 0 for p in big_lists + little_lists):
                        continue
                    keep[ci] = _within_span_exists(
                        big_lists, little_lists, big_limit, little_limit
                    )
            cand = cand[keep]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        for t in sorted(set(little)):  # little terms only (frozen scoring)
            doc_ids, contribs, _, _ = entries[t]
            scores += contribs[np.searchsorted(doc_ids, cand)]
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _score_query_intervals(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """ES ``intervals`` query, ``all_of(ordered=true, max_gaps)`` over
        ``any_of`` slots (Lucene SpanOr inside SpanNear): the query text is
        whitespace-separated SLOTS, each slot one or more ``|``-separated
        alternative terms. A doc qualifies iff picking ONE occurrence from
        ANY alternative per slot yields a strictly-increasing position
        sequence within n_slots−1+max_gaps consecutive tokens (ES's
        max_gaps counts tokens BETWEEN the picked occurrences; max_gaps=0
        ≡ phrase-with-alternates). Every-slot-single-alternative
        degenerates to span_near exactly (pinned by test). Candidates are
        the intersection over slots of the UNION of alternative postings —
        an OOV alternative just leaves its slot, a fully-OOV slot empties
        the result. Verification merges each slot's alternative position
        lists (sorted union from the positional sidecar, else checkpoint
        re-tokenize) and runs the same greedy ordered-span chain as
        span_near. Survivors rank by the BM25 sum of the DISTINCT
        alternatives the doc CONTAINS (absent alternatives contribute 0),
        frozen (score DESC, doc_id ASC)."""
        slots: list[list[str]] = []
        for raw in text.split():
            alts: set[str] = set()
            for a in raw.split("|"):
                toks = tokenize(a)
                if len(toks) > 1:
                    raise ValueError(
                        f"intervals alternatives must be single terms, got {a!r}"
                    )
                alts.update(toks)
            slots.append(sorted(alts))
        return self._score_slot_sequence(slots, self.max_gaps)

    def _score_slot_sequence(
        self, slots: list[list[str]], gaps: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Shared ordered-slot kernel (intervals + span_multi): one
        occurrence from ANY alternative per slot, strictly increasing
        positions, within n_slots−1+gaps consecutive tokens; BM25 sum of
        the DISTINCT alternatives the doc contains."""
        if not slots or any(not s for s in slots):
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        owners, entries = {}, {}
        for t in sorted({t for s in slots for t in s}):
            segs = self._owners(t)
            if segs:
                owners[t] = segs
                entries[t] = self._term_arrays(t, owners[t])
        live_slots = [[t for t in s if t in owners] for s in slots]
        if any(not s for s in live_slots):
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        slot_docs = []
        for s in live_slots:
            docs = entries[s[0]][0]
            for t in s[1:]:
                docs = np.union1d(docs, entries[t][0])
            slot_docs.append(docs)
        order_by_len = sorted(range(len(slot_docs)), key=lambda i: len(slot_docs[i]))
        cand = slot_docs[order_by_len[0]]
        for i in order_by_len[1:]:
            if len(cand) == 0:
                break
            d_ids = slot_docs[i]
            pos = np.searchsorted(d_ids, cand)
            ok = pos < len(d_ids)
            ok[ok] = d_ids[pos[ok]] == cand[ok]
            cand = cand[ok]
        if len(cand) and len(slots) > 1:
            limit = len(slots) - 1 + gaps
            keep = np.zeros(len(cand), dtype=bool)
            if all(seg.pos_dict is not None for t in owners for seg in owners[t]):
                pos_by_term = {
                    t: self._positions_of_docs(t, owners[t], cand) for t in owners
                }
                for ci in range(len(cand)):
                    lists, ok2 = [], True
                    for s in live_slots:
                        parts = [
                            p for t in s
                            if (p := pos_by_term[t][ci]) is not None and len(p)
                        ]
                        if not parts:
                            ok2 = False
                            break
                        lists.append(
                            parts[0] if len(parts) == 1
                            else np.unique(np.concatenate(parts))
                        )
                    if ok2:
                        keep[ci] = _min_ordered_span(lists) <= limit
            else:
                texts = self._texts_of(cand)
                for ci, doc_text in enumerate(texts):
                    arr = np.asarray(tokenize(doc_text), dtype=object)
                    lists = [np.flatnonzero(np.isin(arr, s)) for s in live_slots]
                    if any(len(p) == 0 for p in lists):
                        continue
                    keep[ci] = _min_ordered_span(lists) <= limit
            cand = cand[keep]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        for t in sorted(owners):  # sorted-term accumulation order (frozen)
            doc_ids, contribs, _, _ = entries[t]
            idx = np.searchsorted(doc_ids, cand)
            ok = idx < len(doc_ids)
            ok[ok] = doc_ids[idx[ok]] == cand[ok]
            scores[ok] += contribs[idx[ok]]
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _score_query_span_multi(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Lucene ``SpanMultiTermQueryWrapper`` inside ``span_near``
        (in_order=true): whitespace-separated ordered slots where a
        trailing-``*`` slot REWRITES against the term dictionary as a
        PrefixQuery (SpanOr over the prefix's matching terms — the
        spanRewriteMethod), a trailing-``~`` slot rewrites as a
        FuzzyQuery (every dictionary term within Levenshtein distance 1,
        exact hits included — plain Levenshtein, replayable by DuckDB's
        levenshtein()), and a bare slot is a literal term. A doc
        qualifies iff one occurrence per slot can be picked with
        strictly increasing positions within n_slots−1+span_slop
        consecutive tokens. A slot with NO dictionary match (dead
        prefix, hopeless fuzzy stem, OOV literal) cannot be filled and
        empties the result (the intervals fully-OOV-slot rule); a slot
        expanding to exactly one term degenerates to span_near on it
        (pinned by test). Survivors rank by the BM25 sum of the DISTINCT
        expanded alternatives the doc contains (each with its own global
        df/idf — the scoring_boolean-style rewrite the prefix and fuzzy
        modes also use), frozen (score DESC, doc_id ASC). Shares
        _score_slot_sequence with intervals; the oracle replays the
        expansions with LIKE / levenshtein() conditions directly in the
        positional self-join."""
        import re as _re

        slots: list[list[str]] = []
        for raw in text.split():
            raw = raw.lower()  # dictionary terms are lowercase; the
            # prefix/fuzzy/wildcard/regexp modes all lowercase their
            # patterns — keep the slot rewrites consistent with them
            if raw.startswith("/") and raw.endswith("/") and len(raw) > 2:
                # RegexpQuery rewrite: /pattern/ full-matches the term
                # (RE2 ∩ Python-re common core; checked before the *
                # branch — a regex may contain stars)
                slots.append(sorted(self._expand_regexp(raw[1:-1])))
            elif "*" in raw:
                if raw.endswith("*") and raw.count("*") == 1:
                    # trailing-only star: PrefixQuery rewrite (bisected
                    # range scan — same result as the general glob)
                    stem = tokenize(raw[:-1])
                    if len(stem) != 1:
                        raise ValueError(
                            f"span_multi prefix slots must be single stems, got {raw!r}"
                        )
                    slots.append(sorted(self._expand_prefix(stem[0])))
                else:
                    # general WildcardQuery rewrite (* anywhere)
                    if not _re.fullmatch(r"[a-z0-9*]+", raw) or not raw.strip("*"):
                        raise ValueError(
                            f"span_multi wildcard slots must be [a-z0-9*]+ with "
                            f"at least one literal char, got {raw!r}"
                        )
                    slots.append(sorted(self._expand_wildcard(raw)))
            elif raw.endswith("~"):
                stem = tokenize(raw[:-1])
                if len(stem) != 1:
                    raise ValueError(
                        f"span_multi fuzzy slots must be single stems, got {raw!r}"
                    )
                slots.append(sorted(self._expand_fuzzy(stem[0], 1)))
            else:
                toks = tokenize(raw)
                if len(toks) > 1:
                    raise ValueError(
                        f"span_multi literal slots must be single terms, got {raw!r}"
                    )
                slots.append(toks)
        return self._score_slot_sequence(slots, self.span_slop)

    def _score_query_near(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Proximity (NEAR) retrieval: a doc qualifies iff ALL the query's
        DISTINCT terms occur within ``near_window`` consecutive tokens
        (min cover span ≤ window−1; unordered — "query near(8) plan"
        matches "...plan the query..."). Candidates are the conjunctive
        intersection; proximity is verified from the positional sidecar
        when every owning shard carries one, else by re-tokenizing
        candidate texts from the docs/ checkpoint (same two-engine shape
        as mode="phrase", bit-identical by construction and test). An OOV
        term empties the result; a single-term query degenerates to AND.
        Survivors rank by the BM25 sum of the distinct terms, frozen
        (score DESC, doc_id ASC) order."""
        toks = set(tokenize(text))
        if not toks:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        owners = {}
        for t in toks:
            segs = self._owners(t)
            if not segs:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            owners[t] = segs
        terms = sorted(owners)
        entries = [self._term_arrays(t, owners[t]) for t in terms]
        cand = self._conj_candidates(terms, entries)
        if len(cand) and len(terms) > 1:
            if all(seg.pos_dict is not None for t in owners for seg in owners[t]):
                cand = cand[self._verify_near_positions(terms, owners, cand, self.near_window)]
            else:
                texts = self._texts_of(cand)
                keep = np.zeros(len(cand), dtype=bool)
                for i, doc_text in enumerate(texts):
                    arr = np.asarray(tokenize(doc_text), dtype=object)
                    lists = [np.flatnonzero(arr == t) for t in terms]
                    if any(len(p) == 0 for p in lists):
                        continue
                    keep[i] = _min_cover_span(lists) <= self.near_window - 1
                cand = cand[keep]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        for doc_ids, contribs, _, _ in entries:  # sorted-term order
            scores += contribs[np.searchsorted(doc_ids, cand)]
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _expand_prefix(self, prefix: str) -> set[str]:
        """Dictionary RANGE SCAN: all index terms starting with ``prefix``.
        Each segment's sorted term list is bisected to [prefix, prefix⁺) —
        O(log |dict| + matches) per shard. Cluster shape: term-range
        sharding means a prefix range intersects only the shards whose
        term boundaries overlap it, so the scan routes to O(1) segment
        holders, not all of them (here every shard is local, so the
        pruning is implicit in the empty bisection ranges). Tokens are
        ASCII [a-z0-9]+ (textnorm contract), so ``prefix[:-1] +
        chr(ord(prefix[-1]) + 1)`` is a correct exclusive upper bound."""
        import bisect

        hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
        out: set[str] = set()
        for seg in self.segments:
            i0 = bisect.bisect_left(seg.terms_sorted, prefix)
            i1 = bisect.bisect_left(seg.terms_sorted, hi)
            out.update(seg.terms_sorted[i0:i1])
        return out

    def _score_query_prefix(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Wildcard retrieval: a trailing ``*`` marks a prefix term, which
        EXPANDS to every matching dictionary term; the query then scores as
        ordinary disjunctive BM25 over the union of literal + expanded
        terms, each expanded term with its OWN global df/idf (Lucene's
        ``scoring_boolean`` rewrite of a PrefixQuery — the semantics an
        exact SQL oracle can replay, unlike constant-score). A bare ``*``
        is ignored; an unmatched prefix contributes nothing. No expansion
        cap: exactness is the contract here; at web scale a hot prefix
        ("th*") degrades gracefully — cost is the expanded terms' postings,
        the same as typing those terms — and a production deployment would
        cap expansion like Lucene's 1024-term rewrite limit."""
        terms: set[str] = set()
        for raw in text.split():
            if raw.endswith("*"):
                stem = tokenize(raw[:-1])
                if len(stem) == 1:
                    terms |= self._expand_prefix(stem[0])
            else:
                terms.update(tokenize(raw))
        return self._score_terms(terms)

    def _score_query_phrase_prefix(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """MATCH_PHRASE_PREFIX (Elasticsearch's ``match_phrase_prefix``):
        the LAST token is a prefix stem expanded against the sharded
        dictionary (_expand_prefix range scan — the same O(1)-shard
        routing as prefix mode); a doc matches iff SOME completed phrase
        ``fixed + [e]`` occurs adjacently (verified per expansion by the
        shared _verify_phrase two-engine path: positional sidecar when
        present, checkpoint re-tokenization otherwise); a matching doc
        scores as its BEST completion — the BM25 sum of the DISTINCT
        fixed terms plus the max matching expansion's contribution.
        Best-completion (dis_max over completions) is the frozen scoring
        rule because an exact SQL oracle replays MAX; Lucene's
        MultiPhraseQuery position-blended idf would not hash-replay. A
        single-token query degenerates to best-completion prefix search;
        an OOV fixed term or an empty expansion empties the result. An
        expansion may coincide with a fixed term ("slow s…" → 'slow'):
        its contribution then counts in both the fixed sum and the max,
        the same double the SQL computes. Verification cost is
        O(|expansions| × candidates-per-completion) — at web scale the
        stem's dictionary range bounds the fan-out exactly like prefix
        mode, and each completion prunes through the conjunctive
        intersection before any positions/text are touched."""
        seq = tokenize(text)
        if not seq:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        fixed, stem = seq[:-1], seq[-1]
        expansions = sorted(self._expand_prefix(stem))
        if not expansions:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        owners = {}
        for t in set(fixed):
            segs = self._owners(t)
            if not segs:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            owners[t] = segs
        fixed_terms = sorted(owners)
        fixed_entries = [self._term_arrays(t, owners[t]) for t in fixed_terms]
        matched: list[tuple[np.ndarray, np.ndarray]] = []
        for e in expansions:
            esegs = self._owners(e)
            if not esegs:
                continue
            e_entry = self._term_arrays(e, esegs)
            if e in owners:
                terms_all, entries_all = fixed_terms, fixed_entries
            else:
                terms_all = sorted(fixed_terms + [e])
                by_term = dict(zip(fixed_terms, fixed_entries))
                by_term[e] = e_entry
                entries_all = [by_term[t] for t in terms_all]
            cand = self._conj_candidates(terms_all, entries_all)
            all_owners = dict(owners)
            all_owners[e] = esegs
            cand = self._verify_phrase(fixed + [e], all_owners, cand)
            if len(cand) == 0:
                continue
            matched.append((cand, e_entry[1][np.searchsorted(e_entry[0], cand)]))
        if not matched:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        docs = np.unique(np.concatenate([c for c, _ in matched]))
        best = np.full(len(docs), -np.inf)
        for cand, contrib in matched:
            np.maximum.at(best, np.searchsorted(docs, cand), contrib)
        scores = np.zeros(len(docs), dtype=np.float64)
        for doc_ids, contribs, _, _ in fixed_entries:  # sorted-term order
            scores += contribs[np.searchsorted(doc_ids, docs)]
        scores += best  # fixed-sum first, max last — the SQL's addition order
        from ..bm25 import topk_select

        return topk_select(docs, scores, self.k)

    def _expand_wildcard(self, pattern: str) -> set[str]:
        """GENERAL wildcard expansion (Lucene WildcardQuery, ``*`` only,
        anywhere in the token): all dictionary terms matching the glob.
        When the pattern has a literal prefix before the first ``*`` the
        scan is bisected to that prefix's range (same routing story as
        _expand_prefix); a LEADING wildcard degrades to a full dictionary
        scan — bounded by vocabulary size, not corpus size, exactly as in
        Lucene (which warns about leading wildcards for the same reason)."""
        import bisect
        import re as _re

        pre = pattern.split("*", 1)[0]
        rx = _re.compile(
            "^" + ".*".join(_re.escape(p) for p in pattern.split("*")) + "$"
        )
        out: set[str] = set()
        for seg in self.segments:
            ts = seg.terms_sorted
            if pre:
                i0 = bisect.bisect_left(ts, pre)
                i1 = bisect.bisect_left(ts, pre[:-1] + chr(ord(pre[-1]) + 1))
                cand = ts[i0:i1]
            else:
                cand = ts
            out.update(t for t in cand if rx.match(t))
        return out

    def _score_query_wildcard(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Wildcard retrieval with ``*`` anywhere (contains ``*ab*``,
        suffix ``*ab``, infix ``a*b`` — generalizing mode='prefix'): each
        pattern EXPANDS to the matching dictionary terms and the query
        scores as disjunctive BM25 over the union, each term with its own
        global df/idf (scoring_boolean rewrite, SQL-replayable via LIKE).
        Patterns lowercase; a bare ``*`` is ignored; literal tokens pass
        through tokenize."""
        terms: set[str] = set()
        for raw in text.split():
            if "*" in raw:
                pat = raw.lower()
                if pat.strip("*"):
                    terms |= self._expand_wildcard(pat)
            else:
                terms.update(tokenize(raw))
        return self._score_terms(terms)

    def _expand_regexp(self, pattern: str) -> set[str]:
        """Regexp expansion (Lucene RegexpQuery: the pattern must match the
        WHOLE term — re.fullmatch): all dictionary terms matching. Routing
        mirrors _expand_wildcard: a literal prefix (leading [a-z0-9] chars
        before the first metacharacter) bisects each segment's sorted
        dictionary to that range; a pattern with no literal prefix scans
        the vocabulary — bounded by dictionary size, never corpus size.
        The supported construct set is the RE2 ∩ Python-re common core
        (classes, alternation, ., *, +, ?), which is what makes the DuckDB
        regexp_full_match oracle an exact replay."""
        import bisect
        import re as _re

        pre = ""
        for ch in pattern:
            if ch.isalnum():
                pre += ch
            else:
                break
        rx = _re.compile(pattern)
        out: set[str] = set()
        for seg in self.segments:
            ts = seg.terms_sorted
            if pre:
                i0 = bisect.bisect_left(ts, pre)
                i1 = bisect.bisect_left(ts, pre[:-1] + chr(ord(pre[-1]) + 1))
                cand = ts[i0:i1]
            else:
                cand = ts
            out.update(t for t in cand if rx.fullmatch(t))
        return out

    def _score_query_regexp(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Regexp retrieval (Lucene RegexpQuery, scoring_boolean rewrite):
        EVERY whitespace-separated item is a full-match regex over the term
        dictionary (a plain token is the literal regex matching itself);
        the union of expansions scores as disjunctive BM25, each matched
        term with its own global df/idf. Patterns are lowercased (the
        dictionary is [a-z0-9]+ by the textnorm contract); a pattern
        matching nothing contributes nothing."""
        terms: set[str] = set()
        for raw in text.split():
            terms |= self._expand_regexp(raw.lower())
        return self._score_terms(terms)

    def _expand_fuzzy(self, tok: str, max_edits: int = 1) -> set[str]:
        """Union of each segment's d≤``max_edits`` dictionary candidates,
        cached per scorer and per distance (typo-class queries repeat the
        same tokens heavily)."""
        if not hasattr(self, "_fuzzy_exp_cache"):
            self._fuzzy_exp_cache: dict[tuple[str, int], set[str]] = {}
        got = self._fuzzy_exp_cache.get((tok, max_edits))
        if got is None:
            got = set()
            for seg in self.segments:
                if max_edits >= 2:
                    got.update(seg.fuzzy2_candidates(tok))
                else:
                    got.update(seg.fuzzy1_candidates(tok))
            self._fuzzy_exp_cache[(tok, max_edits)] = got
        return got

    def _score_query_fuzzy(self, text: str, max_edits: int = 1) -> tuple[np.ndarray, np.ndarray]:
        """Typo-tolerant retrieval: EVERY query token expands to the
        dictionary terms within Levenshtein distance ≤ ``max_edits``
        (including exact hits); the union scores as disjunctive BM25, each
        matched term with its own global df/idf — the scoring_boolean
        rewrite of Lucene's FuzzyQuery, minus transposition credit (plain
        Levenshtein, replayable by DuckDB's levenshtein()). A token with no
        near-dictionary neighbour contributes nothing."""
        terms: set[str] = set()
        for tok in set(tokenize(text)):
            terms |= self._expand_fuzzy(tok, max_edits)
        return self._score_terms(terms)

    def _score_query_boost(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Weighted retrieval: ``term^2.5`` multiplies that term's BM25
        contribution by 2.5 (Lucene boost syntax). Frozen semantics:
        unmarked terms weigh 1.0; REPEATED terms SUM their weights
        ("table^2 table" ≡ table^3 — unlike or-mode's set semantics, and
        exactly what a grouping SQL oracle computes); negative boosts are
        rejected (they would invalidate WAND's upper bounds). Scaling both
        the cached contribution arrays and the block maxima by w keeps
        Block-Max WAND admissible and exact, so wand == brute stays
        bit-identical (property-tested)."""
        weights: dict[str, float] = {}
        for raw in text.split():
            stem, sep, ws = raw.rpartition("^")
            w = 1.0
            if sep:
                try:
                    w = float(ws)
                except ValueError:
                    stem = raw
            else:
                stem = raw
            if w < 0:
                raise ValueError(f"negative boost in query term {raw!r}")
            for t in tokenize(stem):
                weights[t] = weights.get(t, 0.0) + w
        owners = {}
        for t in weights:
            segs = self._owners(t)
            if segs:
                owners[t] = segs
        terms = sorted(owners)
        if not terms:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        entries = []
        for t in terms:
            doc_ids, contribs, lasts, bmax = self._term_arrays(t, owners[t])
            w = weights[t]
            entries.append((t, doc_ids, contribs * w, lasts, bmax * w))
        if self.method == "brute":
            from ..bm25 import topk_select

            all_ids = np.unique(np.concatenate([e[1] for e in entries]))
            scores = np.zeros(len(all_ids), dtype=np.float64)
            for _, doc_ids, contribs, _, _ in entries:  # sorted-term order
                scores[np.searchsorted(all_ids, doc_ids)] += contribs
            return topk_select(all_ids, scores, self.k)
        return block_max_topk(entries, self.avgdl, self.k)

    def _score_query_boolean(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Lucene occur clauses: ``+term`` MUST, ``-term`` MUST_NOT, bare
        term SHOULD. Frozen semantics (BooleanQuery): a doc is eligible iff
        it contains every MUST term, none of the MUST_NOT terms, and — when
        there are no MUST terms — at least one SHOULD term; the score is
        the BM25 sum of the MUST ∪ SHOULD terms PRESENT in the doc (SHOULD
        terms add score but are not required once a MUST exists). A query
        with no positive clause returns nothing (Lucene's pure-negative
        rule). An OOV MUST term empties; OOV SHOULD/MUST_NOT terms drop.
        Candidates: MUST intersection (or SHOULD union), minus the
        MUST_NOT unions — all sorted-array set algebra, postings-bounded."""
        must: set[str] = set()
        must_not: set[str] = set()
        should: set[str] = set()
        for raw in text.split():
            if raw.startswith("+"):
                must.update(tokenize(raw[1:]))
            elif raw.startswith("-"):
                must_not.update(tokenize(raw[1:]))
            else:
                should.update(tokenize(raw))
        should -= must  # a term that is MUST does not double-count
        if not must and not should:
            return np.empty(0, np.uint64), np.empty(0, np.float64)

        def entry_of(t):
            segs = self._owners(t)
            return self._term_arrays(t, segs) if segs else None

        # eligibility base
        if must:
            m_entries = []
            for t in sorted(must):
                e = entry_of(t)
                if e is None:
                    return np.empty(0, np.uint64), np.empty(0, np.float64)
                m_entries.append(e)
            cand = self._conj_candidates(sorted(must), m_entries)
        else:
            lists = [e[0] for t in sorted(should) if (e := entry_of(t)) is not None]
            if not lists:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            cand = np.unique(np.concatenate(lists))
        # exclusions
        for t in sorted(must_not):
            if len(cand) == 0:
                break
            e = entry_of(t)
            if e is None:
                continue
            pos = np.searchsorted(e[0], cand)
            hit = pos < len(e[0])
            hit[hit] = e[0][pos[hit]] == cand[hit]
            cand = cand[~hit]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        # score MUST ∪ SHOULD contributions where present (sorted-term order)
        scores = np.zeros(len(cand), dtype=np.float64)
        for t in sorted(must | should):
            e = entry_of(t)
            if e is None:
                continue
            doc_ids, contribs = e[0], e[1]
            pos = np.searchsorted(doc_ids, cand)
            ok = pos < len(doc_ids)
            ok[ok] = doc_ids[pos[ok]] == cand[ok]
            scores[ok] += contribs[pos[ok]]
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _score_query_qs(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """The ``query_string`` mini language (parse_query_string) — the
        user-facing entry point that COMPOSES the engine's clause types in
        one query: quoted phrases (MUST, adjacency-verified), ``+``/``-``
        occur prefixes, ``^W`` boosts, trailing-``*`` prefix expansion.
        Frozen semantics:

        * eligibility — if any MUST term or phrase exists: the conjunctive
          intersection of all MUST terms and all phrase terms, each phrase
          adjacency-verified; else the union of SHOULD terms (prefixes
          expanded). MUST_NOT unions subtract. No positive clause (or an
          OOV MUST/phrase term) ⇒ empty, Lucene's pure-negative rule.
        * scoring — each doc's score is Σ weight(t)·contrib(t,d) over the
          positive terms it contains, where weight(t) SUMS the term's
          clause occurrences (MUST = 1, each phrase listing t = 1, SHOULD
          = its boost, each prefix-expanded term = the prefix's boost) —
          the groupable semantics an exact SQL oracle replays, as in
          mode="boost". Order (score DESC, doc_id ASC)."""
        phrases, must, must_not, should = parse_query_string(text)
        phrase_seqs = [s for s in (tokenize(p) for p in phrases) if s]
        weights: dict[str, float] = {}
        for t in set(must):
            weights[t] = weights.get(t, 0.0) + 1.0
        for seq in phrase_seqs:
            for t in set(seq):
                weights[t] = weights.get(t, 0.0) + 1.0
        for item, w in should:
            terms = self._expand_prefix(item[:-1]) if item.endswith("*") else (item,)
            for t in terms:
                weights[t] = weights.get(t, 0.0) + w
        if not weights:
            return np.empty(0, np.uint64), np.empty(0, np.float64)

        def entry_of(t):
            segs = self._owners(t)
            return self._term_arrays(t, segs) if segs else None

        required = set(must)
        for seq in phrase_seqs:
            required |= set(seq)
        if required:
            req = sorted(required)
            entries = []
            for t in req:
                e = entry_of(t)
                if e is None:
                    return np.empty(0, np.uint64), np.empty(0, np.float64)
                entries.append(e)
            cand = self._conj_candidates(req, entries)
            owners = {t: self._owners(t) for t in req}
            for seq in phrase_seqs:
                if len(cand) == 0:
                    break
                cand = self._verify_phrase(seq, owners, cand)
        else:
            lists = [e[0] for t in sorted(weights) if (e := entry_of(t)) is not None]
            if not lists:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            cand = np.unique(np.concatenate(lists))
        for t in sorted(set(must_not)):
            if len(cand) == 0:
                break
            e = entry_of(t)
            if e is None:
                continue
            pos = np.searchsorted(e[0], cand)
            hit = pos < len(e[0])
            hit[hit] = e[0][pos[hit]] == cand[hit]
            cand = cand[~hit]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        for t in sorted(weights):
            e = entry_of(t)
            if e is None:
                continue
            doc_ids, contribs = e[0], e[1]
            pos = np.searchsorted(doc_ids, cand)
            ok = pos < len(doc_ids)
            ok[ok] = doc_ids[pos[ok]] == cand[ok]
            scores[ok] += weights[t] * contribs[pos[ok]]
        from ..bm25 import topk_select

        return topk_select(cand, scores, self.k)

    def _score_query(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        if self.mode == "and":
            return self._score_query_conj(text)
        if self.mode == "phrase":
            return self._score_query_phrase(text)
        if self.mode == "near":
            return self._score_query_near(text)
        if self.mode == "span_near":
            return self._score_query_span(text)
        if self.mode == "span_not":
            return self._score_query_span_not(text)
        if self.mode == "span_containing":
            return self._score_query_span_containing(text)
        if self.mode == "span_or":
            return self._score_query_span_or(text)
        if self.mode == "span_within":
            return self._score_query_span_within(text)
        if self.mode == "span_multi":
            return self._score_query_span_multi(text)
        if self.mode == "intervals":
            return self._score_query_intervals(text)
        if self.mode == "prefix":
            return self._score_query_prefix(text)
        if self.mode == "fuzzy":
            return self._score_query_fuzzy(text)
        if self.mode == "fuzzy2":
            return self._score_query_fuzzy(text, max_edits=2)
        if self.mode == "boost":
            return self._score_query_boost(text)
        if self.mode == "boolean":
            return self._score_query_boolean(text)
        if self.mode == "msm":
            return self._score_query_msm(text)
        if self.mode == "terms_set":
            return self._score_query_terms_set(text)
        if self.mode == "wildcard":
            return self._score_query_wildcard(text)
        if self.mode == "regexp":
            return self._score_query_regexp(text)
        if self.mode == "query_string":
            return self._score_query_qs(text)
        if self.mode == "phrase_prefix":
            return self._score_query_phrase_prefix(text)
        return self._score_terms(set(tokenize(text)))

    def _score_terms(self, toks: set[str]) -> tuple[np.ndarray, np.ndarray]:
        """Disjunctive BM25 top-k over a concrete term set (the or-mode
        engine; prefix mode feeds it the expanded set). OOV terms drop."""
        from ..bm25 import idf as idf_fn

        owners = {}
        for t in toks:
            segs = self._owners(t)
            if segs:
                owners[t] = segs
        terms = sorted(owners)
        if not terms:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        if self.method == "brute":
            postings = {t: self._gather_postings(t, owners[t]) for t in terms}
            dfs = {t: self._global_df(t, owners[t]) for t in terms}
            return brute_force_topk(
                terms, postings, dfs, self.doclens.lookup, self.n_docs, self.avgdl, self.k
            )
        if self.method == "wand_daat":  # reference doc-at-a-time cursor WAND
            # one cursor per (term, shard): shards are docID-disjoint, so a
            # pivot doc matches at most one cursor per term — WAND treats
            # them like independent terms with the shared global idf
            cursors = []
            for t in terms:
                gdf = self._global_df(t, owners[t])
                for seg in owners[t]:
                    cursors.append(seg.cursor(t, idf_fn(gdf, self.n_docs)))
            return wand_topk(cursors, self.doclens.lookup_one, self.avgdl, self.k)
        # default "wand": vectorized Block-Max WAND over cached full arrays,
        # or — when the query's terms cover a large fraction of the corpus
        # (flat block maxes, pruning can't bite) — exact term-at-a-time
        # dense accumulation over precomputed global positions, which skips
        # the union-sort work WAND would spend scoring nearly everything
        tbs = []
        total_postings = 0
        for t in terms:
            doc_ids, contribs, lasts, bmax = self._term_arrays(t, owners[t])
            tbs.append((t, doc_ids, contribs, lasts, bmax))
            total_postings += len(doc_ids)
        # dense-path trigger compares against the LOCAL doc space (== n_docs
        # for the default full-corpus scorer; the range's size when sharded)
        n_local = len(self.doclens.doc_ids)
        if n_local and total_postings * 8 >= n_local:
            if self._dense_scratch is None:
                self._dense_scratch = np.zeros(len(self.doclens.doc_ids), dtype=np.float64)
            pos_entries = []
            for t, doc_ids, contribs, _, _ in tbs:
                pos = self._pos_cache.get(t)
                if pos is None:
                    pos = np.searchsorted(self.doclens.doc_ids, doc_ids)
                    if len(self.doclens.doc_ids) < (1 << 31):
                        pos = pos.astype(np.int32)  # halve index bandwidth
                    self._charge_cache(len(pos))
                    self._pos_cache[t] = pos
                pos_entries.append((pos, contribs))
            return dense_accum_topk(pos_entries, self.doclens.doc_ids, self._dense_scratch, self.k)
        return block_max_topk(tbs, self.avgdl, self.k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out, ranks_out, docs_out, scores_out = [], [], [], []
        qids = batch["query_id"].to_pylist()
        texts = batch["text"].to_pylist()
        for qid, text in zip(qids, texts):
            d, s = self._score_query(text)
            qids_out.extend([qid] * len(d))
            ranks_out.extend(range(1, len(d) + 1))
            docs_out.append(d)
            scores_out.append(s)
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        scores = np.concatenate(scores_out) if scores_out else np.empty(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                "score": pa.array(scores, pa.float64()),
            }
        )


class FacetCounter:
    """Search-engine FACETING over the full match set: for each query,
    count the DISTINCT documents containing ≥1 query term, grouped by a
    docs/-sidecar facet column (e.g. lang). This is the collection-time
    aggregation mainstream engines run alongside top-k — the match set is
    the disjunctive postings union (doc_ids only; no scores, no doclens,
    no text), so the per-query cost is the query terms' postings length,
    exactly like scoring. Tombstoned docs are excluded (visibility
    semantics shared with QueryScorer).

    State loads once per worker (segments mmap + one dictionary-encoded
    facet array over the docs sidecar — code bytes per doc, not strings);
    at cluster scale the facet array shards by doc range with the same
    plan as DoclenTable (SCALE.md §3)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None, facet: str = "lang"):
        import pyarrow.compute as pc

        if seg_ids is None:
            from ..pipelines.query import list_segments

            seg_ids = list_segments(out_dir)
        self.segments = [Segment(out_dir, sid) for sid in seg_ids]
        self.facet = facet
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(pq.read_table(f, columns=["doc_id", facet]) for f in files)
        # per-pid files are doc_id-ascending and visited in pid order, so
        # the concat is globally sorted (doc_id = (pid<<40)|row)
        self.doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        enc = pc.dictionary_encode(tbl[facet].combine_chunks())
        self.codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        self.values = enc.dictionary.to_pylist()
        self.exclude_ids = mf.read_tombstones(out_dir)

    def _match_set(self, text: str) -> np.ndarray:
        lists = []
        for t in set(tokenize(text)):
            for seg in self.segments:
                got = seg.term_postings(t)
                if got is not None:
                    lists.append(got[0])
        if not lists:
            return np.empty(0, np.uint64)
        docs = np.unique(np.concatenate(lists))
        if self.exclude_ids is not None:
            pos = np.searchsorted(self.exclude_ids, docs)
            ok = pos < len(self.exclude_ids)
            ok[ok] = self.exclude_ids[pos[ok]] == docs[ok]
            docs = docs[~ok]
        return docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        vals_out: list[str] = []
        counts_out: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            codes = self.codes[np.searchsorted(self.doc_ids, docs)]
            counts = np.bincount(codes, minlength=len(self.values))
            # frozen output order: facet value ascending within each query
            for vi in np.argsort(np.asarray(self.values, dtype=object), kind="stable"):
                if counts[vi]:
                    qids_out.append(qid)
                    vals_out.append(self.values[vi])
                    counts_out.append(int(counts[vi]))
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                self.facet: pa.array(vals_out, pa.string()),
                "n_docs": pa.array(counts_out, pa.int64()),
            }
        )


class FacetCardinality(FacetCounter):
    """CARDINALITY aggregation over the match set (ES cardinality agg on
    a keyword field): per query, the number of DISTINCT facet values
    among the matching visible docs. Exact here (the facet dictionary is
    small); ES answers the same question with HyperLogLog++ when the
    value space is large — this engine's mergeable HLL sketch
    (functions/sketches.py) is the drop-in at that scale. Empty match
    sets emit no row."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        cards: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            codes = self.codes[np.searchsorted(self.doc_ids, docs)]
            qids_out.append(qid)
            cards.append(int(len(np.unique(codes))))
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "n_values": pa.array(cards, pa.int64()),
            }
        )


class FacetTopK:
    """GROUPED top-k (result diversification): for each query, the top-k
    BM25 hits WITHIN every facet group (e.g. per lang) — the "collapse by
    field" feature of mainstream engines, exact: the per-group ranking is
    the full disjunctive ranking restricted to the group, so it can be
    replayed by a windowed SQL oracle (row_number PARTITION BY query,
    facet). Composition: a brute-path QueryScorer supplies per-term
    cached (doc_id, contribution) arrays (tombstone/facet visibility
    included); the union accumulates in sorted-term order — bit-identical
    to the scorer's brute path — then one dictionary-code pass groups."""

    def __init__(
        self, out_dir: str, seg_ids: list[int] | None = None, facet: str = "lang", k: int = 5
    ):
        import pyarrow.compute as pc

        self.scorer = QueryScorer(out_dir, seg_ids, k=k, method="brute")
        self.k = k
        self.facet = facet
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(pq.read_table(f, columns=["doc_id", facet]) for f in files)
        self.doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        enc = pc.dictionary_encode(tbl[facet].combine_chunks())
        self.codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        self.values = enc.dictionary.to_pylist()
        self._value_order = sorted(range(len(self.values)), key=self.values.__getitem__)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..bm25 import topk_select

        qids_out: list[int] = []
        vals_out: list[str] = []
        ranks_out: list[int] = []
        docs_out: list[np.ndarray] = []
        scores_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            owners = {}
            for t in set(tokenize(text)):
                segs = self.scorer._owners(t)
                if segs:
                    owners[t] = segs
            terms = sorted(owners)
            if not terms:
                continue
            entries = [self.scorer._term_arrays(t, owners[t]) for t in terms]
            all_ids = np.unique(np.concatenate([e[0] for e in entries]))
            scores = np.zeros(len(all_ids), dtype=np.float64)
            for doc_ids, contribs, _, _ in entries:  # sorted-term order
                pos = np.searchsorted(all_ids, doc_ids)
                scores[pos] += contribs
            codes = self.codes[np.searchsorted(self.doc_ids, all_ids)]
            for vi in self._value_order:
                m = codes == vi
                if not m.any():
                    continue
                d, s = topk_select(all_ids[m], scores[m], self.k)
                qids_out.extend([qid] * len(d))
                vals_out.extend([self.values[vi]] * len(d))
                ranks_out.extend(range(1, len(d) + 1))
                docs_out.append(d)
                scores_out.append(s)
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        scrs = np.concatenate(scores_out) if scores_out else np.empty(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                self.facet: pa.array(vals_out, pa.string()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                "score": pa.array(scrs, pa.float64()),
            }
        )


class FunctionScoreTopK:
    """FUNCTION-SCORE retrieval (Elasticsearch's function_score with a
    LINEAR time-decay multiplier): final = bm25 × max(0, 1 − |origin −
    ts| / scale) — "relevance, discounted by staleness". Linear decay is
    chosen over exp/gauss deliberately: the factor is a short chain of
    IEEE-754 ops (int64 diff → double divide → subtract → clamp) that
    rounds IDENTICALLY in numpy and the SQL oracle, so ranks replay
    bit-faithfully; transcendental decay would differ in the last ulp
    across libm implementations. The multiplier is ≤ 1, so Block-Max
    WAND's undecayed bounds stay admissible upper bounds at cluster
    scale; here the brute-path scorer supplies per-term cached (doc_id,
    contribution) arrays (tombstone/filter visibility included) and the
    union accumulates in sorted-term order — bit-identical to the
    scorer's brute path — then one docvalue gather applies the decay
    before top-k selection. Total order: (final score DESC, doc_id ASC)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "warc_ts", origin_us: int = 0,
                 scale_us: int = 1, k: int = 10):
        self.scorer = QueryScorer(out_dir, seg_ids, k=k, method="brute")
        self.k = k
        self.field = field
        self.origin_us = int(origin_us)
        self.scale_us = int(scale_us)
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(pq.read_table(f, columns=["doc_id", field]) for f in files)
        self.doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        self.vals = tbl[field].cast(pa.int64()).to_numpy(zero_copy_only=False)

    def _factor(self, vals: np.ndarray) -> np.ndarray:
        """Per-doc multiplier from the gathered docvalues. Base class:
        clamped linear decay (an int64 diff, one divide, one subtract —
        every op correctly rounded identically in numpy and SQL)."""
        return np.maximum(1.0 - np.abs(self.origin_us - vals) / float(self.scale_us), 0.0)

    def _apply(self, scores: np.ndarray, vals: np.ndarray) -> np.ndarray:
        """Combine the BM25 sums with the docvalue signal. Base class
        (and every multiplicative function_score): scores × factor.
        Additive feature queries (rank_feature / distance_feature)
        override this to ADD their boost instead."""
        return scores * self._factor(vals)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..bm25 import topk_select

        qids_out: list[int] = []
        ranks_out: list[int] = []
        docs_out: list[np.ndarray] = []
        scores_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            owners = {}
            for t in set(tokenize(text)):
                segs = self.scorer._owners(t)
                if segs:
                    owners[t] = segs
            terms = sorted(owners)
            if not terms:
                continue
            entries = [self.scorer._term_arrays(t, owners[t]) for t in terms]
            all_ids = np.unique(np.concatenate([e[0] for e in entries]))
            scores = np.zeros(len(all_ids), dtype=np.float64)
            for doc_ids, contribs, _, _ in entries:  # sorted-term order
                pos = np.searchsorted(all_ids, doc_ids)
                scores[pos] += contribs
            ts = self.vals[np.searchsorted(self.doc_ids, all_ids)]
            scores = self._apply(scores, ts)
            d, s = topk_select(all_ids, scores, self.k)
            qids_out.extend([qid] * len(d))
            ranks_out.extend(range(1, len(d) + 1))
            docs_out.append(d)
            scores_out.append(s)
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        scrs = np.concatenate(scores_out) if scores_out else np.empty(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                "score": pa.array(scrs, pa.float64()),
            }
        )


class FieldValueFactorTopK(FunctionScoreTopK):
    """FIELD_VALUE_FACTOR retrieval (Elasticsearch's function_score with
    ``field_value_factor`` and the ``ln1p`` modifier): final = bm25 ×
    ln(1 + docvalue) — "relevance, boosted by an intrinsic document
    signal" (here doclen: longer docs carry more link equity in the
    classic static-boost setups; any int64 docvalue slots in). ln1p is
    the one ES modifier that is hash-replayable: the argument 1+v is an
    exact integer, libm's correctly-rounded ln agrees bitwise between
    numpy and DuckDB on identical doubles, and the final multiply is one
    correctly-rounded IEEE op — the same replayability argument as the
    linear decay. The factor is NOT bounded by 1, so unlike the decay it
    cannot reuse undecayed WAND bounds; the brute union path (shared with
    the base class) is the correct engine here, and at cluster scale the
    per-term block maxima would scale by ln(1 + max_dl) to stay
    admissible. Total order: (final score DESC, doc_id ASC)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "doclen", k: int = 10):
        super().__init__(out_dir, seg_ids, field=field, origin_us=0, scale_us=1, k=k)

    def _factor(self, vals: np.ndarray) -> np.ndarray:
        return np.log1p(vals.astype(np.float64))


class RankFeatureTopK(FunctionScoreTopK):
    """RANK_FEATURE retrieval (Elasticsearch's ``rank_feature`` query with
    the default ``saturation`` function, as a bool-should clause next to
    the match query): final = bm25 + weight × f/(f + pivot), over the
    MATCH SET of the text query (ES scores only docs satisfying the
    must/match clause; the feature clause then boosts each of them —
    exactly the union this stage already gathers). The saturation form
    is Lucene's core static-signal shape (pagerank / url_length /
    popularity features); here any int64 docvalue slots in (default:
    doclen). Replayability: f and pivot are exact integers, f + pivot is
    an exact double below 2^53, the divide is one correctly-rounded IEEE
    op, weight is a power of two, and the final add is one IEEE op — the
    same bitwise argument as the linear decay. Saturation is monotone in
    f, so docs with equal (tf profile, dl) stay exactly tied — callers
    wanting the external source-id tie order use the _full_ranking
    re-rank (the field_value_factor pattern). The boost is bounded by
    ``weight``, so at cluster scale WAND bounds stay admissible after a
    +weight shift per block maximum. Total order (score DESC, doc_id
    ASC)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "doclen", pivot: int = 100,
                 weight: float = 2.0, k: int = 10):
        super().__init__(out_dir, seg_ids, field=field, origin_us=0, scale_us=1, k=k)
        self.pivot = int(pivot)
        self.weight = float(weight)

    def _apply(self, scores: np.ndarray, vals: np.ndarray) -> np.ndarray:
        f = vals.astype(np.float64)
        return scores + self.weight * (f / (f + float(self.pivot)))


class DistanceFeatureTopK(FunctionScoreTopK):
    """DISTANCE_FEATURE retrieval (Elasticsearch's ``distance_feature``
    query on a date field, as a bool-should clause): final = bm25 +
    weight × pivot/(pivot + |origin − ts|) — "relevance, boosted by
    recency-to-origin", the additive counterpart of the multiplicative
    linear decay. The int64 |origin − ts| is exact, pivot + dist is an
    exact double below 2^53 (crawl timestamps are ~1.7e15 µs), the
    divide is one correctly-rounded IEEE op, weight is a power of two,
    and the add is one IEEE op — ranks replay bit-faithfully in SQL.
    Docs equidistant from origin on opposite sides collide, so ties are
    NOT fully broken: callers use the _full_ranking source-id re-rank.
    Boost ≤ weight keeps shifted WAND bounds admissible at cluster
    scale. Total order (score DESC, doc_id ASC)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "warc_ts", origin_us: int = 0,
                 pivot_us: int = 1, weight: float = 2.0, k: int = 10):
        super().__init__(out_dir, seg_ids, field=field, origin_us=origin_us,
                         scale_us=1, k=k)
        self.pivot_us = int(pivot_us)
        self.weight = float(weight)

    def _apply(self, scores: np.ndarray, vals: np.ndarray) -> np.ndarray:
        dist = np.abs(np.int64(self.origin_us) - vals).astype(np.float64)
        return scores + self.weight * (float(self.pivot_us) / (float(self.pivot_us) + dist))


class CombinedFieldsTopK:
    """COMBINED_FIELDS retrieval (Elasticsearch's ``combined_fields``
    query / Lucene's CombinedFieldQuery, i.e. BM25F with integer field
    weights): the third multi_match-family semantics, distinct from both
    the weighted per-field score sum (bm25_topk_multifield) and the
    per-term best field (cross_fields). Fields merge into ONE synthetic
    field BEFORE scoring:

        tf'(t,d) = tf_body + W·tf_title      (term freq, weight-repeated)
        dl'(d)   = dl_body + W·dl_title      (combined length)
        avgdl'   = Σ dl' / N                 (one exact-int divide)
        df'(t)   = combined df — here df_body, because the title field is
                   the doc's first TITLE_LEN body tokens (title ⊆ body,
                   asserted per gathered posting)
        score    = Σ_t idf'(t) · tf'·(k1+1)/(tf' + k1·(1−b+b·dl'/avgdl'))

    With an integer W, tf' and dl' stay exact integers, so the whole
    float chain is the standard BM25 expression over exact-int inputs —
    the same bitwise SQL-replay argument as the base scorer. Execution:
    both REAL field indexes load per worker (term-sharded gathers with
    global df, exactly the scorer's path); title postings join to body
    doc space through the url-aligned sidecar map built once in
    __init__. At cluster scale each doc-range shard holds its slice of
    both fields' postings and the url alignment is partition-local (the
    multifield plan, SCALE.md §3). Total order (score DESC, doc_id ASC)
    in body-internal space; callers re-rank in source-id space for the
    external tie order (the _full_ranking pattern — combined scores tie
    exactly for content clones)."""

    def __init__(self, body_dir: str, title_dir: str,
                 w_title: int = 2, k: int = 10):
        import pyarrow.compute as pc

        self.k = k
        self.w_title = int(w_title)
        self.sb = QueryScorer(body_dir, k=k, method="brute")
        self.st = QueryScorer(title_dir, k=k, method="brute")

        def _sidecar(d: str) -> pa.Table:
            files = sorted(glob.glob(os.path.join(d, "docs", "pid=*.parquet")))
            return pa.concat_tables(
                pq.read_table(f, columns=["doc_id", "url", "doclen"]) for f in files
            )

        b, t = _sidecar(body_dir), _sidecar(title_dir)
        bo = pc.sort_indices(b["url"])
        to = pc.sort_indices(t["url"])
        b_urls = b["url"].take(bo).to_pylist()
        t_urls = t["url"].take(to).to_pylist()
        if b_urls != t_urls:
            raise ValueError("combined_fields: field indexes cover different urls")
        b_ids = b["doc_id"].take(bo).to_numpy(zero_copy_only=False).astype(np.uint64)
        t_ids = t["doc_id"].take(to).to_numpy(zero_copy_only=False).astype(np.uint64)
        b_dl = b["doclen"].take(bo).to_numpy(zero_copy_only=False).astype(np.int64)
        t_dl = t["doclen"].take(to).to_numpy(zero_copy_only=False).astype(np.int64)
        # title-internal-id -> body-internal-id map (sorted by title id)
        o = np.argsort(t_ids)
        self.t_key = t_ids[o]
        self.t_val_b = b_ids[o]
        # combined doclen table keyed by body id (sorted)
        o = np.argsort(b_ids)
        self.dl_key = b_ids[o]
        dlc = b_dl + self.w_title * t_dl
        self.dl_val = dlc[o]
        self.n_docs = self.sb.n_docs
        self.avgdl_c = float(int(dlc.sum())) / float(self.n_docs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..bm25 import idf, score_tf, topk_select

        qids_out: list[int] = []
        ranks_out: list[int] = []
        docs_out: list[np.ndarray] = []
        scores_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            entries = []
            for t in sorted(set(tokenize(text))):
                segs_b = self.sb._owners(t)
                if not segs_b:
                    continue  # title ⊆ body: no body postings ⇒ no match
                ids_b, tf_b = self.sb._gather_postings(t, segs_b)
                tfc = tf_b.astype(np.int64)
                segs_t = self.st._owners(t)
                if segs_t:
                    ids_t, tf_t = self.st._gather_postings(t, segs_t)
                    mapped = self.t_val_b[np.searchsorted(self.t_key, ids_t)]
                    o = np.argsort(mapped)
                    mapped = mapped[o]
                    pos = np.searchsorted(ids_b, mapped)
                    if not (pos < len(ids_b)).all() or not (ids_b[pos] == mapped).all():
                        raise AssertionError(
                            f"combined_fields: title postings for {t!r} not a "
                            "subset of body postings"
                        )
                    tfc[pos] += self.w_title * tf_t[o].astype(np.int64)
                entries.append(
                    (ids_b, tfc, idf(self.sb._global_df(t, segs_b), self.n_docs))
                )
            if not entries:
                continue
            all_ids = np.unique(np.concatenate([e[0] for e in entries]))
            dls = self.dl_val[np.searchsorted(self.dl_key, all_ids)].astype(np.float64)
            scores = np.zeros(len(all_ids), dtype=np.float64)
            for ids_b, tfc, idf_val in entries:  # sorted-term order
                pos = np.searchsorted(all_ids, ids_b)
                scores[pos] += score_tf(
                    tfc.astype(np.float64), dls[pos], self.avgdl_c, idf_val
                )
            d, s = topk_select(all_ids, scores, self.k)
            qids_out.extend([qid] * len(d))
            ranks_out.extend(range(1, len(d) + 1))
            docs_out.append(d)
            scores_out.append(s)
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        scrs = np.concatenate(scores_out) if scores_out else np.empty(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                "score": pa.array(scrs, pa.float64()),
            }
        )


class BoostingTopK:
    """BOOSTING retrieval (Elasticsearch's ``boosting`` query): the
    positive disjunctive BM25 score, multiplied by ``negative_boost``
    when the doc ALSO matches the negative query (any negative term
    present — filter-context match; the negative side's scores are never
    used). Demotion, not exclusion: negative matches stay ranked, just
    below what their relevance alone would earn. ``negative_boost``
    defaults to 0.5 — a power of two, so the demotion multiply is
    IEEE-exact and the SQL replay is bit-faithful (the same reasoning as
    FunctionScoreTopK's linear decay). The negative match set is the
    union of the negative terms' postings doc_ids, gathered through the
    same term-sharded segments as the positives (OOV negative terms
    contribute nothing; a doc-range-sharded scorer sees only its range's
    postings, so the demotion set shards for free at cluster scale).
    Total order (final score DESC, doc_id ASC)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 negative_boost: float = 0.5, k: int = 10):
        self.scorer = QueryScorer(out_dir, seg_ids, k=k, method="brute")
        self.k = k
        self.neg_boost = float(negative_boost)

    def _match_ids(self, text: str) -> np.ndarray | None:
        parts = []
        for t in set(tokenize(text or "")):
            segs = self.scorer._owners(t)
            if segs:
                parts.append(self.scorer._term_arrays(t, segs)[0])
        if not parts:
            return None
        return np.unique(np.concatenate(parts))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..bm25 import topk_select

        qids_out: list[int] = []
        ranks_out: list[int] = []
        docs_out: list[np.ndarray] = []
        scores_out: list[np.ndarray] = []
        for qid, text, neg in zip(
            batch["query_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["neg"].to_pylist(),
        ):
            owners = {}
            for t in set(tokenize(text)):
                segs = self.scorer._owners(t)
                if segs:
                    owners[t] = segs
            terms = sorted(owners)
            if not terms:
                continue
            entries = [self.scorer._term_arrays(t, owners[t]) for t in terms]
            all_ids = np.unique(np.concatenate([e[0] for e in entries]))
            scores = np.zeros(len(all_ids), dtype=np.float64)
            for doc_ids, contribs, _, _ in entries:  # sorted-term order
                pos = np.searchsorted(all_ids, doc_ids)
                scores[pos] += contribs
            negset = self._match_ids(neg)
            if negset is not None:
                hit = np.isin(all_ids, negset, assume_unique=True)
                scores = np.where(hit, scores * self.neg_boost, scores)
            d, s = topk_select(all_ids, scores, self.k)
            qids_out.extend([qid] * len(d))
            ranks_out.extend(range(1, len(d) + 1))
            docs_out.append(d)
            scores_out.append(s)
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        scrs = np.concatenate(scores_out) if scores_out else np.empty(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                "score": pa.array(scrs, pa.float64()),
            }
        )


class BoostingTopKTaskFn:
    """Task-fn form of BoostingTopK (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int],
                 negative_boost: float, k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), float(negative_boost), k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, neg_boost, k, version = self.args
        key = (out_dir, version, seg_ids, neg_boost, k, "boosting")
        bt = _WORKER_MATCH_AGG_CACHE.get(key)
        if bt is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            bt = BoostingTopK(out_dir, list(seg_ids), neg_boost, k)
            _WORKER_MATCH_AGG_CACHE[key] = bt
        return bt(batch)


class SynonymTopK:
    """QUERY-TIME SYNONYM EXPANSION with Lucene SynonymQuery semantics:
    each query term expands to its synonym group {term} ∪ syns(term), and
    the group scores as ONE pseudo-term — merged tf = Σ tf over the
    group's members present in the doc, idf from the group's MAX df (the
    Lucene blended-df rule: synonyms share one saturation curve instead
    of double-counting near-identical words). Groups accumulate in
    sorted-base-term order (the frozen order rule); total order
    (score DESC, doc_id ASC). An out-of-vocabulary synonym simply
    contributes nothing (its postings are empty); a whole-group miss
    drops the group, and a query with no surviving group emits no rows.

    The group merge is vectorized: concat the members' (doc_id, tf)
    arrays → np.unique(return_inverse) → np.add.at fold. Per-query cost
    is the expanded terms' postings length — identical shape to
    disjunctive scoring, so the doc-range-sharded cluster path applies
    unchanged (merged tf and max-df are per-group global facts;
    df sums/maxes ship with the query exactly like global df today)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 synonyms: tuple[tuple[str, tuple[str, ...]], ...] = (),
                 k: int = 10):
        self.scorer = QueryScorer(out_dir, seg_ids, k=k, method="brute")
        self.k = k
        self.synonyms = {base: tuple(syns) for base, syns in synonyms}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..bm25 import idf as idf_fn, score_tf, topk_select

        sc = self.scorer
        qids_out: list[int] = []
        ranks_out: list[int] = []
        docs_out: list[np.ndarray] = []
        scores_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            groups: list[tuple[str, list[str]]] = []
            for base in sorted(set(tokenize(text))):
                members = []
                for t in sorted({base, *self.synonyms.get(base, ())}):
                    if sc._owners(t):
                        members.append(t)
                if members:
                    groups.append((base, members))
            if not groups:
                continue
            merged: list[tuple[np.ndarray, np.ndarray, float]] = []
            for _, members in groups:
                parts = [sc._gather_postings(t, sc._owners(t)) for t in members]
                ids = np.concatenate([p[0] for p in parts])
                tfs = np.concatenate([p[1] for p in parts]).astype(np.float64)
                uids, inv = np.unique(ids, return_inverse=True)
                mtf = np.zeros(len(uids), dtype=np.float64)
                np.add.at(mtf, inv, tfs)
                dfm = max(sc._global_df(t, sc._owners(t)) for t in members)
                merged.append((uids, mtf, idf_fn(dfm, sc.n_docs)))
            cand = np.unique(np.concatenate([m[0] for m in merged]))
            dls = sc.doclens.lookup(cand).astype(np.float64)
            scores = np.zeros(len(cand), dtype=np.float64)
            for uids, mtf, idf_val in merged:  # sorted-base-term order
                pos = np.searchsorted(cand, uids)
                scores[pos] += score_tf(mtf, dls[pos], sc.avgdl, idf_val)
            d, s = topk_select(cand, scores, self.k)
            qids_out.extend([qid] * len(d))
            ranks_out.extend(range(1, len(d) + 1))
            docs_out.append(d)
            scores_out.append(s)
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        scrs = np.concatenate(scores_out) if scores_out else np.empty(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                "score": pa.array(scrs, pa.float64()),
            }
        )


class RescoreTopK:
    """RESCORE API (Elasticsearch rescore): retrieve a WINDOW of the top-N
    docs by the primary disjunctive BM25, then — inside the window only —
    add a phrase bonus:

        final = bm25 + weight × bm25_phrase

    where bm25_phrase equals the doc's BM25 sum when it contains the query
    as a consecutive phrase, else 0 (the standard "cheap query recalls,
    expensive query re-ranks" pattern: the phrase verification runs on N
    window docs per query, never the corpus). The returned page is the
    top-k of the rescored window, order (final DESC, doc_id ASC). Both
    phases reuse the frozen QueryScorer paths, so window membership and
    scores are bit-identical to the primary/phrase modes the goldens pin."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 window: int = 30, weight: float = 2.0, k: int = 10):
        self.primary = QueryScorer(out_dir, seg_ids, k=window, method="wand")
        self.phrase = QueryScorer(out_dir, seg_ids, k=1 << 30, method="wand",
                                  mode="phrase")
        self.weight = float(weight)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..bm25 import topk_select

        qids_out: list[int] = []
        ranks_out: list[int] = []
        docs_out: list[np.ndarray] = []
        scores_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            d_win, s_win = self.primary._score_query(text)
            if len(d_win) == 0:
                continue
            d_ph, s_ph = self.phrase._score_query_phrase(text)
            bonus = np.zeros(len(d_win), dtype=np.float64)
            if len(d_ph):
                order = np.argsort(d_ph)
                d_ph, s_ph = d_ph[order], s_ph[order]
                pos = np.searchsorted(d_ph, d_win)
                ok = pos < len(d_ph)
                ok[ok] = d_ph[pos[ok]] == d_win[ok]
                bonus[ok] = s_ph[pos[ok]]
            final = s_win + self.weight * bonus
            d, s = topk_select(d_win, final, self.k)
            qids_out.extend([qid] * len(d))
            ranks_out.extend(range(1, len(d) + 1))
            docs_out.append(d)
            scores_out.append(s)
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        scrs = np.concatenate(scores_out) if scores_out else np.empty(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                "score": pa.array(scrs, pa.float64()),
            }
        )


class DocvalueTopK:
    """Sort-by-field retrieval: for each query, the top-k docs of the
    disjunctive MATCH SET ordered by a numeric docvalue (e.g. warc_ts
    DESC — "newest matching pages"), NOT by score. Mainstream engines call
    this sort-by-field; relevance never enters, so no BM25 state loads at
    all — the worker holds the mmap'd segments plus ONE int64 docvalue
    array over the docs sidecar (8 bytes/doc; shards by doc range at
    cluster scale exactly like doclens, SCALE.md §3). Frozen total order:
    (value DESC, doc_id ASC); tombstoned docs excluded (visibility shared
    with QueryScorer)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "warc_ts", k: int = 10):
        if seg_ids is None:
            from ..pipelines.query import list_segments

            seg_ids = list_segments(out_dir)
        self.segments = [Segment(out_dir, sid) for sid in seg_ids]
        self.field = field
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(pq.read_table(f, columns=["doc_id", field]) for f in files)
        # per-pid files are doc_id-ascending and visited in pid order, so
        # the concat is globally sorted (doc_id = (pid<<40)|row)
        self.doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        self.vals = tbl[field].cast(pa.int64()).to_numpy(zero_copy_only=False)
        self.exclude_ids = mf.read_tombstones(out_dir)
        self.k = k

    # match set = disjunctive postings union minus tombstones — identical
    # semantics to faceting, so borrow the implementation wholesale
    _match_set = FacetCounter._match_set

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        ranks_out: list[int] = []
        docs_out: list[np.ndarray] = []
        vals_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            vals = self.vals[np.searchsorted(self.doc_ids, docs)]
            k = min(self.k, len(docs))
            # top-k by (value DESC, doc_id ASC): docs is ascending, so a
            # stable sort on -vals yields exactly that order
            if len(docs) > k:
                # partition finds the kth value cheaply; the deterministic
                # (value DESC, doc_id ASC) order is then a stable sort over
                # only the >= kth candidates (ties at the boundary included)
                kth = -np.partition(-vals, k - 1)[k - 1]
                cand = np.flatnonzero(vals >= kth)
                sel = cand[np.argsort(-vals[cand], kind="stable")][:k]
            else:
                sel = np.argsort(-vals, kind="stable")[:k]
            qids_out.extend([qid] * len(sel))
            ranks_out.extend(range(1, len(sel) + 1))
            docs_out.append(docs[sel])
            vals_out.append(vals[sel])
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        vals = np.concatenate(vals_out) if vals_out else np.empty(0, np.int64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                self.field: pa.array(vals, pa.int64()),
            }
        )


class DocvalueSearchAfter(DocvalueTopK):
    """SEARCH_AFTER cursor pagination on the docvalue sort (the ES
    search_after API — the scale-safe alternative to from+size offset
    paging: a cursor is O(1) state per client, while deep offsets force
    every shard to materialize offset+k results). Batch rows carry the
    per-query cursor (after_val, after_doc) = the sort key of the last
    hit already delivered; a doc qualifies iff it sorts STRICTLY after
    the cursor in the frozen (value DESC, doc_id ASC) order:
    value < after_val OR (value == after_val AND doc_id > after_doc).
    The filter is one vectorized mask over the match set before the
    same top-k selection as DocvalueTopK."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        ranks_out: list[int] = []
        docs_out: list[np.ndarray] = []
        vals_out: list[np.ndarray] = []
        after_vals = batch["after_val"].to_pylist()
        after_docs = batch["after_doc"].to_pylist()
        for qid, text, a_val, a_doc in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist(),
            after_vals, after_docs,
        ):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            vals = self.vals[np.searchsorted(self.doc_ids, docs)]
            m = (vals < a_val) | ((vals == a_val) & (docs > np.uint64(a_doc)))
            docs, vals = docs[m], vals[m]
            if len(docs) == 0:
                continue
            k = min(self.k, len(docs))
            if len(docs) > k:
                kth = -np.partition(-vals, k - 1)[k - 1]
                cand = np.flatnonzero(vals >= kth)
                sel = cand[np.argsort(-vals[cand], kind="stable")][:k]
            else:
                sel = np.argsort(-vals, kind="stable")[:k]
            qids_out.extend([qid] * len(sel))
            ranks_out.extend(range(1, len(sel) + 1))
            docs_out.append(docs[sel])
            vals_out.append(vals[sel])
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        vals = np.concatenate(vals_out) if vals_out else np.empty(0, np.int64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                self.field: pa.array(vals, pa.int64()),
            }
        )


class Percolator:
    """REVERSE SEARCH (Elasticsearch percolator): STORED queries, STREAMED
    documents — the alerting/routing primitive ("which saved searches does
    this new page match?"). No index is consulted: the document stream
    maps straight through a stateless batch fn whose stored queries are
    compiled once per worker, so percolation composes with ingest
    (read_parquet → Percolator → write/route) at full streaming
    backpressure — the exact shape a 100 TB firehose needs.

    Semantics: conjunctive — a doc matches a stored query iff EVERY
    distinct query term (OOV included, which therefore never matches)
    appears in the doc's token set. Fully vectorized per batch: one
    tokenize_flat pass, pc.index_in against the queries' union
    vocabulary, then a (docs × vocab) boolean incidence matrix and one
    all(axis) per query — no per-token Python."""

    def __init__(self, queries: tuple[tuple[int, str], ...]):
        import pyarrow.compute as _pc  # noqa: F401 (used in __call__)

        self.vocab: list[str] = sorted(
            {t for _, text in queries for t in set(tokenize(text))}
        )
        self._vocab_arr = pa.array(self.vocab, pa.string())
        vidx = {t: i for i, t in enumerate(self.vocab)}
        self.compiled: list[tuple[int, np.ndarray]] = [
            (qid, np.array(sorted(vidx[t] for t in set(tokenize(text))), dtype=np.int64))
            for qid, text in queries
            if tokenize(text)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..textnorm import tokenize_flat

        doc_ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        flat, fdocs, _ = tokenize_flat(batch["text"].combine_chunks(), doc_ids)
        idx = pc.index_in(flat, value_set=self._vocab_arr)
        idxn = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(idxn)
        qids_out: list[np.ndarray] = []
        docs_out: list[np.ndarray] = []
        if keep.any():
            cols = idxn[keep].astype(np.int64)
            docs_u, dinv = np.unique(fdocs[keep], return_inverse=True)
            m = np.zeros((len(docs_u), len(self.vocab)), dtype=bool)
            m[dinv, cols] = True
            for qid, tidx in self.compiled:
                hit = docs_u[m[:, tidx].all(axis=1)]
                if len(hit):
                    qids_out.append(np.full(len(hit), qid, dtype=np.int64))
                    docs_out.append(hit)
        qs = np.concatenate(qids_out) if qids_out else np.empty(0, np.int64)
        ds = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        return pa.table(
            {
                "query_id": pa.array(qs, pa.int64()),
                "doc_id": pa.array(ds, pa.uint64()),
            }
        )


_WORKER_PERCOLATOR_CACHE: dict[tuple, "Percolator"] = {}


class PercolateTaskFn:
    """Task-fn form of Percolator (worker-process cache keyed by the
    stored-query set — no index, no version)."""

    def __init__(self, queries: tuple[tuple[int, str], ...]):
        self.queries = tuple(queries)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pc_ = _WORKER_PERCOLATOR_CACHE.get(self.queries)
        if pc_ is None:
            pc_ = Percolator(self.queries)
            _WORKER_PERCOLATOR_CACHE[self.queries] = pc_
        return pc_(batch)


class TermStats:
    """TERM STATISTICS API (ES _termvectors term_statistics / Lucene
    TermStates): per requested term, the GLOBAL doc frequency (df, summed
    over the term's segment shards — the same fold every query runs) and
    the total term frequency (ttf / collection frequency, Σ tf over all
    postings). The strongest dictionary+postings audit short of a full
    export: df checks the dict fold, ttf checks every decoded tf.
    Tombstoned docs are excluded from both (visibility semantics shared
    with QueryScorer). OOV terms emit no row."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None):
        self.scorer = QueryScorer(out_dir, seg_ids, k=1, method="brute")

    def __call__(self, batch: pa.Table) -> pa.Table:
        sc = self.scorer
        terms_out: list[str] = []
        dfs: list[int] = []
        ttfs: list[int] = []
        for term in batch["term"].to_pylist():
            for t in sorted(set(tokenize(term))):
                segs = sc._owners(t)
                if not segs:
                    continue
                doc_ids, tfs = sc._gather_postings(t, segs)
                if len(doc_ids) == 0:
                    continue
                terms_out.append(t)
                dfs.append(len(doc_ids))
                ttfs.append(int(tfs.sum(dtype=np.int64)))
        return pa.table(
            {
                "term": pa.array(terms_out, pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "ttf": pa.array(ttfs, pa.int64()),
            }
        )


class Explainer:
    """EXPLAIN API (Lucene/ES `_explain`): for each query's top-k hits,
    the raw per-term statistics the BM25 score is computed from — tf
    (from the term's postings), GLOBAL df (summed over the term's shards)
    and the doc's length — one row per (hit, matched term). Integer-only
    by design: the floats (idf, contribution, score) are pure functions of
    these integers plus the corpus constants (n_docs, avgdl), so the
    explanation is complete while the oracle compare stays exact;
    tests pin that score_tf/idf over these rows reconstructs the hit's
    ranking score bit-exactly. Rows follow the frozen hit order, terms
    ascending within a hit; absent terms (tf 0) emit no row, like Lucene's
    per-field explanation tree."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None, k: int = 10):
        self.scorer = QueryScorer(out_dir, seg_ids, k=k, method="wand")

    def __call__(self, batch: pa.Table) -> pa.Table:
        sc = self.scorer
        qids_out: list[int] = []
        ranks_out: list[int] = []
        docs_out: list[np.ndarray] = []
        terms_out: list[str] = []
        tfs_out: list[int] = []
        dfs_out: list[int] = []
        dls_out: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            d, _ = sc._score_query(text)
            if len(d) == 0:
                continue
            per_hit: list[list[tuple[str, int, int]]] = [[] for _ in range(len(d))]
            for t in sorted(set(tokenize(text))):
                owners = sc._owners(t)
                if not owners:
                    continue
                doc_ids, tfs = sc._gather_postings(t, owners)
                idx = np.searchsorted(doc_ids, d)
                ok = idx < len(doc_ids)
                ok[ok] = doc_ids[idx[ok]] == d[ok]
                gdf = int(sc._global_df(t, owners))
                for i in np.flatnonzero(ok):
                    per_hit[i].append((t, int(tfs[idx[i]]), gdf))
            dls = sc.doclens.lookup(d)
            for i in range(len(d)):
                for t, tf, gdf in per_hit[i]:
                    qids_out.append(qid)
                    ranks_out.append(i + 1)
                    terms_out.append(t)
                    tfs_out.append(tf)
                    dfs_out.append(gdf)
                    dls_out.append(int(dls[i]))
                docs_out.append(np.full(len(per_hit[i]), d[i], dtype=np.uint64))
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                "term": pa.array(terms_out, pa.string()),
                "tf": pa.array(tfs_out, pa.int64()),
                "df": pa.array(dfs_out, pa.int64()),
                "dl": pa.array(dls_out, pa.int64()),
            }
        )


class CompletionSuggester:
    """COMPLETION SUGGESTER (ES `completion` / Lucene suggest): a typed
    prefix expands against the sharded term dictionary (sorted-list
    bisection per segment — the same range scan as mode="prefix") and the
    candidates rank by GLOBAL document frequency (popularity), tie term
    ASC, top ``size`` returned. df is summed across a term's segment
    shards before ranking (a per-shard top-size would mis-rank terms
    whose shards split their df — same global-statistics rule as
    scoring). Emits (query_id, rank, term, df); an unmatched or empty
    prefix emits no rows. At cluster scale a prefix range routes to O(1)
    term-shard holders; the candidate set is vocabulary-bounded, never
    corpus-bounded."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None, size: int = 5):
        if seg_ids is None:
            from ..pipelines.query import list_segments

            seg_ids = list_segments(out_dir)
        self.segments = [Segment(out_dir, sid) for sid in seg_ids]
        self.size = size

    def _suggest(self, prefix: str) -> list[tuple[str, int]]:
        import bisect

        toks = tokenize(prefix)
        if len(toks) != 1:
            return []
        p = toks[0]
        hi = p[:-1] + chr(ord(p[-1]) + 1)
        df: dict[str, int] = {}
        for seg in self.segments:
            i0 = bisect.bisect_left(seg.terms_sorted, p)
            i1 = bisect.bisect_left(seg.terms_sorted, hi)
            for t in seg.terms_sorted[i0:i1]:
                df[t] = df.get(t, 0) + int(seg.dict[t][0])
        ranked = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[: self.size]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, terms, dfs = [], [], [], []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            for r, (t, d) in enumerate(self._suggest(text), 1):
                qids.append(qid)
                ranks.append(r)
                terms.append(t)
                dfs.append(d)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "rank": pa.array(np.asarray(ranks, np.int32), pa.int32()),
                "term": pa.array(terms, pa.string()),
                "df": pa.array(dfs, pa.int64()),
            }
        )


class RankEval:
    """RANK-EVAL API (ES `_rank_eval`): per query, IR metrics of the
    frozen disjunctive BM25 top-k against a DETERMINISTIC qrel — a doc is
    RELEVANT iff it contains EVERY distinct query token (the conjunctive
    containment set, computable exactly on both the engine and the SQL
    side, so the gate needs no hand-labeled judgments). Integer-only
    outputs per query: n_rel (relevant docs in the corpus), n_rel_at_k
    (relevant among the top-k → precision@k numerator) and
    first_rel_rank (0 if none → reciprocal rank is 1/first_rel_rank).
    A fully-OOV query scores (0, 0, 0). One row per input query."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None, k: int = 10):
        self.scorer = QueryScorer(out_dir, seg_ids, k=k, method="wand")

    def __call__(self, batch: pa.Table) -> pa.Table:
        sc = self.scorer
        qids, n_rels, n_at_ks, firsts = [], [], [], []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            hits, _ = sc._score_query(text)
            toks = sorted(set(tokenize(text)))
            owners = {t: sc._owners(t) for t in toks}
            if toks and all(owners[t] for t in toks):
                entries = [sc._term_arrays(t, owners[t]) for t in toks]
                rel = sc._conj_candidates(toks, entries)
            else:
                rel = np.empty(0, np.uint64)
            n_rel = len(rel)
            n_at_k, first = 0, 0
            if n_rel and len(hits):
                idx = np.searchsorted(rel, hits)
                ok = idx < n_rel
                ok[ok] = rel[idx[ok]] == hits[ok]
                n_at_k = int(ok.sum())
                where = np.flatnonzero(ok)
                first = int(where[0]) + 1 if len(where) else 0
            qids.append(qid)
            n_rels.append(n_rel)
            n_at_ks.append(n_at_k)
            firsts.append(first)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "n_rel": pa.array(n_rels, pa.int64()),
                "n_rel_at_k": pa.array(n_at_ks, pa.int64()),
                "first_rel_rank": pa.array(firsts, pa.int64()),
            }
        )


_WORKER_RANKEVAL_CACHE: dict[tuple, "RankEval"] = {}


class RankEvalTaskFn:
    """Task-fn form of RankEval (worker-process cache, as ScorerTaskFn)."""

    def __init__(self, out_dir: str, seg_ids: list[int], k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, k, version = self.args
        key = (out_dir, version, seg_ids, k)
        re_ = _WORKER_RANKEVAL_CACHE.get(key)
        if re_ is None:
            for kk in [kk for kk in _WORKER_RANKEVAL_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_RANKEVAL_CACHE[kk]
            re_ = RankEval(out_dir, list(seg_ids), k)
            _WORKER_RANKEVAL_CACHE[key] = re_
        return re_(batch)


_WORKER_SUGGEST_CACHE: dict[tuple, "CompletionSuggester"] = {}


class CompletionTaskFn:
    """Task-fn form of CompletionSuggester (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], size: int, version: float):
        self.args = (out_dir, tuple(seg_ids), size, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, size, version = self.args
        key = (out_dir, version, seg_ids, size)
        cs = _WORKER_SUGGEST_CACHE.get(key)
        if cs is None:
            for kk in [kk for kk in _WORKER_SUGGEST_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_SUGGEST_CACHE[kk]
            cs = CompletionSuggester(out_dir, list(seg_ids), size)
            _WORKER_SUGGEST_CACHE[key] = cs
        return cs(batch)


_WORKER_EXPLAIN_CACHE: dict[tuple, "Explainer"] = {}


class ExplainTaskFn:
    """Task-fn form of Explainer (worker-process cache, as ScorerTaskFn)."""

    def __init__(self, out_dir: str, seg_ids: list[int], k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, k, version = self.args
        key = (out_dir, version, seg_ids, k)
        ex = _WORKER_EXPLAIN_CACHE.get(key)
        if ex is None:
            for kk in [kk for kk in _WORKER_EXPLAIN_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_EXPLAIN_CACHE[kk]
            ex = Explainer(out_dir, list(seg_ids), k)
            _WORKER_EXPLAIN_CACHE[key] = ex
        return ex(batch)


class MatchCounter:
    """TOTAL HITS per query (Lucene's totalHits): the size of the
    disjunctive match set — distinct visible docs containing ≥1 query
    term. The cheapest collection an engine runs (doc_ids only: no
    scores, no doclens, no docvalues); queries with an empty match set
    emit no row (the SQL-join semantics the oracle replays)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None):
        if seg_ids is None:
            from ..pipelines.query import list_segments

            seg_ids = list_segments(out_dir)
        self.segments = [Segment(out_dir, sid) for sid in seg_ids]
        self.exclude_ids = mf.read_tombstones(out_dir)

    _match_set = FacetCounter._match_set

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        counts_out: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            n = len(self._match_set(text))
            if n:
                qids_out.append(qid)
                counts_out.append(n)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "n_hits": pa.array(counts_out, pa.int64()),
            }
        )


class RareTerms(MatchCounter):
    """RARE-TERMS aggregation (ES `rare_terms`, dictionary-driven
    variant): per query, the vocabulary terms with GLOBAL df ≤
    max_doc_count that occur in ≥ 1 matching doc, each with the count of
    matching docs containing it. Deliberate, documented deviation from
    ES (which measures rarity WITHIN the agg context using a CuckooFilter
    and is approximate): rarity here is the corpus-global df folded from
    the shard dictionaries, which is exactly what makes the operator
    scale-safe AND exact — candidates come from the DICTIONARY (global
    df ≤ T bounds each candidate's postings at T entries, so the whole
    candidate state is vocabulary-shaped, never corpus-shaped) instead
    of enumerating matched docs' terms. Global df ≤ T implies context
    df ≤ T, so every emitted bucket satisfies the ES predicate; the
    variant can only miss terms globally common but rare in one match
    set — the boilerplate terms rare_terms exists to exclude anyway. At
    cluster scale the term-sharded dictionaries each contribute their
    own rare candidates and per-doc-range counts concat-merge."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 max_doc_count: int = 100):
        super().__init__(out_dir, seg_ids)
        self.max_doc_count = int(max_doc_count)
        gdf: dict[str, int] = {}
        for seg in self.segments:
            for t, entry in seg.dict.items():
                gdf[t] = gdf.get(t, 0) + entry[0]
        # rare candidates + their (tiny, df-bounded) postings, loaded once
        # per worker; shards are docID-disjoint so concat+sort is exact
        self.rare: list[tuple[str, np.ndarray]] = []
        for t in sorted(gdf):
            if gdf[t] <= self.max_doc_count:
                lists = []
                for seg in self.segments:
                    got = seg.term_postings(t)
                    if got is not None:
                        lists.append(got[0])
                self.rare.append((t, np.sort(np.concatenate(lists))))

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        terms_out: list[str] = []
        counts_out: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            for t, ids in self.rare:
                pos = np.searchsorted(docs, ids)
                ok = pos < len(docs)
                ok[ok] = docs[pos[ok]] == ids[ok]
                n = int(ok.sum())
                if n:
                    qids_out.append(qid)
                    terms_out.append(t)
                    counts_out.append(n)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "term": pa.array(terms_out, pa.string()),
                "n_docs": pa.array(counts_out, pa.int64()),
            }
        )


class AdjacencyMatrix(MatchCounter):
    """ADJACENCY-MATRIX aggregation (ES `adjacency_matrix`): for each
    input PAIR of filters (here: two disjunctive term queries), the sizes
    of both match sets and of their INTERSECTION — the co-occurrence
    matrix search engines render as a heat map. One input row = one cell
    (pair_id, text_a, text_b) → (pair_id, n_a, n_b, n_ab); cells are
    independent, so the matrix streams through stateless tasks with the
    per-worker match sets cached across cells sharing a filter (the
    diagonal is text_a == text_b ⇒ n_ab == n_a == n_b). Every pair emits
    a row, zeros included (the matrix shape is fixed by its request)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None):
        super().__init__(out_dir, seg_ids)
        self._set_cache: dict[str, np.ndarray] = {}

    def _cached_set(self, text: str) -> np.ndarray:
        got = self._set_cache.get(text)
        if got is None:
            got = self._match_set(text)
            if len(self._set_cache) > 256:
                self._set_cache.clear()
            self._set_cache[text] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids, nas, nbs, nabs = [], [], [], []
        for pid, ta, tb in zip(
            batch["pair_id"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            a = self._cached_set(ta)
            b = self._cached_set(tb)
            # both sets are sorted unique doc_ids: vectorized membership
            if len(a) and len(b):
                idx = np.searchsorted(a, b)
                ok = idx < len(a)
                ok[ok] = a[idx[ok]] == b[ok]
                n_ab = int(ok.sum())
            else:
                n_ab = 0
            pids.append(pid)
            nas.append(len(a))
            nbs.append(len(b))
            nabs.append(n_ab)
        return pa.table(
            {
                "pair_id": pa.array(pids, pa.int64()),
                "n_a": pa.array(nas, pa.int64()),
                "n_b": pa.array(nbs, pa.int64()),
                "n_ab": pa.array(nabs, pa.int64()),
            }
        )


_WORKER_ADJACENCY_CACHE: dict[tuple, "AdjacencyMatrix"] = {}


class AdjacencyTaskFn:
    """Task-fn form of AdjacencyMatrix (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], version: float):
        self.args = (out_dir, tuple(seg_ids), version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, version = self.args
        key = (out_dir, version, seg_ids)
        am = _WORKER_ADJACENCY_CACHE.get(key)
        if am is None:
            for kk in [kk for kk in _WORKER_ADJACENCY_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_ADJACENCY_CACHE[kk]
            am = AdjacencyMatrix(out_dir, list(seg_ids))
            _WORKER_ADJACENCY_CACHE[key] = am
        return am(batch)


class MatchExporter(MatchCounter):
    """SCROLL/EXPORT: the FULL match set per query as rows (query_id,
    doc_id) — the bulk-export API (Elasticsearch scroll / Lucene
    collect-all) that feeds downstream pipelines rather than a result
    page. Inherits MatchCounter's state (segments + tombstones); emits
    doc_ids ascending per query. The output is a STREAM of blocks — a
    query matching 10^9 docs produces many blocks flowing through
    map_batches → write_parquet with backpressure, never a driver list.

    ``mode="and"`` switches to the CONJUNCTIVE match set (docs containing
    every distinct query term; an OOV term empties the set) — per-term
    postings unions intersected smallest-first, the same semantics as
    retrieval mode="and". This is what _delete_by_query-style bulk
    operations filter with."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 mode: str = "or"):
        super().__init__(out_dir, seg_ids)
        if mode not in ("or", "and"):
            raise ValueError(f"export mode must be 'or' or 'and', not {mode!r}")
        self.mode = mode

    def _match_set_and(self, text: str) -> np.ndarray:
        per_term: list[np.ndarray] = []
        for t in set(tokenize(text)):
            lists = []
            for seg in self.segments:
                got = seg.term_postings(t)
                if got is not None:
                    lists.append(got[0])
            if not lists:
                return np.empty(0, np.uint64)  # OOV term ⇒ empty conjunction
            per_term.append(np.unique(np.concatenate(lists)))
        if not per_term:
            return np.empty(0, np.uint64)
        per_term.sort(key=len)  # smallest-first: the rare term pays
        docs = per_term[0]
        for ids in per_term[1:]:
            pos = np.searchsorted(ids, docs)
            ok = pos < len(ids)
            ok[ok] = ids[pos[ok]] == docs[ok]
            docs = docs[ok]
        if self.exclude_ids is not None:
            pos = np.searchsorted(self.exclude_ids, docs)
            ok = pos < len(self.exclude_ids)
            ok[ok] = self.exclude_ids[pos[ok]] == docs[ok]
            docs = docs[~ok]
        return docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[np.ndarray] = []
        docs_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text) if self.mode == "or" else self._match_set_and(text)
            if len(docs) == 0:
                continue
            qids_out.append(np.full(len(docs), qid, dtype=np.int64))
            docs_out.append(docs)
        qids = np.concatenate(qids_out) if qids_out else np.empty(0, np.int64)
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "doc_id": pa.array(docs, pa.uint64()),
            }
        )


class DateHistogram(DocvalueTopK):
    """DATE-HISTOGRAM aggregation over the match set (Elasticsearch's
    date_histogram agg): for each query, the count of distinct matching
    visible docs per fixed-width time bucket of a numeric docvalue
    (default: calendar day of warc_ts). Collection cost is the match
    set (doc_ids + one int64 gather) — no scores, no text; the bucket
    fold is one vectorized np.unique over vals // bucket_us. At cluster
    scale the docvalue array shards by doc range like doclens
    (SCALE.md §3) and per-range partial histograms concat-merge (bucket
    counts are additive across disjoint doc ranges)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "warc_ts", bucket_us: int = 86_400_000_000):
        super().__init__(out_dir, seg_ids, field, k=1)
        self.bucket_us = int(bucket_us)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[np.ndarray] = []
        buckets_out: list[np.ndarray] = []
        counts_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            vals = self.vals[np.searchsorted(self.doc_ids, docs)]
            buckets, counts = np.unique(vals // self.bucket_us, return_counts=True)
            qids_out.append(np.full(len(buckets), qid, dtype=np.int64))
            buckets_out.append(buckets)
            counts_out.append(counts.astype(np.int64))
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pa.table(
            {
                "query_id": pa.array(cat(qids_out), pa.int64()),
                "bucket": pa.array(cat(buckets_out), pa.int64()),
                "n_docs": pa.array(cat(counts_out), pa.int64()),
            }
        )


class HistogramPipeline(DocvalueTopK):
    """HISTOGRAM aggregation + PIPELINE aggregations over the match set
    (ES `histogram` with min_doc_count=0, plus the two canonical bucket
    pipeline aggs, `cumulative_sum` and `derivative`): for each query,
    the DENSE fixed-width bucket series of a numeric docvalue between the
    match set's min and max bucket — EMPTY buckets included, which is
    what distinguishes `histogram` from the date_histogram implemented
    above and is what makes the pipeline aggs well-defined over the
    series. Per bucket: n_docs (distinct matching visible docs),
    cum_docs (running total — ES cumulative_sum), delta_docs (difference
    from the previous bucket — ES derivative, with the series start
    frozen against an implicit 0 baseline so the output stays total and
    integer-only; ES emits no value for the first bucket, a gap policy
    an exact-hash oracle cannot replay with NULL-free columns).
    Collection cost is the match set + one int64 gather; the dense fold
    is a bincount over (bucket − b0). At cluster scale per-doc-range
    partial histograms are additive and concat-merge; the pipeline fold
    runs post-merge over the (bucket-count-sized) series, never over
    docs."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "doclen", interval: int = 4):
        super().__init__(out_dir, seg_ids, field, k=1)
        self.interval = int(interval)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[np.ndarray] = []
        buckets_out: list[np.ndarray] = []
        n_out: list[np.ndarray] = []
        cum_out: list[np.ndarray] = []
        delta_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            vals = self.vals[np.searchsorted(self.doc_ids, docs)]
            b = vals // self.interval
            b0, b1 = int(b.min()), int(b.max())
            n = np.bincount(b - b0, minlength=b1 - b0 + 1).astype(np.int64)
            qids_out.append(np.full(len(n), qid, dtype=np.int64))
            buckets_out.append(np.arange(b0, b1 + 1, dtype=np.int64))
            n_out.append(n)
            cum_out.append(np.cumsum(n))
            delta_out.append(np.diff(n, prepend=0))
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pa.table(
            {
                "query_id": pa.array(cat(qids_out), pa.int64()),
                "bucket": pa.array(cat(buckets_out), pa.int64()),
                "n_docs": pa.array(cat(n_out), pa.int64()),
                "cum_docs": pa.array(cat(cum_out), pa.int64()),
                "delta_docs": pa.array(cat(delta_out), pa.int64()),
            }
        )


class TopMetrics(DocvalueTopK):
    """TOP_METRICS aggregation (Elasticsearch's ``top_metrics``): per
    query, the value of a METRIC docvalue read off the top ``size`` docs
    of a SORT docvalue's ordering over the match set — "the doclen of
    the newest matching pages". Distinct from DocvalueTopK (which
    returns the sort field itself): the point of top_metrics is
    gathering OTHER fields at the top of a sort without a full fetch.
    Two int64 arrays over the docs sidecar (sort + metric; both shard by
    doc range at cluster scale); frozen order (sort DESC, doc_id ASC).
    The driver sort field (warc_ts) is an injective hash of the doc, so
    the ordering is tie-free by construction."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "warc_ts", metric: str = "doclen",
                 size: int = 3):
        super().__init__(out_dir, seg_ids, field, k=size)
        self.metric = metric
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(pq.read_table(f, columns=["doc_id", metric]) for f in files)
        self.metric_vals = tbl[metric].cast(pa.int64()).to_numpy(zero_copy_only=False)
        self.size = int(size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        ranks_out: list[int] = []
        sort_out: list[int] = []
        metric_out: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            pos = np.searchsorted(self.doc_ids, docs)
            svals = self.vals[pos]
            order = np.lexsort((docs, -svals))[: self.size]
            mvals = self.metric_vals[pos[order]]
            for r, (sv, mv) in enumerate(zip(svals[order], mvals), start=1):
                qids_out.append(qid)
                ranks_out.append(r)
                sort_out.append(int(sv))
                metric_out.append(int(mv))
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "sort_val": pa.array(sort_out, pa.int64()),
                "metric_val": pa.array(metric_out, pa.int64()),
            }
        )


class TopMetricsTaskFn:
    """Task-fn form of TopMetrics (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 metric: str, size: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, metric, size, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, metric, size, version = self.args
        key = (out_dir, version, seg_ids, field, metric, size, "topmetrics")
        tm = _WORKER_MATCH_AGG_CACHE.get(key)
        if tm is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            tm = TopMetrics(out_dir, list(seg_ids), field, metric, size)
            _WORKER_MATCH_AGG_CACHE[key] = tm
        return tm(batch)


class AutoDateHistogram(DocvalueTopK):
    """AUTO-INTERVAL date histogram (Elasticsearch's
    ``auto_date_histogram``): per query, the SMALLEST interval from a
    frozen ladder whose dense bucket count over the match set's
    [min, max] docvalue span stays within ``target_buckets`` (none
    qualifying ⇒ the ladder's coarsest — the ES rounding ladder
    behavior, made exact by freezing the ladder). The chosen interval is
    emitted on every row, and the series is DENSE (empty buckets
    included — auto_date_histogram is a date_histogram underneath).
    Adaptive choice is a pure function of (min, max), which are
    per-doc-range associative — the cluster merge picks the interval
    AFTER folding range partials' bounds, then partial histograms at
    that interval concat-merge like DateHistogram's."""

    LADDER = (1_000_000, 10_000_000, 60_000_000, 600_000_000, 3_600_000_000)

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "warc_ts", target_buckets: int = 20):
        super().__init__(out_dir, seg_ids, field, k=1)
        self.target = int(target_buckets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[np.ndarray] = []
        iv_out: list[np.ndarray] = []
        buckets_out: list[np.ndarray] = []
        n_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            vals = self.vals[np.searchsorted(self.doc_ids, docs)]
            lo, hi = int(vals.min()), int(vals.max())
            iv = self.LADDER[-1]
            for cand in self.LADDER:
                if hi // cand - lo // cand + 1 <= self.target:
                    iv = cand
                    break
            b = vals // iv
            b0, b1 = lo // iv, hi // iv
            n = np.bincount(b - b0, minlength=b1 - b0 + 1).astype(np.int64)
            qids_out.append(np.full(len(n), qid, dtype=np.int64))
            iv_out.append(np.full(len(n), iv, dtype=np.int64))
            buckets_out.append(np.arange(b0, b1 + 1, dtype=np.int64))
            n_out.append(n)
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pa.table(
            {
                "query_id": pa.array(cat(qids_out), pa.int64()),
                "interval_us": pa.array(cat(iv_out), pa.int64()),
                "bucket": pa.array(cat(buckets_out), pa.int64()),
                "n_docs": pa.array(cat(n_out), pa.int64()),
            }
        )


class AutoDateHistogramTaskFn:
    """Task-fn form of AutoDateHistogram (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 target_buckets: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, target_buckets, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, target, version = self.args
        key = (out_dir, version, seg_ids, field, target, "autodate")
        ah = _WORKER_MATCH_AGG_CACHE.get(key)
        if ah is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            ah = AutoDateHistogram(out_dir, list(seg_ids), field, target)
            _WORKER_MATCH_AGG_CACHE[key] = ah
        return ah(batch)


class MovingWindowAgg(DocvalueTopK):
    """MOVING-WINDOW pipeline aggregations over the dense histogram
    series (ES ``moving_fn`` + ``serial_diff``): per query, the
    HistogramPipeline dense bucket series (min_doc_count=0 — what makes
    the pipeline folds well-defined), each bucket carrying
    ``mov_sum`` — the trailing ``window``-bucket sum INCLUDING the
    current bucket (ES moving_fn with shift=window, fn=sum; short
    prefixes sum what exists, the ES partial-window behavior) — and
    ``sdiff`` — n[i] − n[i−lag] with a frozen 0 baseline for i < lag
    (same total-output variant as HistogramPipeline's derivative; ES
    emits nulls there, which a NULL-free exact-hash oracle can't carry).
    Both folds run post-merge over the bucket-count-sized series, never
    over docs — the cluster story is HistogramPipeline's unchanged."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "doclen", interval: int = 4,
                 window: int = 3, lag: int = 2):
        super().__init__(out_dir, seg_ids, field, k=1)
        self.interval = int(interval)
        self.window = int(window)
        self.lag = int(lag)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[np.ndarray] = []
        buckets_out: list[np.ndarray] = []
        n_out: list[np.ndarray] = []
        mov_out: list[np.ndarray] = []
        sdiff_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            vals = self.vals[np.searchsorted(self.doc_ids, docs)]
            b = vals // self.interval
            b0, b1 = int(b.min()), int(b.max())
            n = np.bincount(b - b0, minlength=b1 - b0 + 1).astype(np.int64)
            cum = np.cumsum(n)
            if len(n) > self.window:
                mov = cum - np.concatenate(
                    [np.zeros(self.window, np.int64), cum[: len(n) - self.window]]
                )
            else:
                # series no longer than the window: every trailing window is
                # partial and the running total IS the window sum (a negative
                # slice here would KEEP elements instead of dropping them all)
                mov = cum.copy()
            if len(n) > self.lag:
                lagged = np.concatenate(
                    [np.zeros(self.lag, np.int64), n[: len(n) - self.lag]]
                )
            else:
                lagged = np.zeros(len(n), np.int64)
            qids_out.append(np.full(len(n), qid, dtype=np.int64))
            buckets_out.append(np.arange(b0, b1 + 1, dtype=np.int64))
            n_out.append(n)
            mov_out.append(mov)
            sdiff_out.append(n - lagged)
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pa.table(
            {
                "query_id": pa.array(cat(qids_out), pa.int64()),
                "bucket": pa.array(cat(buckets_out), pa.int64()),
                "n_docs": pa.array(cat(n_out), pa.int64()),
                "mov_sum": pa.array(cat(mov_out), pa.int64()),
                "sdiff": pa.array(cat(sdiff_out), pa.int64()),
            }
        )


class MovingWindowAggTaskFn:
    """Task-fn form of MovingWindowAgg (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 interval: int, window: int, lag: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, interval, window, lag, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, interval, window, lag, version = self.args
        key = (out_dir, version, seg_ids, field, interval, window, lag, "movwin")
        mw = _WORKER_MATCH_AGG_CACHE.get(key)
        if mw is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            mw = MovingWindowAgg(out_dir, list(seg_ids), field, interval, window, lag)
            _WORKER_MATCH_AGG_CACHE[key] = mw
        return mw(batch)


class BucketSortAgg(DocvalueTopK):
    """BUCKET_SELECTOR + BUCKET_SORT pipeline aggregations (ES): per
    query, the histogram buckets SURVIVING an integer predicate
    (n_docs >= min_count — bucket_selector; false drops the bucket from
    the response) re-ordered by (n_docs DESC, bucket ASC) and truncated
    to the top ``size`` (bucket_sort with sort + size) — "the busiest
    docvalue buckets per query". Emits (query_id, rank, bucket, n_docs);
    a query whose every bucket fails the selector emits nothing. Both
    pipeline stages fold over the bucket series post-merge (series-sized
    state), exactly like the other pipeline aggs."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "doclen", interval: int = 4,
                 min_count: int = 1, size: int = 5):
        super().__init__(out_dir, seg_ids, field, k=1)
        self.interval = int(interval)
        self.min_count = int(min_count)
        self.size = int(size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[np.ndarray] = []
        ranks_out: list[np.ndarray] = []
        buckets_out: list[np.ndarray] = []
        n_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            vals = self.vals[np.searchsorted(self.doc_ids, docs)]
            buckets, counts = np.unique(vals // self.interval, return_counts=True)
            counts = counts.astype(np.int64)
            keep = counts >= self.min_count
            buckets, counts = buckets[keep], counts[keep]
            if not len(buckets):
                continue
            order = np.lexsort((buckets, -counts))[: self.size]
            qids_out.append(np.full(len(order), qid, dtype=np.int64))
            ranks_out.append(np.arange(1, len(order) + 1, dtype=np.int64))
            buckets_out.append(buckets[order])
            n_out.append(counts[order])
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pa.table(
            {
                "query_id": pa.array(cat(qids_out), pa.int64()),
                "rank": pa.array(cat(ranks_out), pa.int64()),
                "bucket": pa.array(cat(buckets_out), pa.int64()),
                "n_docs": pa.array(cat(n_out), pa.int64()),
            }
        )


class BucketSortAggTaskFn:
    """Task-fn form of BucketSortAgg (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 interval: int, min_count: int, size: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, interval, min_count, size, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, interval, min_count, size, version = self.args
        key = (out_dir, version, seg_ids, field, interval, min_count, size, "bsort")
        bs = _WORKER_MATCH_AGG_CACHE.get(key)
        if bs is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            bs = BucketSortAgg(out_dir, list(seg_ids), field, interval, min_count, size)
            _WORKER_MATCH_AGG_CACHE[key] = bs
        return bs(batch)


class RangeAgg(DocvalueTopK):
    """RANGE aggregation over the match set (Elasticsearch's ``range``
    agg): per query and configured half-open [from, to) range of a
    numeric docvalue — doc_count plus an exact int64 ``sum``
    sub-aggregation. EVERY configured range is emitted, count-0 ranges
    and empty match sets included (the ES contract: a query with zero
    hits still returns the full bucket skeleton — this is what
    distinguishes range from the join-semantics aggs above). Ranges are
    arbitrary: they may overlap and need not cover, so a doc can land in
    zero or several buckets — which is why range is NOT a histogram
    special case. Bounds are (lo, hi) with None for an open end.
    Collection cost is the match set + one gather; each range is one
    vectorized mask. Per-doc-range partials are additive (count and sum
    both), so the cluster-scale shard story is DateHistogram's."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "doclen",
                 ranges: tuple[tuple[int | None, int | None], ...] = ((None, 128), (128, None))):
        super().__init__(out_dir, seg_ids, field, k=1)
        self.ranges = tuple((lo, hi) for lo, hi in ranges)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        ridx_out: list[int] = []
        n_out: list[int] = []
        sum_out: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            vals = self.vals[np.searchsorted(self.doc_ids, docs)] if len(docs) else np.empty(0, np.int64)
            for ridx, (lo, hi) in enumerate(self.ranges):
                mask = np.ones(len(vals), dtype=bool)
                if lo is not None:
                    mask &= vals >= lo
                if hi is not None:
                    mask &= vals < hi
                sel = vals[mask]
                qids_out.append(qid)
                ridx_out.append(ridx)
                n_out.append(int(mask.sum()))
                sum_out.append(int(sel.sum(dtype=np.int64)))
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "range_idx": pa.array(ridx_out, pa.int64()),
                "n_docs": pa.array(n_out, pa.int64()),
                "sum_val": pa.array(sum_out, pa.int64()),
            }
        )


class RangeAggTaskFn:
    """Task-fn form of RangeAgg (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 ranges: tuple[tuple[int | None, int | None], ...], version: float):
        self.args = (out_dir, tuple(seg_ids), field, tuple(ranges), version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, ranges, version = self.args
        key = (out_dir, version, seg_ids, field, ranges, "range")
        ra = _WORKER_MATCH_AGG_CACHE.get(key)
        if ra is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            ra = RangeAgg(out_dir, list(seg_ids), field, ranges)
            _WORKER_MATCH_AGG_CACHE[key] = ra
        return ra(batch)


class MatchsetPercentiles(DocvalueTopK):
    """PERCENTILES aggregation over the match set (ES percentiles agg,
    exact): per query and requested quantile q, the lower (type-1)
    order statistic of the docvalue — the element at sorted index
    floor(q·(n−1)). Integer outputs, so the oracle replay is exact
    (row_number over value ASC picks the same element). ES uses
    t-digest at scale; the exact form here is the oracle-able
    contract, and the engine's distributed histogram median
    (functions/windows.py) is the 10^12-doc path."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "warc_ts",
                 quantiles: tuple[float, ...] = (0.25, 0.5, 0.75)):
        super().__init__(out_dir, seg_ids, field, k=1)
        self.quantiles = tuple(quantiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        pcts: list[int] = []
        vals_out: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            n = len(docs)
            if n == 0:
                continue
            vals = np.sort(self.vals[np.searchsorted(self.doc_ids, docs)])
            for q in self.quantiles:
                idx = int(np.floor(q * (n - 1)))
                qids_out.append(qid)
                pcts.append(int(round(q * 100)))
                vals_out.append(int(vals[idx]))
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "pct": pa.array(pcts, pa.int64()),
                "value": pa.array(vals_out, pa.int64()),
            }
        )


class MatchsetBoxplot(DocvalueTopK):
    """BOXPLOT aggregation over the match set (ES ``boxplot`` agg, exact
    integer form): per query, the five-number summary of the docvalue —
    min, Q1/Q2/Q3 as lower (type-1) order statistics at floor(q·(n−1)),
    max — plus Tukey-fence outlier counts. ES computes the quartiles via
    t-digest and the fences client-side; here both are exact and integer:
    a value v is a low outlier iff 2·v < 2·Q1 − 3·IQR and a high outlier
    iff 2·v > 2·Q3 + 3·IQR (the 1.5·IQR fences doubled so the comparison
    stays in int64 — doclen ≤ 2^40 can't overflow). Same docvalue sidecar
    and per-doc-range sharding posture as MatchsetPercentiles: order
    statistics and threshold counts both merge across disjoint doc ranges
    (counts are additive; the quartiles need the distributed histogram
    median path of functions/windows.py at 10^12 docs)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "doclen"):
        super().__init__(out_dir, seg_ids, field, k=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list[int]] = {c: [] for c in (
            "query_id", "n_docs", "vmin", "q1", "q2", "q3", "vmax",
            "n_low_out", "n_high_out")}
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            n = len(docs)
            if n == 0:
                continue
            vals = np.sort(self.vals[np.searchsorted(self.doc_ids, docs)])
            q1, q2, q3 = (int(vals[int(np.floor(q * (n - 1)))]) for q in (0.25, 0.5, 0.75))
            iqr = q3 - q1
            v2 = vals.astype(np.int64) * 2
            out["query_id"].append(qid)
            out["n_docs"].append(n)
            out["vmin"].append(int(vals[0]))
            out["q1"].append(q1)
            out["q2"].append(q2)
            out["q3"].append(q3)
            out["vmax"].append(int(vals[-1]))
            out["n_low_out"].append(int(np.count_nonzero(v2 < 2 * q1 - 3 * iqr)))
            out["n_high_out"].append(int(np.count_nonzero(v2 > 2 * q3 + 3 * iqr)))
        return pa.table({c: pa.array(v, pa.int64()) for c, v in out.items()})


class PercentileRanks(DocvalueTopK):
    """PERCENTILE-RANKS aggregation over the match set (ES
    `percentile_ranks` — the inverse of percentiles): for each query and
    each requested probe VALUE, how much of the match set's docvalue
    distribution lies at or below it. Integer contract (the explain-API
    philosophy): the output is (n_le, n_docs) — one searchsorted per
    probe over the sorted gathered values — and the ES percentage is the
    client-side float n_le/n_docs·100. Exact at any scale: per-doc-range
    partial (n_le, n) pairs are additive across disjoint shards, unlike
    ES's t-digest approximation."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field: str = "doclen",
                 probes: tuple[int, ...] = (20, 40, 60)):
        super().__init__(out_dir, seg_ids, field, k=1)
        self.probes = tuple(int(p) for p in probes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        probes_out: list[int] = []
        nle_out: list[int] = []
        n_out: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            n = len(docs)
            if n == 0:
                continue
            vals = np.sort(self.vals[np.searchsorted(self.doc_ids, docs)])
            for p in self.probes:
                qids_out.append(qid)
                probes_out.append(p)
                nle_out.append(int(np.searchsorted(vals, p, side="right")))
                n_out.append(n)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "probe": pa.array(probes_out, pa.int64()),
                "n_le": pa.array(nle_out, pa.int64()),
                "n_docs": pa.array(n_out, pa.int64()),
            }
        )


class MatchsetStats(DocvalueTopK):
    """STATS aggregation over the match set (Elasticsearch's stats agg):
    per query, (n_docs, min, max, sum) of a numeric docvalue over the
    distinct matching visible docs. The sum is exact at any scale: the
    int64 values split into 32-bit halves summed separately and
    recombined as a Python int (no silent int64 wrap at 10^9-doc match
    sets), then emitted alongside the count so avg is derivable. Empty
    match sets emit no row (SQL-join semantics)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        ns: list[int] = []
        mins: list[int] = []
        maxs: list[int] = []
        sums: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            vals = self.vals[np.searchsorted(self.doc_ids, docs)]
            hi, lo = np.divmod(vals, np.int64(1) << 32)
            qids_out.append(qid)
            ns.append(len(vals))
            mins.append(int(vals.min()))
            maxs.append(int(vals.max()))
            sums.append((int(hi.sum(dtype=np.int64)) << 32) + int(lo.sum(dtype=np.int64)))
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "n_docs": pa.array(ns, pa.int64()),
                "min_ts": pa.array(mins, pa.int64()),
                "max_ts": pa.array(maxs, pa.int64()),
                "sum_ts": pa.array(sums, pa.int64()),
            }
        )


def _lm(x: int) -> int:
    """round(ln(x)·1000) milli-nats — same-libm-exact across engines on
    identical integer inputs (the unigram_nll contract)."""
    import math

    return int(round(math.log(x) * 1000.0))


class MatchsetStringStats(FacetCounter):
    """STRING_STATS aggregation over the match set (ES string_stats on a
    keyword/text docvalue): per query, the matched docs' value-length
    stats plus the SHANNON ENTROPY of the character distribution of all
    matched values. Integer contract (the explain-API philosophy): the
    entropy ships as h_milli_t = T·l(T) − Σ_c cnt_c·l(cnt_c) with
    l(x) = round(ln(x)·1000) — total entropy in milli-nats × T, exact
    and order-independent, so the DuckDB replay hash-matches; the ES
    float is h_milli_t / (1000·T) client-side. Counting is per Unicode
    CODEPOINT (utf-32 view + np.unique — matches DuckDB's
    string_split(text,'') and length()); the per-query gather visits
    matched values like every matchset agg — at 10^12 docs this field's
    char counts become a precomputed derived docvalue summed per doc
    range instead (SCALE.md §3), which the additive integer form
    already permits."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        ns: list[int] = []
        mins: list[int] = []
        maxs: list[int] = []
        sums: list[int] = []
        hs: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            codes = self.codes[np.searchsorted(self.doc_ids, docs)]
            vals = [self.values[int(c)] for c in codes]
            joined = "".join(vals)
            arr = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
            _, cnt = np.unique(arr, return_counts=True)
            t = int(arr.size)
            h = t * _lm(t) - sum(int(c) * _lm(int(c)) for c in cnt)
            lens = np.fromiter((len(v) for v in vals), np.int64, len(vals))
            qids_out.append(qid)
            ns.append(len(vals))
            mins.append(int(lens.min()))
            maxs.append(int(lens.max()))
            sums.append(t)
            hs.append(h)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "n_values": pa.array(ns, pa.int64()),
                "min_len": pa.array(mins, pa.int64()),
                "max_len": pa.array(maxs, pa.int64()),
                "sum_len": pa.array(sums, pa.int64()),
                "h_milli_t": pa.array(hs, pa.int64()),
            }
        )


class MatchsetMAD(DocvalueTopK):
    """MEDIAN-ABSOLUTE-DEVIATION aggregation over the match set (ES
    median_absolute_deviation agg): per query, the type-1 lower median of
    the docvalue and the type-1 lower median of |value − median| — the
    robust dispersion measure the ES agg approximates with t-digest; here
    both order statistics are EXACT integers (element at sorted index
    floor(0.5·(n−1))), so a row_number SQL replay hash-matches. At 10^12
    docs the same answer comes from two passes over the per-doc-range
    doclen HISTOGRAM (values are small ints — the distributed
    exact-median plan of functions/windows.py), never a gather."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        ns: list[int] = []
        meds: list[int] = []
        mads: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            n = len(docs)
            if n == 0:
                continue
            vals = np.sort(self.vals[np.searchsorted(self.doc_ids, docs)])
            med = int(vals[(n - 1) // 2])
            dev = np.sort(np.abs(vals - med))
            qids_out.append(qid)
            ns.append(n)
            meds.append(med)
            mads.append(int(dev[(n - 1) // 2]))
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "n_docs": pa.array(ns, pa.int64()),
                "median": pa.array(meds, pa.int64()),
                "mad": pa.array(mads, pa.int64()),
            }
        )


class MultiTerms(FacetCounter):
    """MULTI-TERMS aggregation over the match set (ES multi_terms): terms
    agg keyed by the COMPOSITE (lang, doclen-bucket) tuple — distinct
    matching visible docs counted per (facet value, value//bucket_width)
    pair, top-k buckets per query by the frozen (count DESC, lang ASC,
    bucket ASC) order. One np.unique over the fused int key (code·2^32 +
    bucket) per query; at cluster scale the pairs are per-doc-range
    partial counts merged by key — additive, like every counting agg
    here."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 facet: str = "lang", field: str = "doclen",
                 bucket_width: int = 64, k: int = 5):
        super().__init__(out_dir, seg_ids, facet)
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(pq.read_table(f, columns=["doc_id", field]) for f in files)
        self.field_vals = tbl[field].cast(pa.int64()).to_numpy(zero_copy_only=False)
        self.bucket_width = int(bucket_width)
        self.k = int(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        langs_out: list[str] = []
        buckets_out: list[int] = []
        counts_out: list[int] = []
        # lang codes sorted by VALUE so the fused key's code component
        # orders ties exactly like the oracle's ORDER BY lang ASC
        order = np.argsort(np.asarray(self.values, dtype=object), kind="stable")
        rank_of_code = np.empty(len(order), np.int64)
        rank_of_code[order] = np.arange(len(order))
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            idx = np.searchsorted(self.doc_ids, docs)
            fused = rank_of_code[self.codes[idx]] * (np.int64(1) << 32) + (
                self.field_vals[idx] // self.bucket_width
            )
            keys, cnt = np.unique(fused, return_counts=True)
            # top-k by (count DESC, fused key ASC): argsort on (-cnt) is
            # stable over the key-ascending unique output
            sel = np.argsort(-cnt, kind="stable")[: self.k]
            for s in sel:
                code_rank, bucket = divmod(int(keys[s]), 1 << 32)
                qids_out.append(qid)
                langs_out.append(self.values[int(order[code_rank])])
                buckets_out.append(bucket)
                counts_out.append(int(cnt[s]))
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                self.facet: pa.array(langs_out, pa.string()),
                "len_bucket": pa.array(buckets_out, pa.int64()),
                "n_docs": pa.array(counts_out, pa.int64()),
            }
        )


class TermsEnum:
    """TERMS-ENUM API (ES _terms_enum): for each prefix, the first
    ``size`` index DICTIONARY terms with that prefix in lexicographic
    order. Pure dictionary range scan — two bisects per segment on the
    sorted term list, no postings touched — then a cross-segment merge
    dedup (the term-sharded layout stores each term's shards under the
    same key, and salts duplicate dictionary entries, so the union is
    deduped before ranking). Cost is bounded by the VOCABULARY under the
    prefix, not the corpus; at cluster scale each index worker answers
    from its local segment dicts and the driver merges size-bounded
    sorted lists. Like ES, tombstones are ignored (a deleted doc's terms
    stay enumerable until segment merge rewrites the dictionary)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None, size: int = 10):
        if seg_ids is None:
            from ..pipelines.query import list_segments

            seg_ids = list_segments(out_dir)
        self.segments = [Segment(out_dir, sid) for sid in seg_ids]
        self.size = int(size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import bisect

        qids_out: list[int] = []
        ranks_out: list[int] = []
        terms_out: list[str] = []
        for qid, prefix in zip(
            batch["prefix_id"].to_pylist(), batch["prefix"].to_pylist()
        ):
            found: set[str] = set()
            hi_key = prefix + "￿"
            for seg in self.segments:
                ts = seg.terms_sorted
                lo = bisect.bisect_left(ts, prefix)
                hi = bisect.bisect_right(ts, hi_key, lo=lo)
                found.update(ts[lo:hi])
            for rank, term in enumerate(sorted(found)[: self.size], 1):
                qids_out.append(qid)
                ranks_out.append(rank)
                terms_out.append(term)
        return pa.table(
            {
                "prefix_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "term": pa.array(terms_out, pa.string()),
            }
        )


class MatrixStats:
    """MATRIX-STATS aggregation over the match set (ES matrix_stats): the
    joint second-moment statistics of TWO numeric docvalues — here doclen
    and the crawl ts — from which mean/variance/covariance/correlation are
    pure derivations. The engine emits the exact INTEGER sufficient
    statistics (n, Σa, Σb, Σa², Σb², Σab) so the oracle compare is
    hash-exact and the floats are client-side arithmetic (same contract
    as the explain API). The ts is shifted/scaled ((b − b_off) // b_div)
    so squares stay well inside int64; at 10^12-doc match sets the
    per-doc-range partial sums accumulate as arbitrary-precision Python
    ints before the merge (they are additive across disjoint ranges —
    SCALE.md §3), exactly like MatchsetStats' split-sum. Empty match sets
    emit no row (SQL-join semantics)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 field_a: str = "doclen", field_b: str = "warc_ts",
                 b_off: int = 0, b_div: int = 1):
        if seg_ids is None:
            from ..pipelines.query import list_segments

            seg_ids = list_segments(out_dir)
        self.segments = [Segment(out_dir, sid) for sid in seg_ids]
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(
            pq.read_table(f, columns=["doc_id", field_a, field_b]) for f in files
        )
        self.doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        self.a = tbl[field_a].cast(pa.int64()).to_numpy(zero_copy_only=False)
        self.b = (
            tbl[field_b].cast(pa.int64()).to_numpy(zero_copy_only=False) - int(b_off)
        ) // int(b_div)
        self.exclude_ids = mf.read_tombstones(out_dir)

    _match_set = FacetCounter._match_set

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("query_id", "n_docs", "sum_a", "sum_b",
                               "sum_a2", "sum_b2", "sum_ab")}
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            idx = np.searchsorted(self.doc_ids, docs)
            # object dtype → arbitrary-precision Python ints: the squares
            # of an unscaled docvalue overflow int64 PER ELEMENT, and the
            # emitted sums must be exact (that is the whole contract)
            a = self.a[idx].astype(object)
            b = self.b[idx].astype(object)
            out["query_id"].append(qid)
            out["n_docs"].append(len(a))
            out["sum_a"].append(int(a.sum()))
            out["sum_b"].append(int(b.sum()))
            out["sum_a2"].append(int((a * a).sum()))
            out["sum_b2"].append(int((b * b).sum()))
            out["sum_ab"].append(int((a * b).sum()))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


class MatrixStatsTaskFn:
    """Task-fn form of MatrixStats (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field_a: str,
                 field_b: str, b_off: int, b_div: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field_a, field_b, b_off, b_div, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field_a, field_b, b_off, b_div, version = self.args
        key = (out_dir, version, seg_ids, field_a, field_b, b_off, b_div, "matrix")
        ms = _WORKER_MATCH_AGG_CACHE.get(key)
        if ms is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            ms = MatrixStats(out_dir, list(seg_ids), field_a, field_b, b_off, b_div)
            _WORKER_MATCH_AGG_CACHE[key] = ms
        return ms(batch)


_WORKER_FACET_CACHE: dict[tuple, "FacetCounter"] = {}
_WORKER_FACET_TOPK_CACHE: dict[tuple, "FacetTopK"] = {}
_WORKER_DOCVALUE_TOPK_CACHE: dict[tuple, "DocvalueTopK"] = {}
_WORKER_MATCH_COUNT_CACHE: dict[tuple, "MatchCounter"] = {}
_WORKER_MATCH_EXPORT_CACHE: dict[tuple, "MatchExporter"] = {}
_WORKER_MATCH_AGG_CACHE: dict[tuple, object] = {}
_WORKER_FSCORE_CACHE: dict[tuple, "FunctionScoreTopK"] = {}
_WORKER_SYNONYM_CACHE: dict[tuple, "SynonymTopK"] = {}


class MatchExportTaskFn:
    """Task-fn form of MatchExporter (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], version: float,
                 mode: str = "or"):
        self.args = (out_dir, tuple(seg_ids), version, mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, version, mode = self.args
        key = (out_dir, version, seg_ids, mode)
        me = _WORKER_MATCH_EXPORT_CACHE.get(key)
        if me is None:
            for kk in [kk for kk in _WORKER_MATCH_EXPORT_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_EXPORT_CACHE[kk]
            me = MatchExporter(out_dir, list(seg_ids), mode)
            _WORKER_MATCH_EXPORT_CACHE[key] = me
        return me(batch)


class MatchCountTaskFn:
    """Task-fn form of MatchCounter (worker-process cache, as ScorerTaskFn)."""

    def __init__(self, out_dir: str, seg_ids: list[int], version: float):
        self.args = (out_dir, tuple(seg_ids), version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, version = self.args
        key = (out_dir, version, seg_ids)
        mc = _WORKER_MATCH_COUNT_CACHE.get(key)
        if mc is None:
            for kk in [kk for kk in _WORKER_MATCH_COUNT_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_COUNT_CACHE[kk]
            mc = MatchCounter(out_dir, list(seg_ids))
            _WORKER_MATCH_COUNT_CACHE[key] = mc
        return mc(batch)


class RareTermsTaskFn:
    """Task-fn form of RareTerms (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], max_doc_count: int,
                 version: float):
        self.args = (out_dir, tuple(seg_ids), max_doc_count, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, max_doc_count, version = self.args
        key = (out_dir, version, seg_ids, max_doc_count, "rare")
        rt = _WORKER_MATCH_AGG_CACHE.get(key)
        if rt is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            rt = RareTerms(out_dir, list(seg_ids), max_doc_count)
            _WORKER_MATCH_AGG_CACHE[key] = rt
        return rt(batch)


class FunctionScoreTaskFn:
    """Task-fn form of FunctionScoreTopK (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 origin_us: int, scale_us: int, k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, origin_us, scale_us, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, origin_us, scale_us, k, version = self.args
        key = (out_dir, version, seg_ids, field, origin_us, scale_us, k)
        fs = _WORKER_FSCORE_CACHE.get(key)
        if fs is None:
            for kk in [kk for kk in _WORKER_FSCORE_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_FSCORE_CACHE[kk]
            fs = FunctionScoreTopK(out_dir, list(seg_ids), field, origin_us, scale_us, k)
            _WORKER_FSCORE_CACHE[key] = fs
        return fs(batch)


class FieldValueFactorTaskFn:
    """Task-fn form of FieldValueFactorTopK (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, k, version = self.args
        key = (out_dir, version, seg_ids, field, "fvf", k)
        fv = _WORKER_FSCORE_CACHE.get(key)
        if fv is None:
            for kk in [kk for kk in _WORKER_FSCORE_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_FSCORE_CACHE[kk]
            fv = FieldValueFactorTopK(out_dir, list(seg_ids), field, k)
            _WORKER_FSCORE_CACHE[key] = fv
        return fv(batch)


class RankFeatureTaskFn:
    """Task-fn form of RankFeatureTopK (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 pivot: int, weight: float, k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, pivot, weight, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, pivot, weight, k, version = self.args
        key = (out_dir, version, seg_ids, field, "rankfeat", pivot, weight, k)
        rf = _WORKER_FSCORE_CACHE.get(key)
        if rf is None:
            for kk in [kk for kk in _WORKER_FSCORE_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_FSCORE_CACHE[kk]
            rf = RankFeatureTopK(out_dir, list(seg_ids), field, pivot, weight, k)
            _WORKER_FSCORE_CACHE[key] = rf
        return rf(batch)


class DistanceFeatureTaskFn:
    """Task-fn form of DistanceFeatureTopK (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 origin_us: int, pivot_us: int, weight: float, k: int,
                 version: float):
        self.args = (out_dir, tuple(seg_ids), field, origin_us, pivot_us,
                     weight, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, origin_us, pivot_us, weight, k, version = self.args
        key = (out_dir, version, seg_ids, field, "distfeat", origin_us,
               pivot_us, weight, k)
        df_ = _WORKER_FSCORE_CACHE.get(key)
        if df_ is None:
            for kk in [kk for kk in _WORKER_FSCORE_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_FSCORE_CACHE[kk]
            df_ = DistanceFeatureTopK(out_dir, list(seg_ids), field,
                                      origin_us, pivot_us, weight, k)
            _WORKER_FSCORE_CACHE[key] = df_
        return df_(batch)


class CombinedFieldsTaskFn:
    """Task-fn form of CombinedFieldsTopK (worker-process cache, keyed by
    both field indexes' versions)."""

    def __init__(self, body_dir: str, title_dir: str, w_title: int,
                 k: int, version: float):
        self.args = (body_dir, title_dir, w_title, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        body_dir, title_dir, w_title, k, version = self.args
        key = (body_dir, version, title_dir, "combf", w_title, k)
        cf = _WORKER_FSCORE_CACHE.get(key)
        if cf is None:
            for kk in [kk for kk in _WORKER_FSCORE_CACHE if kk[0] == body_dir and kk[1] < version]:
                del _WORKER_FSCORE_CACHE[kk]
            cf = CombinedFieldsTopK(body_dir, title_dir, w_title, k)
            _WORKER_FSCORE_CACHE[key] = cf
        return cf(batch)


class SynonymTopKTaskFn:
    """Task-fn form of SynonymTopK (worker-process cache). ``synonyms``
    is the canonical hashable form: sorted tuple of (base, (syn, ...))."""

    def __init__(self, out_dir: str, seg_ids: list[int],
                 synonyms: tuple[tuple[str, tuple[str, ...]], ...],
                 k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), synonyms, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, synonyms, k, version = self.args
        key = (out_dir, version, seg_ids, synonyms, k)
        st = _WORKER_SYNONYM_CACHE.get(key)
        if st is None:
            for kk in [kk for kk in _WORKER_SYNONYM_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_SYNONYM_CACHE[kk]
            st = SynonymTopK(out_dir, list(seg_ids), synonyms, k)
            _WORKER_SYNONYM_CACHE[key] = st
        return st(batch)


class DateHistogramTaskFn:
    """Task-fn form of DateHistogram (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 bucket_us: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, bucket_us, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, bucket_us, version = self.args
        key = (out_dir, version, seg_ids, field, bucket_us, "hist")
        dh = _WORKER_MATCH_AGG_CACHE.get(key)
        if dh is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            dh = DateHistogram(out_dir, list(seg_ids), field, bucket_us)
            _WORKER_MATCH_AGG_CACHE[key] = dh
        return dh(batch)


class HistogramPipelineTaskFn:
    """Task-fn form of HistogramPipeline (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 interval: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, interval, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, interval, version = self.args
        key = (out_dir, version, seg_ids, field, interval, "histpipe")
        hp = _WORKER_MATCH_AGG_CACHE.get(key)
        if hp is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            hp = HistogramPipeline(out_dir, list(seg_ids), field, interval)
            _WORKER_MATCH_AGG_CACHE[key] = hp
        return hp(batch)


class CompositeAgg(FacetCounter):
    """COMPOSITE aggregation (ES `composite`): the full bucket space of
    two sources — (facet term ASC, fixed-width docvalue bucket ASC) —
    retrieved ONE PAGE AT A TIME via an `after` cursor, the way engines
    stream an unbounded bucket set to a client without a giant response.
    One input row = one page request (query_id, text, after_lang,
    after_bucket) → ≤ size rows (query_id, lang, bucket, n_docs) in
    composite key order, strictly AFTER the cursor; ("", -1) is the
    open cursor (first page). Each page recomputes the match set and
    fold (exactly ES semantics — composite re-runs the agg per page and
    skips to `after`); the per-worker state (segments + facet codes +
    docvalue) is shared with the other match-set aggregations, and at
    cluster scale both sidecar arrays shard by doc range (SCALE.md §3)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 facet: str = "lang", field: str = "warc_ts",
                 bucket_us: int = 250_000_000, size: int = 12):
        super().__init__(out_dir, seg_ids, facet)
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(pq.read_table(f, columns=[field]) for f in files)
        self.vals = tbl[field].cast(pa.int64()).to_numpy(zero_copy_only=False)
        self.bucket_us = int(bucket_us)
        self.size = int(size)
        # composite order is by facet VALUE, not dictionary code: rank
        # permutation built once (codes → sort-rank, rank → value)
        order = sorted(range(len(self.values)), key=lambda i: self.values[i])
        self.code_rank = np.empty(len(self.values), np.int64)
        for r, c in enumerate(order):
            self.code_rank[c] = r
        self.value_by_rank = [self.values[c] for c in order]
        self.rank_of_value = {v: r for r, v in enumerate(self.value_by_rank)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        B = 1 << 40  # bucket ids fit far below 2^40; rank*B+bucket is injective
        qids_out: list[np.ndarray] = []
        langs_out: list[str] = []
        buckets_out: list[np.ndarray] = []
        counts_out: list[np.ndarray] = []
        for qid, text, alang, abkt in zip(
            batch["query_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["after_lang"].to_pylist(),
            batch["after_bucket"].to_pylist(),
        ):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            idx = np.searchsorted(self.doc_ids, docs)
            key = self.code_rank[self.codes[idx]] * B + self.vals[idx] // self.bucket_us
            ukey, counts = np.unique(key, return_counts=True)
            akey = self.rank_of_value.get(alang, -1) * B + int(abkt)
            start = int(np.searchsorted(ukey, akey, side="right"))
            sel = slice(start, start + self.size)
            ukey, counts = ukey[sel], counts[sel]
            if len(ukey) == 0:
                continue
            qids_out.append(np.full(len(ukey), qid, dtype=np.int64))
            langs_out.extend(self.value_by_rank[int(r)] for r in ukey // B)
            buckets_out.append(ukey % B)
            counts_out.append(counts.astype(np.int64))
        cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)  # noqa: E731
        return pa.table(
            {
                "query_id": pa.array(cat(qids_out), pa.int64()),
                self.facet: pa.array(langs_out, pa.string()),
                "bucket": pa.array(cat(buckets_out), pa.int64()),
                "n_docs": pa.array(cat(counts_out), pa.int64()),
            }
        )


class CompositeAggTaskFn:
    """Task-fn form of CompositeAgg (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], facet: str, field: str,
                 bucket_us: int, size: int, version: float):
        self.args = (out_dir, tuple(seg_ids), facet, field, bucket_us, size, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, facet, field, bucket_us, size, version = self.args
        key = (out_dir, version, seg_ids, facet, field, bucket_us, size, "composite")
        ca = _WORKER_MATCH_AGG_CACHE.get(key)
        if ca is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            ca = CompositeAgg(out_dir, list(seg_ids), facet, field, bucket_us, size)
            _WORKER_MATCH_AGG_CACHE[key] = ca
        return ca(batch)


class MatchsetStatsTaskFn:
    """Task-fn form of MatchsetStats (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str, version: float):
        self.args = (out_dir, tuple(seg_ids), field, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, version = self.args
        key = (out_dir, version, seg_ids, field, "stats")
        ms = _WORKER_MATCH_AGG_CACHE.get(key)
        if ms is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            ms = MatchsetStats(out_dir, list(seg_ids), field)
            _WORKER_MATCH_AGG_CACHE[key] = ms
        return ms(batch)


class MatchsetStringStatsTaskFn:
    """Task-fn form of MatchsetStringStats (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str, version: float):
        self.args = (out_dir, tuple(seg_ids), field, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, version = self.args
        key = (out_dir, version, seg_ids, field, "string_stats")
        ss = _WORKER_MATCH_AGG_CACHE.get(key)
        if ss is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            ss = MatchsetStringStats(out_dir, list(seg_ids), field)
            _WORKER_MATCH_AGG_CACHE[key] = ss
        return ss(batch)


class MatchsetMADTaskFn:
    """Task-fn form of MatchsetMAD (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str, version: float):
        self.args = (out_dir, tuple(seg_ids), field, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, version = self.args
        key = (out_dir, version, seg_ids, field, "mad")
        ms = _WORKER_MATCH_AGG_CACHE.get(key)
        if ms is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            ms = MatchsetMAD(out_dir, list(seg_ids), field)
            _WORKER_MATCH_AGG_CACHE[key] = ms
        return ms(batch)


class MultiTermsTaskFn:
    """Task-fn form of MultiTerms (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], facet: str, field: str,
                 bucket_width: int, k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), facet, field, int(bucket_width),
                     int(k), version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, facet, field, bw, k, version = self.args
        key = (out_dir, version, seg_ids, facet, field, bw, k, "multi_terms")
        mt = _WORKER_MATCH_AGG_CACHE.get(key)
        if mt is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            mt = MultiTerms(out_dir, list(seg_ids), facet, field, bw, k)
            _WORKER_MATCH_AGG_CACHE[key] = mt
        return mt(batch)


class TermsEnumTaskFn:
    """Task-fn form of TermsEnum (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], size: int, version: float):
        self.args = (out_dir, tuple(seg_ids), int(size), version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, size, version = self.args
        key = (out_dir, version, seg_ids, size, "terms_enum")
        te = _WORKER_MATCH_AGG_CACHE.get(key)
        if te is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            te = TermsEnum(out_dir, list(seg_ids), size)
            _WORKER_MATCH_AGG_CACHE[key] = te
        return te(batch)


class DocvalueTopKTaskFn:
    """Task-fn form of DocvalueTopK (worker-process cache, as ScorerTaskFn)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str, k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, k, version = self.args
        key = (out_dir, version, seg_ids, field, k)
        dv = _WORKER_DOCVALUE_TOPK_CACHE.get(key)
        if dv is None:
            for kk in [kk for kk in _WORKER_DOCVALUE_TOPK_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_DOCVALUE_TOPK_CACHE[kk]
            dv = DocvalueTopK(out_dir, list(seg_ids), field, k)
            _WORKER_DOCVALUE_TOPK_CACHE[key] = dv
        return dv(batch)


class RescoreTaskFn:
    """Task-fn form of RescoreTopK (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], window: int,
                 weight: float, k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), window, weight, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, window, weight, k, version = self.args
        key = (out_dir, version, seg_ids, window, weight, k, "rescore")
        rs = _WORKER_MATCH_AGG_CACHE.get(key)
        if rs is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            rs = RescoreTopK(out_dir, list(seg_ids), window, weight, k)
            _WORKER_MATCH_AGG_CACHE[key] = rs
        return rs(batch)


class TermStatsTaskFn:
    """Task-fn form of TermStats (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], version: float):
        self.args = (out_dir, tuple(seg_ids), version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, version = self.args
        key = (out_dir, version, seg_ids, "term_stats")
        ts = _WORKER_MATCH_AGG_CACHE.get(key)
        if ts is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            ts = TermStats(out_dir, list(seg_ids))
            _WORKER_MATCH_AGG_CACHE[key] = ts
        return ts(batch)


class FacetCardinalityTaskFn:
    """Task-fn form of FacetCardinality (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], facet: str, version: float):
        self.args = (out_dir, tuple(seg_ids), facet, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, facet, version = self.args
        key = (out_dir, version, seg_ids, facet, "cardinality")
        fc = _WORKER_MATCH_AGG_CACHE.get(key)
        if fc is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            fc = FacetCardinality(out_dir, list(seg_ids), facet)
            _WORKER_MATCH_AGG_CACHE[key] = fc
        return fc(batch)


class PercentileRanksTaskFn:
    """Task-fn form of PercentileRanks (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 probes: tuple[int, ...], version: float):
        self.args = (out_dir, tuple(seg_ids), field, tuple(probes), version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, probes, version = self.args
        key = (out_dir, version, seg_ids, field, probes, "pctranks")
        pr = _WORKER_MATCH_AGG_CACHE.get(key)
        if pr is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            pr = PercentileRanks(out_dir, list(seg_ids), field, probes)
            _WORKER_MATCH_AGG_CACHE[key] = pr
        return pr(batch)


class MatchsetPercentilesTaskFn:
    """Task-fn form of MatchsetPercentiles (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str,
                 quantiles: tuple[float, ...], version: float):
        self.args = (out_dir, tuple(seg_ids), field, quantiles, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, quantiles, version = self.args
        key = (out_dir, version, seg_ids, field, quantiles, "pctl")
        mp = _WORKER_MATCH_AGG_CACHE.get(key)
        if mp is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            mp = MatchsetPercentiles(out_dir, list(seg_ids), field, quantiles)
            _WORKER_MATCH_AGG_CACHE[key] = mp
        return mp(batch)


class MatchsetBoxplotTaskFn:
    """Task-fn form of MatchsetBoxplot (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str, version: float):
        self.args = (out_dir, tuple(seg_ids), field, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, version = self.args
        key = (out_dir, version, seg_ids, field, "boxplot")
        bp = _WORKER_MATCH_AGG_CACHE.get(key)
        if bp is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            bp = MatchsetBoxplot(out_dir, list(seg_ids), field)
            _WORKER_MATCH_AGG_CACHE[key] = bp
        return bp(batch)


class SearchAfterTaskFn:
    """Task-fn form of DocvalueSearchAfter (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str, k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), field, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, k, version = self.args
        key = (out_dir, version, seg_ids, field, k, "search_after")
        sa = _WORKER_MATCH_AGG_CACHE.get(key)
        if sa is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            sa = DocvalueSearchAfter(out_dir, list(seg_ids), field, k)
            _WORKER_MATCH_AGG_CACHE[key] = sa
        return sa(batch)


class CollapseTopK(FacetTopK):
    """FIELD COLLAPSING (Elasticsearch's ``collapse``): ONE blended
    result page per query in which each facet value appears at most once
    — the group's best hit (score DESC, doc_id ASC within the group)
    represents the whole group, winners re-rank by the same total order,
    top-k. Each hit also carries ``n_group``, the group's full match
    count (the integer core of ES's inner_hits/total). Contrast
    FacetTopK: that returns a page PER group; collapse returns one
    diversified page. Scoring composition is identical (brute-path
    per-term cached arrays, sorted-term accumulation), so the doc-range
    sharded cluster path applies: per-range group winners + counts merge
    associatively (max by the frozen order / sum)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..bm25 import topk_select

        qids_out: list[int] = []
        vals_out: list[str] = []
        ranks_out: list[int] = []
        ngroup_out: list[int] = []
        docs_out: list[np.ndarray] = []
        scores_out: list[np.ndarray] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            owners = {}
            for t in set(tokenize(text)):
                segs = self.scorer._owners(t)
                if segs:
                    owners[t] = segs
            terms = sorted(owners)
            if not terms:
                continue
            entries = [self.scorer._term_arrays(t, owners[t]) for t in terms]
            all_ids = np.unique(np.concatenate([e[0] for e in entries]))
            scores = np.zeros(len(all_ids), dtype=np.float64)
            for doc_ids, contribs, _, _ in entries:  # sorted-term order
                pos = np.searchsorted(all_ids, doc_ids)
                scores[pos] += contribs
            codes = self.codes[np.searchsorted(self.doc_ids, all_ids)]
            win_d: list[int] = []
            win_s: list[float] = []
            win_v: list[str] = []
            win_n: list[int] = []
            for vi in self._value_order:
                m = codes == vi
                if not m.any():
                    continue
                d, s = topk_select(all_ids[m], scores[m], 1)
                win_d.append(int(d[0]))
                win_s.append(float(s[0]))
                win_v.append(self.values[vi])
                win_n.append(int(m.sum()))
            wd = np.asarray(win_d, dtype=np.uint64)
            ws = np.asarray(win_s, dtype=np.float64)
            order = np.lexsort((wd, -ws))[: self.k]
            qids_out.extend([qid] * len(order))
            ranks_out.extend(range(1, len(order) + 1))
            vals_out.extend(win_v[i] for i in order)
            ngroup_out.extend(win_n[i] for i in order)
            docs_out.append(wd[order])
            scores_out.append(ws[order])
        docs = np.concatenate(docs_out) if docs_out else np.empty(0, np.uint64)
        scrs = np.concatenate(scores_out) if scores_out else np.empty(0, np.float64)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "rank": pa.array(np.asarray(ranks_out, dtype=np.int32), pa.int32()),
                "doc_id": pa.array(docs, pa.uint64()),
                self.facet: pa.array(vals_out, pa.string()),
                "n_group": pa.array(ngroup_out, pa.int64()),
                "score": pa.array(scrs, pa.float64()),
            }
        )


class DiversifiedSampler(FacetTopK):
    """DIVERSIFIED-SAMPLER aggregation (Elasticsearch's
    ``diversified_sampler`` with a ``terms`` sub-agg): walk the match set
    in relevance order (score DESC, doc_id ASC), skip docs whose facet
    value already holds ``max_per_value`` sample slots, stop at
    ``sample_size`` — then count the sample per facet value. The ES
    use-case verbatim: aggregate over the best-matching docs without one
    over-represented group drowning the sample. Skipping never evicts an
    earlier pick, so the walk is equivalent to: per-facet rank filter
    (≤ max_per_value) THEN global top-sample_size — the form a windowed
    SQL oracle replays. Output (query_id, <facet>, n_sample), facet
    ascending; only facet COUNTS are emitted, so same-facet boundary
    ties cannot change the output (cross-facet boundary ties are
    excluded by the frozen query set, as with every ranked oracle
    here)."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 facet: str = "lang", sample_size: int = 20,
                 max_per_value: int = 3):
        super().__init__(out_dir, seg_ids, facet, k=1)
        self.sample_size = int(sample_size)
        self.max_per_value = int(max_per_value)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        vals_out: list[str] = []
        n_out: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            owners = {}
            for t in set(tokenize(text)):
                segs = self.scorer._owners(t)
                if segs:
                    owners[t] = segs
            terms = sorted(owners)
            if not terms:
                continue
            entries = [self.scorer._term_arrays(t, owners[t]) for t in terms]
            all_ids = np.unique(np.concatenate([e[0] for e in entries]))
            scores = np.zeros(len(all_ids), dtype=np.float64)
            for doc_ids, contribs, _, _ in entries:  # sorted-term order
                pos = np.searchsorted(all_ids, doc_ids)
                scores[pos] += contribs
            codes = self.codes[np.searchsorted(self.doc_ids, all_ids)]
            order = np.lexsort((all_ids, -scores))
            ocodes = codes[order]
            # per-facet occurrence rank along the relevance walk
            seen: dict[int, int] = {}
            keep = np.zeros(len(order), dtype=bool)
            taken = 0
            for i, c in enumerate(ocodes):
                if taken >= self.sample_size:
                    break
                got = seen.get(int(c), 0)
                if got < self.max_per_value:
                    seen[int(c)] = got + 1
                    keep[i] = True
                    taken += 1
            kept_codes = ocodes[keep]
            uniq, counts = np.unique(kept_codes, return_counts=True)
            for vi in self._value_order:
                where = np.nonzero(uniq == vi)[0]
                if len(where):
                    qids_out.append(qid)
                    vals_out.append(self.values[vi])
                    n_out.append(int(counts[where[0]]))
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                self.facet: pa.array(vals_out, pa.string()),
                "n_sample": pa.array(n_out, pa.int64()),
            }
        )


class DiversifiedSamplerTaskFn:
    """Task-fn form of DiversifiedSampler (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], facet: str,
                 sample_size: int, max_per_value: int, version: float):
        self.args = (out_dir, tuple(seg_ids), facet, sample_size, max_per_value, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, facet, size, cap, version = self.args
        key = (out_dir, version, seg_ids, facet, size, cap, "divsample")
        ds = _WORKER_MATCH_AGG_CACHE.get(key)
        if ds is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            ds = DiversifiedSampler(out_dir, list(seg_ids), facet, size, cap)
            _WORKER_MATCH_AGG_CACHE[key] = ds
        return ds(batch)


class CollapseTopKTaskFn:
    """Task-fn form of CollapseTopK (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], facet: str, k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), facet, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, facet, k, version = self.args
        key = (out_dir, version, seg_ids, facet, k, "collapse")
        ct = _WORKER_MATCH_AGG_CACHE.get(key)
        if ct is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            ct = CollapseTopK(out_dir, list(seg_ids), facet, k)
            _WORKER_MATCH_AGG_CACHE[key] = ct
        return ct(batch)


class FacetTopKTaskFn:
    """Task-fn form of FacetTopK (worker-process cache, as ScorerTaskFn)."""

    def __init__(self, out_dir: str, seg_ids: list[int], facet: str, k: int, version: float):
        self.args = (out_dir, tuple(seg_ids), facet, k, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, facet, k, version = self.args
        key = (out_dir, version, seg_ids, facet, k)
        ft = _WORKER_FACET_TOPK_CACHE.get(key)
        if ft is None:
            for kk in [kk for kk in _WORKER_FACET_TOPK_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_FACET_TOPK_CACHE[kk]
            ft = FacetTopK(out_dir, list(seg_ids), facet, k)
            _WORKER_FACET_TOPK_CACHE[key] = ft
        return ft(batch)


class FacetCountTaskFn:
    """Task-fn form of FacetCounter (same worker-process cache pattern as
    ScorerTaskFn — long-lived default workers, no actor spawn)."""

    def __init__(self, out_dir: str, seg_ids: list[int], facet: str, version: float):
        self.args = (out_dir, tuple(seg_ids), facet, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, facet, version = self.args
        key = (out_dir, version, seg_ids, facet)
        fc = _WORKER_FACET_CACHE.get(key)
        if fc is None:
            for k in [k for k in _WORKER_FACET_CACHE if k[0] == out_dir and k[1] < version]:
                del _WORKER_FACET_CACHE[k]
            fc = FacetCounter(out_dir, list(seg_ids), facet)
            _WORKER_FACET_CACHE[key] = fc
        return fc(batch)


_WORKER_SCORER_CACHE: dict[tuple, "QueryScorer"] = {}


class ScorerTaskFn:
    """Stateless-TASK form of the scorer stage: a plain-callable map_batches
    fn whose QueryScorer instance is cached per WORKER PROCESS in the module
    global above.

    Why this exists alongside the actor form: an actor pool spawns fresh
    Python processes per query run (~2s each — far more than the scoring
    itself for a few thousand queries), while plain tasks reuse Ray's
    long-lived default workers. The cache MUST be reached through this
    importable top-level class: cloudpickle serializes a nested closure BY
    VALUE together with a private copy of its captured globals, so a
    closure-based version silently rebuilt the scorer per task; methods of
    a by-reference class resolve the real module (and its global dict) in
    the worker. ``version`` (stats.json mtime) keys the cache so a rebuilt
    index is never served stale."""

    __name__ = "ScorerTaskFn"

    def __init__(
        self,
        out_dir: str,
        seg_ids: list[int],
        k: int,
        method: str,
        shared_ref,
        version: int,
        doc_range: tuple[int, int] | None = None,
        pids: list[int] | None = None,
        mode: str = "or",
        filter_ref=None,
        near_window: int = 8,
        min_should_match: int = 1,
        span_slop: int = 2,
        terms_set_mod: int = 3,
        max_gaps: int = 2,
    ):
        self.args = (
            out_dir, tuple(seg_ids), k, method, shared_ref, version,
            doc_range, tuple(pids) if pids is not None else None, mode,
            filter_ref, near_window, min_should_match, span_slop,
            terms_set_mod, max_gaps,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        (out_dir, seg_ids, k, method, shared_ref, version, doc_range, pids,
         mode, filter_ref, near_window, min_should_match, span_slop,
         terms_set_mod, max_gaps) = self.args
        # seg_ids, shared_ref-presence, doc_range, mode, the filter ref and
        # the near/msm knobs are part of the identity: a scorer built over a
        # subset of segments / a doc range (or without shared state, with
        # AND/NEAR/msm semantics, or with a facet filter) must not be served
        # for a different configuration of the same index
        key = (out_dir, version, k, method, seg_ids, shared_ref is not None,
               doc_range, mode, filter_ref, near_window, min_should_match,
               span_slop, terms_set_mod, max_gaps)
        scorer = _WORKER_SCORER_CACHE.get(key)
        if scorer is None:
            # evict only STALE entries of the same index (older version);
            # scorers for other live indexes keep their warm state
            for old in [k_ for k_ in _WORKER_SCORER_CACHE if k_[0] == out_dir and k_[1] < version]:
                del _WORKER_SCORER_CACHE[old]
            import ray as _ray

            scorer = QueryScorer(
                out_dir, list(seg_ids), k, method, shared_ref,
                doc_range=doc_range, pids=list(pids) if pids is not None else None,
                mode=mode,
                # zero-copy read-only view over the one object-store copy
                filter_ids=_ray.get(filter_ref) if filter_ref is not None else None,
                near_window=near_window,
                min_should_match=min_should_match,
                span_slop=span_slop,
                terms_set_mod=terms_set_mod,
                max_gaps=max_gaps,
            )
            _WORKER_SCORER_CACHE[key] = scorer
        return scorer(batch)


def make_scorer_task_fn(
    out_dir: str,
    seg_ids: list[int],
    k: int,
    method: str,
    shared_ref,
    version: int,
    doc_range: tuple[int, int] | None = None,
    pids: list[int] | None = None,
    mode: str = "or",
    filter_ref=None,
    near_window: int = 8,
    min_should_match: int = 1,
    span_slop: int = 2,
    terms_set_mod: int = 3,
    max_gaps: int = 2,
):
    return ScorerTaskFn(
        out_dir, seg_ids, k, method, shared_ref, version, doc_range, pids, mode,
        filter_ref, near_window, min_should_match, span_slop, terms_set_mod,
        max_gaps,
    )


class UrlResolver:
    """map_batches actor: doc_id → url by reading only the touched docs/pid
    files (partition pruning via the docID scheme)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.cache: dict[int, tuple[np.ndarray, list[str]]] = {}

    def _load(self, pid: int):
        if pid not in self.cache:
            tbl = pq.read_table(
                os.path.join(self.out_dir, "docs", f"pid={pid:04d}.parquet"),
                columns=["doc_id", "url"],
            )
            ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            self.cache[pid] = (ids, tbl["url"].to_pylist())
        return self.cache[pid]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        urls: list[str] = []
        for d in doc_ids:
            pid = int(d >> np.uint64(DOC_ID_PARTITION_SHIFT))
            ids, us = self._load(pid)
            urls.append(us[int(np.searchsorted(ids, d))])
        return batch.append_column("url", pa.array(urls, pa.string()))


class MatchsetExtendedStats(DocvalueTopK):
    """EXTENDED-STATS aggregation over the match set (ES extended_stats):
    the second-moment family — count, sum, sum of squares and the exact
    VARIANCE NUMERATOR n·Σv² − (Σv)² — over a numeric docvalue.
    Everything is integer: both sums use the 32-bit-split trick of
    MatchsetStats (Python-int recombination, no silent int64 wrap at
    10^9-doc match sets with 10^4-scale values), so variance/std are
    derivable client-side to any precision and a SQL replay
    hash-matches. Per-doc-range PARTIALS (n, Σv, Σv²) are additive —
    the cluster plan is the same merge as every counting agg here."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        ns: list[int] = []
        sums: list[int] = []
        sumsqs: list[int] = []
        varnums: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            n = len(docs)
            if n == 0:
                continue
            vals = self.vals[np.searchsorted(self.doc_ids, docs)]
            hi, lo = np.divmod(vals, np.int64(1) << 32)
            s = (int(hi.sum(dtype=np.int64)) << 32) + int(lo.sum(dtype=np.int64))
            sq = vals * vals  # exact: docvalues < 2^31
            hi2, lo2 = np.divmod(sq, np.int64(1) << 32)
            ssq = (int(hi2.sum(dtype=np.int64)) << 32) + int(lo2.sum(dtype=np.int64))
            qids_out.append(qid)
            ns.append(n)
            sums.append(s)
            sumsqs.append(ssq)
            varnums.append(n * ssq - s * s)
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "n_docs": pa.array(ns, pa.int64()),
                "sum": pa.array(sums, pa.int64()),
                "sum_sq": pa.array(sumsqs, pa.int64()),
                "var_num": pa.array(varnums, pa.int64()),
            }
        )


FILTERS_AGG_SHORT = 40
FILTERS_AGG_LONG = 75


class FiltersAgg(FacetCounter):
    """FILTERS aggregation over the match set (ES filters agg with
    other_bucket=true): a fixed set of NAMED predicate buckets counted
    in one pass — 'short' (doclen < 40), 'long' (doclen ≥ 75), 'en'
    (lang = 'en') — plus the 'other' bucket of matched docs in NO named
    bucket. Buckets may overlap (a short English doc counts in both
    'short' and 'en'), exactly ES semantics. All four buckets emit for
    every non-empty match set, zeros included (the agg's shape is fixed
    by the request, not the data). Counts are additive per doc range —
    the standard partial-merge cluster plan."""

    BUCKETS = ("short", "long", "en", "other")

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None):
        super().__init__(out_dir, seg_ids, "lang")
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(pq.read_table(f, columns=["doc_id", "doclen"]) for f in files)
        self.doclen = tbl["doclen"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        try:
            self.en_code = self.values.index("en")
        except ValueError:
            self.en_code = -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out: list[int] = []
        buckets_out: list[str] = []
        counts_out: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            idx = np.searchsorted(self.doc_ids, docs)
            dl = self.doclen[idx]
            short = dl < FILTERS_AGG_SHORT
            long_ = dl >= FILTERS_AGG_LONG
            en = self.codes[idx] == self.en_code
            other = ~(short | long_ | en)
            for name, mask in zip(self.BUCKETS, (short, long_, en, other)):
                qids_out.append(qid)
                buckets_out.append(name)
                counts_out.append(int(mask.sum()))
        return pa.table(
            {
                "query_id": pa.array(qids_out, pa.int64()),
                "bucket": pa.array(buckets_out, pa.string()),
                "n_docs": pa.array(counts_out, pa.int64()),
            }
        )


class MatchsetExtendedStatsTaskFn:
    """Task-fn form of MatchsetExtendedStats (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], field: str, version: float):
        self.args = (out_dir, tuple(seg_ids), field, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, field, version = self.args
        key = (out_dir, version, seg_ids, field, "ext_stats")
        es = _WORKER_MATCH_AGG_CACHE.get(key)
        if es is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            es = MatchsetExtendedStats(out_dir, list(seg_ids), field)
            _WORKER_MATCH_AGG_CACHE[key] = es
        return es(batch)


class FiltersAggTaskFn:
    """Task-fn form of FiltersAgg (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], version: float):
        self.args = (out_dir, tuple(seg_ids), version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, version = self.args
        key = (out_dir, version, seg_ids, "filters_agg")
        fa = _WORKER_MATCH_AGG_CACHE.get(key)
        if fa is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            fa = FiltersAgg(out_dir, list(seg_ids))
            _WORKER_MATCH_AGG_CACHE[key] = fa
        return fa(batch)


class BucketScriptAgg(FacetCounter):
    """``bucket_script`` + ``bucket_selector`` pipeline aggregations (ES):
    per query, a terms agg on the lang facet over the match set carrying
    two sibling metrics — n_docs and sum_doclen — from which
    ``bucket_script`` derives ``avg_dl_x100 = sum_doclen*100 // n_docs``
    (integer-frozen, no float contract needed) and ``bucket_selector``
    keeps only buckets holding ≥ 1/share_denom of the query's matched
    docs (``n_docs * share_denom >= n_total`` — a scale-free integer
    cross-multiply, so the predicate is exact at any corpus size).
    Counts and sums are additive per doc range, so the cluster plan is
    the standard partial-merge: per-range (lang, n, sum) triples fold to
    the global buckets before the script/selector run on the k-sized
    result (SCALE.md §3); the selector CANNOT push below the merge
    because n_total is global."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None,
                 share_denom: int = 8):
        super().__init__(out_dir, seg_ids, "lang")
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(
            pq.read_table(f, columns=["doc_id", "doclen"]) for f in files
        )
        self.doclen = tbl["doclen"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        self.share_denom = int(share_denom)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids: list[int] = []
        langs: list[str] = []
        ns: list[int] = []
        sums: list[int] = []
        avgs: list[int] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            if len(docs) == 0:
                continue
            idx = np.searchsorted(self.doc_ids, docs)
            codes = self.codes[idx]
            n = np.bincount(codes, minlength=len(self.values))
            # float64 bincount weights: doclen sums stay exact below 2^53
            s = np.bincount(
                codes, weights=self.doclen[idx].astype(np.float64),
                minlength=len(self.values),
            )
            total = len(docs)
            for vi in np.argsort(np.asarray(self.values, dtype=object), kind="stable"):
                nv = int(n[vi])
                if nv and nv * self.share_denom >= total:
                    sv = int(s[vi])
                    qids.append(qid)
                    langs.append(self.values[vi])
                    ns.append(nv)
                    sums.append(sv)
                    avgs.append(sv * 100 // nv)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "n_docs": pa.array(ns, pa.int64()),
                "sum_doclen": pa.array(sums, pa.int64()),
                "avg_dl_x100": pa.array(avgs, pa.int64()),
            }
        )


class BucketScriptAggTaskFn:
    """Task-fn form of BucketScriptAgg (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], share_denom: int,
                 version: float):
        self.args = (out_dir, tuple(seg_ids), share_denom, version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, share_denom, version = self.args
        key = (out_dir, version, seg_ids, share_denom, "bucket_script")
        bs = _WORKER_MATCH_AGG_CACHE.get(key)
        if bs is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            bs = BucketScriptAgg(out_dir, list(seg_ids), share_denom)
            _WORKER_MATCH_AGG_CACHE[key] = bs
        return bs(batch)


class TTestAgg(FacetCounter):
    """ES ``t_test`` aggregation (type=heteroscedastic — Welch's unpaired
    two-sample t): per query, the t-statistic of the doclen docvalue
    between MATCHED docs and the REST of the live corpus. Every moment
    derives from exact integer sums — per-side (n, S=Σdl, SS=Σdl²), with
    the rest side obtained by subtracting the match side from corpus
    totals computed once per worker (tombstones excluded, matching
    QueryScorer visibility) — so the cluster plan is one per-range
    (n, S, SS) partial-merge; only the final scalar arithmetic is float.
    The float expression tree is spelled IDENTICALLY in the SQL oracle
    (each IEEE op correctly rounded on both engines → bitwise-equal t),
    and means/t round to 3dp per the repo's documented float contract.
    Queries where either side has < 2 docs emit no row (variance
    undefined), a guard the oracle repeats."""

    def __init__(self, out_dir: str, seg_ids: list[int] | None = None):
        super().__init__(out_dir, seg_ids, "lang")
        files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        tbl = pa.concat_tables(
            pq.read_table(f, columns=["doc_id", "doclen"]) for f in files
        )
        dl = tbl["doclen"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if self.exclude_ids is not None and len(self.exclude_ids):
            pos = np.searchsorted(self.exclude_ids, self.doc_ids)
            ok = pos < len(self.exclude_ids)
            ok[ok] = self.exclude_ids[pos[ok]] == self.doc_ids[ok]
            live = ~ok
        else:
            live = np.ones(len(dl), dtype=bool)
        self.doclen = dl
        self.n_corpus = int(live.sum())
        self.s_corpus = int(dl[live].sum())
        self.ss_corpus = int((dl[live].astype(np.int64) ** 2).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids: list[int] = []
        n1s: list[int] = []
        n2s: list[int] = []
        m1s: list[float] = []
        m2s: list[float] = []
        ts: list[float] = []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            docs = self._match_set(text)
            n1 = len(docs)
            n2 = self.n_corpus - n1
            if n1 < 2 or n2 < 2:
                continue
            dl = self.doclen[np.searchsorted(self.doc_ids, docs)]
            s1 = int(dl.sum())
            ss1 = int((dl.astype(np.int64) ** 2).sum())
            s2 = self.s_corpus - s1
            ss2 = self.ss_corpus - ss1
            # fixed float expression tree — mirrored verbatim in the oracle
            m1 = s1 / n1
            m2 = s2 / n2
            v1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
            v2 = (ss2 - s2 * s2 / n2) / (n2 - 1)
            t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
            qids.append(qid)
            n1s.append(n1)
            n2s.append(n2)
            m1s.append(round(m1, 3))
            m2s.append(round(m2, 3))
            ts.append(round(t, 3))
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "n_match": pa.array(n1s, pa.int64()),
                "n_rest": pa.array(n2s, pa.int64()),
                "mean_match": pa.array(m1s, pa.float64()),
                "mean_rest": pa.array(m2s, pa.float64()),
                "t_stat": pa.array(ts, pa.float64()),
            }
        )


class TTestAggTaskFn:
    """Task-fn form of TTestAgg (worker-process cache)."""

    def __init__(self, out_dir: str, seg_ids: list[int], version: float):
        self.args = (out_dir, tuple(seg_ids), version)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_dir, seg_ids, version = self.args
        key = (out_dir, version, seg_ids, "t_test")
        tt = _WORKER_MATCH_AGG_CACHE.get(key)
        if tt is None:
            for kk in [kk for kk in _WORKER_MATCH_AGG_CACHE if kk[0] == out_dir and kk[1] < version]:
                del _WORKER_MATCH_AGG_CACHE[kk]
            tt = TTestAgg(out_dir, list(seg_ids))
            _WORKER_MATCH_AGG_CACHE[key] = tt
        return tt(batch)
