"""Okapi BM25 (k1=1.2, b=0.75 per BASELINE.json:6) — frozen formula.

idf variant frozen to the non-negative Lucene form (SURVEY.md §1.3):
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(t, d) = idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
float64 throughout. Per-doc scores accumulate over query terms in SORTED
term order (ties in float addition order would otherwise break the
rank-identity goldens across implementations).

``brute_force_topk`` is the oracle scorer: exhaustive scoring over decoded
posting lists, vectorized with NumPy. Block-Max WAND (wand.py) must produce
identical results — property-tested in tests/test_wand.py.
"""

from __future__ import annotations

import numpy as np

from . import K1, B


def idf(df: int | np.ndarray, n_docs: int):
    df = np.asarray(df, dtype=np.float64)
    out = np.log1p((n_docs - df + 0.5) / (df + 0.5))
    return float(out) if out.ndim == 0 else out


def score_tf(tf: np.ndarray, dl: np.ndarray, avgdl: float, idf_val: float) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    denom = tf + K1 * (1.0 - B + B * dl / avgdl)
    return idf_val * tf * (K1 + 1.0) / denom


def topk_select(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k with the frozen total order (score DESC, doc_id ASC)."""
    n = len(doc_ids)
    if n == 0:
        return doc_ids[:0], scores[:0]
    if n > k:
        # Exact under ties: every doc scoring >= the kth-highest score is a
        # candidate; the lexsort below applies the frozen tie-break. The
        # (n-k)th-SMALLEST element IS the kth-highest value — partitioning
        # ascending avoids materializing a negated copy of the array.
        kth = np.partition(scores, n - k)[n - k]  # values-only: no index array
        cand = np.flatnonzero(scores >= kth)
    else:
        cand = np.arange(n)
    order = np.lexsort((doc_ids[cand], -scores[cand]))
    sel = cand[order][:k]
    return doc_ids[sel], scores[sel]


def brute_force_topk(
    query_terms: list[str],
    postings: dict[str, tuple[np.ndarray, np.ndarray]],
    dfs: dict[str, int],
    doclen_lookup,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    conjunctive: bool = False,
    min_match: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exhaustive BM25 top-k. ``postings[term] = (doc_ids, tfs)`` (decoded,
    sorted); ``doclen_lookup(doc_ids) -> dl array``. Duplicate query terms
    count once (frozen: a query is a term SET, sorted).

    ``conjunctive=True`` restricts candidates to docs containing EVERY
    query term (AND semantics); a term absent from the index makes the
    result empty. Scores for surviving docs are identical to the
    disjunctive scores (same contributions, same sorted-term accumulation
    order), so conjunctive results are a filtered subset of disjunctive
    full scoring — the property the tests pin."""
    if conjunctive:
        terms = sorted(set(query_terms))
        if not terms or any(t not in postings for t in terms):
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        cand = postings[min(terms, key=lambda t: len(postings[t][0]))][0]
        for t in terms:
            d_ids = postings[t][0]
            pos = np.searchsorted(d_ids, cand)
            ok = pos < len(d_ids)
            ok[ok] = d_ids[pos[ok]] == cand[ok]
            cand = cand[ok]
        if len(cand) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        scores = np.zeros(len(cand), dtype=np.float64)
        dls = doclen_lookup(cand).astype(np.float64)
        for t in terms:
            d_ids, tfs = postings[t]
            pos = np.searchsorted(d_ids, cand)
            scores += score_tf(tfs[pos], dls, avgdl, idf(dfs[t], n_docs))
        return topk_select(cand, scores, k)
    terms = sorted(set(t for t in query_terms if t in postings))
    if not terms or (min_match is not None and len(terms) < min_match):
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    all_ids, n_matched = np.unique(
        np.concatenate([postings[t][0] for t in terms]), return_counts=True
    )
    if min_match is not None:
        # minimum_should_match: a doc is eligible with >= min_match distinct
        # matched terms; scores stay the disjunctive sums (the knob gates
        # eligibility, never statistics — ES/Lucene semantics)
        all_ids = all_ids[n_matched >= min_match]
        if len(all_ids) == 0:
            return all_ids.astype(np.uint64), np.empty(0, np.float64)
    scores = np.zeros(len(all_ids), dtype=np.float64)
    dls = doclen_lookup(all_ids).astype(np.float64)
    filtered = min_match is not None and min_match > 1
    for t in terms:
        d_ids, tfs = postings[t]
        pos = np.searchsorted(all_ids, d_ids)
        if filtered:
            # some of this term's docs were dropped by the min_match gate
            ok = pos < len(all_ids)
            ok[ok] = all_ids[pos[ok]] == d_ids[ok]
            pos, tfs = pos[ok], tfs[ok]
        scores[pos] += score_tf(tfs, dls[pos], avgdl, idf(dfs[t], n_docs))
    return topk_select(all_ids, scores, k)
