"""query_index — top-k BM25 over a built index (SURVEY.md §3.2).

    queries → map_batches(scorer task fn)   # replicas; each query scored
                                            # once, completely; scorer state
                                            # cached per worker process
            → map_batches(UrlResolver)      # partition-pruned lookup

The index is TERM-sharded (segments = disjoint term ranges), so each scorer
replica maps ALL segments (mmap — replicas on a node share page cache) and
gathers a query's term cursors from their owning segments before running a
single Block-Max WAND. Scorers ride Ray's long-lived default workers via
make_scorer_task_fn (state cached per process — same amortization as an
actor pool without per-run actor spawn); heavy-term impact arrays and
doclens come from ONE shared object-store copy (ray.put, zero-copy reads). Per-segment top-k + merge would be WRONG here: it
splits a document's score across segments whenever a query's terms straddle
a term-range boundary (caught by the DuckDB oracle; see QueryScorer
docstring). Results carry the frozen order (score DESC, doc_id ASC) with
1-based ranks.
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages.query_stage import QueryScorer, UrlResolver, make_scorer_task_fn
from ..state import manifest as mf


def list_segments(out_dir: str) -> list[int]:
    segs = []
    for p in sorted(glob.glob(os.path.join(out_dir, "segments", "seg=*"))):
        m = re.match(r"seg=(\d+)$", os.path.basename(p))
        if m and os.path.isdir(p):
            segs.append(int(m.group(1)))
    return segs


_SHARED_STATE_CACHE: dict[str, object] = {}


@ray.remote
def _impacts_for_terms(out_dir: str, seg_ids: tuple[int, ...], terms: tuple[str, ...], dl_pair, n_docs: int, avgdl: float):
    """One shard of the head-term impact build: decode + score the given
    terms' postings (gathering salted shards). ``dl_pair`` arrives as an
    ObjectRef argument, which Ray resolves to zero-copy plasma-backed
    numpy views — one shared copy serves every task."""
    from .. import codecs as _codecs
    from ..bm25 import idf as idf_fn, score_tf
    from ..stages.query_stage import Segment

    dl_ids, dl_lens = dl_pair
    segs = [Segment(out_dir, sid) for sid in seg_ids]
    out: dict[str, tuple] = {}
    for term in terms:
        segs_of = [s for s in segs if term in s.dict]
        gdf = sum(s.dict[term][0] for s in segs_of)
        parts = [s.term_postings(term) for s in segs_of]
        doc_ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        if len(doc_ids) > 1 and not np.all(doc_ids[1:] > doc_ids[:-1]):
            o = np.argsort(doc_ids, kind="stable")
            doc_ids, tfs = doc_ids[o], tfs[o]
        dls = dl_lens[np.searchsorted(dl_ids, doc_ids)]
        idf_val = idf_fn(gdf, n_docs)
        contribs = score_tf(tfs, dls.astype("float64"), avgdl, idf_val)
        skips_cat = np.concatenate([s.term_skips(term) for s in segs_of])
        lasts = skips_cat["last_doc_id"].copy()
        bmax = _codecs.tf_upper_bound(skips_cat["max_tf"], idf_val)
        if len(lasts) > 1 and not np.all(lasts[1:] >= lasts[:-1]):
            o = np.argsort(lasts, kind="stable")
            lasts, bmax = lasts[o], bmax[o]
        out[term] = (doc_ids, contribs, lasts, bmax)
    return out


def _shared_scorer_state(out_dir: str, segs: list[int]):
    """Build the scorer state ONCE per driver process and ray.put it:
    doclen arrays + precomputed impact arrays (doc_ids, per-posting BM25
    contribution, skips) for the Zipf-head terms (df >= n_docs/200). Every
    scorer ray.get()s the same object — numpy arrays come back as
    zero-copy read-only views over shared object-store memory, so N workers
    pay ZERO per-worker decode/score warmup for the terms that dominate
    query cost. (Cluster analogue: the object is replicated once per node,
    not per worker.)

    Round 3: the decode+score of head terms is DISTRIBUTED over Ray tasks
    (one per term chunk, doclens passed by ref and read zero-copy) — the
    driver only scans the shard dictionaries for global dfs and merges the
    returned per-term dicts. Cached per (index dir, version) for the
    driver process lifetime."""
    import ray as _ray

    from ..stages.query_stage import DoclenTable, Segment
    from ..state import manifest as mf

    # key includes stats.json mtime: rebuilding an index at the same path in
    # one driver process must invalidate the cached doclens/impacts
    key = (os.path.abspath(out_dir), index_version(out_dir))
    if key in _SHARED_STATE_CACHE:
        return _SHARED_STATE_CACHE[key]
    stats = mf.read_stats(out_dir)
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    dl = DoclenTable(out_dir)
    dl_ref = _ray.put((dl.doc_ids, dl.doclens))
    df_floor = max(256, n_docs // 200)
    # global df per term from the shard dicts alone (no postings decode)
    gdf: dict[str, int] = {}
    for sid in segs:
        seg = Segment(out_dir, sid)
        for term, entry in seg.dict.items():
            gdf[term] = gdf.get(term, 0) + entry[0]
    head = sorted(t for t, c in gdf.items() if c >= df_floor)
    impacts: dict[str, tuple] = {}
    if head:
        n_chunks = min(len(head), max(1, _cpus() * 2))
        chunks = [tuple(head[i::n_chunks]) for i in range(n_chunks)]
        refs = [
            _impacts_for_terms.remote(out_dir, tuple(segs), ch, dl_ref, n_docs, avgdl)
            for ch in chunks
        ]
        for d in _ray.get(refs):
            impacts.update(d)
    ref = _ray.put((dl.doc_ids, dl.doclens, impacts))
    _SHARED_STATE_CACHE[key] = ref
    return ref


def index_version(out_dir: str) -> int:
    """Cache-invalidation token: stats.json mtime (rewritten on rebuild)."""
    try:
        return os.stat(os.path.join(out_dir, "stats.json")).st_mtime_ns
    except OSError:
        return 0


def warm_index(out_dir: str) -> None:
    """Build + cache the shared scorer state (doclens + Zipf-head impact
    arrays) in the object store ahead of serving, so the first query batch
    doesn't pay the load. Idempotent per driver process."""
    _shared_scorer_state(out_dir, list_segments(out_dir))


@ray.remote
def _facet_ids_of(path: str, column: str, values: tuple) -> np.ndarray:
    """One docs/pid file's doc_ids matching the facet predicate — pruned
    read (doc_id + the facet column only; text never leaves storage)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    t = _pq.read_table(path, columns=["doc_id", column])
    m = pc.is_in(t[column], value_set=pa.array(list(values), t.schema.field(column).type))
    return t.filter(m)["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)


def facet_doc_ids(out_dir: str, column: str, values) -> np.ndarray:
    """Sorted doc_id array for a metadata facet predicate (column IN
    values) over the docs/ sidecar — the query-time filter input for
    ``query_index(filter_ids=...)``. One pruned Ray task per pid file;
    per-pid arrays are already ascending (doc_id = (pid<<40)|row) and pids
    are visited in order, so the concat is sorted without a sort.

    Cluster posture: the result is broadcast via one ``ray.put`` exactly
    like the doclen table (8 bytes/matching doc, replicated per node, not
    per worker). At 10^12 docs prefer ``query_index_doc_sharded`` where
    each range scorer would load only ITS pids' facet rows."""
    paths = [
        os.path.join(out_dir, "docs", f"pid={p:04d}.parquet") for p in doc_pids(out_dir)
    ]
    parts = ray.get([_facet_ids_of.remote(p, column, tuple(values)) for p in paths])
    if not parts:
        return np.empty(0, np.uint64)
    return np.concatenate(parts)


@ray.remote
def _range_ids_of(path: str, column: str, lo: int, hi: int) -> np.ndarray:
    """One docs/pid file's doc_ids with docvalue in [lo, hi) — pruned read
    (doc_id + the int64 docvalue column only)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    t = _pq.read_table(path, columns=["doc_id", column])
    v = t[column].cast(pa.int64())
    m = pc.and_(pc.greater_equal(v, lo), pc.less(v, hi))
    return t.filter(m)["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)


def docvalue_range_ids(out_dir: str, column: str, lo: int, hi: int) -> np.ndarray:
    """Sorted doc_id array for a NUMERIC RANGE predicate (lo <= column <
    hi) over the docs/ sidecar — the range-filter input for
    ``query_index(filter_ids=...)`` (e.g. "only pages crawled this week").
    Same shape and cluster posture as ``facet_doc_ids``: one pruned Ray
    task per pid file, per-pid arrays already ascending, concat in pid
    order is globally sorted."""
    paths = [
        os.path.join(out_dir, "docs", f"pid={p:04d}.parquet") for p in doc_pids(out_dir)
    ]
    parts = ray.get([_range_ids_of.remote(p, column, int(lo), int(hi)) for p in paths])
    if not parts:
        return np.empty(0, np.uint64)
    return np.concatenate(parts)


def sort_topk(
    out_dir: str,
    queries,
    field: str = "warc_ts",
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Sort-by-field retrieval: per query, the top-k MATCHING docs ordered
    by a numeric docvalue (field DESC, doc_id ASC) instead of by score —
    "newest matches first". Returns (query_id, rank, doc_id, <field>).
    Execution shape identical to query_index (stateless tasks,
    worker-cached DocvalueTopK state)."""
    from ..stages.query_stage import DocvalueTopKTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        DocvalueTopKTaskFn(out_dir, segs, field, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def rescore_topk(
    out_dir: str,
    queries,
    window: int = 30,
    weight: float = 2.0,
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """RESCORE retrieval (ES rescore API): primary BM25 fills a top-
    ``window`` candidate set per query; inside the window each doc gains
    ``weight`` × its phrase score (0 unless the query occurs as a
    consecutive phrase); the page is the rescored window's top-k.
    Returns (query_id, rank, doc_id, score)."""
    from ..stages.query_stage import RescoreTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        RescoreTaskFn(out_dir, segs, window, weight, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def search_after_topk(
    out_dir: str,
    queries,
    field: str = "warc_ts",
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """SEARCH_AFTER cursor pagination on the docvalue sort (ES
    search_after): ``queries`` rows carry (query_id, text, after_val,
    after_doc) — the sort key of the last delivered hit — and the result
    is the next k matches strictly after that cursor in (field DESC,
    doc_id ASC) order. Returns (query_id, rank, doc_id, <field>) with
    rank 1..k within the page."""
    from ..stages.query_stage import SearchAfterTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        SearchAfterTaskFn(out_dir, segs, field, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def query_index(
    out_dir: str,
    queries,
    k: int = 10,
    method: str = "wand",
    concurrency: int | None = None,
    batch_size: int = 64,
    resolve_urls: bool = True,
    mode: str = "or",
    filter_ids: np.ndarray | None = None,
    near_window: int = 8,
    min_should_match: int = 1,
    span_slop: int = 2,
    terms_set_mod: int = 3,
    max_gaps: int = 2,
) -> ray.data.Dataset:
    """queries: parquet path | ray Dataset | pyarrow Table with
    (query_id:int64, text:string). Returns a Dataset
    (query_id, rank, doc_id[, url], score).

    ``mode="and"`` switches to conjunctive retrieval: only documents
    containing EVERY query term are eligible (an out-of-vocabulary term
    empties that query's result); scores are unchanged BM25 sums.
    ``mode="phrase"`` requires the terms as consecutive tokens;
    ``mode="near"`` requires all distinct terms within ``near_window``
    consecutive tokens (unordered) — both verify from the positional
    sidecar when the index carries one, else from checkpoint text.
    ``mode="prefix"`` expands trailing-``*`` terms against the term
    dictionary (sorted-dict range scan per segment) and scores the
    union disjunctively; ``mode="wildcard"`` generalizes to ``*``
    anywhere; ``mode="regexp"`` expands full-match regexes (Lucene
    RegexpQuery) the same way.
    ``mode="msm"`` requires at least ``min_should_match`` distinct
    in-vocabulary terms per doc (m=1 ≡ "or", m=n_terms ≡ "and");
    scores stay the disjunctive BM25 sums of the matched terms.
    ``mode="terms_set"`` is msm with a PER-DOC required count read from
    a docvalue (ES terms_set / minimum_should_match_field): required =
    1 + doclen % ``terms_set_mod``.
    ``mode="span_near"`` requires the query's tokens IN ORDER within
    ``len(seq)−1+span_slop`` consecutive tokens (Lucene span_near
    in_order=true; slop=0 ≡ phrase) — verified from the positional
    sidecar when present, else from checkpoint text.
    ``mode="intervals"`` is the ES intervals query: whitespace-separated
    slots of ``|``-separated alternatives, matched as an ordered
    sequence (one occurrence from any alternative per slot) within
    ``n_slots−1+max_gaps`` consecutive tokens.

    ``filter_ids`` (sorted uint64 doc_ids, e.g. from ``facet_doc_ids``)
    restricts results to that doc set; BM25 statistics stay global (see
    QueryScorer). Composes with every mode."""
    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    if method == "wand_daat":
        from ..state import manifest as _mf

        # fail at the driver, not wrapped inside a Ray worker: the cursor
        # DAAT path reads segments directly and cannot see the exclude set
        if _mf.read_tombstones(out_dir) is not None:
            raise ValueError("an index with tombstones supports wand/brute "
                             "(the cursor DAAT path reads segments directly)")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        # query sets are small: read driver-side and take the Table branch
        # (repartition output can be re-coalesced by size before the map
        # operator, collapsing the stage to one task)
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        # one map task per block: slice the table into one block per batch
        # up-front (from_arrow with a list) — a single-block table would
        # feed the whole pool exactly ONE task, and repartition() output
        # can get re-coalesced by size before the actor operator
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries  # caller-built Dataset: trust its block layout (a
        # count() here would execute the upstream pipeline twice)
    shared_ref = _shared_scorer_state(out_dir, segs)
    version = index_version(out_dir)
    filter_ref = ray.put(np.ascontiguousarray(filter_ids, dtype=np.uint64)) if filter_ids is not None else None
    # stateless tasks + per-worker-process scorer cache: Ray's default
    # workers are long-lived, so repeated query runs reuse warm scorers
    # instead of paying a fresh actor-pool spawn (~2s/actor) per run
    merged = qds.map_batches(
        make_scorer_task_fn(
            out_dir, segs, k, method, shared_ref, version, mode=mode,
            filter_ref=filter_ref, near_window=near_window,
            min_should_match=min_should_match, span_slop=span_slop,
            terms_set_mod=terms_set_mod, max_gaps=max_gaps,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    if resolve_urls:
        merged = merged.map_batches(
            UrlResolver,
            fn_constructor_args=(out_dir,),
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
    return merged


def facet_counts(
    out_dir: str,
    queries,
    facet: str = "lang",
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Per-query FACET COUNTS over the full match set: for each query, the
    number of DISTINCT documents containing ≥1 query term, grouped by a
    docs/-sidecar facet column — the aggregation a search engine renders
    as the facet panel next to top-k results. Returns a Dataset
    (query_id, <facet>, n_docs), facet values ascending within a query.
    Tombstoned docs are excluded (same visibility as query_index).

    Same execution shape as query_index: queries stream through stateless
    map_batches tasks; each worker holds the mmap'd segments plus ONE
    dictionary-encoded facet array (code bytes per doc), cached per
    worker process."""
    from ..stages.query_stage import FacetCountTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        FacetCountTaskFn(out_dir, segs, facet, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def match_counts(
    out_dir: str,
    queries,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """TOTAL HITS per query: the distinct visible docs containing ≥1 query
    term (Lucene totalHits — the count a result page shows next to top-k).
    Returns (query_id, n_hits); empty-match queries emit no row. Same
    stateless-task execution shape as query_index."""
    from ..stages.query_stage import MatchCountTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MatchCountTaskFn(out_dir, segs, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def rare_terms(
    out_dir: str,
    queries,
    max_doc_count: int = 100,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """RARE-TERMS aggregation per query (ES `rare_terms`, the exact
    dictionary-driven variant — see stages.query_stage.RareTerms): the
    vocabulary terms with global df ≤ max_doc_count present in ≥1 matching
    doc, with their matching-doc counts. Returns (query_id, term, n_docs).
    Same stateless-task shape as match_counts."""
    from ..stages.query_stage import RareTermsTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        RareTermsTaskFn(out_dir, segs, max_doc_count, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def function_score_topk(
    out_dir: str,
    queries,
    field: str = "warc_ts",
    origin_us: int = 0,
    scale_us: int = 1,
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """FUNCTION-SCORE retrieval (ES function_score, linear time decay):
    top-k by bm25 × max(0, 1 − |origin − docvalue| / scale). Returns
    (query_id, rank, doc_id, score). Same stateless-task shape as
    query_index; BM25 statistics stay global."""
    from ..stages.query_stage import FunctionScoreTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        FunctionScoreTaskFn(out_dir, segs, field, origin_us, scale_us, k,
                            index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def field_value_factor_topk(
    out_dir: str,
    queries,
    field: str = "doclen",
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """FIELD_VALUE_FACTOR retrieval (ES function_score field_value_factor,
    ln1p modifier): top-k by bm25 × ln(1 + docvalue). Returns
    (query_id, rank, doc_id, score); same stateless-task shape as
    function_score_topk, BM25 statistics stay global."""
    from ..stages.query_stage import FieldValueFactorTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        FieldValueFactorTaskFn(out_dir, segs, field, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def rank_feature_topk(
    out_dir: str,
    queries,
    field: str = "doclen",
    pivot: int = 100,
    weight: float = 2.0,
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """RANK_FEATURE retrieval (ES rank_feature, saturation function, in a
    bool-should next to the match query): top-k by bm25 + weight ×
    f/(f + pivot) over the match set. Returns (query_id, rank, doc_id,
    score); same stateless-task shape as function_score_topk."""
    from ..stages.query_stage import RankFeatureTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        RankFeatureTaskFn(out_dir, segs, field, pivot, weight, k,
                          index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def distance_feature_topk(
    out_dir: str,
    queries,
    field: str = "warc_ts",
    origin_us: int = 0,
    pivot_us: int = 1,
    weight: float = 2.0,
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """DISTANCE_FEATURE retrieval (ES distance_feature on a date field):
    top-k by bm25 + weight × pivot/(pivot + |origin − ts|) over the
    match set. Returns (query_id, rank, doc_id, score); same
    stateless-task shape as function_score_topk."""
    from ..stages.query_stage import DistanceFeatureTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        DistanceFeatureTaskFn(out_dir, segs, field, origin_us, pivot_us,
                              weight, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def combined_fields_topk(
    body_dir: str,
    title_dir: str,
    queries,
    w_title: int = 2,
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """COMBINED_FIELDS retrieval (ES combined_fields / Lucene BM25F with
    integer field weights): top-k by BM25 over merged-field statistics
    (tf' = tf_body + W·tf_title, dl' = dl_body + W·dl_title, combined
    df/avgdl). Returns (query_id, rank, doc_id, score) in body-internal
    doc space; same stateless-task shape as function_score_topk."""
    from ..stages.query_stage import CombinedFieldsTaskFn

    segs = list_segments(body_dir)
    if not segs:
        raise ValueError(f"no segments under {body_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    version = max(index_version(body_dir), index_version(title_dir))
    return qds.map_batches(
        CombinedFieldsTaskFn(body_dir, title_dir, w_title, k, version),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def boosting_topk(
    out_dir: str,
    queries,
    negative_boost: float = 0.5,
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """BOOSTING retrieval (ES ``boosting`` query): positive disjunctive
    BM25, × ``negative_boost`` for docs also matching the negative query
    (demotion, not exclusion). ``queries`` must carry (query_id, text,
    neg) — ``neg`` is the per-query negative clause text. Returns
    (query_id, rank, doc_id, score); same stateless-task shape as
    query_index."""
    from ..stages.query_stage import BoostingTopKTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        BoostingTopKTaskFn(out_dir, segs, negative_boost, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def synonym_topk(
    out_dir: str,
    queries,
    synonyms: dict[str, tuple[str, ...]] | None = None,
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Query-time SYNONYM retrieval (Lucene SynonymQuery semantics): each
    term expands to its synonym group scored as one pseudo-term (merged
    tf, max-df idf). Returns (query_id, rank, doc_id, score)."""
    from ..stages.query_stage import SynonymTopKTaskFn

    syn_t = tuple(sorted((b, tuple(s)) for b, s in (synonyms or {}).items()))
    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        SynonymTopKTaskFn(out_dir, segs, syn_t, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def date_histogram(
    out_dir: str,
    queries,
    field: str = "warc_ts",
    bucket_us: int = 86_400_000_000,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """DATE-HISTOGRAM aggregation per query (ES date_histogram): counts of
    distinct matching visible docs per fixed-width bucket of a numeric
    docvalue. Returns (query_id, bucket, n_docs); bucket = value //
    bucket_us. Same stateless-task shape as match_counts."""
    from ..stages.query_stage import DateHistogramTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        DateHistogramTaskFn(out_dir, segs, field, bucket_us, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def histogram_agg(
    out_dir: str,
    queries,
    field: str = "doclen",
    interval: int = 4,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """HISTOGRAM aggregation + bucket PIPELINE aggregations per query (ES
    `histogram` with min_doc_count=0 + `cumulative_sum` + `derivative`):
    the DENSE bucket series (empty buckets included) of a numeric docvalue
    over each query's match set, each bucket carrying n_docs, the running
    cum_docs and the bucket-over-bucket delta_docs. Returns (query_id,
    bucket, n_docs, cum_docs, delta_docs); bucket = value // interval.
    Same stateless-task shape as date_histogram."""
    from ..stages.query_stage import HistogramPipelineTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        HistogramPipelineTaskFn(out_dir, segs, field, interval, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def top_metrics(
    out_dir: str,
    queries,
    field: str = "warc_ts",
    metric: str = "doclen",
    size: int = 3,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """TOP_METRICS aggregation per query (ES top_metrics): the metric
    docvalue read off the top ``size`` docs of the sort docvalue's
    ordering over the match set. Returns (query_id, rank, sort_val,
    metric_val)."""
    from ..stages.query_stage import TopMetricsTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        TopMetricsTaskFn(out_dir, segs, field, metric, size, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def auto_date_histogram(
    out_dir: str,
    queries,
    field: str = "warc_ts",
    target_buckets: int = 20,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """AUTO-INTERVAL date histogram per query (ES auto_date_histogram):
    the smallest frozen-ladder interval keeping the dense series within
    target_buckets, then the dense counts at that interval. Returns
    (query_id, interval_us, bucket, n_docs)."""
    from ..stages.query_stage import AutoDateHistogramTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        AutoDateHistogramTaskFn(out_dir, segs, field, target_buckets,
                                index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def moving_window_agg(
    out_dir: str,
    queries,
    field: str = "doclen",
    interval: int = 4,
    window: int = 3,
    lag: int = 2,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """MOVING-WINDOW pipeline aggs per query (ES moving_fn sum +
    serial_diff over the dense histogram series). Returns (query_id,
    bucket, n_docs, mov_sum, sdiff). Same stateless-task shape as
    histogram_agg."""
    from ..stages.query_stage import MovingWindowAggTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MovingWindowAggTaskFn(out_dir, segs, field, interval, window, lag,
                              index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def bucket_sort_agg(
    out_dir: str,
    queries,
    field: str = "doclen",
    interval: int = 4,
    min_count: int = 1,
    size: int = 5,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """BUCKET_SELECTOR + BUCKET_SORT per query (ES): histogram buckets
    with n_docs >= min_count, re-ranked (n_docs DESC, bucket ASC), top
    ``size``. Returns (query_id, rank, bucket, n_docs)."""
    from ..stages.query_stage import BucketSortAggTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        BucketSortAggTaskFn(out_dir, segs, field, interval, min_count, size,
                            index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def range_agg(
    out_dir: str,
    queries,
    field: str = "doclen",
    ranges: tuple[tuple[int | None, int | None], ...] = ((None, 128), (128, None)),
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """RANGE aggregation per query (ES ``range``): doc_count + exact int64
    sum of a numeric docvalue per configured half-open [from, to) range —
    every configured range emitted, count-0 and empty match sets
    included. Returns (query_id, range_idx, n_docs, sum_val). Same
    stateless-task shape as date_histogram."""
    from ..stages.query_stage import RangeAggTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        RangeAggTaskFn(out_dir, segs, field, ranges, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def matrix_stats(
    out_dir: str,
    queries,
    field_a: str = "doclen",
    field_b: str = "warc_ts",
    b_off: int = 0,
    b_div: int = 1,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """MATRIX-STATS aggregation per query (ES matrix_stats): exact integer
    sufficient statistics (n, Σa, Σb, Σa², Σb², Σab) of two numeric
    docvalues over the distinct matching visible docs; mean/variance/
    covariance/correlation derive client-side. Same stateless-task shape
    as the other match-set aggregations."""
    from ..stages.query_stage import MatrixStatsTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MatrixStatsTaskFn(out_dir, segs, field_a, field_b, b_off, b_div, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def composite_agg(
    out_dir: str,
    requests,
    facet: str = "lang",
    field: str = "warc_ts",
    bucket_us: int = 250_000_000,
    size: int = 12,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """COMPOSITE aggregation pages (ES composite agg): each input row is a
    page request (query_id, text, after_lang, after_bucket) and yields up
    to ``size`` buckets of the (facet ASC, docvalue-bucket ASC) composite
    key space STRICTLY AFTER the cursor — ("", -1) opens the stream. The
    caller iterates pages by feeding each page's last key back as the next
    cursor (functions/fulltext.composite_agg_query drives the loop). Same
    stateless-task shape as the other match-set aggregations."""
    from ..stages.query_stage import CompositeAggTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(requests, str):
        import pyarrow.parquet as _pq

        requests = _pq.read_table(requests)
    if isinstance(requests, pa.Table):
        n_blocks = max(1, min(conc * 4, requests.num_rows // max(1, batch_size) + 1))
        per = (requests.num_rows + n_blocks - 1) // n_blocks
        slices = [requests.slice(i * per, per) for i in range(n_blocks) if i * per < requests.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = requests
    return qds.map_batches(
        CompositeAggTaskFn(out_dir, segs, facet, field, bucket_us, size, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def matchset_stats(
    out_dir: str,
    queries,
    field: str = "warc_ts",
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """STATS aggregation per query (ES stats agg): (n_docs, min, max, sum)
    of a numeric docvalue over the distinct matching visible docs. Returns
    (query_id, n_docs, min_ts, max_ts, sum_ts); empty matches emit no row."""
    from ..stages.query_stage import MatchsetStatsTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MatchsetStatsTaskFn(out_dir, segs, field, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def matchset_string_stats(
    out_dir: str,
    queries,
    field: str = "text",
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """STRING_STATS aggregation per query (ES string_stats): value-length
    stats + integer-exact character entropy (milli-nats × T) over the
    matching visible docs' ``field`` values. Returns (query_id, n_values,
    min_len, max_len, sum_len, h_milli_t); empty matches emit no row."""
    from ..stages.query_stage import MatchsetStringStatsTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MatchsetStringStatsTaskFn(out_dir, segs, field, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def matchset_mad(
    out_dir: str,
    queries,
    field: str = "doclen",
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """MEDIAN-ABSOLUTE-DEVIATION aggregation per query (ES
    median_absolute_deviation, exact type-1 order statistics). Returns
    (query_id, n_docs, median, mad); empty matches emit no row."""
    from ..stages.query_stage import MatchsetMADTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MatchsetMADTaskFn(out_dir, segs, field, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def multi_terms(
    out_dir: str,
    queries,
    facet: str = "lang",
    field: str = "doclen",
    bucket_width: int = 64,
    k: int = 5,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """MULTI-TERMS aggregation per query (ES multi_terms on the composite
    (facet, field//bucket_width) key): top-k buckets by (count DESC,
    facet ASC, bucket ASC). Returns (query_id, facet, len_bucket,
    n_docs)."""
    from ..stages.query_stage import MultiTermsTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MultiTermsTaskFn(out_dir, segs, facet, field, bucket_width, k,
                         index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def terms_enum(
    out_dir: str,
    prefixes,
    size: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """TERMS-ENUM (ES _terms_enum): per prefix, the first ``size``
    dictionary terms in lexicographic order. Input rows are
    (prefix_id, prefix); returns (prefix_id, rank, term)."""
    from ..stages.query_stage import TermsEnumTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(prefixes, str):
        import pyarrow.parquet as _pq

        prefixes = _pq.read_table(prefixes)
    if isinstance(prefixes, pa.Table):
        n_blocks = max(1, min(conc * 4, prefixes.num_rows // max(1, batch_size) + 1))
        per = (prefixes.num_rows + n_blocks - 1) // n_blocks
        slices = [prefixes.slice(i * per, per) for i in range(n_blocks) if i * per < prefixes.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = prefixes
    return qds.map_batches(
        TermsEnumTaskFn(out_dir, segs, size, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def matchset_extended_stats(
    out_dir: str,
    queries,
    field: str = "doclen",
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """EXTENDED-STATS aggregation per query (ES extended_stats): exact
    integer (n, Σv, Σv², n·Σv²−(Σv)²) over the match set's docvalue.
    Returns (query_id, n_docs, sum, sum_sq, var_num)."""
    from ..stages.query_stage import MatchsetExtendedStatsTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MatchsetExtendedStatsTaskFn(out_dir, segs, field, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def filters_agg(
    out_dir: str,
    queries,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """FILTERS aggregation per query (ES filters agg, other_bucket=true):
    the frozen named buckets short/long/en plus other, all emitted (zeros
    included) for every non-empty match set. Returns
    (query_id, bucket, n_docs)."""
    from ..stages.query_stage import FiltersAggTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        FiltersAggTaskFn(out_dir, segs, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def bucket_script_agg(
    out_dir: str,
    queries,
    share_denom: int = 8,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """``bucket_script`` + ``bucket_selector`` pipeline aggs per query (ES):
    lang-terms buckets over the match set with n_docs/sum_doclen metrics,
    the integer-frozen derived avg_dl_x100, and the scale-free selector
    keeping buckets with ≥ 1/share_denom of the query's matches. Returns
    (query_id, lang, n_docs, sum_doclen, avg_dl_x100)."""
    from ..stages.query_stage import BucketScriptAggTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        BucketScriptAggTaskFn(out_dir, segs, share_denom, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def t_test_agg(
    out_dir: str,
    queries,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """ES ``t_test`` agg (Welch, heteroscedastic) per query: doclen of
    matched docs vs the rest of the live corpus, moments from exact
    integer (n, S, SS) partials, means/t rounded 3dp. Returns
    (query_id, n_match, n_rest, mean_match, mean_rest, t_stat)."""
    from ..stages.query_stage import TTestAggTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        TTestAggTaskFn(out_dir, segs, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def percolate(
    docs,
    queries,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """REVERSE SEARCH (ES percolator): match a STREAM of documents against
    STORED queries (conjunctive: every distinct query term must appear).
    ``docs``: parquet path or Dataset with (doc_id, text); ``queries``:
    pyarrow Table with (query_id, text), compiled once per worker.
    Returns a streaming Dataset of (query_id, doc_id) matches — composes
    with ingest at full backpressure (no index consulted)."""
    from ..stages.query_stage import PercolateTaskFn

    qt = tuple(zip(queries["query_id"].to_pylist(), queries["text"].to_pylist()))
    if isinstance(docs, str):
        ds = ray.data.read_parquet(docs, columns=["doc_id", "text"])
        # single-row-group files would feed the map exactly one task
        ds = ds.repartition(max(2, _cpus() // 2))
    else:
        ds = docs
    return ds.map_batches(
        PercolateTaskFn(qt), batch_format="pyarrow", batch_size=batch_size
    )


def term_stats(
    out_dir: str,
    terms,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """TERM STATISTICS (ES term_statistics): per requested term, global
    visible df and total term frequency (ttf). ``terms``: pyarrow Table /
    Dataset / parquet path with a ``term`` string column. Returns
    (term, df, ttf); OOV terms emit no row."""
    from ..stages.query_stage import TermStatsTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(terms, str):
        import pyarrow.parquet as _pq

        terms = _pq.read_table(terms)
    if isinstance(terms, pa.Table):
        n_blocks = max(1, min(conc * 4, terms.num_rows // max(1, batch_size) + 1))
        per = (terms.num_rows + n_blocks - 1) // n_blocks
        slices = [terms.slice(i * per, per) for i in range(n_blocks) if i * per < terms.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = terms
    return qds.map_batches(
        TermStatsTaskFn(out_dir, segs, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def facet_cardinality(
    out_dir: str,
    queries,
    facet: str = "lang",
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """CARDINALITY aggregation per query (ES cardinality agg): the number
    of distinct facet values among matching visible docs. Returns
    (query_id, n_values); empty matches emit no row."""
    from ..stages.query_stage import FacetCardinalityTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        FacetCardinalityTaskFn(out_dir, segs, facet, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def percentile_ranks(
    out_dir: str,
    queries,
    field: str = "doclen",
    probes: tuple[int, ...] = (20, 40, 60),
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """PERCENTILE-RANKS aggregation per query (ES percentile_ranks,
    exact integer form). Returns (query_id, probe, n_le, n_docs); the ES
    percentage is n_le/n_docs·100 client-side."""
    from ..stages.query_stage import PercentileRanksTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        PercentileRanksTaskFn(out_dir, segs, field, probes, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def matchset_percentiles(
    out_dir: str,
    queries,
    field: str = "warc_ts",
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """PERCENTILES aggregation per query (ES percentiles agg, exact
    type-1 order statistics). Returns (query_id, pct, value)."""
    from ..stages.query_stage import MatchsetPercentilesTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MatchsetPercentilesTaskFn(out_dir, segs, field, tuple(quantiles),
                                  index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def matchset_boxplot(
    out_dir: str,
    queries,
    field: str = "doclen",
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """BOXPLOT aggregation per query (ES boxplot agg, exact integer form).
    Returns (query_id, n_docs, vmin, q1, q2, q3, vmax, n_low_out,
    n_high_out) — five-number summary + Tukey-fence outlier counts."""
    from ..stages.query_stage import MatchsetBoxplotTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MatchsetBoxplotTaskFn(out_dir, segs, field, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def export_matches(
    out_dir: str,
    queries,
    concurrency: int | None = None,
    batch_size: int = 16,
    mode: str = "or",
) -> ray.data.Dataset:
    """SCROLL/EXPORT: the full match set per query as a streaming Dataset
    (query_id, doc_id) — the bulk API that feeds downstream jobs (rescore,
    join, training-set extraction) instead of a result page. Small batch_size:
    each input query can fan out to corpus-scale output rows, and blocks
    stream through the executor with backpressure; consume with
    write_parquet or further map_batches, never take_all.
    ``mode="and"`` exports the conjunctive match set instead (docs
    containing EVERY distinct query term)."""
    from ..stages.query_stage import MatchExportTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        MatchExportTaskFn(out_dir, segs, index_version(out_dir), mode),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def explain_topk(
    out_dir: str,
    queries,
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """EXPLAIN: for each query's top-k hits, one row per (hit, matched
    term) carrying the raw BM25 inputs — (query_id, rank, doc_id, term,
    tf, df, dl). df is the GLOBAL document frequency (summed across the
    term's shards); dl the hit's doclen. Integer-only: idf/contribution/
    score are pure functions of these plus (n_docs, avgdl), so the
    explanation is complete and exactly comparable. Same stateless-task +
    worker-cache execution shape as query_index; output is O(k · terms)
    per query, page-sized."""
    from ..stages.query_stage import ExplainTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        ExplainTaskFn(out_dir, segs, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def rank_eval(
    out_dir: str,
    queries,
    k: int = 10,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """RANK-EVAL: per query, integer IR metrics of the frozen disjunctive
    top-k against the deterministic conjunctive-containment qrel —
    (query_id, n_rel, n_rel_at_k, first_rel_rank); precision@k =
    n_rel_at_k/k, recall@k = n_rel_at_k/n_rel, MRR = 1/first_rel_rank
    (0 ⇒ no relevant hit). One row per input query, OOV ⇒ zeros. Same
    stateless-task + worker-cache execution as query_index."""
    from ..stages.query_stage import RankEvalTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        RankEvalTaskFn(out_dir, segs, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def adjacency_matrix(
    out_dir: str,
    pairs,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """ADJACENCY MATRIX: each input row (pair_id, text_a, text_b) yields
    the two disjunctive match-set sizes and their intersection size —
    (pair_id, n_a, n_b, n_ab), one row per pair, zeros included. Cells
    are independent → embarrassingly parallel; per-worker match sets are
    cached across cells sharing a filter, so an n×n matrix costs n match
    sets + n² sorted-array intersections, never n² postings gathers."""
    from ..stages.query_stage import AdjacencyTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(pairs, str):
        import pyarrow.parquet as _pq

        pairs = _pq.read_table(pairs)
    if isinstance(pairs, pa.Table):
        n_blocks = max(1, min(conc * 4, pairs.num_rows // max(1, batch_size) + 1))
        per = (pairs.num_rows + n_blocks - 1) // n_blocks
        slices = [pairs.slice(i * per, per) for i in range(n_blocks) if i * per < pairs.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = pairs
    return qds.map_batches(
        AdjacencyTaskFn(out_dir, segs, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def suggest_completions(
    out_dir: str,
    queries,
    size: int = 5,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """COMPLETION SUGGESTER: each (query_id, text) prefix expands against
    the sharded term dictionary and returns the top ``size`` completions by
    GLOBAL df (tie: term ASC) as (query_id, rank, term, df). Dictionary-
    only — no postings or corpus scan; a prefix range routes to O(1)
    term-shard holders at cluster scale."""
    from ..stages.query_stage import CompletionTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        CompletionTaskFn(out_dir, segs, size, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def diversified_sampler(
    out_dir: str,
    queries,
    facet: str = "lang",
    sample_size: int = 12,
    max_per_value: int = 3,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """DIVERSIFIED-SAMPLER aggregation per query (ES diversified_sampler
    + terms sub-agg): relevance-ordered sample capped per facet value,
    then facet counts over the sample. Returns (query_id, <facet>,
    n_sample)."""
    from ..stages.query_stage import DiversifiedSamplerTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        DiversifiedSamplerTaskFn(out_dir, segs, facet, sample_size, max_per_value,
                                 index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def collapse_topk(
    out_dir: str,
    queries,
    facet: str = "lang",
    k: int = 5,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """FIELD COLLAPSING (ES ``collapse``): one blended page per query in
    which each facet value appears at most once — the group's best hit
    represents the group, winners re-rank (score DESC, doc_id ASC), top
    k; each hit carries the group's match count. Returns (query_id,
    rank, doc_id, <facet>, n_group, score). Execution shape identical to
    facet_topk."""
    from ..stages.query_stage import CollapseTopKTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        CollapseTopKTaskFn(out_dir, segs, facet, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def facet_topk(
    out_dir: str,
    queries,
    facet: str = "lang",
    k: int = 5,
    concurrency: int | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """GROUPED top-k: for each query, the top-k BM25 hits within every
    facet group (result diversification / field collapsing). Returns a
    Dataset (query_id, <facet>, rank, doc_id, score) — exact per-group
    rankings (the full disjunctive ranking restricted to each group),
    facet values ascending within a query. Execution shape identical to
    query_index (stateless tasks, worker-cached state)."""
    from ..stages.query_stage import FacetTopKTaskFn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        n_blocks = max(1, min(conc * 4, queries.num_rows // max(1, batch_size) + 1))
        per = (queries.num_rows + n_blocks - 1) // n_blocks
        slices = [queries.slice(i * per, per) for i in range(n_blocks) if i * per < queries.num_rows]
        qds = ray.data.from_arrow(slices)
    else:
        qds = queries
    return qds.map_batches(
        FacetTopKTaskFn(out_dir, segs, facet, k, index_version(out_dir)),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def _cpus() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def doc_pids(out_dir: str) -> list[int]:
    """Partition ids present in the docs/ sidecar (sorted)."""
    pids = []
    for f in sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet"))):
        m = re.match(r"pid=(\d+)\.parquet$", os.path.basename(f))
        if m:
            pids.append(int(m.group(1)))
    return pids


@ray.remote
def _mget_fetch(path: str, urls: tuple[str, ...]):
    """One routed point-read: the owning docs/pid file opened with the
    url predicate pushed down to its row groups."""
    import pyarrow.parquet as _pq

    return _pq.read_table(
        path,
        columns=["url", "doc_id", "doclen", "lang", "warc_ts"],
        filters=[("url", "in", list(urls))],
    )


def mget(out_dir: str, urls) -> pa.Table:
    """GET / _mget: routed point fetch of stored fields + docvalues by
    url (the user-facing document id). Routing replays the build's
    partitioner — pid = blake2b64(normalize_url(url)) % P, P from
    stats.json — so each lookup opens ONLY its owning base docs/pid file
    (the ES ``shard = hash(routing) % num_shards`` formula); delta
    generations (pids ≥ P, bounded by delta size) are scanned too, since
    their pid offsets are not url-derivable. Tombstoned docs report
    found=false (a GET after delete misses, pre-compaction); if a url is
    somehow visible in several generations the newest wins (warc_ts,
    then doc_id — the dedup rule). One Ray task per touched file, merged
    url-ascending. Output (url, found, doclen, lang, warc_ts); misses
    carry found=false and zero/empty fields so the row set is total."""
    from ..partition import normalize_url, partition_ids

    urls = [normalize_url(u) for u in urls]
    stats = mf.read_stats(out_dir)
    P = int(stats.get("num_partitions") or stats.get("P"))
    pids = partition_ids(urls, P)
    by_pid: dict[int, list[str]] = {}
    for u, p in zip(urls, pids):
        by_pid.setdefault(int(p), []).append(u)
    all_pids = doc_pids(out_dir)
    refs = []
    for pid in all_pids:
        if pid < P and pid not in by_pid:
            continue  # routed: base files for unrequested pids never open
        want = tuple(sorted(by_pid.get(pid, []))) if pid < P else tuple(sorted(urls))
        from ..stages.dedup_stage import docs_path

        refs.append(_mget_fetch.remote(docs_path(out_dir, pid), want))
    tables = [t for t in ray.get(refs) if t.num_rows] if refs else []
    found: dict[str, tuple[int, int, int, str]] = {}
    for t in tables:
        for u, d, dl, lg, ts in zip(
            t["url"].to_pylist(), t["doc_id"].to_pylist(), t["doclen"].to_pylist(),
            t["lang"].to_pylist(), t["warc_ts"].to_pylist(),
        ):
            prev = found.get(u)
            if prev is None or (ts, d) > (prev[0], prev[1]):
                found[u] = (int(ts), int(d), int(dl), lg)
    tomb = mf.read_tombstones(out_dir)
    if tomb is not None:
        import numpy as _np

        for u in list(found):
            d = _np.uint64(found[u][1])
            pos = _np.searchsorted(tomb, d)
            if pos < len(tomb) and tomb[pos] == d:
                del found[u]
    rows = []
    for u in sorted(set(urls)):
        if u in found:
            ts, d, dl, lg = found[u]
            rows.append((u, True, dl, lg, ts))
        else:
            rows.append((u, False, 0, "", 0))
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "found": pa.array([r[1] for r in rows], pa.bool_()),
            "doclen": pa.array([r[2] for r in rows], pa.int64()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "warc_ts": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


@ray.remote
class _ServeScorer:
    """Standing scorer actor for the serving pool: holds the importable
    scorer fn; the QueryScorer builds once in THIS process (the fn's
    worker-process cache) and stays warm across calls."""

    def __init__(self, fn):
        self.fn = fn

    def score(self, tbl: pa.Table) -> pa.Table:
        return self.fn(tbl)


_SERVE_POOLS: dict = {}


def start_serving(out_dir: str, k: int = 10, method: str = "wand",
                  n_actors: int | None = None,
                  n_ranges: int | None = None, mode: str = "or") -> list:
    """Spin (or reuse) a STANDING scorer-actor pool for ``out_dir`` — the
    architecture a search engine actually serves from: shards stay open,
    state stays hot, a query answers in one actor round-trip instead of a
    fresh Dataset pipeline launch (~1s fixed, the measured cap on per-call
    QPS — BENCH/BASELINE.md). Idempotent per (out_dir, version, k, method,
    n, n_ranges, mode) — every query_index retrieval ``mode`` (and/phrase/
    near/msm/spans/…) serves from its own pool, the per-doc semantics are
    unchanged; a rebuilt index (new version) evicts the stale pool.
    The pool is primed so the first served batch pays no scorer
    construction.

    ``n_ranges``: the CLUSTER-shape pool — the doc space splits into
    contiguous pid ranges (the query_index_doc_sharded bound: each range
    actor loads ONLY its partitions' doclens, memory ∝ range size) and
    every range gets its own actor sub-pool; serve_queries fans each
    query batch to one actor per range and merges the k-sized partials
    under the frozen order. None = one full-state range (single-node
    shape). Returns a list of range sub-pools (flat case: one)."""
    from ..partition import DOC_ID_PARTITION_SHIFT
    from ..stages.query_stage import make_scorer_task_fn

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    version = index_version(out_dir)
    n = n_actors or max(1, _cpus())
    key = (out_dir, version, k, method, n, n_ranges, mode)
    pool = _SERVE_POOLS.get(key)
    if pool is not None:
        return pool
    for stale in [k_ for k_ in _SERVE_POOLS if k_[0] == out_dir and k_[1] < version]:
        for sub in _SERVE_POOLS.pop(stale):
            for a in sub:
                ray.kill(a)
    if n_ranges is None:
        fns = [make_scorer_task_fn(out_dir, segs, k, method,
                                   _shared_scorer_state(out_dir, segs), version,
                                   mode=mode)]
    else:
        pids = doc_pids(out_dir)
        groups = [list(g) for g in np.array_split(np.array(pids),
                                                  min(n_ranges, len(pids))) if len(g)]
        fns = []
        for g in groups:
            lo = int(g[0]) << DOC_ID_PARTITION_SHIFT
            hi = (int(g[-1]) + 1) << DOC_ID_PARTITION_SHIFT
            # shared_ref None: the range bound on state IS the point
            fns.append(make_scorer_task_fn(out_dir, segs, k, method, None,
                                           version, doc_range=(lo, hi),
                                           pids=[int(p) for p in g], mode=mode))
    per = max(1, n // len(fns))
    pool = [[_ServeScorer.remote(fn) for _ in range(per)] for fn in fns]
    tiny = pa.table({"query_id": pa.array([0], pa.int64()),
                     "text": pa.array(["the"], pa.string())})
    ray.get([a.score.remote(tiny) for sub in pool for a in sub])
    _SERVE_POOLS[key] = pool
    return pool


def stop_serving(out_dir: str | None = None) -> None:
    """Kill serving pools (all, or those of one index)."""
    for key in [k_ for k_ in _SERVE_POOLS if out_dir is None or k_[0] == out_dir]:
        for sub in _SERVE_POOLS.pop(key):
            for a in sub:
                ray.kill(a)


def serve_queries(out_dir: str, queries, k: int = 10, method: str = "wand",
                  n_actors: int | None = None, batch_size: int = 256,
                  n_ranges: int | None = None, mode: str = "or"):
    """Answer a query table from the standing pool (start_serving):
    round-robin slices → concurrent actor round-trips → one concat.
    Bit-identical to ``query_index(..., resolve_urls=False)`` (same
    scorer fn, same frozen order; pinned by test) — only the dispatch
    differs. With ``n_ranges`` every slice fans to one actor per doc
    range and the k-sized per-range partials merge under (score DESC,
    doc_id ASC) — exact, the query_index_doc_sharded argument: each doc
    is scored wholly inside one range with global df/idf. Returns a
    pandas DataFrame (query_id, rank, doc_id, score) sorted by
    (query_id, rank)."""
    import pandas as pd

    pool = start_serving(out_dir, k, method, n_actors, n_ranges, mode)
    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    n = queries.num_rows
    if n == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int32"),
                             "doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    futs = [
        sub[i % len(sub)].score.remote(queries.slice(off, batch_size))
        for i, off in enumerate(range(0, n, batch_size))
        for sub in pool
    ]
    out = pa.concat_tables(ray.get(futs)).to_pandas()
    if len(pool) > 1:
        # per-range partials: re-take the global top-k under the frozen
        # order (merge input is queries × ranges × k — right-sized)
        out = out.sort_values(["query_id", "score", "doc_id"],
                              ascending=[True, False, True], kind="mergesort")
        out = out.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        out["rank"] = (out.groupby("query_id", sort=False).cumcount() + 1).astype(
            out["rank"].dtype
        )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def query_index_doc_sharded(
    out_dir: str,
    queries,
    n_ranges: int = 4,
    k: int = 10,
    method: str = "wand",
    batch_size: int = 64,
):
    """Top-k BM25 with DOC-RANGE-SHARDED scorer state — the cluster-shape
    path (SCALE.md: at 10^12 docs the ~5 TB doclen sidecar cannot live in
    every scorer; each node holds only the doc ranges it serves).

    The docID scheme (pid<<40 | row) makes pid groups contiguous docID
    ranges: each range scorer loads ONLY its partitions' doclens
    (DoclenTable(pids=...), memory ∝ range size — asserted by test) and
    scores every query over doc_ids in [lo, hi) with GLOBAL df/idf, so
    each document is scored completely inside exactly one range. The
    per-range partial top-k tables (≤ k rows per query per range) merge
    under the frozen (score DESC, doc_id ASC) order — EXACT, bit-identical
    to the full-corpus scorer, unlike per-term-segment top-k (SURVEY §8.3).

    Returns a pandas DataFrame (query_id, rank, doc_id, score): the merge
    input is final-answer-sized (queries × n_ranges × k rows), so a driver
    merge is right-sized even at cluster scale.

    All ranges execute CONCURRENTLY in one union pipeline (round 4):
    warm-cache wall for 4 ranges ≈ one range's pipeline cost (~0.11s on
    the 500-doc verify fixture), where the old per-range .to_pandas()
    loop paid the fixed pipeline launch serially per range."""
    import pandas as pd
    from ..partition import DOC_ID_PARTITION_SHIFT

    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    pids = doc_pids(out_dir)
    if not pids:
        raise ValueError(f"no docs/pid=*.parquet under {out_dir}")
    groups = [list(g) for g in np.array_split(np.array(pids), min(n_ranges, len(pids))) if len(g)]
    version = index_version(out_dir)

    if isinstance(queries, str):
        import pyarrow.parquet as _pq

        queries = _pq.read_table(queries)
    if isinstance(queries, pa.Table):
        qds = ray.data.from_arrow(queries)
    else:
        qds = queries

    from ..stages.query_stage import make_scorer_task_fn as _mk

    range_ds = []
    for g in groups:
        lo = int(g[0]) << DOC_ID_PARTITION_SHIFT
        hi = (int(g[-1]) + 1) << DOC_ID_PARTITION_SHIFT
        # shared_ref deliberately None: the point of this path is that a
        # scorer's state is bounded by its doc range, not a full-corpus
        # shared copy
        fn = _mk(out_dir, segs, k, method, None, version, doc_range=(lo, hi), pids=[int(p) for p in g])
        range_ds.append(qds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size))
    # ONE pipeline over the union: every range's scorer tasks run
    # concurrently (round 4; the old per-range .to_pandas() loop executed
    # ranges serially, hiding the latency win the sharding exists for)
    merged_ds = range_ds[0] if len(range_ds) == 1 else range_ds[0].union(*range_ds[1:])
    allp = merged_ds.to_pandas()
    if allp.empty:
        return allp
    allp = allp.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True], kind="mergesort"
    )
    merged = allp.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    merged["rank"] = merged.groupby("query_id", sort=False).cumcount().astype("int32") + 1
    return merged[["query_id", "rank", "doc_id", "score"]]
