"""query_index — top-k BM25 over a built index (SURVEY.md §3.2).

    queries → map_batches(QueryScorer actor pool)   # replicas; each query
                                                    # scored once, completely
            → map_batches(UrlResolver)              # partition-pruned lookup

The index is TERM-sharded (segments = disjoint term ranges), so each scorer
actor maps ALL segments (mmap — replicas on a node share page cache) and
gathers a query's term cursors from their owning segments before running a
single Block-Max WAND. Per-segment top-k + merge would be WRONG here: it
splits a document's score across segments whenever a query's terms straddle
a term-range boundary (caught by the DuckDB oracle; see QueryScorer
docstring). Results carry the frozen order (score DESC, doc_id ASC) with
1-based ranks.
"""

from __future__ import annotations

import glob
import os
import re

import pyarrow as pa
import ray
import ray.data

from ..stages.query_stage import QueryScorer, UrlResolver
from ..state import manifest as mf


def list_segments(out_dir: str) -> list[int]:
    segs = []
    for p in sorted(glob.glob(os.path.join(out_dir, "segments", "seg=*"))):
        m = re.match(r"seg=(\d+)$", os.path.basename(p))
        if m and os.path.isdir(p):
            segs.append(int(m.group(1)))
    return segs


def query_index(
    out_dir: str,
    queries,
    k: int = 10,
    method: str = "wand",
    concurrency: int | None = None,
    batch_size: int = 64,
    resolve_urls: bool = True,
) -> ray.data.Dataset:
    """queries: parquet path | ray Dataset | pyarrow Table with
    (query_id:int64, text:string). Returns a Dataset
    (query_id, rank, doc_id[, url], score)."""
    if isinstance(queries, str):
        qds = ray.data.read_parquet(queries)
    elif isinstance(queries, pa.Table):
        qds = ray.data.from_arrow(queries)
    else:
        qds = queries
    segs = list_segments(out_dir)
    if not segs:
        raise ValueError(f"no segments under {out_dir}")
    conc = concurrency or max(1, _cpus())
    merged = qds.map_batches(
        QueryScorer,
        fn_constructor_args=(out_dir, segs, k, method),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, conc),
    )
    if resolve_urls:
        merged = merged.map_batches(
            UrlResolver,
            fn_constructor_args=(out_dir,),
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
    return merged


def _cpus() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8
