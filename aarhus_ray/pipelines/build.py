"""build_index — the end-to-end index build (SURVEY.md §3.1).

    read_parquet(pages)                      # pruned columns, many blocks
      → map_batches(prep)                    # url normalize, lang filter, pid tag
      → map_batches(ExtractUDF, actor pool)  # html→text, html DROPPED pre-shuffle
      → groupby(pid).map_groups(DedupAssignWriter)   # all-to-all #1 (url hash)
           writes docs/pid=NNNN.parquet (checkpoint) + manifest rows
    stats: folded from dedup manifest rows (no extra Ray job)
    plan:  term boundaries + heavy set from a deterministic doc sample
    read_parquet(docs)                       # doc_id + text only
      → map_batches(PostingsEncoder, actor pool)     # encoded partials
      → groupby(bucket).map_groups(AssembleSegment)  # all-to-all #2: ONE
           salted (term-range × docID-salt) shuffle; writes
           segments/seg=BBBB/ shard (checkpoint) + manifest rows

Resume (BASELINE.json:6 "resumable from checkpoint"): each phase skips units
with valid manifest entries; phase markers short-circuit whole phases; a
config/code-version hash in stats.json refuses to resume across drift.

Library code never calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..sources.pages import read_pages
from ..stages.extract_stage import ExtractUDF, prep_batch_fn
from ..stages.dedup_stage import DedupAssignWriter, docs_path
from ..stages.postings_stage import AssembleSegment, PostingsEncoder
from ..stages.postings_stage import seg_dir as seg_dir_path
from ..state import manifest as mf
from ..textnorm import tokenize_batch

PHASE_A_MARKER = "_DOCS_DONE"
INDEX_MARKER = "_INDEX_DONE"


def _phase_log(msg: str) -> None:
    """Phase timing to stderr when AARHUS_BUILD_TIMING=1 (debug/bench aid)."""
    if os.environ.get("AARHUS_BUILD_TIMING"):
        import sys
        import time

        print(f"[build {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _cpus() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _plan_terms(out_dir: str, num_segments: int, sample_docs: int, heavy_df_frac: float):
    """Deterministic segment boundaries + heavy-term set from a corpus
    sample (first `sample_docs` docs in pid/file order — stable for a given
    corpus + P). Boundaries are occurrence-weighted quantiles so segments
    balance posting BYTES, not term counts (SURVEY.md §4.2)."""
    files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
    texts: list[str] = []
    for f in files:
        if len(texts) >= sample_docs:
            break
        texts.extend(pq.read_table(f, columns=["text"])["text"].to_pylist())
    texts = texts[:sample_docs]
    toks = tokenize_batch(texts)
    n_sample = max(1, len(texts))
    df_counts: dict[str, int] = {}
    all_occ: list[str] = []
    for ts in toks:
        all_occ.extend(ts)
        for t in set(ts):
            df_counts[t] = df_counts.get(t, 0) + 1
    heavy = sorted(t for t, c in df_counts.items() if c / n_sample >= heavy_df_frac)
    occ = np.sort(np.asarray(all_occ, dtype=object)) if all_occ else np.empty(0, object)
    bounds: list[str] = []
    for i in range(1, num_segments):
        if len(occ) == 0:
            break
        b = str(occ[min(len(occ) - 1, i * len(occ) // num_segments)])
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return bounds, heavy


def build_index(
    input_path: str,
    out_dir: str,
    *,
    num_partitions: int = 8,
    num_segments: int = 2,
    n_salts: int = 4,
    n_shards: int | None = None,
    langs: tuple[str, ...] | None = None,
    resume: bool = False,
    sample_docs: int = 2000,
    heavy_df_frac: float = 0.05,
    extract_batch_size: int = 256,
    postings_batch_size: int = 1024,
    concurrency: int | None = None,
) -> dict:
    """Build the inverted index; returns the stats dict."""
    cpus = concurrency or _cpus()
    cfg = {
        "P": num_partitions,
        "S": num_segments,
        "n_salts": n_salts,
        "langs": sorted(langs) if langs else None,
    }
    if os.path.isdir(out_dir):
        if resume:
            if os.path.exists(os.path.join(out_dir, "stats.json")) and not mf.check_resume_compatible(out_dir, cfg):
                raise ValueError(
                    "resume=True but existing index config/code-version differs; "
                    "rebuild with resume=False"
                )
        else:
            shutil.rmtree(out_dir)
    os.makedirs(os.path.join(out_dir, "docs"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)

    if resume and os.path.exists(os.path.join(out_dir, INDEX_MARKER)):
        return mf.read_stats(out_dir)

    import time as _time

    _t0 = _time.perf_counter()
    # ---- Phase A: extract → url-hash shuffle → dedup/doc_id → docs/ ----
    if not (resume and os.path.exists(os.path.join(out_dir, PHASE_A_MARKER))):
        # resume trusts a docs partition only if its artifact still matches
        # the manifest checksum (lineage integrity, BASELINE.json:6)
        done_pids = (
            mf.completed_units(
                out_dir,
                "docs",
                verify=True,
                paths={p: docs_path(out_dir, p) for p in range(num_partitions)},
            )
            if resume
            else set()
        )
        ds = read_pages(input_path)
        prep = prep_batch_fn(langs, num_partitions)
        if done_pids:
            skip = pa.array(sorted(done_pids), pa.uint32())

            def prep_skip(batch: pa.Table, _prep=prep, _skip=skip) -> pa.Table:
                import pyarrow.compute as pc

                out = _prep(batch)
                return out.filter(pc.invert(pc.is_in(out["pid"], value_set=_skip)))

            ds = ds.map_batches(prep_skip, batch_format="pyarrow")
        else:
            ds = ds.map_batches(prep, batch_format="pyarrow")
        ds = ds.map_batches(
            ExtractUDF,
            batch_format="pyarrow",
            batch_size=extract_batch_size,
            # pre-warm half the pool: autoscaling from 1 costs seconds of ramp
            concurrency=(max(1, cpus // 2), cpus),
        )
        manifest_rows = ds.groupby("pid").map_groups(
            DedupAssignWriter(out_dir), batch_format="pyarrow"
        )
        manifest_rows.count()  # execute; rows are tiny and land in manifest.jsonl
        with open(os.path.join(out_dir, PHASE_A_MARKER), "w") as f:
            f.write("done\n")
    _phase_log(f"phase A (extract+dedup) {_time.perf_counter() - _t0:.1f}s")
    _t0 = _time.perf_counter()

    docs_glob = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
    if not docs_glob:
        raise ValueError(f"no documents survived the build from {input_path}")

    # ---- Phase B: global stats. The dedup stage already recorded per-pid
    # row counts and doclen sums in its manifest rows (partial aggregation
    # at the source), so stats are a manifest fold — no extra Ray job.
    # Fallback to a Ray aggregate if resuming an index whose manifest
    # predates doclen_sum.
    docs_rows = [r for r in mf.read_manifest(out_dir) if r["stage"] == "docs" and r["status"] == "done"]
    seen_pids = set()
    n_docs = total_len = 0
    # manifest.jsonl is append-only: the LAST row per partition is
    # authoritative (a rebuilt partition appends a fresh row)
    for r in reversed(docs_rows):
        if r["partition_id"] in seen_pids:
            continue
        seen_pids.add(r["partition_id"])
        n_docs += int(r["output_rows"])
        total_len += int(r.get("doclen_sum", -1))
    if not docs_rows or any("doclen_sum" not in r for r in docs_rows):
        doclen_ds = ray.data.read_parquet(docs_glob, columns=["doclen"])
        agg = doclen_ds.aggregate(Count(), Sum("doclen"))
        n_docs = int(agg["count()"])
        total_len = int(agg["sum(doclen)"] or 0)
    avgdl = (total_len / n_docs) if n_docs else 0.0

    _phase_log(f"phase B (stats) {_time.perf_counter() - _t0:.1f}s")
    _t0 = _time.perf_counter()
    # ---- Phase C: segment/skew plan + stats.json ----
    boundaries, heavy = _plan_terms(out_dir, num_segments, sample_docs, heavy_df_frac)
    _phase_log(f"phase C (plan) {_time.perf_counter() - _t0:.1f}s")
    _t0 = _time.perf_counter()
    stats = {
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": avgdl,
        "num_partitions": num_partitions,
        "num_segments": len(boundaries) + 1,
        "n_salts": n_salts,
        "boundaries": boundaries,
        "heavy_terms": heavy,
        **cfg,
    }
    mf.write_stats(out_dir, stats)

    # ---- Phase D: partials → ONE salted (term-range × docID-range) shuffle.
    # The reducer unit is the (seg_id, salt) shard, so the heaviest term's
    # merge work spreads over n_salts tasks and no separate premerge
    # stage/shuffle is needed (SURVEY.md §4.2, evolved).
    n_buckets = (len(boundaries) + 1) * max(1, n_salts)
    done_segs = (
        tuple(
            mf.completed_units(
                out_dir,
                "segment",
                verify=True,
                paths={
                    b: os.path.join(seg_dir_path(out_dir, b), "postings.bin")
                    for b in range(n_buckets)
                },
            )
        )
        if resume
        else ()
    )
    docs_ds = ray.data.read_parquet(docs_glob, columns=["doc_id", "text"])
    partials = docs_ds.map_batches(
        PostingsEncoder,
        fn_constructor_args=(boundaries, heavy, num_partitions, n_salts),
        batch_format="pyarrow",
        batch_size=postings_batch_size,
        concurrency=(max(1, cpus // 2), cpus),
    )
    seg_manifest = partials.groupby("bucket").map_groups(
        AssembleSegment(out_dir, n_docs, done_segs), batch_format="pyarrow"
    )
    rows = seg_manifest.take_all()
    _phase_log(f"phase D (postings+merge+segments) {_time.perf_counter() - _t0:.1f}s")

    # ---- finalize: metrics mirror + marker ----
    man = mf.read_manifest(out_dir)
    if man:
        pq.write_table(pa.Table.from_pylist(man), os.path.join(out_dir, "metrics.parquet"))
    with open(os.path.join(out_dir, INDEX_MARKER), "w") as f:
        f.write(f"segments={len(rows)}\n")
    return stats
