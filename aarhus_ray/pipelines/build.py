"""build_index — the end-to-end index build (SURVEY.md §3.1, §8).

Fresh build = ONE streaming DAG with exactly two all-to-alls:

    read_parquet(pages)                      # pruned columns, many blocks
      → map_batches(prep)                    # url normalize, lang filter, pid tag
      → map_batches(ExtractUDF, actor pool)  # html→text, html DROPPED pre-shuffle
      → groupby(pid).map_groups(DedupAssignWriter+PostingsEncoder)
           # all-to-all #1 (url hash): dedup, doc_ids, docs/pid=NNNN.parquet
           # checkpoint written as a side effect, encoded partials emitted
      → groupby(bucket).map_groups(AssembleSegment)
           # all-to-all #2: ONE salted (term-range × docID-salt) shuffle;
           # writes segments/seg=BBBB/ shards (checkpoint) + manifest rows

Global stats (N, avgdl) fold from the dedup manifest rows; the segment/skew
plan (term boundaries + heavy set) comes from a deterministic driver-side
sample of the INPUT and is persisted to plan.json so resumes reuse it.

Resume from a partially built index switches to the two-phase path (finish
docs/ for missing pids, then re-derive partials by reading docs/ back) —
checkpoint artifacts are trusted only when they match their manifest
checksums; stats.json's config + code-version hash refuses to resume across
drift.

Library code never calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..extract import extract_text
from ..sources.pages import read_pages
from ..stages.extract_stage import ExtractUDF, prep_batch_fn
from ..stages.dedup_stage import DedupAssignWriter, docs_path
from ..stages.postings_stage import AssembleSegment, PostingsEncoder
from ..stages.postings_stage import seg_dir as seg_dir_path
from ..state import manifest as mf

PHASE_A_MARKER = "_DOCS_DONE"
INDEX_MARKER = "_INDEX_DONE"


def _after_disk_phase1() -> None:
    """No-op seam between the disk-exchange map-out barrier and assembly;
    tests monkeypatch it to inject a crash and exercise resume."""


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


def _term_stats_from_texts(texts: list[str]) -> pa.Table:
    """Per-term (occ, df) stats of a text slice — the mergeable partial the
    plan is computed from. Vectorized: tokenize_flat + Arrow group_by."""
    from ..textnorm import tokenize_flat

    ids = np.arange(len(texts), dtype=np.uint64)
    flat, fd, _counts = tokenize_flat(pa.array(texts, pa.string()), ids)
    if len(flat) == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "occ": pa.array([], pa.int64()),
                         "df": pa.array([], pa.int64())})
    tb = pa.table({"term": flat, "doc": pa.array(fd, pa.uint64())})
    per_doc = (
        tb.group_by(["term", "doc"], use_threads=False)
        .aggregate([("doc", "count")])
    )
    agg = (
        per_doc.group_by(["term"], use_threads=False)
        .aggregate([("doc_count", "sum"), ("doc", "count")])
    )
    return pa.table(
        {
            "term": agg["term"],
            "occ": agg["doc_count_sum"].cast(pa.int64()),
            "df": agg["doc_count"].cast(pa.int64()),
        }
    )


def _plan_from_term_stats(stats: pa.Table, n_sample: int, num_segments: int, heavy_df_frac: float):
    """Boundaries (DF-weighted term quantiles) + heavy set, from merged
    per-term (occ, df) stats.

    df mass — not occurrence mass — is the right balance objective:
    postings bytes, merge partial-row counts and segment-assembly wall
    are all ∝ Σ df per range, while occurrences over-weight high-tf head
    terms that a quantile cut cannot split anyway. Round-4 measurement
    on the bench corpus: occ-balanced ranges spread 0.5–22.4 MB of
    postings (42×, one collapsed boundary); df-balanced ranges land
    within 2× (4.6–9.3 MB) with perfectly even per-range df. Sampled df
    is ∝ true df in expectation, so the 2000-doc sample estimates the
    quantiles directly.

    Equivalent to picking positions i·total/num_segments in the
    df-sorted flat (term per containing doc) array: term-sorted
    cumulative df counts are exactly that array's run boundaries, so
    searchsorted(cum, pos, 'right') lands on the identical term
    (ASCII tokens → Arrow bytewise order == Python codepoint order).
    Verified by tests/test_pipeline.py::test_plan_distributed_equals_serial."""
    import pyarrow.compute as pc

    if len(stats) == 0:
        return [], []
    n_sample = max(1, n_sample)
    merged = stats.group_by(["term"], use_threads=False).aggregate([("occ", "sum"), ("df", "sum")])
    heavy = sorted(
        t
        for t, c in zip(merged["term"].to_pylist(), merged["df_sum"].to_pylist())
        if c / n_sample >= heavy_df_frac
    )
    order = pc.array_sort_indices(merged["term"].combine_chunks())
    terms_sorted = pc.take(merged["term"], order)
    occ_sorted = pc.take(merged["df_sum"], order).to_numpy(zero_copy_only=False)
    cum = np.cumsum(occ_sorted)
    total = int(cum[-1])
    bounds: list[str] = []
    for i in range(1, num_segments):
        p = min(total - 1, i * total // num_segments)
        ti = int(np.searchsorted(cum, p, side="right"))
        b = terms_sorted[ti].as_py()
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return bounds, heavy


def _plan_from_texts(texts: list[str], num_segments: int, heavy_df_frac: float):
    """Plan from a driver-resident text sample (resume-from-docs path)."""
    return _plan_from_term_stats(
        _term_stats_from_texts(texts), len(texts), num_segments, heavy_df_frac
    )


@ray.remote
def _sample_term_stats(path: str, row_group: int, take: int) -> pa.Table:
    """One plan-sample shard: extract + tokenize one row group's first
    ``take`` rows, return its per-term (occ, df) partial."""
    col = pq.ParquetFile(path).read_row_group(row_group, columns=["html"])["html"]
    texts = [extract_text(h) for h in col.to_pylist()[:take]]
    return _term_stats_from_texts(texts)


def _plan_terms_from_pages(input_path: str, num_segments: int, sample_docs: int, heavy_df_frac: float):
    """Deterministic plan from the INPUT corpus: first `sample_docs` rows in
    file order — membership fixed by parquet metadata alone, extraction and
    term-stat partials DISTRIBUTED over one Ray task per row group (round 3;
    the serial driver-side extract was a fixed tail that capped build
    scaling). The driver merges only per-term partials (sample-vocabulary
    sized). At cluster scale the same shape becomes a per-partition
    reservoir sample (SCALE.md §2)."""
    paths = [input_path]
    if os.path.isdir(input_path):
        paths = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    shards: list[tuple[str, int, int]] = []
    remaining = sample_docs
    for p in paths:
        if remaining <= 0:
            break
        pf = pq.ParquetFile(p)  # metadata only — no row scan
        for rg in range(pf.num_row_groups):
            if remaining <= 0:
                break
            n = min(remaining, pf.metadata.row_group(rg).num_rows)
            shards.append((p, rg, n))
            remaining -= n
    n_sample = sample_docs - remaining
    refs = [_sample_term_stats.remote(p, rg, n) for p, rg, n in shards]
    parts = [t for t in ray.get(refs) if len(t)]
    if not parts:
        return [], []
    return _plan_from_term_stats(
        pa.concat_tables(parts), n_sample, num_segments, heavy_df_frac
    )


def _plan_terms_from_docs(out_dir: str, num_segments: int, sample_docs: int, heavy_df_frac: float):
    """Legacy resume fallback: plan from the docs/ checkpoint."""
    files = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
    texts: list[str] = []
    for f in files:
        if len(texts) >= sample_docs:
            break
        texts.extend(pq.read_table(f, columns=["text"])["text"].to_pylist())
    return _plan_from_texts(texts[:sample_docs], num_segments, heavy_df_frac)


def _load_or_make_plan(out_dir, input_path, num_segments, sample_docs, heavy_df_frac, from_docs):
    """The plan defines the segment layout, so a resume MUST reuse the
    original one — it is persisted to plan.json the first time."""
    plan_path = os.path.join(out_dir, "plan.json")
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            plan = json.load(f)
        return plan["boundaries"], plan["heavy_terms"]
    if from_docs:
        bounds, heavy = _plan_terms_from_docs(out_dir, num_segments, sample_docs, heavy_df_frac)
    else:
        bounds, heavy = _plan_terms_from_pages(input_path, num_segments, sample_docs, heavy_df_frac)
    mf.atomic_write_bytes(
        plan_path, json.dumps({"boundaries": bounds, "heavy_terms": heavy}).encode()
    )
    return bounds, heavy


def build_index(
    input_path: str,
    out_dir: str,
    *,
    num_partitions: int = 8,
    num_segments: int = 2,
    n_salts: int = 4,
    langs: tuple[str, ...] | None = None,
    resume: bool = False,
    sample_docs: int = 2000,
    heavy_df_frac: float = 0.05,
    extract_batch_size: int = 256,
    postings_batch_size: int = 1024,
    concurrency: int | None = None,
    pid_offset: int = 0,
    positions: bool = False,
    exchange: str | None = None,
) -> dict:
    """Build the inverted index; returns the stats dict.

    ``pid_offset`` shifts every partition id (and therefore every doc_id =
    pid<<40 | row) by a fixed amount — used by incremental delta builds
    (pipelines/maintain.py) so a generation's doc space is disjoint from
    and above the base index's.

    ``positions=True`` adds the positional sidecar (segments/*/pos.bin +
    dict pos offsets): per posting, within-doc token positions as
    self-delimiting varints that merge by the same ordered concat as the
    docID blobs. Costs ~1 byte/token of extra shuffle + storage (the
    standard positional-index overhead); enables index-native phrase
    matching (no checkpoint re-tokenization at query time). Default off —
    the default index layout stays byte-identical to the goldens.

    ``exchange`` picks the fused path's partial→segment exchange:
    ``"disk"`` (default) writes per-pid map-output IPC files (one record
    batch per bucket, bucket index in the footer) and assembles each
    bucket from random-access reads — no object-store sort-shuffle, and
    the partials directory doubles as a resumable shuffle checkpoint
    (measured at the 100k-page bench config: 10.9-11.4s sort vs
    8.4-8.7s disk, interleaved pairs); ``"sort"`` keeps the
    groupby("bucket") sort-shuffle (the path a multi-node object store
    with locality-aware reduce placement would prefer when map outputs
    can't land on shared storage). Segments are byte-identical either
    way (verified at fixture and bench scale). Env AARHUS_BUILD_EXCHANGE
    overrides the default; deliberately NOT in cfg.json — it changes
    nothing the resume drift guard protects."""
    cpus = concurrency or _cpus()
    if exchange is None:
        exchange = os.environ.get("AARHUS_BUILD_EXCHANGE", "disk")
    if exchange not in ("sort", "disk"):
        raise ValueError(f"exchange must be 'sort' or 'disk', got {exchange!r}")
    cfg = {
        "P": num_partitions,
        "S": num_segments,
        "n_salts": n_salts,
        "langs": sorted(langs) if langs else None,
    }
    if positions:
        cfg["positions"] = True
    if pid_offset:
        cfg["pid_offset"] = pid_offset
    if os.path.isdir(out_dir):
        if resume:
            # cfg.json is written at BUILD START (stats.json only lands at
            # the end), so a crash mid-build still leaves the drift guard
            cfg_path = os.path.join(out_dir, "cfg.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    old = json.load(f)
                if old != {**cfg, "code_version": mf.code_version_hash()}:
                    raise ValueError(
                        "resume=True but existing index config/code-version "
                        "differs; rebuild with resume=False"
                    )
            elif os.path.exists(os.path.join(out_dir, "stats.json")) and not mf.check_resume_compatible(out_dir, cfg):
                raise ValueError(
                    "resume=True but existing index config/code-version differs; "
                    "rebuild with resume=False"
                )
        else:
            shutil.rmtree(out_dir)
    os.makedirs(os.path.join(out_dir, "docs"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    mf.atomic_write_bytes(
        os.path.join(out_dir, "cfg.json"),
        json.dumps({**cfg, "code_version": mf.code_version_hash()}).encode(),
    )

    if resume and os.path.exists(os.path.join(out_dir, INDEX_MARKER)):
        return mf.read_stats(out_dir)

    import time as _time

    _t0 = _time.perf_counter()
    phase_a_done = resume and os.path.exists(os.path.join(out_dir, PHASE_A_MARKER))
    # resume trusts a docs partition only if its artifact still matches the
    # manifest checksum (lineage integrity, BASELINE.json:6)
    done_pids = (
        mf.completed_units(
            out_dir,
            "docs",
            verify=True,
            paths={
                p: docs_path(out_dir, p)
                for p in range(pid_offset, pid_offset + num_partitions)
            },
        )
        if resume
        else set()
    )
    # the fused single-DAG path requires the docs checkpoint to be absent:
    # previously finished pids are filtered out upstream and would be
    # missing from the emitted partials
    fused = not phase_a_done and not done_pids

    def _pages_pipeline():
        ds = read_pages(input_path)
        prep = prep_batch_fn(langs, num_partitions, pid_offset)
        if done_pids:
            skip = pa.array(sorted(done_pids), pa.uint32())

            def prep_skip(batch: pa.Table, _prep=prep, _skip=skip) -> pa.Table:
                import pyarrow.compute as pc

                out = _prep(batch)
                return out.filter(pc.invert(pc.is_in(out["pid"], value_set=_skip)))

            ds = ds.map_batches(prep_skip, batch_format="pyarrow")
        else:
            ds = ds.map_batches(prep, batch_format="pyarrow")
        return ds.map_batches(
            ExtractUDF,
            batch_format="pyarrow",
            batch_size=extract_batch_size,
            # pre-warm half the pool: autoscaling from 1 costs seconds of ramp
            concurrency=(max(1, cpus // 2), cpus),
        )

    if fused:
        boundaries, heavy = _load_or_make_plan(
            out_dir, input_path, num_segments, sample_docs, heavy_df_frac, from_docs=False
        )
        _phase_log(f"plan (from input sample) {_time.perf_counter() - _t0:.1f}s")
        _t0 = _time.perf_counter()
        encoder = PostingsEncoder(
            boundaries, heavy, num_partitions, n_salts, pid_offset, positions=positions
        )
        if exchange == "disk":
            # disk exchange: phase 1 writes per-pid map-output files (one
            # IPC batch per bucket), phase 2 assembles each bucket from
            # random-access reads — no sort-shuffle, no object-store
            # all-to-all (SURVEY §8 round-5 deltas; VERDICT r4 Next #4)
            import functools

            from ..stages.postings_stage import assemble_from_disk_batch

            _pages_pipeline().groupby("pid").map_groups(
                DedupAssignWriter(out_dir, encoder=encoder, partials_to_disk=True),
                batch_format="pyarrow",
            ).count()
            _phase_log(f"disk phase 1 (extract+encode+map-out) {_time.perf_counter() - _t0:.1f}s")
            _after_disk_phase1()  # test seam (monkeypatched fault injection)
            _t1 = _time.perf_counter()
            n_buckets = (len(boundaries) + 1) * max(1, n_salts)
            # plain tasks, one bucket-id block each: re-opening the mmapped
            # footers per task is ~ms; an actor pool would cost ~2s spawn
            # (CLAUDE.md short-pipeline gotcha)
            seg_manifest = ray.data.range(
                n_buckets, override_num_blocks=n_buckets
            ).map_batches(
                functools.partial(assemble_from_disk_batch, out_dir=out_dir),
                batch_format="pyarrow",
            )
            rows = seg_manifest.take_all()
            _phase_log(f"disk phase 2 (assemble) {_time.perf_counter() - _t1:.1f}s")
        else:
            partials = _pages_pipeline().groupby("pid").map_groups(
                DedupAssignWriter(out_dir, encoder=encoder), batch_format="pyarrow"
            )
            seg_manifest = partials.groupby("bucket").map_groups(
                AssembleSegment(out_dir), batch_format="pyarrow"
            )
            rows = seg_manifest.take_all()
        with open(os.path.join(out_dir, PHASE_A_MARKER), "w") as f:
            f.write("done\n")
        _phase_log(f"fused build DAG {_time.perf_counter() - _t0:.1f}s")
        if os.environ.get("AARHUS_BUILD_STATS"):
            import sys as _sys

            print(seg_manifest.stats(), file=_sys.stderr, flush=True)
        _t0 = _time.perf_counter()
    else:
        # ---- two-phase resume path: finish docs/, then rebuild partials
        # from the checkpoint ----
        if not phase_a_done:
            _pages_pipeline().groupby("pid").map_groups(
                DedupAssignWriter(out_dir), batch_format="pyarrow"
            ).count()
            with open(os.path.join(out_dir, PHASE_A_MARKER), "w") as f:
                f.write("done\n")
        _phase_log(f"phase A (extract+dedup) {_time.perf_counter() - _t0:.1f}s")
        _t0 = _time.perf_counter()
        docs_glob = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        if not docs_glob:
            raise ValueError(f"no documents survived the build from {input_path}")
        boundaries, heavy = _load_or_make_plan(
            out_dir, input_path, num_segments, sample_docs, heavy_df_frac, from_docs=True
        )
        n_buckets = (len(boundaries) + 1) * max(1, n_salts)
        done_segs = tuple(
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
        docs_ds = ray.data.read_parquet(docs_glob, columns=["doc_id", "text"])
        partials = docs_ds.map_batches(
            PostingsEncoder,
            fn_constructor_args=(boundaries, heavy, num_partitions, n_salts, pid_offset, positions),
            batch_format="pyarrow",
            batch_size=postings_batch_size,
            concurrency=(max(1, cpus // 2), cpus),
        )
        seg_manifest = partials.groupby("bucket").map_groups(
            AssembleSegment(out_dir, done_segs), batch_format="pyarrow"
        )
        rows = seg_manifest.take_all()
        _phase_log(f"phase D (postings+segments) {_time.perf_counter() - _t0:.1f}s")
        _t0 = _time.perf_counter()

    if not glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")):
        raise ValueError(f"no documents survived the build from {input_path}")

    # shuffle checkpoint no longer needed once every segment is assembled;
    # cleaned here (common to both paths) so a crash-then-resume through
    # the two-phase path can't strand a stale partials/ dir
    shutil.rmtree(os.path.join(out_dir, "partials"), ignore_errors=True)

    # ---- global stats: fold the dedup manifest rows (partial aggregation
    # at the source — no extra Ray job). manifest.jsonl is append-only, so
    # the LAST row per partition is authoritative.
    docs_rows = [
        r for r in mf.read_manifest(out_dir) if r["stage"] == "docs" and r["status"] == "done"
    ]
    seen_pids = set()
    n_docs = total_len = 0
    for r in reversed(docs_rows):
        if r["partition_id"] in seen_pids:
            continue
        seen_pids.add(r["partition_id"])
        n_docs += int(r["output_rows"])
        total_len += int(r.get("doclen_sum", -1))
    if not docs_rows or any("doclen_sum" not in r for r in docs_rows):
        docs_glob = sorted(glob.glob(os.path.join(out_dir, "docs", "pid=*.parquet")))
        doclen_ds = ray.data.read_parquet(docs_glob, columns=["doclen"])
        agg = doclen_ds.aggregate(Count(), Sum("doclen"))
        n_docs = int(agg["count()"])
        total_len = int(agg["sum(doclen)"] or 0)
    avgdl = (total_len / n_docs) if n_docs else 0.0

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

    # ---- finalize: metrics mirror + marker ----
    man = mf.read_manifest(out_dir)
    if man:
        pq.write_table(pa.Table.from_pylist(man), os.path.join(out_dir, "metrics.parquet"))
    with open(os.path.join(out_dir, INDEX_MARKER), "w") as f:
        f.write(f"segments={len(rows)}\n")
    _phase_log(f"stats+finalize {_time.perf_counter() - _t0:.1f}s")
    return stats
