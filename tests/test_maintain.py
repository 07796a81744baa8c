"""Incremental indexing (delta generations) + compaction invariants:
an incremental index answers queries exactly like a fresh full build, and
compaction changes the shard layout without changing a single result bit."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from aarhus_ray import fixtures
from aarhus_ray.pipelines.build import build_index
from aarhus_ray.pipelines.maintain import add_documents, compact_index
from aarhus_ray.pipelines.query import query_index


@pytest.fixture(scope="module")
def incr_setup(tmp_path_factory):
    """400 pages in 4 shard files; full build vs base(2 files)+delta(2)."""
    root = tmp_path_factory.mktemp("incr")
    # two url-DISJOINT halves (add_documents' append-only assumption:
    # within-half recrawl dups are fine, cross-half url collisions are not)
    table_a = fixtures.gen_pages(200, seed=7)
    table_b = fixtures.gen_pages(200, seed=8, url_offset=100_000)
    pages = str(root / "pages")
    base_dir, delta_dir = str(root / "pages_a"), str(root / "pages_b")
    for d in (pages, base_dir, delta_dir):
        os.makedirs(d)
    pq.write_table(table_a, os.path.join(pages, "part-0000.parquet"))
    pq.write_table(table_b, os.path.join(pages, "part-0001.parquet"))
    pq.write_table(table_a, os.path.join(base_dir, "part-0000.parquet"))
    pq.write_table(table_b, os.path.join(delta_dir, "part-0000.parquet"))

    full_idx = str(root / "idx_full")
    build_index(pages, full_idx, num_partitions=6, num_segments=2, n_salts=2)
    incr_idx = str(root / "idx_incr")
    build_index(base_dir, incr_idx, num_partitions=4, num_segments=2, n_salts=2)
    incr_stats = add_documents(incr_idx, delta_dir, num_partitions=3)
    return {"full": full_idx, "incr": incr_idx, "incr_stats": incr_stats}


def _topk(index, q, k=10):
    return (
        query_index(index, q, k=k, resolve_urls=True)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_incremental_stats_fold(incr_setup):
    full = pq  # noqa: F841  (imported for parity)
    from aarhus_ray.state import manifest as mf

    f = mf.read_stats(incr_setup["full"])
    i = incr_setup["incr_stats"]
    assert i["n_docs"] == f["n_docs"]
    assert i["total_len"] == f["total_len"]
    assert i["avgdl"] == pytest.approx(f["avgdl"], rel=0, abs=0)
    assert i["generations"] == 2


def test_incremental_equals_full_build(incr_setup):
    """Same corpus, two build histories → identical rankings up to exact
    score ties. Internal doc_ids differ (different partition counts), so
    the frozen tie-break (score DESC, doc_id ASC) may legitimately order
    EQUAL-score docs differently; everything else — per-rank float64
    scores, and urls wherever the score is untied — must match exactly."""
    q = fixtures.gen_queries(25, seed=13)
    got_f = _topk(incr_setup["full"], q)
    got_i = _topk(incr_setup["incr"], q)
    assert len(got_f) == len(got_i)
    assert (got_f["query_id"].to_numpy() == got_i["query_id"].to_numpy()).all()
    assert (got_f["rank"].to_numpy() == got_i["rank"].to_numpy()).all()
    assert (got_f["score"].to_numpy() == got_i["score"].to_numpy()).all(), "scores not exact"
    # url equality up to tie groups: within a (query, score) group the url
    # MULTISET must match. The per-query BOUNDARY score group is exempt —
    # a tie straddling rank k legitimately admits different members.
    for df in (got_f, got_i):
        df["min_s"] = df.groupby("query_id")["score"].transform("min")
    inner_f = got_f[got_f["score"] > got_f["min_s"]]
    inner_i = got_i[got_i["score"] > got_i["min_s"]]
    key_f = inner_f.groupby(["query_id", "score"])["url"].apply(sorted)
    key_i = inner_i.groupby(["query_id", "score"])["url"].apply(sorted)
    assert key_f.equals(key_i)


def test_delta_doc_space_disjoint(incr_setup):
    """Every delta doc_id sits above every base doc_id (pid offset)."""
    files = sorted(glob.glob(os.path.join(incr_setup["incr"], "docs", "pid=*.parquet")))
    pids = [int(os.path.basename(f)[4:8]) for f in files]
    assert pids == sorted(set(pids)), "pid collision between generations"
    assert len(pids) > 4  # base P=4 + delta partitions


def test_compaction_preserves_results_bitwise(incr_setup):
    q = fixtures.gen_queries(25, seed=13)
    before = (
        query_index(incr_setup["incr"], q, k=10, resolve_urls=False)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    conj_before = (
        query_index(incr_setup["incr"], q, k=10, mode="and", resolve_urls=False)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    n_shards_before = len(glob.glob(os.path.join(incr_setup["incr"], "segments", "seg=*")))
    stats = compact_index(incr_setup["incr"])
    n_shards_after = len(glob.glob(os.path.join(incr_setup["incr"], "segments", "seg=*")))
    assert stats["generations"] == 1
    assert n_shards_after < n_shards_before
    after = (
        query_index(incr_setup["incr"], q, k=10, resolve_urls=False)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(before) == len(after)
    assert (before["doc_id"].to_numpy() == after["doc_id"].to_numpy()).all()
    assert (before["score"].to_numpy() == after["score"].to_numpy()).all()
    # conjunctive mode equally unaffected by the shard-layout rewrite
    conj_after = (
        query_index(incr_setup["incr"], q, k=10, mode="and", resolve_urls=False)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(conj_before) == len(conj_after)
    assert (conj_before["doc_id"].to_numpy() == conj_after["doc_id"].to_numpy()).all()
    assert (conj_before["score"].to_numpy() == conj_after["score"].to_numpy()).all()


def test_update_by_query_lifecycle(tmp_path):
    """update_by_query: matched docs' OLD versions vanish from results,
    NEW versions (transformed text) rank; tokens introduced by the
    transform are retrievable and hit exactly the updated urls; stats keep
    the old versions folded in (n_docs grows by n_updated — the Lucene
    delete+re-add contract); compaction then restores fresh-build-exact
    statistics over the updated corpus."""
    import shutil

    from aarhus_ray.pipelines.maintain import update_by_query
    from aarhus_ray.pipelines.query import export_matches
    from aarhus_ray.state import manifest as mf
    from aarhus_ray.textnorm import tokenize
    import pyarrow as pa

    pages = str(tmp_path / "pages")
    fixtures.write_pages_dir(pages, 200, seed=13, rows_per_file=100)
    idx = str(tmp_path / "idx")
    build_index(pages, idx, num_partitions=3, num_segments=2, n_salts=2)
    docs = pa.concat_tables(
        pq.read_table(f, columns=["doc_id", "url", "text"])
        for f in sorted(glob.glob(f"{idx}/docs/pid=*.parquet"))
    )
    toks_of = [set(tokenize(t)) for t in docs["text"].to_pylist()]
    # a term matching a strict subset of docs
    term = next(
        t for t in sorted(set().union(*toks_of))
        if 0 < sum(1 for dt in toks_of if t in dt) < len(toks_of) // 2
    )
    want_urls = sorted(
        u for u, dt in zip(docs["url"].to_pylist(), toks_of) if term in dt
    )
    n0 = int(mf.read_stats(idx)["n_docs"])

    r = update_by_query(idx, term, lambda t: t + " zzupdatedzz", mode="or")
    assert r["n_updated"] == len(want_urls)
    assert int(mf.read_stats(idx)["n_docs"]) == n0 + len(want_urls)  # old still counted

    # the transform-introduced token retrieves exactly the updated urls
    q = pa.table({"query_id": pa.array([0], pa.int64()),
                  "text": pa.array(["zzupdatedzz"], pa.string())})
    hits = query_index(idx, q, k=1 << 20, resolve_urls=True).to_pandas()
    assert sorted(hits["url"]) == want_urls
    # and the old versions are invisible: term-match set == updated-doc count
    m = export_matches(idx, pa.table({"query_id": pa.array([0], pa.int64()),
                                      "text": pa.array([term], pa.string())})).to_pandas()
    assert len(m) == len(want_urls)

    # post-compaction: statistics are fresh-build exact over the updated corpus
    from aarhus_ray.pipelines.maintain import compact_index as _ci
    _ci(idx)
    fresh_pages = str(tmp_path / "fresh_pages")
    shutil.copytree(pages, fresh_pages)
    # rebuild reference corpus with the transform applied to matched urls
    for f in sorted(glob.glob(f"{fresh_pages}/*.parquet")):
        t = pq.read_table(f)
        texts, htmls = [], []
        for u, x in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            if u in set(want_urls):
                x = x + " zzupdatedzz"
            texts.append(x)
            htmls.append(f"<html><body><p>{x}</p></body></html>".encode())
        # warc_ts bump irrelevant for stats; text/html carry the change
        t = t.set_column(t.schema.get_field_index("text"), "text", pa.array(texts, pa.string()))
        t = t.set_column(t.schema.get_field_index("html"), "html", pa.array(htmls, pa.binary()))
        pq.write_table(t, f)
    fresh_idx = str(tmp_path / "fresh_idx")
    build_index(fresh_pages, fresh_idx, num_partitions=3, num_segments=2, n_salts=2)
    sa, sb = mf.read_stats(idx), mf.read_stats(fresh_idx)
    assert int(sa["n_docs"]) == int(sb["n_docs"])
    assert int(sa["total_len"]) == int(sb["total_len"])
    qs = fixtures.gen_queries(10, seed=3)
    ra = query_index(idx, qs, k=10).to_pandas()
    rb = query_index(fresh_idx, qs, k=10).to_pandas()
    assert (ra["url"].to_numpy() == rb["url"].to_numpy()).all()
    assert (ra["score"].to_numpy() == rb["score"].to_numpy()).all()


def test_force_merge_shrinks_segments_bitwise(tmp_path):
    """compact_index(num_segments=1) — the ES _forcemerge/_shrink shape:
    the segment count drops, query results stay bit-identical, the
    coarsened plan persists (a later delta generation aligns with it),
    and growing the segment count is rejected."""
    import json
    import shutil

    import pyarrow as pa
    import pytest as _pytest

    from aarhus_ray.pipelines.maintain import compact_index as _ci
    from aarhus_ray.state import manifest as mf

    pages = str(tmp_path / "pages")
    fixtures.write_pages_dir(pages, 200, seed=19, rows_per_file=100)
    idx = str(tmp_path / "idx")
    build_index(pages, idx, num_partitions=3, num_segments=4, n_salts=2)
    q = fixtures.gen_queries(12, seed=7)
    before = query_index(idx, q, k=10).to_pandas()
    segs_before = len(glob.glob(f"{idx}/segments/seg=*"))

    with _pytest.raises(ValueError, match="only shrinks"):
        _ci(idx, num_segments=8)

    _ci(idx, num_segments=1)
    segs_after = len(glob.glob(f"{idx}/segments/seg=*"))
    assert segs_after < segs_before
    with open(f"{idx}/plan.json") as f:
        assert json.load(f)["boundaries"] == []
    assert int(mf.read_stats(idx)["num_segments"]) == 1
    after = query_index(idx, q, k=10).to_pandas()
    assert (before["url"].to_numpy() == after["url"].to_numpy()).all()
    assert (before["score"].to_numpy() == after["score"].to_numpy()).all()

    # a delta generation grafts onto the shrunk plan and stays exact
    from aarhus_ray.pipelines.maintain import add_documents
    import pyarrow.parquet as _pq
    delta = str(tmp_path / "delta")
    os.makedirs(delta)
    _pq.write_table(fixtures.gen_pages(100, seed=20, url_offset=50_000),
                    os.path.join(delta, "part-0000.parquet"))
    add_documents(idx, delta, num_partitions=2)
    full_pages = str(tmp_path / "full_pages")
    shutil.copytree(pages, full_pages)
    _pq.write_table(fixtures.gen_pages(100, seed=20, url_offset=50_000),
                    os.path.join(full_pages, "part-z.parquet"))
    fresh = str(tmp_path / "fresh")
    build_index(full_pages, fresh, num_partitions=3, num_segments=1, n_salts=2)
    got = query_index(idx, q, k=10).to_pandas()
    want = query_index(fresh, q, k=10).to_pandas()
    for qid in got["query_id"].unique():
        a = sorted(zip(got[got.query_id == qid]["score"], got[got.query_id == qid]["url"]))
        b = sorted(zip(want[want.query_id == qid]["score"], want[want.query_id == qid]["url"]))
        assert a == b
