"""Generate the committed golden conformance artifacts (FIXTURES.md F3).

Run ONCE (plus deliberate regenerations, which are breaking changes):
    python tools/gen_goldens.py

Writes tests/golden/{extracted.parquet, topk.parquet, stats.json} from the
canonical pipeline on the deterministic fixture corpus (1000 pages, 50
queries, seed 42, P=8, S=2, n_salts=4 — must match tests/conftest.py
``golden_index``).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aarhus_ray import fixtures  # noqa: E402
from aarhus_ray.pipelines.build import build_index  # noqa: E402
from aarhus_ray.pipelines.query import query_index  # noqa: E402


def main() -> None:
    golden_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")
    os.makedirs(golden_dir, exist_ok=True)
    work = "/tmp/aarhus_golden_build"
    shutil.rmtree(work, ignore_errors=True)
    pages = os.path.join(work, "pages")
    fixtures.write_pages_dir(pages, 1000, seed=42, rows_per_file=250)
    out = os.path.join(work, "index")

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    stats = build_index(pages, out, num_partitions=8, num_segments=2, n_salts=4)

    # golden 1: per-url extracted text (the dedup winners' canonical text)
    docs = pa.concat_tables(
        pq.read_table(f, columns=["url", "text"])
        for f in sorted(glob.glob(os.path.join(out, "docs", "pid=*.parquet")))
    ).sort_by("url")
    pq.write_table(docs, os.path.join(golden_dir, "extracted.parquet"))

    # golden 2: top-10 results on the fixture query set, frozen order
    q = fixtures.gen_queries(50, seed=42)
    res = query_index(out, q, k=10, resolve_urls=False)
    topk = res.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array(topk["query_id"], pa.int64()),
                "rank": pa.array(topk["rank"], pa.int32()),
                "doc_id": pa.array(topk["doc_id"], pa.uint64()),
                "score": pa.array(topk["score"], pa.float64()),
            }
        ),
        os.path.join(golden_dir, "topk.parquet"),
    )

    # golden 3: stats spot checks
    with open(os.path.join(golden_dir, "stats.json"), "w") as f:
        json.dump(
            {
                "n_docs": stats["n_docs"],
                "total_len": stats["total_len"],
                "avgdl": stats["avgdl"],
                "num_partitions": stats["num_partitions"],
            },
            f,
            indent=1,
        )
    print("goldens written:", os.listdir(golden_dir))
    ray.shutdown()


if __name__ == "__main__":
    main()
