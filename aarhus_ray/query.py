"""CLI: ``python -m aarhus_ray.query --index ... --queries ...`` — top-k
BM25 via Block-Max WAND. Owns its Ray session (library code does not)."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Query a built index")
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True, help="parquet with (query_id, text)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--method", choices=("wand", "brute"), default="wand")
    p.add_argument(
        "--mode",
        choices=("or", "and", "phrase", "near", "prefix", "fuzzy", "boost",
                 "boolean", "msm", "wildcard", "regexp", "query_string"),
        default="or",
        help="or: disjunctive BM25; and: conjunctive; phrase: exact phrase; "
        "near: all terms within --near-window tokens (phrase/near use the "
        "positional sidecar when present, else checkpoint text verify); "
        "prefix: trailing-* terms expand against the term dictionary; "
        "fuzzy: every term expands to dictionary terms within edit distance 1; "
        "boost: term^W multiplies that term's BM25 contribution by W; "
        "boolean: +term MUST, -term MUST_NOT, bare term SHOULD; "
        "msm: docs matching at least --min-should-match distinct terms; "
        "wildcard: * anywhere in a term expands against the dictionary; "
        "regexp: full-match regexes expand against the dictionary; "
        "query_string: '\"a b\" +must -not term^2 pre*' composite syntax",
    )
    p.add_argument("--near-window", type=int, default=8)
    p.add_argument("--min-should-match", type=int, default=1)
    p.add_argument("--out", default=None, help="write results parquet here instead of stdout")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus or os.cpu_count(),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.query import query_index

    res = query_index(
        args.index, args.queries, k=args.k, method=args.method, mode=args.mode,
        near_window=args.near_window, min_should_match=args.min_should_match,
    )
    if args.out:
        res.write_parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df = res.to_pandas().sort_values(["query_id", "rank"])
        print(df.to_string(index=False, max_rows=50))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
