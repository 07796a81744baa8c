"""Declared pyarrow schemas for every logical table (SURVEY.md §1.1).

The input schema is mandated by BASELINE.json:15:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
Schemas are validated at pipeline entry — no inference.
"""

from __future__ import annotations

import pyarrow as pa

# T1 — input corpus (Common-Crawl-style pages). `text` is the golden extracted
# text used only by conformance tests; the pipeline recomputes it from `html`.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# T3 — doclens sidecar (BM25 length normalization + doc_id→url resolution).
DOCLENS = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("url", pa.string()),
        ("doclen", pa.uint32()),
        ("partition_id", pa.uint32()),
    ]
)

# T4 — per-partition partial posting lists (the unit that flows into the
# term shuffle). doc_ids/tfs are delta+StreamVByte / varint encoded bytes.
POSTINGS_PARTIAL = pa.schema(
    [
        ("term", pa.string()),
        ("seg_id", pa.uint32()),
        ("salt", pa.uint32()),
        ("min_doc_id", pa.uint64()),
        ("doc_ids", pa.binary()),
        ("tfs", pa.binary()),
        ("df_partial", pa.uint32()),
        ("max_tf", pa.uint32()),
    ]
)

# T5 — segment-shard dictionary (one row per term within a shard). df is
# the SHARD-local df; global df = sum over a term's shards (query side).
SEGMENT_DICT = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.uint64()),
        ("offset", pa.uint64()),       # byte offset into postings.bin
        ("length", pa.uint64()),       # byte length in postings.bin
        ("skip_offset", pa.uint64()),  # byte offset into skips.bin
        ("skip_length", pa.uint64()),
        ("max_tf", pa.uint32()),
    ]
)

# T7 — query set.
QUERIES = pa.schema([("query_id", pa.int64()), ("text", pa.string())])

# T8 — ranked results, order (score DESC, doc_id ASC) within query.
RESULTS = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.uint64()),
        ("url", pa.string()),
        ("score", pa.float64()),
    ]
)

# T9 — lineage manifest rows (one per stage × partition; SURVEY §4.4).
MANIFEST = pa.schema(
    [
        ("stage", pa.string()),
        ("partition_id", pa.uint32()),
        ("input_rows", pa.uint64()),
        ("output_rows", pa.uint64()),
        ("bytes_out", pa.uint64()),
        ("wall_s", pa.float64()),
        ("checksum", pa.string()),
        ("status", pa.string()),
    ]
)


def validate(table_or_schema, expected: pa.Schema, *, allow_subset: bool = False) -> None:
    """Raise ValueError unless the schema matches the declared constant.

    With ``allow_subset`` the actual schema may omit columns (projection) but
    every present column must have the declared type.
    """
    actual = (
        table_or_schema if isinstance(table_or_schema, pa.Schema) else table_or_schema.schema
    )
    exp = {f.name: f.type for f in expected}
    for name in actual.names:
        if name not in exp:
            raise ValueError(f"unexpected column {name!r}; expected subset of {list(exp)}")
        if actual.field(name).type != exp[name]:
            raise ValueError(
                f"column {name!r} has type {actual.field(name).type}, expected {exp[name]}"
            )
    if not allow_subset:
        missing = [n for n in exp if n not in actual.names]
        if missing:
            raise ValueError(f"missing columns: {missing}")
