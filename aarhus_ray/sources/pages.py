"""Parquet sources for the pages corpus and query sets (SURVEY.md §2.1).

Column pruning happens AT THE READ (``columns=[...]``) so unneeded bytes —
especially the wide ``html``/``text`` columns — never leave storage.
"""

from __future__ import annotations

import ray.data

from .. import schemas

BUILD_COLUMNS = ["url", "warc_ts", "html", "lang"]


def read_pages(
    path: str,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Read the pages table, projected. Never loads ``text`` (that column is
    the conformance golden, not pipeline input) unless explicitly asked."""
    cols = columns or BUILD_COLUMNS
    ds = ray.data.read_parquet(path, columns=cols, override_num_blocks=override_num_blocks)
    schemas.validate(ds.schema().base_schema, schemas.PAGES, allow_subset=True)
    return ds


def read_queries(path: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(path)
    schemas.validate(ds.schema().base_schema, schemas.QUERIES)
    return ds
