"""Interchange-format sources: JSONL and CSV round-trips of the documents
table. Web-text corpora arrive as JSONL dumps (one doc per line) and
metadata sheets as CSV; an engine claiming source completeness must read
both without corruption. Each op derives its interchange file from the
parquet documents table ONCE (cached by a _DONE marker under /tmp),
reads it back through the matching ``ray.data`` reader, and folds a
per-lang summary — so the DuckDB oracle over the ORIGINAL parquet
verifies the whole write→parse→read path byte-exactly (quoting,
escaping, unicode, embedded delimiters all covered by the hash)."""

from __future__ import annotations

import hashlib
import os
import shutil

import pandas as pd
import pyarrow as pa
import ray.data


def _interchange_dir(sf_dir: str, kind: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    final = f"/tmp/aarhus_interchange_{kind}_{tag}"
    if os.path.exists(os.path.join(final, "_DONE")):
        return final
    tmp = f"{final}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    )
    if kind == "jsonl":
        ds.write_json(tmp)
    elif kind == "csv":
        ds.write_csv(tmp)
    elif kind == "feather":
        # Arrow IPC / Feather v2 — no ray.data writer exists, so each
        # batch writes its own .arrow file (distributed, one IPC file per
        # task; uuid names are fine, readers list the dir). repartition
        # first: documents.parquet is one row group (CLAUDE.md gotcha), so
        # an unpartitioned write would make exactly one file and certify
        # nothing about multi-file reads.
        import uuid

        os.makedirs(tmp, exist_ok=True)

        def write_ipc(batch: pa.Table) -> pa.Table:
            import pyarrow.feather as feather

            path = os.path.join(tmp, f"part-{uuid.uuid4().hex}.arrow")
            feather.write_feather(batch, path, compression="uncompressed")
            return pa.table({"path": pa.array([path], pa.string())})

        ds.repartition(8).map_batches(
            write_ipc, batch_format="pyarrow", batch_size=None
        ).materialize()
    else:
        raise ValueError(kind)
    open(os.path.join(tmp, "_DONE"), "w").write("ok")
    os.rename(tmp, final) if not os.path.exists(final) else shutil.rmtree(tmp)
    return final


def _lang_fold(ds: ray.data.Dataset) -> pd.DataFrame:
    """(lang, n_docs, sum_chars, sum_text_len) — sum_text_len counts the
    PARSED text's characters, so any quoting/escape corruption in the
    interchange layer breaks the hash."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        tlen = pc.utf8_length(batch["text"])
        return pa.table(
            {
                "lang": batch["lang"],
                "n_docs": pa.array(np.ones(len(batch), np.int64), pa.int64()),
                "sum_chars": batch["n_chars"].cast(pa.int64()),
                "sum_text_len": tlen.cast(pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
            Sum("sum_text_len", alias_name="sum_text_len"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "sum_chars", "sum_text_len"):
        out[c] = out[c].astype("int64")
    return out


def jsonl_roundtrip_stats(sf_dir: str) -> pd.DataFrame:
    """documents → JSONL (ray.data.write_json) → ray.data.read_json →
    per-lang fold. Hash-checked against the parquet original: the JSONL
    layer must preserve every character."""
    d = _interchange_dir(sf_dir, "jsonl")
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".json")
    )
    return _lang_fold(ray.data.read_json(files))


def csv_roundtrip_stats(sf_dir: str) -> pd.DataFrame:
    """documents → CSV (ray.data.write_csv) → ray.data.read_csv →
    per-lang fold — quoting and embedded-delimiter correctness is the
    entire point of the hash check."""
    d = _interchange_dir(sf_dir, "csv")
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".csv")
    )
    return _lang_fold(ray.data.read_csv(files))


def feather_roundtrip_stats(sf_dir: str) -> pd.DataFrame:
    """documents → Arrow IPC/Feather v2 files (one per partition, written
    inside map_batches — Ray Data has no feather writer) →
    ray.data.read_binary_files + a flat-map that opens each file with
    pyarrow.feather and emits its rows → per-lang fold. The IPC layer is
    zero-copy columnar, so the hash check certifies the full
    write→mmap→read path; binary-file + in-task decode is also the
    template for any custom single-file format at scale (each file is
    one task, pruning by file list)."""
    d = _interchange_dir(sf_dir, "feather")
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".arrow")
    )

    def decode(batch: pa.Table) -> pa.Table:
        import io

        import pyarrow.feather as feather

        parts = [
            feather.read_table(io.BytesIO(buf.as_py()))
            for buf in batch["bytes"]
        ]
        return pa.concat_tables(parts)

    return _lang_fold(
        ray.data.read_binary_files(files).map_batches(decode, batch_format="pyarrow")
    )
