"""Similarity search over the ``embeddings`` table (list<float> column).

Three paths, all over the same 500×64 driver table shape:

- ``knn_cosine_bruteforce``: exact top-k cosine — per-batch numpy matmul
  against a BROADCAST query vector (ray.put once), per-batch top-k
  partials, tiny global merge. The baseline and the exactness oracle.

- ``knn_cosine_lsh``: axis-aligned sign-LSH over a PERSISTED, bucket-
  partitioned parquet index. Signature bit b = (embedding[b] > 0) — chosen
  over random hyperplanes deliberately: the semantics ("exact top-k among
  vectors whose sign signature is within ``max_flip`` bits of the query's")
  are SQL-expressible, so the DuckDB oracle pins the WHOLE approximate
  pipeline (bucketing + probing + scoring) exactly, not just a rows count.
  Queries read ONLY the probed bucket directories (sub-scan: ~15% of the
  corpus at n_bits=8, max_flip=2) and score only those vectors.

- ``ivf_search``: EXACT top-k via branch-and-bound over a persisted IVF
  index. Centroids come from a deterministic distributed sample (never a
  driver-side full read); each cell dir stores its vectors plus an angular
  radius (min cosine between centroid and members). A cell's best possible
  cosine is cos(max(0, angle(q,c) - radius)); cells are scanned in bound
  order and scanning stops when the bound drops below the running k-th
  score — by the spherical triangle inequality the result equals brute
  force ALWAYS (so it shares the brute-force oracle), while clustered
  corpora prune most cells. On this near-random test corpus pruning is
  honest-but-weak; the scan remains a streamed pruned parquet read.

Index layout (the checkpoint IS the index — mirrors the inverted-index
design in pipelines/build.py):

    /tmp/aarhus_ann/<kind>_<corpus>_<params>/
      meta.json                  # params + centroids/radii (ivf)
      bucket=N/*.parquet | cell=N/*.parquet
      _DONE                      # atomic completion marker
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

ANN_CACHE_ROOT = "/tmp/aarhus_ann"


def _emb(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(batch) if len(batch) else 0
    return ids, flat.reshape(len(batch), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """One query vector by id — predicate pushdown so only the row groups
    containing it are read (never the whole table)."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", vec_id)],
    )
    if len(t) == 0:
        raise KeyError(f"vec_id {vec_id} not in {sf_dir}/embeddings.parquet")
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)



def _topk_task(batch: pa.Table, q_ref, k: int) -> pa.Table:
    """Per-batch exact top-k vs a broadcast query vector. Plain TASK form
    (not an actor class): scans here are short, so per-call actor-pool
    spawns dominated wall time; ray.get of the broadcast ref is a
    zero-copy plasma read per batch."""
    q = ray.get(q_ref)
    ids, m = _to_matrix(batch)
    sims = _normalize(m) @ q
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {"vec_id": pa.array(ids[order], pa.int64()), "cos": pa.array(sims[order], pa.float64())}
    )


def knn_cosine_bruteforce(sf_dir: str, k: int = 10, vec_id: int = 0) -> pd.DataFrame:
    """Exact top-k by cosine to embeddings[vec_id]. Output (vec_id, cos
    rounded to 3dp) ordered (cos DESC, vec_id ASC) — rounding chosen because
    DuckDB's list_cosine_similarity computes in float32 (~1e-8 error)."""
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    import functools

    parts = (
        _emb(sf_dir)
        .map_batches(
            functools.partial(_topk_task, q_ref=q_ref, k=k),
            batch_format="pyarrow",
            batch_size=4096,
        )
        .to_pandas()
    )
    parts = parts.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    parts["cos"] = parts["cos"].round(3)
    return parts.reset_index(drop=True)


def knn_cosine_filtered(sf_dir: str, k: int = 10, vec_id: int = 0, label: int = 1) -> pd.DataFrame:
    """FILTERED kNN (Elasticsearch 8's ``knn`` with ``filter``, PRE-filter
    semantics): exact top-k cosine among vectors whose ``label`` docvalue
    passes the filter — the filter restricts the candidate set BEFORE
    ranking, the ES/Lucene guarantee that k results come back whenever k
    candidates pass (post-filtering a top-k would under-fill). The filter
    is pushed into the parquet read (``filters=[(label, =, L)]`` →
    row-group pruning: non-matching row groups never leave storage), then
    the scan shape is knn_cosine_bruteforce's — per-batch top-k partials
    vs the broadcast query vector, tiny driver merge. Output (vec_id,
    label, cos rounded 3dp — the documented DuckDB float32 contract),
    order (cos DESC, vec_id ASC)."""
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    import functools

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=(pa.dataset.field("label") == label),
        )
        .map_batches(
            functools.partial(_topk_task, q_ref=q_ref, k=k),
            batch_format="pyarrow",
            batch_size=4096,
        )
        .to_pandas()
    )
    parts = parts.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    parts["cos"] = parts["cos"].round(3)
    parts["label"] = np.int32(label)
    return parts[["vec_id", "label", "cos"]].reset_index(drop=True)


def _radius_task(batch: pa.Table, q_ref, threshold: float) -> pa.Table:
    """Per-batch radius filter vs a broadcast query vector: emit rows
    whose 3dp-ROUNDED cosine clears the threshold. Rounding before the
    comparison is deliberate — it makes membership a pure function of
    the rounded value both engines agree on (DuckDB computes cosine in
    float32; an unrounded boundary compare could flip membership in the
    last ulp)."""
    q = ray.get(q_ref)
    ids, m = _to_matrix(batch)
    if not len(ids):
        return pa.table({"vec_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
    sims = np.round(_normalize(m) @ q, 3)
    keep = sims >= threshold
    return pa.table(
        {
            "vec_id": pa.array(ids[keep].astype(np.int64), pa.int64()),
            "cos": pa.array(sims[keep], pa.float64()),
        }
    )


def knn_radius(sf_dir: str, threshold: float = 0.2, vec_id: int = 0) -> pd.DataFrame:
    """RADIUS (range) similarity search: EVERY vector whose cosine to the
    query clears ``threshold`` — the vector-database range-search API
    (Milvus/FAISS range_search; ES's knn has no radius form, similarity
    cutoff is the nearest analogue). Unlike top-k, the result size is
    data-dependent, so the scan STREAMS per-batch filtered rows (no k-th
    score coordination at all — embarrassingly parallel, the easiest
    vector op to scale). Membership compares the 3dp-rounded cosine
    (the documented DuckDB float32 contract, here load-bearing: it
    freezes the boundary). Output (vec_id, cos), (cos DESC, vec_id)."""
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    import functools

    parts = (
        _emb(sf_dir)
        .map_batches(
            functools.partial(_radius_task, q_ref=q_ref, threshold=threshold),
            batch_format="pyarrow",
            batch_size=4096,
        )
        .to_pandas()
    )
    parts = parts.sort_values(["cos", "vec_id"], ascending=[False, True])
    return parts.reset_index(drop=True)


MRL_PREFIX = 8       # Matryoshka prefix dims used for the cheap first pass
MRL_THRESH = 0.3     # 3dp-rounded prefix-cosine admission threshold


def _mrl_task(batch: pa.Table, q_ref, k: int) -> pa.Table:
    """Per-batch Matryoshka two-stage: prefix-dim cosine prunes (rounded
    3dp >= MRL_THRESH — the frozen-boundary contract knn_radius uses),
    full-dim exact cosine reranks ONLY survivors, emit the batch top-k.
    One matmul over (batch × MRL_PREFIX) then a small (survivors × dim)
    one — the memory-bandwidth shape MRL serving buys at 10^12 vectors
    (the full vector is only touched for ~10% of rows; with dim-sliced
    columnar storage the full read is skipped too)."""
    q = ray.get(q_ref)          # full query vector, already L2-normalized
    ids, m = _to_matrix(batch)
    if not len(ids):
        return pa.table({"vec_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
    qp = q[:MRL_PREFIX] / np.linalg.norm(q[:MRL_PREFIX])
    mp = m[:, :MRL_PREFIX]
    pn = np.linalg.norm(mp, axis=1)
    pn[pn == 0] = 1.0
    pcos = np.round((mp / pn[:, None]) @ qp, 3)
    keep = pcos >= MRL_THRESH
    ids, m = ids[keep], m[keep]
    sims = _normalize(m) @ q
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {"vec_id": pa.array(ids[order], pa.int64()), "cos": pa.array(sims[order], pa.float64())}
    )


def knn_mrl(sf_dir: str, k: int = 10, vec_id: int = 0) -> pd.DataFrame:
    """Matryoshka (MRL, Kusupati 2022) two-stage kNN: a cheap scan over
    the FIRST MRL_PREFIX dims admits candidates (prefix cosine, 3dp-
    rounded, >= MRL_THRESH), and only admitted vectors get the exact
    full-dim cosine; top-k of the admitted set returns. ES 8.15's knn
    serves exactly this shape for MRL-trained embeddings (quantized/
    truncated first pass + full rerank). Both stages are stated in the
    DuckDB oracle (list-slice cosine), so the op is hash-checked end to
    end — no recall hand-waving. Output (vec_id, cos 3dp), order (cos
    DESC, vec_id ASC)."""
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    import functools

    parts = (
        _emb(sf_dir)
        .map_batches(
            functools.partial(_mrl_task, q_ref=q_ref, k=k),
            batch_format="pyarrow",
            batch_size=4096,
        )
        .to_pandas()
    )
    parts = parts.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    parts["cos"] = parts["cos"].round(3)
    return parts.reset_index(drop=True)


def mrl_oracle_sql(k: int = 10, vec_id: int = 0) -> str:
    """DuckDB replay of knn_mrl's stated two-stage semantics (1-indexed
    list slice; admission compares the 3dp-rounded prefix cosine on both
    sides, the same frozen-boundary contract as knn_radius)."""
    return f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {vec_id})
        SELECT e.vec_id,
               round(CAST(list_cosine_similarity(e.embedding, q.embedding) AS DOUBLE), 3) AS cos
        FROM embeddings e CROSS JOIN q
        WHERE round(CAST(list_cosine_similarity(
                  e.embedding[1:{MRL_PREFIX}], q.embedding[1:{MRL_PREFIX}]) AS DOUBLE), 3)
              >= {MRL_THRESH}
        ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
        LIMIT {k}
    """


def _multi_topk_task(batch: pa.Table, q_ref, w: int) -> pa.Table:
    """Per-batch exact top-w cosine partials for EVERY row of a broadcast
    (nq × dim) query matrix — one corpus scan serves all queries (sims is
    a single (batch × nq) matmul; the loop is over queries, not rows)."""
    Q = ray.get(q_ref)
    ids, m = _to_matrix(batch)
    if not len(ids):
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
    sims = _normalize(m) @ Q.T
    qs, vs, cs = [], [], []
    for qi in range(Q.shape[0]):
        s = sims[:, qi]
        order = np.lexsort((ids, -s))[:w]
        qs.append(np.full(len(order), qi, dtype=np.int64))
        vs.append(ids[order].astype(np.int64))
        cs.append(s[order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(qs), pa.int64()),
            "vec_id": pa.array(np.concatenate(vs), pa.int64()),
            "cos": pa.array(np.concatenate(cs), pa.float64()),
        }
    )


def multi_knn_window(sf_dir: str, vec_ids, w: int, keep_cos: bool = False) -> pd.DataFrame:
    """Exact per-query top-w cosine windows in ONE streamed corpus scan:
    the (nq × dim) normalized query matrix is broadcast once (ray.put),
    each batch emits per-query top-w partials, and the driver merges only
    O(nq × w) partial rows — window-shaped, never corpus-shaped. Query
    vectors come from a predicate-pushdown read of ``vec_ids`` (the probed
    row groups only). Output (query_id, vec_id, rank), rank 1-based under
    the frozen (cos DESC, vec_id ASC) total order; query_id is the
    POSITION in ``vec_ids``."""
    vec_ids = list(vec_ids)
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", vec_ids)],
    )
    got = {int(v): i for i, v in enumerate(t["vec_id"].to_pylist())}
    missing = [v for v in vec_ids if v not in got]
    if missing:
        raise KeyError(f"vec_ids {missing} not in {sf_dir}/embeddings.parquet")
    rows = np.stack([np.asarray(t["embedding"][got[v]].as_py(), dtype=np.float64) for v in vec_ids])
    q_ref = ray.put(_normalize(rows))

    import functools

    parts = (
        _emb(sf_dir)
        .map_batches(
            functools.partial(_multi_topk_task, q_ref=q_ref, w=w),
            batch_format="pyarrow",
            batch_size=4096,
        )
        .to_pandas()
    )
    parts = parts.sort_values(
        ["query_id", "cos", "vec_id"], ascending=[True, False, True]
    )
    out = parts.groupby("query_id", sort=True).head(w).reset_index(drop=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype("int32")
    if keep_cos:
        return out[["query_id", "vec_id", "rank", "cos"]]
    return out[["query_id", "vec_id", "rank"]]


# ---------------------------------------------------------------------------
# persisted index plumbing
# ---------------------------------------------------------------------------


def _index_dir(kind: str, sf_dir: str, params: str) -> str:
    src = f"{sf_dir}/embeddings.parquet"
    st = os.stat(src)
    corpus = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(ANN_CACHE_ROOT, f"{kind}_{corpus}_{params}_{st.st_size}_{int(st.st_mtime)}")


def _publish(tmp: str, final: str) -> None:
    """Atomic-ish publish: rename the fully-written tmp dir into place; a
    concurrent winner keeps its copy and the loser's tmp is discarded."""
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(os.path.join(final, "_DONE")):
        raise RuntimeError(f"ANN index publish failed for {final}")



def _parquet_files(dirs: list[str]) -> list[str]:
    """Flatten partition dirs to their parquet files (read_parquet treats
    list entries as files, not directories)."""
    return [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]


def sign_signature(m: np.ndarray, n_bits: int) -> np.ndarray:
    """Axis-aligned sign signature: bit b set iff embedding[b] > 0 (the
    SQL-expressible sign-projection LSH — see module docstring)."""
    bits = (m[:, :n_bits] > 0).astype(np.int64)
    return bits @ (np.int64(1) << np.arange(n_bits, dtype=np.int64))


def build_lsh_index(sf_dir: str, n_bits: int = 8) -> str:
    """One streaming pass: signature per vector, parquet partitioned by
    bucket (hive layout). Returns the index dir; cached by content stamp."""
    final = _index_dir("lsh", sf_dir, f"b{n_bits}")
    if os.path.exists(os.path.join(final, "_DONE")):
        return final
    tmp = f"{final}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids, m = _to_matrix(batch)
        sig = sign_signature(m, n_bits)
        return batch.append_column("bucket", pa.array(sig, pa.int64()))

    _emb(sf_dir).map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["bucket"]
    )
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"kind": "lsh", "n_bits": n_bits, "source": sf_dir}, f)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("ok")
    _publish(tmp, final)
    return final


def _probe_set(q_sig: int, n_bits: int, max_flip: int) -> list[int]:
    """All signatures within ``max_flip`` bit flips of ``q_sig``."""
    sigs = {q_sig}
    frontier = {q_sig}
    for _ in range(max_flip):
        frontier = {s ^ (1 << b) for s in frontier for b in range(n_bits)} - sigs
        sigs |= frontier
    return sorted(sigs)


def knn_cosine_lsh(
    sf_dir: str, k: int = 10, vec_id: int = 0, n_bits: int = 8, max_flip: int = 2
) -> pd.DataFrame:
    """Exact top-k cosine AMONG vectors whose sign signature is within
    ``max_flip`` bits of the query's — served from the persisted bucketed
    index: only probed bucket dirs are read (~37/256 buckets), only their
    vectors scored. Deterministic; the DuckDB oracle states the same
    semantics in SQL, so this is hash-checked end to end."""
    index_dir = build_lsh_index(sf_dir, n_bits)
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    q_sig = int(sign_signature(qn[None, :], n_bits)[0])
    dirs = [
        os.path.join(index_dir, f"bucket={s}")
        for s in _probe_set(q_sig, n_bits, max_flip)
        if os.path.isdir(os.path.join(index_dir, f"bucket={s}"))
    ]
    if not dirs:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"), "cos": pd.Series([], dtype="float64")})
    q_ref = ray.put(qn)

    import functools

    parts = (
        ray.data.read_parquet(_parquet_files(dirs), columns=["vec_id", "embedding"])
        .map_batches(
            functools.partial(_topk_task, q_ref=q_ref, k=k),
            batch_format="pyarrow",
            batch_size=4096,
        )
        .to_pandas()
    )
    parts = parts.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    parts["cos"] = parts["cos"].round(3)
    return parts.reset_index(drop=True)


def lsh_oracle_sql(k: int = 10, vec_id: int = 0, n_bits: int = 8, max_flip: int = 2) -> str:
    """DuckDB replay of knn_cosine_lsh's exact semantics (sign signature is
    1-indexed list access in SQL; sign comparisons are float-width-proof)."""
    sig = " + ".join(f"(CASE WHEN embedding[{b + 1}] > 0 THEN {1 << b} ELSE 0 END)" for b in range(n_bits))
    return f"""
        WITH sig AS (SELECT vec_id, embedding, ({sig}) AS s FROM embeddings),
        q AS (SELECT embedding, s FROM sig WHERE vec_id = {vec_id})
        SELECT e.vec_id,
               round(CAST(list_cosine_similarity(e.embedding, q.embedding) AS DOUBLE), 3) AS cos
        FROM sig e, q
        WHERE bit_count(CAST(xor(CAST(e.s AS UBIGINT), CAST(q.s AS UBIGINT)) AS BIGINT)) <= {max_flip}
        ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# IVF: exact branch-and-bound over a persisted cell-partitioned index
# ---------------------------------------------------------------------------

_SAMPLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def _train_centroids(sf_dir: str, n_cells: int, seed: int, sample_mod: int = 2) -> np.ndarray:
    """Centroids from a DETERMINISTIC DISTRIBUTED sample (vec_id hash mod
    ``sample_mod`` == 0 — ~1/sample_mod of the corpus, independent of block
    layout), Lloyd-iterated on the driver. Only the sample ever reaches the
    driver; at 100TB sample_mod scales so the sample stays bounded."""

    def sample_rows(batch: pa.Table) -> pa.Table:
        ids, m = _to_matrix(batch)
        mixed = (ids.astype(np.uint64) + np.uint64(1)) * _SAMPLE_MIX
        keep = (mixed % np.uint64(sample_mod)) == 0
        return pa.table({"vec_id": pa.array(ids[keep], pa.int64()),
                         "embedding": batch["embedding"].combine_chunks().take(np.flatnonzero(keep))
                         if isinstance(batch["embedding"], pa.ChunkedArray)
                         else batch["embedding"].take(np.flatnonzero(keep))})

    sample_tbl = _emb(sf_dir).map_batches(sample_rows, batch_format="pyarrow").to_pandas()
    S = _normalize(np.array(sample_tbl["embedding"].tolist(), dtype=np.float64))
    rng = np.random.RandomState(seed)
    C = S[rng.choice(len(S), size=min(n_cells, len(S)), replace=False)].copy()
    for _ in range(10):
        assign = np.argmax(S @ C.T, axis=1)
        for c in range(len(C)):
            members = S[assign == c]
            if len(members):
                v = members.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C



def _assign_cell_task(batch: pa.Table, c_ref) -> pa.Table:
    C = ray.get(c_ref)
    _, m = _to_matrix(batch)
    assign = np.argmax(_normalize(m) @ C.T, axis=1)
    return batch.append_column("cell", pa.array(assign.astype(np.int64), pa.int64()))


def _cell_min_cos_task(batch: pa.Table, c_ref) -> pa.Table:
    """Per-batch partial: min cosine between each cell's centroid and its
    members (the cell's angular radius accumulates from these)."""
    C = ray.get(c_ref)
    _, m = _to_matrix(batch)
    mn = _normalize(m)
    sims = mn @ C.T
    assign = np.argmax(sims, axis=1)
    own = sims[np.arange(len(mn)), assign]
    cells, inv = np.unique(assign, return_inverse=True)
    mins = np.full(len(cells), 2.0)
    np.minimum.at(mins, inv, own)
    return pa.table({"cell": pa.array(cells, pa.int64()), "min_cos": pa.array(mins, pa.float64())})


def build_ivf_index(sf_dir: str, n_cells: int = 16, seed: int = 42) -> str:
    """Two streaming passes over embeddings: (1) write vectors parquet-
    partitioned by nearest-centroid cell; (2) per-cell angular radius
    (min cosine to centroid) via tiny per-batch partials. Centroids and
    radii land in meta.json; the cell dirs are the index."""
    final = _index_dir("ivf", sf_dir, f"c{n_cells}_s{seed}")
    if os.path.exists(os.path.join(final, "_DONE")):
        return final
    tmp = f"{final}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)

    import functools

    C = _train_centroids(sf_dir, n_cells, seed)
    c_ref = ray.put(C)

    assigned = _emb(sf_dir).map_batches(
        functools.partial(_assign_cell_task, c_ref=c_ref), batch_format="pyarrow"
    )
    assigned.write_parquet(tmp, partition_cols=["cell"])

    partials = (
        _emb(sf_dir)
        .map_batches(functools.partial(_cell_min_cos_task, c_ref=c_ref), batch_format="pyarrow")
        .to_pandas()
    )
    radii = np.ones(len(C), dtype=np.float64)  # min_cos defaults to 1 (empty cell → zero radius)
    for cell, mc in zip(partials["cell"], partials["min_cos"]):
        radii[int(cell)] = min(radii[int(cell)], float(mc))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(
            {"kind": "ivf", "n_cells": len(C), "seed": seed,
             "centroids": C.tolist(), "min_cos": radii.tolist(), "source": sf_dir},
            f,
        )
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("ok")
    _publish(tmp, final)
    return final


def ivf_search(sf_dir: str, k: int = 10, vec_id: int = 0, n_cells: int = 16, seed: int = 42) -> pd.DataFrame:
    """EXACT top-k cosine via branch-and-bound cell pruning (module
    docstring has the bound proof sketch). Output is identical to
    knn_cosine_bruteforce by construction — shared brute-force oracle."""
    index_dir = build_ivf_index(sf_dir, n_cells, seed)
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    min_cos = np.asarray(meta["min_cos"], dtype=np.float64)
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)

    theta_qc = np.arccos(np.clip(C @ qn, -1.0, 1.0))
    radius = np.arccos(np.clip(min_cos, -1.0, 1.0))
    bound = np.cos(np.maximum(theta_qc - radius, 0.0))
    order = np.argsort(-bound)
    q_ref = ray.put(qn)

    import functools

    def scan(cells: list[int]) -> pd.DataFrame:
        dirs = [
            os.path.join(index_dir, f"cell={c}")
            for c in cells
            if os.path.isdir(os.path.join(index_dir, f"cell={c}"))
        ]
        if not dirs:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"), "cos": pd.Series([], dtype="float64")})
        return (
            ray.data.read_parquet(_parquet_files(dirs), columns=["vec_id", "embedding"])
            .map_batches(
                functools.partial(_topk_task, q_ref=q_ref, k=k),
                batch_format="pyarrow",
                batch_size=4096,
            )
            .to_pandas()
        )

    # phase 1: scan the most promising half of cells in one pruned read;
    # then ONE more pass over every remaining cell whose bound can still
    # beat the running k-th score (cells below it are pruned for good —
    # ``order`` is descending by bound). Stop is non-strict (>=): an
    # equal-bound cell must scan so an equal-score, smaller-vec_id
    # candidate can't be missed. Two pipeline launches maximum: each Ray
    # read+map pipeline has ~1s fixed cost, so fine-grained chunking costs
    # more than it prunes unless cells actually discriminate.
    half = max(1, (len(order) + 1) // 2)
    best = scan([int(c) for c in order[:half]])
    kth = float(best["cos"].nlargest(k).iloc[-1]) if len(best) >= k else -2.0
    rest = [int(c) for c in order[half:] if bound[int(c)] >= kth]
    if rest:
        best = pd.concat([best, scan(rest)], ignore_index=True)

    out = best.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    out["cos"] = out["cos"].round(3)
    return out.reset_index(drop=True)


def label_centroids(sf_dir: str, decimals: int = 5) -> pd.DataFrame:
    """Per-label mean embedding — the distributed centroid primitive under
    IVF / k-means exposed as a first-class query: per-batch partials
    (label → float64 vector sum + count) shrink each block to
    labels-per-batch rows, and the driver folds a labels-sized table (the
    same partial-aggregation shape as the corpus stats fold — nothing
    O(rows) ever reaches the driver). Output is long-form
    (label, dim, c) so the oracle compare is dtype-exact; c is rounded —
    float partial-sum ORDER differs between the engine's batch fold and
    SQL's AVG, and at 5dp over these float32 inputs both orders agree
    (the |err| is ~1e-10 relative)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // len(batch) if len(batch) else 0
        m = flat.reshape(len(batch), dim)
        ul, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(ul), dim), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(ul)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(ul, pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "sum_vec": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for label, g in parts.groupby("label", sort=True):
        total = int(g["n"].sum())
        vec = np.sum(np.stack(g["sum_vec"].to_numpy()), axis=0) / total
        for d, v in enumerate(vec):
            rows.append((int(label), d, round(float(v), decimals)))
    out = pd.DataFrame(rows, columns=["label", "dim", "c"])
    out["label"] = out["label"].astype("int64")
    out["dim"] = out["dim"].astype("int64")
    out["c"] = out["c"].astype("float64")
    return out


def label_centroids_oracle_sql(decimals: int = 5) -> str:
    return f"""
        WITH u AS (
          SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(dim - 1 AS BIGINT) AS dim,
               round(AVG(CAST(v AS DOUBLE)), {decimals}) AS c
        FROM u GROUP BY 1, 2 ORDER BY 1, 2
    """


KMEANS_K = 4
KMEANS_ITERS = 3


def kmeans(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS,
           decimals: int = 4) -> pd.DataFrame:
    """FULL Lloyd's k-means over the embedding column — the canonical
    iterative distributed-ML op (the IVF coarse quantizer's training
    loop, exposed as a first-class query). Frozen, fully deterministic
    recipe so the result is a pure function of the table:

      init        centroids = the embeddings of the k smallest vec_ids
      assign      nearest centroid by squared euclidean, ties to the
                  lowest cluster id (argmin's first-wins rule)
      update      distributed per-batch partial (cluster → float64 vector
                  sum + count) — the label_centroids shape: each block
                  shrinks to ≤ k rows, the driver folds a k-sized table,
                  nothing O(rows) ever leaves the cluster
      empty       a cluster that captures no points keeps its previous
                  centroid (frozen rule)

    ``iters`` assign+update rounds; rounds are inherently sequential
    (iteration IS Lloyd's algorithm — the same contract as BPE merges).
    Output long-form (cluster_id, n_vecs, dim, c): n_vecs from the final
    round's assignment, centroids rounded (float partial-sum order
    differs between engine fold and any replay; at 4dp over these
    float32 inputs all orders agree, the label_centroids contract).
    Hash-checked at the driver against ``kmeans_oracle_sql`` (round 5:
    the fixed iteration count unrolls as CTE pairs) and pinned by
    tests/test_functions.py::test_kmeans_matches_numpy_lloyd."""
    emb_path = f"{sf_dir}/embeddings.parquet"
    init = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    order = np.argsort(init["vec_id"].to_numpy(zero_copy_only=False))[:k]
    cents = np.stack(
        [np.asarray(init["embedding"][int(i)].as_py(), dtype=np.float64) for i in order]
    )

    ds = ray.data.read_parquet(emb_path, columns=["embedding"])
    n_vecs = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        c = cents  # rebind: the closure must capture THIS round's centroids

        def partial(batch: pa.Table, c=c) -> pa.Table:
            col = batch["embedding"].combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            m = flat.reshape(len(batch), -1)
            # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is constant per row,
            # so argmin needs only the cross and centroid-norm terms
            d2 = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
            a = np.argmin(d2, axis=1)  # first-wins tie rule
            sums = np.zeros((k, m.shape[1]), dtype=np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster_id": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
                    "n": pa.array(counts, pa.int64()),
                    "sum_vec": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        new_cents = cents.copy()
        n_vecs = np.zeros(k, dtype=np.int64)
        for cid, g in parts.groupby("cluster_id", sort=True):
            total = int(g["n"].sum())
            n_vecs[int(cid)] = total
            if total > 0:
                new_cents[int(cid)] = (
                    np.sum(np.stack(g["sum_vec"].to_numpy()), axis=0) / total
                )
        cents = new_cents
    rows = [
        (cid, int(n_vecs[cid]), d, round(float(v), decimals))
        for cid in range(k)
        for d, v in enumerate(cents[cid])
    ]
    out = pd.DataFrame(rows, columns=["cluster_id", "n_vecs", "dim", "c"])
    for col_ in ("cluster_id", "n_vecs", "dim"):
        out[col_] = out[col_].astype("int64")
    out["c"] = out["c"].astype("float64")
    return out


PQ_M = 8           # subspaces (64-dim embeddings → 8 dims per subspace)
PQ_KS = 16         # centroids per subspace (4-bit codes, 8 bytes per vector)
PQ_TRAIN_ITERS = 5
PQ_RERANK_C = 100  # exact-rerank candidate window


def _pq_train(sample: np.ndarray) -> np.ndarray:
    """Per-subspace Lloyd's k-means over the (row-normalized) training
    sample with the kmeans() frozen rules: first-PQ_KS-rows init,
    first-wins argmin ties, empty cluster keeps its centroid. Returns
    codebooks[m, PQ_KS, dsub] (float64). Pure numpy on a BOUNDED sample —
    codebooks are model state (m × 16 × dsub floats), not data."""
    m_dim = sample.shape[1] // PQ_M
    books = np.empty((PQ_M, PQ_KS, m_dim), dtype=np.float64)
    for m in range(PQ_M):
        x = sample[:, m * m_dim : (m + 1) * m_dim]
        c = x[:PQ_KS].copy()
        for _ in range(PQ_TRAIN_ITERS):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for cid in range(PQ_KS):
                sel = a == cid
                if sel.any():
                    c[cid] = x[sel].mean(axis=0)
        books[m] = c
    return books


def pq_search(sf_dir: str, k: int = 10, rerank_c: int = PQ_RERANK_C) -> pd.DataFrame:
    """Product-quantization kNN (Jégou, Douze & Schmid 2011) — the
    memory-bound scale path a 10^12-vector corpus needs (4-bit codes:
    8 bytes/vector vs 256 for float32, so a node's RAM holds 30× more
    corpus): vectors are L2-NORMALIZED (euclidean² = 2 − 2·cos, so ADC
    order == cosine order), codebooks train on a bounded deterministic
    sample (splitmix64(vec_id) even — the distributed-sample idiom), one
    vectorized map encodes every vector to PQ_M 4-bit codes, and the
    query runs as an ADC scan: per batch, distances are PQ_M table
    lookups + a sum (np.take, no float math per dim), per-batch top-C
    partials merge driver-side, and the top-C candidates get an EXACT
    rerank through a pruned is_in read. Contract (pinned by
    tests/test_functions.py::test_pq_search_recall_and_exact_rerank):
    deterministic; every returned row carries the EXACT cosine (equal to
    knn_cosine_bruteforce's for the same vec_id) in brute's total order;
    recall@k >= 0.8 on the driver corpora at the default window. The
    driver embeddings are i.i.d. gaussian (no cluster structure), the
    worst case for a quantizer — measured ADC ranks of the true top-10
    at C=100: 9/10 (sf0.001), 9/10 (sf0.01); rerank_c is the documented
    recall/scan-cost knob. Approximate by construction → no SQL oracle
    (rows-only at the driver), the IVF/LSH contract."""
    emb_path = f"{sf_dir}/embeddings.parquet"
    tbl = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids_all = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    # bounded deterministic training sample (even splitmix64 → ~half here;
    # at 10^12 vectors tighten the modulus — the sample size, not the
    # corpus, bounds training cost)
    from ..functions.dedup import _mix64

    take = _mix64(ids_all.astype(np.uint64)) % np.uint64(2) == 0
    sample = np.stack(
        [np.asarray(e.as_py(), np.float64) for e, t in zip(tbl["embedding"], take) if t]
    )
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    books = _pq_train(sample)
    m_dim = sample.shape[1] // PQ_M

    q = np.asarray(tbl["embedding"][int(np.flatnonzero(ids_all == 0)[0])].as_py(), np.float64)
    q /= np.linalg.norm(q)
    # ADC lookup table: distance from each query subvector to each centroid
    adc = np.stack(
        [
            (((books[m] - q[m * m_dim : (m + 1) * m_dim][None, :]) ** 2).sum(axis=1))
            for m in range(PQ_M)
        ]
    )  # [PQ_M, PQ_KS]

    ds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])

    def scan(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["embedding"].combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(batch), -1)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        # encode: per subspace, argmin distance to the 16 centroids
        dist = np.zeros(len(batch), dtype=np.float64)
        for sub in range(PQ_M):
            x = m[:, sub * m_dim : (sub + 1) * m_dim]
            d2 = -2.0 * (x @ books[sub].T) + (books[sub] ** 2).sum(axis=1)[None, :]
            codes = np.argmin(d2, axis=1)
            dist += adc[sub][codes]  # ADC: table lookup, no per-dim math
        top = np.argsort(dist, kind="stable")[:rerank_c]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "adc": pa.array(dist[top], pa.float64()),
            }
        )

    parts = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    cand = parts.sort_values(["adc", "vec_id"]).head(rerank_c)
    cand_ids = pa.array(sorted(int(v) for v in cand["vec_id"]), pa.int64())

    import pyarrow.compute as pc

    def exact(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch["vec_id"], value_set=cand_ids))
        if len(batch) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
        col = batch["embedding"].combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(batch), -1)
        # q is unit-norm, so cos = m·q / ||m||
        cos = (m @ q) / np.linalg.norm(m, axis=1)
        return pa.table(
            {
                "vec_id": pc.cast(batch["vec_id"], pa.int64()),
                "cos": pa.array(cos, pa.float64()),
            }
        )

    out = ds.map_batches(exact, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    out["cos"] = out["cos"].round(3)
    return out.reset_index(drop=True)


IVFPQ_NPROBE = 8     # probed cells (FAISS nprobe; 8 of 16 = half the corpus scanned)
IVFPQ_RERANK_C = 200  # wider than PQ_RERANK_C: cell pruning halves the ADC pool,
                      # so the window doubles to keep the exact-rerank recall —
                      # measured 8/10 vs 6-7/10 at 100 on the gaussian corpus


def ivfpq_search(
    sf_dir: str,
    k: int = 10,
    nprobe: int = IVFPQ_NPROBE,
    rerank_c: int = IVFPQ_RERANK_C,
    n_cells: int = 16,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF+PQ composed search — FAISS's IVFADC (Jégou et al. 2011 §IV),
    the canonical 10^12-vector serving shape this module's IVF (cell
    pruning) and PQ (8-byte codes) halves exist to compose: the query
    probes only its ``nprobe`` nearest cells BY CENTROID COSINE (the
    fixed-probe approximation — ivf_search's branch-and-bound stays the
    exact variant), candidate distances inside probed cells are ADC
    table lookups over PQ codes (no float math per dim), and the top-C
    ADC candidates get an EXACT cosine rerank through a second pruned
    read of the same cells. Both reads touch only nprobe/n_cells of the
    corpus (parquet dirs are the pruning unit — at cluster scale each
    cell dir is a locality-scheduled shard); codebooks train on the
    bounded deterministic sample (splitmix64(vec_id) even, the
    _train_centroids idiom — streamed, never a driver table read), so
    driver state is model-sized (16 centroids + 8×16 codebook rows).
    Approximate by construction (a true neighbor outside the probed
    cells is unreachable) → rows-only at the driver, the knn_pq / IVF
    contract; recall@k vs knn_cosine_bruteforce and exactness of every
    reported cosine are pinned by
    tests/test_functions.py::test_ivfpq_search_recall_and_exact_cos.
    Output (vec_id, cos 3dp) in brute's total order."""
    import functools

    index_dir = build_ivf_index(sf_dir, n_cells, seed)
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    C = np.asarray(meta["centroids"], dtype=np.float64)

    # PQ codebooks from the streamed deterministic sample (pq_search's
    # even-splitmix64 rule; sample_mod tightens at scale)
    from ..functions.dedup import _mix64

    def sample_rows(batch: pa.Table) -> pa.Table:
        ids, _ = _to_matrix(batch)
        keep = _mix64(ids.astype(np.uint64)) % np.uint64(2) == 0
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], pa.int64()),
                "embedding": col.take(np.flatnonzero(keep)),
            }
        )

    sample_tbl = (
        _emb(sf_dir)
        .map_batches(sample_rows, batch_format="pyarrow")
        .to_pandas()
        # block completion order is nondeterministic and _pq_train's init
        # is first-PQ_KS-rows — freeze the sample order by vec_id
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    sample = _normalize(np.array(sample_tbl["embedding"].tolist(), dtype=np.float64))
    books = _pq_train(sample)
    m_dim = sample.shape[1] // PQ_M

    q = query_vector(sf_dir, 0)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(C @ qn), kind="stable")[:nprobe]
    adc = np.stack(
        [
            (((books[m] - qn[m * m_dim : (m + 1) * m_dim][None, :]) ** 2).sum(axis=1))
            for m in range(PQ_M)
        ]
    )

    dirs = [
        os.path.join(index_dir, f"cell={int(c)}")
        for c in probe
        if os.path.isdir(os.path.join(index_dir, f"cell={int(c)}"))
    ]
    empty = pd.DataFrame(
        {"vec_id": pd.Series([], dtype="int64"), "cos": pd.Series([], dtype="float64")}
    )
    if not dirs:
        return empty
    files = _parquet_files(dirs)

    def adc_scan(batch: pa.Table) -> pa.Table:
        ids, m = _to_matrix(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        dist = np.zeros(len(ids), dtype=np.float64)
        for sub in range(PQ_M):
            x = m[:, sub * m_dim : (sub + 1) * m_dim]
            d2 = -2.0 * (x @ books[sub].T) + (books[sub] ** 2).sum(axis=1)[None, :]
            dist += adc[sub][np.argmin(d2, axis=1)]
        top = np.argsort(dist, kind="stable")[:rerank_c]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "adc": pa.array(dist[top], pa.float64()),
            }
        )

    parts = (
        ray.data.read_parquet(files, columns=["vec_id", "embedding"])
        .map_batches(adc_scan, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    if parts.empty:
        return empty
    cand = parts.sort_values(["adc", "vec_id"]).head(rerank_c)
    cand_ids = pa.array(sorted(int(v) for v in cand["vec_id"]), pa.int64())
    q_ref = ray.put(qn)

    def exact(batch: pa.Table, q_ref=q_ref) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_in(batch["vec_id"], value_set=cand_ids))
        if len(batch) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())}
            )
        ids, m = _to_matrix(batch)
        qv = ray.get(q_ref)
        cos = (m @ qv) / np.linalg.norm(m, axis=1)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "cos": pa.array(cos, pa.float64())}
        )

    out = (
        ray.data.read_parquet(files, columns=["vec_id", "embedding"])
        .map_batches(exact, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    out = out.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    out["cos"] = out["cos"].round(3)
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.reset_index(drop=True)


KNN_GRAPH_K = 3  # neighbors per vector (the kNN-graph construction degree)


# Per-worker slab cache: IVF cell id -> (sorted ids, row-normalized matrix).
# Loaded from the persisted cell-partitioned parquet index (shared storage at
# cluster scale — never shipped from the driver); capped so a worker holds at
# most _SLAB_CACHE_MAX cells even when the cell count grows with the corpus.
_SLAB_CACHE: dict[tuple[str, int], tuple[np.ndarray, np.ndarray]] = {}
_SLAB_CACHE_MAX = 64


def _load_cell_slab(index_dir: str, cell: int) -> tuple[np.ndarray, np.ndarray]:
    key = (index_dir, cell)
    hit = _SLAB_CACHE.get(key)
    if hit is not None:
        return hit
    cdir = os.path.join(index_dir, f"cell={cell}")
    t = pq.read_table(_parquet_files([cdir]), columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids)
    col = t["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(t) if len(t) else 0
    E = flat.reshape(len(t), dim)[order]
    slab = (ids[order], E / np.linalg.norm(E, axis=1, keepdims=True))
    if len(_SLAB_CACHE) >= _SLAB_CACHE_MAX:
        _SLAB_CACHE.pop(next(iter(_SLAB_CACHE)))
    _SLAB_CACHE[key] = slab
    return slab


def _knn_graph_ds(sf_dir: str, k: int = KNN_GRAPH_K) -> ray.data.Dataset:
    """kNN-GRAPH construction: the top-k cosine neighbors of EVERY vector
    (the all-pairs primitive under HNSW/NN-descent builds and
    graph-based near-dup clustering) — not one query's top-k but n of
    them. Round 4 made the docstring's scale path REAL: the corpus side
    is the persisted cell-partitioned IVF index (build_ivf_index — a
    streaming distributed write; the driver never reads the corpus and
    nothing corpus-sized is ray.put), and each query block branch-and-
    bounds over cell SLABS loaded worker-side from shared storage:

      per block: bound(row, cell) = cos(max(0, angle(row, centroid) −
      cell radius)) — the ivf_search bound, vectorized over the block;
      cells visit in descending block-max bound order, each cell GEMMs
      only the rows whose bound still beats their running k-th score,
      and per-row candidate pools merge under the frozen TOTAL order
      (cos DESC float64, nbr ASC), so pool-cap merges are exact — the
      union of slabs is the corpus, pruning is correctness-free.

    O(n²) worst-case flops (clustered corpora prune; this near-random
    test corpus mostly doesn't), O(n·k) shuffle bytes, per-worker memory
    = block × slab. Frozen order per vector: cos DESC (float64,
    unrounded), nbr ASC; output cos rounded 3dp. Oracle: a DOUBLE[]-cast
    cross join (float64 inside DuckDB, 1-ulp from numpy — measured) +
    row_number ≤ k; bit-identity with the full-matrix replay pinned by
    tests/test_functions.py::test_knn_graph_matches_full_matrix."""
    emb_path = f"{sf_dir}/embeddings.parquet"
    index_dir = build_ivf_index(sf_dir)
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    radius = np.arccos(np.clip(np.asarray(meta["min_cos"], dtype=np.float64), -1.0, 1.0))
    cells = [
        c for c in range(len(C))
        if os.path.isdir(os.path.join(index_dir, f"cell={c}"))
    ]

    import functools

    def block_topk(batch: pa.Table, *, k_) -> pa.Table:
        bid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["embedding"].combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(batch), -1)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        n_rows = len(bid)
        theta = np.arccos(np.clip(m @ C.T, -1.0, 1.0))            # rows × cells
        bound = np.cos(np.maximum(theta - radius[None, :], 0.0))  # rows × cells
        cap = k_ + 8  # candidate pool per row (total order makes cap-k exact; +8 is slack)
        pool_cos = np.full((n_rows, cap), -np.inf)
        pool_nbr = np.full((n_rows, cap), np.iinfo(np.int64).max, dtype=np.int64)
        kth = np.full(n_rows, -np.inf)  # -inf until a row holds k candidates

        def merge(rows: np.ndarray, cand_cos: np.ndarray, cand_nbr: np.ndarray) -> None:
            # exact top-cap under the frozen total order (cos DESC, nbr ASC):
            # stable sort by nbr ASC, then stable sort by cos DESC
            cc = np.concatenate([pool_cos[rows], cand_cos], axis=1)
            cn = np.concatenate([pool_nbr[rows], cand_nbr], axis=1)
            o1 = np.argsort(cn, axis=1, kind="stable")
            cc = np.take_along_axis(cc, o1, axis=1)
            cn = np.take_along_axis(cn, o1, axis=1)
            o2 = np.argsort(-cc, axis=1, kind="stable")[:, :cap]
            pool_cos[rows] = np.take_along_axis(cc, o2, axis=1)
            pool_nbr[rows] = np.take_along_axis(cn, o2, axis=1)
            kth[rows] = pool_cos[rows, k_ - 1]

        # descending block-max bound: promising cells first, so kth rises
        # early and later cells prune for most rows
        for c in sorted(cells, key=lambda c: -float(bound[:, c].max())):
            alive = np.flatnonzero(bound[:, c] >= kth)  # >=: equal-score, smaller-id
            if len(alive) == 0:                         # candidates must stay reachable
                continue
            sids, sE = _load_cell_slab(index_dir, c)
            cos = m[alive] @ sE.T
            cos[sids[None, :] == bid[alive][:, None]] = -np.inf  # self-similarity mask
            w = min(cap, cos.shape[1])
            if cos.shape[1] > w:  # pre-select per-row slab top-w by cos alone…
                part = np.argpartition(-cos, w - 1, axis=1)[:, :w]
            else:
                part = np.broadcast_to(np.arange(cos.shape[1]), cos.shape).copy()
            # …then merge under the total order (ties re-ordered there)
            merge(alive, np.take_along_axis(cos, part, axis=1), sids[part])

        ranks = np.broadcast_to(np.arange(1, k_ + 1, dtype=np.int32), (n_rows, k_))
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(bid, k_), pa.int64()),
                "rank": pa.array(ranks.ravel(), pa.int32()),
                "nbr_id": pa.array(pool_nbr[:, :k_].ravel(), pa.int64()),
                "cos": pa.array(pool_cos[:, :k_].ravel(), pa.float64()),
            }
        )

    return (
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
        .map_batches(
            functools.partial(block_topk, k_=k),
            batch_format="pyarrow",
            batch_size=1024,
        )
    )


def knn_graph(sf_dir: str, k: int = KNN_GRAPH_K) -> pd.DataFrame:
    """Driver-result wrapper over :func:`_knn_graph_ds` (the harness
    contract returns a DataFrame; the edge list itself never needs to
    leave the object store — pagerank_knn consumes the Dataset form)."""
    out = (
        _knn_graph_ds(sf_dir, k=k)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    out["cos"] = out["cos"].round(3)
    return out


MAXSIM_QUERY_IDS = (0, 1)  # late-interaction query token vectors


def maxsim_scores(sf_dir: str, query_ids=MAXSIM_QUERY_IDS) -> pd.DataFrame:
    """Late-interaction (ColBERT-style MaxSim) scoring with labels as
    multi-vector documents: each label's vector set is one 'document',
    the query is a small set of token vectors (the embeddings of
    ``query_ids``), and

        score(label) = Σ_q  max_{v ∈ label}  cos(q, v)

    — the sum-of-max reduction that distinguishes late interaction from
    single-vector kNN (knn_cosine_*) and from maxsim's transpose, the
    top_hits/collapse family. Distributed as per-batch (label × query)
    partial maxes (one GEMM against the broadcast query matrix, then a
    grouped np.maximum reduction) → one ≤ |labels|-row groupby(Max per
    query col) → driver sums the query columns. Scores round to 3dp
    (float64 both engines, 1-ulp max-order risk only). Output
    (label, score) ordered score DESC, label ASC — the full ranking, as
    label count is the 'collection size' here."""
    from ray.data.aggregate import Max

    emb_path = f"{sf_dir}/embeddings.parquet"
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    Q = np.stack(
        [
            np.asarray(qt["embedding"][int(np.flatnonzero(ids == q)[0])].as_py(), np.float64)
            for q in query_ids
        ]
    )
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put(Q)
    qcols = [f"mx_{i}" for i in range(len(query_ids))]

    def partial(batch: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["embedding"].combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(batch), -1)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = m @ Qm.T  # [rows, n_queries]
        ul, inv = np.unique(labels, return_inverse=True)
        mx = np.full((len(ul), cos.shape[1]), -2.0)
        np.maximum.at(mx, inv, cos)
        cols = {"label": pa.array(ul, pa.int64())}
        for i, c in enumerate(qcols):
            cols[c] = pa.array(mx[:, i], pa.float64())
        return pa.table(cols)

    agg = (
        ray.data.read_parquet(emb_path, columns=["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(*[Max(c, alias_name=c) for c in qcols])
        .to_pandas()
    )
    agg["score"] = agg[qcols].sum(axis=1).round(3)
    out = (
        agg.sort_values(["score", "label"], ascending=[False, True])
        .reset_index(drop=True)[["label", "score"]]
    )
    out["label"] = out["label"].astype("int64")
    out["score"] = out["score"].astype("float64")
    return out


INT8_LEVELS = 255  # scalar-quantization buckets (codes -128..126 via floor)


def int8_quantize_stats(sf_dir: str) -> pd.DataFrame:
    """Scalar int8 quantization of the embedding column (the ES
    int8-quantized-kNN storage recipe: per-DIMENSION min/max envelope,
    byte codes, 4× memory cut for the scale path) with a frozen
    integer-exact contract:

        code(v, d) = min(floor((v − mn_d) / (mx_d − mn_d) · 255), 254) − 128

    floor, not round — floor has identical semantics in numpy and SQL
    (no banker's-rounding divergence), so the codes replay exactly.
    Two streaming passes: (1) per-batch per-dim min/max partials → one
    64-row groupby → the envelope broadcasts via closure; (2) vectorized
    encode, folded per vector to (code_sum, code_min, code_max) — the
    codes themselves stay worker-side (at 10^12 vectors they'd be the
    written index artifact; the fold is the driver-sized audit of it).
    Output (vec_id, code_sum, code_min, code_max), all int64."""
    from ray.data.aggregate import Max, Min

    emb_path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])

    def mm_partial(batch: pa.Table) -> pa.Table:
        col = batch["embedding"].combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(batch), -1)
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
                "mn": pa.array(m.min(axis=0), pa.float64()),
                "mx": pa.array(m.max(axis=0), pa.float64()),
            }
        )

    mm = (
        ds.map_batches(mm_partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
        .sort_values("dim")
    )
    mn = mm["mn"].to_numpy()
    mx = mm["mx"].to_numpy()

    def encode(batch: pa.Table) -> pa.Table:
        col = batch["embedding"].combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(batch), -1)
        t = (m - mn) / (mx - mn)
        code = np.minimum(np.floor(t * INT8_LEVELS), INT8_LEVELS - 1).astype(np.int64) - 128
        return pa.table(
            {
                "vec_id": pc.cast(batch["vec_id"], pa.int64()),
                "code_sum": pa.array(code.sum(axis=1), pa.int64()),
                "code_min": pa.array(code.min(axis=1), pa.int64()),
                "code_max": pa.array(code.max(axis=1), pa.int64()),
            }
        )

    import pyarrow.compute as pc

    out = (
        ds.map_batches(encode, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _knn_edges_index(sf_dir: str, k: int = KNN_GRAPH_K) -> str:
    """Persisted kNN-graph edge list (vec_id, nbr_id) — the graph is an
    index artifact like the LSH/IVF dirs: built once by a streaming
    distributed write of _knn_graph_ds, then consumers (PageRank rounds,
    repeated centrality queries) read the parquet instead of re-running
    the O(n²) construction per call."""
    final = _index_dir("knng", sf_dir, f"k{k}")
    if os.path.exists(os.path.join(final, "_DONE")):
        return final
    tmp = f"{final}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        _knn_graph_ds(sf_dir, k=k)
        .map_batches(lambda b: b.select(["vec_id", "nbr_id"]), batch_format="pyarrow")
        .write_parquet(tmp)
    )
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("ok")
    _publish(tmp, final)
    return final


PR_ITERS = 5
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as a ratio (integer-frozen)
PR_TOTAL = 10**12                   # total rank mass, integer micro-units
# Below this vertex count the edge list (n·k int64 pairs) fits trivially
# in driver memory and the 5-round shuffle pipeline is pure fixed cost
# (~1-1.5s per round at any size) — run the IDENTICAL integer recurrence
# driver-local instead. Same size-gate pattern as ngram_jaccard_pairs /
# the semi-join Bloom degrade: both paths are pinned bit-equal by
# tests/test_functions.py::test_pagerank_matches_numpy_replay.
PR_LOCAL_GATE = 1_000_000


def pagerank_knn(
    sf_dir: str,
    k: int = KNN_GRAPH_K,
    iters: int = PR_ITERS,
    force_sharded: bool = False,
) -> pd.DataFrame:
    """PageRank over the kNN graph (the graph-centrality pass dedup /
    curation pipelines run on similarity graphs: high-rank nodes are
    cluster cores, low-rank nodes are outliers). Edges are knn_graph's
    (every vector → its top-k cosine neighbors, out-degree exactly k),
    and the power iteration is INTEGER-FROZEN so the result is a pure
    function of the graph — no float reduction order anywhere:

        R_0(v)     = PR_TOTAL // N
        R_{t+1}(v) = (15 · (PR_TOTAL // N)) // 100
                     + (85 · Σ_{u→v} (R_t(u) // k)) // 100

    (floor divisions frozen; total mass drifts by < N per round, the
    documented price of exactness). Round 4 sharded the rank vector: it
    lives as a hash-partitioned (vec_id, r) DATASET in the object store
    across rounds — never driver-held, never ray.put whole. Each round:

      contribs  = edges ⋈ ranks on src (Dataset.join, hash shuffle —
                  only (int64, int64) rows move) → per-batch partial
                  Σ r//k by dst
      ranks'    = union(contribs, zero rows seeded from ranks — so
                  in-degree-0 vertices keep the base term)
                  → groupby(dst).Sum → r = base + (85·s)//100

    The driver holds only scalars (n from count()//k since out-degree is
    exactly k, and the damping base); edges come from _knn_graph_ds as a
    Dataset, so nothing O(N) ever reaches the driver until the final
    harness-contract to_pandas of the RESULT. Below PR_LOCAL_GATE
    vertices the identical recurrence runs driver-local instead (the
    5-round shuffle is pure fixed cost on a graph that small); both
    paths are pinned bit-equal. Hash-checked at the driver against
    ``pagerank_oracle_sql`` (round 5: the integer-frozen recurrence
    unrolls as chained CTEs) and pinned exactly by tests/test_functions.py
    ::test_pagerank_matches_numpy_replay. Output (vec_id, pr) int64,
    id-ordered."""
    from ray.data.aggregate import Sum

    edge_files = _parquet_files([_knn_edges_index(sf_dir, k)])
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows for f in edge_files)
    n_gate = n_edges // k
    if n_gate <= PR_LOCAL_GATE and not force_sharded:
        # small-graph path: the whole edge list is n·k int64 pairs (8 MB
        # at 1M vertices, k=3 would be 48 MB); pull once, run the same
        # integer recurrence locally — zero per-round pipeline cost
        et = pq.read_table(edge_files, columns=["vec_id", "nbr_id"])
        src = et["vec_id"].to_numpy().astype(np.int64)
        dst = et["nbr_id"].to_numpy().astype(np.int64)
        verts = np.unique(np.concatenate([src, dst]))
        idx = {int(v): i for i, v in enumerate(verts)}
        src_i = np.fromiter((idx[int(v)] for v in src), np.int64, len(src))
        dst_i = np.fromiter((idx[int(v)] for v in dst), np.int64, len(dst))
        n_local = len(verts)
        init_l = PR_TOTAL // n_local
        base_l = (15 * init_l) // 100
        r = np.full(n_local, init_l, np.int64)
        for _ in range(iters):
            s = np.zeros(n_local, np.int64)
            np.add.at(s, dst_i, r[src_i] // k)
            r = base_l + (PR_DAMP_NUM * s) // PR_DAMP_DEN
        return pd.DataFrame({"vec_id": verts.astype("int64"), "pr": r.astype("int64")})

    eds = (
        ray.data.read_parquet(edge_files, columns=["vec_id", "nbr_id"])
        .repartition(8)
        .materialize()
    )
    n = eds.count() // k  # out-degree is exactly k for every vertex
    # hash-join partition count sized to the data (the local fixed cost is
    # per partition-actor; at web scale this is keys-per-node)
    n_parts = int(max(2, min(64, n // 1000)))
    init = PR_TOTAL // n
    base = (15 * init) // 100

    def seed_ranks(batch: pa.Table) -> pa.Table:
        # one rank row per vertex: the vertex set IS the embeddings table's
        # vec_id column (every vector emits exactly k out-edges), so the
        # seed is a shuffle-free projected read
        return pa.table(
            {
                "vec_id": pa.array(
                    batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
                "r": pa.array(np.full(len(batch), init, np.int64), pa.int64()),
            }
        )

    ranks = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        .map_batches(seed_ranks, batch_format="pyarrow")
        .materialize()
    )

    def contrib(batch: pa.Table, *, k_=k) -> pa.Table:
        dst = batch["nbr_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["r"].to_numpy(zero_copy_only=False).astype(np.int64) // k_
        ud, inv = np.unique(dst, return_inverse=True)
        s = np.zeros(len(ud), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"dst": pa.array(ud, pa.int64()), "s": pa.array(s, pa.int64())})

    def zero_seed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dst": batch["vec_id"],
                "s": pa.array(np.zeros(len(batch), np.int64), pa.int64()),
            }
        )

    def apply_damp(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = base + (PR_DAMP_NUM * s) // PR_DAMP_DEN
        return pa.table({"vec_id": batch["dst"], "r": pa.array(r, pa.int64())})

    for _ in range(iters):
        contribs = eds.join(
            ranks, join_type="inner", on=("vec_id",), num_partitions=n_parts
        ).map_batches(contrib, batch_format="pyarrow")
        ranks = (
            contribs.union(ranks.map_batches(zero_seed, batch_format="pyarrow"))
            .groupby("dst")
            .aggregate(Sum("s", alias_name="s"))
            .map_batches(apply_damp, batch_format="pyarrow")
            .materialize()
        )

    out = ranks.to_pandas().rename(columns={"r": "pr"})
    out = out.sort_values("vec_id").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# shared oracle fragment: the kNN digraph (identical to the knn_graph
# oracle's edge derivation — that query is hash-green, certifying the SQL
# edge set equals the persisted engine artifact)
# The frozen kNN-digraph derivation, single-sourced (SQL side): the
# DOUBLE[]-cast cosine cross-join and the (cos DESC, nbr_id) tie-break are
# shared verbatim by knn_graph / knn_triangles (__ray_entry__) and the
# pagerank edge CTE below — one definition, three oracles, so a tie-break
# or cast change cannot silently desynchronize the attested graphs.
KNN_COS_CTE = """c AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
)"""
KNN_RANK_ORDER = "ORDER BY cos DESC, nbr_id"

_KNN_EDGE_CTE = (
    "\n" + KNN_COS_CTE + """,
r AS (SELECT vec_id, nbr_id,
             row_number() OVER (PARTITION BY vec_id
                                """ + KNN_RANK_ORDER + """) AS rank
      FROM c),
e AS (SELECT vec_id AS src, nbr_id AS dst FROM r WHERE rank <= {k})
"""
)


def pagerank_oracle_sql(k: int = KNN_GRAPH_K, iters: int = PR_ITERS) -> str:
    """Exact DuckDB replay of ``pagerank_knn``: the recurrence is
    integer-frozen (floor divisions over nonnegative int64 — SQL ``//``
    agrees with numpy exactly), and ``iters`` is a fixed constant, so the
    power iteration UNROLLS as chained CTEs — no recursion, no floats."""
    edges = _KNN_EDGE_CTE.format(k=k)
    rounds = []
    for t in range(1, iters + 1):
        prev = f"pr{t - 1}"
        rounds.append(f"""pr{t} AS (
  SELECT v.vec_id,
         (SELECT base FROM k0)
         + CAST(({PR_DAMP_NUM} * COALESCE(SUM(p.r // {k}), 0)) // {PR_DAMP_DEN} AS BIGINT) AS r
  FROM v
  LEFT JOIN e ON e.dst = v.vec_id
  LEFT JOIN {prev} p ON p.vec_id = e.src
  GROUP BY v.vec_id
)""")
    chain = ",\n".join(rounds)
    return f"""
WITH {edges},
v AS (SELECT vec_id FROM embeddings),
k0 AS (SELECT CAST({PR_TOTAL} // COUNT(*) AS BIGINT) AS init,
              CAST((15 * ({PR_TOTAL} // COUNT(*))) // 100 AS BIGINT) AS base
       FROM v),
pr0 AS (SELECT vec_id, (SELECT init FROM k0) AS r FROM v),
{chain}
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(r AS BIGINT) AS pr
FROM pr{iters} ORDER BY vec_id
"""


# 1-based dimension indices, driven by the table's own vector length (no
# hardcoded dim cap — a silent truncation here would make the oracle wrong,
# not fail)
_DIMS_CTE = (
    "dims AS MATERIALIZED (SELECT unnest(range(1, "
    "(SELECT len(any_value(CAST(embedding AS DOUBLE[]))) + 1 FROM embeddings))) AS i)"
)


def kmeans_oracle_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                      decimals: int = 4) -> str:
    """DuckDB replay of the frozen Lloyd's recipe in ``kmeans`` — the
    iteration count is a constant so assign+update rounds unroll as CTE
    pairs. The assignment score mirrors the engine's exact form
    (−2·x·c + c·c, ties to the lowest cluster id); float partial-sum
    order differs between the two engines but the output rounds to
    ``decimals`` where all orders agree (the documented contract the
    numpy-replay pytest already certifies).

    RESIDUAL RISK (documented, accepted): the rounding protects the
    centroid OUTPUT values, not the unrounded argmin that assigns
    vectors — a vector NEARLY equidistant to two centroids could flip
    labels between BLAS-blocked and SQL-sequential summation and fail
    the hash on some other corpus. On the driver's fixed sf corpora the
    minimum assignment margin is far above float64 noise (gate green
    every round); a margin-asserting variant would need integer-grid
    embeddings, which the synthetic tables do not provide. A second,
    smaller residual: DuckDB round() is half-away-from-zero while
    np.round is half-to-even, so a value landing EXACTLY on a 4dp
    midpoint (requires dyadic-rational inputs — not producible by these
    random-float corpora) would also diverge; same acceptance
    rationale, and it applies to top_pc_oracle_sql too."""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f"""a{t} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY -2 * list_inner_product(e.v, c.v)
                      + list_inner_product(c.v, c.v), c.cid) AS rn
    FROM e CROSS JOIN c{t - 1} c
  ) WHERE rn = 1
),
c{t} AS (
  SELECT c.cid, CASE WHEN g.mv IS NULL THEN c.v ELSE g.mv END AS v
  FROM c{t - 1} c LEFT JOIN (
    SELECT cid, list(s / cnt ORDER BY dim) AS mv FROM (
      SELECT a.cid, d.i AS dim, SUM(a.v[d.i]) AS s, COUNT(*) AS cnt
      FROM a{t} a, dims d GROUP BY 1, 2
    ) GROUP BY cid
  ) g ON g.cid = c.cid
)""")
    chain = ",\n".join(rounds)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
{_DIMS_CTE},
c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
       FROM (SELECT * FROM e ORDER BY vec_id LIMIT {k})),
{chain}
SELECT CAST(c.cid AS BIGINT) AS cluster_id,
       CAST(COALESCE(nv.cnt, 0) AS BIGINT) AS n_vecs,
       CAST(d.i - 1 AS BIGINT) AS dim,
       round(c.v[d.i], {decimals}) AS c
FROM c{iters} c
LEFT JOIN (SELECT cid, COUNT(*) AS cnt FROM a{iters} GROUP BY 1) nv
       ON nv.cid = c.cid, dims d
ORDER BY cluster_id, dim
"""


PCA_ITERS = 20
PCA_DECIMALS = 4


def top_pc_oracle_sql(iters: int = PCA_ITERS) -> str:
    """DuckDB replay of ``embedding_top_pc``: exact moment fold (Σx,
    Σxxᵀ over DOUBLE), then the fixed-count power iteration unrolled as
    (matvec, normalize) CTE pairs. Loadings/eigenvalue round to
    PCA_DECIMALS — power iteration contracts perturbations toward the
    dominant eigenvector, so the cross-engine float-sum-order noise is
    far below the rounding."""
    rounds = []
    for t in range(1, iters + 1):
        # MATERIALIZED: each round is referenced by the next round AND by
        # its own norm subquery — inlining would re-expand the whole chain
        # (and re-open the parquet view) exponentially
        rounds.append(f"""w{t} AS MATERIALIZED (
  SELECT cm.i, SUM(cm.c * v{t - 1}.val) AS val
  FROM cm JOIN v{t - 1} ON v{t - 1}.i = cm.j GROUP BY 1
),
v{t} AS MATERIALIZED (SELECT i, val / (SELECT sqrt(SUM(val * val)) FROM w{t}) AS val FROM w{t})""")
    chain = ",\n".join(rounds)
    last = f"v{iters}"
    return f"""
WITH e AS MATERIALIZED (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
{_DIMS_CTE},
n AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e),
mu AS MATERIALIZED (SELECT d.i, SUM(e.v[d.i]) / (SELECT n FROM n) AS m
       FROM e, dims d GROUP BY 1),
cm AS MATERIALIZED (
  SELECT s.i, s.j, s.sxx / (SELECT n FROM n) - m1.m * m2.m AS c
  FROM (SELECT d1.i AS i, d2.i AS j, SUM(e.v[d1.i] * e.v[d2.i]) AS sxx
        FROM e, dims d1, dims d2 GROUP BY 1, 2) s
  JOIN mu m1 ON m1.i = s.i JOIN mu m2 ON m2.i = s.j
),
v0 AS (SELECT i, 1.0 / sqrt((SELECT COUNT(*) FROM dims)) AS val FROM dims),
{chain},
eig AS (SELECT SUM(a.val * cm.c * b.val) AS e
        FROM cm JOIN {last} a ON a.i = cm.i JOIN {last} b ON b.i = cm.j),
sgn AS (SELECT CASE WHEN (SELECT val FROM {last}
                          ORDER BY abs(val) DESC, i LIMIT 1) < 0
                    THEN -1.0 ELSE 1.0 END AS s)
SELECT CAST(i - 1 AS BIGINT) AS dim,
       round((SELECT s FROM sgn) * val, {PCA_DECIMALS}) AS loading,
       round((SELECT e FROM eig), {PCA_DECIMALS}) AS eigenvalue
FROM {last} ORDER BY dim
"""


def embedding_top_pc(sf_dir: str, iters: int = PCA_ITERS) -> pd.DataFrame:
    """Top principal component of the embedding column — the
    dimensionality-reduction member of the distributed-ML family
    (kmeans / NB / PageRank / BPE): the covariance MOMENTS are the only
    distributed work (per-batch Σx and Σxxᵀ partials — the
    label_centroids shape, each block shrinking to one d-vector and one
    d×d block), then the driver folds C = Σxxᵀ/n − μμᵀ and runs ``iters``
    power-iteration rounds on the d×d matrix (d = 64 — driver state is
    model-sized, never data-sized). Frozen determinism contract: the
    driver math is a pure function of the folded moments; float64
    moment sums are reduction-order exact to ~1 ulp, and loadings round
    to PCA_DECIMALS. Sign frozen: the loading with the largest absolute
    value is made positive. Output (dim, loading, eigenvalue) —
    hash-checked at the driver against ``top_pc_oracle_sql`` (round 5)
    and pinned by a numpy whole-corpus replay test at matching
    tolerance."""
    emb_path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(emb_path, columns=["embedding"])

    def moments(batch: pa.Table) -> pa.Table:
        col = batch["embedding"].combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(batch), -1)
        d = m.shape[1]
        return pa.table(
            {
                "n": pa.array([len(m)], pa.int64()),
                "sx": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
                "sxx": pa.array([(m.T @ m).ravel()], pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    sx = np.sum(np.stack(parts["sx"].to_numpy()), axis=0)
    d = len(sx)
    sxx = np.sum(np.stack(parts["sxx"].to_numpy()), axis=0).reshape(d, d)
    mu = sx / n
    C = sxx / n - np.outer(mu, mu)

    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        v = C @ v
        v /= np.linalg.norm(v)
    eig = float(v @ C @ v)
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    out = pd.DataFrame(
        {
            "dim": np.arange(d, dtype=np.int64),
            "loading": np.round(v, PCA_DECIMALS),
            "eigenvalue": np.round(np.full(d, eig), PCA_DECIMALS),
        }
    )
    out["dim"] = out["dim"].astype("int64")
    return out


def knn_triangles(sf_dir: str, k: int = KNN_GRAPH_K) -> pd.DataFrame:
    """Triangle census + global transitivity of the UNDIRECTED kNN graph
    — the graph-analytics companion to pagerank_knn over the same
    persisted edge artifact. Undirected edge = the canonical (min,max)
    of any directed kNN edge; a triangle {a<b<c} is counted exactly once
    as the wedge centered at its minimum vertex with a closing edge.

    Fully shuffle-native (NO corpus-sized driver state): canonical
    distinct edges via one int64-key groupby; wedges-for-counting via a
    hash self-join of the edge Dataset on the low endpoint; closing
    edges via a LEFT SEMI join of wedge rows against the edge set; the
    transitivity denominator Σ d(d−1)/2 via a degree groupby folded to
    per-block scalars. Driver holds five integers. transitivity_milli =
    3·triangles·1000 // wedges (integer-frozen). Oracle: the knn_graph
    DOUBLE[] cross-join digraph, canonicalized and 3-way self-joined in
    SQL. vec_ids must fit below 1e9 for the packed edge key (driver
    scales; at larger ids swap the pack for a two-column groupby)."""
    import ray.data

    B = np.int64(10**9)
    eds = ray.data.read_parquet(
        _parquet_files([_knn_edges_index(sf_dir, k)]),
        columns=["vec_id", "nbr_id"],
    ).repartition(8)

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["nbr_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.minimum(a, b) * B + np.maximum(a, b)
        return pa.table({"key": pa.array(np.unique(key), pa.int64())})

    ekeys = eds.map_batches(canon, batch_format="pyarrow").groupby("key").count()

    def split(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(key // B, pa.int64()),
                         "v": pa.array(key % B, pa.int64())})

    e = ekeys.map_batches(split, batch_format="pyarrow").materialize()
    n_edges = e.count()
    n_parts = int(max(2, min(64, n_edges // 1000)))

    def deg_rows(batch: pa.Table) -> pa.Table:
        x = np.r_[batch["u"].to_numpy(zero_copy_only=False),
                  batch["v"].to_numpy(zero_copy_only=False)].astype(np.int64)
        ux, c = np.unique(x, return_counts=True)
        return pa.table({"x": pa.array(ux, pa.int64()),
                         "d": pa.array(c.astype(np.int64), pa.int64())})

    def wedge_partial(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64())})

    from ray.data.aggregate import Sum as _Sum

    wedges = int(
        e.map_batches(deg_rows, batch_format="pyarrow")
        .groupby("x").aggregate(_Sum("d", alias_name="d"))
        .map_batches(wedge_partial, batch_format="pyarrow")
        .to_pandas()["w"].sum()
    )
    wedge_rows = e.join(
        e, join_type="inner", num_partitions=n_parts, on=("u",),
        left_suffix="_l", right_suffix="_r",
    ).map_batches(
        lambda t: (lambda vl, vr: pa.table(
            {"u": pa.array(vl[vl < vr], pa.int64()),
             "v": pa.array(vr[vl < vr], pa.int64())}
        ))(t["v_l"].to_numpy(zero_copy_only=False).astype(np.int64),
           t["v_r"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow",
    )
    tri = wedge_rows.join(
        e, join_type="left_semi", num_partitions=n_parts, on=("u", "v")
    ).count()
    n_vertices = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).count()
    return pd.DataFrame(
        {
            "n_vertices": [n_vertices],
            "n_edges": [n_edges],
            "n_wedges": [wedges],
            "n_triangles": [tri],
            "transitivity_milli": [3 * tri * 1000 // wedges if wedges else 0],
        }
    ).astype("int64")


# ---------------------------------------------------------------------------
# Binary quantization (BBQ-style): 1-bit sign codes, Hamming shortlist,
# exact rerank
# ---------------------------------------------------------------------------

BBQ_SHORTLIST = 50


def _bbq_task(batch: pa.Table, q_ref, shortlist: int) -> pa.Table:
    """Per-batch BBQ partial: sign-bit Hamming distance to the broadcast
    query code + exact cosine, top-``shortlist`` rows by (ham ASC,
    vec_id ASC). Both metrics come out of the one pass over the batch, so
    the rerank never refetches vectors."""
    qn, qbits = ray.get(q_ref)
    ids, m = _to_matrix(batch)
    bits = m > 0.0
    ham = np.count_nonzero(bits != qbits[None, :], axis=1).astype(np.int64)
    cos = _normalize(m) @ qn
    order = np.lexsort((ids, ham))[:shortlist]
    return pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "ham": pa.array(ham[order], pa.int64()),
            "cos": pa.array(cos[order], pa.float64()),
        }
    )


def knn_bbq(sf_dir: str, k: int = 10, vec_id: int = 0,
            shortlist: int = BBQ_SHORTLIST) -> pd.DataFrame:
    """Binary-quantized kNN (the Elasticsearch 8.16 "BBQ" / classic
    1-bit-per-dim shape): every dimension quantizes to its SIGN bit
    (64 dims -> a 64-bit code, a 32x memory cut vs float32 — the reason
    this family exists at 10^12 vectors), candidates rank by HAMMING
    distance between codes (one XOR+popcount per comparison — no float
    math touches the wide scan), the top-``shortlist`` by the frozen
    (ham ASC, vec_id ASC) order are exact-reranked with true cosines,
    and the page is the shortlist's top-k by (cos DESC, vec_id ASC).

    Distribution shape: the code scan is per-batch partials against one
    broadcast (query vector, query code) pair — same streaming plan as
    knn_cosine_bruteforce, but at scale the corpus side is the packed
    1-bit code table (vocabulary of codes ships where vectors cannot);
    the shortlist merge is O(shortlist) rows on the driver and only the
    shortlist's vectors are ever touched by float math. Deterministic
    end to end (sign(x) > 0 is exact in float32 and float64 alike), so
    the DuckDB oracle replays the full algorithm — quantization,
    Hamming shortlist, exact rerank — and this is hash-checked, unlike
    the recall-bounded PQ/IVFPQ entries. Output (vec_id, ham, cos 3dp),
    order (cos DESC, vec_id ASC) within the reranked page."""
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    qbits = q > 0.0
    q_ref = ray.put((qn, qbits))

    import functools

    parts = (
        _emb(sf_dir)
        .map_batches(
            functools.partial(_bbq_task, q_ref=q_ref, shortlist=shortlist),
            batch_format="pyarrow",
            batch_size=4096,
        )
        .to_pandas()
    )
    short = parts.sort_values(["ham", "vec_id"]).head(shortlist)
    page = short.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    page["cos"] = page["cos"].round(3)
    return page[["vec_id", "ham", "cos"]].reset_index(drop=True)


def bbq_oracle_sql(k: int = 10, vec_id: int = 0, dim: int = 64,
                   shortlist: int = BBQ_SHORTLIST) -> str:
    """DuckDB replay of knn_bbq's exact semantics: per-dim sign mismatch
    sum (the Hamming distance between sign codes — float-width-proof:
    ``x > 0`` agrees in float32 and float64), shortlist by (ham ASC,
    vec_id ASC), exact-cosine rerank of the shortlist only."""
    ham = " + ".join(
        f"(CASE WHEN (e.embedding[{d + 1}] > 0) <> (q.embedding[{d + 1}] > 0) THEN 1 ELSE 0 END)"
        for d in range(dim)
    )
    return f"""
        WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {vec_id}),
        h AS (SELECT e.vec_id, e.embedding, CAST(({ham}) AS BIGINT) AS ham
              FROM embeddings e, q),
        short AS (SELECT * FROM h ORDER BY ham, vec_id LIMIT {shortlist})
        SELECT s.vec_id, s.ham,
               round(CAST(list_cosine_similarity(s.embedding, q.embedding) AS DOUBLE), 3) AS cos
        FROM short s, q
        ORDER BY list_cosine_similarity(s.embedding, q.embedding) DESC, s.vec_id
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Graph-based ANN serving (HNSW/NSW layer-0 shape): greedy best-first
# search over the persisted kNN edge artifact
# ---------------------------------------------------------------------------

GS_DEGREE = 8   # out-degree of the search graph (denser than KNN_GRAPH_K=3)
GS_EF = 32      # candidate-list width (HNSW's ef_search)
GS_BEAM = 4     # nodes expanded per round (round-synchronous batch expansion)
GS_MAX_ROUNDS = 512  # hard backstop; the threshold rule is the real stop


def knn_graph_search(sf_dir: str, k: int = 10, vec_id: int = 0,
                     ef: int = GS_EF, beam: int = GS_BEAM) -> pd.DataFrame:
    """Graph-traversal ANN (the HNSW/NSW SERVING shape — Lucene 9 / ES 8
    answer every knn query this way): greedy best-first walk over the
    persisted kNN edge artifact instead of any corpus scan. The frozen
    walk rule (replayed verbatim by the sequential test):

      entry      = vec_id 0 (the frozen entry point; HNSW's top layer
                   picks one the same way — it only needs to be fixed)
      visited    = {entry: cos(entry)}
      each round: the top-``beam`` UNEXPANDED visited nodes by
                  (cos DESC, vec_id ASC); STOP when every one of them
                  scores below the ef-threshold (the ef-th best visited
                  cos; -inf while |visited| < ef) — the HNSW
                  candidate-list termination — else expand: fetch their
                  out-neighbors from the edge artifact, score the unseen
                  ones against the query, add to visited.
      page       = top-k of visited by (cos DESC, vec_id ASC), cos 3dp.

    Distribution shape: the graph walk is inherently sequential (that is
    THE trade graph indexes make: O(ef·degree) point fetches of vectors
    +adjacency instead of a scan), so each round's neighbor fetch is a
    predicate-pushdown point read of the edge and embedding tables —
    the GET/_mget idiom. At cluster scale both artifacts shard by
    vec_id range and a round is one targeted RPC per owning shard
    (≤ beam·degree ids); the coordinator state is O(ef), never
    corpus-shaped. Deterministic end to end (frozen entry, frozen tie
    order, float64 cosines), but the result quality depends on graph
    degree — approximate by construction, so rows-only at the driver
    with the walk replay + recall floor pinned by
    tests/test_functions.py::test_knn_graph_search_matches_walk_replay."""
    edges_dir = _knn_edges_index(sf_dir, k=GS_DEGREE)
    emb_path = f"{sf_dir}/embeddings.parquet"
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)

    def fetch_vecs(ids: list[int]) -> dict[int, float]:
        t = pq.read_table(emb_path, columns=["vec_id", "embedding"],
                          filters=[("vec_id", "in", ids)])
        vids, m = _to_matrix(t)
        cos = _normalize(m) @ qn
        return {int(v): float(c) for v, c in zip(vids, cos)}

    def fetch_nbrs(ids: list[int]) -> list[int]:
        t = pq.read_table(edges_dir, columns=["vec_id", "nbr_id"],
                          filters=[("vec_id", "in", ids)])
        return sorted(set(t["nbr_id"].to_pylist()))

    entry = 0
    visited: dict[int, float] = fetch_vecs([entry])
    expanded: set[int] = set()
    for _ in range(GS_MAX_ROUNDS):
        unexp = sorted(
            (v for v in visited if v not in expanded),
            key=lambda v: (-visited[v], v),
        )[:beam]
        if not unexp:
            break
        top = sorted(visited.items(), key=lambda kv: (-kv[1], kv[0]))
        thresh = top[ef - 1][1] if len(top) >= ef else -np.inf
        if all(visited[v] < thresh for v in unexp):
            break
        expanded.update(unexp)
        new_ids = [n for n in fetch_nbrs(unexp) if n not in visited]
        if new_ids:
            visited.update(fetch_vecs(new_ids))
    page = sorted(visited.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(
        {
            "vec_id": pd.Series([v for v, _ in page], dtype="int64"),
            "cos": pd.Series([round(c, 3) for _, c in page], dtype="float64"),
        }
    )
