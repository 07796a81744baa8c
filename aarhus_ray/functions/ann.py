"""Similarity search over the ``embeddings`` table (list<float> column).

- ``knn_cosine_bruteforce``: exact top-k cosine — per-batch numpy matmul
  against a BROADCAST query matrix (ray.put once), per-batch top-k partials,
  tiny global merge. The baseline and the oracle-checked path.
- ``knn_cosine_lsh``: random-hyperplane LSH bucketing — the 100TB scale
  path: probe only buckets whose signature is within ``max_flip`` bits of
  the query's, so each task touches a fraction of the corpus. Approximate;
  recall is reported against brute force (rows-only driver check).
- ``ivf_build/ivf_search``: IVF-style variant — k-means-ish centroids from a
  seeded sample, vectors bucketed by nearest centroid (a groupby), queries
  probe the ``nprobe`` nearest centroid buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data


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
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t["vec_id"].to_pylist().index(vec_id)
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


def knn_cosine_bruteforce(sf_dir: str, k: int = 10, vec_id: int = 0) -> pd.DataFrame:
    """Exact top-k by cosine to embeddings[vec_id]. Output (vec_id, cos
    rounded to 3dp) ordered (cos DESC, vec_id ASC) — rounding chosen because
    DuckDB's list_cosine_similarity computes in float32 (~1e-8 error)."""
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    class BatchTopK:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _to_matrix(batch)
            sims = _normalize(m) @ self.q
            order = np.lexsort((ids, -sims))[:k]
            return pa.table(
                {
                    "vec_id": pa.array(ids[order], pa.int64()),
                    "cos": pa.array(sims[order], pa.float64()),
                }
            )

    parts = (
        _emb(sf_dir)
        .map_batches(BatchTopK, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4))
        .to_pandas()
    )
    parts = parts.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    parts["cos"] = parts["cos"].round(3)
    return parts.reset_index(drop=True)


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim))


def knn_cosine_lsh(sf_dir: str, k: int = 10, vec_id: int = 0, n_bits: int = 8, max_flip: int = 1) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane signatures bucket the corpus
    (groupby), the query probes its own bucket plus all buckets within
    ``max_flip`` bit flips. Returns (vec_id, cos 3dp, recall_at_k vs brute)."""
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    H = _hyperplanes(len(q), n_bits)
    q_sig = int(((H @ qn) > 0).astype(np.uint32) @ (1 << np.arange(n_bits, dtype=np.uint32)))
    probe = {q_sig}
    if max_flip >= 1:
        for b in range(n_bits):
            probe.add(q_sig ^ (1 << b))
    probe_arr = pa.array(sorted(probe), pa.int64())
    h_ref = ray.put((H, qn))

    class SigScore:
        def __init__(self):
            self.H, self.q = ray.get(h_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids, m = _to_matrix(batch)
            mn = _normalize(m)
            sigs = ((mn @ self.H.T) > 0).astype(np.uint32) @ (1 << np.arange(self.H.shape[0], dtype=np.uint32))
            t = pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "sig": pa.array(sigs.astype(np.int64), pa.int64()),
                    "cos": pa.array(mn @ self.q, pa.float64()),
                }
            )
            return t.filter(pc.is_in(t["sig"], value_set=probe_arr))

    cand = (
        _emb(sf_dir)
        .map_batches(SigScore, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4))
        .to_pandas()
    )
    cand = cand.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    exact = set(knn_cosine_bruteforce(sf_dir, k, vec_id)["vec_id"])
    recall = len(set(cand["vec_id"]) & exact) / max(1, len(exact))
    cand = cand[["vec_id", "cos"]].reset_index(drop=True)
    cand["cos"] = cand["cos"].round(3)
    cand["recall_at_k"] = round(recall, 3)
    return cand


def ivf_search(sf_dir: str, k: int = 10, vec_id: int = 0, n_cells: int = 16, nprobe: int = 4, sample: int = 256, seed: int = 42) -> pd.DataFrame:
    """IVF variant: centroids = seeded sample + a few Lloyd iterations on
    the driver (tiny); corpus bucketed by nearest centroid via map_batches;
    query scans the nprobe nearest cells. Returns (vec_id, cos 3dp,
    recall_at_k)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    E = _normalize(np.array(t["embedding"].to_pylist(), dtype=np.float64))
    rng = np.random.RandomState(seed)
    sample_idx = rng.choice(len(E), size=min(sample, len(E)), replace=False)
    C = E[sample_idx[:n_cells]].copy()
    for _ in range(5):
        assign = np.argmax(E[sample_idx] @ C.T, axis=1)
        for c in range(n_cells):
            members = E[sample_idx][assign == c]
            if len(members):
                v = members.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    q = query_vector(sf_dir, vec_id)
    qn = q / np.linalg.norm(q)
    cells = set(np.argsort(-(C @ qn))[:nprobe].tolist())
    refs = ray.put((C, qn, cells))

    class CellScore:
        def __init__(self):
            self.C, self.q, self.cells = ray.get(refs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            b_ids, m = _to_matrix(batch)
            mn = _normalize(m)
            assign = np.argmax(mn @ self.C.T, axis=1)
            mask = np.isin(assign, list(self.cells))
            return pa.table(
                {
                    "vec_id": pa.array(b_ids[mask], pa.int64()),
                    "cos": pa.array(mn[mask] @ self.q, pa.float64()),
                }
            )

    cand = (
        _emb(sf_dir)
        .map_batches(CellScore, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4))
        .to_pandas()
    )
    cand = cand.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    exact = set(knn_cosine_bruteforce(sf_dir, k, vec_id)["vec_id"])
    recall = len(set(cand["vec_id"]) & exact) / max(1, len(exact))
    cand = cand[["vec_id", "cos"]].reset_index(drop=True)
    cand["cos"] = cand["cos"].round(3)
    cand["recall_at_k"] = round(recall, 3)
    return cand
