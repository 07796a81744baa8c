"""Generic Ray-Data operators over the driver's synthetic tables
(TESTDATA.md): relational queries, dedup family, ANN, text analysis,
windowed/stream-shaped aggregates, multimodal plumbing.

Every public function takes ``sf_dir`` (a testdata directory) and returns a
small result (pyarrow Table / pandas DataFrame / Ray Dataset) whose column
NAMES and deterministic ORDER match the DuckDB oracle SQL registered in
``__ray_entry__.oracle_sql`` (driver correctness gate).

Scale idioms used throughout (SURVEY.md §4, ray_guide):
- column pruning at the read;
- pre-aggregation inside map_batches before any groupby shuffle;
- broadcast (ray.put) small sides instead of shuffle joins;
- vectorized pyarrow.compute / numpy kernels, no per-row Python in hot paths.
"""
