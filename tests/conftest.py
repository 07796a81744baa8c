"""Pytest wiring: ONE Ray session per test session (driver rule)."""

from __future__ import annotations

import shutil

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def golden_index(tmp_path_factory):
    """Build the golden-config index once per session: 1000 pages, seed 42,
    P=8, S=2, n_salts=4 — the exact config tests/golden/* was generated
    with (tools/gen_goldens.py)."""
    from aarhus_ray import fixtures
    from aarhus_ray.pipelines.build import build_index

    root = tmp_path_factory.mktemp("golden")
    pages = str(root / "pages")
    fixtures.write_pages_dir(pages, 1000, seed=42, rows_per_file=250)
    out = str(root / "index")
    stats = build_index(pages, out, num_partitions=8, num_segments=2, n_salts=4)
    yield {"pages": pages, "index": out, "stats": stats}
    shutil.rmtree(str(root), ignore_errors=True)
