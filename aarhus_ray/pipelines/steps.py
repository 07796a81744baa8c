"""Minimal user-extension pipeline-step API (SURVEY.md §2.11).

A ``Step`` names one transform; ``build_pipeline`` applies a sequence to a
Dataset with the right Ray Data primitive per kind; ``REGISTRY`` lets the
CLI / driver harness enumerate composable stages. No plugin loading from
disk (out of scope).

    Step("extract", ExtractUDF, kind="actor", batch_size=256)
    Step("lang", make_lang_filter(("en",)), kind="map")
    ds = build_pipeline(ds, [REGISTRY["extract"], ...])
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import ray.data


@dataclass(frozen=True)
class Step:
    name: str
    fn: Any  # batch fn (kind="map"/"filter") or callable class (kind="actor")
    kind: str = "map"  # "map" | "filter" | "actor"
    batch_size: int | None = None
    concurrency: tuple[int, int] | int | None = None
    fn_constructor_args: tuple = ()
    schema_out: pa.Schema | None = None


def apply_step(ds: ray.data.Dataset, step: Step) -> ray.data.Dataset:
    if step.kind == "map":
        return ds.map_batches(step.fn, batch_format="pyarrow", batch_size=step.batch_size)
    if step.kind == "filter":
        # filter steps are boolean-mask map_batches (vectorized; ray_guide)
        def masked(batch: pa.Table, _fn=step.fn) -> pa.Table:
            return batch.filter(_fn(batch))

        return ds.map_batches(masked, batch_format="pyarrow", batch_size=step.batch_size)
    if step.kind == "actor":
        return ds.map_batches(
            step.fn,
            batch_format="pyarrow",
            batch_size=step.batch_size,
            concurrency=step.concurrency or (1, 4),
            fn_constructor_args=step.fn_constructor_args,
        )
    raise ValueError(f"unknown step kind {step.kind!r}")


def build_pipeline(ds: ray.data.Dataset, steps: list[Step]) -> ray.data.Dataset:
    """Apply steps in order; validates declared output schemas when given."""
    for step in steps:
        ds = apply_step(ds, step)
        if step.schema_out is not None:
            from .. import schemas

            schemas.validate(ds.schema().base_schema, step.schema_out, allow_subset=True)
    return ds


def default_registry() -> dict[str, Step]:
    """Built-in composable stages over the pages schema."""
    from ..stages.extract_stage import ExtractUDF, prep_batch_fn

    return {
        "prep": Step("prep", prep_batch_fn(None, 64), kind="map"),
        "extract": Step("extract", ExtractUDF, kind="actor", batch_size=256),
    }


REGISTRY: dict[str, Step] = {}


def register(step: Step) -> Step:
    REGISTRY[step.name] = step
    return step


# built-ins are available immediately (REGISTRY["extract"], ...)
REGISTRY.update(default_registry())
