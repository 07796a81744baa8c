"""Geo aggregations over the events stream (ES geo_bounds, geotile_grid,
geo_distance parity surfaces).

The driver tables carry no coordinates, so events get a synthetic geo_point
docvalue derived from event_id with the same multiplicative-mod recipe as
the fulltext crawl timestamp (fulltext.doc_ts_us): integer MICRODEGREES,

    lat_u = ((event_id % GEO_LAT_MOD) * GEO_LAT_MULT) % GEO_LAT_MOD - 85_000_000
    lon_u = ((event_id % GEO_LON_MOD) * GEO_LON_MULT) % GEO_LON_MOD - 180_000_000

lat ∈ [-85°, +85°] (the web-mercator clamp), lon ∈ [-180°, +180°).
Everything that CAN stay integer does: the grid op buckets microdegrees
with pure int64 arithmetic (an equirectangular grid standing in for ES's
mercator geotile — frozen this way so tile ids are bit-exact in any
engine, no transcendental at a floor() boundary), and geo_bounds folds
integer min/max. Only geo_distance touches floats (haversine), with the
same measure-zero boundary caveat as every float-filter oracle here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum

GEO_LAT_MULT = 2_654_435_761
GEO_LAT_MOD = 170_000_001
GEO_LON_MULT = 2_246_822_519
GEO_LON_MOD = 360_000_000

GRID_ZOOM = 6          # 2^6 × 2^6 equirectangular grid
GRID_TOP = 20

GD_LAT, GD_LON = 10.0, 20.0   # geo_distance origin (degrees)
GD_RADIUS_M = 3_000_000.0     # 3000 km
EARTH_R_M = 6_371_000.0


def _events(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def geo_point_u(event_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The frozen synthetic geo_point docvalue, integer microdegrees.

    event_id is reduced mod GEO_*_MOD BEFORE the multiply: (a*b) % m ==
    ((a%m)*b) % m, and (MOD-1)*MULT < 2^63, so the recipe stays exact in
    int64 at any event_id — the naive ``id * MULT`` form silently wraps
    numpy int64 (where BIGINT oracles would error) from id ≈ 3.5e9, well
    under the 10^12-row posture."""
    ids = event_ids.astype(np.int64)
    lat_u = ((ids % GEO_LAT_MOD) * GEO_LAT_MULT) % GEO_LAT_MOD - 85_000_000
    lon_u = ((ids % GEO_LON_MOD) * GEO_LON_MULT) % GEO_LON_MOD - 180_000_000
    return lat_u, lon_u


def geo_bounds(sf_dir: str) -> pd.DataFrame:
    """ES geo_bounds aggregation per event_type: the tightest lat/lon
    bounding box around each type's events, in integer microdegrees —
    per-batch min/max partials, one tiny groupby, everything int64 and
    hash-exact."""

    def partial(batch: pa.Table) -> pa.Table:
        lat_u, lon_u = geo_point_u(batch["event_id"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "lat_u": lat_u,
                "lon_u": lon_u,
            }
        )
        g = df.groupby("event_type", sort=False).agg(
            min_lat_u=("lat_u", "min"), max_lat_u=("lat_u", "max"),
            min_lon_u=("lon_u", "min"), max_lon_u=("lon_u", "max"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    out = (
        _events(sf_dir, ["event_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Min("min_lat_u", alias_name="min_lat_u"),
            Max("max_lat_u", alias_name="max_lat_u"),
            Min("min_lon_u", alias_name="min_lon_u"),
            Max("max_lon_u", alias_name="max_lon_u"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def geo_grid(sf_dir: str, zoom: int = GRID_ZOOM, top: int = GRID_TOP) -> pd.DataFrame:
    """ES geotile_grid-shaped aggregation: bucket events into a
    2^zoom × 2^zoom grid and return the ``top`` fullest cells. The grid is
    EQUIRECTANGULAR over the microdegree ints (pure int64 floor-division —
    no mercator tan/ln at a floor boundary), a deliberate freeze so the
    tile ids replay bit-exactly in SQL:

        tile_x = (lon_u + 180e6) * 2^zoom // GEO_LON_MOD
        tile_y = (lat_u +  85e6) * 2^zoom // GEO_LAT_MOD

    Per-batch (tile → count) partials → one small groupby → driver top-k
    by (n_events DESC, tile_x, tile_y)."""
    n = 1 << zoom

    def partial(batch: pa.Table) -> pa.Table:
        lat_u, lon_u = geo_point_u(batch["event_id"].to_numpy(zero_copy_only=False))
        tx = (lon_u + 180_000_000) * n // GEO_LON_MOD
        ty = (lat_u + 85_000_000) * n // GEO_LAT_MOD
        tid = tx * n + ty
        ut, cnt = np.unique(tid, return_counts=True)
        return pa.table(
            {
                "tile": pa.array(ut, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        _events(sf_dir, ["event_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("tile")
        .aggregate(Sum("n", alias_name="n_events"))
        .to_pandas()
    )
    agg["tile_x"] = agg["tile"] // n
    agg["tile_y"] = agg["tile"] % n
    out = (
        agg.sort_values(["n_events", "tile_x", "tile_y"], ascending=[False, True, True])
        .head(top)
        .reset_index(drop=True)
    )
    for c in ("tile_x", "tile_y", "n_events"):
        out[c] = out[c].astype("int64")
    return out[["tile_x", "tile_y", "n_events"]]


def geo_distance(sf_dir: str) -> pd.DataFrame:
    """ES geo_distance range filter + per-type rollup: events within
    GD_RADIUS_M haversine meters of (GD_LAT, GD_LON), counted per
    event_type with their value folded in integer cents. The haversine is
    stated identically in the SQL oracle (same operand order); counts and
    sums are exact integers, so the only float is the radius compare —
    the standard measure-zero boundary caveat."""

    def partial(batch: pa.Table) -> pa.Table:
        lat_u, lon_u = geo_point_u(batch["event_id"].to_numpy(zero_copy_only=False))
        lat = lat_u / 1e6
        lon = lon_u / 1e6
        dist = (
            2.0
            * EARTH_R_M
            * np.arcsin(
                np.sqrt(
                    np.sin(np.radians(lat - GD_LAT) / 2.0) ** 2
                    + np.cos(np.radians(GD_LAT))
                    * np.cos(np.radians(lat))
                    * np.sin(np.radians(lon - GD_LON) / 2.0) ** 2
                )
            )
        )
        keep = dist <= GD_RADIUS_M
        cents = np.floor(batch["value"].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas()[keep].to_numpy(),
                "c": cents[keep],
            }
        )
        g = df.groupby("event_type", sort=False).agg(n=("c", "size"), sum_value_c=("c", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    out = (
        _events(sf_dir, ["event_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_within"), Sum("sum_value_c", alias_name="sum_value_c"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_within"] = out["n_within"].astype("int64")
    out["sum_value_c"] = out["sum_value_c"].astype("int64")
    return out


def geo_centroid(sf_dir: str, decimals: int = 6) -> pd.DataFrame:
    """ES geo_centroid aggregation per event_type: the mean point of each
    type's events. Exact integer microdegree sums per batch → one tiny
    groupby → the division is the only float (same exact integers both
    engines, rounded ``decimals``). Output (event_type, n, centroid_lat,
    centroid_lon) in degrees."""

    def partial(batch: pa.Table) -> pa.Table:
        lat_u, lon_u = geo_point_u(batch["event_id"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_pandas(), "lat": lat_u, "lon": lon_u}
        )
        g = df.groupby("event_type", sort=False).agg(
            n=("lat", "size"), slat=("lat", "sum"), slon=("lon", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = (
        _events(sf_dir, ["event_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"), Sum("slat", alias_name="slat"), Sum("slon", alias_name="slon")
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n": agg["n"].astype("int64"),
            "centroid_lat": (agg["slat"].astype(float) / agg["n"] / 1e6).round(decimals),
            "centroid_lon": (agg["slon"].astype(float) / agg["n"] / 1e6).round(decimals),
        }
    )
    return out
