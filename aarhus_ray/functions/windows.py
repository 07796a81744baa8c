"""Stream-shaped operators over the ``events`` table (event-time windows,
keep-latest dedup, sessionization, as-of join). Ray Data has no watermarks;
these treat events as an ordered, partitioned log (ray_guide: windows =
groupby(key) + in-group pandas over ts order). Double-valued sums use
``floor(value*100)`` int cents — identical in Ray and DuckDB on the same
doubles, order-independent."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def _events(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def events_hourly_tumbling(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1h event-time window per event_type: count + exact cents
    sum. floor-to-hour inside map_batches, partial-aggregate, tiny final
    groupby."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch["ts"], unit="hour")
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        # Arrow-native partial groupby — no pandas round-trip (which also
        # demoted window_start to datetime64[s])
        g = (
            pa.table({"window_start": win, "event_type": batch["event_type"], "cents": cents})
            .group_by(["window_start", "event_type"])
            .aggregate([("cents", "count"), ("cents", "sum")])
        )
        return g.select(["window_start", "event_type", "cents_count", "cents_sum"]).rename_columns(
            ["window_start", "event_type", "n_events", "sum_value_floor_cents"]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_floor_cents", alias_name="sum_value_floor_cents"),
        )
        .to_pandas()
    )
    # pin to [us]: the pandas round-trip inside the partial can demote to
    # [s], and the driver's value hash is dtype-sensitive (oracle is [us])
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def events_dedup_keep_latest(sf_dir: str) -> pd.DataFrame:
    """Exact dedup keep-latest: one row per (user_id, event_type), winner =
    max ts, tie → max event_id (frozen). Partial keep-latest per batch, then
    a final small groupby — the scalable two-level reduction."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        return df.groupby(["user_id", "event_type"], sort=False).tail(1)

    partials = ds.map_batches(keep_latest, batch_format="pandas")
    final = partials.groupby(["user_id", "event_type"]).map_groups(
        lambda g: g.sort_values(["ts", "event_id"]).tail(1), batch_format="pandas"
    )
    out = final.to_pandas()[["user_id", "event_type", "event_id"]]
    return out.sort_values(["user_id", "event_type"]).reset_index(drop=True)


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Session count per user: a new session starts when the gap from the
    previous event of that user exceeds ``gap_minutes``. groupby(user) +
    per-group pandas over ts order (stream-shaped; ray_guide)."""
    ds = _events(sf_dir, ["ts", "user_id", "event_id"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        deltas = g["ts"].diff()
        n_sessions = int((deltas > gap).sum()) + 1
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [n_sessions], "n_events": [len(g)]}
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def events_asof_click_view(sf_dir: str) -> pd.DataFrame:
    """As-of join: for each 'click', the most recent prior-or-equal 'view'
    by the same user. Implemented per user-group with pd.merge_asof
    (SURVEY.md §2.4 as-of pattern); DuckDB oracle uses ASOF JOIN."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        # collapse view ts-ties to max event_id (frozen tie-break, mirrored
        # in the oracle SQL — merge_asof alone would pick the last sorted
        # row, which agrees, but DuckDB ASOF JOIN picks an arbitrary tie)
        views = (
            g[g["event_type"] == "view"]
            .groupby("ts", as_index=False)["event_id"].max()
            .sort_values("ts")
        )
        if len(clicks) == 0:
            return pd.DataFrame(
                {"click_id": pd.Series([], dtype="int64"), "view_id": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64")}
            )
        if len(views) == 0:
            m = clicks.assign(view_id=np.int64(-1))
        else:
            m = pd.merge_asof(
                clicks,
                views[["ts", "event_id"]].rename(columns={"event_id": "view_id"}),
                on="ts",
                direction="backward",
            )
            m["view_id"] = m["view_id"].fillna(-1).astype("int64")
        return pd.DataFrame(
            {
                "click_id": m["event_id"].astype("int64"),
                "view_id": m["view_id"],
                "user_id": m["user_id"].astype("int64"),
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    return out.sort_values("click_id").reset_index(drop=True)
