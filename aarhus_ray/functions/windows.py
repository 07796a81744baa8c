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
from ray.data.aggregate import Count, Max, Sum


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
    max ts, tie → max event_id (frozen). (ts, event_id) is packed into one
    fixed-width big-endian 16-byte key whose lexicographic order equals
    (ts ASC, event_id ASC), so the whole reduction is a per-batch partial
    max + ONE native Max aggregate — no per-group Python in the final stage
    (the old groupby().map_groups paid pandas overhead on ~|user×type|
    mostly-singleton groups, the documented pathology)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        # sign-bit flip = the order-preserving int64→uint64 map, so
        # pre-epoch timestamps / negative ids still sort correctly in the
        # byte packing (a plain cast would wrap them to maximal)
        bias = np.uint64(1 << 63)
        ts_us = (
            df["ts"].astype("datetime64[us]").astype("int64").to_numpy().astype(np.uint64)
            ^ bias
        )
        eid = df["event_id"].to_numpy(np.int64).astype(np.uint64) ^ bias
        packed = np.frombuffer(
            np.stack([ts_us, eid], axis=1).astype(">u8").tobytes(), dtype="S16"
        )
        part = pd.DataFrame(
            {"user_id": df["user_id"], "event_type": df["event_type"], "packed": packed}
        )
        # per-batch partial keep-latest bounds shuffle bytes to <=1 row per
        # key per batch
        return part.groupby(["user_id", "event_type"], sort=False, as_index=False)[
            "packed"
        ].max()

    agg = (
        ds.map_batches(keep_latest, batch_format="pandas")
        .groupby(["user_id", "event_type"])
        .aggregate(Max("packed", alias_name="packed"))
        .to_pandas()
    )
    if len(agg):
        # bytes objects round-tripped through object dtype lose trailing
        # NULs (numpy S-dtype semantics; ordering is unaffected because the
        # stripped value is a prefix) — np.array(..., "S16") re-pads them
        raw = np.array(agg["packed"].to_numpy(), dtype="S16").view(">u8").reshape(-1, 2)
        agg["event_id"] = (
            raw[:, 1].astype(np.uint64) ^ np.uint64(1 << 63)
        ).astype(np.int64)
    else:
        agg["event_id"] = np.empty(0, np.int64)
    out = agg[["user_id", "event_type", "event_id"]]
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


def events_sliding_window(sf_dir: str, window_min: int = 60, slide_min: int = 15) -> pd.DataFrame:
    """SLIDING event-time window (1h long, sliding every 15min): each event
    lands in ``window_min/slide_min`` consecutive windows. Implemented as a
    map-side window expansion (each batch emits one pre-aggregated row set
    per window offset — the fan-out never leaves the task) + the same tiny
    final groupby as the tumbling case. Window starts are epoch-aligned
    integer floor arithmetic in microseconds so the DuckDB oracle
    (epoch_us // slide * slide) is bit-identical."""
    import pyarrow.compute as pc

    ds = _events(sf_dir, ["ts", "event_type", "value"])
    slide_us = np.int64(slide_min * 60 * 1_000_000)
    n_win = window_min // slide_min

    def partial(batch: pa.Table) -> pa.Table:
        ts_col = batch["ts"]
        if isinstance(ts_col, pa.ChunkedArray):
            ts_col = ts_col.combine_chunks()
        us = ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // slide_us) * slide_us
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        cents_np = cents.to_numpy(zero_copy_only=False)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        parts = []
        for j in range(n_win):
            ws = base - j * slide_us
            parts.append(
                pa.table(
                    {
                        "window_start": pa.array(ws, pa.int64()).cast(pa.timestamp("us")),
                        "event_type": et,
                        "cents": pa.array(cents_np, pa.int64()),
                    }
                )
            )
        g = (
            pa.concat_tables(parts)
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
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def events_range_join_prior_views(sf_dir: str, lookback_min: int = 10) -> pd.DataFrame:
    """RANGE JOIN: for every click, the count of same-user views with
    ``ts in [click.ts - lookback, click.ts)``. Per-user groups (the same
    partitioning key every events op reuses) + two vectorized
    searchsorted's over the user's sorted view timestamps — O(n log n) per
    group instead of the oracle's quadratic interval join."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    lb = np.timedelta64(lookback_min * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values("event_id")
        if len(clicks) == 0:
            return pd.DataFrame(
                {"click_id": pd.Series([], dtype="int64"),
                 "n_prior_views": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64")}
            )
        vt = np.sort(g.loc[g["event_type"] == "view", "ts"].to_numpy())
        ct = clicks["ts"].to_numpy()
        # [ts - lookback, ts): left-closed right-open on view timestamps
        n = np.searchsorted(vt, ct, side="left") - np.searchsorted(vt, ct - lb, side="left")
        return pd.DataFrame(
            {
                "click_id": clicks["event_id"].astype("int64").to_numpy(),
                "n_prior_views": n.astype("int64"),
                "user_id": clicks["user_id"].astype("int64").to_numpy(),
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    return out.sort_values("click_id").reset_index(drop=True)


def events_value_median(sf_dir: str) -> pd.DataFrame:
    """EXACT per-type median of value (in floor-cents): distributed
    histogram aggregation — per-batch (event_type, cents) counts, one
    small groupby over (type × distinct cents), then the cumulative-count
    median rule on the tiny histogram driver-side. Exact at any scale
    because cents are integers with bounded cardinality (the classic
    exact-percentile-via-histogram plan; no full sort, no value collect).
    Median rule (frozen, mirrored in SQL): smallest cents value whose
    cumulative count >= ceil(n/2)."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        g = (
            pa.table({"event_type": batch["event_type"], "cents": cents})
            .group_by(["event_type", "cents"])
            .aggregate([("cents", "count")])
        )
        return g.select(["event_type", "cents", "cents_count"]).rename_columns(
            ["event_type", "cents", "n"]
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cents")
        total = int(g["n"].sum())
        need = (total + 1) // 2  # ceil(n/2)
        cum = g["n"].cumsum()
        med = int(g.loc[cum >= need, "cents"].iloc[0])
        rows.append((et, med, total))
    out = pd.DataFrame(rows, columns=["event_type", "median_cents", "n_events"])
    out["median_cents"] = out["median_cents"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


QUANTILE_PCTS = (25, 50, 75, 90, 99)


def events_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT per-type value quantiles (p25/p50/p75/p90/p99, floor-cents):
    the events_value_median histogram plan generalized — ONE distributed
    (event_type × cents) histogram serves every percentile, so adding
    quantiles costs nothing over the median (the whole point of the
    histogram form vs a per-quantile sort). Frozen rule, mirrored in SQL:
    q-th percentile = smallest cents whose cumulative count >=
    ceil(total * q / 100)."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        g = (
            pa.table({"event_type": batch["event_type"], "cents": cents})
            .group_by(["event_type", "cents"])
            .aggregate([("cents", "count")])
        )
        return g.select(["event_type", "cents", "cents_count"]).rename_columns(
            ["event_type", "cents", "n"]
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cents")
        total = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        cents = g["cents"].to_numpy()
        for q in QUANTILE_PCTS:
            need = (total * q + 99) // 100  # ceil(total*q/100)
            rows.append((et, q, int(cents[int(np.searchsorted(cum, need))])))
    out = pd.DataFrame(rows, columns=["event_type", "q", "q_cents"])
    out["q"] = out["q"].astype("int64")
    out["q_cents"] = out["q_cents"].astype("int64")
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


WM_DELAY_MOD_S = 600   # simulated network delay: md5(event_id) % 600 seconds
WM_LATENESS_S = 120    # allowed lateness (bounded out-of-orderness)
_US_PER_H = 3_600_000_000
_WM_SENTINEL = -(2**62)  # "no prior arrival" carry (int64-safe, never late)


def _arrival_delay_s(event_ids: np.ndarray) -> np.ndarray:
    """Deterministic per-event 'network' delay in seconds — the repo's
    reproducible-md5 idiom (mixture_resample), replayable in SQL as
    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS UBIGINT)
    % 600. SIMULATION HARNESS ONLY: the driver's events log is perfectly
    time-ordered, so lateness must be synthesized; a production stream
    carries its own arrival timestamp and this column arrives with the
    data (the md5 is then free)."""
    import hashlib

    md5 = hashlib.md5
    return np.fromiter(
        (
            int.from_bytes(md5(str(int(e)).encode()).digest()[:4], "big") % WM_DELAY_MOD_S
            for e in event_ids
        ),
        dtype=np.int64,
        count=len(event_ids),
    )


def _watermark_flags(sf_dir: str) -> ray.data.Dataset:
    """Per-event lateness under a bounded-out-of-orderness watermark
    (Flink/Beam semantics, frozen): arrival order = (arr_ts, event_id);
    watermark before an event = max event-time among previously-arrived
    events minus WM_LATENESS_S; an event is LATE iff that running max
    exceeds its own ts by strictly more than the lateness. Distributed as
    a TWO-PHASE SCAN over arrival-hour buckets: phase A partial-maxes
    event-time per bucket inside map_batches and a tiny groupby reduces to
    one row per hour; the driver takes the exclusive prefix max over that
    (the ONLY sequential state — O(buckets), never the data); phase B
    gathers each bucket with groupby(arr_hour).map_groups, sorts by
    arrival order, local running max + carry-in, flags lateness.
    Partitioning assumption (documented knob): one arrival-bucket's events
    fit one group task — shrink the bucket to minutes at higher rates;
    driver scan stays tiny."""
    ds = _events(sf_dir, ["event_id", "ts", "value"])

    def enrich(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        arr_us = ts_us + _arrival_delay_s(eid) * 1_000_000
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts_us": pa.array(ts_us, pa.int64()),
                "value": batch["value"],
                "arr_us": pa.array(arr_us, pa.int64()),
                "arr_hour": pa.array(arr_us // _US_PER_H, pa.int64()),
            }
        )

    enriched = ds.map_batches(enrich, batch_format="pyarrow")

    # phase A: max event-time per arrival-hour (tiny: one row per hour)
    from ray.data.aggregate import Max

    hours = (
        enriched.groupby("arr_hour")
        .aggregate(Max("ts_us", alias_name="max_ts_us"))
        .to_pandas()
        .sort_values("arr_hour")
    )
    excl = hours["max_ts_us"].cummax().shift(1, fill_value=_WM_SENTINEL)
    carry = dict(zip(hours["arr_hour"].astype(int), excl.astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["arr_us", "event_id"])
        ts = g["ts_us"].to_numpy()
        pm = np.maximum.accumulate(ts)
        c = np.int64(carry[int(g["arr_hour"].iloc[0])])
        excl_max = np.empty_like(pm)
        excl_max[0] = c
        if len(pm) > 1:
            excl_max[1:] = np.maximum(pm[:-1], c)
        lag_us = excl_max - ts
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "ts_us": ts,
                "value": g["value"].to_numpy(),
                "lag_us": lag_us,
                "late": lag_us > np.int64(WM_LATENESS_S) * 1_000_000,
            }
        )

    return enriched.groupby("arr_hour").map_groups(per_bucket, batch_format="pandas")


def events_late_ids(sf_dir: str) -> pd.DataFrame:
    """The events a WM_LATENESS_S-bounded watermark DROPS, with how far
    past the watermark's horizon each arrived (lag_us = running-max
    event-time at arrival minus own ts, exact integer microseconds).
    Output (event_id, lag_us) ordered by event_id; exact SQL oracle via
    MAX(ts) OVER (ORDER BY arr, event_id ROWS UNBOUNDED PRECEDING TO 1
    PRECEDING)."""
    out = (
        _watermark_flags(sf_dir)
        .map_batches(
            lambda df: df.loc[df["late"], ["event_id", "lag_us"]], batch_format="pandas"
        )
        .to_pandas()
    )
    out = out.sort_values("event_id").reset_index(drop=True)
    for c in ("event_id", "lag_us"):
        out[c] = out[c].astype("int64")
    return out


def events_watermark_hourly(sf_dir: str) -> pd.DataFrame:
    """events_hourly_tumbling restricted to events an on-line watermark
    would actually have admitted (late arrivals dropped) — what a
    streaming engine EMITS vs the batch-perfect answer. Same output shape
    (window_start, n_events, sum_value_floor_cents) so the two queries
    diff directly."""
    flagged = _watermark_flags(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~df["late"]]
        win = (df["ts_us"].to_numpy() // _US_PER_H) * _US_PER_H
        cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        p = pd.DataFrame({"window_start_us": win, "cents": cents})
        g = p.groupby("window_start_us", as_index=False).agg(
            n_events=("cents", "size"), sum_value_floor_cents=("cents", "sum")
        )
        return g

    out = (
        flagged.map_batches(partial, batch_format="pandas")
        .groupby("window_start_us")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_floor_cents", alias_name="sum_value_floor_cents"),
        )
        .to_pandas()
    )
    out["window_start"] = pd.to_datetime(out["window_start_us"], unit="us").astype(
        "datetime64[us]"
    )
    out = out[["window_start", "n_events", "sum_value_floor_cents"]]
    for c in ("n_events", "sum_value_floor_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("window_start").reset_index(drop=True)


FUNNEL_STEPS = ("signup", "view", "purchase")  # frozen ordered funnel
FUNNEL_WINDOW_H = 48  # per-step conversion window (hours)


def events_funnel(sf_dir: str) -> pd.DataFrame:
    """ORDERED FUNNEL analysis (the product-analytics primitive; the
    Mixpanel/Amplitude "funnel" with a per-step conversion window):
    how many users performed FUNNEL_STEPS in order, each step within
    FUNNEL_WINDOW_H hours of the previous one. FIRST-TOUCH attribution,
    frozen: the anchor for step i is the EARLIEST step-i event in
    (anchor_{i-1}, anchor_{i-1} + window] — deterministic and
    SQL-replayable; note this deliberately is NOT exists-any-path
    semantics (a later signup whose window converts is not credited —
    the standard first-touch trade, documented). One groupby(user_id)
    gather — the same stream-shaped partitioning every sessionization op
    here uses — then a per-user min-in-window chain; the per-step counts
    are a tiny groupby fold. Output (step, event_type, n_users); oracle:
    chained MIN(ts)-in-window CTEs."""
    ds = _events(sf_dir, ["ts", "user_id", "event_type"])
    steps = FUNNEL_STEPS
    window = np.timedelta64(FUNNEL_WINDOW_H * 3600, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        reached = np.zeros(len(steps), dtype=np.int64)
        anchor = None
        for i, step in enumerate(steps):
            ts = g.loc[g["event_type"] == step, "ts"]
            if anchor is not None:
                ts = ts[(ts > anchor) & (ts <= anchor + window)]
            if len(ts) == 0:
                break
            anchor = ts.min()
            reached[i] = 1
        return pd.DataFrame({"step": np.arange(1, len(steps) + 1), "n": reached})

    agg = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("step")
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    agg["event_type"] = [steps[int(s) - 1] for s in agg["step"]]
    for c in ("step", "n_users"):
        agg[c] = agg[c].astype("int64")
    return agg[["step", "event_type", "n_users"]]


_US_PER_DAY = np.int64(86_400) * 1_000_000


def events_retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """COHORT RETENTION analysis (the product-analytics retention
    triangle): users are cohorted by the UTC day of their first event;
    for every (cohort_day, offset_days) cell, how many of that cohort's
    users were active offset_days later. One groupby(user_id) gather —
    the same stream partitioning sessionize/funnel use — emitting each
    user's (cohort_day, distinct day offsets) pairs, then a tiny
    (cohort_day, offset) count fold. Day arithmetic is exact integer
    microseconds (ts_us // 86400e6). At 10^12 events the per-user state
    is a handful of day ints; the cohort matrix is days² — driver-safe
    forever. Output (cohort_day ts[us], offset_days, n_users)."""
    ds = _events(sf_dir, ["ts", "user_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // _US_PER_DAY)
        return pd.DataFrame(
            {"cohort_day": np.full(len(days), days[0]), "offset_days": days - days[0]}
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["cohort_day", "offset_days"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    out["cohort_day"] = pd.to_datetime(out["cohort_day"] * _US_PER_DAY, unit="us").astype(
        "datetime64[us]"
    )
    out = out.sort_values(["cohort_day", "offset_days"]).reset_index(drop=True)
    for c in ("offset_days", "n_users"):
        out[c] = out[c].astype("int64")
    return out[["cohort_day", "offset_days", "n_users"]]


PATH_LEN = 3  # first-P-events path prefix
PATH_TOP_K = 10  # most common paths reported


def events_user_paths(sf_dir: str, p: int = PATH_LEN, k: int = PATH_TOP_K) -> pd.DataFrame:
    """TOP-K USER PATHS (GA/Amplitude "path analysis"): the most common
    ordered event_type sequence over each user's first ``p`` events
    (order frozen: ts ASC, event_id ASC on ties; users with fewer than
    ``p`` events contribute their full shorter path). groupby(user_id)
    gather → per-user path string ('>'-joined) → groupby(path) count →
    top-k (n DESC, path ASC). Path cardinality ≤ |event_types|^p, so the
    final fold is tiny at any corpus size. Output (rank, path,
    n_users)."""
    ds = _events(sf_dir, ["ts", "user_id", "event_id", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).head(p)
        return pd.DataFrame({"path": [">".join(g["event_type"].tolist())]})

    counts = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("path")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
        .sort_values(["n_users", "path"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    counts.insert(0, "rank", np.arange(1, len(counts) + 1, dtype=np.int64))
    counts["n_users"] = counts["n_users"].astype("int64")
    return counts[["rank", "path", "n_users"]]


TT_TYPE_A = "purchase"  # t_test group A
TT_TYPE_B = "error"     # t_test group B
TT_DECIMALS = 6


def events_t_test(
    sf_dir: str, type_a: str = TT_TYPE_A, type_b: str = TT_TYPE_B,
    decimals: int = TT_DECIMALS,
) -> pd.DataFrame:
    """Welch's unpaired two-sample t-test between the value distributions
    of two event types (ES t_test aggregation, heteroscedastic default):
    does `purchase` move different money than `error`? Distributed as the
    moments plan — per-batch partials carry only (type, n, Σx, Σx²) on
    integer cents (floor(value*100), the module contract), one ≤2-row-per-
    block groupby sums them, and the driver finishes the closed form

        t  = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)
        df = (v_a/n_a + v_b/n_b)² / ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))

    with v the SAMPLE variance (Q − S²/n)/(n−1). All moments are exact
    int64 (Q < 2^53 exactly representable as float64), so t and df are a
    deterministic float64 expression of integers — the SQL oracle states
    the same formula over the same integers and matches to the last bit;
    rounding to ``decimals`` is belt-and-braces. Output one row:
    (type_a, type_b, n_a, n_b, mean_a_c, mean_b_c, t, df)."""
    ds = _events(sf_dir, ["event_type", "value"])
    types = pa.array([type_a, type_b], pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch["event_type"], value_set=types))
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        rows = {"event_type": [], "n": [], "s": [], "q": []}
        for t in (type_a, type_b):
            x = cents[et == t]
            rows["event_type"].append(t)
            rows["n"].append(len(x))
            rows["s"].append(int(x.sum()))
            rows["q"].append(int((x * x).sum()))
        return pa.table(
            {
                "event_type": pa.array(rows["event_type"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "s": pa.array(rows["s"], pa.int64()),
                "q": pa.array(rows["q"], pa.int64()),
            }
        )

    m = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("q", alias_name="q")
        )
        .to_pandas()
        .set_index("event_type")
    )

    def stats(t):
        n = float(m.loc[t, "n"])
        s = float(m.loc[t, "s"])
        q = float(m.loc[t, "q"])
        mean = s / n
        var = (q - s * s / n) / (n - 1.0)
        return n, mean, var

    na, ma, va = stats(type_a)
    nb, mb, vb = stats(type_b)
    se2_a, se2_b = va / na, vb / nb
    t_stat = (ma - mb) / np.sqrt(se2_a + se2_b)
    df = (se2_a + se2_b) ** 2 / (se2_a**2 / (na - 1.0) + se2_b**2 / (nb - 1.0))
    return pd.DataFrame(
        {
            "type_a": pd.Series([type_a], dtype=object),
            "type_b": pd.Series([type_b], dtype=object),
            "n_a": pd.Series([int(na)], dtype="int64"),
            "n_b": pd.Series([int(nb)], dtype="int64"),
            "mean_a_c": pd.Series([round(ma, decimals)], dtype="float64"),
            "mean_b_c": pd.Series([round(mb, decimals)], dtype="float64"),
            "t": pd.Series([round(float(t_stat), decimals)], dtype="float64"),
            "df": pd.Series([round(float(df), decimals)], dtype="float64"),
        }
    )


FIS_MIN_SUPPORT = 5  # frequent_item_sets support floor
FIS_MAX_SIZE = 3
FIS_DAY_US = 86_400_000_000


def events_frequent_itemsets(
    sf_dir: str, min_support: int = FIS_MIN_SUPPORT, max_size: int = FIS_MAX_SIZE,
) -> pd.DataFrame:
    """Frequent itemsets over (user, day) event-type baskets (ES
    frequent_item_sets aggregation — the market-basket shape): every set
    of ≤ ``max_size`` distinct event types co-occurring in ≥
    ``min_support`` user-days. Baskets are user-DAYS, not whole user
    histories: over a month every user touches every type, so history
    baskets are degenerate while daily baskets have real sparsity
    (measured at sf0.01: basket sizes 1..5 ≈ 1388/1486/870/235/27).

    The type alphabet is tiny (≤ 63 — int64 masks leave the sign bit
    unusable, asserted below), so the plan is the BITMASK-HISTOGRAM
    collapse — Apriori with no candidate generation and no row shuffle:
      1. distinct (user_id, day, type) via per-batch dedup + one groupby;
      2. type → bit (frozen: bit index = rank in the sorted global type
         alphabet); groupby(user, day).Sum of bits == OR, because step 1
         made rows distinct per (basket, type);
      3. per-batch histogram of masks → groupby(mask) → ≤ 2^T rows;
      4. driver: support(itemset I) = Σ n_baskets(mask ⊇ I) over that tiny
         histogram — every itemset size falls out of one table.
    Output (items 'a+b+c' sorted-joined, size, support) with support ≥
    ``min_support``, ordered (size, support DESC, items) — hash-exact;
    the SQL oracle replays sizes 1..3 with distinct-set self-joins."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def dedup_triples(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        day = pa.array(us // FIS_DAY_US, pa.int64())
        return (
            pa.table(
                {"user_id": batch["user_id"], "day": day, "event_type": batch["event_type"]}
            )
            .group_by(["user_id", "day", "event_type"])
            .aggregate([])
        )

    pairs = (
        ds.map_batches(dedup_triples, batch_format="pyarrow")
        .groupby(["user_id", "day", "event_type"])
        .count()
        .select_columns(["user_id", "day", "event_type"])
    )
    # frozen alphabet: the sorted distinct event types (tiny — collected once)
    alphabet = sorted(
        pairs.groupby("event_type").count().to_pandas()["event_type"].tolist()
    )
    # int64 masks hold 63 usable bits: `1 << 63` overflows np.int64 in
    # to_bits' fromiter. Fail loudly rather than wrap silently.
    assert len(alphabet) <= 63, (
        f"frequent_itemsets bitmask alphabet limited to 63 event types, got {len(alphabet)}"
    )
    bit_of = {t: 1 << i for i, t in enumerate(alphabet)}

    def to_bits(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        bits = np.fromiter((bit_of[t] for t in et), dtype=np.int64, count=len(et))
        return pa.table(
            {"user_id": batch["user_id"], "day": batch["day"], "bit": pa.array(bits, pa.int64())}
        )

    masks = (
        pairs.map_batches(to_bits, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Sum("bit", alias_name="mask"))
    )

    def mask_hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"mask": batch["mask"]}).group_by("mask").aggregate([("mask", "count")])
        return t.rename_columns(["mask", "n"])

    hist = (
        masks.map_batches(mask_hist, batch_format="pyarrow")
        .groupby("mask")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    hmask = hist["mask"].to_numpy().astype(np.int64)
    hn = hist["n"].to_numpy().astype(np.int64)

    import itertools

    rows = []
    for size in range(1, max_size + 1):
        for combo in itertools.combinations(alphabet, size):
            im = sum(bit_of[t] for t in combo)
            support = int(hn[(hmask & im) == im].sum())
            if support >= min_support:
                rows.append(("+".join(combo), size, support))
    out = pd.DataFrame(rows, columns=["items", "size", "support"])
    out = out.sort_values(
        ["size", "support", "items"], ascending=[True, False, True]
    ).reset_index(drop=True)
    out["size"] = out["size"].astype("int64")
    out["support"] = out["support"].astype("int64")
    return out


EQL_STEPS = ("view", "click", "purchase")
EQL_MAXSPAN_S = 86_400  # sequence ... within 24h (driver stream density)


def events_eql_sequence(sf_dir: str, maxspan_s: int = EQL_MAXSPAN_S) -> pd.DataFrame:
    """EQL-style sequence matching (Elastic Event Query Language:
    ``sequence by user_id [view] [click] [purchase] with maxspan=24h``)
    under frozen ALL-MATCHES semantics: count, per user, every ordered
    triple t_view < t_click < t_purchase with t_purchase − t_view ≤
    maxspan (strict inequalities; no event-consumption rule — every
    combination counts, which is exactly the triple self-join a SQL
    replay states). Complements events_funnel, which is the first-touch
    single-path reduction of the same stream.

    Per-user work is O((V+C+P)·log) via sorted arrays, never the literal
    triple loop: for each purchase, the eligible views are one
    searchsorted window, and the clicks strictly inside each (view,
    purchase) interval fold to (window size × clicks-before-purchase −
    prefix-summed clicks-before-view). The usual stream-shaped
    groupby(user_id) gather is the only shuffle. Output (user_id,
    n_matches > 0), id-ordered — hash-exact."""
    ds = _events(sf_dir, ["ts", "user_id", "event_type"])
    span_us = np.int64(maxspan_s) * 1_000_000
    v_step, c_step, p_step = EQL_STEPS

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        et = g["event_type"].to_numpy()
        tv = np.sort(t[et == v_step])
        tc = np.sort(t[et == c_step])
        tp = np.sort(t[et == p_step])
        empty = pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"), "n_matches": pd.Series([], dtype="int64")}
        )
        if not (len(tv) and len(tc) and len(tp)):
            return empty
        r_v = np.searchsorted(tc, tv, side="right")  # clicks ≤ each view
        pref = np.concatenate(([0], np.cumsum(r_v)))
        lo = np.searchsorted(tv, tp - span_us, side="left")
        hi = np.searchsorted(tv, tp, side="left")
        c_before_p = np.searchsorted(tc, tp, side="left")
        n = int(((hi - lo) * c_before_p - (pref[hi] - pref[lo])).sum())
        if n == 0:
            return empty
        return pd.DataFrame(
            {"user_id": [int(g["user_id"].iloc[0])], "n_matches": [n]}
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


WA_DECIMALS = 6


def events_weighted_avg(sf_dir: str, decimals: int = WA_DECIMALS) -> pd.DataFrame:
    """ES weighted_avg aggregation: per event_type, the value (cents)
    averaged with the props 'k' field as the weight — Σ(cents·k)/Σk.
    Both moments stay exact int64 per-batch partials (k parsed from the
    single-key JSON with the same digit-run rule the SQL oracle's
    regexp_extract applies), one tiny groupby sums them, and the division
    is the only float — same two exact integers in both engines, rounded
    ``decimals``. Output (event_type, n, sum_w, weighted_avg_c)."""
    import re

    ds = _events(sf_dir, ["event_type", "value", "props"])
    digit = re.compile(r"[0-9]+")

    def _weight(p) -> int:
        # props contract: a digit run must exist (the fixture writes {"k": N});
        # a NULL or digit-free value is a data bug — diagnose, don't AttributeError.
        m = digit.search(p) if isinstance(p, str) else None
        if m is None:
            raise ValueError(f"events_weighted_avg: props value has no digit run: {p!r}")
        return int(m.group())

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch["value"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        w = np.fromiter(
            (_weight(p) for p in batch["props"].to_pylist()),
            dtype=np.int64, count=len(batch),
        )
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_pandas(), "vw": cents * w, "w": w}
        )
        g = df.groupby("event_type", sort=False).agg(
            n=("w", "size"), vw=("vw", "sum"), w=("w", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"), Sum("vw", alias_name="vw"), Sum("w", alias_name="sum_w")
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n": agg["n"].astype("int64"),
            "sum_w": agg["sum_w"].astype("int64"),
            "weighted_avg_c": (
                agg["vw"].astype(float) / agg["sum_w"].astype(float)
            ).round(decimals),
        }
    )
    return out


def events_running_total(sf_dir: str) -> pd.DataFrame:
    """SQL window-function parity (SUM() OVER (PARTITION BY user ORDER BY
    ts, event_id)): per event, the running total of that user's value in
    integer cents. The standard stream-shaped plan — one groupby(user_id)
    gather, per-group cumsum over the frozen (ts, event_id) order; sums
    stay int64 so every engine agrees bitwise. Output
    (event_id, user_id, running_c), event-ordered."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        run = np.floor(g["value"].to_numpy() * 100.0).astype(np.int64).cumsum()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "running_c": pd.Series(run, dtype="int64", index=g.index),
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


AZ_BUCKET_US = 3_600_000_000
AZ_ZMIN = 3.0
AZ_DECIMALS = 4


def events_anomaly_zscore(sf_dir: str) -> pd.DataFrame:
    """Count-spike anomaly detection (the ES anomaly-detection job shape,
    frozen to a replayable statistic): per event_type, hourly counts over
    the DENSE global hour range (zeros included — absence is data), and
    the z-score of each bucket against that type's own across-bucket
    mean/SAMPLE-std; buckets with z ≥ AZ_ZMIN are the anomalies. Counts
    and both moments are exact integers (B buckets, Σc, Σc² — the t_test
    contract), so z is a deterministic float64 expression of integers;
    z rounds to AZ_DECIMALS. Distributed part = the (type, hour) count
    pre-aggregation (the hourly_tumbling exchange); the stats fold is a
    types × buckets driver table. Output (event_type, bucket, n_events,
    z) ordered (event_type, bucket)."""
    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"event_type": batch["event_type"].to_pandas(), "h": us // AZ_BUCKET_US})
        g = df.groupby(["event_type", "h"], sort=False).size().rename("c")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "h"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    lo, hi = int(counts["h"].min()), int(counts["h"].max())
    B = hi - lo + 1
    rows = []
    for t, g in counts.groupby("event_type"):
        c = np.zeros(B, dtype=np.int64)
        c[g["h"].to_numpy().astype(np.int64) - lo] = g["c"].to_numpy()
        s = int(c.sum())
        q = int((c * c).sum())
        mean = s / B
        var = (q - s * s / B) / (B - 1)
        z = (c - mean) / np.sqrt(var)
        hit = z >= AZ_ZMIN
        for h, n, zz in zip(np.flatnonzero(hit) + lo, c[hit], z[hit]):
            rows.append((t, int(h), int(n), round(float(zz), AZ_DECIMALS)))
    out = pd.DataFrame(rows, columns=["event_type", "bucket", "n_events", "z"])
    out = out.sort_values(["event_type", "bucket"]).reset_index(drop=True)
    out["bucket"] = out["bucket"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["z"] = out["z"].astype("float64")
    return out


SCD2_OPEN_US = 2**62  # frozen 'current version' sentinel (int64-safe)


def events_scd2_versions(sf_dir: str) -> pd.DataFrame:
    """CDC → SCD-type-2 table maintenance: treat the event stream as a
    changelog keyed by (user_id, event_type) and emit one VERSION row per
    event with its validity interval — valid from its own timestamp
    until the next change of the same key (the open current version gets
    the frozen SCD2_OPEN_US sentinel; intervals are epoch-µs int64, so
    the whole output is integer-exact). The warehouse-merge shape every
    lakehouse pipeline runs, expressed as the standard stream gather:
    one groupby(user_id), per-type sorted LEAD inside the group. Order
    within a key is frozen (ts, event_id). Oracle: the LEAD window
    function stated literally."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "ts", "event_id"])
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        nxt = np.empty(len(g), dtype=np.int64)
        nxt[:-1] = us[1:]
        nxt[-1] = SCD2_OPEN_US
        # a key's last version stays open: the LEAD crossing into the
        # next event_type must not close it
        et = g["event_type"].to_numpy()
        last_of_key = np.ones(len(g), dtype=bool)
        last_of_key[:-1] = et[:-1] != et[1:]
        nxt[last_of_key] = SCD2_OPEN_US
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "event_type": g["event_type"],
                "valid_from_us": pd.Series(us, dtype="int64", index=g.index),
                "valid_to_us": pd.Series(nxt, dtype="int64", index=g.index),
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    for c in ("event_id", "user_id", "valid_from_us", "valid_to_us"):
        out[c] = out[c].astype("int64")
    return out


def events_cube_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUPING SETS cube over events — the OLAP rollup every warehouse
    engine ships: one pass emitting (event_type, day), (event_type),
    (day) and the grand total, with '(all)' / -1 as the rolled-up
    sentinels (dtype-stable across engines, no NULL-key hashing). Counts
    and floor-cents sums per the repo's integer-money idiom.

    Shape: the cube is PRE-AGGREGATED inside map_batches — each batch
    folds its rows into all four grouping sets locally (Arrow group_by ×
    4, concat), so the one exchange carries at most 4× the distinct-key
    count, never 4× the rows; the final groupby merges partials. At
    10^12 events the exchange stays (types × days)-sized — the classic
    combiner argument, identical to events_hourly_tumbling's."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        etype = batch["event_type"]
        day = pc.cast(
            pc.divide(pc.cast(batch["ts"], pa.int64()), pa.scalar(day_us, pa.int64())),
            pa.int64(),
        )
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        n = len(batch)
        all_t = pa.array(["(all)"] * n, pa.string())
        all_d = pa.array(np.full(n, -1, np.int64), pa.int64())
        parts = []
        for t_col, d_col in ((etype, day), (etype, all_d), (all_t, day), (all_t, all_d)):
            g = (
                pa.table({"event_type": t_col, "day": d_col, "cents": cents})
                .group_by(["event_type", "day"])
                .aggregate([("cents", "count"), ("cents", "sum")])
            )
            parts.append(
                g.select(["event_type", "day", "cents_count", "cents_sum"])
                .rename_columns(["event_type", "day", "n_events", "sum_value_floor_cents"])
            )
        return pa.concat_tables(parts)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_floor_cents", alias_name="sum_value_floor_cents"),
        )
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    for c in ("day", "n_events", "sum_value_floor_cents"):
        out[c] = out[c].astype("int64")
    return out


def events_gap_fill(sf_dir: str) -> pd.DataFrame:
    """Timeseries gap-fill with linear interpolation — the missing-bucket
    repair step every monitoring pipeline runs before charting or
    anomaly scoring: per event_type, the DENSE hourly series between
    that type's first and last active hour, with empty buckets filled by
    ``(pv·(nb−b) + nv·(b−pb)) // (nb−pb)`` — the symmetric integer
    weighted average between the previous (pb,pv) and next (nb,nv)
    OBSERVED buckets (all operands non-negative integers, so Python and
    DuckDB `//` agree exactly). Output (event_type, hour_bucket,
    n_events, filled).

    Shape: the distributed work is the same combiner fold as
    events_hourly_tumbling (per-batch Arrow group_by partials → one
    (type,hour) exchange); the interpolation then runs on the
    WINDOW-SHAPED fold (types × active-hours rows) — never on events."""
    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.cast(
            pc.divide(pc.cast(batch["ts"], pa.int64()),
                      pa.scalar(3_600_000_000, pa.int64())),
            pa.int64(),
        )
        g = (
            pa.table({"event_type": batch["event_type"], "hour_bucket": hour})
            .group_by(["event_type", "hour_bucket"])
            .aggregate([("hour_bucket", "count")])
        )
        return g.rename_columns(["event_type", "hour_bucket", "n_events"])

    fold = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(Sum("n_events", alias_name="n_events"))
        .to_pandas()
        .sort_values(["event_type", "hour_bucket"])
    )
    rows = []
    for etype, g in fold.groupby("event_type", sort=True):
        hrs = g["hour_bucket"].to_numpy().astype(np.int64)
        vals = g["n_events"].to_numpy().astype(np.int64)
        dense = np.arange(hrs[0], hrs[-1] + 1, dtype=np.int64)
        # index of previous/next observed bucket for every dense slot
        nxt_i = np.searchsorted(hrs, dense, side="left")
        prv_i = np.searchsorted(hrs, dense, side="right") - 1
        observed = (nxt_i < len(hrs)) & (hrs[np.minimum(nxt_i, len(hrs) - 1)] == dense)
        pb, pv = hrs[prv_i], vals[prv_i]
        nb, nv = hrs[np.minimum(nxt_i, len(hrs) - 1)], vals[np.minimum(nxt_i, len(hrs) - 1)]
        span = np.maximum(nb - pb, 1)
        interp = (pv * (nb - dense) + nv * (dense - pb)) // span
        n = np.where(observed, vals[np.minimum(nxt_i, len(hrs) - 1)], interp)
        for b, v, ob in zip(dense, n, observed):
            rows.append((etype, int(b), int(v), 0 if ob else 1))
    out = pd.DataFrame(rows, columns=["event_type", "hour_bucket", "n_events", "filled"])
    for c in ("hour_bucket", "n_events", "filled"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "hour_bucket"]).reset_index(drop=True)


def events_markov_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition matrix over user event streams —
    the behavioral model behind next-action prediction and funnel
    optimization: counts of adjacent (current → next) event-type pairs
    within each user's timeline (order frozen ts ASC, event_id ASC),
    with row-conditional probabilities as integer per-mille
    (``p_mille = n·1000 // row_total``, exact in both engines).

    Shape: one user-keyed exchange (the sessionize/funnel partitioning —
    a user's events co-locate, pairs count inside the group with one
    vectorized shift), then the (types × types)-sized fold carries the
    conditional normalization. Output (cur_type, next_type, n_pairs,
    p_mille) ordered (cur, next)."""
    ds = _events(sf_dir, ["ts", "user_id", "event_id", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame({"cur_type": [], "next_type": [], "n_pairs": []})
        pairs = pd.DataFrame({"cur_type": et[:-1], "next_type": et[1:]})
        out = pairs.groupby(["cur_type", "next_type"], sort=False).size().reset_index(name="n_pairs")
        return out

    fold = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["cur_type", "next_type"])
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        .to_pandas()
        .sort_values(["cur_type", "next_type"])
        .reset_index(drop=True)
    )
    row_tot = fold.groupby("cur_type")["n_pairs"].transform("sum").to_numpy()
    fold["n_pairs"] = fold["n_pairs"].astype("int64")
    fold["p_mille"] = (fold["n_pairs"].to_numpy() * 1000 // row_tot).astype("int64")
    return fold


def events_match_recognize(sf_dir: str) -> pd.DataFrame:
    """SQL MATCH_RECOGNIZE-style CEP over each user's event stream: the
    pattern ``view+ purchase`` matched against CONTIGUOUS rows (ONE ROW
    PER MATCH, AFTER MATCH SKIP PAST LAST ROW, greedy ``+`` — the SQL:2016
    row-pattern defaults). A match is a maximal run of consecutive 'view'
    events immediately followed by a 'purchase', in the frozen per-user
    order (ts ASC, event_id ASC). Because 'purchase' ends every match and
    breaks any view-run, greedy non-overlapping matches are EXACTLY the
    maximal runs — so the set of matches is order-canonical and
    SQL-replayable with one window pass (the last-non-view gaps-and-
    islands trick), no recursion.

    Shape: the sessionize/funnel user-keyed exchange, then a vectorized
    in-group scan (cummax of non-view positions → run lengths at each
    purchase). Emits one row per match: (user_id, start_event_id,
    end_event_id, n_views), ordered (user_id, end_event_id). Only match
    rows leave the group — output is bounded by the purchase count."""
    ds = _events(sf_dir, ["ts", "user_id", "event_id", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        eid = g["event_id"].to_numpy()
        n = len(et)
        is_view = et == "view"
        # position of the last non-view row strictly before each row
        pos = np.where(~is_view, np.arange(n), -1)
        prev_nonview = np.full(n, -1, dtype=np.int64)
        if n > 1:
            prev_nonview[1:] = np.maximum.accumulate(pos)[:-1]
        n_views = np.arange(n) - 1 - prev_nonview  # contiguous views before row i
        sel = (et == "purchase") & (n_views >= 1)
        idx = np.flatnonzero(sel)
        start = idx - n_views[idx]
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy()[idx],
                "start_event_id": eid[start],
                "end_event_id": eid[idx],
                "n_views": n_views[idx],
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "end_event_id"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


MATCH_RECOGNIZE_SQL = """
WITH s AS (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
m AS (
  SELECT user_id, event_id, event_type, rn,
         MAX(CASE WHEN event_type <> 'view' THEN rn END) OVER (
           PARTITION BY user_id ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_nonview
  FROM s
),
runs AS (
  SELECT user_id, event_id AS end_event_id, rn,
         rn - 1 - coalesce(prev_nonview, 0) AS n_views
  FROM m
  WHERE event_type = 'purchase' AND rn - 1 - coalesce(prev_nonview, 0) >= 1
)
SELECT r.user_id,
       s2.event_id AS start_event_id,
       r.end_event_id,
       CAST(r.n_views AS BIGINT) AS n_views
FROM runs r
JOIN s s2 ON s2.user_id = r.user_id AND s2.rn = r.rn - r.n_views
ORDER BY r.user_id, r.end_event_id
"""


def events_decayed_counts(sf_dir: str) -> pd.DataFrame:
    """Streaming decayed counters (the ageing-counter fold behind trending
    topics / decayed heavy hitters): per event_type, the sum of event
    value-cents HALVED per whole day of age at the corpus watermark —
    ``decayed_c = floor(value·100) >> Δdays`` with Δdays = whole days
    between the event's date and the max event date. Integer shifts make
    the exponential decay EXACT in both engines (no float pow drift);
    the decay anchor (max date) is one tiny aggregate, shipped as a
    plain driver scalar into the per-batch map — at 100 TB the anchor is
    a watermark the stream already carries. Output (event_type,
    n_events, decayed_cents) ordered by type."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])
    # anchor: max event DATE (one scalar; Arrow max over a projected read)
    anchor = pc.cast(
        pc.floor_temporal(
            pa.scalar(ds.max("ts"), pa.timestamp("us")), unit="day"
        ),
        pa.timestamp("us"),
    )
    anchor_us = anchor.cast(pa.int64()).as_py()
    us_per_day = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        day_us = pc.cast(
            pc.cast(pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us")),
            pa.int64(),
        )
        age_days = pc.divide(pc.subtract(pa.scalar(anchor_us, pa.int64()), day_us),
                             pa.scalar(us_per_day, pa.int64()))
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64())
        shift = np.minimum(age_days.to_numpy(zero_copy_only=False), 62)
        decayed = cents.to_numpy(zero_copy_only=False) >> shift
        g = (
            pa.table({"event_type": batch["event_type"], "decayed": decayed})
            .group_by("event_type")
            .aggregate([("decayed", "count"), ("decayed", "sum")])
        )
        return g.rename_columns(["event_type", "n_events", "decayed_cents"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("decayed_cents", alias_name="decayed_cents"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["decayed_cents"] = out["decayed_cents"].astype("int64")
    return out


DECAYED_COUNTS_SQL = """
WITH mx AS (SELECT max(CAST(ts AS DATE)) AS md FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(
         CAST(floor(value * 100) AS BIGINT)
         // CAST(POW(2, LEAST(date_diff('day', CAST(ts AS DATE), mx.md), 62)) AS BIGINT)
       ) AS BIGINT) AS decayed_cents
FROM events, mx
GROUP BY event_type
ORDER BY event_type
"""


TOP_TYPES_PER_HOUR_K = 3  # ranks kept per window (the "trending now" panel width)


def events_top_types_per_hour(sf_dir: str, k: int = TOP_TYPES_PER_HOUR_K) -> pd.DataFrame:
    """Windowed top-k (the "trending event types per hour" panel — the
    rank() <= k OVER (PARTITION BY window) shape): tumbling 1h windows,
    count per (window, type), keep each window's top ``k`` types under
    the frozen total order (n DESC, event_type ASC). The distributed work
    is the same pre-aggregated (hour × type) partial-count exchange as
    events_hourly_tumbling; the final ranking runs on the AGGREGATED
    table, which is bounded by |windows| × |types| — window-shaped, never
    corpus-shaped (at 100 TB: hours/year × type alphabet, thousands of
    rows). Output (window_start, rank, event_type, n_events)."""
    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch["ts"], unit="hour")
        g = (
            pa.table({"window_start": win, "event_type": batch["event_type"]})
            .group_by(["window_start", "event_type"])
            .aggregate([("event_type", "count")])
        )
        return g.rename_columns(["window_start", "event_type", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("n", alias_name="n_events"))
        .to_pandas()
    )
    agg = agg.sort_values(
        ["window_start", "n_events", "event_type"], ascending=[True, False, True]
    )
    agg["rank"] = agg.groupby("window_start").cumcount() + 1
    out = (
        agg[agg["rank"] <= k]
        .reset_index(drop=True)[["window_start", "rank", "event_type", "n_events"]]
    )
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    out["rank"] = out["rank"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out


TOP_TYPES_PER_HOUR_SQL = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT window_start, event_type, n_events,
         CAST(row_number() OVER (
           PARTITION BY window_start ORDER BY n_events DESC, event_type
         ) AS BIGINT) AS rank
  FROM c
)
SELECT window_start, rank, event_type, n_events
FROM r WHERE rank <= 3
ORDER BY window_start, rank
"""
