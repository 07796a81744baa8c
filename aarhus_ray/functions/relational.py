"""Relational pipelines over the TPC-H-ish driver tables (TESTDATA.md).

Money is aggregated in integer cents (``round(x*100)`` as int64) — double
addition of integer-valued floats < 2^53 is exact and order-independent, so
Ray and DuckDB agree bit-for-bit regardless of reduction order. The matching
oracle SQL lives in __ray_entry__.oracle_sql.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0))), pa.int64())


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) sums/counts with a
    shipdate filter. Partial aggregation inside map_batches (one row per key
    per batch) shrinks the groupby shuffle to O(keys × blocks)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        price_c = _cents(batch["l_extendedprice"])
        disc_c = _cents(pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        disc_price_e4 = pc.multiply(price_c, disc_c)
        # Arrow-native partial groupby — no pandas copy inside the hot stage
        g = (
            pa.table(
                {
                    "l_returnflag": batch["l_returnflag"],
                    "l_linestatus": batch["l_linestatus"],
                    "qty": pc.cast(batch["l_quantity"], pa.int64()),
                    "price_c": price_c,
                    "disc_price_e4": disc_price_e4,
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty", "sum"), ("price_c", "sum"), ("disc_price_e4", "sum"), ("qty", "count")])
        )
        return g.select(
            ["l_returnflag", "l_linestatus", "qty_sum", "price_c_sum", "disc_price_e4_sum", "qty_count"]
        ).rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price_cents", "sum_disc_price_e4", "count_order"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
            Sum("sum_disc_price_e4", alias_name="sum_disc_price_e4"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def top_customers_by_revenue(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Revenue per customer from orders, top-k, names joined by BROADCAST
    (the customer table is the small side — ray.put once, dict lookup per
    batch; no shuffle join)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    name_ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist())))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"o_custkey": batch["o_custkey"], "cents": _cents(batch["o_totalprice"])})
            .group_by(["o_custkey"])
            .aggregate([("cents", "sum")])
        )
        return g.select(["o_custkey", "cents_sum"]).rename_columns(["o_custkey", "revenue_cents"])

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    agg = agg.sort_values(["revenue_cents", "o_custkey"], ascending=[False, True]).head(k)
    names = ray.get(name_ref)
    agg["c_name"] = agg["o_custkey"].map(names)
    return agg.rename(columns={"o_custkey": "c_custkey"})[
        ["c_custkey", "c_name", "revenue_cents"]
    ].reset_index(drop=True)


def order_priority_counts(sf_dir: str) -> pd.DataFrame:
    """Order counts per priority in a date window (TPC-H Q4 shape)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate"])
    lo = pa.scalar(np.datetime64("1994-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))
    ds = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi))
        ),
        batch_format="pyarrow",
    )
    out = ds.groupby("o_orderpriority").aggregate(Count(alias_name="order_count")).to_pandas()
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def customers_per_region(sf_dir: str) -> pd.DataFrame:
    """customer → nation → region via two broadcast lookups (dimension
    tables), then a small groupby — the partitioned-join-free plan for a
    star schema."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    # vectorized dimension lookup: position via pc.index_in against the
    # nation-key array, then take from the aligned region-name array — no
    # per-row Python. The two tiny arrays ride the task closure (25 rows);
    # a plain task fn avoids the ~2s actor-pool spawn for a trivial stage.
    nkeys = pa.array(sorted(n2r), pa.int64())
    rnames = pa.array([r2name[n2r[k]] for k in sorted(n2r)], pa.string())
    cust = _read(sf_dir, "customer", ["c_nationkey"])

    def region_tag(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(batch["c_nationkey"], pa.int64()), value_set=nkeys)
        return pa.table({"r_name": pc.take(rnames, idx)})

    out = (
        cust.map_batches(region_tag, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="customer_count"))
        .to_pandas()
    )
    return out.sort_values("r_name").reset_index(drop=True)


def lineitem_top_revenue(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k line items by discounted revenue with a frozen tie order —
    per-batch top-k partials, then a tiny global merge (no full sort)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        price_c = _cents(batch["l_extendedprice"])
        disc_c = _cents(pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        rev = pc.multiply(price_c, disc_c).to_numpy(zero_copy_only=False)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ln, ok, -rev))[:k]
        return pa.table(
            {
                "l_orderkey": pa.array(ok[order], pa.int64()),
                "l_linenumber": pa.array(ln[order], pa.int32()),
                "revenue_e4": pa.array(rev[order], pa.int64()),
            }
        )

    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["revenue_e4", "l_orderkey", "l_linenumber"], ascending=[False, True, True]
    ).head(k)
    return parts.reset_index(drop=True)


def supplier_nation_acctbal(sf_dir: str) -> pd.DataFrame:
    """Per-nation supplier account stats (min/max/count, cents-exact)."""
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {"s_nationkey": t["s_nationkey"], "acctbal_cents": _cents(t["s_acctbal"])}
        ),
        batch_format="pyarrow",
    )
    out = (
        ds.groupby("s_nationkey")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Min("acctbal_cents", alias_name="min_acctbal_cents"),
            Max("acctbal_cents", alias_name="max_acctbal_cents"),
        )
        .to_pandas()
    )
    return out.sort_values("s_nationkey").reset_index(drop=True)


# fact tables larger than this switch the broadcast-keyset join to the
# Bloom + exact-verify plan (driver state bounded by the PROBE side's
# bloom-positive candidates instead of the fact side's distinct keys)
BLOOM_FACT_THRESHOLD = 5_000_000


def _fact_keys_in_probe(
    fact_ds: ray.data.Dataset,
    fact_col: str,
    probe_ds: ray.data.Dataset,
    probe_col: str,
    use_bloom: bool | None = None,
) -> list[int]:
    """Distinct fact-side keys that the probe side could match, EXACT.

    Small facts: plain ``unique`` (the round-1 broadcast-keyset plan).
    Large facts (or ``use_bloom=True``): a distributed Bloom filter over
    the fact keys (fixed 1 MiB driver state) prunes the probe side to
    bloom-positive CANDIDATES (no false negatives → nothing exact is
    lost); one pruned fact scan then verifies candidates exactly. The
    driver never holds the fact keyset — only the bloom bits, the
    candidate list (bounded by the probe side) and the verified subset
    (functions/bloom.py has the sizing math)."""
    if use_bloom is None:
        use_bloom = fact_ds.count() > BLOOM_FACT_THRESHOLD
    if not use_bloom:
        return sorted(fact_ds.unique(fact_col))
    from . import bloom as bl

    bits_ref = ray.put(bl.build_bloom(fact_ds, fact_col))

    def cand_filter(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        ks = batch[probe_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bl.bloom_contains(bits, ks))).select([probe_col])

    cand = probe_ds.map_batches(cand_filter, batch_format="pyarrow").unique(probe_col)
    if not cand:
        return []
    cand_ref = ray.put(pa.array(sorted(int(c) for c in cand), pa.int64()))

    def verify(batch: pa.Table) -> pa.Table:
        ks = ray.get(cand_ref)
        return batch.filter(pc.is_in(batch[fact_col], value_set=ks)).select([fact_col])

    present = fact_ds.map_batches(verify, batch_format="pyarrow").unique(fact_col)
    return sorted(int(p) for p in present)


def customers_without_orders(sf_dir: str, use_bloom: bool | None = None) -> pd.DataFrame:
    """ANTI-join (SURVEY.md §2.4): customers with no orders. The orders
    keyset (restricted to keys customers could hold) comes from
    ``_fact_keys_in_probe`` — broadcast set below BLOOM_FACT_THRESHOLD,
    Bloom + exact-verify above it — then one vectorized not-in mask."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    keys = _fact_keys_in_probe(orders, "o_custkey", cust, "c_custkey", use_bloom)
    key_ref = ray.put(pa.array(keys, pa.int64()))

    def anti(batch: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        mask = pc.invert(pc.is_in(batch["c_custkey"], value_set=ks))
        return batch.filter(mask).select(["c_custkey", "c_name"])

    out = cust.map_batches(anti, batch_format="pyarrow").to_pandas()
    if out.empty:  # every customer has orders → typed empty result
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                            "c_name": pd.Series([], dtype=object)})
    return out.sort_values("c_custkey").reset_index(drop=True)


def parts_in_lineitem(sf_dir: str, use_bloom: bool | None = None) -> pd.DataFrame:
    """SEMI-join via broadcast key set (Bloom + exact-verify above the
    fact threshold): parts that appear in at least one lineitem, with
    their size (no row multiplication — membership only)."""
    li = _read(sf_dir, "lineitem", ["l_partkey"])
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_size"])
    keys = _fact_keys_in_probe(li, "l_partkey", part, "p_partkey", use_bloom)
    key_ref = ray.put(pa.array(keys, pa.int64()))

    def semi(batch: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        return batch.filter(pc.is_in(batch["p_partkey"], value_set=ks))

    out = part.map_batches(semi, batch_format="pyarrow").to_pandas()
    if out.empty:  # all-empty map output loses its columns in to_pandas()
        out = pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                            "p_name": pd.Series([], dtype=object),
                            "p_size": pd.Series([], dtype="int32")})
    return out.sort_values("p_partkey").reset_index(drop=True)


def q3_shipping_priority(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """TPC-H Q3 shape: customer(seg='BUILDING'-ish) ⋈ orders(date<) ⋈
    lineitem(date>) → revenue per order, top-k.

    Round-3 plan — the orders⋈lineitem semi-join is a DISTRIBUTED
    tagged-union groupby (no driver-side keyset of qualifying orders,
    which at real Q3 scale is ~10% of the orders table):

    1. qualifying orders emit (o_orderkey, is_order=1, revenue_e4=0,
       n_li=0); the only broadcast is the segment-customer keyset (the
       DIMENSION side of the star — genuinely small);
    2. lineitem emits per-batch PARTIAL revenue aggregates
       (o_orderkey, 0, Σrevenue, n rows) — raw line items never shuffle;
    3. one groupby(o_orderkey) sums the tags: a key qualifies iff
       is_order>0 AND n_li>0 — the semi-join falls out of the aggregate;
    4. per-batch partial top-k over the aggregate, tiny driver merge,
       then one pruned orders re-read resolves o_orderdate for the final
       k keys only.

    Revenue is integer cents×cents (e4) so the sum is reduction-order
    exact."""
    import pyarrow.parquet as pq

    seg_customers = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg = seg_customers["c_mktsegment"].to_pylist()
    keys = [k_ for k_, s in zip(seg_customers["c_custkey"].to_pylist(), seg) if s == "BUILDING"]
    cust_ref = ray.put(pa.array(sorted(keys), pa.int64()))
    cutoff = pa.scalar(np.datetime64("1995-03-15", "us"), pa.timestamp("us"))

    def orders_tag(batch: pa.Table) -> pa.Table:
        ks = ray.get(cust_ref)
        m = pc.and_(pc.is_in(batch["o_custkey"], value_set=ks),
                    pc.less(batch["o_orderdate"], cutoff))
        b = batch.filter(m)
        n = len(b)
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "is_order": pa.array(np.ones(n, np.int64), pa.int64()),
                "revenue_e4": pa.array(np.zeros(n, np.int64), pa.int64()),
                "n_li": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def li_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch["l_shipdate"], cutoff))
        rev = pc.multiply(_cents(b["l_extendedprice"]),
                          _cents(pc.subtract(pa.scalar(1.0), b["l_discount"])))
        g = (
            pa.table({"o_orderkey": pc.cast(b["l_orderkey"], pa.int64()), "revenue_e4": rev})
            .group_by(["o_orderkey"])
            .aggregate([("revenue_e4", "sum"), ("revenue_e4", "count")])
        )
        n = len(g)
        return pa.table(
            {
                "o_orderkey": g["o_orderkey"],
                "is_order": pa.array(np.zeros(n, np.int64), pa.int64()),
                "revenue_e4": pc.cast(g["revenue_e4_sum"], pa.int64()),
                "n_li": pc.cast(g["revenue_e4_count"], pa.int64()),
            }
        )

    orders_side = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_tag, batch_format="pyarrow"
    )
    li_side = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow")

    def partial_topk(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(batch["is_order"], pa.scalar(0, pa.int64())),
                    pc.greater(batch["n_li"], pa.scalar(0, pa.int64())))
        b = batch.filter(m)
        rev = b["revenue_e4"].to_numpy(zero_copy_only=False)
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -rev))[:k]
        return pa.table(
            {
                "l_orderkey": pa.array(ok[order], pa.int64()),
                "revenue_e4": pa.array(rev[order], pa.int64()),
            }
        )

    agg = (
        orders_side.union(li_side)
        .groupby("o_orderkey")
        .aggregate(
            Sum("is_order", alias_name="is_order"),
            Sum("revenue_e4", alias_name="revenue_e4"),
            Sum("n_li", alias_name="n_li"),
        )
        .map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                             "revenue_e4": pd.Series([], dtype="int64"),
                             "o_orderdate": pd.Series([], dtype="datetime64[us]")})
    agg = agg.sort_values(["revenue_e4", "l_orderkey"], ascending=[False, True]).head(k)
    # pruned read: o_orderdate for ONLY the final k orderkeys
    final_keys = pa.array(sorted(agg["l_orderkey"].tolist()), pa.int64())
    dates = (
        pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"],
            filters=[("o_orderkey", "in", final_keys.to_pylist())],
        )
        .to_pandas()
    )
    odate = dict(zip(dates["o_orderkey"], dates["o_orderdate"]))
    agg["o_orderdate"] = agg["l_orderkey"].map(odate).astype("datetime64[us]")
    return agg[["l_orderkey", "revenue_e4", "o_orderdate"]].reset_index(drop=True)


def orders_topk_per_priority(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k orders by total price WITHIN each priority group (the window-
    function shape: row_number() OVER (PARTITION BY ...)). Two-level plan:
    per-batch partial top-k per key (cheap, bounds shuffle rows at
    k × keys × blocks), then a final per-key top-k over the tiny partials.
    Frozen tie order: (cents DESC, orderkey ASC); rank is int32 to match
    the oracle's CAST(row_number() AS INTEGER)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        keys = batch["o_orderpriority"].to_pylist()
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_orderpriority": keys, "o_orderkey": ok, "totalprice_cents": cents})
        df = df.sort_values(["o_orderpriority", "totalprice_cents", "o_orderkey"],
                            ascending=[True, False, True])
        df = df.groupby("o_orderpriority", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["totalprice_cents", "o_orderkey"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g

    out = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    out["rank"] = out["rank"].astype("int32")
    return (
        out[["o_orderpriority", "rank", "o_orderkey", "totalprice_cents"]]
        .sort_values(["o_orderpriority", "rank"])
        .reset_index(drop=True)
    )


def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape (correlated aggregate subquery): per brand, the
    revenue of lineitems whose quantity is below 0.2× that PART's average
    quantity. The correlation runs as aggregate-then-broadcast: one
    pre-aggregated groupby builds per-part (sum_qty_cents, count) — the
    only shuffle, O(parts) rows — and the second lineitem pass joins it as
    a BROADCAST sorted-array lookup (ray.put once, np.searchsorted per
    batch), valid while parts ≪ lineitems (TPC-H is 1:30; at 10^12 rows
    the stats table shards by partkey range instead). The threshold is
    INTEGER-exact, no float division: qty < 0.2·avg ⟺
    5·qty_cents·count < sum_qty_cents — replayed verbatim in SQL. Output
    per brand: qualifying line count + their summed extendedprice cents."""
    stats = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .map_batches(
            lambda b: pa.table(
                {"l_partkey": b["l_partkey"], "qc": _cents(b["l_quantity"])}
            )
            .group_by("l_partkey")
            .aggregate([("qc", "sum"), ("qc", "count")])
            .rename_columns(["l_partkey", "sum_qc", "cnt"]),
            batch_format="pyarrow",
        )
        .groupby("l_partkey")
        .aggregate(Sum("sum_qc", alias_name="sum_qc"), Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("l_partkey")
    )
    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas().sort_values("p_partkey")
    keys = np.ascontiguousarray(stats["l_partkey"].to_numpy())
    ref = ray.put(
        (
            keys,
            np.ascontiguousarray(stats["sum_qc"].to_numpy(), dtype=np.int64),
            np.ascontiguousarray(stats["cnt"].to_numpy(), dtype=np.int64),
            np.ascontiguousarray(part["p_partkey"].to_numpy()),
            part["p_brand"].to_numpy(),
        )
    )

    import functools

    def small_qty(batch: pa.Table, *, stats_ref) -> pa.Table:
        import ray as _ray

        keys_, sum_qc_, cnt_, pkeys_, brands_ = _ray.get(stats_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qc = _cents(batch["l_quantity"]).to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys_, pk)  # every lineitem partkey is in stats
        small = 5 * qc * cnt_[i] < sum_qc_[i]
        if not small.any():
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "n_small": pa.array([], pa.int64()),
                    "sum_price_cents": pa.array([], pa.int64()),
                }
            )
        brand = brands_[np.searchsorted(pkeys_, pk[small])]
        price_c = _cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)[small]
        g = (
            pa.table(
                {
                    "p_brand": pa.array(brand, pa.string()),
                    "one": pa.array(np.ones(small.sum(), np.int64)),
                    "price_c": pa.array(price_c, pa.int64()),
                }
            )
            .group_by("p_brand")
            .aggregate([("one", "sum"), ("price_c", "sum")])
        )
        return g.rename_columns(["p_brand", "n_small", "sum_price_cents"])

    out = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(
            functools.partial(small_qty, stats_ref=ref), batch_format="pyarrow"
        )
        .groupby("p_brand")
        .aggregate(
            Sum("n_small", alias_name="n_small"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
        )
        .to_pandas()
    )
    for c in ("n_small", "sum_price_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("p_brand").reset_index(drop=True)


def q13_customer_order_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape (two-level aggregation with zero-fill): the
    distribution of per-customer order counts INCLUDING customers with no
    orders. Level 1: orders pre-aggregate per batch then groupby custkey —
    O(customers) rows out. Level 2: histogram of those counts is a tiny
    second groupby; the c_count=0 bucket is total customers (a metadata
    count) minus customers seen — no left join materializes. Output
    (c_count, custdist) ordered (custdist DESC, c_count DESC), the TPC-H
    Q13 order."""
    per_cust = (
        _read(sf_dir, "orders", ["o_custkey"])
        .map_batches(
            lambda b: pa.table({"o_custkey": b["o_custkey"]})
            .group_by("o_custkey")
            .aggregate([("o_custkey", "count")])
            .rename_columns(["o_custkey", "n"]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
        .to_pandas()
    )
    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    hist = per_cust.groupby("c_count").size().reset_index(name="custdist")
    zero = int(n_customers) - len(per_cust)
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    hist["c_count"] = hist["c_count"].astype("int64")
    hist["custdist"] = hist["custdist"].astype("int64")
    return hist.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


Q18_QTY_CENTS = 30_000  # HAVING sum(l_quantity) > 300, in integer cents
Q18_LIMIT = 100


def q18_large_volume_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape (groupby-HAVING semi-join): customers whose orders
    total more than 300 units of quantity, with order header and customer
    name, top-100 by (totalprice DESC, orderdate ASC, orderkey ASC —
    frozen tie). The only wide exchange is the pre-aggregated
    groupby(l_orderkey) qty sum; the HAVING tail it keeps is the extreme
    right of the per-order distribution (46 of 15k orders at sf0.01), so
    collecting it is bounded BY CONSTRUCTION at any corpus size — the
    threshold defines a top-tail, not a fraction. Orders and customer are
    then pruned with broadcast key sets (ray.put once, np.isin per
    batch); the final ≤LIMIT-row merge is driver-side. Money/qty in
    integer cents throughout."""
    big = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(
            lambda b: pa.table(
                {"l_orderkey": b["l_orderkey"], "qc": _cents(b["l_quantity"])}
            )
            .group_by("l_orderkey")
            .aggregate([("qc", "sum")])
            .rename_columns(["l_orderkey", "sum_qc"]),
            batch_format="pyarrow",
        )
        .groupby("l_orderkey")
        .aggregate(Sum("sum_qc", alias_name="sum_qty_cents"))
        .map_batches(
            lambda df: df[df["sum_qty_cents"] > Q18_QTY_CENTS], batch_format="pandas"
        )
        .to_pandas()
    )
    okeys = np.sort(big["l_orderkey"].to_numpy())
    okey_ref = ray.put(okeys)

    import functools

    def keep_orders(batch: pa.Table, *, ref) -> pa.Table:
        import ray as _ray

        keys_ = _ray.get(ref)
        mask = np.isin(batch["o_orderkey"].to_numpy(zero_copy_only=False), keys_)
        return batch.filter(pa.array(mask))

    orders = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(functools.partial(keep_orders, ref=okey_ref), batch_format="pyarrow")
        .to_pandas()
    )
    ckey_ref = ray.put(np.unique(orders["o_custkey"].to_numpy()))

    def keep_custs(batch: pa.Table, *, ref) -> pa.Table:
        import ray as _ray

        keys_ = _ray.get(ref)
        mask = np.isin(batch["c_custkey"].to_numpy(zero_copy_only=False), keys_)
        return batch.filter(pa.array(mask))

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(functools.partial(keep_custs, ref=ckey_ref), batch_format="pyarrow")
        .to_pandas()
    )
    out = orders.merge(big, left_on="o_orderkey", right_on="l_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    out["total_price_cents"] = np.round(out["o_totalprice"].to_numpy() * 100.0).astype(
        np.int64
    )
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    out = (
        out.sort_values(
            ["total_price_cents", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True],
        )
        .head(Q18_LIMIT)
        .reset_index(drop=True)
    )
    for c in ("c_custkey", "o_orderkey", "sum_qty_cents"):
        out[c] = out[c].astype("int64")
    return out[
        ["c_name", "c_custkey", "o_orderkey", "o_orderdate", "total_price_cents", "sum_qty_cents"]
    ]


Q5_REGION = "ASIA"
Q5_LO, Q5_HI = "1996-01-01", "1997-01-01"


def q5_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape (co-located 6-table star): revenue per nation where
    the ORDERING customer and the SUPPLYING supplier share a nation in
    one region, over one order-date year.

    Plan — ONE shuffle, aggregate-only (no map_groups; the
    c_nation == s_nation equality is resolved INSIDE the aggregate):

    1. region⋈nation collapses driver-side to ~5 nation codes; the
       supplier→code and customer→code maps for those nations broadcast
       once via ``ray.put`` (two sorted int arrays each — at web scale
       the customer map becomes the per-doc-range sharded lookup of
       SCALE.md §3, same access pattern);
    2. orders (date-filtered) emit (o_orderkey, tag=cust_code+1,
       rev_0..rev_4 = 0); lineitem emits per-batch PARTIAL revenue
       pivoted into one column per supplier nation code — raw lines
       never shuffle, and the pivot makes the equality a column SELECT;
    3. groupby(o_orderkey) sums the union; a row joins iff tag>0, and
       its revenue contribution is column rev_{tag-1} — take_along_axis,
       no second shuffle;
    4. per-batch partial per-nation sums; the driver merges ≤5 rows.

    Revenue in integer e4 (cents × percent-cents), reduction-order
    exact."""
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(reg.loc[reg["r_name"] == Q5_REGION, "r_regionkey"].iloc[0])
    nat = nat[nat["n_regionkey"] == rkey].sort_values("n_nationkey")
    nkeys = nat["n_nationkey"].to_numpy(np.int64)
    names = nat["n_name"].tolist()
    n_codes = len(nkeys)

    def _member_map(tbl: pa.Table, key: str, nk: str):
        ks = tbl[key].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.searchsorted(nkeys, tbl[nk].to_numpy(zero_copy_only=False))
        hit = (codes < n_codes) & (
            np.take(nkeys, np.minimum(codes, n_codes - 1))
            == tbl[nk].to_numpy(zero_copy_only=False)
        )
        order = np.argsort(ks[hit])
        return ks[hit][order], codes[hit][order]

    supp_ref = ray.put(
        _member_map(
            pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]),
            "s_suppkey", "s_nationkey",
        )
    )
    cust_ref = ray.put(
        _member_map(
            pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]),
            "c_custkey", "c_nationkey",
        )
    )
    lo = pa.scalar(np.datetime64(Q5_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q5_HI, "us"), pa.timestamp("us"))
    rev_cols = [f"rev_{i}" for i in range(n_codes)]

    def _lookup(keys: np.ndarray, sorted_keys: np.ndarray, codes: np.ndarray):
        pos = np.searchsorted(sorted_keys, keys)
        pos_c = np.minimum(pos, len(sorted_keys) - 1)
        ok = (len(sorted_keys) > 0) & (np.take(sorted_keys, pos_c) == keys)
        return ok, np.take(codes, pos_c)

    def orders_tag(batch: pa.Table) -> pa.Table:
        sk, sc = ray.get(cust_ref)
        b = batch.filter(
            pc.and_(pc.greater_equal(batch["o_orderdate"], lo),
                    pc.less(batch["o_orderdate"], hi))
        )
        ok, code = _lookup(b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64), sk, sc)
        okey = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[ok]
        cols = {
            "o_orderkey": pa.array(okey, pa.int64()),
            "tag": pa.array(code[ok] + 1, pa.int64()),
        }
        zero = np.zeros(len(okey), np.int64)
        for c in rev_cols:
            cols[c] = pa.array(zero, pa.int64())
        return pa.table(cols)

    def li_pivot(batch: pa.Table) -> pa.Table:
        sk, sc = ray.get(supp_ref)
        ok, code = _lookup(
            batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64), sk, sc
        )
        b = batch.filter(pa.array(ok))
        code = code[ok]
        rev = pc.multiply(
            _cents(b["l_extendedprice"]),
            _cents(pc.subtract(pa.scalar(1.0), b["l_discount"])),
        ).to_numpy(zero_copy_only=False)
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(okey, return_inverse=True)
        piv = np.zeros((len(uk), n_codes), np.int64)
        np.add.at(piv, (inv, code), rev)
        cols = {
            "o_orderkey": pa.array(uk, pa.int64()),
            "tag": pa.array(np.zeros(len(uk), np.int64), pa.int64()),
        }
        for i, c in enumerate(rev_cols):
            cols[c] = pa.array(piv[:, i], pa.int64())
        return pa.table(cols)

    orders_side = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_tag, batch_format="pyarrow"
    )
    li_side = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_pivot, batch_format="pyarrow")

    def per_nation_partial(batch: pa.Table) -> pa.Table:
        tag = batch["tag"].to_numpy(zero_copy_only=False)
        keep = tag > 0
        code = tag[keep] - 1
        piv = np.stack(
            [batch[c].to_numpy(zero_copy_only=False)[keep] for c in rev_cols], axis=1
        )
        contrib = np.take_along_axis(piv, code[:, None], axis=1)[:, 0]
        out = np.zeros(n_codes, np.int64)
        np.add.at(out, code, contrib)
        return pa.table(
            {
                "code": pa.array(np.arange(n_codes), pa.int64()),
                "revenue_e4": pa.array(out, pa.int64()),
            }
        )

    parts = (
        orders_side.union(li_side)
        .groupby("o_orderkey")
        .aggregate(
            Sum("tag", alias_name="tag"),
            *[Sum(c, alias_name=c) for c in rev_cols],
        )
        .map_batches(per_nation_partial, batch_format="pyarrow")
        .to_pandas()
    )
    tot = parts.groupby("code")["revenue_e4"].sum()
    out = pd.DataFrame(
        {
            "n_name": names,
            "revenue_e4": [int(tot.get(i, 0)) for i in range(n_codes)],
        }
    )
    out = out[out["revenue_e4"] > 0]
    return out.sort_values(
        ["revenue_e4", "n_name"], ascending=[False, True]
    ).reset_index(drop=True)


Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape (pure scan-aggregate): Σ extprice·discount over one
    ship-date year, a discount band and a quantity cap — the canonical
    predicate-pushdown query. Per-batch partial (sum, count) rows, one
    tiny driver fold; the discount band compares INTEGER percent-cents
    (round(d·100) ∈ [5,7]) so Ray and SQL agree at the float boundary.
    Revenue in integer e4."""
    lo = pa.scalar(np.datetime64(Q6_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q6_HI, "us"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        disc_c = _cents(batch["l_discount"])
        m = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                        pc.less(batch["l_shipdate"], hi)),
                pc.and_(pc.greater_equal(disc_c, pa.scalar(5, pa.int64())),
                        pc.less_equal(disc_c, pa.scalar(7, pa.int64()))),
            ),
            pc.less(batch["l_quantity"], pa.scalar(24.0)),
        )
        b = batch.filter(m)
        rev = pc.multiply(_cents(b["l_extendedprice"]), _cents(b["l_discount"]))
        s = pc.sum(rev).as_py() or 0
        return pa.table(
            {
                "revenue_e4": pa.array([s], pa.int64()),
                "n_lines": pa.array([len(b)], pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "lineitem",
              ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "revenue_e4": [int(parts["revenue_e4"].sum())],
            "n_lines": [int(parts["n_lines"].sum())],
        }
    )


Q10_LO, Q10_HI = "1996-10-01", "1997-01-01"
Q10_LIMIT = 20


def q10_returned_items(sf_dir: str, k: int = Q10_LIMIT) -> pd.DataFrame:
    """TPC-H Q10 shape (returned-item reporting): revenue lost per
    customer from RETURNED lines of one quarter's orders, top-k with
    name / balance / nation resolved for the winners only.

    Two aggregate-only shuffles: (1) tagged union on o_orderkey glues
    date-filtered orders (tag = o_custkey+1) to per-batch partial
    R-line revenue — the join emits (custkey, revenue) with no
    map_groups; (2) groupby(custkey) sums, per-batch partial top-k,
    tiny driver merge. Customer/nation attributes come from a PRUNED
    read of exactly the k winner keys (q3's resolution idiom). Money in
    integer cents/e4; frozen (revenue DESC, custkey ASC) tie order."""
    lo = pa.scalar(np.datetime64(Q10_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q10_HI, "us"), pa.timestamp("us"))

    def orders_tag(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.and_(pc.greater_equal(batch["o_orderdate"], lo),
                    pc.less(batch["o_orderdate"], hi))
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "tag": pc.cast(pc.add(b["o_custkey"], pa.scalar(1)), pa.int64()),
                "revenue_e4": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            }
        )

    def li_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["l_returnflag"], pa.scalar("R")))
        rev = pc.multiply(
            _cents(b["l_extendedprice"]),
            _cents(pc.subtract(pa.scalar(1.0), b["l_discount"])),
        )
        g = (
            pa.table({"o_orderkey": pc.cast(b["l_orderkey"], pa.int64()), "revenue_e4": rev})
            .group_by("o_orderkey")
            .aggregate([("revenue_e4", "sum")])
        )
        return pa.table(
            {
                "o_orderkey": g["o_orderkey"],
                "tag": pa.array(np.zeros(len(g), np.int64), pa.int64()),
                "revenue_e4": pc.cast(g["revenue_e4_sum"], pa.int64()),
            }
        )

    def to_cust(batch: pa.Table) -> pa.Table:
        tag = batch["tag"].to_numpy(zero_copy_only=False)
        rev = batch["revenue_e4"].to_numpy(zero_copy_only=False)
        keep = (tag > 0) & (rev > 0)
        ck = tag[keep] - 1
        uk, inv = np.unique(ck, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, rev[keep])
        return pa.table(
            {
                "c_custkey": pa.array(uk, pa.int64()),
                "revenue_e4": pa.array(s, pa.int64()),
            }
        )

    def partial_topk(batch: pa.Table) -> pa.Table:
        rev = batch["revenue_e4"].to_numpy(zero_copy_only=False)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -rev))[:k]
        return pa.table(
            {
                "c_custkey": pa.array(ck[order], pa.int64()),
                "revenue_e4": pa.array(rev[order], pa.int64()),
            }
        )

    orders_side = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_tag, batch_format="pyarrow"
    )
    li_side = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow")
    agg = (
        orders_side.union(li_side)
        .groupby("o_orderkey")
        .aggregate(Sum("tag", alias_name="tag"), Sum("revenue_e4", alias_name="revenue_e4"))
        .map_batches(to_cust, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
        .map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype="int64"),
                "c_name": pd.Series([], dtype=object),
                "revenue_e4": pd.Series([], dtype="int64"),
                "acctbal_cents": pd.Series([], dtype="int64"),
                "n_name": pd.Series([], dtype=object),
            }
        )
    agg = agg.sort_values(["revenue_e4", "c_custkey"], ascending=[False, True]).head(k)
    final_keys = sorted(int(x) for x in agg["c_custkey"])
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", final_keys)],
    ).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    cust = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    cust["acctbal_cents"] = np.round(cust["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
    out = agg.merge(cust[["c_custkey", "c_name", "acctbal_cents", "n_name"]], on="c_custkey")
    out["c_custkey"] = out["c_custkey"].astype("int64")
    out["revenue_e4"] = out["revenue_e4"].astype("int64")
    return out[
        ["c_custkey", "c_name", "revenue_e4", "acctbal_cents", "n_name"]
    ].reset_index(drop=True)


Q14_LO, Q14_HI = "1996-09-01", "1996-10-01"


def q14_promo_effect(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape (promotion effect): the PROMO-typed share of one
    ship-month's revenue. The part→is_promo map broadcasts once (sorted
    partkey array + bool flags — the part dimension, small relative to
    lineitem at every TPC-H scale); lineitem is a single scan emitting
    per-batch (promo_e4, total_e4, n) partials; the driver folds three
    integers. Both sums ship as exact BIGINT — the ratio is derivable
    and float-free."""
    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    promo = np.array(
        [t.startswith("PROMO") for t in part["p_type"].to_pylist()], dtype=bool
    )
    order = np.argsort(pk)
    promo_ref = ray.put((pk[order], promo[order]))
    lo = pa.scalar(np.datetime64(Q14_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q14_HI, "us"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        keys, flags = ray.get(promo_ref)
        b = batch.filter(
            pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi))
        )
        rev = pc.multiply(
            _cents(b["l_extendedprice"]),
            _cents(pc.subtract(pa.scalar(1.0), b["l_discount"])),
        ).to_numpy(zero_copy_only=False)
        lpk = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, lpk)
        pos_c = np.minimum(pos, len(keys) - 1)
        is_promo = np.take(flags, pos_c) & (np.take(keys, pos_c) == lpk)
        return pa.table(
            {
                "promo_revenue_e4": pa.array([int(rev[is_promo].sum())], pa.int64()),
                "total_revenue_e4": pa.array([int(rev.sum())], pa.int64()),
                "n_lines": pa.array([len(b)], pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "promo_revenue_e4": [int(parts["promo_revenue_e4"].sum())],
            "total_revenue_e4": [int(parts["total_revenue_e4"].sum())],
            "n_lines": [int(parts["n_lines"].sum())],
        }
    )


Q22_NATIONS = (0, 3, 7, 11, 14, 17, 20)
Q22_CUTOFF = "2000-01-01"


def q22_global_sales_opportunity(sf_dir: str, use_bloom: bool | None = None) -> pd.DataFrame:
    """TPC-H Q22 shape (global sales opportunity), adapted to the tables
    at hand: the driver schema carries no c_phone, so the seven phone
    country-code prefixes become seven NATION keys, and — because this
    synthetic corpus gives EVERY customer at least one order — the
    anti-join excludes customers with any RECENT order (o_orderdate ≥
    Q22_CUTOFF) rather than any order at all. The shape (scalar AVG
    subquery → positive-balance threshold → anti-join against a
    date-filtered orders scan → per-group count/sum) is unchanged.

    The scalar average folds from per-batch (Σcents, n) partials; the
    threshold compares acctbal_cents·n > Σcents — integer
    cross-multiplication, so Ray and the SQL replay agree exactly at
    the boundary (no float division anywhere). The anti-join reuses
    ``_fact_keys_in_probe`` (broadcast keyset below
    BLOOM_FACT_THRESHOLD, distributed Bloom + exact verify above).
    Output (cntry = nationkey, numcust, totacctbal_cents)."""
    nset = pa.array(list(Q22_NATIONS), pa.int64())

    def bal_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"])
        m = pc.and_(
            pc.is_in(pc.cast(batch["c_nationkey"], pa.int64()), value_set=nset),
            pc.greater(cents, pa.scalar(0, pa.int64())),
        )
        kept = cents.filter(m)
        return pa.table(
            {
                "sum_cents": pa.array([pc.sum(kept).as_py() or 0], pa.int64()),
                "n": pa.array([len(kept)], pa.int64()),
            }
        )

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    bal = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"]).map_batches(
        bal_partial, batch_format="pyarrow"
    ).to_pandas()
    tot, cnt = int(bal["sum_cents"].sum()), int(bal["n"].sum())

    cut = pa.scalar(np.datetime64(Q22_CUTOFF, "us"), pa.timestamp("us"))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda b: b.filter(pc.greater_equal(b["o_orderdate"], cut)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", cust_cols)
    have_orders = _fact_keys_in_probe(orders, "o_custkey", cust, "c_custkey", use_bloom)
    okey_ref = ray.put(pa.array(have_orders, pa.int64()))

    def per_nation(batch: pa.Table) -> pa.Table:
        ks = ray.get(okey_ref)
        cents = _cents(batch["c_acctbal"])
        m = pc.and_(
            pc.and_(
                pc.is_in(pc.cast(batch["c_nationkey"], pa.int64()), value_set=nset),
                pc.greater(
                    pc.multiply(cents, pa.scalar(cnt, pa.int64())),
                    pa.scalar(tot, pa.int64()),
                ),
            ),
            pc.invert(pc.is_in(batch["c_custkey"], value_set=ks)),
        )
        b = batch.filter(m)
        g = (
            pa.table(
                {
                    "cntry": pc.cast(b["c_nationkey"], pa.int64()),
                    "bal_cents": _cents(b["c_acctbal"]),
                }
            )
            .group_by("cntry")
            .aggregate([("bal_cents", "sum"), ("bal_cents", "count")])
        )
        return pa.table(
            {
                "cntry": g["cntry"],
                "totacctbal_cents": pc.cast(g["bal_cents_sum"], pa.int64()),
                "numcust": pc.cast(g["bal_cents_count"], pa.int64()),
            }
        )

    parts = cust.map_batches(per_nation, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {
                "cntry": pd.Series([], dtype="int64"),
                "numcust": pd.Series([], dtype="int64"),
                "totacctbal_cents": pd.Series([], dtype="int64"),
            }
        )
    out = (
        parts.groupby("cntry", as_index=False)
        .agg(numcust=("numcust", "sum"), totacctbal_cents=("totacctbal_cents", "sum"))
        .astype({"cntry": "int64", "numcust": "int64", "totacctbal_cents": "int64"})
    )
    return out.sort_values("cntry").reset_index(drop=True)[
        ["cntry", "numcust", "totacctbal_cents"]
    ]


Q4_LO, Q4_HI = "1996-07-01", "1996-10-01"


def q4_order_priority_exists(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape (EXISTS semi-join + priority rollup), adapted to the
    driver schema: orders in one quarter that have AT LEAST ONE returned
    line (l_returnflag = 'R' stands in for the missing commit/receipt-date
    lateness predicate), counted per order priority.

    Plan — the union-groupby semi-join (no broadcast of the big side):
    orders emit (okey, prio_code+1, li=0); lineitem emits per-batch
    DISTINCT returned orderkeys as (okey, 0, 1); one groupby(okey) takes
    Max of both tags; a stateless count-per-priority partial + driver
    fold finishes. Raw lineitem rows never shuffle — only distinct
    returned orderkeys do."""
    from ray.data.aggregate import Max

    prios = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    pcode = {p: i + 1 for i, p in enumerate(prios)}
    lo = pa.scalar(np.datetime64(Q4_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q4_HI, "us"), pa.timestamp("us"))

    def orders_part(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.and_(pc.greater_equal(batch["o_orderdate"], lo),
                    pc.less(batch["o_orderdate"], hi))
        )
        pr = np.fromiter(
            (pcode[p] for p in b["o_orderpriority"].to_pylist()),
            dtype=np.int64, count=len(b),
        )
        return pa.table(
            {
                "okey": pc.cast(b["o_orderkey"], pa.int64()),
                "prio": pa.array(pr, pa.int64()),
                "li": pa.array(np.zeros(len(b), np.int64), pa.int64()),
            }
        )

    def lineitem_part(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["l_returnflag"], pa.scalar("R")))
        okeys = np.unique(b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table(
            {
                "okey": pa.array(okeys, pa.int64()),
                "prio": pa.array(np.zeros(len(okeys), np.int64), pa.int64()),
                "li": pa.array(np.ones(len(okeys), np.int64), pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        orders_part, batch_format="pyarrow"
    )
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        lineitem_part, batch_format="pyarrow"
    )
    merged = (
        orders.union(lines)
        .groupby("okey")
        .aggregate(Max("prio", alias_name="prio"), Max("li", alias_name="li"))
    )

    def count_part(batch: pa.Table) -> pa.Table:
        pr = batch["prio"].to_numpy(zero_copy_only=False)
        li = batch["li"].to_numpy(zero_copy_only=False)
        hit = pr[(pr > 0) & (li > 0)]
        cnt = np.bincount(hit, minlength=len(prios) + 1)[1:]
        return pa.table(
            {
                "prio": pa.array(np.arange(1, len(prios) + 1, dtype=np.int64), pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = merged.map_batches(count_part, batch_format="pyarrow").to_pandas()
    fold = parts.groupby("prio", sort=True)["n"].sum()
    out = pd.DataFrame(
        {
            "o_orderpriority": list(prios),
            "order_count": [int(fold.get(pcode[p], 0)) for p in prios],
        }
    )
    out["order_count"] = out["order_count"].astype("int64")
    return out[out["order_count"] > 0].reset_index(drop=True)


Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q7_LO, Q7_HI = "1996-01-01", "1998-01-01"


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): revenue of
    lines SUPPLIED by one nation for orders PLACED by the other, split by
    ship year, both directions. Same one-shuffle pivot plan as Q5: the
    supplier and customer nation maps broadcast once; lineitem emits
    per-batch revenue partials pivoted into one column per
    (supp-nation, year) cell; orders emit the customer-nation tag; one
    groupby(o_orderkey) joins them; a stateless 8-cell partial + driver
    fold resolves the (supp != cust) pair filter. Revenue in integer e4
    (cents × (100 − discount-cents)) — reduction-order exact."""
    from ray.data.aggregate import Max, Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk = {
        n: int(nat.loc[nat["n_name"] == n, "n_nationkey"].iloc[0])
        for n in (Q7_NATION_A, Q7_NATION_B)
    }
    names = [Q7_NATION_A, Q7_NATION_B]

    def _key_map(table: str, key: str, nkcol: str):
        t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key, nkcol])
        ks = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        nks = t[nkcol].to_numpy(zero_copy_only=False).astype(np.int64)
        code = np.where(nks == nk[Q7_NATION_A], 0, np.where(nks == nk[Q7_NATION_B], 1, -1))
        keep = code >= 0
        order = np.argsort(ks[keep])
        return ks[keep][order], code[keep][order]

    supp_ref = ray.put(_key_map("supplier", "s_suppkey", "s_nationkey"))
    cust_ref = ray.put(_key_map("customer", "c_custkey", "c_nationkey"))
    lo = pa.scalar(np.datetime64(Q7_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q7_HI, "us"), pa.timestamp("us"))
    y0 = int(Q7_LO[:4])
    n_years = int(Q7_HI[:4]) - y0
    cells = [(s, y) for s in range(2) for y in range(n_years)]
    rev_cols = [f"rev_{s}_{y}" for s, y in cells] + [f"cnt_{s}_{y}" for s, y in cells]

    def _lookup(keys: np.ndarray, sorted_keys: np.ndarray, codes: np.ndarray):
        if len(sorted_keys) == 0:
            return np.zeros(len(keys), bool), np.zeros(len(keys), np.int64)
        pos = np.minimum(np.searchsorted(sorted_keys, keys), len(sorted_keys) - 1)
        ok = np.take(sorted_keys, pos) == keys
        return ok, np.take(codes, pos)

    def orders_tag(batch: pa.Table) -> pa.Table:
        sk, sc = ray.get(cust_ref)
        ok, code = _lookup(
            batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64), sk, sc
        )
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[ok]
        cols = {
            "okey": pa.array(okey, pa.int64()),
            "tag": pa.array(code[ok] + 1, pa.int64()),
        }
        for c in rev_cols:
            cols[c] = pa.array(np.zeros(len(okey), np.int64), pa.int64())
        return pa.table(cols)

    def lines_pivot(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi))
        )
        sk, sc = ray.get(supp_ref)
        ok, code = _lookup(
            b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64), sk, sc
        )
        idx = np.flatnonzero(ok)
        if len(idx) == 0:
            cols = {"okey": pa.array([], pa.int64()), "tag": pa.array([], pa.int64())}
            for c in rev_cols:
                cols[c] = pa.array([], pa.int64())
            return pa.table(cols)
        b = b.take(idx)
        code = code[ok]
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        year = (
            b["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[Y]").astype(np.int64)
            + 1970 - y0
        )
        rev = (
            _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
            * (100 - _cents(b["l_discount"]).to_numpy(zero_copy_only=False))
        ).astype(np.int64)
        # per-batch pivot partial: one row per orderkey, rev + line-count
        # columns per cell (counts distinguish "no joining line" from a
        # zero-revenue sum — SQL GROUP BY emits no row for empty groups)
        uo, inv = np.unique(okey, return_inverse=True)
        mat = np.zeros((len(uo), 2 * len(cells)), dtype=np.int64)
        np.add.at(mat, (inv, code * n_years + year), rev)
        np.add.at(mat, (inv, len(cells) + code * n_years + year), 1)
        cols = {
            "okey": pa.array(uo, pa.int64()),
            "tag": pa.array(np.zeros(len(uo), np.int64), pa.int64()),
        }
        for j, c in enumerate(rev_cols):
            cols[c] = pa.array(mat[:, j], pa.int64())
        return pa.table(cols)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        orders_tag, batch_format="pyarrow"
    )
    lines = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(lines_pivot, batch_format="pyarrow")
    merged = (
        orders.union(lines)
        .groupby("okey")
        .aggregate(
            Max("tag", alias_name="tag"),
            *[Sum(c, alias_name=c) for c in rev_cols],
        )
    )

    def cell_fold(batch: pa.Table) -> pa.Table:
        tag = batch["tag"].to_numpy(zero_copy_only=False)
        rows = {"supp": [], "cust": [], "year": [], "rev": [], "cnt": []}
        for s, y in cells:
            rv = batch[f"rev_{s}_{y}"].to_numpy(zero_copy_only=False)
            ct = batch[f"cnt_{s}_{y}"].to_numpy(zero_copy_only=False)
            for cust in range(2):
                if cust == s:
                    continue  # Q7 keeps only the two cross pairs
                sel = tag == cust + 1
                rows["supp"].append(s)
                rows["cust"].append(cust)
                rows["year"].append(y0 + y)
                rows["rev"].append(int(rv[sel].sum()))
                rows["cnt"].append(int(ct[sel].sum()))
        return pa.table(
            {
                "supp": pa.array(rows["supp"], pa.int64()),
                "cust": pa.array(rows["cust"], pa.int64()),
                "year": pa.array(rows["year"], pa.int64()),
                "rev": pa.array(rows["rev"], pa.int64()),
                "cnt": pa.array(rows["cnt"], pa.int64()),
            }
        )

    parts = merged.map_batches(cell_fold, batch_format="pyarrow").to_pandas()
    fold = (
        parts.groupby(["supp", "cust", "year"], sort=True)[["rev", "cnt"]]
        .sum()
        .reset_index()
    )
    fold = fold[fold["cnt"] > 0]  # SQL emits no row for an empty group
    out = pd.DataFrame(
        {
            "supp_nation": pd.Series([names[s] for s in fold["supp"]], dtype=object),
            "cust_nation": pd.Series([names[c] for c in fold["cust"]], dtype=object),
            "l_year": fold["year"].astype("int64"),
            "revenue_e4": fold["rev"].astype("int64"),
        }
    )
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)


Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue — the CREATE
    VIEW + max() pattern): revenue per suppkey over one ship-date
    quarter, then the supplier(s) achieving the maximum. Per-batch
    partial sums per suppkey → one small groupby(suppkey) → driver
    takes the max and joins the tiny supplier table for names. Revenue
    in integer e4, so the max comparison is exact — no float-revenue
    tie ambiguity."""
    from ray.data.aggregate import Sum

    lo = pa.scalar(np.datetime64(Q15_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q15_HI, "us"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi))
        )
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = (
            _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
            * (100 - _cents(b["l_discount"]).to_numpy(zero_copy_only=False))
        ).astype(np.int64)
        us, inv = np.unique(sk, return_inverse=True)
        sums = np.zeros(len(us), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table(
            {"s_suppkey": pa.array(us, pa.int64()), "total_revenue_e4": pa.array(sums, pa.int64())}
        )

    agg = (
        _read(sf_dir, "lineitem",
              ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("total_revenue_e4", alias_name="total_revenue_e4"))
        .to_pandas()
    )
    best = agg[agg["total_revenue_e4"] == agg["total_revenue_e4"].max()]
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(supp, on="s_suppkey").sort_values("s_suppkey").reset_index(drop=True)
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["total_revenue_e4"] = out["total_revenue_e4"].astype("int64")
    return out[["s_suppkey", "s_name", "total_revenue_e4"]]


# Q19 disjunctive predicate triples: (brand, max size, qty lo, qty hi)
Q19_PREDS = (
    ("Brand#1", 15, 1, 15),
    ("Brand#2", 25, 10, 25),
    ("Brand#3", 35, 20, 35),
)


def q19_discounted_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape (disjunctive OR-of-ANDs pushdown over a broadcast
    dimension): Σ extprice·(1−discount) over lines whose part satisfies
    any of three (brand, size-band, quantity-band) conjunctions —
    adapted to the driver part schema (no container column; size bands
    stand in). The part table broadcasts once as three sorted arrays
    (partkey → brand code, size); each lineitem batch resolves the
    disjunction with vectorized lookups — no join shuffle at all.
    Revenue in integer e4; quantity compared in integer cents."""
    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    brands = {b: i for i, (b, *_rest) in enumerate(Q19_PREDS)}
    bcode = np.fromiter(
        (brands.get(b, -1) for b in part["p_brand"].to_pylist()),
        dtype=np.int64, count=len(part),
    )
    psize = part["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk)
    part_ref = ray.put((pk[order], bcode[order], psize[order]))
    qlo = np.array([p[2] for p in Q19_PREDS], dtype=np.int64) * 100
    qhi = np.array([p[3] for p in Q19_PREDS], dtype=np.int64) * 100
    smax = np.array([p[1] for p in Q19_PREDS], dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        pks, codes, sizes = ray.get(part_ref)
        keys = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(pks, keys), len(pks) - 1)
        ok = np.take(pks, pos) == keys
        code = np.where(ok, np.take(codes, pos), -1)
        size = np.where(ok, np.take(sizes, pos), 0)
        qty_c = np.round(
            batch["l_quantity"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        hit = code >= 0
        cc = np.maximum(code, 0)
        hit &= (size >= 1) & (size <= np.take(smax, cc))
        hit &= (qty_c >= np.take(qlo, cc)) & (qty_c <= np.take(qhi, cc))
        rev = (
            _cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)
            * (100 - _cents(batch["l_discount"]).to_numpy(zero_copy_only=False))
        ).astype(np.int64)
        return pa.table(
            {
                "revenue_e4": pa.array([int(rev[hit].sum())], pa.int64()),
                "n_lines": pa.array([int(hit.sum())], pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "revenue_e4": pd.Series([int(parts["revenue_e4"].sum())], dtype="int64"),
            "n_lines": pd.Series([int(parts["n_lines"].sum())], dtype="int64"),
        }
    )


Q8_NATION = "NATION_2"
Q8_REGION = "ASIA"     # NATION_2's region
Q8_TYPE = "PROMO"
Q8_LO, Q8_HI = "1996-01-01", "1998-01-01"


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape (national market share): of all PROMO-part revenue
    sold into one region's customers over two order years, what share was
    supplied by one nation — per year. Same pivot union-groupby spine as
    Q5/Q7: three small dimension maps broadcast (customer → in-region,
    part → type match, supplier → is-nation), lineitem emits revenue
    pivoted by supplier-is-nation, orders carry the year tag (the year is
    an ORDER attribute here, so it rides the orders side of the
    union-groupby rather than the lineitem pivot); an 8-cell stateless
    fold finishes. Volumes in integer e4; mkt_share is the one float —
    computed from those exact integers by the same division in both
    engines, rounded 6dp."""
    from ray.data.aggregate import Max, Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(reg.loc[reg["r_name"] == Q8_REGION, "r_regionkey"].iloc[0])
    region_nations = set(nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].astype(int))
    nkey = int(nat.loc[nat["n_name"] == Q8_NATION, "n_nationkey"].iloc[0])
    y0 = int(Q8_LO[:4])
    n_years = int(Q8_HI[:4]) - y0

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    in_region = np.isin(cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                        sorted(region_nations))
    order_c = np.argsort(ck[in_region])
    cust_ref = ray.put(ck[in_region][order_c])

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    tmask = np.fromiter((t == Q8_TYPE for t in part["p_type"].to_pylist()), bool, count=len(pk))
    part_ref = ray.put(np.sort(pk[tmask]))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_n = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64) == nkey
    supp_ref = ray.put(np.sort(sk[is_n]))

    lo = pa.scalar(np.datetime64(Q8_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q8_HI, "us"), pa.timestamp("us"))
    piv_cols = ["rev_n", "rev_o", "cnt"]

    def _member(keys: np.ndarray, sorted_keys: np.ndarray) -> np.ndarray:
        if len(sorted_keys) == 0:
            return np.zeros(len(keys), bool)
        pos = np.minimum(np.searchsorted(sorted_keys, keys), len(sorted_keys) - 1)
        return np.take(sorted_keys, pos) == keys

    def orders_tag(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.and_(pc.greater_equal(batch["o_orderdate"], lo),
                    pc.less(batch["o_orderdate"], hi))
        )
        keep = _member(
            b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            ray.get(cust_ref),
        )
        okey = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        year = (
            b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[Y]")
            .astype(np.int64)[keep] + 1970 - y0
        )
        cols = {
            "okey": pa.array(okey, pa.int64()),
            "tag": pa.array(year + 1, pa.int64()),
        }
        for c in piv_cols:
            cols[c] = pa.array(np.zeros(len(okey), np.int64), pa.int64())
        return pa.table(cols)

    def lines_pivot(batch: pa.Table) -> pa.Table:
        keep = _member(
            batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            ray.get(part_ref),
        )
        idx = np.flatnonzero(keep)
        b = batch.take(idx)
        is_nat = _member(
            b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            ray.get(supp_ref),
        )
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = (
            _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
            * (100 - _cents(b["l_discount"]).to_numpy(zero_copy_only=False))
        ).astype(np.int64)
        uo, inv = np.unique(okey, return_inverse=True)
        mat = np.zeros((len(uo), 3), dtype=np.int64)
        np.add.at(mat, (inv, np.where(is_nat, 0, 1)), rev)
        np.add.at(mat, (inv, 2), 1)
        cols = {
            "okey": pa.array(uo, pa.int64()),
            "tag": pa.array(np.zeros(len(uo), np.int64), pa.int64()),
        }
        for j, c in enumerate(piv_cols):
            cols[c] = pa.array(mat[:, j], pa.int64())
        return pa.table(cols)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_tag, batch_format="pyarrow"
    )
    lines = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(lines_pivot, batch_format="pyarrow")
    merged = (
        orders.union(lines)
        .groupby("okey")
        .aggregate(
            Max("tag", alias_name="tag"),
            *[Sum(c, alias_name=c) for c in piv_cols],
        )
    )

    def year_fold(batch: pa.Table) -> pa.Table:
        tag = batch["tag"].to_numpy(zero_copy_only=False)
        rn = batch["rev_n"].to_numpy(zero_copy_only=False)
        ro = batch["rev_o"].to_numpy(zero_copy_only=False)
        ct = batch["cnt"].to_numpy(zero_copy_only=False)
        rows = []
        for y in range(n_years):
            sel = tag == y + 1
            rows.append((y0 + y, int(rn[sel].sum()), int((rn[sel] + ro[sel]).sum()), int(ct[sel].sum())))
        return pa.table(
            {
                "o_year": pa.array([r[0] for r in rows], pa.int64()),
                "nat": pa.array([r[1] for r in rows], pa.int64()),
                "tot": pa.array([r[2] for r in rows], pa.int64()),
                "cnt": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    parts = merged.map_batches(year_fold, batch_format="pyarrow").to_pandas()
    fold = parts.groupby("o_year", sort=True)[["nat", "tot", "cnt"]].sum().reset_index()
    fold = fold[fold["cnt"] > 0]
    out = pd.DataFrame(
        {
            "o_year": fold["o_year"].astype("int64"),
            "nation_volume_e4": fold["nat"].astype("int64"),
            "total_volume_e4": fold["tot"].astype("int64"),
            "mkt_share": (fold["nat"].astype(float) / fold["tot"].astype(float)).round(6),
        }
    )
    return out.reset_index(drop=True)


Q12_LO, Q12_HI = "1996-01-01", "1997-01-01"
Q12_FLAGS = ("A", "N", "R")


def q12_priority_class_by_flag(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (CASE aggregation over a big-big join), adapted to
    the driver schema: per l_returnflag (standing in for the missing
    l_shipmode), how many lines shipped in one year belong to
    high-priority orders (1-URGENT / 2-HIGH) vs the rest. The union-
    groupby spine again — lineitem emits per-order line counts pivoted by
    returnflag, orders carry the priority-class tag, one groupby(okey)
    joins them, a 6-cell stateless fold finishes. All counts int64."""
    from ray.data.aggregate import Max, Sum

    lo = pa.scalar(np.datetime64(Q12_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q12_HI, "us"), pa.timestamp("us"))
    flag_code = {f: i for i, f in enumerate(Q12_FLAGS)}
    cnt_cols = [f"cnt_{f}" for f in Q12_FLAGS]

    def orders_tag(batch: pa.Table) -> pa.Table:
        pr = batch["o_orderpriority"].to_pylist()
        tag = np.fromiter(
            (2 if p in ("1-URGENT", "2-HIGH") else 1 for p in pr),
            dtype=np.int64, count=len(pr),
        )
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"okey": pa.array(okey, pa.int64()), "tag": pa.array(tag, pa.int64())}
        for c in cnt_cols:
            cols[c] = pa.array(np.zeros(len(okey), np.int64), pa.int64())
        return pa.table(cols)

    def lines_pivot(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.and_(pc.greater_equal(batch["l_shipdate"], lo),
                    pc.less(batch["l_shipdate"], hi))
        )
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        fc = np.fromiter(
            (flag_code[f] for f in b["l_returnflag"].to_pylist()),
            dtype=np.int64, count=len(b),
        )
        uo, inv = np.unique(okey, return_inverse=True)
        mat = np.zeros((len(uo), len(Q12_FLAGS)), dtype=np.int64)
        np.add.at(mat, (inv, fc), 1)
        cols = {
            "okey": pa.array(uo, pa.int64()),
            "tag": pa.array(np.zeros(len(uo), np.int64), pa.int64()),
        }
        for j, c in enumerate(cnt_cols):
            cols[c] = pa.array(mat[:, j], pa.int64())
        return pa.table(cols)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        orders_tag, batch_format="pyarrow"
    )
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"]).map_batches(
        lines_pivot, batch_format="pyarrow"
    )
    merged = (
        orders.union(lines)
        .groupby("okey")
        .aggregate(
            Max("tag", alias_name="tag"),
            *[Sum(c, alias_name=c) for c in cnt_cols],
        )
    )

    def fold(batch: pa.Table) -> pa.Table:
        tag = batch["tag"].to_numpy(zero_copy_only=False)
        rows = {"flag": [], "high": [], "low": []}
        for f in Q12_FLAGS:
            c = batch[f"cnt_{f}"].to_numpy(zero_copy_only=False)
            rows["flag"].append(f)
            rows["high"].append(int(c[tag == 2].sum()))
            rows["low"].append(int(c[tag == 1].sum()))
        return pa.table(
            {
                "flag": pa.array(rows["flag"], pa.string()),
                "high": pa.array(rows["high"], pa.int64()),
                "low": pa.array(rows["low"], pa.int64()),
            }
        )

    parts = merged.map_batches(fold, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("flag", sort=True)[["high", "low"]].sum().reset_index()
    agg = agg[(agg["high"] + agg["low"]) > 0]  # GROUP BY emits no empty flag
    out = pd.DataFrame(
        {
            "l_returnflag": agg["flag"].astype(object),
            "high_line_count": agg["high"].astype("int64"),
            "low_line_count": agg["low"].astype("int64"),
        }
    )
    return out.reset_index(drop=True)


LTV_BUCKETS = 10


def customer_ltv_deciles(sf_dir: str, n_buckets: int = LTV_BUCKETS) -> pd.DataFrame:
    """Customer lifetime-value DECILES — value-frozen bucketing of a
    DERIVED aggregate (the two-level analytics shape: aggregate first,
    then rank the aggregate): revenue cents per customer (pre-aggregated
    groupby, the only exchange), exact type-1 lower decile thresholds
    from the sorted per-customer array, buckets BY VALUE (never NTILE,
    whose row-split of ties is engine-dependent; ties at a threshold all
    land low, like ccnet_buckets). Customers with no orders join as
    revenue-0 rows (the Q13 zero-fill rule, via a metadata row count).
    The driver fold is CUSTOMER-count-sized — fine at 10^8 customers and
    honest about it; past that the thresholds come from the distributed
    distinct-value histogram (windows.events_value_median's plan) and
    assignment becomes a broadcast second pass. Output
    (decile, n_customers, sum_revenue_c), all int64 — hash-exact."""
    import pyarrow.parquet as pq_

    agg = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            lambda b: pa.table(
                {"o_custkey": b["o_custkey"], "cents": _cents(b["o_totalprice"])}
            )
            .group_by("o_custkey")
            .aggregate([("cents", "sum")])
            .rename_columns(["o_custkey", "revenue_cents"]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    n_cust_total = pq_.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    rev = np.concatenate(
        [agg["revenue_cents"].to_numpy(np.int64),
         np.zeros(n_cust_total - len(agg), dtype=np.int64)]
    )
    v = np.sort(rev)
    n = len(v)
    # type-1 lower quantiles at i/n_buckets, i = 1..n_buckets-1
    th = v[[(i * (n - 1)) // n_buckets for i in range(1, n_buckets)]]
    bucket = np.searchsorted(th, rev, side="left")  # rev <= th[d] → d
    out = (
        pd.DataFrame({"decile": bucket, "c": rev})
        .groupby("decile")
        .agg(n_customers=("c", "size"), sum_revenue_c=("c", "sum"))
        .reset_index()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


Q21_LIMIT = 10


def q21_sole_failing_supplier(sf_dir: str, limit: int = Q21_LIMIT) -> pd.DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting — the
    multi-condition semi/anti join), adapted to the driver schema:
    orders served by ≥ 2 distinct suppliers where EXACTLY ONE supplier
    has returned ('R') lines — that sole failing supplier takes the
    blame; count blames per supplier, top ``limit`` by (count DESC,
    suppkey). Aggregate-only, no per-group Python: distinct
    (okey, suppkey, any_R) via one two-key groupby, then a second
    groupby(okey) folds (n_suppliers, n_failing, argmax-encoded failing
    suppkey — Max(is_R·(suppkey+1)) names the culprit exactly when
    n_failing == 1), a stateless filter + per-batch blame counts, and a
    tiny final fold. The supplier name table broadcasts driver-side."""
    from ray.data.aggregate import Count, Max, Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])

    def dedup_partial(batch: pa.Table) -> pa.Table:
        is_r = pc.cast(pc.equal(batch["l_returnflag"], pa.scalar("R")), pa.int64())
        return (
            pa.table(
                {
                    "okey": pc.cast(batch["l_orderkey"], pa.int64()),
                    "suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
                    "is_r": is_r,
                }
            )
            .group_by(["okey", "suppkey"])
            .aggregate([("is_r", "max")])
            .rename_columns(["okey", "suppkey", "is_r"])
        )

    per_supp = (
        li.map_batches(dedup_partial, batch_format="pyarrow")
        .groupby(["okey", "suppkey"])
        .aggregate(Max("is_r", alias_name="is_r"))
    )

    def order_partial(batch: pa.Table) -> pa.Table:
        sk = batch["suppkey"].to_numpy(zero_copy_only=False)
        ir = batch["is_r"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "okey": batch["okey"],
                "one": pa.array(np.ones(len(sk), np.int64), pa.int64()),
                "is_r": batch["is_r"],
                "rk": pa.array(ir * (sk + 1), pa.int64()),
            }
        )

    orders = (
        per_supp.map_batches(order_partial, batch_format="pyarrow")
        .groupby("okey")
        .aggregate(
            Sum("one", alias_name="n_supp"),
            Sum("is_r", alias_name="n_fail"),
            Max("rk", alias_name="rk"),
        )
    )

    def blame_partial(batch: pa.Table) -> pa.Table:
        ns = batch["n_supp"].to_numpy(zero_copy_only=False)
        nf = batch["n_fail"].to_numpy(zero_copy_only=False)
        rk = batch["rk"].to_numpy(zero_copy_only=False)
        hit = (ns >= 2) & (nf == 1)
        supp = rk[hit] - 1
        us, cnt = np.unique(supp, return_counts=True)
        return pa.table(
            {
                "s_suppkey": pa.array(us, pa.int64()),
                "numwait": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        orders.map_batches(blame_partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
        .to_pandas()
        .sort_values(["numwait", "s_suppkey"], ascending=[False, True])
        .head(limit)
        .reset_index(drop=True)
    )
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]).to_pandas()
    out = agg.merge(supp, on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["numwait"] = out["numwait"].astype("int64")
    return out[["s_suppkey", "s_name", "numwait"]]


Q9_NAME_WORD = "red"  # Q9 part filter: p_name contains this word


def q9_product_type_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year): for parts
    whose name contains Q9_NAME_WORD, profit per (supplier nation, ship
    year). The driver schema has no partsupp, so the cost leg substitutes
    ``p_retailprice·l_quantity`` for ``ps_supplycost·l_quantity`` (same
    fold: a part-keyed price lookup times quantity), and the year comes
    from l_shipdate instead of a second fact join to orders — the
    (dimension broadcast → vectorized lookups → (nation, year)-keyed
    partial sums → one small groupby) shape is Q9's. Profit in integer
    e4 (revenue e4 − retail_cents·qty·100), exact and sign-carrying."""
    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"]
    )
    name_hit = pc.match_substring(part["p_name"], Q9_NAME_WORD)
    part = part.filter(name_hit)
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    retail_c = _cents(part["p_retailprice"]).to_numpy(zero_copy_only=False)
    order = np.argsort(pk)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snat = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sorder = np.argsort(sk)
    ref = ray.put((pk[order], retail_c[order], sk[sorder], snat[sorder]))

    def partial(batch: pa.Table) -> pa.Table:
        pks, retail, sks, snats = ray.get(ref)
        keys = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(pks, keys), max(len(pks) - 1, 0))
        hit = len(pks) > 0 and np.take(pks, pos) == keys
        if not np.any(hit):
            return pa.table({"key": pa.array([], pa.int64()),
                             "profit_e4": pa.array([], pa.int64())})
        b = batch.filter(pa.array(hit))
        pos = pos[hit]
        qty = np.round(
            b["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        rev = (
            _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
            * (100 - _cents(b["l_discount"]).to_numpy(zero_copy_only=False))
        ).astype(np.int64)
        profit = rev - np.take(retail, pos) * qty * 100
        lsk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        spos = np.searchsorted(sks, lsk)
        ncode = np.take(snats, spos)  # every l_suppkey exists in supplier
        year = pc.year(b["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        key = ncode * 10000 + year
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, profit)
        return pa.table({"key": pa.array(uk, pa.int64()),
                         "profit_e4": pa.array(sums, pa.int64())})

    agg = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
               "l_discount", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("profit_e4", alias_name="profit_e4"))
        .to_pandas()
    )
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    agg["n_name"] = (agg["key"] // 10000).map(nname)
    agg["o_year"] = (agg["key"] % 10000).astype("int64")
    agg["profit_e4"] = agg["profit_e4"].astype("int64")
    out = agg.sort_values(["n_name", "o_year"], ascending=[True, False])
    return out[["n_name", "o_year", "profit_e4"]].reset_index(drop=True)


Q2_SIZE = 5
Q2_REGION = "EUROPE"
Q2_TOPN = 20


def q2_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier — the correlated-MIN
    subquery): for every size-Q2_SIZE part, the Q2_REGION supplier(s)
    whose supply cost equals that part's regional minimum, ranked by
    account balance. No partsupp in the driver schema, so supply cost is
    the supplier's MIN l_extendedprice (cents) for that part — the
    correlated ``WHERE cost = (SELECT min ...)`` fold is intact. Plan:
    part/supplier sets broadcast; per-batch (part,supp)-keyed MIN
    partials; one groupby-MIN exchange; the per-part regional min and
    the equality filter run on the pair-count-sized result (driver-side
    here; a k-sized groupby at cluster scale). Output ordered
    (s_acctbal_cents DESC, p_partkey, s_suppkey), top Q2_TOPN."""
    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    pk = part.filter(pc.equal(part["p_size"], Q2_SIZE))["p_partkey"]
    pk = np.sort(pk.to_numpy(zero_copy_only=False).astype(np.int64))
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    eu_nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    eu_nat = eu_nat[eu_nat["r_name"] == Q2_REGION]
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    ).to_pandas()
    supp = supp.merge(eu_nat[["n_nationkey", "n_name"]],
                      left_on="s_nationkey", right_on="n_nationkey")
    sk = np.sort(supp["s_suppkey"].to_numpy().astype(np.int64))
    ref = ray.put((pk, sk))

    def partial(batch: pa.Table) -> pa.Table:
        pks, sks = ray.get(ref)
        kp = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ks = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = np.zeros(len(kp), dtype=bool)
        if len(pks) and len(sks):
            pp = np.minimum(np.searchsorted(pks, kp), len(pks) - 1)
            ss = np.minimum(np.searchsorted(sks, ks), len(sks) - 1)
            hit = (np.take(pks, pp) == kp) & (np.take(sks, ss) == ks)
        if not hit.any():
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "s_suppkey": pa.array([], pa.int64()),
                             "cost_cents": pa.array([], pa.int64())})
        cost = _cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)[hit]
        key = kp[hit] * 1_000_000 + ks[hit]
        uk, inv = np.unique(key, return_inverse=True)
        mins = np.full(len(uk), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, cost)
        return pa.table({"p_partkey": pa.array(uk // 1_000_000, pa.int64()),
                         "s_suppkey": pa.array(uk % 1_000_000, pa.int64()),
                         "cost_cents": pa.array(mins, pa.int64())})

    pairs = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["p_partkey", "s_suppkey"])
        .aggregate(Min("cost_cents", alias_name="cost_cents"))
        .to_pandas()
    )
    if len(pairs) == 0:
        return pd.DataFrame({"s_acctbal_cents": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object"),
                             "n_name": pd.Series([], dtype="object"),
                             "p_partkey": pd.Series([], dtype="int64"),
                             "cost_cents": pd.Series([], dtype="int64")})
    part_min = pairs.groupby("p_partkey")["cost_cents"].transform("min")
    best = pairs[pairs["cost_cents"] == part_min]
    supp["s_acctbal_cents"] = np.round(supp["s_acctbal"].to_numpy() * 100.0).astype(np.int64)
    out = best.merge(supp[["s_suppkey", "s_name", "n_name", "s_acctbal_cents"]],
                     on="s_suppkey")
    out = out.sort_values(
        ["s_acctbal_cents", "p_partkey", "s_suppkey"], ascending=[False, True, True]
    ).head(Q2_TOPN).reset_index(drop=True)
    for c in ("s_acctbal_cents", "p_partkey", "cost_cents"):
        out[c] = out[c].astype("int64")
    return out[["s_acctbal_cents", "s_name", "n_name", "p_partkey", "cost_cents"]]


Q11_NATION = "NATION_3"  # has suppliers at every driver scale
Q11_FRACTION_DENOM = 500  # keep parts with value*DENOM > total


def q11_important_parts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 shape (important stock — GROUP BY with a global-scalar
    HAVING): per-part value supplied by Q11_NATION's suppliers, keeping
    parts whose value exceeds 1/Q11_FRACTION_DENOM of the nation's total
    — the threshold is the integer cross-multiply ``value·DENOM >
    total`` (scale-free, like Q11's 0.0001/SF). Value substitutes
    Σ l_extendedprice cents for ps_supplycost·ps_availqty (no partsupp).
    Per-batch part-keyed partials → one groupby → the HAVING and sort on
    the part-cardinality-sized fold. Output (p_partkey, value_cents)
    ordered value DESC, partkey ASC (frozen tie)."""
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk = int(nat.loc[nat["n_name"] == Q11_NATION, "n_nationkey"].iloc[0])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    sk = supp.filter(pc.equal(supp["s_nationkey"], nk))["s_suppkey"]
    sk = np.sort(sk.to_numpy(zero_copy_only=False).astype(np.int64))
    ref = ray.put(sk)

    def partial(batch: pa.Table) -> pa.Table:
        sks = ray.get(ref)
        ks = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = np.zeros(len(ks), dtype=bool)
        if len(sks):
            ss = np.minimum(np.searchsorted(sks, ks), len(sks) - 1)
            hit = np.take(sks, ss) == ks
        if not hit.any():
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "value_cents": pa.array([], pa.int64())})
        val = _cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)[hit]
        kp = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)[hit]
        uk, inv = np.unique(kp, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, val)
        return pa.table({"p_partkey": pa.array(uk, pa.int64()),
                         "value_cents": pa.array(sums, pa.int64())})

    agg = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("p_partkey")
        .aggregate(Sum("value_cents", alias_name="value_cents"))
        .to_pandas()
    )
    if len(agg) == 0:  # nation without suppliers: empty fold has no schema
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "value_cents": pd.Series([], dtype="int64")})
    total = int(agg["value_cents"].sum())
    keep = agg[agg["value_cents"] * Q11_FRACTION_DENOM > total]
    out = keep.sort_values(["value_cents", "p_partkey"], ascending=[False, True])
    out = out.reset_index(drop=True)
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["value_cents"] = out["value_cents"].astype("int64")
    return out[["p_partkey", "value_cents"]]


Q16_EXCL_BRAND = "Brand#1"
Q16_EXCL_TYPE_PREFIX = "PROMO"
Q16_SIZES = (1, 4, 7, 10)


def q16_part_supplier_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship — COUNT DISTINCT
    suppliers per part attribute with a NOT-IN supplier exclusion): for
    parts NOT of Q16_EXCL_BRAND, type not starting Q16_EXCL_TYPE_PREFIX,
    size in Q16_SIZES, count DISTINCT suppliers per (brand, type, size),
    excluding suppliers with negative account balance (the complaint
    surrogate — no s_comment column). The part-supplier relation is the
    DISTINCT (l_partkey, l_suppkey) projection of lineitem (no partsupp
    table). Two distinct exchanges: composite-key pair dedup, then
    (attr-triple, supplier) dedup — both pre-deduped per batch so only
    distinct keys shuffle. Output ordered (supplier_cnt DESC, brand,
    type, size)."""
    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    )
    keep = pc.and_(
        pc.not_equal(part["p_brand"], Q16_EXCL_BRAND),
        pc.invert(pc.starts_with(part["p_type"], Q16_EXCL_TYPE_PREFIX)),
    )
    keep = pc.and_(keep, pc.is_in(part["p_size"], value_set=pa.array(Q16_SIZES, pa.int32())))
    part = part.filter(keep)
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    triples = [
        (b, t, int(z))
        for b, t, z in zip(part["p_brand"].to_pylist(),
                           part["p_type"].to_pylist(),
                           part["p_size"].to_pylist())
    ]
    tri_ids = {tr: i for i, tr in enumerate(sorted(set(triples)))}
    tcode = np.fromiter((tri_ids[tr] for tr in triples), dtype=np.int64, count=len(triples))
    order = np.argsort(pk)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"])
    bad = supp.filter(pc.less(supp["s_acctbal"], 0.0))["s_suppkey"]
    bad = np.sort(bad.to_numpy(zero_copy_only=False).astype(np.int64))
    ref = ray.put((pk[order], tcode[order], bad))

    def pair_partial(batch: pa.Table) -> pa.Table:
        pks, tcodes, bads = ray.get(ref)
        kp = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ks = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = np.zeros(len(kp), dtype=bool)
        if len(pks):
            pp = np.minimum(np.searchsorted(pks, kp), len(pks) - 1)
            hit = np.take(pks, pp) == kp
        if len(bads):
            bb = np.minimum(np.searchsorted(bads, ks), len(bads) - 1)
            hit &= np.take(bads, bb) != ks
        if not hit.any():
            return pa.table({"pair": pa.array([], pa.int64())})
        pp = np.searchsorted(pks, kp[hit])
        # tcode·1e12 + pk·1e6 + sk: pk,sk < 1e6 and tcode < 9e6 at any
        # driver scale — no int64 overflow
        key = np.take(tcodes, pp) * np.int64(10**12) \
            + kp[hit] * 1_000_000 + ks[hit]
        return pa.table({"pair": pa.array(np.unique(key), pa.int64())})

    pair_ds = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Count(alias_name="_n"))
    )

    def tri_supp(batch: pa.Table) -> pa.Table:
        key = batch["pair"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (key // np.int64(10**12)) * 1_000_000 + key % 1_000_000
        return pa.table({"ts": pa.array(np.unique(ts), pa.int64())})

    def tri_partial(batch: pa.Table) -> pa.Table:
        # fold distinct (triple, supplier) keys to per-triple partial
        # counts IN the exchange — the driver only ever sees ≤ #triples
        # rows, not #triples × #suppliers
        t = (batch["ts"].to_numpy(zero_copy_only=False) // 1_000_000).astype(np.int64)
        ut, c = np.unique(t, return_counts=True)
        return pa.table({"tcode": pa.array(ut, pa.int64()),
                         "supplier_cnt": pa.array(c.astype(np.int64), pa.int64())})

    agg16 = (
        pair_ds.map_batches(tri_supp, batch_format="pyarrow")
        .groupby("ts")
        .aggregate(Count(alias_name="_n"))
        .map_batches(tri_partial, batch_format="pyarrow")
        .groupby("tcode")
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
        .to_pandas()
    )
    tri_of = {i: tr for tr, i in tri_ids.items()}
    if len(agg16) == 0:
        return pd.DataFrame({"p_brand": pd.Series([], dtype="object"),
                             "p_type": pd.Series([], dtype="object"),
                             "p_size": pd.Series([], dtype="int64"),
                             "supplier_cnt": pd.Series([], dtype="int64")})
    rows = [
        (tri_of[int(t)][0], tri_of[int(t)][1], tri_of[int(t)][2], int(c))
        for t, c in zip(agg16["tcode"], agg16["supplier_cnt"])
    ]
    out = pd.DataFrame(rows, columns=["p_brand", "p_type", "p_size", "supplier_cnt"])
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)
    out["p_size"] = out["p_size"].astype("int64")
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out


Q20_NATION = "NATION_3"
Q20_NAME_PREFIX = "red "
Q20_LO, Q20_HI = "1996-01-01", "1997-01-01"
Q20_SHARE_MULT = 8  # keep suppliers with qty_window * MULT > qty_total
#                     (window is ~1/7 of the ship-date span, so 8 keeps
#                      roughly the above-average-share half non-trivially)


def q20_promotion_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 shape (potential part promotion — the correlated
    half-of-total EXISTS chain): Q20_NATION suppliers whose shipped
    quantity of Q20_NAME_PREFIX-named parts INSIDE the window exceeds
    1/Q20_SHARE_MULT of their all-time total for those parts (the spec's
    ``availqty > 0.5·sum(qty)`` becomes the integer cross-multiply
    ``qty_window·MULT > qty_total`` — no partsupp availqty to compare
    against). Per-batch (supplier)-keyed integer partial sums of both
    legs in one pass → one small groupby → driver filter + name join.
    Output (s_suppkey, s_name, qty_window, qty_total) by suppkey."""
    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    pk = part.filter(pc.starts_with(part["p_name"], Q20_NAME_PREFIX))["p_partkey"]
    pk = np.sort(pk.to_numpy(zero_copy_only=False).astype(np.int64))
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk = int(nat.loc[nat["n_name"] == Q20_NATION, "n_nationkey"].iloc[0])
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    ).to_pandas()
    supp = supp[supp["s_nationkey"] == nk]
    sk = np.sort(supp["s_suppkey"].to_numpy().astype(np.int64))
    ref = ray.put((pk, sk))
    lo = pa.scalar(np.datetime64(Q20_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(Q20_HI, "us"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        pks, sks = ray.get(ref)
        kp = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ks = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = np.zeros(len(kp), dtype=bool)
        if len(pks) and len(sks):
            pp = np.minimum(np.searchsorted(pks, kp), len(pks) - 1)
            ss = np.minimum(np.searchsorted(sks, ks), len(sks) - 1)
            hit = (np.take(pks, pp) == kp) & (np.take(sks, ss) == ks)
        if not hit.any():
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "qty_window": pa.array([], pa.int64()),
                             "qty_total": pa.array([], pa.int64())})
        b = batch.filter(pa.array(hit))
        qty = np.round(b["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        ts = b["l_shipdate"]
        inwin = pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi)).to_numpy(
            zero_copy_only=False
        )
        sks_b = ks[hit]
        uk, inv = np.unique(sks_b, return_inverse=True)
        w = np.zeros(len(uk), dtype=np.int64)
        t = np.zeros(len(uk), dtype=np.int64)
        np.add.at(w, inv, np.where(inwin, qty, 0))
        np.add.at(t, inv, qty)
        return pa.table({"s_suppkey": pa.array(uk, pa.int64()),
                         "qty_window": pa.array(w, pa.int64()),
                         "qty_total": pa.array(t, pa.int64())})

    agg = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("qty_window", alias_name="qty_window"),
                   Sum("qty_total", alias_name="qty_total"))
        .to_pandas()
    )
    if len(agg) == 0:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object"),
                             "qty_window": pd.Series([], dtype="int64"),
                             "qty_total": pd.Series([], dtype="int64")})
    keep = agg[agg["qty_window"] * Q20_SHARE_MULT > agg["qty_total"]]
    out = keep.merge(supp[["s_suppkey", "s_name"]], on="s_suppkey")
    out = out.sort_values("s_suppkey").reset_index(drop=True)
    for c in ("s_suppkey", "qty_window", "qty_total"):
        out[c] = out[c].astype("int64")
    return out[["s_suppkey", "s_name", "qty_window", "qty_total"]]
