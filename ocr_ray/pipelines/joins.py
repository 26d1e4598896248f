"""Join strategies (SURVEY.md §2.4 — the reference has only parent-key
gathers; these are the engine's general-purpose joins).

- Broadcast join: dimension side shipped once via ray.put, merged per
  batch (in relational.py — region_customer_stats, top_customers).
- Partitioned hash join (here): both sides large -> tag each side, add a
  deterministic hash bucket on the key, union the two datasets,
  groupby(bucket), and join the sides pairwise inside each bucket. This is
  the portable bucket-join pattern; B buckets bound per-task memory, and
  hot keys can be salted into sub-buckets.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..money import cents as _cents

import ray.data as rd

from ..pqread import read_parquet as _read_parquet

from ..stages.partial_agg import compact_nonempty
from ..stages.partial_agg import from_pandas as _from_pandas

__all__ = [
    "bucket_hash_join",
    "cogroup_bucket_join",
    "order_lineitem_revenue",
    "segment_revenue_native",
    "semi_anti_join",
    "distinct_set_op",
    "orders_without_lineitems",
    "nation_revenue",
    "orders_above_cust_avg",
    "cust_order_counts",
    "q5_local_supplier_volume",
    "q3_shipping_priority",
    "q7_nation_flows",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_big_orders",
    "q22_dormant_customers",
    "q4_late_shipments",
    "q8_market_share",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q15_top_supplier",
    "detect_hot_keys",
    "salted_bucket_join",
]


def cogroup_bucket_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str | None = None,
    n_buckets: int = 64,
    how: str = "inner",
) -> rd.Dataset:
    """Partitioned hash cogroup-join on (possibly differently named) keys.

    Unlike the native ``Dataset.join``, payload columns may be any
    pandas-representable type — including ``list<...>`` columns that arrow
    hash joins reject — so this is the join the near-dedup verify stages
    use to ship shingle sets / unit vectors to their candidate pairs.
    Shuffle cost: ONE groupby over the tagged (left ∪ right) rows; no
    driver materialization. Non-key column names must be disjoint.

    Integer columns of either side are restored after the merge: the
    union-with-nulls representation floats them, which would silently
    change output dtypes. Contract: integer/boolean columns must be
    non-null on their own side (true for every engine use; a legitimately
    nullable int column would need a sentinel or float carry)."""
    from ..stages.partial_agg import add_hash_bucket

    right_on = right_on or left_on
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)

    def fixed_cols(ds) -> dict[str, str]:
        sch = ds.schema()  # Ray Schema: .types are pa.DataType OR np dtypes
        out: dict[str, str] = {}
        for name, typ in zip(sch.names, sch.types):
            if isinstance(typ, pa.DataType):
                if pa.types.is_integer(typ):
                    out[name] = "int64"
                elif pa.types.is_boolean(typ):
                    out[name] = "bool"
            else:
                kind = getattr(np.dtype(typ), "kind", "")
                if kind in ("i", "u"):
                    out[name] = "int64"
                elif kind == "b":
                    out[name] = "bool"
        return out

    l_fix, r_fix = fixed_cols(left), fixed_cols(right)

    # the sort shuffle concatenates arrow blocks by NAME and requires one
    # schema — null-pad each side with the other's columns so the union is
    # schema-uniform (null arrays promote to the real types on concat)
    l_missing = [c for c in rcols if c not in lcols]
    r_missing = [c for c in lcols if c not in rcols]

    def tag(side: str, key: str, missing: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            t = add_hash_bucket(t, [key], n_buckets)
            t = t.append_column("__side", pa.array([side] * t.num_rows))
            for c in missing:
                t = t.append_column(c, pa.nulls(t.num_rows))
            return t

        return fn

    both = left.map_batches(tag("L", left_on, l_missing), batch_format="pyarrow").union(
        right.map_batches(tag("R", right_on, r_missing), batch_format="pyarrow")
    )
    # blocks = buckets: the grouped stage has at most n_buckets groups, so
    # more input blocks only inflate the sort exchange (O(blocks^2) block
    # shuffling dominated a 256-row join arriving as hundreds of
    # mostly-empty aggregate partitions). n_buckets is the parallelism
    # knob — raise it for big joins.
    both = both.repartition(n_buckets)

    if left_on == right_on:
        out_cols = lcols + [c for c in rcols if c != right_on]
    else:
        out_cols = lcols + rcols
    out_fix = {**r_fix, **l_fix}

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == "L"][lcols].astype(l_fix)
        r = df[df["__side"] == "R"][rcols].astype(r_fix)
        return l.merge(r, left_on=left_on, right_on=right_on, how=how)

    def norm_out(df: pd.DataFrame) -> pd.DataFrame:
        # an empty sort partition passes through map_groups with the INPUT
        # schema; pin every block to the join's output schema so the result
        # can feed another shuffle
        if not all(c in df.columns for c in out_cols):
            return pd.DataFrame(
                {c: pd.Series([], dtype=out_fix.get(c, "object"))
                 for c in out_cols}
            )
        return df[out_cols]

    return both.groupby("bucket").map_groups(
        join_bucket, batch_format="pandas"
    ).map_batches(norm_out, batch_format="pandas")


def _schema_pandas_dtypes(*schemas) -> dict:
    """Column -> pandas dtype map from Dataset schemas, robust to BOTH
    block kinds: an Arrow-block schema yields pa.DataType entries
    (mapped via to_pandas_dtype), a pandas-block schema yields numpy
    dtypes or the Python ``object``/``str`` class directly (pa.array
    would reject those — the empty-block rebuild must not assume Arrow)."""
    out: dict = {}
    for sch in schemas:
        for n, t in zip(sch.names, sch.types):
            if n in out:
                continue
            if isinstance(t, pa.DataType):
                try:
                    out[n] = t.to_pandas_dtype()
                except NotImplementedError:
                    out[n] = object
            elif isinstance(t, type):  # pandas-block object/str columns
                out[n] = object
            else:
                out[n] = t  # already a numpy dtype
    return out


def _pin_join_output(name: str, out_cols: list, col_dtypes: dict):
    """Post-map_groups normalizer shared by the bucket joins: an empty
    sort partition passes through with its INPUT schema (bucket/__side +
    one side's columns) — pin it to the join's output schema so consumers
    can index any output column. No astype on the non-empty path: a left
    join legitimately promotes missing right-side ints to float."""

    def norm_out(df: pd.DataFrame) -> pd.DataFrame:
        if all(c in df.columns for c in out_cols):
            return df[out_cols]
        if len(df):
            raise ValueError(
                f"{name}: non-empty block missing output columns; "
                f"got {list(df.columns)}"
            )
        return pd.DataFrame(
            {c: pd.Series([], dtype=col_dtypes[c]) for c in out_cols}
        )

    return norm_out


def _pa_types_for(col_dtypes: dict) -> dict | None:
    """Column -> pa.DataType map for the Arrow in-bucket join kernel, or
    None when any declared dtype has no clean Arrow mapping (the caller
    then keeps the pandas kernel). ``object`` maps to string — the only
    object columns the engine ships through bucket joins are strings."""
    out: dict = {}
    for c, d in col_dtypes.items():
        if d is object or d is str or d == "object":
            out[c] = pa.string()
            continue
        try:
            out[c] = pa.from_numpy_dtype(np.dtype(d))
        except (TypeError, NotImplementedError, pa.ArrowNotImplementedError):
            return None
    return out


def _arrow_bucket_join(
    both: rd.Dataset, on: str, lcols: list, rcols: list, pa_types: dict
) -> rd.Dataset:
    """Arrow in-bucket INNER join kernel (see bucket_hash_join's
    ``arrow_kernel`` flag). Group blocks stay Arrow end-to-end: filter by
    the ``__side`` tag, cast each side back to its declared schema (the
    exchange null-fills the OTHER side's columns but in Arrow the fill
    stays typed — the cast is a no-op repair, unlike the pandas path's
    block-wide float promotion), then one Acero hash join per bucket.
    Row order within a bucket is Acero's, not pandas merge's — callers
    of bucket joins are order-insensitive by contract (every consumer
    aggregates or re-sorts)."""
    l_schema = pa.schema([(c, pa_types[c]) for c in (on, *lcols)])
    r_schema = pa.schema([(c, pa_types[c]) for c in (on, *rcols)])
    out_cols = [on, *lcols, *rcols]
    out_schema = pa.schema([(c, pa_types[c]) for c in out_cols])

    def join_bucket(t: pa.Table) -> pa.Table:
        names = t.column_names

        def side(tag_val: str, cols: list, sch: pa.Schema) -> pa.Table:
            if not all(c in names for c in cols):
                # partition held no blocks of this side; its rows would
                # have carried these columns (tag appends them pre-union)
                return sch.empty_table()
            sub = t.filter(pc.equal(t["__side"], tag_val)).select(cols)
            return sub.cast(sch)

        l = side("L", [on, *lcols], l_schema)
        r = side("R", [on, *rcols], r_schema)
        # use_threads=False: Acero's default pool sizes to ALL host cores
        # PER TASK — under 16-32 concurrent Ray map tasks that
        # oversubscribes the box ~30x and measured SLOWER than pandas
        # merge; single-threaded per bucket, parallelism comes from Ray
        return l.join(r, keys=[on], join_type="inner", use_threads=False)

    def norm_out(t: pa.Table) -> pa.Table:
        # empty sort partitions pass through map_groups with the INPUT
        # schema — pin them to the join's output schema (same contract
        # as _pin_join_output on the pandas path)
        if all(c in t.column_names for c in out_cols):
            return t.select(out_cols)
        if t.num_rows:
            raise ValueError(
                f"arrow bucket join: non-empty block missing output "
                f"columns; got {t.column_names}"
            )
        return out_schema.empty_table()

    return both.groupby("bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    ).map_batches(norm_out, batch_format="pyarrow")


def bucket_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    n_buckets: int = 64,
    how: str = "inner",
    left_dtypes: dict | None = None,
    right_dtypes: dict | None = None,
    arrow_kernel: bool = False,
) -> rd.Dataset:
    """Generic partitioned hash join of two Datasets on one key column.

    Shuffle cost: one groupby over (left ∪ right) tagged rows. Column sets
    of the two sides must be disjoint apart from ``on``.

    ``arrow_kernel=True`` opts an INNER join with primitive/string-only
    columns into the Arrow in-bucket kernel: the per-bucket merge runs as
    ``pa.Table.join`` (Acero hash join) on zero-copy Arrow group blocks
    instead of a pandas-converted ``DataFrame.merge`` — no block-wide
    pandas conversion, no int->float round-trip, no astype repair pass.
    Falls back to the pandas kernel when ``how != "inner"`` or any
    declared dtype has no Arrow mapping (the fallback is silent by
    design: the two kernels are output-equivalent, the flag is purely a
    performance hint). Measured at sf0.1 (BENCH notes, round 5):
    graph_pagerank and q9_product_profit, whose bucket joins dominate.

    CALLER NOTE: without explicit dtypes this probes ``left.schema()`` /
    ``right.schema()``. On a LAZY input whose plan contains an all-to-all
    (groupby/sort), that probe executes the whole upstream shuffle — and
    the result is NOT reused by the real execution, so the shuffle runs
    twice. Either materialize shuffle-bearing inputs first (see
    graph.pagerank_trade, which paid 8 s/iteration to this before
    restructuring) or pass ``left_dtypes``/``right_dtypes`` (column ->
    pandas dtype, INCLUDING ``on``) to skip the probe entirely — the
    right call when the side should stream, not pin (e.g. a fact-sized
    semi-join output)."""
    from ..stages.partial_agg import add_hash_bucket

    if left_dtypes is not None and right_dtypes is not None:
        lnames, rnames = list(left_dtypes), list(right_dtypes)
        col_dtypes = {**left_dtypes, **right_dtypes}
    else:
        lschema, rschema = left.schema(), right.schema()
        lnames, rnames = list(lschema.names), list(rschema.names)
        col_dtypes = _schema_pandas_dtypes(lschema, rschema)
    lcols = [c for c in lnames if c != on]
    rcols = [c for c in rnames if c != on]

    try:
        _key_pa_type = pa.from_numpy_dtype(np.dtype(col_dtypes[on]))
    except (TypeError, NotImplementedError, pa.ArrowNotImplementedError):
        _key_pa_type = None  # object/str keys hash as-is

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            # pin the key to its DECLARED type before hashing: a block
            # whose key was float-promoted by an upstream pandas stage
            # would otherwise hash into different buckets than the other
            # side's int key (silent row loss, not an error)
            if _key_pa_type is not None and t[on].type != _key_pa_type:
                t = t.set_column(
                    t.column_names.index(on), on, pc.cast(t[on], _key_pa_type)
                )
            t = add_hash_bucket(t, [on], n_buckets)
            return t.append_column("__side", pa.array([side] * t.num_rows))

        return fn

    both = left.map_batches(tag("L"), batch_format="pyarrow").union(
        right.map_batches(tag("R"), batch_format="pyarrow")
    )
    # blocks = buckets before the sort exchange, mirroring
    # cogroup_bucket_join: the grouped stage has at most n_buckets groups,
    # and sort cost grows superlinearly with input block count — without
    # this, iterating joins (graph.pagerank_trade) compounded block counts
    # 128 -> 384 -> 640 across iterations, tripling each round's wall time
    both = both.repartition(n_buckets)

    if arrow_kernel and how == "inner":
        pa_types = _pa_types_for(col_dtypes)
        if pa_types is not None:
            return _arrow_bucket_join(both, on, lcols, rcols, pa_types)

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # reindex, not select: a bucket whose rows all came from one side
        # arrives without the other side's columns (schema follows the
        # blocks actually present), and an absent side is just empty
        l = df[df["__side"] == "L"].reindex(columns=[on, *lcols])
        r = df[df["__side"] == "R"].reindex(columns=[on, *rcols])
        # restore declared dtypes: the union/repartition exchange merges
        # the two sides' schemas, null-filling the OTHER side's columns,
        # and the pandas conversion promotes int64 -> float64 across the
        # whole block. Each side's own columns are complete here, so the
        # cast back is lossless — without it the join emits float keys
        # that hash into DIFFERENT buckets than int keys downstream
        # (pd.util.hash_array is dtype-family-sensitive), silently
        # dropping rows in any follow-on bucketed join.
        l = l.astype({c: col_dtypes[c] for c in (on, *lcols)})
        r = r.astype({c: col_dtypes[c] for c in (on, *rcols)})
        return l.merge(r, on=on, how=how)

    norm_out = _pin_join_output(
        "bucket_hash_join", [on, *lcols, *rcols], col_dtypes
    )
    return both.groupby("bucket").map_groups(
        join_bucket, batch_format="pandas"
    ).map_batches(norm_out, batch_format="pandas")


def segment_revenue_native(sf_dir: str) -> pd.DataFrame:
    """Native ``Dataset.join`` (hash-partitioned, Ray >= 2.46) showcase:
    orders ⋈ customer on custkey, exact-cents order value by market
    segment. The bucket join above is the portable fallback; this is the
    built-in path when available."""
    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def widen(t: pa.Table) -> pa.Table:
        price_c = _cents(t["o_totalprice"])
        return pa.Table.from_arrays(
            [t["o_custkey"].combine_chunks(), price_c], names=["o_custkey", "price_c"]
        )

    cust = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    joined = orders.map_batches(widen, batch_format="pyarrow").join(
        cust, join_type="inner", num_partitions=16,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_mktsegment", as_index=False).agg(
            price_c=("price_c", "sum"), n_orders=("price_c", "size")
        )

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("price_c", alias_name="price_c"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    out["total_value"] = out["price_c"] / 100.0
    return out[["c_mktsegment", "n_orders", "total_value"]].sort_values(
        "c_mktsegment"
    ).reset_index(drop=True)


# adaptive strategy gate for semi/anti joins (same idiom as the dedup
# verify): at or below this many distinct build-side keys the exact set
# broadcasts; above it the partitioned cogroup join runs — driver memory
# stays bounded either way
_BROADCAST_KEY_LIMIT = 100_000


def semi_anti_join(
    probe: rd.Dataset, keys, on: str, anti: bool = False,
    assume_distinct: bool = False,
) -> rd.Dataset:
    """Exact semi/anti join with adaptive strategy.

    ``keys`` may be a sequence (always broadcast) or a Dataset with a
    single key column: below ``_BROADCAST_KEY_LIMIT`` distinct keys the
    exact set ships once via ray.put and the probe filters inside
    map_batches (no shuffle); above it the build side STAYS a Dataset and
    membership is decided by a partitioned cogroup join with a marker
    column — no driver structure proportional to key count on either
    path.

    ``assume_distinct=True`` skips the dedup shuffle when the caller
    KNOWS the key column is already unique (a primary key, a grouped
    output) — one fewer sequential execution on the build side."""
    import ray

    if isinstance(keys, rd.Dataset):
        ksch = keys.schema()
        if ksch is None:  # zero-block build side: empty key set
            if anti:
                return probe
            return probe.map_batches(
                lambda t: t.slice(0, 0), batch_format="pyarrow"
            )
        kcol = ksch.names[0]
        if assume_distinct:
            distinct = compact_nonempty(keys.select_columns([kcol]))
        else:
            distinct = compact_nonempty(
                keys.groupby(kcol).count().select_columns([kcol])
            )
        n_keys = distinct.count()
        if n_keys > _BROADCAST_KEY_LIMIT:
            def mark(t: pa.Table) -> pa.Table:
                return pa.Table.from_arrays(
                    [t.column(kcol).combine_chunks(),
                     pa.array(np.ones(t.num_rows, dtype=np.int64))],
                    names=[on, "__hit"] if kcol != on else [kcol, "__hit"],
                )

            marker = distinct.map_batches(mark, batch_format="pyarrow")
            nb = min(256, max(16, n_keys // 10_000))
            joined = cogroup_bucket_join(probe, marker, on, n_buckets=nb, how="left")

            def pick(df: pd.DataFrame) -> pd.DataFrame:
                hit = df["__hit"].notna()
                out = df[~hit if anti else hit]
                return out.drop(columns=["__hit"])

            return joined.map_batches(pick, batch_format="pandas")
        keys = distinct.to_pandas()[kcol]  # bounded by the gate

    kref = ray.put(np.asarray(sorted(set(keys))))

    def flt(t: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        col = t.column(on).to_numpy(zero_copy_only=False)
        member = np.isin(col, ks)
        return t.filter(pa.array(~member if anti else member))

    return probe.map_batches(flt, batch_format="pyarrow")


def attach_key_map(
    facts: rd.Dataset,
    dim: rd.Dataset,
    on: str,
    value_cols: "str | list[str]",
    facts_dtypes: dict | None = None,
) -> rd.Dataset:
    """Attach dimension attribute(s) to a fact stream by integer key —
    the adaptive seam every fact->dimension hop goes through.

    ``dim`` is a Dataset of (``on``, *``value_cols``) with distinct
    keys. Below ``_BROADCAST_KEY_LIMIT`` keys, the (key, values) arrays
    ship once via ray.put and the attach is a vectorized searchsorted
    inside map_batches (no shuffle). Above it, the dimension STAYS a
    Dataset and the hop is the partitioned bucket join — pass
    ``facts_dtypes`` (column -> pandas dtype) when the fact side's plan
    holds an all-to-all so the join skips its schema probe. INNER
    semantics: fact rows with no dimension match are dropped (key
    integrity is the caller's contract, as with a SQL join). To use the
    dim as a key FILTER that also decorates, pre-filter the dim side."""
    import ray

    cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    d = dim.materialize()
    n = d.count()
    if n <= _BROADCAST_KEY_LIMIT:
        dp = d.to_pandas().sort_values(on) if n else pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in (on, *cols)}
        )
        ref = ray.put(
            (dp[on].to_numpy(), {c: dp[c].to_numpy() for c in cols})
        )

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            ks, vmap = ray.get(ref)
            col = df[on].to_numpy()
            if len(ks) == 0:
                hit = np.zeros(len(col), dtype=bool)
                idx = hit.astype(np.int64)
            else:
                idx = np.searchsorted(ks, col)
                idx[idx == len(ks)] = 0  # clamp; equality decides
                hit = ks[idx] == col
            out = df[hit].copy()
            for c in cols:
                out[c] = vmap[c][idx[hit]]
            return out

        return facts.map_batches(attach, batch_format="pandas")
    return bucket_hash_join(
        facts, d, on=on,
        left_dtypes=facts_dtypes,
        right_dtypes=(
            _schema_pandas_dtypes(d.schema()) if facts_dtypes else None
        ),
    )


def lookup_dim_rows(
    path: str, key_col: str, keys, columns: list[str]
) -> pd.DataFrame:
    """Fetch the dimension rows matching a SMALL key set (a top-k result,
    a tie set) without pulling the whole table to the driver: distributed
    pruned read + broadcast key filter (semi_anti_join's broadcast path).
    The driver receives only the matched rows — bounded by ``len(keys)``
    no matter how large the dimension grows with the corpus."""
    from ..stages.partial_agg import to_pandas_typed

    dim = _read_parquet(path, columns=columns)
    # empty key set (an empty top-k at tiny SF) must still yield a TYPED
    # frame — Ray's to_pandas drops columns on all-empty datasets
    return to_pandas_typed(
        semi_anti_join(dim, keys, on=key_col),
        _schema_pandas_dtypes(dim.schema()),
    )


def distinct_set_op(
    a: rd.Dataset, b: rd.Dataset, on: str, anti: bool = False
) -> rd.Dataset:
    """SQL INTERSECT / EXCEPT (DISTINCT set semantics) on one key column:
    the distinct ``on`` values of ``a`` that do (``anti=False``) or do not
    (``anti=True``) occur in ``b``.

    Scale shape: the probe side is first deduped with a hash-bucketed
    grouped count (one row per distinct key rides the membership check,
    never the raw rows), then membership is the adaptive semi/anti join —
    broadcast below the key gate, partitioned cogroup above it. Emits a
    single-column Dataset of the surviving keys."""
    from ..stages.partial_agg import hash_bucket_sum

    a_distinct = hash_bucket_sum(
        a.select_columns([on]), [on], []
    ).select_columns([on])
    return semi_anti_join(a_distinct, b.select_columns([on]), on=on, anti=anti)


def orders_without_lineitems(sf_dir: str) -> pd.DataFrame:
    """Semi/anti-join showcase: per order status, how many orders have at
    least one 1998 shipment (semi) and how many have none (anti).
    Build side = distinct l_orderkey of the filtered lineitems (distributed
    unique -> broadcast; NOT EXISTS / EXISTS in SQL)."""
    li = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_shipdate"]
    )
    late = li.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["l_shipdate"], pa.scalar("1998-01-01").cast(pa.timestamp("us")))
        ).select(["l_orderkey"]),
        batch_format="pyarrow",
    )
    # build side stays a Dataset: semi_anti_join picks broadcast vs
    # cogroup-join by distinct-key volume (was: driver-side unique())
    keys = late.materialize()
    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus"],
    )
    from ray.data.aggregate import Count

    semi = (
        semi_anti_join(orders, keys, on="o_orderkey", anti=False)
        .groupby("o_orderstatus").aggregate(Count(alias_name="n_with"))
        .to_pandas()
    )
    anti = (
        semi_anti_join(orders, keys, on="o_orderkey", anti=True)
        .groupby("o_orderstatus").aggregate(Count(alias_name="n_without"))
        .to_pandas()
    )
    out = semi.merge(anti, on="o_orderstatus", how="outer").fillna(0)
    out["n_with"] = out["n_with"].astype(np.int64)
    out["n_without"] = out["n_without"].astype(np.int64)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Multi-join rollup (TPC-H Q5 shape): lineitem ⋈ orders ⋈ customer ⋈
    nation — discounted revenue by customer nation.

    Scale composition: pre-aggregate lineitem per orderkey (hash-bucketed),
    native-join to orders (both large), attach customer->nation through
    attach_key_map's adaptive gate (customer scales with the corpus),
    decode the 25-row nation-name map in the final grouped sum."""
    import pyarrow.parquet as pq_

    from ..stages.partial_agg import hash_bucket_sum

    li = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def widen(t: pa.Table) -> pa.Table:
        price_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.Table.from_arrays(
            [t["l_orderkey"].combine_chunks(), rev], names=["l_orderkey", "rev_c4"]
        )

    li_agg = hash_bucket_sum(
        li.map_batches(widen, batch_format="pyarrow"), ["l_orderkey"], ["rev_c4"]
    ).drop_columns(["n"])

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    joined = li_agg.join(
        orders, join_type="inner", num_partitions=16,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat_names = dict(zip(nation["n_nationkey"], nation["n_name"]))  # 25 rows

    cust_dim = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_nk"]),
        batch_format="pyarrow",
    )
    joined = attach_key_map(
        joined.select_columns(["o_custkey", "rev_c4"]),
        cust_dim, on="o_custkey", value_cols="c_nk",
        facts_dtypes={"o_custkey": np.int64, "rev_c4": np.int64},
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"n_name": df["c_nk"].map(nat_names), "rev_c4": df["rev_c4"]}
        )
        return out.groupby("n_name", as_index=False).agg(
            rev_c4=("rev_c4", "sum"), n_orders=("rev_c4", "size")
        )

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(attach, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("rev_c4", alias_name="rev_c4"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = out["rev_c4"] / 10000.0
    return out[["n_name", "n_orders", "revenue"]].sort_values("n_name").reset_index(drop=True)


def order_lineitem_revenue(sf_dir: str) -> pd.DataFrame:
    """Large-large join showcase: lineitem ⋈ orders on orderkey, exact
    integer-cents revenue by order status.

    Scale shape: pre-aggregate lineitem per orderkey FIRST (hash-bucketed
    combine — never join raw lineitem rows), then bucket-hash-join against
    orders, then a tiny grouped sum."""
    from ..stages.partial_agg import hash_bucket_sum

    li = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def widen(t: pa.Table) -> pa.Table:
        price_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.Table.from_arrays(
            [t["l_orderkey"].combine_chunks(), rev], names=["l_orderkey", "rev_c4"]
        )

    # materialized: the join's schema probe would re-execute the grouped
    # sum's shuffle (CALLER NOTE on bucket_hash_join)
    li_agg = compact_nonempty(hash_bucket_sum(
        li.map_batches(widen, batch_format="pyarrow"), ["l_orderkey"], ["rev_c4"]
    ).drop_columns(["n"]))

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderstatus"]
    ).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderstatus"]),
        batch_format="pyarrow",
    )

    joined = bucket_hash_join(li_agg, orders, on="l_orderkey", arrow_kernel=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderstatus", as_index=False).agg(
            rev_c4=("rev_c4", "sum"), n_orders=("l_orderkey", "size")
        )

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("o_orderstatus")
        .aggregate(Sum("rev_c4", alias_name="rev_c4"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = out["rev_c4"] / 10000.0
    return out[["o_orderstatus", "n_orders", "revenue"]].sort_values(
        "o_orderstatus"
    ).reset_index(drop=True)

def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA") -> pd.DataFrame:
    """TPC-H Q5 shape: 1996 revenue from lineitems whose supplier and
    ordering customer share a nation in ``region``, grouped by nation —
    a six-table query plan: two broadcast dimension hops (supplier ->
    nation, customer -> nation, nation -> region) feeding ONE large-large
    partitioned hash join (lineitem x orders on orderkey) with the
    nation-equality as a vectorized post-filter.

    Reference shape: multiway dim+fact join plan (SURVEY.md §2.4 J-ops).

    Scale shape: selective filters are pushed BEFORE the join — orders
    keeps only the date window and ships (orderkey, cust_nation) [two
    ints]; lineitem keeps only region suppliers and ships (orderkey,
    supp_nation, rev_c4). Supplier and customer scale with the corpus,
    so both nationkey hops go through ``attach_key_map``'s adaptive gate
    (searchsorted broadcast below _BROADCAST_KEY_LIMIT, partitioned
    bucket join above) — the supplier dim is pre-filtered to the
    region's nations so the inner attach doubles as the region filter.
    Only the constant-size nation table (25 rows) ships as a closure.
    Exact integer-cents revenue."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    from ..money import cents_np as _cents_np

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    region_t = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    rk = set(region_t.loc[region_t["r_name"] == region, "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rk)]
    nat_names = dict(zip(nat["n_nationkey"], nat["n_name"]))  # <= 25 rows
    region_nk = pa.array(list(nat_names.keys()), type=pa.int64())

    supp_dim = _read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).map_batches(
        lambda t: t.filter(
            pc_.is_in(pc_.cast(t["s_nationkey"], pa.int64()), region_nk)
        ).rename_columns(["l_suppkey", "s_nk"]),
        batch_format="pyarrow",
    )
    cust_dim = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_nk"]),
        batch_format="pyarrow",
    )

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def o_side(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["o_orderdate"] >= "1996-01-01") & (df["o_orderdate"] < "1997-01-01")]
        return pd.DataFrame(
            {"l_orderkey": df["o_orderkey"].to_numpy(np.int64),
             "o_custkey": df["o_custkey"].to_numpy(np.int64)}
        )

    o_stream = attach_key_map(
        orders.map_batches(o_side, batch_format="pandas"),
        cust_dim, on="o_custkey", value_cols="c_nk",
        facts_dtypes={"l_orderkey": np.int64, "o_custkey": np.int64},
    ).select_columns(["l_orderkey", "c_nk"])

    li = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def l_side(df: pd.DataFrame) -> pd.DataFrame:
        price_c = _cents_np(df["l_extendedprice"].to_numpy())
        disc_c = _cents_np(df["l_discount"].to_numpy())
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(np.int64),
             "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
             "rev_c4": price_c * (100 - disc_c)}
        )

    l_stream = attach_key_map(
        li.map_batches(l_side, batch_format="pandas"),
        supp_dim, on="l_suppkey", value_cols="s_nk",
        facts_dtypes={"l_orderkey": np.int64, "l_suppkey": np.int64,
                      "rev_c4": np.int64},
    ).select_columns(["l_orderkey", "s_nk", "rev_c4"])

    joined = bucket_hash_join(
        l_stream, o_stream, on="l_orderkey", arrow_kernel=True
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nk"] == df["c_nk"]]
        out = pd.DataFrame(
            {"n_name": df["s_nk"].map(nat_names), "rev_c4": df["rev_c4"]}
        )
        return out.groupby("n_name", as_index=False).agg(rev_c4=("rev_c4", "sum"))

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("rev_c4", alias_name="rev_c4"))
        .to_pandas()
    )
    out["revenue"] = out["rev_c4"] / 10000.0
    return out[["n_name", "revenue"]].sort_values("n_name").reset_index(drop=True)


def orders_above_cust_avg(sf_dir: str) -> pd.DataFrame:
    """Correlated-subquery pattern: orders whose price strictly exceeds
    the ordering customer's own average order price — the
    ``o_totalprice > avg(o_totalprice) OVER (PARTITION BY o_custkey)``
    shape, decorrelated the distributed way: pre-aggregate per customer,
    join the (tiny-per-key) aggregate back, filter.

    Exactness: the comparison is done in integer cents cross-multiplied
    (price_c * n > sum_c) so no float division enters the predicate —
    the SQL twin states the identical integer inequality.

    Scale shape: per-cust (sum, n) via hash_bucket_sum partials (the
    aggregate side is |customers|, not |orders|); the join back is the
    partitioned bucket_hash_join — customer cardinality scales with the
    corpus, so no broadcast."""
    from ..stages.partial_agg import hash_bucket_sum

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def widen(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["o_orderkey"].combine_chunks(), t["o_custkey"].combine_chunks(),
             t["o_totalprice"].combine_chunks(), _cents(t["o_totalprice"])],
            names=["o_orderkey", "o_custkey", "o_totalprice", "price_c"],
        )

    wide = orders.map_batches(widen, batch_format="pyarrow")
    per_cust = hash_bucket_sum(
        wide.select_columns(["o_custkey", "price_c"]), ["o_custkey"], ["price_c"]
    ).map_batches(
        lambda df: (
            df.rename(columns={"price_c": "sum_c"})[["o_custkey", "sum_c", "n"]]
            if all(c in df.columns for c in ("o_custkey", "price_c", "n"))
            else pd.DataFrame({c: pd.Series([], dtype="int64")
                               for c in ("o_custkey", "sum_c", "n")})
        ),
        batch_format="pandas",
    )
    per_cust = compact_nonempty(per_cust)  # + schema-probe materialize

    joined = bucket_hash_join(wide, per_cust, on="o_custkey", arrow_kernel=True)

    def flt(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderkey": "int64", "o_custkey": "int64",
                "o_totalprice": "float64"}
        need = ["o_orderkey", "o_custkey", "o_totalprice", "price_c", "sum_c", "n"]
        if not all(c in df.columns for c in need):
            # empty sort partition passed through with its input schema
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
        keep = df[df["price_c"].to_numpy(np.int64) * df["n"].to_numpy(np.int64)
                  > df["sum_c"].to_numpy(np.int64)]
        return keep[list(cols)].astype(cols)

    return (
        joined.map_batches(flt, batch_format="pandas")
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


def cust_order_counts(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER join: every customer with their order count, customers
    without orders kept at 0 (TPC-H leaves ~1/3 of customers orderless).

    Scale shape: orders pre-aggregated to per-customer counts first
    (hash_bucket_sum partials — the join never sees raw order rows), then
    a partitioned bucket_hash_join with how='left'; both sides scale with
    the corpus so neither broadcasts."""
    from ..stages.partial_agg import hash_bucket_sum

    cust = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    ).map_batches(
        lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow"
    )
    # materialized: the join's schema probe would re-run the shuffle
    per_cust = compact_nonempty(hash_bucket_sum(orders, ["c_custkey"], []))

    joined = bucket_hash_join(cust, per_cust, on="c_custkey", how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"c_custkey": "int64", "n_orders": "int64"}
        if "c_custkey" not in df.columns:
            # empty sort partition passed through with its input schema
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
        out = pd.DataFrame({"c_custkey": df["c_custkey"].astype(np.int64)})
        n = df["n"] if "n" in df.columns else pd.Series(np.nan, index=df.index)
        out["n_orders"] = n.fillna(0).astype(np.int64)
        return out

    return (
        joined.map_batches(finish, batch_format="pandas")
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )


Q3_CUTOFF = "1996-06-30"


def q3_shipping_priority(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """TPC-H Q3 (shipping priority): the 10 highest-revenue orders from
    BUILDING-segment customers placed before the cutoff with at least one
    lineitem shipped after it.

    Scale plan: lineitem is date-filtered AT the scan and pre-aggregated
    to per-orderkey exact-cents revenue (hash-bucketed partials — the
    join never sees raw lineitem rows); orders is scan-filtered on date,
    semi-joined to the BUILDING customer keys with the ADAPTIVE
    semi_anti_join (broadcast below the key gate, cogroup above — the
    customer side scales with the corpus); the two survivors meet in a
    partitioned bucket_hash_join; the global top-k is a per-block partial
    cut before one tiny driver fold. Ties break (revenue desc, orderdate
    asc, orderkey asc) — exact on integer cents."""
    import pyarrow.dataset as pads

    import ray

    from ..stages.partial_agg import hash_bucket_sum

    cutoff = pd.Timestamp(Q3_CUTOFF)

    building = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey"],
        filter=(pads.field("c_mktsegment") == "BUILDING"),
    )
    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") < cutoff),
    )
    # materialized because it feeds BOTH the lineitem semi-filter and the
    # final join — and it's the most selective relation in the query
    # (segment cut x date cut), so the join order starts here
    orders_f = (
        # building carries the customer PK (scan-filtered) — already
        # distinct, so the semi join skips its dedup shuffle; the gate
        # count afterwards is free (materialized metadata)
        semi_anti_join(orders, building, on="o_custkey", assume_distinct=True)
        .map_batches(
            lambda t: t.select(
                ["o_orderkey", "o_orderdate", "o_orderpriority"]
            ).rename_columns(["l_orderkey", "o_orderdate", "o_orderpriority"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    li = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") > cutoff),
    )

    def widen(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
        )
        return pa.Table.from_arrays(
            [t["l_orderkey"].combine_chunks(), rev], names=["l_orderkey", "rev_c4"]
        )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["l_orderkey", "rev_c4", "o_orderdate", "o_orderpriority"]
        if not all(c in df.columns for c in cols):
            # empty sort partition passed through with its input schema;
            # typed empties so a future pandas concat can't demote the
            # int columns to object
            return pd.DataFrame(
                {"l_orderkey": pd.Series([], dtype="int64"),
                 "rev_c4": pd.Series([], dtype="int64"),
                 "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                 "o_orderpriority": pd.Series([], dtype="object")}
            )
        return df.sort_values(
            ["rev_c4", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True], kind="mergesort",
        ).head(k)[cols]

    # adaptive: the qualifying orders are the most selective relation
    # (segment cut x date cut). Below the broadcast gate they ship ONCE
    # and the whole query is one fused chain: scan-filter lineitem ->
    # in-map semi filter + widen -> bucketed revenue combine over ONLY
    # qualifying keys -> in-map dim attach + partial top-k. No join
    # shuffle at all. Above the gate, the partitioned bucket_hash_join
    # path takes over (both sides corpus-scaled).
    if orders_f.count() <= _BROADCAST_KEY_LIMIT:
        odf = orders_f.to_pandas()  # bounded by the gate
        keys_ref = ray.put(np.sort(odf["l_orderkey"].to_numpy(np.int64)))
        dim_ref = ray.put(odf)

        def filt_widen(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            col = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            return widen(t.filter(pa.array(np.isin(col, ks))))

        li_agg = hash_bucket_sum(
            li.map_batches(filt_widen, batch_format="pyarrow"),
            ["l_orderkey"], ["rev_c4"],
        ).drop_columns(["n"])

        def attach_topk(df: pd.DataFrame) -> pd.DataFrame:
            if "l_orderkey" not in df.columns:
                return topk(df)  # empty passthrough -> typed empty
            return topk(df.merge(ray.get(dim_ref), on="l_orderkey"))

        part = li_agg.map_batches(attach_topk, batch_format="pandas").to_pandas()
    else:
        li_f = semi_anti_join(
            li, orders_f.select_columns(["l_orderkey"]), on="l_orderkey",
            assume_distinct=True,
        )
        li_agg = compact_nonempty(hash_bucket_sum(
            li_f.map_batches(widen, batch_format="pyarrow"),
            ["l_orderkey"], ["rev_c4"],
        ).drop_columns(["n"]))  # schema-probe re-execution
        joined = bucket_hash_join(li_agg, orders_f, on="l_orderkey")
        part = joined.map_batches(topk, batch_format="pandas").to_pandas()

    out = topk(part).rename(columns={"l_orderkey": "o_orderkey"})
    out["revenue"] = out["rev_c4"] / 10000.0
    return out[
        ["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"]
    ].reset_index(drop=True)


def q7_nation_flows(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape generalized: shipping revenue flow between every
    ORDERED pair of distinct nations (supplier nation -> customer nation)
    per ship year — the bilateral-trade matrix.

    Scale shape: identical join plan to Q5 — supplier and customer scale
    with the corpus, so both nationkey hops go through
    ``attach_key_map``'s adaptive gate (broadcast arrays below
    _BROADCAST_KEY_LIMIT, partitioned bucket join above); lineitem ships
    (orderkey, supp_nation, year, rev_c4), orders ships (orderkey,
    cust_nation), ONE partitioned hash join on orderkey, then per-batch
    partial aggregation into the tiny (nation x nation x year) result
    space before the final grouped sum."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    from ..money import cents_np as _cents_np

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat_names = dict(zip(nation["n_nationkey"], nation["n_name"]))  # 25 rows

    supp_dim = _read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).map_batches(
        lambda t: t.rename_columns(["l_suppkey", "s_nk"]),
        batch_format="pyarrow",
    )
    cust_dim = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_nk"]),
        batch_format="pyarrow",
    )

    li = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    )

    def l_side(df: pd.DataFrame) -> pd.DataFrame:
        price_c = _cents_np(df["l_extendedprice"].to_numpy())
        disc_c = _cents_np(df["l_discount"].to_numpy())
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(np.int64),
             "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
             "l_year": df["l_shipdate"].dt.year.to_numpy(np.int64),
             "rev_c4": price_c * (100 - disc_c)}
        )

    l_stream = attach_key_map(
        li.map_batches(l_side, batch_format="pandas"),
        supp_dim, on="l_suppkey", value_cols="s_nk",
        facts_dtypes={"l_orderkey": np.int64, "l_suppkey": np.int64,
                      "l_year": np.int64, "rev_c4": np.int64},
    ).select_columns(["l_orderkey", "s_nk", "l_year", "rev_c4"])

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [pc_.cast(t["o_orderkey"], pa.int64()),
             pc_.cast(t["o_custkey"], pa.int64())],
            names=["l_orderkey", "o_custkey"],
        ),
        batch_format="pyarrow",
    )

    o_stream = attach_key_map(
        orders, cust_dim, on="o_custkey", value_cols="c_nk",
        facts_dtypes={"l_orderkey": np.int64, "o_custkey": np.int64},
    ).select_columns(["l_orderkey", "c_nk"])

    joined = bucket_hash_join(
        l_stream, o_stream, on="l_orderkey", arrow_kernel=True
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nk"] != df["c_nk"]]
        return df.groupby(["s_nk", "c_nk", "l_year"], as_index=False).agg(
            rev_c4=("rev_c4", "sum")
        )

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby(["s_nk", "c_nk", "l_year"])
        .aggregate(Sum("rev_c4", alias_name="rev_c4"))
        .to_pandas()
    )
    out["supp_nation"] = out["s_nk"].map(nat_names)
    out["cust_nation"] = out["c_nk"].map(nat_names)
    # empty shuffle partitions promote int keys to float through the
    # aggregate — pin the year back to int64
    out["l_year"] = out["l_year"].astype(np.int64)
    out["revenue"] = out["rev_c4"].astype(np.int64) / 10000.0
    return (
        out[["supp_nation", "cust_nation", "l_year", "revenue"]]
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )


Q14_FROM, Q14_TO = "1996-09-01", "1996-10-01"


def q14_promo_effect(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue from
    parts of PROMO type.

    Scale shape: part scales with the corpus, so its type column never
    ships whole (the pre-round-4 plan broadcast a full partkey->bool
    dict); the PROMO partkeys reduce in the SCAN task to a key Dataset
    and the month's lines take the adaptive semi join (broadcast set
    below the key gate, partitioned cogroup above). The month window is
    pushed into both lineitem scans; each block emits ONE partial
    (sum, count) row. Exact integer-cents sums; the percent is one
    double division."""
    import pyarrow.compute as pc_
    import pyarrow.dataset as pads

    from ..money import cents_np as _cents_np

    pkeys = _read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda t: t.filter(pc_.equal(t["p_type"], "PROMO"))
        .select(["p_partkey"]).rename_columns(["l_partkey"]),
        batch_format="pyarrow",
    )

    def window_scan():
        return _read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_extendedprice", "l_discount"],
            filter=(
                (pads.field("l_shipdate") >= pd.Timestamp(Q14_FROM))
                & (pads.field("l_shipdate") < pd.Timestamp(Q14_TO))
            ),
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = _cents_np(df["l_extendedprice"].to_numpy()) * (
            100 - _cents_np(df["l_discount"].to_numpy())
        )
        return pd.DataFrame({"rev_c4": [int(rev.sum())], "n_items": [len(df)]})

    def fold(ds_) -> tuple[int, int]:
        p = ds_.map_batches(partial, batch_format="pandas").to_pandas()
        return int(p["rev_c4"].sum()), int(p["n_items"].sum())

    total_c4, n_items = fold(window_scan())
    promo_c4, _ = fold(
        semi_anti_join(window_scan(), pkeys, on="l_partkey",
                       assume_distinct=True)
    )
    return pd.DataFrame(
        {"promo_pct": [100.0 * promo_c4 / total_c4],
         "promo_revenue": [promo_c4 / 10000.0],
         "total_revenue": [total_c4 / 10000.0],
         "n_items": [np.int64(n_items)]}
    )


Q18_MIN_QTY = 300


def q18_big_orders(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """TPC-H Q18 (large-volume customer): the top-k biggest orders (by
    total price) whose line quantities sum above ``Q18_MIN_QTY``, with
    the ordering customer's name.

    Scale shape: lineitem reduces to (orderkey, qty) per-block partials +
    one grouped sum; the HAVING filter cuts to the few qualifying keys,
    which semi-join-filter the orders scan through the adaptive
    broadcast/cogroup gate (semi_anti_join). Only the top-k report rows
    ever reach the driver; the customer name attaches to those k rows."""
    import pyarrow.parquet as pq

    from ..stages.partial_agg import partial_sum_count

    li = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )

    def widen(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["l_orderkey"].combine_chunks(),
             pc.cast(t["l_quantity"], pa.int64())],
            names=["l_orderkey", "qty"],
        )

    qty = partial_sum_count(
        li.map_batches(widen, batch_format="pyarrow"), ["l_orderkey"], ["qty"]
    ).filter(expr=f"qty > {Q18_MIN_QTY}").materialize()
    # materialized once: both the semi-join build side and the report
    # merge read it, and without this the full lineitem scan + grouped
    # sum would execute twice

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    big = semi_anti_join(
        orders, qty.select_columns(["l_orderkey"]), on="o_orderkey",
        assume_distinct=True,
    )

    def to_report(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["o_orderkey"].combine_chunks(), t["o_custkey"].combine_chunks(),
             t["o_orderdate"].combine_chunks(), _cents(t["o_totalprice"])],
            names=["o_orderkey", "o_custkey", "o_orderdate", "price_c"],
        )

    rep = (
        big.map_batches(to_report, batch_format="pyarrow")
        .sort(["price_c", "o_orderkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    qdf = qty.to_pandas()  # bounded: orders above the HAVING threshold
    rep = rep.merge(
        qdf.rename(columns={"l_orderkey": "o_orderkey"})[["o_orderkey", "qty"]],
        on="o_orderkey", how="left",
    )
    cust = lookup_dim_rows(
        os.path.join(sf_dir, "customer.parquet"), "c_custkey",
        rep["o_custkey"].to_numpy(np.int64), ["c_custkey", "c_name"],
    )  # bounded by k — never the full customer table at the driver
    rep["c_name"] = rep["o_custkey"].map(
        dict(zip(cust["c_custkey"], cust["c_name"]))
    )
    out = pd.DataFrame(
        {"c_name": rep["c_name"], "o_custkey": rep["o_custkey"].astype(np.int64),
         "o_orderkey": rep["o_orderkey"].astype(np.int64),
         "o_orderdate": pd.to_datetime(rep["o_orderdate"]).dt.strftime("%Y-%m-%d"),
         "total_price": rep["price_c"] / 100.0,
         "sum_qty": rep["qty"].astype(np.int64)}
    )
    return (
        out.sort_values(["total_price", "o_orderkey"],
                        ascending=[False, True])
        .reset_index(drop=True)
    )


Q10_FROM, Q10_TO = "1996-10-01", "1997-01-01"


def q10_returned_items(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """TPC-H Q10 (returned-item reporting): the top-k customers by revenue
    lost to returned lineitems ('R' flag) on one quarter's orders.

    Scale shape: the return-flag cut runs at the lineitem scan and the
    date window at the orders scan BEFORE the partitioned hash join on
    orderkey; join output pre-aggregates per custkey inside each batch, so
    the final grouped sum moves one row per (block, customer). Names
    attach to the k report rows only."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ..money import cents_np as _cents_np

    li = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_returnflag") == "R"),
    )

    def l_side(df: pd.DataFrame) -> pd.DataFrame:
        rev = _cents_np(df["l_extendedprice"].to_numpy()) * (
            100 - _cents_np(df["l_discount"].to_numpy())
        )
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(np.int64), "rev_c4": rev}
        )

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=(
            (pads.field("o_orderdate") >= pd.Timestamp(Q10_FROM))
            & (pads.field("o_orderdate") < pd.Timestamp(Q10_TO))
        ),
    )

    def o_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_orderkey": df["o_orderkey"].to_numpy(np.int64),
             "c_custkey": df["o_custkey"].to_numpy(np.int64)}
        )

    joined = bucket_hash_join(
        li.map_batches(l_side, batch_format="pandas"),
        orders.map_batches(o_side, batch_format="pandas"),
        on="l_orderkey",
        arrow_kernel=True,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_custkey", as_index=False).agg(
            rev_c4=("rev_c4", "sum")
        )

    from ray.data.aggregate import Sum

    top = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("c_custkey")
        .aggregate(Sum("rev_c4", alias_name="rev_c4"))
        .sort(["rev_c4", "c_custkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    cust = lookup_dim_rows(
        os.path.join(sf_dir, "customer.parquet"), "c_custkey",
        top["c_custkey"].to_numpy(np.int64),
        ["c_custkey", "c_name", "c_nationkey"],
    )  # bounded by k — never the full customer table at the driver
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    cd = cust.set_index("c_custkey")
    top["c_name"] = top["c_custkey"].map(cd["c_name"])
    top["n_name"] = top["c_custkey"].map(cd["c_nationkey"]).map(
        nation.set_index("n_nationkey")["n_name"]
    )
    out = pd.DataFrame(
        {"c_custkey": top["c_custkey"].astype(np.int64), "c_name": top["c_name"],
         "n_name": top["n_name"], "revenue": top["rev_c4"] / 10000.0}
    )
    return (
        out.sort_values(["revenue", "c_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


Q22_CUTOFF = "2000-01-01"


def q22_dormant_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape (global sales opportunity): per market segment,
    the count and total balance of customers whose account balance beats
    the average POSITIVE balance but who placed no order on or after
    ``Q22_CUTOFF`` — a decorrelated scalar subquery plus an anti-join.

    Scale shape: the global average is two integers from one partial
    reduction, and the above-average cut is the cross-multiplied integer
    predicate bal_c * n_pos > sum_c (no float avg, exact everywhere);
    recently-active custkeys flow date-pruned from the orders scan into
    the adaptive anti-join (broadcast set below the key gate, marker
    cogroup join above); the segment rollup ships one partial row per
    (block, segment)."""
    from ray.data.aggregate import Sum

    from ..money import cents_np as _cents_np

    cust = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )

    def pos_partial(df: pd.DataFrame) -> pd.DataFrame:
        pos = df[df["c_acctbal"] > 0.0]
        return pd.DataFrame(
            {"s": [int(_cents_np(pos["c_acctbal"].to_numpy()).sum())],
             "n": [len(pos)]}
        )

    tot = cust.map_batches(pos_partial, batch_format="pandas").to_pandas()
    s_pos, n_pos = int(tot["s"].sum()), int(tot["n"].sum())

    def above_avg(df: pd.DataFrame) -> pd.DataFrame:
        bal_c = _cents_np(df["c_acctbal"].to_numpy())
        keep = bal_c * n_pos > s_pos
        return pd.DataFrame(
            {"c_custkey": df["c_custkey"].to_numpy(np.int64)[keep],
             "c_mktsegment": df["c_mktsegment"].to_numpy()[keep],
             "bal_c": bal_c[keep]}
        )

    import pyarrow.dataset as pads

    active = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"],
        filter=(pads.field("o_orderdate") >= pd.Timestamp(Q22_CUTOFF)),
    ).map_batches(
        lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow"
    )

    dormant = semi_anti_join(
        cust.map_batches(above_avg, batch_format="pandas"),
        active, on="c_custkey", anti=True,
    )

    def seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_cust=("bal_c", "size"), bal_c=("bal_c", "sum")
        )
        return g

    out = (
        dormant.map_batches(seg_partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("n_cust", alias_name="n_cust"),
                   Sum("bal_c", alias_name="bal_c"))
        .to_pandas()
    )
    out["n_cust"] = out["n_cust"].astype(np.int64)
    out["total_acctbal"] = out["bal_c"].astype(np.int64) / 100.0
    return (
        out[["c_mktsegment", "n_cust", "total_acctbal"]]
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )


def detect_hot_keys(ds: rd.Dataset, on: str, threshold: int) -> list:
    """Keys whose row count exceeds ``threshold`` — per-block count
    partials then one grouped sum, so the shuffle moves one row per
    (block, key); the returned list is bounded by data_size/threshold."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([on]).to_pandas().groupby(on, as_index=False).size()
            .rename(columns={"size": "cnt"})
        )
        return _from_pandas(g)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(on)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .filter(expr=f"cnt > {threshold}")
        .to_pandas()
    )
    return counts[on].tolist()


def salted_bucket_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    hot_keys,
    n_buckets: int = 64,
    salt: int = 8,
) -> rd.Dataset:
    """Inner bucket join that survives hot keys: rows of ``left`` whose
    key is in ``hot_keys`` are spread across ``salt`` sub-partitions
    (deterministic per-block round-robin), and the matching ``right``
    rows are REPLICATED to every sub-partition; cold keys pay nothing.
    Per-task memory for a hot key drops from count(key) to
    count(key)/salt at the cost of salt x replication of the hot build
    rows — the standard skew-salting trade, applied only where needed.

    ``hot_keys`` comes from :func:`detect_hot_keys` or the caller's own
    knowledge. Column sets must be disjoint apart from ``on``."""
    import ray

    from ..stages.partial_agg import add_hash_bucket

    lschema, rschema = left.schema(), right.schema()
    lcols = [c for c in lschema.names if c != on]
    rcols = [c for c in rschema.names if c != on]
    col_dtypes = _schema_pandas_dtypes(lschema, rschema)
    hot_ref = ray.put(np.asarray(list(hot_keys)))

    def tag_left(t: pa.Table) -> pa.Table:
        t = add_hash_bucket(t, [on], n_buckets)
        hot = np.isin(t.column(on).to_numpy(zero_copy_only=False),
                      ray.get(hot_ref))
        s = np.where(hot, np.arange(t.num_rows, dtype=np.int64) % salt, 0)
        t = t.append_column("__salt", pa.array(s))
        return t.append_column("__side", pa.array(["L"] * t.num_rows))

    def tag_right(t: pa.Table) -> pa.Table:
        t = add_hash_bucket(t, [on], n_buckets)
        hot = np.isin(t.column(on).to_numpy(zero_copy_only=False),
                      ray.get(hot_ref))
        idx = np.concatenate(
            [np.flatnonzero(~hot)]
            + [np.flatnonzero(hot)] * salt
        )
        s = np.concatenate(
            [np.zeros((~hot).sum(), dtype=np.int64)]
            + [np.full(hot.sum(), j, dtype=np.int64) for j in range(salt)]
        )
        t = t.take(pa.array(idx))
        t = t.append_column("__salt", pa.array(s))
        return t.append_column("__side", pa.array(["R"] * t.num_rows))

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == "L"].reindex(columns=[on, *lcols])
        r = df[df["__side"] == "R"].reindex(columns=[on, *rcols])
        return l.merge(r, on=on, how="inner")

    norm_out = _pin_join_output(
        "salted_bucket_join", [on, *lcols, *rcols], col_dtypes
    )
    return both.groupby(["bucket", "__salt"]).map_groups(
        join_bucket, batch_format="pandas"
    ).map_batches(norm_out, batch_format="pandas")


Q15_FROM, Q15_TO = "1996-10-01", "1997-01-01"


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) achieving the maximum
    revenue over one quarter's shipments — a max-of-aggregate with
    tie-keeping semantics.

    Scale shape: the quarter window is pushed into the lineitem scan;
    per-supplier revenue reduces via per-block partials + one grouped
    sum into a DIMENSION-sized table (one row per supplier), whose max
    + equality filter run driver-side on that small result. Exact
    integer-cents revenue, so ties are exact too."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ..money import cents_np as _cents_np
    from ..stages.partial_agg import partial_sum_count

    li = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(
            (pads.field("l_shipdate") >= pd.Timestamp(Q15_FROM))
            & (pads.field("l_shipdate") < pd.Timestamp(Q15_TO))
        ),
    )

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        rev = _cents_np(df["l_extendedprice"].to_numpy()) * (
            100 - _cents_np(df["l_discount"].to_numpy())
        )
        return pd.DataFrame(
            {"l_suppkey": df["l_suppkey"].to_numpy(np.int64), "rev_c4": rev}
        )

    # per-supplier revenue STAYS a distributed Dataset (supplier scales
    # with the corpus); materialize once so max + tie filter reuse blocks
    rev_ds = partial_sum_count(
        li.map_batches(widen, batch_format="pandas"), ["l_suppkey"], ["rev_c4"]
    ).materialize()
    from ray.data.aggregate import Max

    top_c4 = int(rev_ds.aggregate(Max("rev_c4"))["max(rev_c4)"])
    top = rev_ds.map_batches(
        lambda t: t.filter(pc.equal(t["rev_c4"], pa.scalar(top_c4, pa.int64()))),
        batch_format="pyarrow",
    ).to_pandas()  # bounded by the tie set
    supp = lookup_dim_rows(
        os.path.join(sf_dir, "supplier.parquet"), "s_suppkey",
        top["l_suppkey"].to_numpy(np.int64), ["s_suppkey", "s_name"],
    )  # bounded by the tie set — never the full supplier table
    out = pd.DataFrame(
        {"s_suppkey": top["l_suppkey"].astype(np.int64),
         "s_name": top["l_suppkey"].map(
             dict(zip(supp["s_suppkey"], supp["s_name"]))),
         "total_revenue": top["rev_c4"].astype(np.int64) / 10000.0}
    )
    return out.sort_values("s_suppkey").reset_index(drop=True)


Q4_FROM, Q4_TO = "1996-07-01", "1996-10-01"
Q4_LATE_DAYS = 30


def q4_late_shipments(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape (order priority checking): per priority, the count
    of one quarter's orders having at least one lineitem shipped more
    than 30 days after the order date — a correlated EXISTS turned into
    an aggregate-then-join.

    Scale shape: the EXISTS collapses to ONE grouped max (latest
    shipdate per order, partial-combined); the quarter window is pushed
    into the orders scan; the date predicate evaluates vectorized after
    a partitioned join on orderkey; the priority rollup ships one row
    per (block, priority)."""
    import pyarrow.dataset as pads

    from ray.data.aggregate import Max, Sum

    li = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )
    # materialized: the join's schema probe would re-run the grouped max
    ship = li.groupby("l_orderkey").aggregate(
        Max("l_shipdate", alias_name="ship_end")
    ).materialize()

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(
            (pads.field("o_orderdate") >= pd.Timestamp(Q4_FROM))
            & (pads.field("o_orderdate") < pd.Timestamp(Q4_TO))
        ),
    ).map_batches(
        lambda t: t.rename_columns(
            ["l_orderkey", "o_orderdate", "o_orderpriority"]
        ),
        batch_format="pyarrow",
    )

    joined = bucket_hash_join(orders, ship, on="l_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        late = (
            pd.to_datetime(df["ship_end"])
            > pd.to_datetime(df["o_orderdate"])
            + pd.Timedelta(days=Q4_LATE_DAYS)
        )
        g = df[late].groupby("o_orderpriority", as_index=False).size()
        return g.rename(columns={"size": "n_late"})

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_late", alias_name="n_late"))
        .to_pandas()
    )
    out["n_late"] = out["n_late"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q8_NATION = "NATION_3"
Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape (national market share): per order year, the share
    of PROMO-part revenue delivered into one region's customers that was
    supplied by one nation — a ratio of two exact-cents aggregates over
    the same joined stream.

    Scale shape: Q5/Q7's plan with every corpus-scaled dimension kept
    distributed — the PROMO part keys reduce in the scan task and gate
    lineitem through the adaptive semi join; supplier-nation and
    customer-region hops go through ``attach_key_map`` (the customer dim
    is pre-filtered to the region's nations so the inner attach doubles
    as the region filter); lineitem ships PROMO rows (orderkey,
    supp_nation, rev_c4), orders ships region rows (orderkey, year); one
    partitioned join; per-batch partials into the tiny year space
    carrying (target_c4, total_c4). Only the 25-row nation table is a
    driver-side constant."""
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    from ..money import cents_np as _cents_np
    from ray.data.aggregate import Sum

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet")
    ).to_pandas()
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet")
    ).to_pandas()
    rk = set(region.loc[region["r_name"] == Q8_REGION, "r_regionkey"])
    region_nk = pa.array(
        nation.loc[nation["n_regionkey"].isin(rk), "n_nationkey"]
        .astype(np.int64).tolist(), type=pa.int64(),
    )
    target_nk = set(
        nation.loc[nation["n_name"] == Q8_NATION, "n_nationkey"]
    )

    promo_keys = _read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda t: t.filter(pc_.equal(t["p_type"], Q8_TYPE))
        .select(["p_partkey"]).rename_columns(["l_partkey"]),
        batch_format="pyarrow",
    )
    supp_dim = _read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).map_batches(
        lambda t: t.rename_columns(["l_suppkey", "s_nk"]),
        batch_format="pyarrow",
    )
    cust_dim = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda t: t.filter(
            pc_.is_in(pc_.cast(t["c_nationkey"], pa.int64()), region_nk)
        ).rename_columns(["o_custkey", "c_nk"]),
        batch_format="pyarrow",
    )

    li = semi_anti_join(
        _read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey", "l_suppkey",
                     "l_extendedprice", "l_discount"],
        ),
        promo_keys, on="l_partkey", assume_distinct=True,
    )

    def l_side(df: pd.DataFrame) -> pd.DataFrame:
        rev = _cents_np(df["l_extendedprice"].to_numpy()) * (
            100 - _cents_np(df["l_discount"].to_numpy())
        )
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(np.int64),
             "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
             "rev_c4": rev}
        )

    l_stream = attach_key_map(
        li.map_batches(l_side, batch_format="pandas"),
        supp_dim, on="l_suppkey", value_cols="s_nk",
        facts_dtypes={"l_orderkey": np.int64, "l_suppkey": np.int64,
                      "rev_c4": np.int64},
    ).select_columns(["l_orderkey", "s_nk", "rev_c4"])

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def o_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_orderkey": df["o_orderkey"].to_numpy(np.int64),
             "o_custkey": df["o_custkey"].to_numpy(np.int64),
             "o_year": pd.to_datetime(df["o_orderdate"]).dt.year.to_numpy(
                 np.int64)}
        )

    o_stream = attach_key_map(
        orders.map_batches(o_side, batch_format="pandas"),
        cust_dim, on="o_custkey", value_cols="c_nk",
        facts_dtypes={"l_orderkey": np.int64, "o_custkey": np.int64,
                      "o_year": np.int64},
    ).select_columns(["l_orderkey", "o_year"])

    joined = bucket_hash_join(
        l_stream, o_stream, on="l_orderkey", arrow_kernel=True
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            target_c4=np.where(df["s_nk"].isin(target_nk).to_numpy(bool),
                               df["rev_c4"], 0)
        )
        return df.groupby("o_year", as_index=False).agg(
            target_c4=("target_c4", "sum"), total_c4=("rev_c4", "sum")
        )

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("o_year")
        .aggregate(Sum("target_c4", alias_name="target_c4"),
                   Sum("total_c4", alias_name="total_c4"))
        .to_pandas()
    )
    out["o_year"] = out["o_year"].astype(np.int64)
    out["mkt_share"] = (
        out["target_c4"].astype(np.float64)
        / out["total_c4"].astype(np.float64)
    )
    return (
        out[["o_year", "mkt_share"]].sort_values("o_year")
        .reset_index(drop=True)
    )


def q13_order_count_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 (customer distribution): the histogram of customers by
    how many orders they placed, INCLUDING zero-order customers — a
    LEFT-join grouped count of a grouped count.

    Scale shape: orders reduce to per-customer counts; zero-order
    customers come from one total-customer count minus the counted set
    (no LEFT join shuffle needed: |customers with >=1 order| is already
    the grouped table's row count); the final histogram is bounded by
    max orders per customer."""
    from ray.data.aggregate import Sum

    from ..stages.partial_agg import partial_sum_count

    orders = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    ).map_batches(
        lambda t: t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    per_cust = partial_sum_count(orders, ["o_custkey"], ["one"])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["n"]).to_pandas().groupby("n", as_index=False).size()
            .rename(columns={"n": "c_count", "size": "n_cust"})
        )
        return _from_pandas(g)

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("n_cust", alias_name="n_cust"))
        .to_pandas()
    )
    import pyarrow.parquet as pq

    n_total = pq.ParquetFile(
        os.path.join(sf_dir, "customer.parquet")
    ).metadata.num_rows
    n_with = int(hist["n_cust"].sum())
    if n_total - n_with > 0:
        hist = pd.concat(
            [hist,
             pd.DataFrame({"c_count": [0], "n_cust": [n_total - n_with]})]
        )
    hist["c_count"] = hist["c_count"].astype(np.int64)
    hist["n_cust"] = hist["n_cust"].astype(np.int64)
    return (
        hist.sort_values(["n_cust", "c_count"], ascending=[False, False])
        .reset_index(drop=True)
    )


Q17_QTY_FRACTION_NUM, Q17_QTY_FRACTION_DEN = 1, 5  # 0.2 exactly


def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): average yearly
    revenue lost if orders below 20% of a part's average quantity were
    not taken — a per-group scalar threshold applied back to the fact
    table.

    Scale shape: per-part (sum_qty, n) reduces via partials into a
    part-dimension-sized DATASET — part scales with the corpus, so it
    goes back onto the fact stream through ``attach_key_map``'s adaptive
    gate (two broadcast int arrays below _BROADCAST_KEY_LIMIT keys, a
    partitioned bucket join above) rather than a driver-side dict; the
    threshold predicate is the cross-multiplied integer comparison
    qty * 5 * n_part < sum_qty (no float average anywhere); the second
    lineitem scan emits per-block revenue partials."""
    from ..stages.partial_agg import partial_sum_count

    def li_scan():
        return _read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )

    def widen(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["l_partkey"].combine_chunks(),
             pc.cast(t["l_quantity"], pa.int64())],
            names=["l_partkey", "qty"],
        )

    per_part = partial_sum_count(
        li_scan().map_batches(widen, batch_format="pyarrow"),
        ["l_partkey"], ["qty"],
    ).map_batches(  # part-dimension-sized; stays a Dataset
        lambda df: (
            df.rename(columns={"qty": "sum_qty", "n": "n_part"})
            [["l_partkey", "sum_qty", "n_part"]].astype(np.int64)
            if all(c in df.columns for c in ("l_partkey", "qty", "n"))
            else pd.DataFrame({c: pd.Series([], dtype="int64")
                               for c in ("l_partkey", "sum_qty", "n_part")})
        ),
        batch_format="pandas",
    )

    def fact_prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.cast(t["l_partkey"], pa.int64()),
             pc.cast(t["l_quantity"], pa.int64()),
             _cents(t["l_extendedprice"])],
            names=["l_partkey", "qty", "price_c"],
        )

    attached = attach_key_map(
        li_scan().map_batches(fact_prep, batch_format="pyarrow"),
        per_part, on="l_partkey", value_cols=["sum_qty", "n_part"],
        facts_dtypes={"l_partkey": np.int64, "qty": np.int64,
                      "price_c": np.int64},
    )

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        qty = df["qty"].to_numpy(np.int64)
        s = df["sum_qty"].to_numpy(np.int64)
        n = df["n_part"].to_numpy(np.int64)
        keep = (qty * Q17_QTY_FRACTION_DEN * n
                * Q17_QTY_FRACTION_NUM) < s  # qty*5 < avg*5 = s/n -> qty*5*n < s
        price_c = df["price_c"].to_numpy(np.int64)
        return pd.DataFrame(
            {"rev_c": [int(price_c[keep].sum())],
             "n_items": [int(keep.sum())]}
        )

    p = attached.map_batches(rev_partial, batch_format="pandas").to_pandas()
    rev_c = int(p["rev_c"].sum())
    return pd.DataFrame(
        {"avg_yearly": [rev_c / 7.0 / 100.0],
         "n_items": [np.int64(p["n_items"].sum())]}
    )
