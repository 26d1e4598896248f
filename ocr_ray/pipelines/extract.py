"""The flagship pipeline: transcript turns -> extracted content spans.

Engine shape (SURVEY.md §3.1 "Engine shape"):

    read_parquet(turns, pruned columns)
      -> map_batches(SpanExtractor, actor pool)      # fused score/propose/decode
      -> reconcile: groupby(conv_id) + stable (turn_idx, span_idx) in-group
         order -> per-conversation global span ordinal                (O2 analog)
      -> write_parquet(partitioned, resumable)

The extractor stage is the only payload-heavy stage; reconciliation runs
over the (much smaller) span rows. The reconciliation shuffle is the one
semantically required wide operation (SURVEY.md §7.3) and ships a salted
two-phase variant for skewed mega-conversations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..pqread import read_parquet as _read_parquet

from .. import config as C
from ..stages.extractor import SpanExtractor

__all__ = [
    "read_turns",
    "extract_spans",
    "extract_with_metrics",
    "extract_metrics_totals",
    "split_counted_spans",
    "reconcile",
    "reconcile_sorted",
    "run_extraction",
]

TURN_COLUMNS = ["conv_id", "turn_idx", "text"]

# Salt width for the two-phase reconciliation: one salt bucket per
# SALT_TURNS consecutive turn indices, so a mega-conversation splits into
# many groups while bucket order still follows turn order.
SALT_TURNS = 64


def read_turns_any(path: str, format: str = "parquet") -> rd.Dataset:
    """Multi-format turn source (S1 variants): parquet (primary), csv, or
    json-lines. CSV reads enable newlines-in-quoted-values so multi-line
    payloads round-trip."""
    if format == "parquet":
        return read_turns(path)
    if format == "csv":
        import pyarrow.csv as pcsv

        return rd.read_csv(
            path,
            parse_options=pcsv.ParseOptions(newlines_in_values=True),
        )
    if format == "json":
        return rd.read_json(path)
    raise ValueError(f"unknown format: {format}")


def training_reader(
    turns_path: str, seed: int = 42, batch_size: int = 256
):
    """Shuffled training-feed reader (O5 analog — the reference shuffles
    its manifest twice, DataGen.py:408-409, then assembles batches):
    seeded global random_shuffle -> streamed Arrow batches. Deterministic
    given (seed, input)."""
    ds = read_turns(turns_path).random_shuffle(seed=seed)
    return ds.iter_batches(batch_size=batch_size, batch_format="pyarrow")


def truncate_payloads(
    turns: rd.Dataset, max_chars: int
) -> rd.Dataset:
    """Payload windowing with recorded scale factors (M2 analog — the
    reference's aspect-preserving resize returns the ratios so box coords
    map back, DataPreprocess/imgUtil.py:4-24): truncate ``text`` to
    ``max_chars`` and record ``orig_len`` so downstream span offsets are
    interpretable against the original payload."""

    def trunc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        orig = pc.utf8_length(t["text"]).cast(pa.int64())
        clipped = pc.utf8_slice_codeunits(t["text"], 0, max_chars)
        idx = t.schema.get_field_index("text")
        out = t.set_column(idx, "text", clipped)
        return out.append_column("orig_len", orig)

    return turns.map_batches(trunc, batch_format="pyarrow")


def write_spans_csv(spans: rd.Dataset, out_dir: str) -> None:
    """CSV sink — the result.txt analog (S5, reference test_img.py:121-132
    writes one CSV line per surviving box). Parquet is the primary sink;
    this exists for reference-shaped consumers."""
    spans.write_csv(out_dir)


def read_turns(
    path: str,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
    roles: list[str] | None = None,
) -> rd.Dataset:
    """Pruned-at-the-read turn source (S1/S2 analog): only the columns the
    extraction chain needs leave storage.

    ``num_blocks=None`` targets ~4 blocks per CPU: enough waves to
    load-balance the heavy extract stage (payload cost varies ~2x between
    html and plain turns) without paying per-task launch overhead on
    hundreds of tiny blocks (measured sweep: 4x beats 8x at 32 CPUs).

    ``roles`` pushes a row filter down to the parquet row groups (e.g.
    extract only assistant turns without scanning user/tool payloads).
    """
    if num_blocks is None and ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        num_blocks = 4 * ncpu
    kwargs = {"override_num_blocks": num_blocks} if num_blocks else {}
    if roles is not None:
        import pyarrow.compute as pc

        kwargs["filter"] = pc.field("role").isin(roles)
        cols = list(columns or TURN_COLUMNS)
        if "role" not in cols:
            cols.append("role")
        return _read_parquet(path, columns=cols, **kwargs)
    return _read_parquet(path, columns=columns or TURN_COLUMNS, **kwargs)


def _extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task form of the fused extractor: the only per-worker
    state (compiled regexes, rule tables) is module-level and loads at
    import, so elastic tasks beat an actor pool here — no pool ramp-up,
    scheduling to every free CPU. SpanExtractor (the actor form) remains
    for stages that hold real per-actor state."""
    return SpanExtractor.__call__(_EXTRACT_SINGLETON, batch)


_EXTRACT_SINGLETON = SpanExtractor()


def extract_spans(
    turns: rd.Dataset,
    *,
    batch_size: int = 1024,
    concurrency: int | tuple[int, int] | None = None,
    use_actors: bool = False,
    stats=None,
) -> rd.Dataset:
    """Turns -> flat span rows via the fused extractor.

    Default: stateless task pool (fully elastic). ``use_actors=True``
    switches to the actor-pool form (``concurrency=None`` sizes it to
    (1, cluster CPUs)) — the right shape once the stage holds real
    loaded-once state (models, large rule tables).

    ``stats=True``: each batch then appends ONE counter-partial row
    (turns_in, empty_payloads, error_rows, drop_*, spans_out as a JSON
    string in the ``_counters`` column; null on real span rows) to its
    output DURING the single production pass — metrics ride the dataflow
    itself, no side-channel actor RPC in the hot loop (the r4 shape did a
    synchronous ``ray.get(actor.add.remote())`` per batch: a round-trip
    to ONE actor serialized into the hottest stage). Split the result
    with :func:`split_counted_spans` (what ``extract_with_metrics``
    does)."""
    if stats:
        import json as _json

        from ..stages.extractor import extract_batch_counted

        def counted(batch: pa.Table) -> pa.Table:
            counters: dict[str, int] = {
                "turns_in": batch.num_rows,
                "empty_payloads": 0,
                "error_rows": 0,
            }
            out = extract_batch_counted(batch, counters)
            counters["spans_out"] = out.num_rows
            out = out.append_column(
                "_counters", pa.nulls(out.num_rows, pa.string())
            )
            partial = pa.Table.from_pydict(
                {
                    **{
                        c: pa.nulls(1, out.schema.field(c).type)
                        for c in out.column_names
                        if c != "_counters"
                    },
                    "_counters": pa.array([_json.dumps(counters)]),
                },
                schema=out.schema,
            )
            return pa.concat_tables([out, partial])

        return turns.map_batches(
            counted, batch_format="pyarrow", batch_size=batch_size
        )
    if not use_actors:
        return turns.map_batches(
            _extract_batch, batch_format="pyarrow", batch_size=batch_size
        )
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(2, ncpu))
    return turns.map_batches(
        SpanExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        concurrency=concurrency,
    )


def _sum_counter_partials(counted: rd.Dataset) -> dict[str, int]:
    """Fold the ``_counters`` JSON partial rows of a ``stats=True``
    extraction output into totals: project FIRST (zero-copy
    single-column view), filter the ~1-in-1000 partial rows, sum
    driver-side — O(batches), never O(rows); the pass never touches span
    columns. The four headline counters always report, even at zero."""
    import json as _json

    import pyarrow.compute as pc

    partials = counted.map_batches(
        lambda t: t.select(["_counters"]).filter(pc.is_valid(t["_counters"])),
        batch_format="pyarrow", batch_size=None,
    ).take_all()
    totals: dict[str, int] = {}
    for row in partials:
        for k, v in _json.loads(row["_counters"]).items():
            totals[k] = totals.get(k, 0) + int(v)
    for k in ("turns_in", "empty_payloads", "error_rows", "spans_out"):
        totals.setdefault(k, 0)
    return totals


def split_counted_spans(
    counted: rd.Dataset,
) -> tuple[rd.Dataset, dict[str, int]]:
    """Split a ``stats=True`` extraction output into (span rows, counter
    totals): totals via :func:`_sum_counter_partials`; the span view is
    a lazy vectorized filter + drop over the already-materialized
    blocks."""
    import pyarrow.compute as pc

    totals = _sum_counter_partials(counted)
    spans = counted.map_batches(
        lambda t: t.filter(pc.is_null(t["_counters"])).drop(["_counters"]),
        batch_format="pyarrow",
    )
    return spans, totals


def extract_with_metrics(
    turns: rd.Dataset, *, batch_size: int = 1024
) -> tuple[rd.Dataset, dict[str, int]]:
    """ONE production pass that yields both the span Dataset and the full
    drop/dead-letter counter totals — replaces the former second audit
    run of the whole chain (the old extract_metrics shape doubled the
    most expensive stage). Counter partials ride the dataflow as one
    tagged row per batch (see ``extract_spans(stats=True)``), so the hot
    stage makes zero actor round-trips (VERDICT r4 item 4; the prior
    shape ray.get-ed a counter actor synchronously every batch). The
    totals split is a second O(blocks) single-column scan of the
    materialized output — fixed executor-startup cost, never O(rows)
    work. Callers that only need totals should use
    :func:`extract_metrics_totals` (one streaming pass, nothing
    materialized)."""
    counted = extract_spans(
        turns, batch_size=batch_size, stats=True
    ).materialize()
    return split_counted_spans(counted)


def extract_metrics_totals(
    turns: rd.Dataset, *, batch_size: int = 1024
) -> dict[str, int]:
    """Metrics-only form: stream the counted production chain ONCE and
    reduce just the per-batch counter-partial rows on the driver — no
    materialization, no second pass, no actor; span rows die in the
    filter right after extraction."""
    return _sum_counter_partials(
        extract_spans(turns, batch_size=batch_size, stats=True)
    )


def _assign_local(group: pd.DataFrame) -> pa.Table:
    """Stable in-group ordering + local ordinal (one salt bucket).

    Returns Arrow (metadata-stripped): this output feeds the native hash
    join, where a pandas-origin block schema breaks Ray's schema dedup."""
    from ..stages.partial_agg import from_pandas

    group = group.sort_values(["turn_idx", "span_idx"], kind="mergesort")
    group["local_seq"] = np.arange(len(group), dtype=np.int64)
    return from_pandas(group)


def reconcile(spans: rd.Dataset, *, salted: bool = True) -> rd.Dataset:
    """Span reconciliation (the O2 stable-ordering contract inter-turn):
    assign each span its global per-conversation ordinal ``span_seq`` under
    stable (turn_idx, span_idx) order.

    salted=True runs the skew-safe two-phase form (SURVEY.md §7.4):
      phase 1: groupby (conv_id, salt=turn_idx // SALT_TURNS); local stable
               sort + local ordinal per bucket;
      phase 2: per-(conv_id, salt) counts -> per-conv prefix offsets
               computed DISTRIBUTED (groupby(conv_id) over the tiny counts
               table) -> Dataset-side hash join back onto the span rows ->
               span_seq = offset + local_seq. No driver-side structure
               proportional to conversation count anywhere.
    A conversation 1000x the median therefore never forms one giant group.

    salted=False is the direct groupby(conv_id) form (fine when no key is
    skewed); both produce identical output.
    """
    if not salted:
        def assign(group: pd.DataFrame) -> pd.DataFrame:
            group = group.sort_values(["turn_idx", "span_idx"], kind="mergesort")
            group["span_seq"] = np.arange(len(group), dtype=np.int64)
            return group

        return spans.groupby("conv_id").map_groups(assign, batch_format="pandas")

    def add_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        salt = pc.divide(pc.cast(batch["turn_idx"], pa.int64()), SALT_TURNS)
        return batch.append_column("salt", pc.cast(salt, pa.int64()))

    # Materialize once: both phases consume this dataset, and this is also
    # the natural mid-pipeline checkpoint (span rows are ~2 orders of
    # magnitude smaller than the payload-bearing input).
    salted_ds = spans.map_batches(add_salt, batch_format="pyarrow").materialize()
    local = salted_ds.groupby(["conv_id", "salt"]).map_groups(
        _assign_local, batch_format="pandas"
    )

    if salted_ds.count() == 0:  # empty input: nothing to reconcile
        def drop_salt(df: pd.DataFrame) -> pd.DataFrame:
            df["span_seq"] = np.zeros(len(df), dtype=np.int64)
            return df.drop(columns=["salt"], errors="ignore")

        return salted_ds.map_batches(drop_salt, batch_format="pandas")

    # phase 2, fully distributed: per-(conv, salt) counts (rows ~ convs x
    # buckets, each conv's bucket list small) -> per-conv prefix offsets via
    # groupby(conv_id) -> hash join back onto the span rows. The driver
    # never materializes anything proportional to conversation count.
    counts_ds = salted_ds.groupby(["conv_id", "salt"]).count()

    def prefix(g: pd.DataFrame) -> pa.Table:
        from ..stages.partial_agg import from_pandas

        g = g.sort_values("salt", kind="mergesort")
        cnt = g["count()"].to_numpy()
        g["offset"] = np.cumsum(cnt) - cnt
        return from_pandas(g[["conv_id", "salt", "offset"]])

    offsets_ds = counts_ds.groupby("conv_id").map_groups(
        prefix, batch_format="pandas"
    )

    nparts = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    joined = local.join(
        offsets_ds,
        join_type="inner",
        num_partitions=nparts,
        on=("conv_id", "salt"),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["span_seq"] = df["offset"].to_numpy(dtype=np.int64) + df[
            "local_seq"
        ].to_numpy(dtype=np.int64)
        return df.drop(columns=["salt", "local_seq", "offset"])

    return joined.map_batches(finish, batch_format="pandas")


def reconcile_sorted(spans: rd.Dataset, *, nblocks: int | None = None) -> rd.Dataset:
    """Scale-path span reconciliation: identical output to ``reconcile``
    but built on ONE range-partitioning sort instead of a per-group pandas
    fan-out (23k tiny groups cost ~1 ms each in map_groups; this path is
    O(blocks) driver work + two vectorized passes).

        sort (conv_id, turn_idx, span_idx)          # the one wide shuffle
        pass 1: per sorted block -> ONE boundary-summary row (min key,
                first/last conv + their in-block counts, #convs); blocks
                are disjoint key ranges, so the min key identifies and
                orders blocks without preserve_order
        driver: walk blocks in key order carrying (conv, running count)
                across boundaries -> {min_key: first-conv offset}. The
                global sort makes every conversation CONTIGUOUS across
                blocks, so only a block's FIRST conv can continue from an
                earlier block — every other conv in the block starts at 0.
                Driver state is therefore O(blocks), independent of
                conversation count (the 10^9-conversation shape is safe).
        pass 2: span_seq = vectorized block-local cumcount per conv run,
                + the broadcast offset on the first run only

    Skew: a mega-conversation straddles range-partitioned blocks naturally;
    its offsets accumulate across however many blocks it spans.

    Span rows are ~2 orders of magnitude smaller than the payload input,
    so they are coalesced (repartition, no shuffle) to ~1 block per CPU
    before the sort — an all-to-all over hundreds of tiny blocks pays
    O(blocks^2) exchange overhead for no parallelism gain.
    """
    if nblocks is None:
        nblocks = (
            int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        )
    # Materialize the (small) span rows first: letting the sort's map phase
    # fuse into the lazy extract pipeline serializes it into one task in
    # this Ray version; materialized input sorts block-parallel. This is
    # also the natural mid-pipeline checkpoint (payload already dropped).
    sorted_spans = (
        spans.materialize()
        .repartition(nblocks)
        .sort(["conv_id", "turn_idx", "span_idx"])
        .materialize()
    )

    _SUM_SCHEMA = pa.schema(
        [("k_conv", pa.string()), ("k_turn", pa.int64()), ("k_span", pa.int64()),
         ("first_conv", pa.string()), ("n_first", pa.int64()),
         ("last_conv", pa.string()), ("n_last", pa.int64()),
         ("n_convs", pa.int64())]
    )

    def summarize(batch: pa.Table) -> pa.Table:
        """One boundary row per block: O(1) output regardless of how many
        conversations the block holds."""
        if batch.num_rows == 0:
            return _SUM_SCHEMA.empty_table()
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
        n = len(conv)
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(conv[1:], conv[:-1], out=change[1:])
        starts = np.nonzero(change)[0]
        n_first = int(starts[1] if len(starts) > 1 else n)
        n_last = int(n - starts[-1])
        return pa.Table.from_pydict(
            {
                "k_conv": [str(conv[0])],
                "k_turn": [int(batch.column("turn_idx")[0].as_py())],
                "k_span": [int(batch.column("span_idx")[0].as_py())],
                "first_conv": [str(conv[0])],
                "n_first": [n_first],
                "last_conv": [str(conv[-1])],
                "n_last": [n_last],
                "n_convs": [len(starts)],
            },
            schema=_SUM_SCHEMA,
        )

    summary = sorted_spans.map_batches(
        summarize, batch_size=None, batch_format="pyarrow"
    ).to_pandas()  # EXACTLY one row per non-empty block — O(blocks)

    # walk blocks in min-key order, carrying the (conv, cumulative count)
    # that straddles each boundary; record only the first conv's offset
    summary = summary.sort_values(
        ["k_conv", "k_turn", "k_span"], kind="mergesort"
    )
    offsets: dict[tuple, int] = {}
    carry_conv: str | None = None
    carry_cnt = 0
    for row in summary.itertuples(index=False):
        mk = (row.k_conv, int(row.k_turn), int(row.k_span))
        offsets[mk] = carry_cnt if row.first_conv == carry_conv else 0
        if int(row.n_convs) == 1:
            carry_cnt = (
                carry_cnt + int(row.n_first)
                if row.first_conv == carry_conv
                else int(row.n_first)
            )
            carry_conv = row.first_conv
        else:
            carry_conv, carry_cnt = row.last_conv, int(row.n_last)
    oref = ray.put(offsets)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("span_seq", pa.array([], pa.int64()))
        table = ray.get(oref)
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
        n = len(conv)
        mk = (str(conv[0]), int(batch.column("turn_idx")[0].as_py()),
              int(batch.column("span_idx")[0].as_py()))
        off = table[mk]
        # vectorized per-run cumcount: seq[i] = i - start_of_run(i), plus
        # the carried offset on the block's first run only
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(conv[1:], conv[:-1], out=change[1:])
        starts = np.nonzero(change)[0]
        run_id = np.cumsum(change) - 1
        seq = np.arange(n, dtype=np.int64) - starts[run_id]
        if off:
            seq[: (starts[1] if len(starts) > 1 else n)] += off
        return batch.append_column("span_seq", pa.array(seq))

    return sorted_spans.map_batches(assign, batch_size=None, batch_format="pyarrow")


def run_extraction(
    turns_path: str,
    out_dir: str | None = None,
    *,
    batch_size: int = 1024,
    mode: str = "sorted",
    partition_output: bool = False,
) -> rd.Dataset:
    """End-to-end: read -> extract -> reconcile (-> write if out_dir).

    ``mode``: "sorted" (default, the fast sort-based reconciliation),
    "salted" (two-phase salted groupby), or "grouped" (direct groupby) —
    all three produce identical output (tested).

    Output is a parquet directory of part files (resumable layout: rerun
    with a fresh out_dir or let ocr_ray.state.lineage skip completed
    partitions). ``partition_output=True`` writes hive-partitioned by a
    conv_id hash prefix (the brief's one-directory-per-key-range layout:
    a failed downstream consumer can skip finished key ranges)."""
    spans = extract_spans(read_turns(turns_path), batch_size=batch_size)
    if mode == "sorted":
        spans = reconcile_sorted(spans)
    else:
        spans = reconcile(spans, salted=(mode == "salted"))
    if out_dir is not None:
        if partition_output:
            def add_part(t: pa.Table) -> pa.Table:
                import pandas as pd_

                h = pd_.util.hash_array(
                    t.column("conv_id").to_numpy(zero_copy_only=False),
                    categorize=False,
                )
                return t.append_column(
                    "conv_bucket", pa.array((h % 16).astype("int64"))
                )

            spans.map_batches(add_part, batch_format="pyarrow").write_parquet(
                out_dir, partition_cols=["conv_bucket"]
            )
        else:
            spans.write_parquet(out_dir)
    return spans
