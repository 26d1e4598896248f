"""Training-side replay of the reference's train.py surface (SURVEY.md
§2.9 T1-T8, §3.2-§3.3) — the one reference entry point the engine had not
replayed (VERDICT r3, "What's missing" #1).

Domain mapping (SURVEY.md §1.2): image -> turn payload, pixel -> char
position, GT polygon -> content-block interval, batch -> group of payloads.
The reference trains real TF models; this container has no TF (and the
engine is a data-processing engine, not a trainer), so the MODEL OUTPUTS
are deterministic: the class prediction is the engine's real unit scorer
(A1, ocr_ray.extract.score_units) and the geometry/angle predictions are
the GT jittered by a splitmix64-derived offset per block — the loss
*semantics* (dice + IoU + angle, CTC-NLL analog, THETA mixing, LOSS_STEP
averaging, best-loss checkpointing) are replayed op-for-op:

- T4 ``generate_rbox``  -> :func:`gt_label_blocks`    (DataGen.py:231-292)
- T5 ``detect_loss``    -> dice/IoU partials          (Module/DetectLoss.py:4-52)
- T6 ``recognition_loss`` -> per-box confidence NLL   (Module/RecognitionLoss.py:14-30)
- T7 ``WarmUpLR``       -> :func:`lr_schedule`        (Module/WarmupLR.py:7-26)
- T8 training loop      -> :func:`train_loss_curve` / :func:`train_checkpoints`
                                                       (train.py:62-139)
- T1/T3/O4/O6/F13 data build -> :func:`build_training_examples` /
  :func:`assemble_batches`                             (DataGen.py:133-228,382-580)

Float parity notes (the oracle twins in __ray_entry__ hash-compare doubles
bit-for-bit):

- every transcendental goes through glibc ``math.log`` / ``math.cos`` —
  DuckDB's ``ln``/``cos`` are bit-identical to glibc, while numpy's SIMD
  ``np.log`` drifts 1 ulp near 1.0 (measured);
- every cross-term float sum is accumulated SEQUENTIALLY in a defined
  order (block order within an image, rank order within a batch/window),
  because neither ``np.sum`` nor ``np.add.reduceat`` is sequential
  (pairwise/unrolled — measured), and the SQL twins use
  ``sum(x ORDER BY k)`` which is;
- integer label geometry (areas, strided counts, geo sums) stays int64
  end-to-end.

Scale shape: the payload-heavy label/loss kernel is one streaming
actor-pool ``map_batches`` pass; everything after it operates on tiny
per-image partial rows (one row per payload). The O5 shuffle is a hash
ordering (no random state), the global batch rank is ONE sort of the
small rows + an O(blocks) driver offset walk (the reconcile_sorted
pattern, extract.py:308), and the running best-loss checkpoint scan
carries one (min) scalar across sorted blocks — O(blocks) driver state at
any corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .. import config as C
from ..extract import score_units
from ..segment import Unit, segment
from ..textnorm import encode_token, normalize_text

__all__ = [
    "lr_schedule",
    "gt_label_blocks",
    "image_loss_partials",
    "train_loss_curve",
    "train_checkpoints",
    "build_training_examples",
    "assemble_batches",
]

# --- reference constants ----------------------------------------------------
TRAIN_BATCH_SIZE = 1      # reference config.py:5 (BATCH_SIZE)
LOSS_STEP = 20            # train.py:23
BEST_LOSS_INIT = 1000.0   # train.py:22
THETA = 0.01              # train.py:17 (recognition-loss weight)
MAX_BOX_NUM = 64          # DataGen.py:402
MAX_BOX_WIDTH = 384       # DataGen.py:403
LABEL_STRIDE = 4          # DataGen.py:489-492 (score/geo/mask maps [::4])
DICE_EPS = 1e-5           # DetectLoss.py:13
GEO_EPS = 1e-10           # DetectLoss.py:48 (-log(IOU + 1e-10))
REG_EPS = 1e-10           # NLL clamp for zero-confidence boxes
SHRINK_NUM, SHRINK_DEN = 3, 10  # shrink_poly R=0.3 (DataGen.py:104-130), 1-D analog
INPUT_SIZE = 512          # DataGen.py:382 (INPUT_SIZE)
RANDOM_SCALES = (0.5, 0.6, 0.8, 0.85, 0.9, 0.95, 1.0, 1.1, 1.2, 1.4,
                 1.6, 2.0, 3.0, 4.0)  # DataGen.py:383

# WarmUpLR(final_LR=1e-4, d_model=128, warmup_steps=800, warm_time=3)
# (train.py:77); constants materialized once so the SQL twin can embed
# their exact repr()s
FINAL_LR = 0.0001
WARM_TIME = 3
LR_RSQRT_D = 1.0 / math.sqrt(128.0)
LR_WARM_FACTOR = 800.0 ** -1.5

_G = np.uint64(0x9E3779B97F4A7C15)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 — the engine's deterministic
    "randomness" for jitter/shuffle; replayed in SQL by the HUGEINT chain
    (__ray_entry__ training oracles)."""
    v = v + _G
    v ^= v >> np.uint64(30)
    v *= _C1
    v ^= v >> np.uint64(27)
    v *= _C2
    v ^= v >> np.uint64(31)
    return v


def _mix64_int(v: int) -> int:
    with np.errstate(over="ignore"):
        return int(_mix64(np.uint64(v & 0xFFFFFFFFFFFFFFFF)))


def _stride_count(a: int, b: int, stride: int = LABEL_STRIDE) -> int:
    """#{p in [a, b): p % stride == 0} — the [::4] map-downsample analog."""
    if b <= a:
        return 0
    return (b + stride - 1) // stride - (a + stride - 1) // stride


# --- blocks: the GT polygons of a payload ------------------------------------


class _Block:
    __slots__ = ("idx", "gs", "ge", "ignore", "units", "scores")

    def __init__(self, idx: int, gs: int, ge: int) -> None:
        self.idx = idx
        self.gs = gs
        self.ge = ge
        self.ignore = True
        self.units: list[Unit] = []
        self.scores: list[float] = []


def _blocks_of(units: list[Unit], scores: np.ndarray) -> list["_Block"]:
    """Group consecutive units by enclosing block extent — one _Block per
    GT polygon (annotation-parse analog, DataGen.py:44-87). A block is
    ignore-tagged when EVERY unit in it is (the reference tags whole
    polys; units inherit the poly tag)."""
    blocks: list[_Block] = []
    cur: _Block | None = None
    for i, u in enumerate(units):
        if cur is None or (u.geo_start, u.geo_end) != (cur.gs, cur.ge):
            cur = _Block(len(blocks), u.geo_start, u.geo_end)
            blocks.append(cur)
        cur.units.append(u)
        cur.scores.append(float(scores[i]))
        if not u.ignore:
            cur.ignore = False
    return blocks


# --- T7: WarmUpLR schedule ----------------------------------------------------


def lr_schedule(n_steps: int = 801) -> rd.Dataset:
    """(step, lr) table of the reference WarmUpLR (Module/WarmupLR.py:16-26)
    with train.py:77's constants — including the reference's dead second
    branch (``step < final_LR - 20`` compares the step to 1e-4 - 20 < 0, so
    every post-warmup step lands in the else: lr = final_LR * 0.1). step 0
    replays tf rsqrt(0)=inf -> min(inf, 0)=0."""

    def fmt(t: pa.Table) -> pa.Table:
        step = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        s = step.astype(np.float64)
        with np.errstate(divide="ignore"):
            arg1 = np.where(step > 0, 1.0 / np.sqrt(s), np.inf)
        arg2 = s * LR_WARM_FACTOR
        warm = LR_RSQRT_D * np.minimum(arg1, arg2)
        # dead branch kept for fidelity: (step >= WARM_TIME) & (s < FINAL_LR - 20)
        mid = (step >= WARM_TIME) & (s < (FINAL_LR - 20.0))
        lr = np.where(step < WARM_TIME, warm,
                      np.where(mid, FINAL_LR, FINAL_LR * 0.1))
        return pa.Table.from_pydict(
            {"step": pa.array(step, pa.int64()), "lr": pa.array(lr, pa.float64())}
        )

    return rd.range(n_steps).map_batches(fmt, batch_format="pyarrow")


# --- T4: generate_rbox analog -------------------------------------------------

_GT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("block_idx", pa.int64()),
     ("block_start", pa.int64()), ("block_end", pa.int64()),
     ("shrunk_start", pa.int64()), ("shrunk_end", pa.int64()),
     ("score_area", pa.int64()), ("trainable", pa.int64()),
     ("geo_left_sum", pa.int64()), ("geo_right_sum", pa.int64())]
)


def _gt_rows_for(doc_id: int, norm: str) -> list[tuple]:
    units = segment(norm)
    if not units:
        return []
    scores = score_units(units)
    rows = []
    for b in _blocks_of(units, scores):
        extent = b.ge - b.gs
        d = SHRINK_NUM * extent // SHRINK_DEN
        ss, se = b.gs + d, b.ge - d
        area = max(se - ss, 0)
        # training_mask: 0 for min-size violations and ignore-tagged polys
        # (DataGen.py:268-273); score_map is filled for EVERY poly
        trainable = int(extent >= C.MIN_TEXT_SIZE and not b.ignore)
        # per-pixel distances to the interval edges over the score area:
        # d_left(p) = p - gs, d_right(p) = ge - p (closed forms; the
        # reference rasterizes these per pixel, DataGen.py:281-291)
        if area > 0:
            a_off, b_off = d, extent - d
            left = (a_off + b_off - 1) * (b_off - a_off) // 2
            right = extent * (b_off - a_off) - left
        else:
            left = right = 0
        rows.append((doc_id, b.idx, b.gs, b.ge, ss, se, area, trainable,
                     left, right))
    return rows


class GtLabeler:
    """generate_rbox analog as an actor-pool stage: wrapped/plain turn
    batch in -> one GT label row per (payload, block). Integer geometry
    only — the SQL twin is exact."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("conv_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows: list[tuple] = []
        for cid, text in zip(ids, texts):
            if not text:
                continue
            rows.extend(_gt_rows_for(int(cid), normalize_text(text)))
        if not rows:
            return _GT_SCHEMA.empty_table()
        cols = list(zip(*rows))
        return pa.Table.from_arrays(
            [pa.array(c, t.type) for c, t in zip(cols, _GT_SCHEMA)],
            schema=_GT_SCHEMA,
        )


def gt_label_blocks(turns: rd.Dataset) -> rd.Dataset:
    """T4 over a turn-shaped Dataset whose conv_id is an int64-coercible
    doc key (the wrapped-documents path used by the graded query)."""
    return turns.map_batches(GtLabeler, batch_format="pyarrow",
                             concurrency=(1, 8))


# --- T5/T6: per-image loss partials -------------------------------------------

_PARTIAL_SCHEMA = pa.schema(
    [("doc_id", pa.int64()),
     ("lg_sum", pa.float64()),        # sum of L_g * strided score-area (trainable blocks)
     ("inter", pa.float64()),         # sum true*pred*mask over strided pixels
     ("u1", pa.int64()),              # sum true*mask (strided score area)
     ("u2", pa.float64()),            # sum pred*mask over strided unit pixels
     ("n_px4", pa.int64()),           # strided map size (payload length / 4)
     ("reg_sum", pa.float64()),       # sum of per-box confidence NLLs
     ("n_boxes", pa.int64())]         # recognition-eligible boxes (width <= 384)
)


def _image_partials(doc_id: int, norm: str) -> tuple | None:
    """One payload ("image") -> mergeable loss partials.

    Replays, over the stride-4 downsampled label maps (DataGen.py:489-492):
    dice pieces inter/u1/u2 (DetectLoss.py:14-17), the masked
    -log(IoU)+20*(1-cos dTheta) geometry sum (DetectLoss.py:36-51) with
    the GT jittered per block by splitmix64 (the deterministic "model
    error"), and the recognition-NLL partials over non-ignore boxes with
    the width<=384 cap (DataGen.py:403,509-527). Returns None when the
    payload has no non-ignore block — the reference drops such images from
    the stream entirely (DataGen.py:446-447,476-479)."""
    units = segment(norm)
    if not units:
        return None
    scores = score_units(units)
    blocks = _blocks_of(units, scores)
    if all(b.ignore for b in blocks):
        return None  # drop-unlabeled

    n_px4 = _stride_count(0, len(norm))
    lg_sum = 0.0
    inter = 0.0
    u1 = 0
    u2 = 0.0
    reg_sum = 0.0
    n_boxes = 0
    for b in blocks:
        extent = b.ge - b.gs
        d = SHRINK_NUM * extent // SHRINK_DEN
        ss, se = b.gs + d, b.ge - d
        trainable = extent >= C.MIN_TEXT_SIZE and not b.ignore
        if trainable:
            area4 = _stride_count(ss, se)
            # deterministic prediction jitter: pred box = GT expanded left
            # by j1 and right by j2 chars, pred angle = jt/10 - 0.3
            h = _mix64_int(doc_id * 65536 + b.idx)
            j1 = h % 4
            j2 = (h >> 2) % 4
            jt = (h >> 4) % 7
            # 1-D IoU of the per-pixel distance geometry (DetectLoss.py:36-46):
            # gt len = extent, pred len = extent + j1 + j2, inter = extent
            iou = (extent + 1.0) / (extent + float(j1 + j2) + 1.0)
            l_aabb = -math.log(iou + GEO_EPS)
            l_theta = 1.0 - math.cos(float(jt) * 0.1 - 0.3)
            l_g = l_aabb + 20.0 * l_theta
            lg_sum += l_g * float(area4)
            u1 += area4
            # pred map: per-unit constant score on the unit extent
            for u, s in zip(b.units, b.scores):
                ov = min(u.end, se) - max(u.start, ss)
                if ov > 0:
                    inter += s * float(_stride_count(max(u.start, ss),
                                                     min(u.end, se)))
                u2 += s * float(_stride_count(u.start, u.end))
        # recognition boxes: every NON-IGNORE poly (size-masked ones keep
        # their labels in the reference; only tag-ignored rows carry the
        # [-1] label that the assembly mask strips, DataGen.py:468-479)
        if not b.ignore and extent <= MAX_BOX_WIDTH:
            wsum = 0
            swsum = 0.0
            for u, s in zip(b.units, b.scores):
                ln = u.end - u.start
                swsum += s * float(ln)
                wsum += ln
            s_box = swsum / float(wsum) if wsum else 0.0
            reg_sum += -math.log(max(s_box, REG_EPS))
            n_boxes += 1
    return (doc_id, lg_sum, inter, u1, u2, n_px4, reg_sum, n_boxes)


class LossPartials:
    """Per-image loss-partial kernel as an actor-pool stage (the
    payload-heavy pass; everything downstream is per-image scalar rows)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("conv_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows: list[tuple] = []
        for cid, text in zip(ids, texts):
            if not text:
                continue
            row = _image_partials(int(cid), normalize_text(text))
            if row is not None:
                rows.append(row)
        if not rows:
            return _PARTIAL_SCHEMA.empty_table()
        cols = list(zip(*rows))
        return pa.Table.from_arrays(
            [pa.array(c, t.type) for c, t in zip(cols, _PARTIAL_SCHEMA)],
            schema=_PARTIAL_SCHEMA,
        )


def image_loss_partials(turns: rd.Dataset) -> rd.Dataset:
    return turns.map_batches(LossPartials, batch_format="pyarrow",
                             concurrency=(1, 8))


# --- shared sorted-block driver-carry scan --------------------------------------


def _sorted_carry_scan(
    ds: rd.Dataset,
    keys: list[str],
    block_stat,
    init,
    fold,
    apply_fn,
    nblocks: int | None = None,
) -> rd.Dataset:
    """The reconcile-sorted pattern (extract.py:308) as one shared kernel:
    materialize -> repartition(nblocks) -> sort(keys); each sorted block
    emits ONE summary row (its first-row key tuple + ``block_stat(t)``);
    the driver folds stats sequentially in key order, recording
    ``carry_in[block] = state BEFORE the block``; a second per-block pass
    applies ``apply_fn(block, carry_in)`` (``carry=None`` for empty
    blocks). O(blocks) driver state at any corpus size. Block-first key
    tuples are unique because callers' key sets are unique per row and the
    range partitioner keeps equal keys together."""
    if nblocks is None:
        nblocks = (
            int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        )
    sorted_ds = ds.materialize().repartition(nblocks).sort(keys).materialize()

    def summarize(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {**{k: pd.Series([], dtype="int64") for k in keys},
                 "stat": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {**{k: [int(t.column(k)[0].as_py())] for k in keys},
             "stat": pd.Series([block_stat(t)], dtype=object)}
        )

    summ = (
        sorted_ds.map_batches(summarize, batch_size=None, batch_format="pyarrow")
        .to_pandas()
        .sort_values(keys, kind="mergesort")
    )
    state = init
    carry_in: dict[tuple, object] = {}
    stats = summ["stat"].to_numpy()
    keycols = [summ[k].to_numpy(np.int64) for k in keys]
    for i in range(len(summ)):
        kt = tuple(int(c[i]) for c in keycols)
        carry_in[kt] = state
        state = fold(state, stats[i])
    cref = ray.put(carry_in)

    def apply_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return apply_fn(t, None)
        kt = tuple(int(t.column(k)[0].as_py()) for k in keys)
        return apply_fn(t, ray.get(cref)[kt])

    return sorted_ds.map_batches(apply_block, batch_size=None,
                                 batch_format="pyarrow")


# --- O5 shuffle + global batch rank -------------------------------------------


def _with_rank(ds: rd.Dataset, nblocks: int | None = None) -> rd.Dataset:
    """Global 0-based rank in splitmix64(doc_id) shuffle order — the O5
    epoch shuffle (DataGen.py:408-409) made deterministic and replayable
    (SQL: row_number() OVER (ORDER BY mix64(doc_id), doc_id)).

    ONE sort of the small per-image rows, then the shared
    :func:`_sorted_carry_scan` boundary-offset walk (carry = running row
    count before the block)."""

    def add_h(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = _mix64(ids.view(np.uint64))
        # uint64 order-preserving signed view so Ray's sort handles it
        h_ord = (h ^ np.uint64(1 << 63)).view(np.int64)
        return t.append_column("h_ord", pa.array(h_ord, pa.int64()))

    def apply_rank(t: pa.Table, off) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("rank", pa.array([], pa.int64()))
        r = int(off) + np.arange(t.num_rows, dtype=np.int64)
        return t.append_column("rank", pa.array(r, pa.int64()))

    return _sorted_carry_scan(
        ds.map_batches(add_h, batch_format="pyarrow"),
        ["h_ord", "doc_id"],
        block_stat=lambda t: t.num_rows,
        init=0,
        fold=lambda s, n: s + int(n),
        apply_fn=apply_rank,
        nblocks=nblocks,
    )


# --- T8: per-batch loss curve --------------------------------------------------

_CURVE_DTYPES = {"batch_id": "int64", "det_loss": "float64",
                 "reg_loss": "float64", "total_loss": "float64",
                 "n_boxes": "int64"}


def _batch_losses_from_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Partial rows of ONE batch (sorted by rank) -> one loss row.

    Op order replays DetectLoss.py:21-52 + train.py:99-123 exactly:
    dice = 1 - (2*inter / ((u1+u2) + 1e-5)); cls = dice * 0.01;
    det = mean(L_g*true*mask) + cls; reg = THETA * mean(per-box NLL);
    total = det + reg. Cross-image sums run sequentially in rank order."""
    df = df.sort_values("rank", kind="mergesort")
    lg = 0.0
    inter = 0.0
    u1 = 0
    u2 = 0.0
    npx = 0
    reg = 0.0
    nb = 0
    for row in df.itertuples(index=False):
        lg += row.lg_sum
        inter += row.inter
        u1 += int(row.u1)
        u2 += row.u2
        npx += int(row.n_px4)
        reg += row.reg_sum
        nb += int(row.n_boxes)
    union = (float(u1) + u2) + DICE_EPS
    dice = 1.0 - (2.0 * inter / union)
    cls = dice * 0.01
    det = (lg / float(npx)) + cls
    reg_loss = THETA * (reg / float(nb)) if nb > 0 else 0.0
    return pd.DataFrame(
        {"batch_id": [int(df["batch_id"].iloc[0])], "det_loss": [det],
         "reg_loss": [reg_loss], "total_loss": [det + reg_loss],
         "n_boxes": [nb]}
    )


def train_loss_curve(
    turns: rd.Dataset, batch_size: int = TRAIN_BATCH_SIZE
) -> rd.Dataset:
    """The train.py inner loop as data: one row per training batch with
    (det_loss, reg_loss, total_loss, n_boxes). Shuffle -> full batches
    only (the reference yields only complete batches, DataGen.py:498) ->
    per-batch loss."""
    parts = image_loss_partials(turns)
    ranked = _with_rank(parts)

    if batch_size == 1:
        # rank IS the batch id; fully vectorized scalar path (the faithful
        # default — reference config.py BATCH_SIZE = 1)
        def finish(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.schema(
                    [("batch_id", pa.int64()), ("det_loss", pa.float64()),
                     ("reg_loss", pa.float64()), ("total_loss", pa.float64()),
                     ("n_boxes", pa.int64())]
                ).empty_table()
            lg = t.column("lg_sum").to_numpy(zero_copy_only=False)
            inter = t.column("inter").to_numpy(zero_copy_only=False)
            u1 = t.column("u1").to_numpy(zero_copy_only=False).astype(np.float64)
            u2 = t.column("u2").to_numpy(zero_copy_only=False)
            npx = t.column("n_px4").to_numpy(zero_copy_only=False).astype(np.float64)
            reg = t.column("reg_sum").to_numpy(zero_copy_only=False)
            nb = t.column("n_boxes").to_numpy(zero_copy_only=False)
            union = (u1 + u2) + DICE_EPS
            dice = 1.0 - (2.0 * inter / union)
            det = (lg / npx) + dice * 0.01
            reg_loss = np.where(nb > 0, THETA * (reg / np.maximum(nb, 1)), 0.0)
            return pa.Table.from_pydict(
                {"batch_id": t.column("rank").combine_chunks(),
                 "det_loss": pa.array(det, pa.float64()),
                 "reg_loss": pa.array(reg_loss, pa.float64()),
                 "total_loss": pa.array(det + reg_loss, pa.float64()),
                 "n_boxes": pa.array(nb, pa.int64())}
            )

        return ranked.map_batches(finish, batch_format="pyarrow")

    # general path: group contiguous ranks into batches, drop the trailing
    # partial batch (DataGen.py:498 yields full batches only)
    total = ranked.count()
    keep = (total // batch_size) * batch_size

    def assign(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        m = r < keep
        t = t.filter(pa.array(m))
        bid = t.column("rank").to_numpy(zero_copy_only=False) // batch_size
        return t.append_column("batch_id", pa.array(bid, pa.int64()))

    from ..stages.partial_agg import pin_schema

    return (
        ranked.map_batches(assign, batch_format="pyarrow")
        .groupby("batch_id")
        .map_groups(_batch_losses_from_partials, batch_format="pandas")
        # pin: empty sort partitions pass through with their INPUT schema
        .map_batches(pin_schema(_CURVE_DTYPES), batch_format="pandas")
    )


# --- T8: LOSS_STEP eval windows + best-loss checkpoints -------------------------


def _eval_window(df: pd.DataFrame) -> pd.DataFrame:
    """One full LOSS_STEP window -> averaged losses (train.py:127-131).
    Sequential sums in batch_id order (matches SQL sum(x ORDER BY ...))."""
    if len(df) != LOSS_STEP:
        return pd.DataFrame(
            {"eval_idx": pd.Series([], dtype="int64"),
             "now_det": pd.Series([], dtype="float64"),
             "now_reg": pd.Series([], dtype="float64"),
             "now_total": pd.Series([], dtype="float64")}
        )
    df = df.sort_values("batch_id", kind="mergesort")
    d = 0.0
    r = 0.0
    tot = 0.0
    for row in df.itertuples(index=False):
        d += row.det_loss
        r += row.reg_loss
        tot += row.total_loss
    return pd.DataFrame(
        {"eval_idx": [int(df["batch_id"].iloc[0]) // LOSS_STEP],
         "now_det": [d / LOSS_STEP], "now_reg": [r / LOSS_STEP],
         "now_total": [tot / LOSS_STEP]}
    )


_EVAL_DTYPES = {"eval_idx": "int64", "now_det": "float64",
                "now_reg": "float64", "now_total": "float64"}


def train_checkpoints(curve: rd.Dataset,
                      nblocks: int | None = None) -> rd.Dataset:
    """Every-LOSS_STEP evaluation rows plus the best-loss checkpoint flag
    (train.py:127-135): is_best = now_total < running min of all previous
    now_totals (init BEST_LOSS=1000). The running min crosses sorted
    blocks via the shared :func:`_sorted_carry_scan` (carry = min of all
    previous blocks' now_totals); min is order-insensitive so the
    distributed scan is exact."""
    from ..stages.partial_agg import pin_schema

    def win(t: pa.Table) -> pa.Table:
        b = t.column("batch_id").to_numpy(zero_copy_only=False)
        return t.append_column("eval_idx", pa.array(b // LOSS_STEP, pa.int64()))

    evals = (
        curve.map_batches(win, batch_format="pyarrow")
        .groupby("eval_idx")
        .map_groups(_eval_window, batch_format="pandas")
        # empty sort partitions pass through map_groups with their INPUT
        # schema (Ray Data 2.49) — pin before the next shuffle
        .map_batches(pin_schema(_EVAL_DTYPES), batch_format="pandas")
    )

    def apply_flag(t: pa.Table, best_in) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("is_best", pa.array([], pa.int64()))
        v = t.column("now_total").to_numpy(zero_copy_only=False)
        prefix = np.minimum.accumulate(np.concatenate([[best_in], v]))[:-1]
        return t.append_column(
            "is_best", pa.array((v < prefix).astype(np.int64), pa.int64())
        )

    return _sorted_carry_scan(
        evals,
        ["eval_idx"],
        block_stat=lambda t: float(
            t.column("now_total").to_numpy(zero_copy_only=False).min()
        ),
        init=BEST_LOSS_INIT,
        fold=lambda s, mn: min(s, float(mn)),
        apply_fn=apply_flag,
        nblocks=nblocks,
    )


# --- T1/T3/O4/O6/F13: the data-build chain (DataGen.generator) -----------------
# Rows-only surface (pytest-pinned determinism + invariants); the
# randomized reference chain is replayed with hash-chain draws so the
# output is a pure function of (conv_id, turn_idx, text).


def _hash_stream(key: bytes):
    """Deterministic uint64 draw stream seeded from a byte key."""
    import hashlib

    seed = int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")
    state = seed

    def draw() -> int:
        nonlocal state
        state = _mix64_int(state ^ 0xD1B54A32D192ED03)
        return state

    return draw


_LOWER = str.maketrans(
    {c: c.lower() for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"}
)
_SHIFT1 = str.maketrans(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "bcdefghijklmnopqrstuvwxyzaBCDEFGHIJKLMNOPQRSTUVWXYZA",
)
_VOWEL_ROT = str.maketrans("aeiouAEIOU", "eiouaEIOUA")


def augment_payload(text: str, draw) -> str:
    """img_aug analog (T1, DataGen.py:133-170): the same five gated stages
    with POSITION-PRESERVING char transforms (the reference's pixel-value
    ops never move pixels, so GT offsets survive unchanged):

    blur -> lowercase fold; additive noise -> cyclic letter shift;
    channel shuffle -> vowel rotation; JPEG recompress(quality q) ->
    every (q+1)-th char degraded to '~'; Distort -> adjacent in-word char
    swaps; invert(255 - img) -> swapcase.

    Gating replays the reference EXACTLY, including its nested-threshold
    shape: ONE draw drives the first four stages (``if ratio<0.1`` /
    ``if <0.2`` / ``if <0.3`` / ``elif <0.4`` — small ratios CO-FIRE
    blur+noise+shuffle, and JPEG is mutually exclusive with channel
    shuffle only; DataGen.py:134-158), then Distort and invert each
    consume an independent fresh draw (DataGen.py:160-169)."""
    ratio = (draw() % 10000) / 10000.0
    if ratio < 0.1:
        text = text.translate(_LOWER)
    if ratio < 0.2:
        text = text.translate(_SHIFT1)
    if ratio < 0.3:
        text = text.translate(_VOWEL_ROT)
    elif ratio < 0.4:
        q = draw() % 20 + 1
        chars = list(text)
        for p in range(0, len(chars), q + 1):
            if not chars[p].isspace():
                chars[p] = "~"
        text = "".join(chars)
    if (draw() % 10000) / 10000.0 < 0.3:
        chars = list(text)
        for p in range(0, len(chars) - 1, 2):
            a, b = chars[p], chars[p + 1]
            if not a.isspace() and not b.isspace():
                chars[p], chars[p + 1] = b, a
        text = "".join(chars)
    if (draw() % 10000) / 10000.0 < 0.5:
        text = text.swapcase()
    return text


def crop_payload(
    text: str, blocks: list[tuple[int, int]], draw, max_tries: int = 50
) -> tuple[str, list[int], int, int]:
    """crop_area 1-D replay (T3, DataGen.py:173-228): pad the axis by
    n//10, mark positions covered by any GT block, rejection-sample two
    free coordinates (up to max_tries), require the crop >= 0.1*n, keep
    only blocks FULLY inside, shift offsets. Returns (cropped_text,
    kept_block_indices, xmin, xmax_inclusive); the whole payload when no
    free axis exists or every try fails (reference returns the uncropped
    image in both cases)."""
    n = len(text)
    pad = n // 10
    covered = np.zeros(n + 2 * pad, dtype=bool)
    for gs, ge in blocks:
        covered[gs + pad:ge + pad] = True
    free = np.nonzero(~covered)[0]
    if len(free) == 0:
        return text, list(range(len(blocks))), 0, n - 1
    for _ in range(max_tries):
        x1 = int(free[draw() % len(free)])
        x2 = int(free[draw() % len(free)])
        xmin = max(0, min(n - 1, min(x1, x2) - pad))
        xmax = max(0, min(n - 1, max(x1, x2) - pad))
        if xmax - xmin < 0.1 * n:
            continue
        kept = [i for i, (gs, ge) in enumerate(blocks)
                if gs >= xmin and ge - 1 <= xmax]
        if not kept:
            continue  # crop_background=False path
        return text[xmin:xmax + 1], kept, xmin, xmax
    return text, list(range(len(blocks))), 0, n - 1


_EXAMPLE_SCHEMA = pa.schema(
    [("conv_id", pa.string()), ("turn_idx", pa.int32()),
     ("scale", pa.float64()), ("orig_len", pa.int64()),
     ("crop_start", pa.int64()), ("crop_len", pa.int64()),
     ("n_px", pa.int64()), ("n_blocks", pa.int64()), ("n_boxes", pa.int64()),
     ("box_starts", pa.list_(pa.int64())), ("box_ends", pa.list_(pa.int64())),
     ("box_widths", pa.list_(pa.int64())),
     ("labels", pa.list_(pa.list_(pa.int32())))]
)


class TrainingExampleBuilder:
    """Per-payload data-build chain (DataGen.generator, §3.3): parse GT ->
    validate -> random scale (O6) -> img_aug (T1) -> crop_area (T3) ->
    pad/cap to INPUT_SIZE (M3) -> labels (T4 inputs + M11 encode). Emits
    one example row per kept payload; payloads whose every block is
    ignore-tagged are dropped (DataGen.py:446-447,476-479)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        for cid, tix, text in zip(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            if not text:
                continue
            row = self._one(str(cid), int(tix), text)
            if row is not None:
                out.append(row)
        if not out:
            return _EXAMPLE_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=_EXAMPLE_SCHEMA)

    def _one(self, cid: str, tix: int, text: str) -> dict | None:
        norm = normalize_text(text)
        units = segment(norm)
        if not units:
            return None
        scores = score_units(units)
        blocks = _blocks_of(units, scores)
        draw = _hash_stream(f"{cid}\x00{tix}".encode())

        # O6: random scale pick; in the text domain upscaling is identity
        # and downscaling truncates with the ratio recorded (M2 semantics)
        scale = RANDOM_SCALES[draw() % len(RANDOM_SCALES)]
        eff = min(scale, 1.0)
        new_len = int(len(norm) * eff)
        norm = norm[:new_len]
        extents = [(b.gs, b.ge) for b in blocks if b.ge <= new_len]
        kept_blocks = [b for b in blocks if b.ge <= new_len]
        if not extents:
            return None

        norm = augment_payload(norm, draw)

        cropped, kept_idx, xmin, _ = crop_payload(norm, extents, draw)
        kept_blocks = [kept_blocks[i] for i in kept_idx]
        if all(b.ignore for b in kept_blocks):
            return None  # drop-unlabeled

        # M3: cap to INPUT_SIZE with the original length recorded; blocks
        # extending past the cap are dropped (pad-then-resize analog)
        orig_len = len(cropped)
        payload = cropped[:INPUT_SIZE]
        final_blocks = [
            b for b in kept_blocks if b.ge - xmin <= len(payload)
        ]
        if not final_blocks or all(b.ignore for b in final_blocks):
            return None

        starts: list[int] = []
        ends: list[int] = []
        widths: list[int] = []
        labels: list[list[int]] = []
        for b in final_blocks:
            if b.ignore:
                continue  # [-1]-label rows stripped by the assembly mask
            gs, ge = b.gs - xmin, b.ge - xmin
            width = ge - gs
            if width > MAX_BOX_WIDTH:
                continue  # DataGen.py:509-527 width filter
            # M11: label -> index encode with the silent unknown-char skip
            # (reference DataGen.py:28-45); spaces are outside CHAR_VECTOR
            # and drop out like DataGen.py:30
            enc = [C.CHAR_TO_INDEX[ch] for ch in encode_token(payload[gs:ge])]
            if not enc:
                continue
            starts.append(gs)
            ends.append(ge)
            widths.append(width)
            labels.append(enc)
        if not labels:
            return None
        return {
            "conv_id": cid, "turn_idx": tix, "scale": float(scale),
            "orig_len": orig_len, "crop_start": xmin, "crop_len": len(payload),
            "n_px": len(payload), "n_blocks": len(final_blocks),
            "n_boxes": len(labels), "box_starts": starts, "box_ends": ends,
            "box_widths": widths, "labels": labels,
        }


def build_training_examples(turns: rd.Dataset) -> rd.Dataset:
    return turns.map_batches(TrainingExampleBuilder, batch_format="pyarrow",
                             concurrency=(1, 8))


_BATCH_SCHEMA = pa.schema(
    [("batch_id", pa.int64()), ("n_images", pa.int64()),
     ("n_boxes", pa.int64()), ("n_boxes_capped", pa.int64()),
     ("sparse_indices_box", pa.list_(pa.int32())),
     ("sparse_indices_pos", pa.list_(pa.int32())),
     ("sparse_values", pa.list_(pa.int32())),
     ("dense_shape_0", pa.int64()), ("dense_shape_1", pa.int64())]
)


def _assemble_group(df: pd.DataFrame, batch_size: int) -> pd.DataFrame:
    """One full batch of example rows -> assembled batch row with the
    max_box_num cap (deterministic hash sample standing in for
    random.sample, DataGen.py:505-517) and the sparse label encoding
    (F13, DataGen.py:369-379) as Arrow list columns (COO triplet)."""
    if len(df) != batch_size:
        return pd.DataFrame({k: pd.Series([], dtype=v)
                             for k, v in _ASSEMBLE_DTYPES.items()})
    df = df.sort_values("rank", kind="mergesort")
    boxes: list[tuple[int, list[int]]] = []  # (image slot, label ids)
    for slot, row in enumerate(df.itertuples(index=False)):
        for lab in row.labels:
            boxes.append((slot, list(lab)))
    n_total = len(boxes)
    if n_total > MAX_BOX_NUM:
        bid = int(df["batch_id"].iloc[0])
        keyed = sorted(
            range(n_total),
            key=lambda i: _mix64_int(bid * 1048576 + i),
        )[:MAX_BOX_NUM]
        boxes = [boxes[i] for i in sorted(keyed)]
    sp_box: list[int] = []
    sp_pos: list[int] = []
    sp_val: list[int] = []
    max_len = 0
    for bi, (_, lab) in enumerate(boxes):
        max_len = max(max_len, len(lab))
        for p, v in enumerate(lab):
            sp_box.append(bi)
            sp_pos.append(p)
            sp_val.append(v)
    return pd.DataFrame(
        {"batch_id": [int(df["batch_id"].iloc[0])],
         "n_images": [len(df)], "n_boxes": [n_total],
         "n_boxes_capped": [len(boxes)],
         "sparse_indices_box": [sp_box], "sparse_indices_pos": [sp_pos],
         "sparse_values": [sp_val], "dense_shape_0": [len(boxes)],
         "dense_shape_1": [max_len]}
    )


_ASSEMBLE_DTYPES = {
    "batch_id": "int64", "n_images": "int64", "n_boxes": "int64",
    "n_boxes_capped": "int64", "sparse_indices_box": "object",
    "sparse_indices_pos": "object", "sparse_values": "object",
    "dense_shape_0": "int64", "dense_shape_1": "int64",
}


def assemble_batches(
    examples: rd.Dataset, batch_size: int = TRAIN_BATCH_SIZE
) -> rd.Dataset:
    """Shuffled full-batch assembly over example rows: hash-order rank
    (O5) -> batch_id = rank // batch_size -> per-batch caps + sparse
    labels. Only complete batches emit (DataGen.py:498)."""

    def key(t: pa.Table) -> pa.Table:
        # string conv keys -> stable int64 for the shuffle hash: ONE C
        # pass (pd.util.hash_array, process-stable — the add_hash_bucket
        # pattern) over the joined "conv\x00idx" key instead of a per-row
        # hashlib loop
        import pyarrow.compute as pc

        joined = pc.binary_join_element_wise(
            t.column("conv_id").cast(pa.string()),
            t.column("turn_idx").cast(pa.string()),
            "\x00",
        )
        h = pd.util.hash_array(
            joined.to_numpy(zero_copy_only=False), categorize=False
        )
        ids = (h >> np.uint64(1)).astype(np.int64)
        return t.append_column("doc_id", pa.array(ids, pa.int64()))

    ranked = _with_rank(examples.map_batches(key, batch_format="pyarrow"))
    total = ranked.count()
    keep = (total // batch_size) * batch_size

    def assign(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(r < keep))
        bid = t.column("rank").to_numpy(zero_copy_only=False) // batch_size
        return t.append_column("batch_id", pa.array(bid, pa.int64()))

    from ..stages.partial_agg import pin_schema

    return (
        ranked.map_batches(assign, batch_format="pyarrow")
        .groupby("batch_id")
        .map_groups(lambda df: _assemble_group(df, batch_size),
                    batch_format="pandas")
        # pin: empty sort partitions pass through with their INPUT schema
        .map_batches(pin_schema(_ASSEMBLE_DTYPES), batch_format="pandas")
    )
