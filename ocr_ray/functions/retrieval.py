"""Text retrieval over the documents table: exact BM25 top-k ranking and
boolean token search.

These are the query-side operators of a training-data curation stack
(rank a corpus against a probe query; select documents containing all
required tokens) — the same score -> rank -> filter chain the reference
applies per region (reference analog: ``DetectUtil.py:127-216``,
score-threshold + ordering), lifted to corpus level.

Scale shape:
- Corpus statistics (N, total token count, per-term document frequency)
  reduce through O(1)-rows-per-block partials; the driver folds O(blocks)
  rows — never the corpus.
- Term frequencies are computed by a vectorized Arrow kernel with NO
  per-row Python: texts are single-space tokenized, so doubling the
  separators and padding makes ``count_substring(padded, " term ")``
  an exact whole-token counter (consecutive duplicates included).
- Scoring is a stateless ``map_batches`` over broadcast scalar idf
  constants; top-k is a per-block partial cut followed by an
  O(blocks * k) driver merge. Nothing shuffles the raw corpus.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.partial_agg import contiguous_array, split_ws

from ..stages.partial_agg import from_pandas as _from_pandas

import ray.data as rd

K1 = 1.2
B = 0.75


def _padded(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """`" " + text.replace(" ", "  ") + " "` — every token gets dedicated
    surrounding spaces, so ``count_substring(padded, " t ")`` counts
    exact whole-token occurrences even for consecutive duplicates."""
    doubled = pc.replace_substring(col, pattern=" ", replacement="  ")
    return pc.binary_join_element_wise(pa.scalar(" "), doubled, pa.scalar(" "), "")


def _term_freqs(t: pa.Table, terms: list[str]) -> tuple[np.ndarray, list[np.ndarray]]:
    """(doc_len, [tf_term0, tf_term1, ...]) as int64 numpy arrays."""
    text = t.column("text")
    padded = _padded(text)
    nspace = pc.count_substring(text, " ").to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(text, "").to_numpy(zero_copy_only=False)
    dl = np.where(nonempty, nspace.astype(np.int64) + 1, 0)
    tfs = [
        pc.count_substring(padded, f" {term} ")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
        for term in terms
    ]
    return dl, tfs


def bm25_topk(docs: rd.Dataset, terms: list[str], k: int = 20) -> pd.DataFrame:
    """Exact BM25 (k1=1.2, b=0.75) top-k over ``docs`` for a fixed term
    list. Two passes: one O(blocks)-partial stats reduction, one scoring
    pass with per-block partial top-k. Scores are rounded to 6 decimals
    half-away-from-zero (DuckDB ``round``) for a deterministic cut.
    """
    stats_schema = pa.schema(
        [("n_docs", pa.int64()), ("sum_dl", pa.int64())]
        + [(f"df{i}", pa.int64()) for i in range(len(terms))]
    )

    def block_stats(t: pa.Table) -> pa.Table:
        dl, tfs = _term_freqs(t, terms)
        row = {"n_docs": [t.num_rows], "sum_dl": [int(dl.sum())]}
        for i, tf in enumerate(tfs):
            row[f"df{i}"] = [int((tf > 0).sum())]
        return pa.Table.from_pydict(row, schema=stats_schema)

    stats = (
        docs.map_batches(block_stats, batch_format="pyarrow")
        .to_pandas()  # O(blocks) rows
        .sum()
    )
    n_docs = int(stats["n_docs"])
    if n_docs == 0:
        # empty corpus: no stats, no scores — typed empty result
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    avgdl = float(stats["sum_dl"]) / n_docs
    # Scalar idf per term on the driver; same libm ln as the SQL twin.
    idf = [
        math.log((n_docs - int(stats[f"df{i}"]) + 0.5) / (int(stats[f"df{i}"]) + 0.5) + 1.0)
        for i in range(len(terms))
    ]

    out_schema = pa.schema([("doc_id", pa.int64()), ("score", pa.float64())])

    def score_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        dl, tfs = _term_freqs(t, terms)
        dlf = dl.astype(np.float64)
        # Mirrored term-for-term in the SQL twin: keep literal order/parens.
        norm = 0.25 + 0.75 * (dlf / avgdl)
        score = np.zeros(t.num_rows, dtype=np.float64)
        for i, tf in enumerate(tfs):
            tff = tf.astype(np.float64)
            score = score + idf[i] * ((tff * 2.2) / (tff + 1.2 * norm))
        # round half-away-from-zero to 6dp (DuckDB round())
        score6 = (
            pc.round(pa.array(score), ndigits=6, round_mode="half_towards_infinity")
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((t.column("doc_id").to_numpy(zero_copy_only=False), -score6))
        cut = order[:k]
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False)[cut],
                "score": score6[cut],
            },
            schema=out_schema,
        )

    part = docs.map_batches(score_block, batch_format="pyarrow").to_pandas()
    part = part.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return part.reset_index(drop=True)


def boolean_search(docs: rd.Dataset, required: list[str]) -> pd.DataFrame:
    """Boolean AND token search: documents containing ALL required
    tokens. Pure vectorized filter — no shuffle, no per-row Python."""

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())])

    def flt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        dl, tfs = _term_freqs(t, required)
        mask = np.ones(t.num_rows, dtype=bool)
        for tf in tfs:
            mask &= tf > 0
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False)[mask],
                "n_tokens": dl[mask],
            },
            schema=out_schema,
        )

    out = docs.map_batches(flt, batch_format="pyarrow").to_pandas()
    if out.empty:  # all-empty datasets lose their schema through to_pandas
        return out_schema.empty_table().to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def inverted_index(docs: rd.Dataset, min_df: int = 3) -> rd.Dataset:
    """Index-side of the retrieval stack: build the inverted index
    (term -> sorted posting list) that bm25_topk conceptually queries —
    per term its document frequency, total term frequency, and the
    comma-joined doc_id posting list in ascending order. Terms below
    ``min_df`` are cut (the head of a web-corpus vocabulary is huge and
    hapaxes dominate; the cut bounds the emitted index).

    Scale shape: documents never split across blocks, so the per-block
    (term, doc_id, tf) rows are already FINAL term frequencies — one
    term-hash bucket shuffle co-locates each term's postings, and each
    bucket builds its slice of the index in one sorted vectorized pass
    (posting strings via a C-level groupby join). Output is a Dataset
    partitionable by term range — at corpus scale this is the sharded
    index layout, not a driver structure."""
    from ..stages.partial_agg import add_hash_bucket

    def tf_rows(t: pa.Table) -> pa.Table:
        # fully vectorized tokenize+count: Arrow whitespace split (list
        # array), flatten with np.repeat parent ids, one C-level groupby.
        # Arrow emits '' tokens at string edges where Python .split()
        # emits nothing — the mask keeps the two tokenizations identical.
        # null text cells would flow NaN lengths into np.repeat (int64
        # underflow -> ValueError); treat them as empty documents
        text = pc.fill_null(contiguous_array(t.column("text")), "")
        toks = split_ws(pc.utf8_lower(text))
        flat = contiguous_array(pc.list_flatten(toks))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        # per-doc LOCAL row index (0..num_rows) — packable with the
        # dictionary code, unlike the raw int64 doc_id
        loc = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                        lens.astype(np.int64))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        kept = flat.filter(pa.array(keep))
        if len(kept) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        # dictionary-encode + packed np.unique (the token-entropy kernel
        # idiom): one C pass replaces the pandas string groupby that
        # dominated the index build at volume
        enc = kept.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        n_rows = np.int64(t.num_rows)
        u, c = np.unique(codes * n_rows + loc[keep], return_counts=True)
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "term": enc.dictionary.take(pa.array(u // n_rows)),
            "doc_id": pa.array(doc_ids[u % n_rows], pa.int64()),
            "tf": pa.array(c.astype(np.int64)),
        })

    bucketed = docs.map_batches(tf_rows, batch_format="pyarrow").map_batches(
        lambda t: add_hash_bucket(t, ["term"], 64), batch_format="pyarrow"
    )

    def build_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass: term runs via change mask, df/total_tf by
        # reduceat, the min_df cut BEFORE any posting string exists, and
        # posting lists via Arrow's C-level int->string cast +
        # binary_join on a run-offset ListArray (the pandas
        # astype(str) + ",".join groupby was ~all of the build wall
        # time at 24M posting rows)
        cols = {"term": "object", "df": "int64", "total_tf": "int64",
                "postings": "object"}
        if not len(g) or "term" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["term", "doc_id"], kind="mergesort")
        terms = g["term"].to_numpy()
        did = g["doc_id"].to_numpy(np.int64)
        tf = g["tf"].to_numpy(np.int64)
        new = np.r_[True, terms[1:] != terms[:-1]]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(g)))
        total = np.add.reduceat(tf, starts)
        keep = cnt >= min_df
        rows_keep = np.repeat(keep, cnt)
        cnt_k = cnt[keep]
        doc_str = pc.cast(pa.array(did[rows_keep]), pa.string())
        offsets = np.r_[0, np.cumsum(cnt_k)]
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int64()).cast(pa.int32()), doc_str
        )
        postings = pc.binary_join(la, ",").to_pandas().to_numpy()
        out = pd.DataFrame({
            "term": terms[starts][keep],
            "df": cnt_k.astype(np.int64),
            "total_tf": total[keep].astype(np.int64),
            "postings": postings,
        })
        return out[list(cols)].astype(cols)

    from ..stages.partial_agg import pin_schema

    norm = pin_schema({"term": "object", "df": "int64",
                       "total_tf": "int64", "postings": "object"})

    return (
        bucketed.groupby("bucket")
        .map_groups(build_bucket, batch_format="pandas")
        .map_batches(norm, batch_format="pandas")
    )
