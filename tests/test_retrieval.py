"""BM25 / boolean-search retrieval tests: brute-force reference scoring
plus tokenizer-kernel edge cases (the padded-substring whole-token count)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_ray.functions.retrieval import _term_freqs, bm25_topk, boolean_search

DOCS = [
    "scan scan merge",
    "window",
    "",
    "scan",
    "merge merge merge window scan",
    "nothing relevant here",
    "scan window scan window",
    "scansion merged windows",  # substrings must NOT count
]


def _ds(texts, blocks=3):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    return rd.from_pandas(df).repartition(blocks)


def test_term_freqs_whole_token_only():
    t = pa.Table.from_pydict({"text": DOCS})
    dl, tfs = _term_freqs(t, ["scan", "merge", "window"])
    assert dl.tolist() == [3, 1, 0, 1, 5, 3, 4, 3]
    assert tfs[0].tolist() == [2, 0, 0, 1, 1, 0, 2, 0]  # scansion not counted
    assert tfs[1].tolist() == [1, 0, 0, 0, 3, 0, 0, 0]  # merged not counted
    assert tfs[2].tolist() == [0, 1, 0, 0, 1, 0, 2, 0]  # windows not counted


def _brute_bm25(texts, terms, k):
    toks = [t.split(" ") if t else [] for t in texts]
    n = len(texts)
    avgdl = sum(len(tk) for tk in toks) / n
    rows = []
    for i, tk in enumerate(toks):
        dl = len(tk)
        score = 0.0
        for term in terms:
            tf = tk.count(term)
            df = sum(1 for other in toks if term in other)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            score += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        rows.append((i, round(score, 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_bm25_matches_brute_force(ray_session):
    out = bm25_topk(_ds(DOCS), ["scan", "merge", "window"], k=5)
    exp = _brute_bm25(DOCS, ["scan", "merge", "window"], 5)
    assert list(zip(out["doc_id"], out["score"])) == exp


def test_bm25_partial_topk_across_blocks(ray_session):
    # k larger than any single block's row count: driver merge must be exact
    out = bm25_topk(_ds(DOCS, blocks=8), ["scan"], k=6)
    exp = _brute_bm25(DOCS, ["scan"], 6)
    assert list(zip(out["doc_id"], out["score"])) == exp


def test_boolean_search_and_semantics(ray_session):
    out = boolean_search(_ds(DOCS), ["scan", "window"])
    # docs containing BOTH whole tokens: 4 and 6
    assert out["doc_id"].tolist() == [4, 6]
    assert out["n_tokens"].tolist() == [5, 4]


def test_boolean_search_no_match(ray_session):
    out = boolean_search(_ds(DOCS), ["scan", "absent"])
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_tokens"]
