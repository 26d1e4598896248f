"""Regression tests for the pyarrow 16.1 whitespace-splitter corruption
(phantom ``' '`` token) and the split_ws / contiguous_array mitigation.

Background (round 5): ``pc.utf8_split_whitespace`` intermittently
mis-splits the final whitespace run of a batch depending on allocator
state — ``'   '`` as the last string splits to ``['', ' ']`` — which
poisoned the DSIR model counts with a phantom md5 bucket roughly once
per seven pipeline runs. Every tokenizing kernel now routes through
``ocr_ray.stages.partial_agg.split_ws`` (the RE2 split kernel, which
also matches the SQL twins' string_split_regex exactly). These tests
replay the discovery harness: concat-of-table-slices batches (the shape
Ray Data hands fused map tasks) driven through every token kernel, in a
heated allocator pool, asserting brute-force token parity each time.
"""

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ROWS = [
    {"doc_id": 0, "text": "alpha beta beta gamma", "lang": "en"},
    {"doc_id": 1, "text": "alpha alpha delta", "lang": "en"},
    {"doc_id": 2, "text": "GAMMA delta delta epsilon", "lang": "fr"},
    {"doc_id": 3, "text": "zeta eta theta beta", "lang": "de"},
    {"doc_id": 4, "text": "", "lang": "en"},
    {"doc_id": 5, "text": "   ", "lang": "fr"},  # the trigger row
]


def _sliced_batches():
    """All ordered pairs of table slices, concatenated — multi-chunk
    batches whose chunks are non-zero-offset slices."""
    t6 = pa.Table.from_pylist(ROWS)
    slices = [t6.slice(i, j - i) for i in range(6) for j in range(i + 1, 7)]
    spans = [(i, j) for i in range(6) for j in range(i + 1, 7)]
    for (sa, pa_), (sb, pb) in itertools.permutations(zip(spans, slices), 2):
        yield sa, sb, pa.concat_tables([pa_, pb])


def _brute_tokens(span, lower=True):
    i, j = span
    out = []
    for r in ROWS[i:j]:
        t = r["text"].lower() if lower else r["text"]
        out.extend(x for x in t.split() if x)
    return out


def test_split_ws_no_phantom_tokens_heated_pool():
    from ocr_ray.stages.partial_agg import split_ws

    base = pa.array([r["text"] for r in ROWS])
    col = pa.concat_arrays([base.slice(1, 3), base.slice(5, 1)])
    for _ in range(500):  # heat the allocator — the original trigger
        toks = split_ws(pc.utf8_lower(pc.fill_null(col, "")))
        vals = pc.list_flatten(toks).to_pylist()
        assert not any(v.strip() == "" and v != "" for v in vals)
        kept = [v for v in vals if v]
        assert kept == ("alpha alpha delta gamma delta delta epsilon "
                        "zeta eta theta beta").split()


def test_token_kernels_on_sliced_concat_batches():
    from ocr_ray.functions.sampling import key_hash64
    from ocr_ray.functions.textstats import (
        _token_buckets,
        gopher_rules_batch,
        token_entropy_batch,
    )

    for rep in range(3):
        for sa, sb, batch in _sliced_batches():
            toks = _brute_tokens(sa) + _brute_tokens(sb)
            # md5 bucket stream (DSIR)
            row, b = _token_buckets(batch)
            got = sorted(b.tolist()) if len(row) else []
            exp = sorted(
                (key_hash64(toks) % np.uint64(256)).astype(int).tolist()
            ) if toks else []
            assert got == exp, (sa, sb)
            # entropy token counts
            ent = token_entropy_batch(batch).to_pandas()
            assert int(ent["n_tokens"].sum()) == len(toks), (sa, sb)
            # gopher word counts (raw-case tokens)
            raw = _brute_tokens(sa, lower=False) + _brute_tokens(sb, lower=False)
            g = gopher_rules_batch(batch).to_pandas()
            assert int(g["n_words"].sum()) == len(raw), (sa, sb)


def test_packing_chunker_on_sliced_concat_batches():
    """packing's literal split_pattern(' ') path over the same batch
    shapes: per-doc token counts must match the Python replay."""
    from ocr_ray.functions.packing import chunk_documents

    import ray.data as rd

    t6 = pa.Table.from_pylist(
        [{"doc_id": r["doc_id"], "text": r["text"]} for r in ROWS]
    )
    batch = pa.concat_tables([t6.slice(1, 4), t6.slice(5, 1)])
    got = chunk_documents(rd.from_arrow(batch), size=3, stride=3).to_pandas()
    for did in got["doc_id"].unique():
        text = ROWS[int(did)]["text"]
        n_tok = len(text.split(" "))  # literal-space split, like the op
        n_chunks = int((got["doc_id"] == did).sum())
        assert n_chunks == -(-n_tok // 3), (did, n_tok, n_chunks)
