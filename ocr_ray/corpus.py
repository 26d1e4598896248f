"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Generates the authoritative input table shape (BASELINE.json:input_hint):

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

Generation is seeded per conversation id — the table content is identical
regardless of how conv ids are batched across Ray blocks, with no wall
clock or unseeded randomness. Payload mix (plain / html / pdfish / edge)
per FIXTURES.md §1; a 1/997 fraction of conversations are
"mega-conversations" (~50x median turns) to exercise skewed-key handling.
"""

from __future__ import annotations

import datetime
import os
import random

import pyarrow as pa

from .config import PAYLOAD_HTML, PAYLOAD_PDFISH, PAYLOAD_PLAIN

__all__ = [
    "TURNS_SCHEMA",
    "gen_conversation",
    "turns_table_for_convs",
    "n_convs_for_sf",
    "transcripts_path",
    "ensure_transcripts",
]

SEED = 42
_EPOCH = datetime.datetime(2024, 1, 1)

TURNS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark group query row data slow filter customer line value "
    "agg column big a dup stage block shard plan vector token span index"
).split()

_TOOLS = ["search", "browser", "python", "calculator"]

_ROLES = ["user", "assistant", "tool"]

MEGA_EVERY = 997  # conv ids divisible by this are mega-conversations
MEGA_TURNS = 300


def _words(rng: random.Random, n: int) -> str:
    out = []
    while len(out) < n:
        w = rng.choice(_WORDS)
        out.append(w)
        # deterministic chance of an immediate repeat run (CTC-collapse food)
        if rng.random() < 0.15:
            out.append(w)
    return " ".join(out[:n])


def _plain(rng: random.Random) -> str:
    paras = []
    for _ in range(rng.randint(1, 3)):
        lines = [_words(rng, rng.randint(5, 12)) for _ in range(rng.randint(1, 4))]
        paras.append("\n".join(lines))
    return "\n\n".join(paras)


def _nav_links(rng: random.Random, n: int) -> str:
    return " ".join(
        f'<a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS)}</a>' for _ in range(n)
    )


def _html(rng: random.Random) -> str:
    parts = [f"<header>{_nav_links(rng, rng.randint(2, 5))}</header>"]
    if rng.random() < 0.7:
        parts.append(f"<nav>{_nav_links(rng, rng.randint(3, 6))}</nav>")
    parts.append("<main>")
    for _ in range(rng.randint(1, 3)):
        body = _words(rng, rng.randint(8, 25))
        if rng.random() < 0.4:
            body += f' <a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS)}</a> '
            body += _words(rng, rng.randint(3, 10))
        parts.append(f"<p>{body}</p>")
    parts.append("</main>")
    if rng.random() < 0.5:
        parts.append(f"<aside>{_nav_links(rng, rng.randint(2, 4))}</aside>")
    parts.append(f"<footer>{_nav_links(rng, 2)} copyright</footer>")
    return "\n".join(parts)


def _pdfish(rng: random.Random) -> str:
    lines = ["%PDF"]
    n_pages = rng.randint(1, 2)
    for page in range(n_pages):
        ys = [100 + 12 * i for i in range(rng.randint(2, 6))]
        # out-of-order emission exercises the decoder's (page, y, x) sort
        if rng.random() < 0.5:
            rng.shuffle(ys)
        for y in ys:
            lines.append(f"L {page} {y} {rng.randint(10, 40)} {_words(rng, rng.randint(3, 9))}")
    return "\n".join(lines)


def _edge(rng: random.Random) -> str:
    variant = rng.randint(0, 8)
    if variant == 6:  # comments + script/style boilerplate around content
        return (
            f"<!-- generated {rng.choice(_WORDS)} -->\n"
            f"<script>var x = '{_words(rng, 6)}';</script>\n"
            f"<style>.c {{ color: red }}</style>\n"
            f"<p>{_words(rng, 10)}</p>"
        )
    if variant == 7:  # html entities + self-closing tags in content
        return (
            f"<p>{_words(rng, 5)} &amp; {_words(rng, 3)}<br/>"
            f"&lt;tag&gt; &quot;{rng.choice(_WORDS)}&quot;</p>"
        )
    if variant == 8:  # unclosed script (payload truncated mid-block)
        return f"<p>{_words(rng, 8)}</p><script>var broken = "
    if variant == 0:
        return ""
    if variant == 1:  # BOM / zero-width laden (reference DataGen.py:59-62)
        return "﻿" + _words(rng, 8) + "‍​ " + _words(rng, 4)
    if variant == 2:  # ignore-tagged regions (reference DataGen.py:80-84)
        return "\n".join([_words(rng, 6), "*", "### skip this", _words(rng, 6)])
    if variant == 3:  # sub-threshold tiny content (degenerate filter)
        return rng.choice(_WORDS)[:3]
    if variant == 4:  # chars outside the alphabet (silent skip, DataGen.py:28-45)
        return _words(rng, 5) + " émoji🙂字 " + _words(rng, 5)
    # overlapping-ish nested blocks (NMS order-dependence)
    w = _words(rng, 10)
    return f"<div><p>{w}</p><p>{w}</p></div>"


def _payload(rng: random.Random, conv: int, turn: int) -> str:
    h = (conv * 31 + turn * 7) % 10
    if h < 4:
        return _plain(rng)
    if h < 7:
        return _html(rng)
    if h < 9:
        return _pdfish(rng)
    return _edge(rng)


def payload_kind_bucket(conv: int, turn: int) -> str:
    h = (conv * 31 + turn * 7) % 10
    if h < 4:
        return PAYLOAD_PLAIN
    if h < 7:
        return PAYLOAD_HTML
    if h < 9:
        return PAYLOAD_PDFISH
    return "edge"


def gen_conversation(conv: int, seed: int = SEED) -> list[dict]:
    """All turns of one conversation — seeded by (seed, conv) only."""
    rng = random.Random((seed << 32) ^ conv)
    if conv % MEGA_EVERY == 0:
        n_turns = MEGA_TURNS
    else:
        n_turns = rng.randint(2, 10)
    conv_id = f"conv-{conv:08d}"
    rows = []
    base = _EPOCH + datetime.timedelta(seconds=conv * 3600)
    for t in range(n_turns):
        role = _ROLES[t % 3] if rng.random() < 0.9 else rng.choice(_ROLES)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": _payload(rng, conv, t),
                "tool": rng.choice(_TOOLS) if role == "tool" else "",
                "ts": base + datetime.timedelta(seconds=30 * t),
            }
        )
    return rows


def turns_table_for_convs(convs: list[int], seed: int = SEED) -> pa.Table:
    rows: list[dict] = []
    for c in convs:
        rows.extend(gen_conversation(c, seed))
    return pa.Table.from_pylist(rows, schema=TURNS_SCHEMA)


def n_convs_for_sf(sf_dir: str) -> int:
    """Scale the corpus with the testdata SF (TESTDATA.md): ~1.5k turns at
    sf0.001, ~15k at sf0.01, ~150k at sf0.1."""
    name = os.path.basename(os.path.normpath(sf_dir))
    # "scaling" is the 4x corpus used only by bench.py --scaling: large
    # enough that fixed per-run overhead (worker spawn, sort barriers,
    # driver phases) is <10% of wall time at 32 CPUs
    table = {"sf0.001": 220, "sf0.01": 2200, "sf0.1": 22000, "scaling": 176000}
    return table.get(name, 220)


def transcripts_path(sf_dir: str) -> str:
    """Cache directory (a parquet dataset dir readable by read_parquet)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/ocr_ray_corpus/v2/{name}/turns"


def ensure_transcripts(sf_dir: str) -> str:
    """Generate (once, atomically: write to tmp dir + rename) and cache the
    transcript table for an SF dir. Large corpora fan out over
    conversation-id ranges with Ray Data when a session is available; the
    rows are identical either way because generation is seeded per conv id.
    """
    path = transcripts_path(sf_dir)
    if os.path.isdir(path):
        return path
    n = n_convs_for_sf(sf_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{os.getpid()}"
    import pyarrow.parquet as pq

    import ray

    if n > 2000 and ray.is_initialized():
        import ray.data as rd

        ds = rd.range(n).map_batches(
            lambda b: turns_table_for_convs([int(x) for x in b["id"].to_pylist()]),
            batch_format="pyarrow",
            batch_size=500,
        )
        ds.write_parquet(tmp)
    else:
        os.makedirs(tmp, exist_ok=True)
        table = turns_table_for_convs(list(range(n)))
        pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
    try:
        os.rename(tmp, path)
    except OSError:
        # a concurrent process won the race; use its output
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path
