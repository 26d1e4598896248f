"""Checkpoint/resume tests (FIXTURES.md §4): interrupted run resumes with
no duplicates and no gaps; completed partitions are skipped; semantics
changes invalidate checkpoints."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocr_ray.corpus import turns_table_for_convs
from ocr_ray.state.lineage import CheckpointedExtraction, operator_fingerprint


@pytest.fixture(scope="module")
def turns_dir(tmp_path_factory):
    """Input split into 3 partition files, one conversation straddling
    two files (the hard resume case)."""
    d = str(tmp_path_factory.mktemp("turns_parts"))
    table = turns_table_for_convs(list(range(12)))
    n = table.num_rows
    cuts = [0, n // 3 + 5, 2 * n // 3 - 7, n]  # deliberately uneven, conv-straddling
    for i in range(3):
        pq.write_table(table.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       os.path.join(d, f"f{i}.parquet"))
    return d


def _read_final(run) -> pd.DataFrame:
    return (
        pq.read_table(run.final_dir)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx", "span_idx"])
        .reset_index(drop=True)
    )


def test_resume_equals_uninterrupted(ray_session, turns_dir, tmp_path):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")

    # uninterrupted run
    run_a = CheckpointedExtraction(turns_dir, out_a)
    res = run_a.execute()
    assert not any(r.get("skipped") for r in res)
    df_a = _read_final(run_a)

    # interrupted run: extract only partition 0, "crash", then resume
    run_b = CheckpointedExtraction(turns_dir, out_b)
    run_b.extract_partition(run_b.partitions()[0])
    run_b2 = CheckpointedExtraction(turns_dir, out_b)  # fresh process analog
    res2 = run_b2.execute()
    skipped = [r for r in res2 if r.get("skipped")]
    assert len(skipped) == 1  # partition 0 was not recomputed
    df_b = _read_final(run_b2)

    pd.testing.assert_frame_equal(df_a, df_b)
    # no duplicates, no gaps
    assert not df_b.duplicated(["conv_id", "turn_idx", "span_idx"]).any()
    seq_ok = (
        df_b.sort_values(["conv_id", "turn_idx", "span_idx"])
        .groupby("conv_id")["span_seq"]
        .apply(lambda s: (s.to_numpy() == range(len(s))).all())
    )
    assert seq_ok.all()


def test_rerun_skips_everything(ray_session, turns_dir, tmp_path):
    out = str(tmp_path / "c")
    CheckpointedExtraction(turns_dir, out).execute()
    res = CheckpointedExtraction(turns_dir, out).execute()
    assert all(r.get("skipped") for r in res)


def test_lineage_records_schema(ray_session, turns_dir, tmp_path):
    out = str(tmp_path / "d")
    run = CheckpointedExtraction(turns_dir, out)
    run.execute()
    recs = sorted(os.listdir(run.lineage_dir))
    assert len(recs) == 4  # 3 extract partitions + reconcile
    with open(os.path.join(run.lineage_dir, recs[0])) as f:
        rec = json.load(f)
    assert rec["status"] == "complete"
    assert rec["operator_versions"]["extract"] == operator_fingerprint()
    assert rec["counters"]["turns_in"] > 0
    assert "input_fragments" in rec


def test_fingerprint_change_invalidates(ray_session, turns_dir, tmp_path):
    out = str(tmp_path / "e")
    run = CheckpointedExtraction(turns_dir, out)
    run.execute()
    # simulate a semantics change by corrupting the recorded fingerprint
    pid = f"extract-{run.partitions()[0].replace('.parquet', '')}"
    p = run._record_path(pid)
    with open(p) as f:
        rec = json.load(f)
    rec["operator_versions"]["extract"] = "stale"
    with open(p, "w") as f:
        json.dump(rec, f)
    res = CheckpointedExtraction(turns_dir, out).execute()
    recomputed = [r for r in res if not r.get("skipped")]
    assert len(recomputed) == 1  # exactly the invalidated partition
