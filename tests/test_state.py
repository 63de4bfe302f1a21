"""Checkpoint / resume / lineage (north_rule: resumable runs).

Simulated kill: a first invocation processes only 3 of 8 cell-range
partitions (``max_partitions=3``); the second invocation must complete
ONLY the remainder (the first 3 lineage records are untouched — byte
mtimes compared) and the union of partitions must equal a fresh
one-shot flagship run tile-for-tile.
"""

import os

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
N_PARTS = 8


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ckpt"))


def _lineage_mtimes(out_dir):
    d = os.path.join(out_dir, "_lineage")
    return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d) if f.endswith(".json")}


def test_kill_and_resume_matches_oneshot(ray_session, out_dir):
    from rio_color_ray.state import (
        completed_partitions,
        lineage_table,
        read_output,
        resumable_flagship,
    )
    from rio_color_ray.pipelines.flagship import flagship

    # "killed" run: only 3 partitions get checkpointed
    s1 = resumable_flagship(SF, out_dir, n_parts=N_PARTS, max_partitions=3)
    assert s1["written_now"] == 3 and s1["completed_before"] == 0
    assert len(completed_partitions(out_dir)) == 3
    mt_before = _lineage_mtimes(out_dir)

    # resume: completes the remaining 5, does not rewrite the first 3
    s2 = resumable_flagship(SF, out_dir, n_parts=N_PARTS)
    assert s2["completed_before"] == 3 and s2["written_now"] == N_PARTS - 3
    assert len(completed_partitions(out_dir)) == N_PARTS
    mt_after = _lineage_mtimes(out_dir)
    for name, mt in mt_before.items():
        assert mt_after[name] == mt, f"completed partition {name} was rewritten on resume"

    # a third run is a no-op
    s3 = resumable_flagship(SF, out_dir, n_parts=N_PARTS)
    assert s3["written_now"] == 0

    # resumed output == fresh one-shot flagship, tile-for-tile
    got = (
        read_output(out_dir)
        .to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    want = (
        flagship(SF)
        .to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want)

    # lineage metrics: full coverage of the tile-x keyspace, counts add up
    lin = lineage_table(out_dir).to_pandas()
    assert len(lin) == N_PARTS
    assert int(lin["rows_out"].sum()) == len(got)
    assert set(lin["stage"]) <= {"flagship", "flagship-empty"}
    spans = lin.sort_values("cell_lo")[["cell_lo", "cell_hi"]].to_numpy()
    assert spans[0][0] == 0
    for (lo, hi), (lo2, _) in zip(spans, spans[1:]):
        assert lo2 == hi + 1, "cell ranges must tile the keyspace exactly"


def test_lineage_record_atomic_and_validated(tmp_path):
    from rio_color_ray.state import completed_partitions, write_lineage_record

    out = str(tmp_path)
    with pytest.raises(ValueError):
        write_lineage_record(out, {"partition_id": "0"})
    rec = {
        "partition_id": "7",
        "cell_lo": 112,
        "cell_hi": 127,
        "rows_in": 5,
        "rows_out": 5,
        "stage": "flagship",
        "wall_s": 0.01,
        "checkpoint_ts": "2026-01-01T00:00:00.000000Z",
    }
    write_lineage_record(out, rec)
    assert completed_partitions(out) == {"7": rec}


def test_curate_kill_and_resume_matches_oneshot(ray_session, tmp_path):
    """Killed curation run (3 of 8 hash buckets) + resume == the oracle
    curate_corpus output row-for-row; completed buckets untouched."""
    from rio_color_ray.pipelines.curate import curate_corpus
    from rio_color_ray.state import completed_partitions, read_output, resumable_curate

    out_dir = str(tmp_path / "curate_ckpt")
    s1 = resumable_curate(SF, out_dir, n_parts=8, max_partitions=3)
    assert s1["written_now"] == 3 and s1["completed_before"] == 0
    mt_before = _lineage_mtimes(out_dir)

    s2 = resumable_curate(SF, out_dir, n_parts=8)
    assert s2["completed_before"] == 3 and s2["written_now"] == 5
    assert len(completed_partitions(out_dir)) == 8
    for name, mt in _lineage_mtimes(out_dir).items():
        if name in mt_before:
            assert mt == mt_before[name]

    s3 = resumable_curate(SF, out_dir, n_parts=8)
    assert s3["written_now"] == 0

    got = (
        read_output(out_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        curate_corpus(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want)
