"""Resumable, partitioned flagship execution.

Cell-range partitioning: partition p covers web-mercator tile-x range
``[p*2^z/K, (p+1)*2^z/K)`` at the render zoom z (K = n_parts). The id is
computable BOTH from a page's lon (before any expensive stage — so resume
filters the corpus at the source) and from a rendered tile's x column
(so the writer groups output rows consistently). Partition count is a
deployment knob: at cluster scale set K ≈ a few × node count so a lost
node forfeits only its in-flight cell ranges.

The writer is a ``groupby(part).map_groups`` stage: each group writes
``out_dir/part=<p>/data.parquet`` via tmp + ``os.replace`` (idempotent
under Ray task retries — a retried write simply replaces the same file),
THEN the lineage record, and returns the lineage row. Pending partitions
that yielded zero rows get an explicit empty lineage record afterwards so
resume does not re-run them forever.
"""

import os
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..spatial import mercator_tile
from .lineage import TMP_DIR, completed_partitions, now_ts, write_lineage_record


def _x_range(p, z, n_parts):
    nx = 1 << z
    return p * nx // n_parts, (p + 1) * nx // n_parts - 1


def partition_of_lonlat(lat, lon, z, n_parts):
    """Vectorized cell-range partition id from coordinates."""
    xt, _ = mercator_tile(np.asarray(lat, dtype=np.float64), np.asarray(lon, dtype=np.float64), z)
    return (xt.astype(np.int64) * n_parts) // (1 << z)


def _partition_of_tile_x(x, z, n_parts):
    return (np.asarray(x, dtype=np.int64) * n_parts) // (1 << z)


def _partition_writer(out_dir, stage, sort_col, cell_range_fn):
    """map_groups fn: write one partition's rows (tmp + atomic rename)
    THEN its lineage record; return the lineage row. The single
    idempotent-write protocol shared by every checkpointed output
    (``sort_col`` orders rows inside the file; ``cell_range_fn(p)`` maps
    the partition id to the lineage record's key range)."""

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        p = int(group["part"].iloc[0])
        rows_in = len(group)
        body = group.drop(columns=["part"]).sort_values(sort_col).reset_index(drop=True)
        part_dir = os.path.join(out_dir, f"part={p}")
        os.makedirs(part_dir, exist_ok=True)
        os.makedirs(os.path.join(out_dir, TMP_DIR), exist_ok=True)
        tmp = os.path.join(out_dir, TMP_DIR, f"dat-{p}-{uuid.uuid4().hex}.parquet")
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(part_dir, "data.parquet"))
        lo, hi = cell_range_fn(p)
        rec = {
            "partition_id": str(p),
            "cell_lo": int(lo),
            "cell_hi": int(hi),
            "rows_in": int(rows_in),
            "rows_out": int(len(body)),
            "stage": stage,
            "wall_s": round(time.time() - t0, 4),
            "checkpoint_ts": now_ts(),
        }
        write_lineage_record(out_dir, rec)
        return pd.DataFrame([rec])

    return write_group


def checkpointed_write(tiles_ds, out_dir, z, n_parts, stage="flagship"):
    """Tiles Dataset -> partitioned parquet + lineage; returns lineage rows.

    The groupby is the only exchange; each group's write is atomic and
    independently restartable.
    """

    def add_part(batch: pa.Table) -> pa.Table:
        part = _partition_of_tile_x(batch.column("x").to_numpy(), z, n_parts)
        return batch.append_column("part", pa.array(part, pa.int64()))

    lineage = (
        tiles_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part", num_partitions=n_parts)
        .map_groups(
            _partition_writer(
                out_dir, stage, "tile_id", lambda p: _x_range(p, z, n_parts)
            ),
            batch_format="pandas",
        )
    )
    return lineage.to_pandas()  # lineage is tiny (one row per partition)


def resumable_flagship(
    sf_dir,
    out_dir,
    n_parts=16,
    replicate=1,
    ops=None,
    z=None,
    concurrency=4,
    max_partitions=None,
):
    """Run (or resume) the flagship pipeline, checkpointing per cell range.

    ``max_partitions`` caps how many pending partitions this invocation
    processes — the test harness uses it to simulate a killed run.
    Returns a summary dict (counts + per-stage metrics).
    """
    from ..color import parse_operations
    from ..sources.polygons import make_admin_polygons
    from ..stages.pip_stage import PIPJoinStage
    from ..stages.statecache import make_stage_fn
    from ..pipelines.tiles import DEFAULT_OPS, DEFAULT_ZOOM, color_stage, render_tiles_from
    from ..pipelines.geo import cellified

    ops = ops or DEFAULT_OPS
    z = DEFAULT_ZOOM if z is None else z
    parse_operations(ops)  # validate before any work launches
    t_run = time.time()

    done = completed_partitions(out_dir)
    pending = [p for p in range(n_parts) if str(p) not in done]
    if max_partitions is not None:
        pending = pending[:max_partitions]
    if not pending:
        return {
            "completed_before": len(done),
            "written_now": 0,
            "n_parts": n_parts,
            "wall_s": 0.0,
        }
    pending_arr = pa.array(pending, pa.int64())

    def keep_pending(batch: pa.Table) -> pa.Table:
        part = partition_of_lonlat(
            batch.column("lat").to_numpy(), batch.column("lon").to_numpy(), z, n_parts
        )
        mask = pc.is_in(pa.array(part, pa.int64()), value_set=pending_arr)
        return batch.filter(mask)

    pts = cellified(sf_dir, keep_columns=["url", "lat", "lon"], replicate=replicate)
    pts = pts.map_batches(keep_pending, batch_format="pyarrow")
    joined = pts.map_batches(
        make_stage_fn(PIPJoinStage, make_admin_polygons(), "left"),
        batch_format="pyarrow",
    )
    tiles = render_tiles_from(joined, z)
    corrected = color_stage(tiles, ops, concurrency=concurrency)
    lineage = checkpointed_write(corrected, out_dir, z, n_parts)

    # pending cell ranges with zero tiles still need a completion record,
    # otherwise resume would retry them on every run
    wrote = set(lineage["partition_id"].astype(str)) if len(lineage) else set()
    for p in pending:
        if str(p) not in wrote:
            lo, hi = _x_range(p, z, n_parts)
            write_lineage_record(
                out_dir,
                {
                    "partition_id": str(p),
                    "cell_lo": int(lo),
                    "cell_hi": int(hi),
                    "rows_in": 0,
                    "rows_out": 0,
                    "stage": "flagship-empty",
                    "wall_s": 0.0,
                    "checkpoint_ts": now_ts(),
                },
            )
    return {
        "completed_before": len(done),
        "written_now": len(pending),
        "rows_out": int(lineage["rows_out"].sum()) if len(lineage) else 0,
        "n_parts": n_parts,
        "wall_s": round(time.time() - t_run, 3),
    }


def read_output(out_dir):
    """Completed partitions as one Dataset (only lineage-backed parts)."""
    done = completed_partitions(out_dir)
    paths = [
        os.path.join(out_dir, f"part={p}", "data.parquet")
        for p in sorted(done, key=int)
        if os.path.exists(os.path.join(out_dir, f"part={p}", "data.parquet"))
    ]
    if not paths:
        raise FileNotFoundError(f"no completed partitions under {out_dir}")
    ds = ray.data.read_parquet(paths)
    # the hive-style `part=<p>` dirs re-infer a `part` column on read;
    # drop it so the output schema equals the in-pipeline tiles schema
    if "part" in ds.schema().names:
        ds = ds.drop_columns(["part"])
    return ds


# --- resumable corpus curation ---------------------------------------------


def resumable_curate(sf_dir, out_dir, n_parts=16, max_partitions=None, **curate_kw):
    """Run (or resume) the corpus-curation funnel, checkpointed per
    CONTENT-HASH bucket.

    Partitioning by ``h64 % n_parts`` (not doc_id) makes resume exact:
    every dedup group lies wholly inside one bucket, so recomputing a
    pending bucket sees the same duplicate set as the original run —
    completed buckets can never change its output. The bucket filter is
    applied in the first map_batches (pipelines/curate.py), so completed
    buckets' documents are dropped before the dedup exchange.
    """
    from ..pipelines.curate import curate_corpus

    t_run = time.time()
    done = completed_partitions(out_dir)
    pending = [p for p in range(n_parts) if str(p) not in done]
    if max_partitions is not None:
        pending = pending[:max_partitions]
    if not pending:
        return {
            "completed_before": len(done),
            "written_now": 0,
            "n_parts": n_parts,
            "wall_s": 0.0,
        }

    ds = curate_corpus(sf_dir, parts=pending, n_parts=n_parts, **curate_kw)
    # cell_lo/cell_hi carry the content-hash bucket id (the lineage
    # schema's range fields; a hash bucket is a degenerate range)
    lineage = (
        ds.groupby("part", num_partitions=min(n_parts, len(pending)))
        .map_groups(
            _partition_writer(out_dir, "curate", "doc_id", lambda p: (p, p)),
            batch_format="pandas",
        )
        .to_pandas()  # tiny: one row per partition
    )
    wrote = set(lineage["partition_id"].astype(str)) if len(lineage) else set()
    for p in pending:
        if str(p) not in wrote:
            write_lineage_record(
                out_dir,
                {
                    "partition_id": str(p),
                    "cell_lo": p,
                    "cell_hi": p,
                    "rows_in": 0,
                    "rows_out": 0,
                    "stage": "curate-empty",
                    "wall_s": 0.0,
                    "checkpoint_ts": now_ts(),
                },
            )
    return {
        "completed_before": len(done),
        "written_now": len(pending),
        "rows_out": int(lineage["rows_out"].sum()) if len(lineage) else 0,
        "n_parts": n_parts,
        "wall_s": round(time.time() - t_run, 3),
    }
