"""Tile materialization + the rio-color correction stage.

cell-level point density -> web-mercator raster tiles (the engine's analog
of the reference GeoTIFF: 32x32 uint8 band-major buffers in a binary
column) -> stateful ColorStage actor pool applying a DSL program.

Shuffle discipline:
* stage 1 (map_batches): per-batch PARTIAL pixel histograms
  (tile_key, pix, n) — reduces the corpus to at most
  active-pixels-per-tile rows per batch before any exchange.
* stage 2 (groupby): partials are hash-bucketed by ``tile_key %
  N_TILE_BUCKETS`` and each bucket is assembled in ONE vectorized call
  (np.add.at scatter over a (tiles, 1024) matrix) — constant group
  count, so per-group Python overhead is O(buckets), not O(tiles).
  At cluster scale, raise N_TILE_BUCKETS with the node count.

Tile identity is the (z, x, y) triple — never row order.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from ..spatial import mercator_tile, tile_pixel
from ..stages.color_stage import ColorStage

TILE_SIZE = 32
DEFAULT_ZOOM = 7
DEFAULT_OPS = "gamma rgb 1.2, sigmoidal rgb 6 0.25, saturation 1.1"
N_TILE_BUCKETS = 64


def _tile_key(z, xt, yt):
    return (
        (np.int64(z) << np.int64(44))
        | (xt.astype(np.int64) << np.int64(22))
        | yt.astype(np.int64)
    )


def _partial_pixel_counts(z):
    def fn(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        xt, yt = mercator_tile(lat, lon, z)
        row, col = tile_pixel(lat, lon, z, xt, yt, TILE_SIZE)
        key = _tile_key(z, xt, yt)
        pix = row.astype(np.int64) * TILE_SIZE + col.astype(np.int64)
        combo = key * (TILE_SIZE * TILE_SIZE) + pix
        uniq, counts = np.unique(combo, return_counts=True)
        tile_key = uniq // (TILE_SIZE * TILE_SIZE)
        return pa.table(
            {
                "tile_key": pa.array(tile_key, pa.int64()),
                "bucket": pa.array(tile_key % N_TILE_BUCKETS, pa.int64()),
                "pix": pa.array(uniq % (TILE_SIZE * TILE_SIZE), pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return fn


def _assemble_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """All tiles of one hash bucket, assembled vectorized."""
    tk = group["tile_key"].to_numpy()
    pix = group["pix"].to_numpy()
    n = group["n"].to_numpy()
    uniq, inv = np.unique(tk, return_inverse=True)
    counts = np.zeros((len(uniq), TILE_SIZE * TILE_SIZE), dtype=np.int64)
    np.add.at(counts, (inv, pix), n)  # partials may repeat (tile, pix)
    counts = counts.reshape(len(uniq), TILE_SIZE, TILE_SIZE)

    # integer-deterministic banding: log-density, occupancy mask, density%256
    b0 = np.clip(np.round(32.0 * np.log2(1.0 + counts)), 0, 255).astype(np.uint8)
    b1 = np.where(counts > 0, 255, 0).astype(np.uint8)
    b2 = (counts % 256).astype(np.uint8)
    px = np.stack([b0, b1, b2], axis=1)  # (tiles, 3, h, w)

    z = (uniq >> 44).astype(np.int32)
    xt = ((uniq >> 22) & ((1 << 22) - 1)).astype(np.int32)
    yt = (uniq & ((1 << 22) - 1)).astype(np.int32)
    return pd.DataFrame(
        {
            "tile_id": [f"{a}/{b}/{c}" for a, b, c in zip(z, xt, yt)],
            "z": z,
            "x": xt,
            "y": yt,
            "band_count": np.full(len(uniq), 3, dtype=np.uint8),
            "dtype": "uint8",
            "width": np.full(len(uniq), TILE_SIZE, dtype=np.int32),
            "height": np.full(len(uniq), TILE_SIZE, dtype=np.int32),
            "pixels": [px[i].tobytes() for i in range(len(uniq))],
        }
    )


def render_tiles_from(points_ds, z=DEFAULT_ZOOM):
    """Any Dataset with lat/lon columns -> raster tiles at zoom z."""
    partial = points_ds.map_batches(_partial_pixel_counts(z), batch_format="pyarrow")
    return partial.groupby("bucket").map_groups(_assemble_bucket, batch_format="pandas")


def render_tiles(sf_dir, z=DEFAULT_ZOOM, replicate=1):
    """Point corpus -> raster tiles at zoom z."""
    from .geo import cellified

    pts = cellified(sf_dir, keep_columns=["lat", "lon"], replicate=replicate)
    return render_tiles_from(pts, z)


def color_tiles(sf_dir, ops=DEFAULT_OPS, z=DEFAULT_ZOOM, concurrency=4, replicate=1):
    """The flagship tail: rendered tiles through the ColorStage actor pool."""
    from ..color import parse_operations

    parse_operations(ops)  # fail fast BEFORE launching work (cf. cli.py:95-98)
    tiles = render_tiles(sf_dir, z, replicate=replicate)
    return tiles.map_batches(
        ColorStage,
        fn_constructor_args=(ops,),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=64,
    )
