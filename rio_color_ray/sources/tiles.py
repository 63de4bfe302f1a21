"""Deterministic raster-tile table (FIXTURES.md F2).

The analog of the reference's GeoTIFF fixtures (rgb8/rgba8/rgb16 with
32x32 internal tiles, /root/reference/tests/, asserted shape (3,32,32) in
tests/test_workers.py:15). Pixel buffers are band-major C-order, one row
per tile, seeded per tile_id so generation is reproducible and
order-independent.
"""

import numpy as np
import pyarrow as pa

VARIANTS = {
    "rgb8": (3, "uint8"),
    "rgba8": (4, "uint8"),
    "rgb16": (3, "uint16"),
}


def make_tiles_table(variant="rgb8", n_tiles=200, size=32, z=9, seed=42):
    """A pyarrow Table of synthetic tiles of one variant.

    Columns: tile_id, z, x, y, band_count, dtype, width, height, pixels.
    Each tile's pixels are seeded by (seed, z, x, y) so any subset of tiles
    regenerates identically regardless of partitioning.
    """
    bands, dtype = VARIANTS[variant]
    info = np.iinfo(dtype)
    rows = {k: [] for k in ("tile_id", "z", "x", "y", "band_count", "dtype", "width", "height", "pixels")}
    side = int(np.ceil(np.sqrt(n_tiles)))
    for t in range(n_tiles):
        x, y = 100 + t % side, 200 + t // side
        rng = np.random.default_rng([seed, z, x, y])
        px = rng.integers(0, info.max + 1, size=(bands, size, size), dtype=dtype)
        if bands == 4:
            # alpha band: blocky 0/max pattern like the reference rgba fixture
            px[3] = np.where(rng.random((size, size)) < 0.3, 0, info.max)
        rows["tile_id"].append(f"{z}/{x}/{y}")
        rows["z"].append(z)
        rows["x"].append(x)
        rows["y"].append(y)
        rows["band_count"].append(bands)
        rows["dtype"].append(dtype)
        rows["width"].append(size)
        rows["height"].append(size)
        rows["pixels"].append(px.tobytes())
    return pa.table(
        {
            "tile_id": pa.array(rows["tile_id"], pa.string()),
            "z": pa.array(rows["z"], pa.int32()),
            "x": pa.array(rows["x"], pa.int32()),
            "y": pa.array(rows["y"], pa.int32()),
            "band_count": pa.array(rows["band_count"], pa.uint8()),
            "dtype": pa.array(rows["dtype"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "pixels": pa.array(rows["pixels"], pa.binary()),
        }
    )


def decode_tile(pixels: bytes, band_count: int, dtype: str, width: int, height: int):
    """pixels binary -> (bands, h, w) ndarray view (zero-copy)."""
    return np.frombuffer(pixels, dtype=dtype).reshape(band_count, height, width)
