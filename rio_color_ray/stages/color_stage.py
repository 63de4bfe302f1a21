"""ColorStage: the rio-color graft — stateful actor-pool tile stage.

``tiles.map_batches(ColorStage(ops, out_dtype), batch_format="pyarrow",
concurrency=N, batch_size=B)``. The ops program is parsed ONCE per actor
in ``__init__`` (the reference re-parses per window, workers.py:27 — pure
overhead we drop); per batch the tile pixel buffers are stacked into one
``(bands, n_tiles*h, w)`` float64 array and the whole program runs
vectorized across every tile at once. All color operators are strictly
elementwise per band (operations.py), so stacking tiles along rows is
semantically identical to the reference's per-window loop — asserted
against the single-tile oracle in tests.

Per-window equivalence chain (reference workers.py:21-31):
read -> to_math_type -> ops... -> scale_dtype(out_dtype).
"""

import numpy as np
import pyarrow as pa

from ..color import parse_operations, scale_dtype, to_math_type


def apply_ops_to_tiles(pixels_list, band_count, dtype, width, height, ops_funcs, out_dtype):
    """Apply a parsed ops program to a homogeneous list of tile buffers.

    Returns a list of output buffers (bytes) in input order. Vectorized:
    one stacked array for the whole group.
    """
    n = len(pixels_list)
    if n == 0:
        return []
    stacked = np.frombuffer(b"".join(pixels_list), dtype=dtype).reshape(
        n, band_count, height, width
    )
    # (n, b, h, w) -> (b, n*h, w): ops are per-band elementwise, so tiles
    # stacked along the row axis behave exactly like one tall window
    arr = to_math_type(np.ascontiguousarray(stacked.transpose(1, 0, 2, 3))).reshape(
        band_count, n * height, width
    )
    for fn in ops_funcs:
        arr = fn(arr)
    out = scale_dtype(arr, out_dtype)
    out = out.reshape(band_count, n, height, width).transpose(1, 0, 2, 3)
    out = np.ascontiguousarray(out)
    return [out[i].tobytes() for i in range(n)]


class ColorStage:
    """Callable actor class for ``map_batches``; one parse per actor."""

    def __init__(self, ops_string, out_dtype=None):
        self.ops_string = ops_string
        self.ops = parse_operations(ops_string)  # validates up front, like cli.py:95-98
        self.out_dtype = out_dtype  # None -> keep each tile's own dtype

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_count = batch.column("band_count").to_numpy()
        dtype = batch.column("dtype").to_pylist()
        width = batch.column("width").to_numpy()
        height = batch.column("height").to_numpy()
        pixels = batch.column("pixels").to_pylist()

        # group rows by homogeneous (bands, dtype, w, h) signature
        out_pixels = [None] * len(pixels)
        out_dt = [None] * len(pixels)
        sig_rows = {}
        for i, sig in enumerate(zip(band_count, dtype, width, height)):
            sig_rows.setdefault(sig, []).append(i)
        for (b, dt, w, h), rows in sig_rows.items():
            odt = self.out_dtype or dt
            bufs = apply_ops_to_tiles(
                [pixels[i] for i in rows], int(b), dt, int(w), int(h), self.ops, odt
            )
            for i, buf in zip(rows, bufs):
                out_pixels[i] = buf
                out_dt[i] = odt

        result = batch.set_column(
            batch.schema.get_field_index("pixels"), "pixels", pa.array(out_pixels, pa.binary())
        )
        result = result.set_column(
            result.schema.get_field_index("dtype"), "dtype", pa.array(out_dt, pa.string())
        )
        return result.append_column("ops", pa.array([self.ops_string] * len(pixels)))
