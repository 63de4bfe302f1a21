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

# Ops that are strictly per-band elementwise (operations.py): the output
# of each pixel-band depends only on that pixel-band's own value, so a
# leading run of them over quantized input is a pure function of the
# input code value. saturation mixes bands (LCH chroma) and is excluded;
# any op not on this list falls back to the direct math path.
_ELEMENTWISE_OPS = frozenset({"gamma", "sigmoidal"})


def _split_lut_prefix(ops_funcs):
    """Longest leading run of per-band elementwise ops, and the rest."""
    k = 0
    while k < len(ops_funcs) and getattr(ops_funcs[k], "__name__", "") in _ELEMENTWISE_OPS:
        k += 1
    return ops_funcs[:k], ops_funcs[k:]


# Ops that read only their own pixel's band tuple (all current ops:
# saturation mixes bands but never neighbors). The dictionary path is
# valid only for these — a future spatial op (blur, convolution) must
# NOT be added here, or the per-tuple rewrite would corrupt it.
_PER_PIXEL_OPS = frozenset({"gamma", "sigmoidal", "saturation"})

# Dictionary-path gates: sample the first pixels to estimate tuple
# cardinality before paying a full sort; commit only when the distinct
# tuples are a small fraction of the image.
_DICT_SAMPLE = 4096
_DICT_SAMPLE_MAX = 2048


def _dictionary_apply(raw, lut, rest, np_dtype, out_dtype):
    """Cross-band ops via dictionary encoding; None when not profitable.

    Every color op is a pure per-PIXEL function (elementwise ops read one
    band-value, saturation reads the pixel's band tuple — never a
    neighbor), so the image's distinct band tuples fully determine the
    output: unique the packed tuples, push only the uniques through the
    op tail + ``scale_dtype``, and gather output codes back by inverse
    index. Bit-identical to the direct path (same ufuncs over the same
    float64 values — tests/test_color_stage_lut.py), and a large win on
    low-cardinality imagery (the rasterized density tiles, palettized or
    posterized rasters); continuous photography exceeds the cardinality
    gate and returns None to take the full-image path.
    """
    band_count = raw.shape[0]
    if band_count > 4:  # 16-bit lanes: four bands fill the uint64 key
        return None
    if any(getattr(fn, "__name__", "") not in _PER_PIXEL_OPS for fn in rest):
        return None
    flat = raw.reshape(band_count, -1)
    packed = flat[0].astype(np.uint64)
    for b in range(1, band_count):
        packed |= flat[b].astype(np.uint64) << np.uint64(16 * b)
    if len(np.unique(packed[:_DICT_SAMPLE])) > _DICT_SAMPLE_MAX:
        return None
    uniq, inv = np.unique(packed, return_inverse=True)
    if len(uniq) > max(_DICT_SAMPLE, packed.size // 8):
        return None
    # (bands, U, 1): the cross-band ops validate ndim == 3
    arr = np.empty((band_count, len(uniq), 1), dtype=np.float64)
    mask = np.uint64((1 << (8 * np_dtype.itemsize)) - 1)
    for b in range(band_count):
        codes = ((uniq >> np.uint64(16 * b)) & mask).astype(np_dtype)
        np.take(lut[b], codes, out=arr[b, :, 0])
    for fn in rest:
        arr = fn(arr)
    small = scale_dtype(arr, out_dtype)[:, :, 0]
    out = np.empty((band_count, packed.size), dtype=small.dtype)
    for b in range(band_count):
        np.take(small[b], inv, out=out[b])
    return out.reshape(raw.shape)


def apply_ops_to_tiles(pixels_list, band_count, dtype, width, height, ops_funcs, out_dtype):
    """Apply a parsed ops program to a homogeneous list of tile buffers.

    Returns a list of output buffers (bytes) in input order. Vectorized:
    one stacked array for the whole group.

    For unsigned-integer tiles (uint8/uint16) the leading elementwise ops
    run over the 0..max code ramp once and every pixel is then a LUT
    gather — bit-identical to the direct path because numpy ufuncs are
    value-deterministic elementwise, so computing f(v) once per distinct
    code v yields the same float64 as computing it per pixel (asserted
    byte-for-byte in tests/test_color_stage_lut.py). A program with no
    cross-band op folds ``scale_dtype`` into the table too and never
    materializes the float64 image; with saturation present, the gather
    produces the exact float64 array the cross-band tail then consumes.
    This is the engine-side twin of the oracle's 256-entry LUT
    (tiles.py:band_uniform_lut / color_tiles_content_sql).
    """
    n = len(pixels_list)
    if n == 0:
        return []
    np_dtype = np.dtype(dtype)
    stacked = np.frombuffer(b"".join(pixels_list), dtype=np_dtype).reshape(
        n, band_count, height, width
    )
    # (n, b, h, w) -> (b, n*h, w): ops are per-band elementwise, so tiles
    # stacked along the row axis behave exactly like one tall window
    raw = np.ascontiguousarray(stacked.transpose(1, 0, 2, 3)).reshape(
        band_count, n * height, width
    )
    prefix, rest = _split_lut_prefix(ops_funcs)
    if np_dtype.kind == "u" and np_dtype.itemsize <= 2:
        n_codes = np.iinfo(np_dtype).max + 1
        # one ramp row per band: the closures band-mask on axis 0 exactly
        # as they do on image arrays, so per-band programs come out right
        ramp = np.broadcast_to(
            np.arange(n_codes, dtype=np_dtype), (band_count, n_codes)
        )
        lut = to_math_type(ramp)
        for fn in prefix:
            lut = fn(lut)
        if not rest:
            lut_codes = scale_dtype(lut, out_dtype)
            out = np.empty(raw.shape, dtype=lut_codes.dtype)
            for b in range(band_count):
                np.take(lut_codes[b], raw[b], out=out[b])
        else:
            out = _dictionary_apply(raw, lut, rest, np_dtype, out_dtype)
            if out is None:
                arr = np.empty(raw.shape, dtype=np.float64)
                for b in range(band_count):
                    np.take(lut[b], raw[b], out=arr[b])
                for fn in rest:
                    arr = fn(arr)
                out = scale_dtype(arr, out_dtype)
    else:
        arr = to_math_type(raw)
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
