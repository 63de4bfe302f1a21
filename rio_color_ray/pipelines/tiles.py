"""Tile materialization + the rio-color correction stage.

cell-level point density -> web-mercator raster tiles (the engine's analog
of the reference GeoTIFF: 32x32 uint8 band-major buffers in a binary
column) -> the rio-color stage applying a DSL program (task-pool with
per-process parsed state by default; actor pool on request).

Shuffle discipline (round-5 design; measurements in BASELINE.md):
* stage 1 (map_batches): per-batch PARTIAL pixel histograms
  (tile_key, pix, n) — reduces the corpus to at most
  active-pixels-per-tile rows per batch before any exchange.
* stage 2 (boundary-partitioned sort): partials carry ``bucket =
  splitmix64(tile_key) % N_TILE_BUCKETS`` (the mix decorrelates bucket
  id from tile adjacency, so hot cities spread uniformly), and ONE
  ``sort("bucket", boundaries=[...])`` with explicit equal-width
  ranges co-locates every tile's partials. Each output block — a
  range of dozens of buckets — is assembled in ONE vectorized call
  (np.add.at scatter), no per-bucket Python. NOT groupby().map_groups:
  under the pinned sort-shuffle strategy its num_partitions is ignored
  and quantile sampling over 1024 discrete values quantizes ranges
  unevenly (render_tiles_from docstring).

Tile identity is the (z, x, y) triple — never row order.
"""

import numpy as np
import pyarrow as pa

from ..ctx import shuffle_partitions
from ..spatial import mercator_tile, tile_pixel
from ..stages.color_stage import ColorStage, apply_ops_to_tiles
from ..stages.sampling import splitmix64
from ..stages.statecache import make_stage_fn


def color_stage(tiles_ds, ops, concurrency=4, use_actors=False, out_dtype=None):
    """Apply the rio-color DSL program to a tiles Dataset.

    Task-pool by default (ops parsed once per worker process, fuses with
    the rasterize stage); ``use_actors=True`` for a dedicated actor pool.
    batch_size=128 keeps the stacked per-batch pixel array cache-resident
    — measured ~10x faster per pixel than one giant stacked array, and
    the fastest point of the 64/128/256/512 sweep (BASELINE.md).
    """
    if use_actors:
        return tiles_ds.map_batches(
            ColorStage,
            fn_constructor_args=(ops, out_dtype),
            batch_format="pyarrow",
            concurrency=(1, concurrency),
            batch_size=128,
            max_restarts=0,  # ctor args live in the object store (ray#53727)
        )
    return tiles_ds.map_batches(
        make_stage_fn(ColorStage, ops, out_dtype), batch_format="pyarrow", batch_size=128
    )

TILE_SIZE = 32
DEFAULT_ZOOM = 7
DEFAULT_OPS = "gamma rgb 1.2, sigmoidal rgb 6 0.25, saturation 1.1"
N_TILE_BUCKETS = 1024


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
        # bucket by a MIXED tile key, not tile_key % B: adjacent tiles
        # (hot cities) get adjacent raw keys, and the sort-based exchange
        # range-splits CONTIGUOUS bucket ranges into reduce tasks — with
        # the raw modulo one range swallowed a whole city (measured 34x
        # tiles-per-task spread, 3.5s straggler at z10/sf0.1; round-5
        # profile). splitmix64 decorrelates bucket id from tile
        # adjacency, so every contiguous bucket range is a uniform
        # sample of the tile population.
        bucket = (splitmix64(tile_key) % np.uint64(N_TILE_BUCKETS)).astype(np.int64)
        return pa.table(
            {
                "tile_key": pa.array(tile_key, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
                "pix": pa.array(uniq % (TILE_SIZE * TILE_SIZE), pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return fn


def _assemble_bucket(group: pa.Table) -> pa.Table:
    """All tiles of one bucket RANGE (one exchange block), assembled
    vectorized.

    No per-tile Python: the pixel buffers land in one contiguous uint8
    block wrapped as a FixedSizeBinary array (then cast to binary), and
    tile ids are built with Arrow string kernels. Requires only that
    every partial of a given tile is co-located in the batch — the
    np.unique over tile_key handles any number of buckets at once.
    """
    import pyarrow.compute as pc

    if group.num_rows == 0:  # an empty boundary range
        return pa.table(
            {
                "tile_id": pa.array([], pa.string()),
                "z": pa.array([], pa.int32()),
                "x": pa.array([], pa.int32()),
                "y": pa.array([], pa.int32()),
                "band_count": pa.array([], pa.uint8()),
                "dtype": pa.array([], pa.string()),
                "width": pa.array([], pa.int32()),
                "height": pa.array([], pa.int32()),
                "pixels": pa.array([], pa.binary()),
            }
        )

    tk = group.column("tile_key").to_numpy()
    pix = group.column("pix").to_numpy()
    n = group.column("n").to_numpy()
    uniq, inv = np.unique(tk, return_inverse=True)
    counts = np.zeros((len(uniq), TILE_SIZE * TILE_SIZE), dtype=np.int64)
    np.add.at(counts, (inv, pix), n)  # partials may repeat (tile, pix)
    counts = counts.reshape(len(uniq), TILE_SIZE, TILE_SIZE)

    # integer-deterministic banding: log-density, occupancy mask, density%256
    b0 = np.clip(np.round(32.0 * np.log2(1.0 + counts)), 0, 255).astype(np.uint8)
    b1 = np.where(counts > 0, 255, 0).astype(np.uint8)
    b2 = (counts % 256).astype(np.uint8)
    px = np.ascontiguousarray(np.stack([b0, b1, b2], axis=1))  # (tiles, 3, h, w)

    nbytes = 3 * TILE_SIZE * TILE_SIZE
    pixels = pc.cast(
        pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(nbytes), len(uniq), [None, pa.py_buffer(px.tobytes())]
        ),
        pa.binary(),
    )
    z = (uniq >> 44).astype(np.int32)
    xt = ((uniq >> 22) & ((1 << 22) - 1)).astype(np.int32)
    yt = (uniq & ((1 << 22) - 1)).astype(np.int32)
    slash = pa.scalar("/")
    tile_id = pc.binary_join_element_wise(
        pc.cast(pa.array(z), pa.string()),
        slash,
        pc.cast(pa.array(xt), pa.string()),
        slash,
        pc.cast(pa.array(yt), pa.string()),
        "",
    )
    k = len(uniq)
    return pa.table(
        {
            "tile_id": tile_id,
            "z": pa.array(z),
            "x": pa.array(xt),
            "y": pa.array(yt),
            "band_count": pa.array(np.full(k, 3, dtype=np.uint8)),
            "dtype": pa.array(["uint8"] * k, pa.string()),
            "width": pa.array(np.full(k, TILE_SIZE, dtype=np.int32)),
            "height": pa.array(np.full(k, TILE_SIZE, dtype=np.int32)),
            "pixels": pixels,
        }
    )


def render_tiles_from(points_ds, z=DEFAULT_ZOOM):
    """Any Dataset with lat/lon columns -> raster tiles at zoom z.

    The exchange is ``sort("bucket", boundaries=...)`` with EXPLICIT
    equal-width bucket ranges + one vectorized assemble call per output
    block — not ``groupby().map_groups``. Two measured reasons (round-5
    profile, sf0.1 / 32 CPUs, z10):

    * Under the pinned sort-shuffle strategy ``groupby(...,
      num_partitions=N)`` IGNORES N (map_groups lowers to a plain
      ``sort(key)``), and quantile sampling over 1024 discrete bucket
      values quantized into reduce ranges holding 3-42 buckets each —
      a 13-34x tiles-per-task spread whose 3.5s straggler WAS the
      flagship_z10 critical path. Fixed boundaries make every range
      exactly ``N_TILE_BUCKETS / npart`` buckets, and splitmix64-mixed
      bucket ids (``_partial_pixel_counts``) make every bucket a
      uniform tile sample, so tasks are even by construction.
    * map_groups calls the UDF once per bucket (Python-per-group);
      the boundary-partitioned map_batches(batch_size=None) assembles a
      whole range — dozens of buckets — in ONE np.unique/np.add.at
      pass.

    ``npart`` is ~2 reduce tasks per CPU — the measured optimum of an
    interleaved same-load 1x/2x/4x sweep (32 CPUs, sf0.1: z7
    2.46/2.55/2.80s, z10 6.06/3.41/3.82s min-of-4). 1x leaves the
    dense zoom with one straggler wave and no rebalance room; 4x pays
    ~5-10ms driver-side submission per extra task with nothing left to
    balance. At cluster scale raise N_TILE_BUCKETS together with zoom
    when a bucket range outgrows a worker's heap.
    """
    partial = points_ds.map_batches(_partial_pixel_counts(z), batch_format="pyarrow")
    npart = min(N_TILE_BUCKETS, max(64, 2 * shuffle_partitions(cap=N_TILE_BUCKETS)))
    step = N_TILE_BUCKETS / npart
    boundaries = [round(i * step) for i in range(1, npart)]
    return partial.sort("bucket", boundaries=boundaries).map_batches(
        _assemble_bucket, batch_format="pyarrow", batch_size=None
    )


def render_tiles(sf_dir, z=DEFAULT_ZOOM, replicate=1):
    """Point corpus -> raster tiles at zoom z."""
    from .geo import cellified

    pts = cellified(sf_dir, keep_columns=["lat", "lon"], replicate=replicate)
    return render_tiles_from(pts, z)


def color_tiles(
    sf_dir, ops=DEFAULT_OPS, z=DEFAULT_ZOOM, concurrency=4, replicate=1, use_actors=False
):
    """The flagship tail: rendered tiles through the rio-color stage."""
    from ..color import parse_operations

    parse_operations(ops)  # fail fast BEFORE launching work (cf. cli.py:95-98)
    tiles = render_tiles(sf_dir, z, replicate=replicate)
    return color_stage(tiles, ops, concurrency=concurrency, use_actors=use_actors)


def render_tiles_sql(z=DEFAULT_ZOOM):
    """DuckDB twin of :func:`render_tiles` including the pixel BLOBs.

    The slippy-map projection mirrors spatial/geo.py term for term
    (asinh written as ln(x + sqrt(x^2+1)) — DuckDB lacks asinh; libm may
    differ from numpy by an ulp, which only matters if fy*n*32 lands
    within that ulp of an integer pixel edge: measure-zero, verified
    empirically at sf scale). Pixel buffers are assembled band-major as
    hex (format + string_agg ORDER BY band, pix) then unhex'd to BLOB —
    byte-for-byte the engine's (tiles, 3, 32, 32) C-order layout.
    """
    from ..sources.pages import pages_sql_cte
    from ..spatial.geo import _MAX_MERC_LAT

    n = float(2**z)
    ts = TILE_SIZE
    npix = ts * ts
    asinh = "ln(t + sqrt(t * t + 1.0))"
    return f"""
WITH pages AS ({pages_sql_cte()}),
pts AS (
  SELECT greatest(least(lat, {_MAX_MERC_LAT!r}), {-_MAX_MERC_LAT!r}) AS lat, lon
  FROM pages
),
m AS (
  SELECT (lon + 180.0) / 360.0 * {n!r} AS fxn,
         (1.0 - ({asinh}) / pi()) / 2.0 * {n!r} AS fyn
  FROM (SELECT lat, lon, tan(radians(lat)) AS t FROM pts)
),
t AS (
  SELECT CAST(least(greatest(floor(fxn), 0), {n - 1!r}) AS INTEGER) AS xt,
         CAST(least(greatest(floor(fyn), 0), {n - 1!r}) AS INTEGER) AS yt,
         fxn, fyn
  FROM m
),
p AS (
  SELECT xt, yt,
         CAST(least(greatest(floor((fyn - yt) * {ts}), 0), {ts - 1}) AS BIGINT) * {ts}
         + CAST(least(greatest(floor((fxn - xt) * {ts}), 0), {ts - 1}) AS BIGINT) AS pix
  FROM t
),
counts AS (SELECT xt, yt, pix, count(*) AS n FROM p GROUP BY 1, 2, 3),
tiles AS (SELECT DISTINCT xt, yt FROM counts),
grid AS (
  SELECT tiles.xt, tiles.yt, b.b AS band, i.i AS pix
  FROM tiles
  CROSS JOIN (SELECT unnest(range(0, 3)) AS b) b
  CROSS JOIN (SELECT unnest(range(0, {npix})) AS i) i
),
bytes AS (
  SELECT g.xt, g.yt, g.band, g.pix,
    CASE g.band
      WHEN 0 THEN CAST(least(greatest(round(32.0 * log2(1.0 + coalesce(c.n, 0))), 0), 255) AS BIGINT)
      WHEN 1 THEN CASE WHEN coalesce(c.n, 0) > 0 THEN 255 ELSE 0 END
      ELSE coalesce(c.n, 0) % 256
    END AS v
  FROM grid g LEFT JOIN counts c ON c.xt = g.xt AND c.yt = g.yt AND c.pix = g.pix
),
blobs AS (
  SELECT xt, yt,
         unhex(string_agg(format('{{:02x}}', v), '' ORDER BY band, pix)) AS pixels
  FROM bytes GROUP BY xt, yt
)
SELECT CAST({z} AS VARCHAR) || '/' || CAST(xt AS VARCHAR) || '/' || CAST(yt AS VARCHAR)
         AS tile_id,
       CAST({z} AS INTEGER) AS z, xt AS x, yt AS y,
       CAST(3 AS UTINYINT) AS band_count,
       CAST('uint8' AS VARCHAR) AS dtype,
       CAST({ts} AS INTEGER) AS width, CAST({ts} AS INTEGER) AS height,
       pixels
FROM blobs
"""


def _hex_string_array(arr: pa.Array) -> pa.Array:
    """Lowercase-hex encode a binary array, Arrow-buffer vectorized.

    Two fancy-indexed nibble lookups over the data buffer and a doubled
    offsets buffer — no per-row ``bytes.hex()`` Python loop (a 256x256x3
    tile is ~200 kB/row; the loop was O(rows) interpreter work).
    """
    n = len(arr)
    if n == 0:
        return pa.array([], pa.string())
    if arr.null_count:
        raise ValueError("_hex_string_array: null pixel rows are not expected")
    odtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], odtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)[offsets[0] : offsets[-1]]
    rel = offsets - offsets[0]
    hex_lut = np.frombuffer(b"0123456789abcdef", np.uint8)
    out = np.empty(data.size * 2, np.uint8)
    out[0::2] = hex_lut[data >> 4]
    out[1::2] = hex_lut[data & 0x0F]
    if out.size >= (1 << 31):
        raise ValueError("hex output exceeds int32 string offsets; lower batch_size")
    return pa.Array.from_buffers(
        pa.string(),
        n,
        [None, pa.py_buffer((rel * 2).astype(np.int32)), pa.py_buffer(out)],
    )


def _pixels_to_hex(batch: pa.Table) -> pa.Table:
    """pixels (binary) -> pixels_hex (lowercase hex VARCHAR), other
    columns untouched — the shared hex contract of both content twins."""
    cols = {}
    for name in batch.column_names:
        if name == "pixels":
            cols["pixels_hex"] = _hex_string_array(
                batch.column("pixels").combine_chunks()
            )
        else:
            cols[name] = batch.column(name)
    return pa.table(cols)


def render_tiles_content(sf_dir, z=DEFAULT_ZOOM):
    """render_tiles with the pixel buffer hex-encoded (VARCHAR).

    The driver's value-hash comparator needs hashable cells; DuckDB
    returns BLOBs as bytearray, so the binary ``pixels`` column can't be
    compared directly. This twin of :func:`render_tiles` carries the
    SAME bytes as lowercase hex — the oracle (render_tiles_sql minus the
    unhex) verifies full tile content, not just ids.
    """
    return render_tiles(sf_dir, z).map_batches(_pixels_to_hex, batch_format="pyarrow")


def render_tiles_content_sql(z=DEFAULT_ZOOM):
    """Oracle for render_tiles_content: the full twin, hex instead of BLOB."""
    sql = render_tiles_sql(z)
    return sql.replace(
        "unhex(string_agg(format('{:02x}', v), '' ORDER BY band, pix)) AS pixels",
        "string_agg(format('{:02x}', v), '' ORDER BY band, pix) AS pixels_hex",
    ).replace("       pixels\nFROM blobs", "       pixels_hex\nFROM blobs")


BAND_UNIFORM_OPS = "gamma rgb 1.2, sigmoidal rgb 6 0.25"


def band_uniform_lut(ops=BAND_UNIFORM_OPS):
    """256-entry uint8 LUT for a band-uniform ops program.

    Valid only for programs with no cross-band operator (gamma and
    sigmoidal are strictly elementwise per band, operations.py; the
    reference's saturation mixes bands and is excluded). Built by running
    the engine's own scalar path over the 0..255 ramp — the scalar math
    itself is verified against the reference's golden fixtures in
    tests/test_color_operations.py; the SQL oracle built from this LUT
    verifies the DISTRIBUTED tile pipeline routes every byte through it.
    """
    from ..color import parse_operations

    ramp = np.arange(256, dtype=np.uint8).tobytes()
    out = apply_ops_to_tiles(
        [ramp * 3], 3, "uint8", 16, 16, parse_operations(ops), "uint8"
    )[0]
    return np.frombuffer(out, dtype=np.uint8)[:256]


def color_tiles_content(sf_dir, z=DEFAULT_ZOOM):
    """color_tiles with a band-uniform program, pixels hex-encoded.

    The oracle-checkable twin of :func:`color_tiles`: same render +
    color stages, ops restricted to the per-band subset so DuckDB can
    reproduce the pixel bytes exactly via a 256-entry lookup.
    """
    ds = color_tiles(sf_dir, ops=BAND_UNIFORM_OPS, z=z).drop_columns(["ops"])
    return ds.map_batches(_pixels_to_hex, batch_format="pyarrow")


def color_tiles_content_sql(z=DEFAULT_ZOOM):
    """Oracle for color_tiles_content: render SQL + LUT join on v."""
    lut = band_uniform_lut()
    values = ", ".join(f"({i}, {int(v)})" for i, v in enumerate(lut))
    sql = render_tiles_content_sql(z)
    return sql.replace(
        "string_agg(format('{:02x}', v), '' ORDER BY band, pix) AS pixels_hex",
        "string_agg(format('{:02x}', lut.v2), '' ORDER BY band, pix) AS pixels_hex",
    ).replace(
        "blobs AS (",
        f"lut(v, v2) AS (VALUES {values}),\nblobs AS (",
    ).replace(
        "FROM bytes GROUP BY xt, yt",
        "FROM bytes JOIN lut ON lut.v = bytes.v GROUP BY xt, yt",
    )
