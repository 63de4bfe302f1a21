"""S2-style quadsphere cell index — vectorized, from scratch.

Pipeline per point: (lat, lon) -> unit-sphere xyz -> dominant cube face
(0:+x 1:+y 2:+z 3:-x 4:-y 5:-z) -> face-local (u, v) in [-1, 1] ->
quadratic s/t transform (the area-equalizing projection S2 uses) ->
integer (i, j) on a 2^level grid -> Hilbert curve position (classic
bit-interleave Hilbert, vectorized over numpy arrays).

Cell id packing (uint64): ``face << 60 | level << 54 | hilbert_pos`` with
hilbert_pos < 4^level, valid for level <= 26. Parent at level-1 is
``pos >> 2`` — truly hierarchical (unlike the hex grid's geometric
parent), which is why the engine uses these ids for range-partitioned /
resumable output: a cell-range [lo, hi) at any level is a contiguous id
range. NOT bit-compatible with Google S2 (different Hilbert orientation
conventions); internal consistency is the contract.
"""

import numpy as np

_U60 = np.uint64(60)
_U54 = np.uint64(54)


def _latlon_to_xyz(lat, lon):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _face_uv(x, y, z):
    """Dominant-axis face selection + face-local (u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)

    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z],
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z],
        )
    return face, u, v


def _uv_to_st(u):
    """S2's quadratic projection: equalizes cell areas across a face."""
    pos = u >= 0
    a = np.sqrt(1.0 + 3.0 * np.where(pos, u, 0.0))
    b = np.sqrt(1.0 - 3.0 * np.where(pos, 0.0, u))
    return np.where(pos, 0.5 * a, 1.0 - 0.5 * b)


def _hilbert_xy2d(order, x, y):
    """Vectorized Hilbert curve distance for (x, y) on a 2^order grid.

    Classic top-down bit algorithm; the quadrant flip uses ``n-1-x`` (full
    grid size) so values stay in [0, n) — the ``s-1-x`` textbook variant
    relies on signed arbitrary-precision ints and would wrap in uint64.
    """
    x = x.astype(np.uint64).copy()
    y = y.astype(np.uint64).copy()
    d = np.zeros_like(x, dtype=np.uint64)
    n = np.uint64(1) << np.uint64(order)
    s = np.uint64(1) << np.uint64(order - 1)
    one = np.uint64(1)
    zero = np.uint64(0)
    while s > 0:
        rx = np.where((x & s) > 0, one, zero)
        ry = np.where((y & s) > 0, one, zero)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, n - one - x, x)
        y_f = np.where(flip, n - one - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= one
    return d


def s2_cell(lat, lon, level):
    """Vectorized (lat, lon) degrees -> uint64 S2-style cell id at ``level``."""
    if not 0 <= level <= 26:
        raise ValueError("level must be in [0, 26]")
    x, y, z = _latlon_to_xyz(lat, lon)
    face, u, v = _face_uv(x, y, z)
    n = np.uint64(1) << np.uint64(level)
    nf = float(2**level)
    i = np.clip(np.floor(_uv_to_st(u) * nf), 0, nf - 1).astype(np.uint64)
    j = np.clip(np.floor(_uv_to_st(v) * nf), 0, nf - 1).astype(np.uint64)
    if level == 0:
        pos = np.zeros_like(i)
    else:
        pos = _hilbert_xy2d(level, i, j)
    return (
        (face.astype(np.uint64) << _U60)
        | (np.uint64(level) << _U54)
        | pos
    )


def s2_cell_sql(level, lat_expr="lat", lon_expr="lon", out_name="s2_cell"):
    """DuckDB twin of :func:`s2_cell`: returns ``fn(src) -> SQL`` selecting
    ``src.*`` plus the packed int64 cell id.

    The trig/projection chain mirrors the numpy expressions term for term
    (pi/180 embedded via repr); the Hilbert walk is the same top-down bit
    loop UNROLLED into ``level`` REPLACE subqueries over BIGINT hx/hy/hd.
    libm cos/sin may differ from numpy's by an ulp — a cell can only flip
    if st*2^level lands within that ulp of a grid line (measure-zero;
    verified empirically in tests at sf scale).
    """
    if not 1 <= level <= 26:
        raise ValueError("level must be in [1, 26]")
    import math

    C = repr(math.pi / 180.0)
    n = 1 << level
    nf = float(n)

    def fn(src):
        q = f"""
SELECT *,
  CASE WHEN abs(sx) >= abs(sy) AND abs(sx) >= abs(sz)
         THEN CASE WHEN sx >= 0 THEN 0 ELSE 3 END
       WHEN abs(sy) >= abs(sz) THEN CASE WHEN sy >= 0 THEN 1 ELSE 4 END
       ELSE CASE WHEN sz >= 0 THEN 2 ELSE 5 END END AS face
FROM (
  SELECT *,
    cos({lat_expr} * {C}) * cos({lon_expr} * {C}) AS sx,
    cos({lat_expr} * {C}) * sin({lon_expr} * {C}) AS sy,
    sin({lat_expr} * {C}) AS sz
  FROM {src}
)"""
        q = f"""
SELECT *,
  CASE face WHEN 0 THEN sy / sx WHEN 1 THEN -sx / sy WHEN 2 THEN -sx / sz
            WHEN 3 THEN sz / sx WHEN 4 THEN sz / sy ELSE -sy / sz END AS fu,
  CASE face WHEN 0 THEN sz / sx WHEN 1 THEN sz / sy WHEN 2 THEN -sy / sz
            WHEN 3 THEN sy / sx WHEN 4 THEN -sx / sy ELSE -sx / sz END AS fv
FROM ({q})"""
        st = (
            "CASE WHEN {c} >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * {c}) "
            "ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {c}) END"
        )
        q = f"""
SELECT *,
  CAST(least(greatest(floor(({st.format(c='fu')}) * {nf!r}), 0), {nf - 1!r}) AS BIGINT) AS hx,
  CAST(least(greatest(floor(({st.format(c='fv')}) * {nf!r}), 0), {nf - 1!r}) AS BIGINT) AS hy,
  CAST(0 AS BIGINT) AS hd
FROM ({q})"""
        s = n >> 1
        while s > 0:
            rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
            ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
            flip = f"({ry} = 0 AND {rx} = 1)"
            x_f = f"(CASE WHEN {flip} THEN {n - 1} - hx ELSE hx END)"
            y_f = f"(CASE WHEN {flip} THEN {n - 1} - hy ELSE hy END)"
            q = f"""
SELECT * REPLACE (
  (CASE WHEN {ry} = 0 THEN {y_f} ELSE {x_f} END) AS hx,
  (CASE WHEN {ry} = 0 THEN {x_f} ELSE {y_f} END) AS hy,
  (hd + {s * s} * xor(3 * {rx}, {ry})) AS hd)
FROM ({q})"""
            s >>= 1
        return q

    pack = (
        f"(CAST(face AS BIGINT) * {1 << 60} + {level} * {1 << 54} + hd) AS {out_name}"
    )
    return fn, pack


def s2_level(cell):
    """Level stored in a cell id."""
    return ((np.asarray(cell, dtype=np.uint64) >> _U54) & np.uint64(0x3F)).astype(
        np.int64
    )


def s2_face(cell):
    """Face (0..5) stored in a cell id."""
    return (np.asarray(cell, dtype=np.uint64) >> _U60).astype(np.int64)


def s2_parent(cell, parent_level):
    """Ancestor id at a coarser level: hierarchical ``pos >> 2*(dl)``."""
    cell = np.asarray(cell, dtype=np.uint64)
    level = s2_level(cell)
    if np.any(level < parent_level):
        raise ValueError("parent_level must be <= cell level")
    dl = (level - parent_level).astype(np.uint64)
    pos = cell & ((np.uint64(1) << _U54) - np.uint64(1))
    ppos = pos >> (np.uint64(2) * dl)
    return (
        (s2_face(cell).astype(np.uint64) << _U60)
        | (np.uint64(parent_level) << _U54)
        | ppos
    )
