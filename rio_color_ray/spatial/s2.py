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
