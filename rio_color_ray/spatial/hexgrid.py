"""H3-analog hierarchical hex grid — vectorized, from scratch.

Pointy-top hexagons in axial (q, r) coordinates on an equirectangular
projection (x = lon deg, y = lat deg). Resolution r has edge length
``E0 / sqrt(7)**res`` degrees (aperture-7 scaling like H3: each finer
resolution has ~1/7 the cell area). With E0 = 10.0 deg, res 7 edge is
~0.011 deg ≈ 1.2 km at the equator — comparable to H3 res 7.

Cell id packing (uint64): ``res << 56 | (q + 2^27) << 28 | (r + 2^27)``.
Axial coords thus live in [-2^27, 2^27); at res 9 (edge ~1.6e-3 deg) the
globe spans ~2.2e5 cells per axis, far inside the field.

Not bit-compatible with Uber H3 (icosahedral gnomonic): conformance target
is internal consistency against our own single-node oracle, per
SURVEY.md §7. The hierarchy (parent/child) is geometric: parent(cell) is
the coarser cell containing this cell's center. Like true H3, aperture-7
child cells are not perfectly nested; the center-containment rule is the
documented contract.
"""

import numpy as np

E0 = 10.0  # res-0 edge length in degrees
_SQRT3 = np.sqrt(3.0)
_OFF = np.uint64(1 << 27)
_MASK28 = np.uint64((1 << 28) - 1)

# axial neighbor directions, pointy-top
_DIRS = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)


def hex_edge_deg(res):
    """Edge length in degrees at a resolution (aperture-7 scaling)."""
    return E0 / (7.0 ** (np.asarray(res) / 2.0))


def _axial_round(qf, rf):
    """Cube-coordinate rounding, vectorized (classic hex-grid algorithm)."""
    x = qf
    z = rf
    y = -x - z
    rx = np.round(x)
    ry = np.round(y)
    rz = np.round(z)
    dx = np.abs(rx - x)
    dy = np.abs(ry - y)
    dz = np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def _pack(res, q, r):
    return (
        (np.asarray(res).astype(np.uint64) << np.uint64(56))
        | ((np.asarray(q).astype(np.uint64) + _OFF) << np.uint64(28))
        | (np.asarray(r).astype(np.uint64) + _OFF)
    )


def _unpack(cell):
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(56)).astype(np.int64)
    q = (((cell >> np.uint64(28)) & _MASK28) - _OFF).astype(np.int64)
    r = ((cell & _MASK28) - _OFF).astype(np.int64)
    return res, q, r


def hex_cell(lat, lon, res):
    """Vectorized (lat, lon) degrees -> uint64 hex cell id at ``res``."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    size = float(hex_edge_deg(res))
    qf = (_SQRT3 / 3.0 * lon - lat / 3.0) / size
    rf = (2.0 / 3.0 * lat) / size
    q, r = _axial_round(qf, rf)
    return _pack(res, q, r)


def hex_cell_sql(res, lat_expr="lat", lon_expr="lon", out_name="cell"):
    """DuckDB twin of :func:`hex_cell` as a SELECT-column chain.

    Returns (cte_sql_fn, out_name): ``cte_sql_fn(src)`` yields a SQL
    fragment selecting ``src.* `` plus the packed int64 cell id. Constants
    (edge size, sqrt(3)/3, 2/3) are embedded via shortest-roundtrip repr
    so every float op mirrors the numpy expression bit-for-bit; the only
    semantic gap is round-half-even (numpy) vs half-away (SQL), which
    needs an exact .5 fraction to differ — measure-zero for these inputs.
    """
    size = float(E0 / (7.0 ** (res / 2.0)))
    c1 = float(_SQRT3 / 3.0)
    c2 = float(2.0 / 3.0)
    off = 1 << 27

    def d(v):
        return f"CAST('{v!r}' AS DOUBLE)"

    def cte(src):
        return f"""
SELECT * FROM (
  SELECT *,
    CASE WHEN (dx > dy AND dx > dz) THEN -ry0 - rz0 ELSE rx0 END AS hq,
    CASE WHEN NOT (dx > dy AND dx > dz) AND dz > dy THEN -rx0 - ry0 ELSE rz0 END AS hr
  FROM (
    SELECT *, round(hy) AS ry0,
      abs(rx0 - hx) AS dx, abs(round(hy) - hy) AS dy, abs(rz0 - hz) AS dz
    FROM (
      SELECT *, -hx - hz AS hy, round(hx) AS rx0, round(hz) AS rz0
      FROM (
        SELECT *, ({d(c1)} * {lon_expr} - {lat_expr} / 3.0) / {d(size)} AS hx,
                  ({d(c2)} * {lat_expr}) / {d(size)} AS hz
        FROM {src}
      )
    )
  )
)
"""

    pack = (
        f"(CAST({res} AS BIGINT) * {1 << 56} "
        f"+ (CAST(hq AS BIGINT) + {off}) * {1 << 28} "
        f"+ (CAST(hr AS BIGINT) + {off})) AS {out_name}"
    )
    return cte, pack


def hex_res(cell):
    """Resolution of a cell id."""
    return _unpack(cell)[0]


def hex_cell_center(cell):
    """Cell id -> (lat, lon) degrees of the hexagon center."""
    res, q, r = _unpack(cell)
    size = E0 / (7.0 ** (res / 2.0))
    lon = size * _SQRT3 * (q + r / 2.0)
    lat = size * 1.5 * r
    return lat, lon


def hex_parent(cell, parent_res=None):
    """The cell at ``parent_res`` (default res-1) containing this center."""
    res, _, _ = _unpack(cell)
    if parent_res is None:
        parent_res = int(np.max(res)) - 1
    lat, lon = hex_cell_center(cell)
    return hex_cell(lat, lon, parent_res)


def hex_ring(cell, k):
    """All cell ids exactly k steps from a SINGLE cell (6k cells; k=0 -> self)."""
    res, q, r = _unpack(np.asarray([cell], dtype=np.uint64))
    res, q, r = int(res[0]), int(q[0]), int(r[0])
    if k == 0:
        return _pack(res, np.asarray([q]), np.asarray([r]))
    qs, rs = [], []
    cq, cr = q + int(_DIRS[4][0]) * k, r + int(_DIRS[4][1]) * k
    for d in range(6):
        for _ in range(k):
            qs.append(cq)
            rs.append(cr)
            cq += int(_DIRS[d][0])
            cr += int(_DIRS[d][1])
    return _pack(res, np.asarray(qs, dtype=np.int64), np.asarray(rs, dtype=np.int64))


_DISK_CACHE = {}


def _disk_offsets(k):
    """(q, r) offsets of the radius-k hex disk, cached (1 + 3k(k+1) cells)."""
    if k not in _DISK_CACHE:
        offs = [
            (dq, dr)
            for dq in range(-k, k + 1)
            for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)
        ]
        _DISK_CACHE[k] = np.asarray(offs, dtype=np.int64)
    return _DISK_CACHE[k]


def hex_disk(cells, k):
    """Vectorized: for N cell ids, all ids within k steps.

    Returns ``(ids, owner)`` where ids has shape (N * D,), owner maps each
    id back to its input row — the candidate-cell expansion used by the
    kNN ring-expansion join (SURVEY.md §2b).
    """
    cells = np.asarray(cells, dtype=np.uint64)
    res, q, r = _unpack(cells)
    offs = _disk_offsets(k)
    D = len(offs)
    qq = (q[:, None] + offs[None, :, 0]).reshape(-1)
    rr = (r[:, None] + offs[None, :, 1]).reshape(-1)
    res_rep = np.repeat(res, D)
    ids = _pack(res_rep, qq, rr)
    owner = np.repeat(np.arange(len(cells)), D)
    return ids, owner
