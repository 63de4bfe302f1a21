"""Geodesy + web-mercator tile math (vectorized)."""

import numpy as np

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km, vectorized over numpy arrays."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dp = p2 - p1
    dl = np.radians(np.asarray(lon2, dtype=np.float64)) - np.radians(
        np.asarray(lon1, dtype=np.float64)
    )
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


_MAX_MERC_LAT = 85.05112878


def mercator_tile(lat, lon, z):
    """(lat, lon) degrees -> web-mercator tile (x, y) at zoom z. Standard
    slippy-map formulas; latitudes clamped to the mercator domain."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -_MAX_MERC_LAT, _MAX_MERC_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    n = float(2**z)
    xt = np.floor((lon + 180.0) / 360.0 * n)
    lat_rad = np.radians(lat)
    yt = np.floor((1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n)
    xt = np.clip(xt, 0, n - 1).astype(np.int32)
    yt = np.clip(yt, 0, n - 1).astype(np.int32)
    return xt, yt


def tile_pixel(lat, lon, z, xt, yt, tile_size=32):
    """Pixel (row, col) of each point inside its (z, xt, yt) tile."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -_MAX_MERC_LAT, _MAX_MERC_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    n = float(2**z)
    fx = (lon + 180.0) / 360.0 * n - xt
    lat_rad = np.radians(lat)
    fy = (1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n - yt
    col = np.clip(np.floor(fx * tile_size), 0, tile_size - 1).astype(np.int32)
    row = np.clip(np.floor(fy * tile_size), 0, tile_size - 1).astype(np.int32)
    return row, col
