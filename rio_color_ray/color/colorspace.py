"""Vectorized colorspace conversions (RGB / XYZ / LAB / LCH / LUV).

Pure-numpy reimplementation of the reference Cython kernels
(/root/reference/rio_color/colorspace.pyx). Every constant, branch
threshold, operation order, and quirk is carried over exactly, because the
north star requires uint8 tile arrays numerically identical to the
reference chain:

* D65 constants (colorspace.pyx:234-247); sRGB piecewise companding
  (SRGB_COMPAND=True path, pyx:265-277 / 392-404).
* NON-STANDARD white-point handling: ``_rgb_to_xyz`` divides x by xn and
  z by zn (pyx:286-288); ``_xyz_to_rgb`` multiplies them back
  (pyx:383-384). y is never divided (yn == 1).
* LCH hue is ``atan2(b, a)`` in RADIANS (pyx:332), not degrees.
* ``_xyz_to_rgb`` clamps r,g,b to [0, 1] (pyx:411-423).
* ``_luv_to_xyz`` maps L == 0 to (0,0,0) (pyx:460-464) and uses the
  L <= 8 linear branch (pyx:469-472).

All kernels are elementwise over arbitrarily-shaped float64 arrays, so the
same code serves the scalar ``convert`` API, the ``(3, I, J)``
``convert_arr`` API, and flattened ``(3, N)`` pixel blocks inside Ray Data
``map_batches`` tile stages. Branches are evaluated with ``np.where`` over
a safe dummy operand so the unused branch never produces NaN warnings; the
selected branch is computed with exactly the reference's float64 formula.
"""

from enum import IntEnum

import numpy as np

__all__ = ["ColorSpace", "convert", "convert_arr", "saturate_rgb"]


class ColorSpace(IntEnum):
    """Mirror of the reference enum (colorspace.pyx:23-28)."""

    rgb = 0
    xyz = 1
    lab = 2
    lch = 3
    luv = 4


# --- constants (colorspace.pyx:234-247) ------------------------------------
BINTERCEPT = 4.0 / 29
DELTA = 6.0 / 29
T0 = DELTA**3
ALPHA = (DELTA**-2) / 3
THIRD = 1.0 / 3
KAPPA = (29.0 / 3) ** 3
XN = 0.95047
YN = 1.0
ZN = 1.08883
_DENOM_N = XN + (15 * YN) + (3 * ZN)
UPRIME_N = (4 * XN) / _DENOM_N
VPRIME_N = (9 * YN) / _DENOM_N


def _where_pow(cond, base, exponent, dummy):
    """``np.power`` applied only where ``cond`` is False; safe elsewhere.

    The dummy value substitutes the base on lanes where the power branch is
    not selected, so no NaN/inf is computed for them. Callers select the
    result with the same ``cond`` afterwards.
    """
    return np.power(np.where(cond, dummy, base), exponent)


def rgb_to_xyz(r, g, b):
    """sRGB -> (white-point-normalized) XYZ. Reference pyx:260-293."""
    small_r = r <= 0.04045
    small_g = g <= 0.04045
    small_b = b <= 0.04045
    rl = np.where(small_r, r / 12.92, _where_pow(small_r, (r + 0.055) / 1.055, 2.4, 0.5))
    gl = np.where(small_g, g / 12.92, _where_pow(small_g, (g + 0.055) / 1.055, 2.4, 0.5))
    bl = np.where(small_b, b / 12.92, _where_pow(small_b, (b + 0.055) / 1.055, 2.4, 0.5))

    x = ((rl * 0.4124564) + (gl * 0.3575761) + (bl * 0.1804375)) / XN
    y = (rl * 0.2126729) + (gl * 0.7151522) + (bl * 0.0721750)
    z = ((rl * 0.0193339) + (gl * 0.1191920) + (bl * 0.9503041)) / ZN
    return x, y, z


def _lab_f(t):
    """CIELAB f(t): cube root above T0, linear below. Reference pyx:302-315."""
    low = t <= T0
    return np.where(low, (ALPHA * t) + BINTERCEPT, _where_pow(low, t, THIRD, 1.0))


def xyz_to_lab(x, y, z):
    """Reference pyx:296-324."""
    fx = _lab_f(x)
    fy = _lab_f(y)
    fz = _lab_f(z)
    L = (116 * fy) - 16
    a = 500 * (fx - fy)
    b = 200 * (fy - fz)
    return L, a, b


def lab_to_lch(L, a, b):
    """Hue in RADIANS via atan2(b, a). Reference pyx:327-333."""
    C = np.power((a * a) + (b * b), 0.5)
    H = np.arctan2(b, a)
    return L, C, H


def lch_to_lab(L, C, H):
    """Reference pyx:336-346."""
    return L, C * np.cos(H), C * np.sin(H)


def _lab_finv(t):
    """Inverse CIELAB f: cube above DELTA, linear below. Reference pyx:353-369."""
    low = t <= DELTA
    return np.where(low, 3 * DELTA * DELTA * (t - BINTERCEPT), _where_pow(low, t, 3, 1.0))


def lab_to_xyz(L, a, b):
    """Reference pyx:349-375."""
    ty = (L + 16) / 116.0
    tx = ty + (a / 500.0)
    tz = ty - (b / 200.0)
    return _lab_finv(tx), _lab_finv(ty), _lab_finv(tz)


def xyz_to_rgb(x, y, z):
    """XYZ -> sRGB with [0,1] clamp. Reference pyx:378-429."""
    x = x * XN
    z = z * ZN

    rlin = (x * 3.2404542) + (y * -1.5371385) + (z * -0.4985314)
    glin = (x * -0.9692660) + (y * 1.8760108) + (z * 0.0415560)
    blin = (x * 0.0556434) + (y * -0.2040259) + (z * 1.0572252)

    def compand(v):
        small = v <= 0.0031308
        return np.where(
            small, 12.92 * v, (1.055 * _where_pow(small, v, 1 / 2.4, 0.5)) - 0.055
        )

    r = np.clip(compand(rlin), 0.0, 1.0)
    g = np.clip(compand(glin), 0.0, 1.0)
    b = np.clip(compand(blin), 0.0, 1.0)
    return r, g, b


def xyz_to_luv(x, y, z):
    """Reference pyx:432-453. NaN for black (0/0) propagates as in the C code."""
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = x + (15 * y) + (3 * z)
        uprime = (4 * x) / denom
        vprime = (9 * y) / denom

        y = y / YN
        low = y <= T0
        L = np.where(low, KAPPA * y, (116 * _where_pow(low, y, THIRD, 1.0)) - 16)
        u = 13 * L * (uprime - UPRIME_N)
        v = 13 * L * (vprime - VPRIME_N)
    return L, u, v


def luv_to_xyz(L, u, v):
    """Reference pyx:456-480: L == 0 -> black; linear branch for L <= 8."""
    with np.errstate(divide="ignore", invalid="ignore"):
        zero = L == 0.0
        Lsafe = np.where(zero, 1.0, L)
        uprime = (u / (13 * Lsafe)) + UPRIME_N
        vprime = (v / (13 * Lsafe)) + VPRIME_N

        low = L <= 8.0
        y = np.where(low, L / KAPPA, _where_pow(low, (L + 16) / 116.0, 3, 1.0))
        x = y * ((9 * uprime) / (4 * vprime))
        z = y * ((12 - (3 * uprime) - (20 * vprime)) / (4 * vprime))

        x = np.where(zero, 0.0, x)
        y = np.where(zero, 0.0, y)
        z = np.where(zero, 0.0, z)
    return x, y, z


# Conversion graph: every src->dst pair routed through the same XYZ/LAB hops
# as the reference dispatch (_convert, colorspace.pyx:137-231).
_CS = ColorSpace


def _identity(a, b, c):
    return a, b, c


def _chain(*fns):
    def run(a, b, c):
        for fn in fns:
            a, b, c = fn(a, b, c)
        return a, b, c

    return run


_ROUTES = {
    (_CS.rgb, _CS.xyz): rgb_to_xyz,
    (_CS.rgb, _CS.lab): _chain(rgb_to_xyz, xyz_to_lab),
    (_CS.rgb, _CS.lch): _chain(rgb_to_xyz, xyz_to_lab, lab_to_lch),
    (_CS.rgb, _CS.luv): _chain(rgb_to_xyz, xyz_to_luv),
    (_CS.xyz, _CS.rgb): xyz_to_rgb,
    (_CS.xyz, _CS.lab): xyz_to_lab,
    (_CS.xyz, _CS.lch): _chain(xyz_to_lab, lab_to_lch),
    (_CS.xyz, _CS.luv): xyz_to_luv,
    (_CS.lab, _CS.xyz): lab_to_xyz,
    (_CS.lab, _CS.lch): lab_to_lch,
    (_CS.lab, _CS.rgb): _chain(lab_to_xyz, xyz_to_rgb),
    (_CS.lab, _CS.luv): _chain(lab_to_xyz, xyz_to_luv),
    (_CS.lch, _CS.lab): lch_to_lab,
    (_CS.lch, _CS.xyz): _chain(lch_to_lab, lab_to_xyz),
    (_CS.lch, _CS.rgb): _chain(lch_to_lab, lab_to_xyz, xyz_to_rgb),
    (_CS.lch, _CS.luv): _chain(lch_to_lab, lab_to_xyz, xyz_to_luv),
    (_CS.luv, _CS.xyz): luv_to_xyz,
    (_CS.luv, _CS.lab): _chain(luv_to_xyz, xyz_to_lab),
    (_CS.luv, _CS.rgb): _chain(luv_to_xyz, xyz_to_rgb),
    (_CS.luv, _CS.lch): _chain(luv_to_xyz, xyz_to_lab, lab_to_lch),
}


def _as_colorspace(value, label):
    """Validate/coerce a colorspace given as enum, int, or name string.

    Error behavior mirrors the reference ``convert`` prologue
    (colorspace.pyx:44-69): unknown names / ints raise ValueError with the
    same messages.
    """
    if isinstance(value, str):
        try:
            return ColorSpace[value.lower()]
        except KeyError:
            raise ValueError(f"Invalid {label} colorspace: {value}")
    if isinstance(value, ColorSpace):
        return value
    if isinstance(value, int):
        try:
            return ColorSpace(value)
        except ValueError:
            raise ValueError(f"Invalid {label} colorspace: {value}")
    raise ValueError("Invalid colorspace")


def convert(one, two, three, src, dst):
    """Scalar colorspace conversion. Reference API: colorspace.pyx:41-72."""
    src = _as_colorspace(src, "source")
    dst = _as_colorspace(dst, "destination")
    if src == dst:
        return float(one), float(two), float(three)
    a, b, c = _ROUTES[(src, dst)](
        np.float64(one), np.float64(two), np.float64(three)
    )
    return float(a), float(b), float(c)


def _validate_arr3(arr):
    """Replicate the Cython buffer-protocol error strings (tests rely on
    'wrong number of dimensions' / 'dtype mismatch' / '3 bands';
    reference tests/test_colorspace.py:140-170)."""
    if not isinstance(arr, np.ndarray) or arr.ndim != 3:
        nd = getattr(arr, "ndim", None)
        raise ValueError(
            f"Buffer has wrong number of dimensions (expected 3, got {nd})"
        )
    if arr.dtype != np.float64:
        raise ValueError(f"Buffer dtype mismatch, expected float64, got {arr.dtype}")
    if arr.shape[0] != 3:
        raise ValueError("The 0th dimension must contain 3 bands")


def convert_arr(arr, src, dst):
    """Convert a ``(3, I, J)`` float64 array between colorspaces.

    Vectorized equivalent of the reference pixel loop (colorspace.pyx:75-100).
    """
    _validate_arr3(arr)
    src = _as_colorspace(src, "source")
    dst = _as_colorspace(dst, "destination")
    if src == dst:
        fn = _identity
    else:
        fn = _ROUTES[(src, dst)]
    one, two, three = fn(arr[0], arr[1], arr[2])
    out = np.empty(shape=(3,) + arr.shape[1:], dtype=np.float64)
    out[0] = one
    out[1] = two
    out[2] = three
    return out


def saturate_rgb(arr, satmult):
    """RGB -> LCH, chroma *= satmult, -> RGB. Reference colorspace.pyx:103-134."""
    _validate_arr3(arr)
    L, C, H = lab_to_lch(*xyz_to_lab(*rgb_to_xyz(arr[0], arr[1], arr[2])))
    r, g, b = xyz_to_rgb(*lab_to_xyz(*lch_to_lab(L, C * satmult, H)))
    out = np.empty(shape=(3,) + arr.shape[1:], dtype=np.float64)
    out[0] = r
    out[1] = g
    out[2] = b
    return out
