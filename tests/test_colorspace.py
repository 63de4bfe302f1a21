"""Colorspace conversion parity tests.

Fixture table and roundtrip grid from /root/reference/tests/test_colorspace.py
(no colormath in this environment, so the cross-library checks become fixed
golden assertions; the roundtrip grid keeps the reference's 0.1 tolerance).
"""

import math
from itertools import product

import numpy as np
import pytest

from rio_color_ray.color import ColorSpace as cs
from rio_color_ray.color import convert, convert_arr, saturate_rgb

# (rgb, expected_lch) — reference tests/test_colorspace.py:30-38; hue in RADIANS
FIXTURES = (
    ((0, 0, 0), (0, 0, 0)),
    ((1.0, 0, 0), (53.2, 104.6, 0.7)),
    ((0.392156, 0.776470, 0.164705), (71.7, 83.5, 2.3)),
    ((0.0392, 0.1960, 0.3529), (20.3517, 27.8757, -1.4612)),
    ((0.0456, 0.1929, 0.3941), (20.8945, 34.9429, -1.3244)),
    ((1.0, 1.0, 1.0), (100, 0, 2.8)),
)


def _near(a, b, tol):
    if not hasattr(tol, "__iter__"):
        tol = [tol] * len(a)
    return all(abs(x - y) <= t for x, y, t in zip(a, b, tol))


def _make_array(x, y, z, dtype="float64"):
    return np.array([[[x]], [[y]], [[z]]]).astype(dtype)


@pytest.mark.parametrize("pair", FIXTURES)
def test_rgb2lch(pair):
    rgb, lch = pair
    alch = convert(*rgb, src=cs.rgb, dst=cs.lch)
    assert alch[0] >= 0
    assert _near(alch, lch, (1.0, 1.0, 0.25))


@pytest.mark.parametrize("pair", FIXTURES)
def test_lch_roundtrip(pair):
    rgb, lch = pair
    argb = convert(*convert(*rgb, src=cs.rgb, dst=cs.lch), src=cs.lch, dst=cs.rgb)
    for v in argb:
        assert -0.0001 < v < 1.0001
    assert _near(argb, rgb, 0.1)


@pytest.mark.parametrize("pair", FIXTURES)
def test_lch2rgb(pair):
    rgb, lch = pair
    assert _near(convert(*lch, src=cs.lch, dst=cs.rgb), rgb, (1.0, 1.0, 0.1))


@pytest.mark.parametrize("pair", FIXTURES)
def test_arr_matches_scalar(pair):
    rgb, lch = pair
    assert np.allclose(
        convert_arr(_make_array(*rgb), cs.rgb, cs.lch), _make_array(*lch), atol=0.2
    )
    assert np.allclose(
        convert_arr(_make_array(*lch), cs.lch, cs.rgb), _make_array(*rgb), atol=0.2
    )


@pytest.mark.parametrize("pair", FIXTURES)
def test_saturation_identity(pair):
    rgb, _ = pair
    arr = _make_array(*rgb)
    assert np.allclose(saturate_rgb(arr, 1.0), arr, atol=0.2)


def test_saturation_zero_is_gray():
    sat = saturate_rgb(_make_array(0.392156, 0.776470, 0.164705), 0.0)
    assert abs(sat[0, 0, 0] - sat[1, 0, 0]) < 0.1
    assert abs(sat[1, 0, 0] - sat[2, 0, 0]) < 0.1


def test_saturation_golden():
    # reference tests/test_colorspace.py:130-137
    assert np.allclose(
        saturate_rgb(_make_array(0.392156, 0.776470, 0.164705), 1.1),
        _make_array(0.3425, 0.78372, 0.0),
        atol=0.2,
    )
    assert np.allclose(
        saturate_rgb(_make_array(0.0392, 0.1960, 0.3529), 1.25),
        _make_array(0.0456, 0.1929, 0.3941),
        atol=0.2,
    )


def test_bad_array_bands():
    bad = np.random.random((2, 3, 3))
    with pytest.raises(ValueError, match="3 bands"):
        saturate_rgb(bad, 1.1)
    with pytest.raises(ValueError, match="3 bands"):
        convert_arr(bad, cs.rgb, cs.lch)


def test_bad_array_dims():
    bad = np.random.random((3, 3))
    with pytest.raises(ValueError, match="wrong number of dimensions"):
        saturate_rgb(bad, 1.1)
    with pytest.raises(ValueError, match="wrong number of dimensions"):
        convert_arr(bad, cs.rgb, cs.lch)


def test_bad_array_type():
    bad = np.random.random((3, 3, 3)).astype("uint8")
    with pytest.raises(ValueError, match="dtype mismatch"):
        saturate_rgb(bad, 1.1)
    with pytest.raises(ValueError, match="dtype mismatch"):
        convert_arr(bad, cs.rgb, cs.lch)


def test_bad_colorspaces():
    arr = np.random.random((3, 3))
    with pytest.raises(ValueError):
        convert_arr(arr, src="FOO", dst="RGB")
    with pytest.raises(ValueError):
        convert_arr(arr, src=999, dst=999)
    with pytest.raises(ValueError):
        convert(0.1, 0.1, 0.1, src="FOO", dst="RGB")
    with pytest.raises(ValueError):
        convert(0.1, 0.1, 0.1, src=999, dst=999)
    with pytest.raises(AttributeError):
        convert(0.1, 0.1, 0.1, src=cs.foo, dst=cs.bar)


def test_string_colorspace_accepted():
    a = convert(0.2, 0.3, 0.4, src="rgb", dst="lch")
    b = convert(0.2, 0.3, 0.4, src=cs.rgb, dst=cs.lch)
    assert a == b


RGB_VALS = [0.0, 0.01, 0.3, 0.5, 0.7, 0.99, 1.0]


@pytest.mark.parametrize("dst", [v for v in cs if v is not cs.rgb])
def test_rgb_roundtrip_grid(dst):
    # 343-color grid, reference tests/test_colorspace.py:224-236, tol 0.1
    failures = []
    for color in product(RGB_VALS, repeat=3):
        other = convert(*color, src=cs.rgb, dst=dst)
        rt = convert(*other, src=dst, dst=cs.rgb)
        if not _near(rt, color, 0.1):
            failures.append((color, rt))
    assert not failures, failures[:5]


def test_scalar_vs_vectorized_exact():
    # the scalar API and the (3,N) vectorized path must agree bit-for-bit —
    # this is what makes per-tile parallel output == serial oracle output
    rng = np.random.default_rng(42)
    arr = rng.random((3, 8, 8))
    out = convert_arr(arr, cs.rgb, cs.lch)
    for i in range(8):
        for j in range(8):
            s = convert(arr[0, i, j], arr[1, i, j], arr[2, i, j], cs.rgb, cs.lch)
            assert s == (out[0, i, j], out[1, i, j], out[2, i, j])


def test_lch_hue_is_radians():
    # pure red: colormath gives H ≈ 40 degrees; we must get ≈ 0.7 radians
    _, _, h = convert(1.0, 0, 0, src=cs.rgb, dst=cs.lch)
    assert abs(h % (2 * math.pi) - math.radians(40.0)) < 0.05
