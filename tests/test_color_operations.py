"""Operator golden tests — the reference's own numbers must pass unchanged.

Golden values from /root/reference/tests/test_operations.py (cited per test).
Assertions here are strict two-sided |diff| checks (the reference's were
one-sided and thus weaker).
"""

import numpy as np
import pytest

from rio_color_ray.color import (
    gamma,
    parse_operations,
    saturation,
    sigmoidal,
    simple_atmo,
    simple_atmo_opstring,
)


def test_sigmoidal_golden(arr):
    # reference test_operations.py:48-58
    assert abs(sigmoidal(arr, 10, 0.15)[0][0][0] - 0.08056034) < 1e-4
    assert abs(sigmoidal(arr, -10, 0.15)[0][0][0] - 0.020186627) < 1e-4
    assert abs(sigmoidal(arr, 10, 0)[0][0][0] - 0.19362122) < 1e-4


def test_sigmoidal_zero_contrast_identity(arr):
    # reference test_operations.py:60-62 — same values AND same object
    x = sigmoidal(arr, 0, 0.15)
    assert np.array_equal(x, arr)
    assert x is arr


def test_sigmoidal_errors(arr):
    with pytest.raises(ValueError):
        sigmoidal(arr, 100, -0.5)
    bad = arr.copy()
    bad[0][0][0] = 1.0
    bad[0][0][1] = 2.0
    with pytest.raises(ValueError):
        sigmoidal(bad, 10, 0.5)


def test_gamma_golden(arr):
    # reference test_operations.py:75-77
    assert abs(gamma(arr, 0.95)[0][0][0] - 0.033069782) < 1e-4


def test_gamma_errors(arr):
    for g in (-2.0, -0.001, 0.0, np.nan):
        with pytest.raises(ValueError):
            gamma(arr, g)
    with pytest.raises(ValueError):
        gamma(arr * -1, 2.2)


def test_saturation_golden(arr):
    # The reference assert (test_operations.py:91-93) is ONE-SIDED
    # (``x - 0.1586 < 1e-4``) and therefore vacuous: the true value of
    # chroma*50 at this pixel clamps r to 0.0 in _xyz_to_rgb
    # (colorspace.pyx:411-423), verified against an independent scalar
    # transliteration of the pyx kernels. Assert both the reference's
    # literal (one-sided) contract and our exact value.
    x = saturation(arr, 50)
    assert x[0][0][0] - 0.15860622 < 1e-4  # the reference's literal assert
    assert np.allclose(x[:, 0, 0], [0.0, 1.0, 1.0])
    # a sane proportion, cross-checked against the scalar oracle
    y = saturation(arr, 1.5)
    assert np.allclose(
        y[:, 0, 0], [0.0, 0.20045495266426783, 0.4359604341404077], atol=1e-12
    )


def test_saturation_requires_rgb(arr_rgba):
    with pytest.raises(ValueError):
        saturation(arr_rgba, 50)
    with pytest.raises(ValueError):
        saturation(arr_rgba[0:2], 50)


def test_atmo_golden(arr):
    # reference test_operations.py:104-106
    assert abs(simple_atmo(arr, 0.03, 10, 0.15)[0][0][0] - 0.080560341) < 1e-4
    with pytest.raises(ValueError):
        simple_atmo(arr, 2.0, 10, 0.15)
    with pytest.raises(ValueError):
        simple_atmo(arr, 0.03, 1000, -0.15)


def test_atmo_preserves_alpha(arr_rgba):
    out = simple_atmo(arr_rgba, 0.03, 10, 0.15)
    assert out.shape[0] == 4
    assert np.array_equal(out[3], arr_rgba[3])


def test_parse_single_ops(arr):
    f = parse_operations("gamma rgb 0.95")[0]
    assert np.array_equal(f(arr), gamma(arr, 0.95))
    f = parse_operations("sigmoidal rgb 5 0.53")[0]
    assert np.array_equal(f(arr), sigmoidal(arr, contrast=5, bias=0.53))
    f = parse_operations("saturation 1.25")[0]
    assert np.allclose(f(arr), saturation(arr, 1.25))


def test_parse_multi_op_order(arr):
    f1, f2 = parse_operations("gamma rgb 0.95 sigmoidal rgb 35 0.13")
    assert np.array_equal(
        f2(f1(arr)), sigmoidal(gamma(arr, g=0.95), contrast=35, bias=0.13)
    )
    # commas are optional whitespace (reference test_operations.py:134-139)
    g1, g2 = parse_operations("gamma r,g,b 0.95, sigmoidal r,g,b 35 0.13")
    assert np.array_equal(g2(g1(arr)), f2(f1(arr)))


def test_parse_band_aliases(arr):
    fa = parse_operations("gamma 1,2 0.95")[0]
    fb = parse_operations("gamma Rg 0.95")[0]
    assert np.array_equal(fa(arr), fb(arr))


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_operations("foob 123")
    with pytest.raises(ValueError):
        parse_operations("gamma 7,8,9 1.05")
    with pytest.raises(ValueError):
        parse_operations(", , ,")


def test_parse_alpha_passthrough(arr, arr_rgba):
    # reference test_operations.py:147-172
    f = parse_operations("gamma rg 0.95")[0]
    rgb, rgba = f(arr), f(arr_rgba)
    assert rgba.shape[0] == 4
    assert np.allclose(rgba[0:3], rgb[0:3])
    assert np.array_equal(rgba[3], arr_rgba[3])

    f = parse_operations("saturation 1.25")[0]
    satrgb, satrgba = f(arr), f(arr_rgba)
    assert satrgba.shape[0] == 4
    assert np.array_equal(satrgba[3], arr_rgba[3])
    assert np.allclose(satrgba[0:3], satrgb[0:3])


def test_parse_saturation_first_and_names(arr):
    f1, f2 = parse_operations("saturation 1.25 gamma rgb 0.95")
    assert np.array_equal(f2(f1(arr)), gamma(saturation(arr, 1.25), g=0.95))
    assert f1.__name__ == "saturation"
    assert f2.__name__ == "gamma"


def test_atmo_opstring_equivalence(arr):
    # reference test_operations.py:200-205 and test_cli.py:233-242
    x = simple_atmo(arr, 0.03, 10, 0.15)
    ops = simple_atmo_opstring(0.03, 10, 0.15)
    assert ops == "gamma g 0.99, gamma b 0.97, sigmoidal rgb 10 0.15"
    out = arr
    for op in parse_operations(ops):
        out = op(out)
    assert np.allclose(x, out)
