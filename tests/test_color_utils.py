"""Dtype scaling + magick translation parity (reference tests/test_utils.py)."""

import numpy as np

from rio_color_ray.color import magick_to_rio, math_type, scale_dtype, to_math_type


def _arr():
    return (
        np.array(
            [[[1, 2], [3, 4]], [[5, 6], [7, 8]], [[9, 10], [11, 12]], [[0, 0], [0, 0]]]
        ).astype("uint8")
        * 10
    )


def test_to_math_type():
    x = to_math_type(_arr())
    assert x.dtype == math_type
    assert x.max() <= 1.0
    assert x.min() >= 0.0


def test_scale_dtype():
    arr = np.array([0.0, 1.0]).astype(math_type)
    assert scale_dtype(arr, "uint8").max() == 255
    assert scale_dtype(arr, "uint8").min() == 0
    assert scale_dtype(arr, "uint16").max() == 65535


def test_scale_round_trip_exact():
    # truncation semantics make this an exact round trip
    # (reference tests/test_utils.py:34-37)
    a = _arr()
    assert np.array_equal(a, scale_dtype(to_math_type(a), a.dtype))
    b = (np.arange(256, dtype=np.uint8)).reshape(1, 16, 16)
    assert np.array_equal(b, scale_dtype(to_math_type(b), b.dtype))


def test_magick_to_rio_golden():
    # reference tests/test_utils.py:40-62
    ops = magick_to_rio(
        "-channel B -sigmoidal-contrast 4 -gamma 0.95 "
        "-channel r -gamma 1.10 "
        "-channel rgb -sigmoidal-contrast 1x55% "
        "-channel G -gamma 0.9 "
        "-modulate 100,125 "
        "+channel -sigmoidal-contrast 3,40% "
        "-modulate 222,135 "
    )
    assert ops == " ".join(
        [
            "sigmoidal B 4 0.5",
            "gamma B 0.95",
            "gamma R 1.10",
            "sigmoidal RGB 1 0.55",
            "gamma G 0.9",
            "saturation 1.25",
            "sigmoidal RGB 3 0.4",
            "saturation 1.35",
        ]
    )
