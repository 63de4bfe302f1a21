"""Color kernel library — numerically exact, vectorized, zero Ray.

Reimplements the full operator surface of mapbox/rio-color
(/root/reference/rio_color/{operations.py,colorspace.pyx,utils.py}) in pure
numpy so the same code runs per-tile inside Ray Data ``map_batches`` stages
and as a scalar oracle in tests. The golden values of the reference's own
pytest suite (tests/test_operations.py, tests/test_colorspace.py) pass
unchanged against this module.
"""

from .utils import math_type, epsilon, to_math_type, scale_dtype, magick_to_rio
from .colorspace import ColorSpace, convert, convert_arr, saturate_rgb
from .operations import (
    sigmoidal,
    gamma,
    saturation,
    simple_atmo,
    simple_atmo_opstring,
    parse_operations,
)

__all__ = [
    "math_type",
    "epsilon",
    "to_math_type",
    "scale_dtype",
    "magick_to_rio",
    "ColorSpace",
    "convert",
    "convert_arr",
    "saturate_rgb",
    "sigmoidal",
    "gamma",
    "saturation",
    "simple_atmo",
    "simple_atmo_opstring",
    "parse_operations",
]
