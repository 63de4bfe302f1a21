"""Dtype scaling + ImageMagick translation.

Parity targets: /root/reference/rio_color/utils.py:10-26 (math type and the
truncating int round-trip — load-bearing for uint8 tile equality) and
utils.py:29-90 (``magick_to_rio``).
"""

import re

import numpy as np

# All intermediate pixel math happens in float64 scaled to [0, 1]
# (reference: utils.py:10-12).
math_type = np.float64
epsilon = np.finfo(math_type).eps


def to_math_type(arr):
    """Scale an integer-dtype array linearly down to [0, 1] float64.

    Reference: utils.py:15-20 (divide by ``iinfo(dtype).max``).
    """
    return arr.astype(math_type) / np.iinfo(arr.dtype).max


def scale_dtype(arr, dtype):
    """Scale a [0, 1] float array linearly up to an integer dtype.

    The ``.astype`` cast TRUNCATES toward zero — not rounding. This exact
    semantic (reference: utils.py:23-26) is required for uint8 equality with
    the reference fixtures; ``scale_dtype(to_math_type(a), a.dtype) == a``
    must hold exactly.
    """
    return (arr * np.iinfo(dtype).max).astype(dtype)


_MAGICK_SPLIT = re.compile(r"[,x]+")


def magick_to_rio(convert_opts):
    """Translate a limited ImageMagick ``convert`` option string to the ops DSL.

    Supported subset (reference: utils.py:29-90): ``-channel X`` selects the
    band state for subsequent ops, ``+channel`` resets it to RGB,
    ``-sigmoidal-contrast CxB%`` (bias defaults to 0.5, a ``%`` suffix means
    /100), ``-gamma G``, and ``-modulate H,S`` which maps to
    ``saturation S/100``. Golden translation asserted by
    tests/test_utils.py (ported from reference tests/test_utils.py:40-62).
    """
    ops = []
    state = {"bands": "RGB"}

    def set_band(tok):
        state["bands"] = tok.upper()

    def emit_sigmoidal(tok):
        args = [a for a in _MAGICK_SPLIT.split(tok) if a]
        if len(args) == 1:
            bias = 0.5
        else:
            bias = float(args[1].replace("%", "")) / 100.0
        ops.append("sigmoidal {} {} {}".format(state["bands"], args[0], bias))

    def emit_gamma(tok):
        ops.append("gamma {} {}".format(state["bands"], tok))

    def emit_saturation(tok):
        args = [a for a in _MAGICK_SPLIT.split(tok) if a]
        # first value (brightness) is ignored; second is saturation percent
        ops.append("saturation {}".format(float(args[1]) / 100.0))

    flag_handlers = {
        "-sigmoidal-contrast": emit_sigmoidal,
        "-gamma": emit_gamma,
        "-modulate": emit_saturation,
        "-channel": set_band,
    }

    pending = None
    for part in convert_opts.strip().split(" "):
        if part == "+channel":
            set_band("RGB")
            pending = None
        elif part in flag_handlers:
            pending = flag_handlers[part]
        else:
            if pending is not None:
                pending(part)
            pending = None

    return " ".join(ops)
