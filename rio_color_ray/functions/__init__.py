"""Derived color functions (reference scripts/ analog)."""

from .optimize import ColorOptimizer, band_histograms, histogram_distance, optimize_ops

__all__ = ["ColorOptimizer", "band_histograms", "histogram_distance", "optimize_ops"]
