"""Diagnostics, metrics, IO and timing utilities."""

from particle_filters_tpu.utils.diagnostics import (
    coverage_95,
    nees,
    omat,
    rmse,
    mae,
    mse,
)
from particle_filters_tpu.utils.timing import Timer, timed

__all__ = ["coverage_95", "nees", "omat", "rmse", "mae", "mse", "Timer", "timed"]
