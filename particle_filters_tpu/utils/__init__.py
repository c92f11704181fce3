"""Diagnostics, metrics, IO and timing utilities."""

from particle_filters_tpu.utils.diagnostics import (
    coverage_95,
    degeneracy_report,
    max_weight,
    nees,
    omat,
    rmse,
    mae,
    mse,
    unique_fraction,
    weight_entropy,
    weight_gini,
)
from particle_filters_tpu.utils.timing import Timer, timed

__all__ = [
    "coverage_95",
    "degeneracy_report",
    "max_weight",
    "nees",
    "omat",
    "rmse",
    "mae",
    "mse",
    "unique_fraction",
    "weight_entropy",
    "weight_gini",
    "Timer",
    "timed",
]
