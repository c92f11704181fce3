"""Pallas TPU kernels for the irregular hot ops.

``resample_pallas``: blocked, gather-free systematic resampling — the one
op in the SMC loop that XLA cannot map onto the VPU/MXU by itself (its
1e6-element gathers/scatters lower to ~7-9 ms serial scalar loops on TPU
v5e; the blocked kernel runs the same op in ~0.2 ms).
"""

from particle_filters_tpu.ops.resample_pallas import (
    systematic_resample_values_blocked,
)
from particle_filters_tpu.ops.fused_pf import FusedSIRFilter

__all__ = ["systematic_resample_values_blocked", "FusedSIRFilter"]
