"""Filters: KF / EKF / UKF, SIR PF, particle flows (EDH/LEDH/KPF/SPF), DPFs.

Capability parity with reference ``models/`` (SURVEY.md §2.1), rebuilt as
scan/vmap programs with explicit keys and pytree state.
"""

from particle_filters_tpu.models.kalman_filter import KFResults, kalman_filter_general
from particle_filters_tpu.models.extended_kalman_filter import (
    EKFState,
    ExtendedKalmanFilter,
    make_ekf_state,
    numerical_jacobian_g,
    numerical_jacobian_h,
)
from particle_filters_tpu.models.unscented_kalman_filter import (
    UKFState,
    UnscentedKalmanFilter,
    make_ukf_state,
)
from particle_filters_tpu.models.particle_filter import PFState, ParticleFilter

__all__ = [
    "KFResults",
    "kalman_filter_general",
    "EKFState",
    "ExtendedKalmanFilter",
    "make_ekf_state",
    "numerical_jacobian_g",
    "numerical_jacobian_h",
    "UKFState",
    "UnscentedKalmanFilter",
    "make_ukf_state",
    "PFState",
    "ParticleFilter",
]
