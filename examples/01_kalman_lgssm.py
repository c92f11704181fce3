#!/usr/bin/env python
"""Kalman filtering of a simulated LGSSM: NEES consistency, RMSE, coverage.

Script equivalent of reference ``notebooks/kalman_filter_LGSSM.ipynb``
(reported there: mean NEES 2.189, 10-seed MC RMSE 0.1915, Joseph == standard).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax.numpy as jnp
import numpy as np

from particle_filters_tpu.models import kalman_filter_general
from particle_filters_tpu.simulators import simulate_lgssm
from particle_filters_tpu.utils import coverage_95, nees, rmse

# README §4 system of the reference
A = np.array([[0.9, 0.5], [0.0, 0.7]], np.float32)
B = np.diag([np.sqrt(0.05), np.sqrt(0.02)]).astype(np.float32)
C = np.eye(2, dtype=np.float32)
D = (np.sqrt(0.1) * np.eye(2)).astype(np.float32)
Sigma = np.eye(2, dtype=np.float32)
Q, R = B @ B.T, D @ D.T

rmses, neeses, covs = [], [], []
for seed in [42, 7, 123, 2024, 9999, 1, 2, 3, 4, 5]:
    data = simulate_lgssm(A, B, C, D, Sigma, 1000, seed=seed)
    res = kalman_filter_general(
        data.Y, A, C, np.eye(2, dtype=np.float32), Q, R,
        x0=np.zeros(2, np.float32), P0=Sigma, use_joseph=True,
    )
    rmses.append(float(rmse(res.x_filt, data.X)))
    neeses.append(float(jnp.mean(nees(res.x_filt, res.P_filt, data.X))))
    covs.append(float(coverage_95(res.x_filt, res.P_filt, data.X)))

print(f"10-seed Monte Carlo (T=1000, nx=2):")
print(f"  RMSE      : {np.mean(rmses):.4f}  (reference: 0.1915)")
print(f"  mean NEES : {np.mean(neeses):.3f}   (expected ≈ 2.0; reference: 2.189)")
print(f"  95% cover : {np.mean(covs)*100:.1f}%  (reference: 93.5%)")
