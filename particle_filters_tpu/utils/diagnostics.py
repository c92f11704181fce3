"""Filtering metrics: RMSE / MAE / MSE, NEES, coverage, OMAT.

The reference computes these inline in tests and notebooks
(RMSE: ``simulator_Lorenz_96.py:440``; NEES/coverage:
``notebooks/kalman_filter_LGSSM.ipynb``; OMAT: the multi-target acoustic
tracking notebook). Centralized and vectorized here.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


def rmse(estimate: jax.Array, truth: jax.Array) -> jax.Array:
    """Root mean squared error over all elements."""
    return jnp.sqrt(jnp.mean((jnp.asarray(estimate) - jnp.asarray(truth)) ** 2))


def mae(estimate: jax.Array, truth: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(jnp.asarray(estimate) - jnp.asarray(truth)))


def mse(estimate: jax.Array, truth: jax.Array) -> jax.Array:
    return jnp.mean((jnp.asarray(estimate) - jnp.asarray(truth)) ** 2)


def nees(means: jax.Array, covs: jax.Array, truth: jax.Array) -> jax.Array:
    """Normalized estimation error squared per step: eᵀP⁻¹e, e = mean−truth.

    For a consistent filter E[NEES] = nx. Shapes: (T, nx), (T, nx, nx),
    (T, nx) → (T,).
    """
    diff = means - truth
    return jax.vmap(lambda d, P: d @ jnp.linalg.solve(P, d))(diff, covs)


def coverage_95(means: jax.Array, covs: jax.Array, truth: jax.Array) -> jax.Array:
    """Fraction of steps whose NEES falls inside the 95% chi-square interval
    for nx degrees of freedom."""
    from scipy.stats import chi2

    nx = means.shape[-1]
    lo, hi = chi2.ppf(0.025, df=nx), chi2.ppf(0.975, df=nx)
    n = nees(means, covs, truth)
    return jnp.mean(((n >= lo) & (n <= hi)).astype(jnp.float32))


def omat(est_positions, true_positions, p: int = 1) -> float:
    """OMAT (Optimal Mass Transfer) metric for multi-target tracking:
    min over target-assignment permutations of the mean p-norm position
    error. Shapes: (C, 2) vs (C, 2). Used for MAT benchmark parity
    (BASELINE.md: avg OMAT for LEDH/EDH/EKF/UKF).

    Host-side (itertools over C! permutations; C = 4 in the benchmark).
    """
    est = np.asarray(est_positions, np.float64)
    tru = np.asarray(true_positions, np.float64)
    C = est.shape[0]
    best = np.inf
    for perm in itertools.permutations(range(C)):
        d = np.linalg.norm(est[list(perm)] - tru, axis=-1) ** p
        best = min(best, float(np.mean(d) ** (1.0 / p)))
    return best
