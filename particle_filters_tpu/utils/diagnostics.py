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


def weight_entropy(log_weights: jax.Array, normalized: bool = True) -> jax.Array:
    """Shannon entropy of normalized particle weights, H = −Σ wᵢ log wᵢ.

    Computed from *log*-weights (the framework's native domain) so degenerate
    clouds never hit log(0). With ``normalized`` the value is divided by
    log(N), mapping uniform → 1 and a point mass → 0.

    Reference analog: ``compute_weight_entropy`` in
    ``notebooks/particle_filter_NLNGSSM.ipynb`` (degeneracy analysis phase 1),
    which works on linear weights with a +1e-300 guard.
    """
    lw = jnp.asarray(log_weights)
    lw = lw - jax.scipy.special.logsumexp(lw, axis=-1, keepdims=True)
    w = jnp.exp(lw)
    h = -jnp.sum(jnp.where(w > 0, w * lw, 0.0), axis=-1)
    if normalized:
        n = lw.shape[-1]
        if n == 1:
            # log(N) = 0: a single particle is trivially "uniform".
            return jnp.ones_like(h)
        h = h / jnp.log(n)
    return h


def weight_gini(log_weights: jax.Array) -> jax.Array:
    """Gini coefficient of the particle weights ∈ [0, 1); higher ⇒ more
    degenerate (a few weights dominate). Uses the sorted-index formula
    G = (2 Σᵢ i·w₍ᵢ₎)/(N Σ w) − (N+1)/N on normalized weights.

    Reference analog: ``compute_gini_coefficient``
    (``notebooks/particle_filter_NLNGSSM.ipynb``).
    """
    lw = jnp.asarray(log_weights)
    lw = lw - jax.scipy.special.logsumexp(lw, axis=-1, keepdims=True)
    w = jnp.sort(jnp.exp(lw), axis=-1)
    n = w.shape[-1]
    idx = jnp.arange(1, n + 1, dtype=w.dtype)
    return (2.0 * jnp.sum(idx * w, axis=-1)) / n - (n + 1.0) / n


def max_weight(log_weights: jax.Array) -> jax.Array:
    """Largest normalized particle weight; → 1 under total degeneracy."""
    lw = jnp.asarray(log_weights)
    lw = lw - jax.scipy.special.logsumexp(lw, axis=-1, keepdims=True)
    return jnp.exp(jnp.max(lw, axis=-1))


def unique_fraction(ancestors: jax.Array) -> jax.Array:
    """Fraction of distinct ancestor indices after a resample — the cloud-
    diversity proxy the reference tracks as "# unique particles"
    (``notebooks/particle_filter_NLNGSSM.ipynb`` phase 1). Gather-free:
    scatter-add ones onto an occupancy vector and count the nonzeros.

    Shape: (N,) int ancestors → scalar in (0, 1].
    """
    a = jnp.asarray(ancestors)
    n = a.shape[-1]
    occupancy = jnp.zeros((n,), jnp.int32).at[a].add(1, mode="drop")
    return jnp.mean((occupancy > 0).astype(jnp.float32))


def degeneracy_report(log_weights_history: jax.Array) -> dict:
    """Stack the per-step degeneracy metrics for a (T, N) log-weight history:
    ESS, normalized entropy, Gini, and max weight — the notebook's "what to
    measure each time step" list, as one vmapped pass."""
    lw = jnp.asarray(log_weights_history)
    norm = lw - jax.scipy.special.logsumexp(lw, axis=-1, keepdims=True)
    ess = jnp.exp(-jax.scipy.special.logsumexp(2.0 * norm, axis=-1))
    return {
        "ess": ess,
        "entropy": weight_entropy(lw),
        "gini": weight_gini(lw),
        "max_weight": max_weight(lw),
    }


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
