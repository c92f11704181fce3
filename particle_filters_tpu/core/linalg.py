"""Robust SPD linear algebra: Cholesky-with-jitter, triangular solves, MVN pdfs.

The reference re-implements a "Cholesky + progressive jitter" pattern in at
least four places (``simulator/simulator_sensor_network_linear_gaussian.py:127``,
``simulator_sensor_network_skewt_dynamic.py:158``,
``models/unscented_kalman_filter.py:113``, ``models/particle_filter.py:232``).
TPU runs float32 by default, so the jitter discipline matters even more here;
these helpers centralize it as branchless ``lax``-friendly code (a fixed
unrolled retry ladder instead of a data-dependent Python loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def with_f32_matmuls(fn):
    """Trace ``fn`` under full-float32 matmul precision.

    On TPU, XLA's default f32 "matmul" runs in bf16 passes (~8 mantissa
    bits). That is fine for the particle-sized elementwise math but corrupts
    the small-matrix covariance algebra in the filters: the EDH flow on the
    acoustic-tracking benchmark diverges under bf16 (OMAT 2980 vs 6.5 with
    f32) while being bit-stable on CPU. Every filter whose step is built
    from covariance products decorates its hot methods with this. Cost is
    negligible — the affected matmuls are nx×nx with nx ≤ ~1000.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def symmetrize(a: jax.Array) -> jax.Array:
    """0.5 (A + Aᵀ) — applied after covariance updates, as the reference does
    (``models/unscented_kalman_filter.py:190``, ``models/EDH_particle_filter.py:197``)."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def chol_with_jitter(
    a: jax.Array,
    jitter: float = 0.0,
    max_tries: int = 6,
    initial: float = 1e-9,
    factor: float = 10.0,
) -> jax.Array:
    """Cholesky factor of an SPD matrix with a branchless jitter ladder.

    Tries ``chol(A + jitter·I)``; wherever that fails (NaNs in the factor),
    retries with progressively larger diagonal jitter ``initial·factor^k``.
    All ``max_tries`` factorizations are computed and the first finite one is
    selected with ``jnp.where`` — compile-time fixed shapes, no host syncs.
    Replaces the reference's Python retry loops (progressive 10× jitter,
    ``simulator_sensor_network_linear_gaussian.py:127-156``).
    """
    a = symmetrize(a)
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)

    def attempt(eps):
        return jnp.linalg.cholesky(a + (jitter + eps) * eye)

    out = attempt(0.0)
    ok = jnp.all(jnp.isfinite(out))
    for k in range(max_tries):
        eps = initial * (factor**k)
        cand = attempt(eps)
        cand_ok = jnp.all(jnp.isfinite(cand))
        out = jnp.where(ok, out, jnp.where(cand_ok, cand, out))
        ok = ok | cand_ok
    return out


def chol_solve(chol_l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b given lower Cholesky factor L (A = L Lᵀ).

    Two triangular solves — the gain computation pattern of the reference KF
    (``models/kalman_filter.py:57-77``).
    """
    y = jax.scipy.linalg.solve_triangular(chol_l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(chol_l.T, y, lower=False)


def solve_psd(a: jax.Array, b: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Solve with an SPD ``a`` via jittered Cholesky."""
    return chol_solve(chol_with_jitter(a, jitter=jitter), b)


def inv_psd(a: jax.Array, jitter: float = 0.0) -> jax.Array:
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    return chol_solve(chol_with_jitter(a, jitter=jitter), eye)


_LOG_2PI = 1.8378770664093453


def mvn_logpdf_chol(x: jax.Array, mean: jax.Array, chol_l: jax.Array) -> jax.Array:
    """log N(x; mean, L Lᵀ) given the lower Cholesky factor L.

    Vectorizes over leading axes of ``x`` (the per-particle likelihood path,
    cf. reference ``models/particle_filter.py:257-263`` which solves
    ``L_R⁻¹ diffs`` for all particles at once).
    """
    d = x.shape[-1]
    diff = x - mean
    sol = jax.scipy.linalg.solve_triangular(
        chol_l, jnp.swapaxes(jnp.atleast_2d(diff), -1, -2), lower=True
    )
    maha = jnp.sum(sol * sol, axis=-2)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(chol_l, axis1=-2, axis2=-1))))
    out = -0.5 * (maha + logdet + d * _LOG_2PI)
    return out.reshape(diff.shape[:-1])


def mvn_logpdf(x: jax.Array, mean: jax.Array, cov: jax.Array, jitter: float = 0.0) -> jax.Array:
    """log N(x; mean, cov) with jittered Cholesky."""
    return mvn_logpdf_chol(x, mean, chol_with_jitter(cov, jitter=jitter))


def diag_gaussian_logpdf(x: jax.Array, mean: jax.Array, var: jax.Array) -> jax.Array:
    """Elementwise-independent Gaussian log-density, summed over the last axis."""
    var = jnp.maximum(var, 1e-38)
    z = (x - mean) ** 2 / var
    return -0.5 * jnp.sum(z + jnp.log(var) + _LOG_2PI, axis=-1)


def cond_spd(a: jax.Array) -> jax.Array:
    """Condition number of an SPD matrix via eigvalsh (diagnostic only).

    Mirrors the reference's flow-stability diagnostics
    (``models/EDH_particle_filter.py:239-243``).
    """
    ev = jnp.linalg.eigvalsh(symmetrize(a))
    return jnp.abs(ev[-1]) / jnp.maximum(jnp.abs(ev[0]), 1e-38)
