"""Stochastic particle flow (SPF) with generalized homotopy.

Capability parity with reference ``models/Stochastic_particle_filter.py``:
``LinearGaussianBayes`` (:12 — precisions/Hessians, score functions, analytic
Kalman posterior), spectral condition number κ₂ and its β-derivative via
eigendecomposition + eigenvector perturbation (:123-167), the "optimal"
β(λ) schedule solving β'' = µ·dκ₂/dβ with RK4 shooting + bracket expansion
+ bisection (:171-294), and the Euler-Maruyama SDE propagation with drift
K₁∇log p + K₂∇log h and diffusion Q ∈ {scaled identity, M⁻¹} (:300-411).

TPU-native design: the shooting integration is a ``lax.scan`` (one eigh per
grid point), bracket expansion and bisection are ``lax.while_loop`` /
``fori_loop`` (fully jittable — the reference shells out to host NumPy),
and the per-particle Euler-Maruyama loop (:397-404) is batched matrix
algebra over the whole cloud.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from particle_filters_tpu.core.linalg import chol_with_jitter, symmetrize, with_f32_matmuls
from particle_filters_tpu.core.structs import pytree_dataclass


@pytree_dataclass
class LinearGaussianBayes:
    """Single-update linear-Gaussian model: prior x ~ N(m0, P0), likelihood
    z|x ~ N(Hx, R) (reference :12-121). Build with :meth:`create` so the
    derived precision/Hessian fields are precomputed once."""

    m0: jax.Array  # (n,)
    P0: jax.Array  # (n, n)
    H: jax.Array  # (d, n)
    R: jax.Array  # (d, d)
    z: jax.Array  # (d,)
    P0_inv: jax.Array
    R_inv: jax.Array
    Hess_log_p0: jax.Array  # −P0⁻¹
    Hess_log_h: jax.Array  # −HᵀR⁻¹H
    M0: jax.Array  # P0⁻¹
    Mh: jax.Array  # HᵀR⁻¹H

    @classmethod
    def create(cls, m0, P0, H, R, z) -> "LinearGaussianBayes":
        m0 = jnp.asarray(m0).reshape(-1)
        z = jnp.asarray(z).reshape(-1)
        P0 = jnp.asarray(P0)
        H = jnp.asarray(H)
        R = jnp.asarray(R)
        n, d = m0.shape[0], z.shape[0]
        if P0.shape != (n, n) or H.shape != (d, n) or R.shape != (d, d):
            raise ValueError("Inconsistent shapes for LinearGaussianBayes.")
        P0_inv = chol_solve_eye(P0)
        R_inv = chol_solve_eye(R)
        Mh = symmetrize(H.T @ R_inv @ H)
        return cls(
            m0=m0,
            P0=P0,
            H=H,
            R=R,
            z=z,
            P0_inv=P0_inv,
            R_inv=R_inv,
            Hess_log_p0=-P0_inv,
            Hess_log_h=-Mh,
            M0=symmetrize(P0_inv),
            Mh=Mh,
        )

    @property
    def n(self) -> int:
        return self.m0.shape[0]

    @property
    def d(self) -> int:
        return self.z.shape[0]

    def grad_log_p0(self, x: jax.Array) -> jax.Array:
        """∇log p₀ = −P0⁻¹(x − m0); batched over leading axes (:76)."""
        return -(x - self.m0) @ self.P0_inv.T

    def grad_log_h(self, x: jax.Array) -> jax.Array:
        """∇log h = HᵀR⁻¹(z − Hx); batched over leading axes (:91)."""
        return (self.z - x @ self.H.T) @ (self.R_inv @ self.H)

    def kalman_posterior(self) -> Tuple[jax.Array, jax.Array]:
        """Exact posterior (m, P) for validation (:106)."""
        S = self.H @ self.P0 @ self.H.T + self.R
        K = self.P0 @ self.H.T @ chol_solve_eye(S)
        m_post = self.m0 + K @ (self.z - self.H @ self.m0)
        P_post = (jnp.eye(self.n, dtype=self.P0.dtype) - K @ self.H) @ self.P0
        return m_post, symmetrize(P_post)


def chol_solve_eye(a: jax.Array) -> jax.Array:
    """A⁻¹ via jittered Cholesky."""
    L = chol_with_jitter(a, initial=1e-12)
    return jax.scipy.linalg.cho_solve(
        (L, True), jnp.eye(a.shape[0], dtype=a.dtype)
    )


def kappa2_and_derivative(
    M: jax.Array, dM_dbeta: jax.Array, eps: float = 1e-12
) -> Tuple[jax.Array, jax.Array]:
    """Spectral condition number κ₂(M) and dκ₂/dβ via first-order
    eigenvalue perturbation (reference :123-167)."""
    M = symmetrize(M)
    dM = symmetrize(dM_dbeta)
    n = M.shape[0]
    w, V = jnp.linalg.eigh(M + eps * jnp.eye(n, dtype=M.dtype))
    lam_min = jnp.maximum(jnp.abs(w[0]), eps)
    lam_max = jnp.maximum(jnp.abs(w[-1]), eps)
    vmin, vmax = V[:, 0], V[:, -1]
    dlam_min = vmin @ dM @ vmin
    dlam_max = vmax @ dM @ vmax
    kappa = lam_max / lam_min
    dkappa = dlam_max / lam_min - (lam_max * dlam_min) / lam_min**2
    return kappa, dkappa


@with_f32_matmuls
def solve_beta_star_bisection(
    M0: jax.Array,
    Mh: jax.Array,
    mu: float,
    n_grid: int = 501,
    s_lo: float = -5.0,
    s_hi: float = 5.0,
    max_bracket_expand: int = 30,
    max_bisect_iter: int = 60,
    rhs_mode: str = "tabulated",
    n_beta_tab: int = 2048,
    bounded: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Optimal β(λ): shoot β'' = µ·dκ₂/dβ with β(0)=0 to hit β(1)=1
    (reference :171-294). Fully traceable: RK4 shooting is a scan, bracket
    expansion a while_loop (or a bounded fori_loop, below), bisection a
    fori_loop.

    ``rhs_mode`` selects how dκ₂/dβ is evaluated along the shooting
    trajectory:

    - ``"tabulated"`` (default): ONE batched eigh over a dense β grid on
      the clip interval [−0.5, 1.5] builds a dκ₂/dβ table; the shooting
      RK4 stages then linearly interpolate it (~10 scalar ops each). The
      reference evaluates an eigh at EVERY shooting stage
      (:225-254 × :123-167 ≈ 1.3e5 sequential n×n eigh per solve, which
      lower serially on TPU); the table is the same spectral quantity with
      interpolation error O(Δβ²) ≈ 1e-6 at the default 2048 points — far
      below the RK4 grid's own O(h²) truncation at h = 1/n_grid. Measured:
      the spf_example1 optimal row went 3.53 s → see
      ``benchmarks/profile_spf.py``.
    - ``"exact"``: the reference's per-stage eigh (bit-compatible with the
      r3 behavior; used by equivalence tests).

    ``bounded=True`` replaces the bracket-expansion ``lax.while_loop``
    with a masked ``fori_loop`` of exactly ``max_bracket_expand``
    iterations (converged iterations recompute and discard). Use it when
    this solve sits under an outer device-side iteration level on TPU —
    nesting a while_loop inside vmap/scan layers can hard-fault
    XLA:TPU with an opaque "TPU device error" (CLAUDE.md; hit by
    examples/10) — at the cost of always paying the worst-case bracket
    work. The two variants produce identical schedules
    (``tests/unit/test_spf.py`` pins it).
    """
    M0 = symmetrize(jnp.asarray(M0))
    Mh = symmetrize(jnp.asarray(Mh))
    dtype = M0.dtype
    lam = jnp.linspace(0.0, 1.0, n_grid, dtype=dtype)
    h = lam[1] - lam[0]

    b_lo, b_hi = -0.5, 1.5  # the clip interval of the rhs (reference :149)
    if rhs_mode == "tabulated":
        tab = jnp.linspace(b_lo, b_hi, n_beta_tab, dtype=dtype)
        _, dk_tab = jax.vmap(
            lambda b: kappa2_and_derivative(M0 + b * Mh, Mh)
        )(tab)
        inv_db = jnp.asarray((n_beta_tab - 1) / (b_hi - b_lo), dtype)

        def rhs(beta):
            pos = (jnp.clip(beta, b_lo, b_hi) - b_lo) * inv_db
            i0 = jnp.clip(pos.astype(jnp.int32), 0, n_beta_tab - 2)
            frac = pos - i0.astype(dtype)
            dk = dk_tab[i0] * (1.0 - frac) + dk_tab[i0 + 1] * frac
            return mu * dk

    elif rhs_mode == "exact":

        def rhs(beta):
            beta = jnp.clip(beta, b_lo, b_hi)
            _, dk = kappa2_and_derivative(M0 + beta * Mh, Mh)
            return mu * dk

    else:
        raise ValueError("rhs_mode must be 'tabulated' or 'exact'.")

    def rk4_body(carry, _):
        y1, y2 = carry
        k11, k12 = y2, rhs(y1)
        k21, k22 = y2 + 0.5 * h * k12, rhs(y1 + 0.5 * h * k11)
        k31, k32 = y2 + 0.5 * h * k22, rhs(y1 + 0.5 * h * k21)
        k41, k42 = y2 + h * k32, rhs(y1 + h * k31)
        y1n = y1 + (h / 6.0) * (k11 + 2 * k21 + 2 * k31 + k41)
        y2n = y2 + (h / 6.0) * (k12 + 2 * k22 + 2 * k32 + k42)
        return (y1n, y2n), (y1n, y2n)

    def integrate(s0):
        (bf, _), (betas, betadots) = lax.scan(
            rk4_body,
            (jnp.asarray(0.0, dtype), jnp.asarray(s0, dtype)),
            None,
            length=n_grid - 1,
        )
        beta = jnp.concatenate([jnp.zeros((1,), dtype), betas])
        betadot = jnp.concatenate([jnp.asarray(s0, dtype)[None], betadots])
        return beta, betadot

    def F(s0):
        beta, _ = integrate(s0)
        return beta[-1] - 1.0

    # Bracket expansion (reference :261-271)
    brk_init = (
        jnp.asarray(s_lo, dtype),
        jnp.asarray(s_hi, dtype),
        F(jnp.asarray(s_lo, dtype)),
        F(jnp.asarray(s_hi, dtype)),
    )
    if bounded:
        # Masked fori_loop: exactly max_bracket_expand iterations; once the
        # bracket holds a sign change the carry freezes (the speculative F
        # evals are computed and discarded — the price of a while-free
        # graph that survives outer vmap/scan levels on TPU).
        def brk_body_bounded(_, c):
            s_lo_, s_hi_, f_lo_, f_hi_ = c
            done = jnp.sign(f_lo_) != jnp.sign(f_hi_)
            s_lo2 = jnp.where(done, s_lo_, s_lo_ * 2.0)
            s_hi2 = jnp.where(done, s_hi_, s_hi_ * 2.0)
            f_lo2 = jnp.where(done, f_lo_, F(s_lo2))
            f_hi2 = jnp.where(done, f_hi_, F(s_hi2))
            return (s_lo2, s_hi2, f_lo2, f_hi2)

        s_lo_, s_hi_, f_lo_, f_hi_ = lax.fori_loop(
            0, max_bracket_expand, brk_body_bounded, brk_init
        )
    else:

        def brk_cond(c):
            s_lo_, s_hi_, f_lo_, f_hi_, it = c
            return jnp.logical_and(
                jnp.sign(f_lo_) == jnp.sign(f_hi_), it < max_bracket_expand
            )

        def brk_body(c):
            s_lo_, s_hi_, _, _, it = c
            s_lo2, s_hi2 = s_lo_ * 2.0, s_hi_ * 2.0
            return (s_lo2, s_hi2, F(s_lo2), F(s_hi2), it + 1)

        s_lo_, s_hi_, f_lo_, f_hi_, _ = lax.while_loop(
            brk_cond, brk_body, brk_init + (0,)
        )

    # Bisection (reference :277-287)
    def bis_body(_, c):
        s_lo_, s_hi_, f_lo_ = c
        s_mid = 0.5 * (s_lo_ + s_hi_)
        f_mid = F(s_mid)
        same = jnp.sign(f_mid) == jnp.sign(f_lo_)
        s_lo2 = jnp.where(same, s_mid, s_lo_)
        f_lo2 = jnp.where(same, f_mid, f_lo_)
        s_hi2 = jnp.where(same, s_hi_, s_mid)
        return (s_lo2, s_hi2, f_lo2)

    s_lo_, s_hi_, _ = lax.fori_loop(
        0, max_bisect_iter, bis_body, (s_lo_, s_hi_, f_lo_)
    )
    s_star = 0.5 * (s_lo_ + s_hi_)
    beta, betadot = integrate(s_star)
    # Enforce endpoints and clip (reference :291-294)
    beta = jnp.clip(beta.at[0].set(0.0).at[-1].set(1.0), 0.0, 1.0)
    return lam, beta, betadot


@with_f32_matmuls
def run_generalized_spf(
    model: LinearGaussianBayes,
    N: int = 2000,
    n_steps: int = 300,
    beta_mode: str = "optimal",
    mu: float = 1e-2,
    Q_mode: str = "inv_M",
    q_scale: float = 1e-2,
    seed: int = 0,
    key: Optional[jax.Array] = None,
    beta_rhs_mode: str = "tabulated",
    beta_bounded: bool = False,
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Generalized SPF: temper the prior into the posterior by integrating
    the homotopy SDE dX = [K₁∇log p + K₂∇log h] dλ + √Q dW over λ ∈ [0, 1]
    (reference ``run_generalized_spf`` :300-411).

    ``beta_rhs_mode`` / ``beta_bounded`` forward to
    :func:`solve_beta_star_bisection` (tabulated-vs-exact dκ₂/dβ; bounded
    while-free bracket for outer vmap/scan on TPU).

    Returns (final particles (N, n), mean estimate (n,), info dict with the
    λ/β/β' grids).
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    n = model.n
    dtype = model.P0.dtype

    k_init, k_noise = jax.random.split(key)
    L0 = chol_with_jitter(model.P0)
    X0 = model.m0 + jax.random.normal(k_init, (N, n), dtype) @ L0.T

    if beta_mode == "linear":
        lam_grid = jnp.linspace(0.0, 1.0, n_steps + 1, dtype=dtype)
        beta_grid = lam_grid
        betadot_grid = jnp.ones_like(lam_grid)
    elif beta_mode == "optimal":
        lam_grid, beta_grid, betadot_grid = solve_beta_star_bisection(
            model.M0, model.Mh, mu=mu, n_grid=n_steps + 1,
            rhs_mode=beta_rhs_mode, bounded=beta_bounded,
        )
    else:
        raise ValueError("beta_mode must be 'linear' or 'optimal'.")

    dlam = 1.0 / n_steps
    H0 = model.Hess_log_p0
    Hh = model.Hess_log_h
    I = jnp.eye(n, dtype=dtype)
    if Q_mode not in ("scaled_identity", "inv_M"):
        raise ValueError("Q_mode must be 'scaled_identity' or 'inv_M'.")

    noise = jax.random.normal(k_noise, (n_steps, N, n), dtype)

    def step(X, inputs):
        beta, beta_p, Z = inputs
        S = symmetrize(H0 + beta * Hh)
        # S is negative definite (−M with M SPD): factor −S.
        M = -S
        LM = chol_with_jitter(M, initial=1e-12)
        Minv = jax.scipy.linalg.cho_solve((LM, True), I)
        Sinv = -Minv
        if Q_mode == "scaled_identity":
            Q = (q_scale**2) * I
            LQ = q_scale * I
        else:  # inv_M: Q = M⁻¹ (SPD)
            Q = Minv
            LQ = chol_with_jitter(Q, initial=1e-12)
        K2 = -beta_p * Sinv
        K1 = 0.5 * Q + 0.5 * beta_p * (Sinv @ Hh @ Sinv)

        # Batched scores and drift (the reference's per-particle loop :397)
        G_h = model.grad_log_h(X)  # (N, n)
        G_p = model.grad_log_p0(X) + beta * G_h
        f = G_p @ K1.T + G_h @ K2.T
        X_new = X + dlam * f + jnp.sqrt(dlam) * (Z @ LQ.T)
        return X_new, None

    X, _ = lax.scan(
        step, X0, (beta_grid[:-1], betadot_grid[:-1], noise)
    )
    info = {"lam": lam_grid, "beta": beta_grid, "betadot": betadot_grid}
    return X, jnp.mean(X, axis=0), info
