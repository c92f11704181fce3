"""Slope-profile the SNLG d=64 UKF path (VERDICT r2 weak #5).

The SNLG UKF benchmark (100 vmapped trials, T=50, d=64) runs at 0.75 s —
only 29x over the reference CPU loop vs 200-9000x elsewhere. Suspects,
timed separately inside scans (anti-DCE carries):

  full    the exact benchmark computation (vmapped UKF run)
  chol    2 batched (100, 64, 64) Cholesky factorizations per step
  solve   1 batched cho_solve (64 rhs) per step
  prop    sigma-point build + vmapped propagation + UT einsums, NO chol
          (identity factor) — the remainder of the step
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from particle_filters_tpu.core.linalg import chol_with_jitter, symmetrize
from particle_filters_tpu.models import UnscentedKalmanFilter, make_ukf_state

D = 64
TRIALS = 100
T = 50
ALPHA_DYN = 0.9


def slope(label, build_loop, m_lo=2, m_hi=6, reps=3):
    f_lo, f_hi = build_loop(m_lo), build_loop(m_hi)
    float(f_lo())
    float(f_hi())
    ts_lo, ts_hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f_lo())
        ts_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f_hi())
        ts_hi.append(time.perf_counter() - t0)
    per = (min(ts_hi) - min(ts_lo)) / (m_hi - m_lo)
    print(
        f"{label}: {per*1e3:.3f} ms/exec  "
        f"(lo {min(ts_lo)*1e3:.1f} ms, hi {min(ts_hi)*1e3:.1f} ms)",
        flush=True,
    )


def _snlg_cov():
    # SE-kernel covariance like the SNLG simulator (d=64 grid)
    g = int(np.sqrt(D))
    xs, ys = np.meshgrid(np.arange(g), np.arange(g))
    pts = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    return (3.0 * np.exp(-d2 / 20.0) + 0.01 * np.eye(D)).astype(np.float32)


def main():
    which = set(sys.argv[1:]) or {"full", "chol", "solve", "prop"}
    Sigma = jnp.asarray(_snlg_cov())
    R = 4.0 * jnp.eye(D, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    Z = jax.random.normal(key, (TRIALS, T, D), jnp.float32)

    ukf = UnscentedKalmanFilter(
        lambda x, u: ALPHA_DYN * x, lambda x: x, Sigma, R, alpha=1.0
    )

    if "full" in which:

        def build_full(m):
            @jax.jit
            def run():
                def once(c, i):
                    _, means, _ = jax.vmap(
                        lambda z: ukf.run(make_ukf_state(jnp.zeros(D), Sigma), z)
                    )(Z * (1.0 + 1e-9 * c))
                    return c + means[0, -1, 0], None

                c, _ = jax.lax.scan(once, jnp.float32(0.0), jnp.arange(m))
                return c

            return run

        slope("full vmapped UKF run (T=50) ", build_full, m_lo=1, m_hi=3)

    # per-step primitives, scanned T times, batch TRIALS
    P0 = jnp.broadcast_to(Sigma, (TRIALS, D, D))

    if "chol" in which:

        def build_chol(m):
            @jax.jit
            def run():
                def step(P, _):
                    L1 = jax.vmap(chol_with_jitter)(P)
                    L2 = jax.vmap(chol_with_jitter)(P + 0.01 * jnp.eye(D))
                    P2 = P + 1e-9 * (L1 + L2)
                    return P2, None

                def once(c, i):
                    P, _ = jax.lax.scan(step, P0 * (1.0 + 1e-9 * c), None, length=T)
                    return c + P[0, 0, 0], None

                c, _ = jax.lax.scan(once, jnp.float32(0.0), jnp.arange(m))
                return c

            return run

        slope("2x batched chol(64) x T     ", build_chol, m_lo=1, m_hi=3)

    if "solve" in which:
        L0 = jnp.linalg.cholesky(Sigma + 0.01 * jnp.eye(D))

        def build_solve(m):
            @jax.jit
            def run():
                def step(B, _):
                    X = jax.vmap(
                        lambda b: jax.scipy.linalg.cho_solve((L0, True), b)
                    )(B)
                    return B + 1e-9 * X, None

                def once(c, i):
                    B, _ = jax.lax.scan(
                        step, P0 * (1.0 + 1e-9 * c), None, length=T
                    )
                    return c + B[0, 0, 0], None

                c, _ = jax.lax.scan(once, jnp.float32(0.0), jnp.arange(m))
                return c

            return run

        slope("batched cho_solve(64) x T   ", build_solve, m_lo=1, m_hi=3)

    if "prop" in which:
        gamma = float(np.sqrt(D))
        Wc = jnp.full((2 * D + 1,), 1.0 / (2 * D), jnp.float32)
        L_fixed = jnp.linalg.cholesky(Sigma + 0.01 * jnp.eye(D))

        def build_prop(m):
            @jax.jit
            def run():
                def step(ms, _):
                    # sigma points for the whole batch WITHOUT a chol
                    offs = gamma * L_fixed.T  # (64, 64)
                    X = jnp.concatenate(
                        [
                            ms[:, None, :],
                            ms[:, None, :] + offs[None, :, :],
                            ms[:, None, :] - offs[None, :, :],
                        ],
                        axis=1,
                    )  # (B, 129, 64)
                    Xp = ALPHA_DYN * X
                    mean = Xp[:, 0] + 0.5 / D * jnp.sum(Xp[:, 1:] - Xp[:, :1], 1)
                    DX = Xp - mean[:, None, :]
                    P = jnp.einsum("i,bij,bik->bjk", Wc, DX, DX)
                    return mean + 1e-9 * P[:, 0, :], None

                def once(c, i):
                    ms, _ = jax.lax.scan(
                        step,
                        jnp.zeros((TRIALS, D)) + 1e-9 * c,
                        None,
                        length=T,
                    )
                    return c + ms[0, 0], None

                c, _ = jax.lax.scan(once, jnp.float32(0.0), jnp.arange(m))
                return c

            return run

        slope("sigma+prop+UT einsum x T    ", build_prop, m_lo=1, m_hi=3)


if __name__ == "__main__":
    main()
