#!/usr/bin/env python
"""SPF Example 2: 9-state angle-only tracking, SPF vs SIR PF over 20 MC runs.

Script equivalent of reference ``notebooks/SPF_results_reproduction_example2.ipynb``
(paper: "Stiffness Mitigation in Stochastic Particle Flow Filters", example 2):

  * dynamics ds = A s dt with the 9×9 three-block chain A (γ = 1e-2),
  * angle-only measurement z = [atan2(x, y), atan2(z, r_xy)] + v, R = 1e-6 I,
  * SPF (N = 100 particles, 300 λ-steps, μ = 1e-5) with optimal-β* and
    linear-β schedules, using per-step local linearization of h around the
    predicted mean (the notebook's innovation form
    z_adj = z − (h(x̄) − H x̄)), against
  * a SIR PF with N = 10,000 particles on the exact nonlinear likelihood.

Reports position / velocity / acceleration RMSE averaged over 20 Monte-Carlo
runs (notebook: SPF-optimal ≲ SPF-linear ≪ SIR at equal wall-time budget).

TPU-first: the notebook's inner double loop (time × λ) becomes a
``lax.scan`` over time whose body runs the traced SPF (its λ loop is
itself a ``lax.scan``); the measurement Jacobian comes from ``jax.jacfwd``
instead of finite differences; and all 20 MC runs are one ``vmap`` — the
optimal-β* solver's while-free multisection root find (r4 default)
composes with outer vmap/scan levels on TPU, which the old bisection
while_loop could not (it hard-faulted this libtpu; see the launch-site
comment).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # The env var alone loses to an already-registered TPU plugin; forcing
    # CPU needs the config knob too (see CLAUDE.md / tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from particle_filters_tpu.models import ParticleFilter
from particle_filters_tpu.models.stochastic_particle_filter import (
    LinearGaussianBayes,
    run_generalized_spf,
)

T_STEPS, DT = 50, 0.1
N_RUNS = 20
GAMMA, MU = 1e-2, 1e-5
N_SPF, N_LAMBDA = 100, 300
N_SIR = 10_000

I3, Z3 = np.eye(3), np.zeros((3, 3))
A = GAMMA * np.block([[-I3, I3, Z3], [Z3, -I3, I3], [Z3, Z3, -I3]])
S_TRUE0 = jnp.array([40.0, 40.0, 40.0, 8.0, 0.0, -3.0, 0.0, 0.0, 0.0])
S_PRIOR0 = jnp.array([50.0, 50.0, 10.0, 10.0, 40.0, 0.0, 0.0, 0.0, 0.0])
P_PRIOR0 = jnp.asarray(np.diag([10.0] * 3 + [1e4] * 3 + [10.0] * 3))
R = 1e-6 * jnp.eye(2)
# The notebook's fixed per-step update covariance ("balances prediction and
# measurement" — run_spf_filter_example2).
P_UPDATE = jnp.asarray(np.diag([5.0] * 3 + [50.0] * 3 + [5.0] * 3))
A_j = jnp.asarray(A)


def h_meas(s):
    """Azimuth/elevation of the target from a sensor at the origin."""
    x, y, z = s[0], s[1], s[2]
    return jnp.array([jnp.arctan2(x, y), jnp.arctan2(z, jnp.hypot(x, y))])


def simulate(key):
    """Deterministic Euler trajectory + noisy angle measurements (T, 2)."""
    def body(s, k):
        s = s + A_j @ s * DT
        z = h_meas(s) + jax.random.multivariate_normal(k, jnp.zeros(2), R)
        return s, (s, z)

    _, (traj, zs) = jax.lax.scan(body, S_TRUE0, jax.random.split(key, T_STEPS))
    return jnp.concatenate([S_TRUE0[None], traj]), zs


def spf_filter(key, zs, beta_mode):
    """Sequential SPF with per-step local linearization (notebook's
    run_spf_filter_example2)."""
    def body(x_est, inp):
        k, z = inp
        x_pred = x_est + A_j @ x_est * DT
        H = jax.jacfwd(h_meas)(x_pred)
        z_adj = z - (h_meas(x_pred) - H @ x_pred)
        model = LinearGaussianBayes.create(x_pred, P_UPDATE, H, R, z_adj)
        _, x_hat, _ = run_generalized_spf(
            model, N=N_SPF, n_steps=N_LAMBDA, beta_mode=beta_mode,
            mu=MU, Q_mode="inv_M", key=k,
        )
        return x_hat, x_hat

    _, ests = jax.lax.scan(body, S_PRIOR0, (jax.random.split(key, T_STEPS), zs))
    return jnp.concatenate([S_PRIOR0[None], ests])


def sir_filter(key, zs):
    pf = ParticleFilter(
        g=lambda x, u: x + A_j @ x * DT,
        h=h_meas,
        Q=1e-4 * jnp.eye(9),
        R=R,
        Np=N_SIR,
        resample_thresh=0.5,
        regularize_after_resample=True,
    )
    k0, k1 = jax.random.split(key)
    st = pf.initialize(k0, S_PRIOR0, P_PRIOR0)
    _, hist = pf.run(k1, st, zs)
    return jnp.concatenate([S_PRIOR0[None], hist["mean"]])


def one_run(key):
    k_sim, k_opt, k_lin, k_sir = jax.random.split(key, 4)
    traj, zs = simulate(k_sim)
    return traj, {
        "spf_optimal": spf_filter(k_opt, zs, "optimal"),
        "spf_linear": spf_filter(k_lin, zs, "linear"),
        "sir_pf": sir_filter(k_sir, zs),
    }


keys = jax.random.split(jax.random.PRNGKey(100), N_RUNS)
t0 = time.perf_counter()
# All 20 MC runs are ONE vmap: the optimal-beta* solver's default
# multisection root find (r4) is while-free, so the per-step solve
# composes with the outer time-scan AND this vmap on TPU. (The r3
# bisection solver's while_loop hard-faulted XLA:TPU under any extra
# iteration level, which forced a host loop here — that workaround is
# retired; `beta_solver="bisection"` would still need it.)
traj, ests = jax.jit(jax.vmap(one_run))(keys)
jax.block_until_ready(traj)
wall = time.perf_counter() - t0

blocks = {"position": slice(0, 3), "velocity": slice(3, 6), "acceleration": slice(6, 9)}
print(f"SPF Example 2 — {N_RUNS} MC runs, T={T_STEPS}, wall {wall:.1f}s total")
print(f"{'block':14s} {'SPF opt-β*':>11s} {'SPF lin-β':>10s} {'SIR PF':>9s}")
for name, sl in blocks.items():
    row = []
    for f in ("spf_optimal", "spf_linear", "sir_pf"):
        err = ests[f][..., sl] - traj[..., sl]  # (runs, T+1, 3)
        row.append(float(jnp.sqrt((err**2).sum(-1)).mean()))
    print(f"{name:14s} {row[0]:11.4f} {row[1]:10.4f} {row[2]:9.4f}")
print(f"(particles: SPF {N_SPF}, SIR {N_SIR}; λ-steps {N_LAMBDA}, μ={MU})")
