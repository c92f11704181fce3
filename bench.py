#!/usr/bin/env python
"""Benchmark: SIR particle filter on the 1-D stochastic-volatility model.

North-star metric (BASELINE.json): particle-steps/sec/chip at N=1e6.
Reference baseline: CPU NumPy SIR PF ≈ 2×10⁵ particle-steps/s
(BASELINE.md — 10.24 ms/step at Np≈2000, EKF_UKF_PF_comparison.ipynb).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...,
   "extras": {...}}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PARTICLE_STEPS_PER_SEC = 2.0e5  # reference CPU SIR PF (BASELINE.md)


def main() -> None:
    from particle_filters_tpu.models.particle_filter import ParticleFilter
    from particle_filters_tpu.simulators.stochastic_volatility import simulate_sv_1d

    n_particles = 1_000_000
    n_steps = 200
    alpha, sigma, beta = 0.95, 0.2, 1.0

    sv = simulate_sv_1d(n_steps, alpha, sigma, beta, seed=42)

    def g(x, u):
        return alpha * x

    def obs_loglik(x, z):
        var = beta**2 * jnp.exp(x[0])
        return -0.5 * (z[0] ** 2 / var + jnp.log(var))

    pf = ParticleFilter(
        g,
        None,
        Q=jnp.array([[sigma**2]], jnp.float32),
        R=None,
        Np=n_particles,
        resample_thresh=0.5,
        resample_method="systematic",
        obs_loglik=obs_loglik,
    )

    # rbg PRNG: ~2× faster than the default threefry for the 1e6-normals
    # propagate draw (the single hottest op); pass any key impl you like —
    # the filter is impl-agnostic.
    key = jax.random.key(0, impl="rbg")
    state0 = pf.initialize(
        key,
        jnp.zeros(1, jnp.float32),
        jnp.array([[sigma**2 / (1 - alpha**2)]], jnp.float32),
    )
    zs = sv.Y[:, None]

    run = jax.jit(lambda k, s: pf.run(k, s, zs))

    # Compile + warm up.
    final, hist = run(jax.random.key(1, impl="rbg"), state0)
    jax.block_until_ready(hist["mean"])

    # Timed runs.
    n_rep = 3
    times = []
    for i in range(n_rep):
        t0 = time.perf_counter()
        final, hist = run(jax.random.key(2 + i, impl="rbg"), state0)
        jax.block_until_ready(hist["mean"])
        times.append(time.perf_counter() - t0)
    best = min(times)

    particle_steps_per_sec = n_particles * n_steps / best
    ms_per_step = best / n_steps * 1e3
    rmse = float(jnp.sqrt(jnp.mean((hist["mean"][:, 0] - sv.X) ** 2)))
    resample_frac = float(jnp.mean(hist["resampled"]))

    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec_per_chip",
                "value": particle_steps_per_sec,
                "unit": "particle-steps/s",
                "vs_baseline": particle_steps_per_sec
                / BASELINE_PARTICLE_STEPS_PER_SEC,
                "extras": {
                    "n_particles": n_particles,
                    "n_steps": n_steps,
                    "ms_per_step": ms_per_step,
                    "sv_rmse": rmse,
                    "resample_frac": resample_frac,
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
