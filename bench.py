#!/usr/bin/env python
"""Benchmark: SIR particle filter on the 1-D stochastic-volatility model.

North-star metric (BASELINE.json): particle-steps/sec/chip at N=1e6.
Reference baseline: CPU NumPy SIR PF ≈ 2×10⁵ particle-steps/s
(BASELINE.md — 10.24 ms/step at Np≈2000, EKF_UKF_PF_comparison.ipynb).

Uses the framework's fused Pallas step (``ops/fused_pf.py``) on TPU — one
kernel pass per filter step with on-chip PRNG — with N = 2²⁰ ≥ 1e6; falls
back to the generic ``ParticleFilter`` on other backends.

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


def _timed_scalar(thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def main() -> None:
    from particle_filters_tpu.simulators.stochastic_volatility import simulate_sv_1d

    n_steps = 200
    alpha, sigma, beta = 0.95, 0.2, 1.0
    sv = simulate_sv_1d(n_steps, alpha, sigma, beta, seed=42)
    zs = sv.Y[:, None]

    use_fused = jax.default_backend() == "tpu"
    if use_fused:
        from particle_filters_tpu.ops.fused_pf import FusedSIRFilter

        n_particles = 1_048_576  # 2^20 ≥ 1e6 (block-aligned)
        g_vec = lambda x: alpha * x

        def obs_ll_vec(x, z):
            # elementwise on the kernel block; beta = 1
            return -0.5 * (z[0] ** 2 / jnp.exp(x) + x)

        pf = FusedSIRFilter(
            g_vec, obs_ll_vec, Q=np.array([[sigma**2]]),
            Np=n_particles, resample_thresh=0.5,
        )
        state0 = pf.initialize(
            jax.random.PRNGKey(0),
            jnp.zeros(1),
            jnp.array([[sigma**2 / (1 - alpha**2)]]),
        )
        run = jax.jit(lambda k, s: pf.run(k, s, zs))
        keys = [jax.random.PRNGKey(2 + i) for i in range(4)]
    else:
        from particle_filters_tpu.models.particle_filter import ParticleFilter

        n_particles = 1_000_000

        def g(x, u):
            return alpha * x

        def obs_loglik(x, z):
            var = beta**2 * jnp.exp(x[0])
            return -0.5 * (z[0] ** 2 / var + jnp.log(var))

        pf = ParticleFilter(
            g, None, Q=jnp.array([[sigma**2]], jnp.float32), R=None,
            Np=n_particles, resample_thresh=0.5,
            resample_method="systematic", obs_loglik=obs_loglik,
        )
        state0 = pf.initialize(
            jax.random.key(0, impl="rbg"),
            jnp.zeros(1, jnp.float32),
            jnp.array([[sigma**2 / (1 - alpha**2)]], jnp.float32),
        )
        run = jax.jit(lambda k, s: pf.run(k, s, zs))
        keys = [jax.random.key(2 + i, impl="rbg") for i in range(4)]

    # Compile + warm up. Synchronize through a scalar host transfer: on
    # tunneled TPU backends `block_until_ready` can return before the
    # computation finishes (async relay), which would make wall-clock
    # timing measure only dispatch.
    final, hist = run(keys[0], state0)
    float(hist["mean"][0, 0])

    # RPC/transfer floor for the scalar sync itself.
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    rpc = min(
        _timed_scalar(lambda: float(trivial(jnp.float32(i))))
        for i in range(3)
    )

    # Timed runs (scalar-sync per run; subtract the sync floor).
    # A chained variant (4 runs behind one sync, run_benchmarks.py::timed
    # style) was measured and does NOT read lower here — async dispatch
    # already pipelines the next run behind the in-flight one, so the
    # per-run protocol is not over-charging dispatch. Clamp: an unclamped
    # subtraction of a noisy RPC-floor estimate could yield a negative
    # time and an inflated/infinite throughput.
    times = []
    for i in range(5):  # best-of-5: tunnel noise is ±10-25% per run
        t0 = time.perf_counter()
        final, hist = run(keys[1 + i % 3], state0)
        float(hist["mean"][0, 0])
        times.append(max(time.perf_counter() - t0 - rpc, 1e-9))
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
                    "fused_pallas_step": use_fused,
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
