"""Tunnel-proof profiling: time M chained executions with ONE scalar host
sync; per-execution time = slope between two M values (RPC latency and
transfer cost cancel)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particle_filters_tpu.ops.fused_pf import FusedSIRFilter
from particle_filters_tpu.ops.resample_pallas import (
    systematic_resample_values_blocked,
)
from particle_filters_tpu.resampling.hard import _systematic_starts
from particle_filters_tpu.simulators.stochastic_volatility import simulate_sv_1d

N = 1 << 20


def slope(label, build_loop, m_lo=4, m_hi=12, reps=3):
    """build_loop(m) -> jitted fn(x0) returning a scalar after m chained
    executions."""
    f_lo, f_hi = build_loop(m_lo), build_loop(m_hi)
    # compile + settle queue
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
    print(f"{label}: {per*1e3:.4f} ms/exec  "
          f"(lo {min(ts_lo)*1e3:.1f} ms, hi {min(ts_hi)*1e3:.1f} ms)")


def main():
    key = jax.random.PRNGKey(0)
    lw = jax.random.normal(key, (N,), jnp.float32)
    w = jax.nn.softmax(lw)
    p = jax.random.normal(jax.random.fold_in(key, 1), (N, 1), jnp.float32)

    # 1. full blocked resample
    def build_resample(m):
        ks = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                out = systematic_resample_values_blocked(k, c, logw=lw)
                return out, None
            c, _ = jax.lax.scan(body, p, ks)
            return jnp.sum(c[:8])
        return run

    slope("blocked resample", build_resample)

    # 2. starts only
    def build_starts(m):
        ks = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                s = _systematic_starts(k, c, N)
                c2 = c * (1.0 + 1e-9 * s[-1].astype(jnp.float32))
                return c2 / jnp.sum(c2), None
            c, _ = jax.lax.scan(body, w, ks)
            return jnp.sum(c[:8])
        return run

    slope("systematic starts", build_starts)

    # 3. fused SIR steps, no resample
    alpha, sigma = 0.95, 0.2
    sv = simulate_sv_1d(200, alpha, sigma, 1.0, seed=42)
    g_vec = lambda x: alpha * x

    def obs_ll_vec(x, z):
        return -0.5 * (z[0] ** 2 / jnp.exp(x) + x)

    pf = FusedSIRFilter(g_vec, obs_ll_vec, Q=np.array([[sigma**2]]),
                        Np=N, resample_thresh=0.0)
    state0 = pf.initialize(
        jax.random.PRNGKey(0), jnp.zeros(1),
        jnp.array([[sigma**2 / (1 - alpha**2)]]),
    )

    def build_fused(m):
        zs = sv.Y[:m][:, None]

        @jax.jit
        def run():
            (pt, lwc, _), hist = pf.run(jax.random.PRNGKey(3), state0, zs)
            return jnp.sum(hist["mean"]) + pt[0, 0]
        return run

    slope("fused step (no resample)", build_fused, m_lo=20, m_hi=120)

    # 4. XLA baselines the Pallas kernel replaces
    starts0 = _systematic_starts(key, w, N)

    def build_scatter(m):
        ks = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                prev = jnp.concatenate(
                    [jnp.zeros_like(c[:1]), c[:-1]], axis=0
                )
                out = jnp.zeros_like(c).at[starts0].add(
                    c - prev, indices_are_sorted=True, mode="drop"
                )
                out = jnp.cumsum(out, axis=0)
                return out * (1.0 + 1e-12 * k[0].astype(jnp.float32)), None
            c, _ = jax.lax.scan(body, p, ks)
            return jnp.sum(c[:8])
        return run

    slope("XLA scatter+cumsum fallback", build_scatter)

    def build_take(m):
        ks = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                marks = jnp.zeros((N,), jnp.int32).at[starts0].add(
                    1, indices_are_sorted=True, mode="drop"
                )
                idx = jnp.cumsum(marks) - 1
                out = jnp.take(c, idx, axis=0)
                return out * (1.0 + 1e-12 * k[0].astype(jnp.float32)), None
            c, _ = jax.lax.scan(body, p, ks)
            return jnp.sum(c[:8])
        return run

    slope("XLA marks+cumsum+take", build_take)


if __name__ == "__main__":
    main()
