"""Decompose the north-star bench: fused-step time vs resample time on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from particle_filters_tpu.ops.fused_pf import FusedSIRFilter
from particle_filters_tpu.ops.resample_pallas import (
    systematic_resample_values_blocked,
)
from particle_filters_tpu.simulators.stochastic_volatility import simulate_sv_1d


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    n_steps = 200
    alpha, sigma = 0.95, 0.2
    sv = simulate_sv_1d(n_steps, alpha, sigma, 1.0, seed=42)
    zs = sv.Y[:, None]
    N = 1_048_576

    g_vec = lambda x: alpha * x

    def obs_ll_vec(x, z):
        return -0.5 * (z[0] ** 2 / jnp.exp(x) + x)

    for thresh, label in ((0.5, "with-resample"), (0.0, "no-resample")):
        pf = FusedSIRFilter(
            g_vec, obs_ll_vec, Q=np.array([[sigma**2]]),
            Np=N, resample_thresh=thresh,
        )
        state0 = pf.initialize(
            jax.random.PRNGKey(0), jnp.zeros(1),
            jnp.array([[sigma**2 / (1 - alpha**2)]]),
        )
        run = jax.jit(lambda k, s: pf.run(k, s, zs))
        t, (_, hist) = timed(run, jax.random.PRNGKey(2), state0)
        frac = float(jnp.mean(hist["resampled"]))
        print(f"{label}: {t/n_steps*1e3:.4f} ms/step  resample_frac={frac:.3f}")

    # standalone resample inside a scan (fed into carry so nothing is DCEd)
    key = jax.random.PRNGKey(3)
    p = jax.random.normal(key, (N, 1), jnp.float32)
    lw = jax.random.normal(jax.random.fold_in(key, 1), (N,), jnp.float32)

    @jax.jit
    def many_resamples(p0):
        def body(p, k):
            out = systematic_resample_values_blocked(k, p, logw=lw)
            return out, None
        ks = jax.random.split(key, 20)
        pf_, _ = jax.lax.scan(body, p0, ks)
        return pf_

    t, _ = timed(many_resamples, p)
    print(f"resample kernel: {t/20*1e3:.4f} ms/call (N=2^20, d=1)")


if __name__ == "__main__":
    main()
