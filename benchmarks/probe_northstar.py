"""Decompose the north-star bench step: where do 0.15 ms/step go?

Runs bench.py's exact FusedSIRFilter workload (N=2^20, T=200, SV model)
at three resample thresholds — never (0), bench (0.5), always (2.0) —
timing each by the per-run scalar-sync protocol bench.py uses. The
difference isolates the amortized full-resample cost as the bench
actually pays it (prep + kernel + cond overhead), as opposed to the
slope-timed kernel-only number.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from particle_filters_tpu.ops.fused_pf import FusedSIRFilter
from particle_filters_tpu.simulators.stochastic_volatility import simulate_sv_1d

n_steps = 200
alpha, sigma = 0.95, 0.2
sv = simulate_sv_1d(n_steps, alpha, sigma, 1.0, seed=42)
zs = sv.Y[:, None]
N = 1 << int(os.environ.get("PF_LOG2N", "20"))

trivial = jax.jit(lambda x: x + 1.0)
float(trivial(jnp.float32(0)))


def timed(run, keys, state0):
    final, hist = run(keys[0], state0)
    float(hist["mean"][0, 0])
    rpc = min(
        (lambda t0: (float(trivial(jnp.float32(i))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for i in range(3)
    )
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        final, hist = run(keys[1 + i], state0)
        float(hist["mean"][0, 0])
        times.append(max(time.perf_counter() - t0 - rpc, 1e-9))
    return min(times), float(jnp.mean(hist["resampled"]))


for thresh in (0.0, 0.5, 2.0):
    g_vec = lambda x: alpha * x

    def obs_ll_vec(x, z):
        return -0.5 * (z[0] ** 2 / jnp.exp(x) + x)

    pf = FusedSIRFilter(
        g_vec, obs_ll_vec, Q=np.array([[sigma**2]]), Np=N,
        resample_thresh=thresh,
    )
    state0 = pf.initialize(
        jax.random.PRNGKey(0), jnp.zeros(1),
        jnp.array([[sigma**2 / (1 - alpha**2)]]),
    )
    run = jax.jit(lambda k, s, pf=pf: pf.run(k, s, zs))
    keys = [jax.random.PRNGKey(2 + i) for i in range(4)]
    best, frac = timed(run, keys, state0)
    print(
        f"thresh={thresh}: {best/n_steps*1e3:.4f} ms/step, resample_frac={frac:.3f}",
        flush=True,
    )
