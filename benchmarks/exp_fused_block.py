"""Throwaway r3 harness: fused-step block-size sweep at thresh=0.

The no-resample floor is 0.045 ms/step at N=2^20 with block=65536
(16 grid steps). HBM traffic is 16 MB/step (~0.02 ms at peak BW), so the
floor carries ~2x of overhead — is it per-grid-step overhead (fewer,
bigger blocks should win) or fixed dispatch cost (block size won't
matter)? Times bench.py's exact workload by its per-run scalar-sync
protocol at several block sizes.

MEASURED (r3, quiet host): 32768 0.052 / 65536 0.055 / 131072 0.052 /
262144 0.049 / 524288 0.062 / 1048576 0.064 ms/step — flat within the
tunnel's ±10% noise until blocks outgrow VMEM-friendly sizes, so block
size is NOT the floor's lever (the residual is fixed per-step dispatch
plus the partials-combine bubble); the 65536 default stands.
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
N = 1 << 20

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
    return min(times)


for block in (32768, 65536, 131072, 262144, 524288, 1048576):
    g_vec = lambda x: alpha * x

    def obs_ll_vec(x, z):
        return -0.5 * (z[0] ** 2 / jnp.exp(x) + x)

    pf = FusedSIRFilter(
        g_vec, obs_ll_vec, Q=np.array([[sigma**2]]), Np=N,
        resample_thresh=0.0, block=block,
    )
    state0 = pf.initialize(
        jax.random.PRNGKey(0), jnp.zeros(1),
        jnp.array([[sigma**2 / (1 - alpha**2)]]),
    )
    run = jax.jit(lambda k, s, pf=pf: pf.run(k, s, zs))
    keys = [jax.random.PRNGKey(2 + i) for i in range(4)]
    try:
        best = timed(run, keys, state0)
        print(f"block={block}: {best/n_steps*1e3:.4f} ms/step", flush=True)
    except Exception as e:  # VMEM overflow etc.
        print(f"block={block}: FAILED ({type(e).__name__})", flush=True)
