"""Decompose the small-N per-step floor of the fused SIR path (VERDICT r3
weak #2: 0.95e9 particle-steps/s at N=2^14 == 17 us/step, a fixed per-step
cost never broken down).

Strategy: every variant is a jitted ``lax.scan`` over T steps whose result
feeds the carry (so XLA cannot DCE stages), timed by the slope protocol
(two scan lengths behind ONE scalar sync each; RPC floor cancels —
``profile_kernels.py::slope``). Variants peel one stage at a time:

  full        resample cond in graph (thresh=0.5, SV workload, ~9% trigger)
  no-resample thresh=0 (cond compiled, branch never taken)
  kernel+comb _fused_step with moments consumed (no cond, no history)
  kernel-only _fused_step with ONLY (particles, logw) consumed — the
              partial-combine reductions get DCEd, leaving the bare
              pallas_call
  minimal     a same-shape elementwise scan body (scan + carry overhead,
              no Pallas)
  launch      a do-nothing 1-block Pallas kernel in a scan — per-call
              Mosaic launch latency

Run on TPU:  python benchmarks/profile_small_n.py [log2_N ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particle_filters_tpu.ops.fused_pf import FusedSIRFilter
from particle_filters_tpu.simulators.stochastic_volatility import simulate_sv_1d

ALPHA, SIGMA = 0.95, 0.2


def slope(label, build_loop, m_lo=100, m_hi=1700, reps=4):
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
    print(f"  {label:14s}: {per*1e6:8.2f} us/step")
    return per


def make_pf(n):
    def obs_ll_vec(x, z):
        return -0.5 * (z[0] ** 2 / jnp.exp(x) + x)

    pf = FusedSIRFilter(
        lambda x: ALPHA * x,
        obs_ll_vec,
        Q=np.array([[SIGMA**2]]),
        Np=n,
        resample_thresh=0.5,
        block=min(65536, n),
    )
    state0 = pf.initialize(
        jax.random.PRNGKey(0), jnp.zeros(1),
        jnp.array([[SIGMA**2 / (1 - ALPHA**2)]]),
    )
    return pf, state0


def profile_n(n):
    print(f"N = 2^{int(np.log2(n))} = {n}")
    pf, state0 = make_pf(n)
    sv = simulate_sv_1d(1700, ALPHA, SIGMA, 1.0, seed=42)

    def build_full(m, thresh):
        pf_t, _ = make_pf(n)
        pf_t.resample_thresh = thresh
        zs = sv.Y[:m][:, None]

        @jax.jit
        def run():
            (pt, lw, _), hist = pf_t.run(jax.random.PRNGKey(3), state0, zs)
            return jnp.sum(hist["mean"]) + pt[0, 0]
        return run

    t_full = slope("full", functools.partial(build_full, thresh=0.5))
    t_nores = slope("no-resample", functools.partial(build_full, thresh=0.0))

    def build_kernel(m, with_combine):
        zs_pad = pf._pad_obs(sv.Y[:m][:, None])
        seeds = jax.random.randint(
            jax.random.PRNGKey(3), (m,), 0, np.int32(2**31 - 1), jnp.int32
        )
        seed_pairs = jax.vmap(pf._seed_pair)(seeds)
        off0 = jnp.zeros(2, jnp.float32)

        @jax.jit
        def run():
            def body(carry, inp):
                pt, lw = carry
                seed_arr, z_pad = inp
                pt2, lw2, row = pf._fused_step(seed_arr, off0, pt, lw, z_pad)
                if with_combine:
                    # feed the packed moments row into the carry so the
                    # finalize/combine work survives DCE
                    pt2 = pt2 + 1e-30 * jnp.sum(row)
                return (pt2, lw2), None
            (pt, lw), _ = jax.lax.scan(
                body, (state0[0], state0[1]), (seed_pairs, zs_pad)
            )
            return pt[0, 0] + lw[0, 0]
        return run

    t_comb = slope("kernel+comb", functools.partial(build_kernel, with_combine=True))
    t_kern = slope("kernel-only", functools.partial(build_kernel, with_combine=False))

    def build_minimal(m):
        @jax.jit
        def run():
            def body(c, _):
                return c * 1.0000001 + 1e-12, None
            c, _ = jax.lax.scan(body, state0[0], None, length=m)
            return c[0, 0]
        return run

    t_min = slope("minimal-scan", build_minimal)

    def _noop_kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] + 1.0

    def build_launch(m):
        x0 = jnp.zeros((8, 128), jnp.float32)

        @jax.jit
        def run():
            def body(c, _):
                out = pl.pallas_call(
                    _noop_kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                )(c)
                return out, None
            c, _ = jax.lax.scan(body, x0, None, length=m)
            return c[0, 0]
        return run

    t_launch = slope("pallas-launch", build_launch)

    print(
        f"  => resample-cond+hist {1e6*(t_full - t_nores):.2f} | "
        f"cond-untaken+hist {1e6*(t_nores - t_comb):.2f} | "
        f"combine {1e6*(t_comb - t_kern):.2f} | "
        f"pallas step {1e6*t_kern:.2f} "
        f"(launch floor {1e6*t_launch:.2f}, scan floor {1e6*t_min:.2f}) us"
    )
    return {
        "n": n, "full": t_full, "no_resample": t_nores,
        "kernel_comb": t_comb, "kernel_only": t_kern,
        "minimal_scan": t_min, "pallas_launch": t_launch,
    }


def main():
    if jax.default_backend() != "tpu":
        print("profile_small_n.py requires the TPU backend.")
        return 1
    logns = [int(a) for a in sys.argv[1:]] or [14, 16, 20]
    for logn in logns:
        profile_n(1 << logn)
    return 0


if __name__ == "__main__":
    sys.exit(main())
