"""Slope-probe small-dim batched Cholesky on TPU: XLA's serial While
lowering vs the unrolled form, at the MAT LEDH working shapes.

The MAT benchmark's LEDH runs two 16x16 SPD factorizations per particle
per lambda-step (N=500, 8 steps, T=40). 16 < _CHOL_UNROLL_MIN, so through
round 4 those went to ``jnp.linalg.cholesky``'s serial While loop — the
same lowering that cost ~0.7 ms per batched call at d=64 regardless of
batch size (benchmarks/profile_ukf.py). This probe decides whether the
unrolled window should extend below 32.

Run on TPU: python benchmarks/profile_small_chol.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

from particle_filters_tpu.core.linalg import (
    _chol_base_unrolled,
    _chol_blocked_unrolled,
)


def slope(label, build_loop, arg, m_lo=2, m_hi=8, reps=3):
    f_lo, f_hi = build_loop(m_lo), build_loop(m_hi)
    float(f_lo(arg)); float(f_hi(arg))
    ts_lo, ts_hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f_lo(arg)); ts_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f_hi(arg)); ts_hi.append(time.perf_counter() - t0)
    per = (min(ts_hi) - min(ts_lo)) / (m_hi - m_lo)
    print(f"{label}: {per * 1e3:.3f} ms/exec", flush=True)


def make(op):
    def build(m):
        @jax.jit
        def f(base):
            def body(c, _):
                x = op(base + c * 1e-6)
                return jnp.sum(x) * 1e-20, None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=m)
            return out
        return f
    return build


rng = np.random.default_rng(0)
for batch, d in [((500,), 16), ((500,), 25), ((100,), 8), ((500,), 4)]:
    a = rng.standard_normal(batch + (d, d))
    spd = jnp.asarray(
        (a @ np.swapaxes(a, -1, -2) + d * np.eye(d)).astype(np.float32)
    )
    slope(f"jnp chol {batch + (d, d)}", make(jnp.linalg.cholesky), spd)
    slope(f"unrolled chol {batch + (d, d)}", make(_chol_blocked_unrolled), spd)

# measured 2026-08-20 (TPU v5e, axon tunnel; negative slopes = below the
# tunnel's timing noise floor, i.e. ~free):
#   jnp chol (500, 16, 16): 0.911 ms/exec   unrolled: ~0 (noise floor)
#   jnp chol (500, 25, 25): 1.344 ms/exec   unrolled: 0.119 ms/exec
#   jnp chol (100, 8, 8):   0.015 ms/exec   unrolled: 0.042 ms/exec
#   jnp chol (500, 4, 4):   0.054 ms/exec   unrolled: ~0 (noise floor)
# Verdict: the serial While loop costs ~60 us PER COLUMN regardless of
# batch, so it loses everywhere the factorization is batched; only the
# tiny unbatched-ish (100, 8, 8) case is marginally (and negligibly)
# faster serial. _CHOL_UNROLL_MIN dropped 32 -> 1 on these numbers.
