"""Slope-probe the d=144 hot ops on TPU: eigvalsh diagnostic, serial vs
unrolled chol, trsm, at the skew-t benchmark's batch shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

def slope(label, build_loop, m_lo=2, m_hi=8, reps=3):
    f_lo, f_hi = build_loop(m_lo), build_loop(m_hi)
    float(f_lo()); float(f_hi())
    ts_lo, ts_hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f_lo()); ts_lo.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); float(f_hi()); ts_hi.append(time.perf_counter()-t0)
    per = (min(ts_hi)-min(ts_lo))/(m_hi-m_lo)
    print(f"{label}: {per*1e3:.3f} ms/exec")

d = 144
rng = np.random.default_rng(0)
a = rng.standard_normal((100, d, d))
spd = jnp.asarray((a @ np.swapaxes(a,-1,-2) + d*np.eye(d)).astype(np.float32))

from particle_filters_tpu.core.linalg import chol_nojitter, chol_with_jitter, tri_solve_lower, _chol_blocked_unrolled

def make(op):
    def build(m):
        @jax.jit
        def f():
            def body(c, _):
                x = op(spd + c * 1e-6)
                return jnp.sum(x) * 1e-20, None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=m)
            return out
        return f
    return build

slope("eigvalsh (100,144,144)", make(lambda s: jnp.linalg.eigvalsh(s)))
slope("eigvalsh (1,144,144)", make(lambda s: jnp.linalg.eigvalsh(s[:1])))
slope("jnp chol (100,144,144)", make(lambda s: jnp.linalg.cholesky(s)))
slope("unrolled chol (100,144,144)", make(lambda s: _chol_blocked_unrolled(s)))
slope("chol_with_jitter ladder (100,144,144)", make(lambda s: chol_with_jitter(s)))
L = jnp.linalg.cholesky(spd)
slope("jax.scipy trisolve (100,144,144)rhs", make(lambda s: jax.scipy.linalg.solve_triangular(L, s, lower=True)))
slope("unrolled trisolve (100,144,144)rhs", make(lambda s: tri_solve_lower(L, s)))
# per-particle scale: batch 5000 (25 trials x 200 particles) — the LEDH
# skew-t working set. jnp.linalg.cholesky at this shape did NOT finish a
# single slope measurement inside a 580 s budget (serial While lowering);
# only the unrolled form is measurable.
a2 = rng.standard_normal((5000, d, d)).astype(np.float32)
spd2 = jnp.asarray(np.einsum('bij,bkj->bik', a2, a2) + d*np.eye(d, dtype=np.float32))
slope("unrolled chol (5000,144,144)", make(lambda s: _chol_blocked_unrolled(spd2 + s[0,0,0]*0)), m_lo=1, m_hi=3)

# measured 2026-08-19 (TPU v5e, axon tunnel):
#   eigvalsh (100,144,144):             67.4  ms/exec   <- EDH cond(S) diagnostic, 80 execs/benchmark
#   eigvalsh (1,144,144):                0.43 ms/exec
#   jnp chol (100,144,144):              2.51 ms/exec
#   unrolled chol (100,144,144):         0.379 ms/exec  (6.6x)
#   chol_with_jitter ladder (100,...):   1.61 ms/exec   (7 rungs, unrolled)
#   jax.scipy trisolve (100,144,144):    1.75 ms/exec
#   unrolled trisolve (100,144,144):     0.082 ms/exec  (21x)
#   jnp chol (5000,144,144):             >580 s TOTAL for the probe (aborted)
