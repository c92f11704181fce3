"""Slope-probe the d=144 hot ops on TPU: eigvalsh diagnostic, serial vs
unrolled chol, trsm, at the skew-t benchmark's batch shapes.

The probed array is passed as a jit ARGUMENT, never captured in the jit
closure: a closed-over device array is baked into the program as a
constant, and at the (5000, 144, 144) batch the 415 MB constant overflows
the axon tunnel's remote-compile request (HTTP 413) — which is also why
the round-4 version of this probe could never measure the 5000-batch
serial cholesky (it was uploading the batch with every compile).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np

def slope(label, build_loop, arg, m_lo=2, m_hi=8, reps=3):
    f_lo, f_hi = build_loop(m_lo), build_loop(m_hi)
    float(f_lo(arg)); float(f_hi(arg))
    ts_lo, ts_hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f_lo(arg)); ts_lo.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); float(f_hi(arg)); ts_hi.append(time.perf_counter()-t0)
    per = (min(ts_hi)-min(ts_lo))/(m_hi-m_lo)
    print(f"{label}: {per*1e3:.3f} ms/exec", flush=True)

d = 144
rng = np.random.default_rng(0)
a = rng.standard_normal((100, d, d))
spd = jnp.asarray((a @ np.swapaxes(a,-1,-2) + d*np.eye(d)).astype(np.float32))

from particle_filters_tpu.core.linalg import chol_nojitter, chol_with_jitter, tri_solve_lower, _chol_blocked_unrolled

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

slope("eigvalsh (100,144,144)", make(lambda s: jnp.linalg.eigvalsh(s)), spd)
slope("eigvalsh (1,144,144)", make(lambda s: jnp.linalg.eigvalsh(s[:1])), spd)
slope("jnp chol (100,144,144)", make(lambda s: jnp.linalg.cholesky(s)), spd)
slope("unrolled chol (100,144,144)", make(lambda s: _chol_blocked_unrolled(s)), spd)
slope("chol_with_jitter ladder (100,144,144)", make(lambda s: chol_with_jitter(s)), spd)
slope("unrolled chol+trisolve (100,144,144)rhs",
      make(lambda s: tri_solve_lower(_chol_blocked_unrolled(s), s)), spd)
# per-particle scale: batch 5000 (25 trials x 200 particles) — the LEDH
# skew-t working set. jnp.linalg.cholesky at this shape did NOT finish a
# single slope measurement inside a 580 s budget (serial While lowering);
# only the unrolled form is measurable.
a2 = rng.standard_normal((5000, d, d)).astype(np.float32)
spd2 = jnp.asarray(np.einsum('bij,bkj->bik', a2, a2) + d*np.eye(d, dtype=np.float32))
slope("unrolled chol (5000,144,144)", make(lambda s: _chol_blocked_unrolled(s)), spd2, m_lo=1, m_hi=3)
slope("unrolled chol+trisolve (5000,144,144)rhs",
      make(lambda s: tri_solve_lower(_chol_blocked_unrolled(s), s)), spd2,
      m_lo=1, m_hi=3)

# measured 2026-08-19 (TPU v5e, axon tunnel), LEFT-LOOKING r4 form:
#   eigvalsh (100,144,144):             67.4  ms/exec   <- EDH cond(S) diagnostic, 80 execs/benchmark
#   eigvalsh (1,144,144):                0.43 ms/exec
#   jnp chol (100,144,144):              2.51 ms/exec
#   unrolled chol (100,144,144):         0.379 ms/exec  (6.6x)
#   chol_with_jitter ladder (100,...):   1.61 ms/exec   (7 rungs, unrolled)
#   jax.scipy trisolve (100,144,144):    1.75 ms/exec
#   unrolled trisolve (100,144,144):     0.082 ms/exec  (21x)
#
# measured 2026-08-20, RIGHT-LOOKING shrinking-trailing form (r5 interim —
# rank-1 substitution directly on the (..., b, m) RHS panels):
#   unrolled chol (100,144,144):         0.216 ms/exec  (1.75x over r4)
#   unrolled chol+trisolve (100,...):    5.9   ms/exec  <- regression
#   unrolled chol+trisolve (5000,...):   431   ms/exec  <- regression
#
# measured 2026-08-20, FINAL r5 form (diag-block inverses + MXU matmuls,
# batch-last base recursions — see core/linalg.py):
#   unrolled chol (100,144,144):         0.058 ms/exec  (46x over jnp)
#   chol_with_jitter ladder (100,...):   6.8   ms/exec  (7 rungs)
#   unrolled chol+trisolve (100,...):    0.57  ms/exec
#   unrolled chol (5000,144,144):       17.0   ms/exec
#   unrolled chol+trisolve (5000,...):  43.0   ms/exec  (10x over interim)
# At batch 5000 the cost is HBM-bound on the blocked driver's
# shrinking-S copies and panel temps (~3.4 us/matrix), not on the base
# recursions — the batch-100 case fits VMEM and shows the pure-compute
# floor. jnp.linalg.cholesky at (5000,144,144) never finished one slope
# measurement inside a 580 s budget.
