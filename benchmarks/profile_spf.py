"""Slope-profile the SPF optimal-β* solve (VERDICT r3 weak #1).

spf_example1's optimal row was the book's weakest speedup (9.4×: 3.53 s
vs the reference's 33.2 s for 20 MC runs). The solve's cost is the RHS of
the shooting ODE: dκ₂/dβ needs the extreme generalized eigenvalue of
(M(β), Mh), and the r3 code called ``eigh`` at EVERY RK4 stage of every
bisection/bracket F-evaluation — ~1.3e5 SEQUENTIAL 2×2 eigh per solve,
each lowering to a serial kernel on TPU (reference does the same walk on
CPU, ``Stochastic_particle_filter.py:123-167`` × ``:225-254``).

The fix (``solve_beta_star_bisection(rhs_mode="tabulated")``, the default
since r4): ONE batched eigh over a dense β grid on the clip interval
[−0.5, 1.5] builds a dκ₂/dβ table; every RK4 stage then linearly
interpolates it (~10 scalar ops). Pieces timed here, each inside a scan
with the result fed into the carry (anti-DCE; see BENCHMARKS.md
methodology — standalone microbenchmarks are meaningless on this TPU):

  solve_exact   one full β* solve, rhs_mode="exact"  (the r3 path)
  solve_tab     one full β* solve, rhs_mode="tabulated" (the r4 default)
  tab_build     the one-off table build alone (batched 2048-point eigh)
  sde           the downstream 20-run vmapped Euler-Maruyama homotopy
                integration (shared by both modes; the non-solver cost
                of the spf_example1 optimal row)

Measured on the tunneled TPU (2026-08-18, best-of-3 slope):

  solve_exact   3600 ms/exec     (the whole r3 3.53 s bench row was this)
  solve_tab     292 ms/exec      (12.3× the exact path)
  tab_build     0.04 ms/exec     (the batched eigh is ~free)
  sde (20 MC)   12.8 ms/exec     (the non-solver cost of the row)

so the optimal row lands at solve_tab + sde ≈ 0.31 s ≈ 109× the
reference's 33.2 s (vs 9.4× in r3) — the bench row
(run_benchmarks.py::bench_spf) confirms end-to-end. The residual 292 ms
is NOT the eigh anymore: it is ~65 sequential F-evaluations (bracket +
60 bisection steps), each a 1000-step RK4 ``lax.scan`` at the TPU's
~4.5 µs/step serial-scan floor. Next lever if ever needed: k-section —
evaluate a vmapped batch of candidate shooting slopes per round (one
batched scan instead of one per candidate), cutting ~65 scans to ~6.
The schedule itself is unchanged: tests/unit/test_spf.py pins
tabulated-vs-exact to atol 2e-4 on β.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from particle_filters_tpu.models import (
    LinearGaussianBayes,
    run_generalized_spf,
)
from particle_filters_tpu.models.stochastic_particle_filter import (
    kappa2_and_derivative,
    solve_beta_star_bisection,
)
from particle_filters_tpu.core.linalg import symmetrize


def slope(label, build_loop, m_lo=1, m_hi=4, reps=3):
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
    print(
        f"{label}: {per*1e3:.3f} ms/exec  "
        f"(lo {min(ts_lo)*1e3:.1f} ms, hi {min(ts_hi)*1e3:.1f} ms)",
        flush=True,
    )
    return per


def _example1_model():
    """spf_example1's bearing-only model (run_benchmarks.py::bench_spf)."""
    sensors = jnp.array([[3.5, 0.0], [-3.5, 0.0]])
    x_prior = jnp.array([3.0, 5.0])
    P_prior = jnp.diag(jnp.array([1000.0, 2.0]))
    R = 0.04 * jnp.eye(2)
    z = jnp.array([0.4754, 1.1868])

    def h(x):
        d = x[None, :] - sensors
        return jnp.arctan2(d[:, 1], d[:, 0])

    H = jax.jacfwd(h)(x_prior)
    z_adj = z - (h(x_prior) - H @ x_prior)
    return LinearGaussianBayes.create(m0=x_prior, P0=P_prior, H=H, R=R, z=z_adj)


def main():
    model = _example1_model()
    M0 = symmetrize(model.M0)
    Mh = symmetrize(model.Mh)
    n_grid = 1001  # bench_spf's n_steps=1000 shooting grid

    def solver_loop(mode):
        def build(m):
            @jax.jit
            def loop():
                def body(c, _):
                    # fold the carry into mu so iterations can't be CSE'd
                    _, beta, _ = solve_beta_star_bisection(
                        M0, Mh, mu=0.2 + 1e-12 * c, n_grid=n_grid,
                        rhs_mode=mode,
                    )
                    return beta[-1], None
                out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=m)
                return out

            return loop

        return build

    def tab_loop(m):
        @jax.jit
        def loop():
            def body(c, _):
                tab = jnp.linspace(-0.5, 1.5, 2048) + 1e-12 * c
                _, dk = jax.vmap(
                    lambda b: kappa2_and_derivative(M0 + b * Mh, Mh)
                )(tab)
                return dk[-1], None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=m)
            return out

        return loop

    def sde_loop(m):
        keys = jax.random.split(jax.random.PRNGKey(0), 20)

        @jax.jit
        def loop():
            def body(c, _):
                means = jax.vmap(
                    lambda k: run_generalized_spf(
                        model, N=50, n_steps=1000, beta_mode="linear",
                        mu=0.2 + 1e-12 * c, key=k,
                    )[1]
                )(keys)
                return jnp.sum(means), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=m)
            return out

        return loop

    print(f"backend: {jax.default_backend()}")
    slope("solve_tab  ", solver_loop("tabulated"))
    slope("tab_build  ", tab_loop)
    slope("sde (20 MC)", sde_loop)
    # the exact path is ~2.7 s/exec — keep the chain short
    slope("solve_exact", solver_loop("exact"), m_lo=1, m_hi=2, reps=2)


if __name__ == "__main__":
    main()
