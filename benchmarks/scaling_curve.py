"""North-star scaling curve: particle-steps/s vs particle count on TPU.

Runs the fused Pallas SIR filter (bench.py's exact workload, SV model,
T=200) across particle counts, writes ``benchmarks/scaling_results.json``
and the committed PNG ``benchmarks/figures/scaling_curve.png``
(VERDICT r2 item 9). Requires the TPU backend — the scaling story is a
hardware claim, not an interpret-mode one.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(REPO, "benchmarks", "scaling_results.json")
OUT_PNG = os.path.join(REPO, "benchmarks", "figures", "scaling_curve.png")

BASELINE = 2.0e5  # reference CPU SIR PF particle-steps/s (BASELINE.md)


def measure(n_particles: int, n_steps: int = 200, m_hi: int = None):
    """Steady-state per-step time by the SLOPE protocol: two scan lengths
    (n_steps and m_hi) timed behind one scalar sync each, differenced, so
    both the RPC floor AND the per-dispatch host→tunnel latency cancel.
    Chaining whole short runs (the previous strategy) is dispatch-bound on
    the tunneled link below ~2¹⁸ particles — the device finishes a 200-step
    N=2¹⁶ run faster than the host can issue the next RPC, which read as a
    fake 3-5× slowdown at exactly the sizes this curve is meant to pin
    (benchmarks/profile_small_n.py found the same programs 3× faster)."""
    from particle_filters_tpu.ops.fused_pf import FusedSIRFilter
    from particle_filters_tpu.simulators.stochastic_volatility import (
        simulate_sv_1d,
    )

    if m_hi is None:
        # Long enough that the hi run dwarfs the ±1-3 ms tunnel timing
        # noise even at the ~4 µs/step small-N floor.
        m_hi = 8000 if n_particles <= (1 << 16) else 1700
    alpha, sigma = 0.95, 0.2
    sv = simulate_sv_1d(m_hi, alpha, sigma, 1.0, seed=42)
    g_vec = lambda x: alpha * x

    def obs_ll_vec(x, z):
        return -0.5 * (z[0] ** 2 / jnp.exp(x) + x)

    pf = FusedSIRFilter(
        g_vec, obs_ll_vec, Q=np.array([[sigma**2]]),
        Np=n_particles, resample_thresh=0.5,
        block=min(65536, n_particles),
    )
    state0 = pf.initialize(
        jax.random.PRNGKey(0), jnp.zeros(1),
        jnp.array([[sigma**2 / (1 - alpha**2)]]),
    )

    def make_run(m):
        zs = sv.Y[:m][:, None]
        return jax.jit(lambda k, s: pf.run(k, s, zs))

    run_lo, run_hi = make_run(n_steps), make_run(m_hi)
    # Warm both compiles; sync via a scalar pull (tunnel-safe).
    _, hist = run_lo(jax.random.PRNGKey(2), state0)
    float(hist["mean"][0, 0])
    _, hist_hi = run_hi(jax.random.PRNGKey(2), state0)
    float(hist_hi["mean"][0, 0])

    ts_lo, ts_hi = [], []
    for i in range(4):
        t0 = time.perf_counter()
        _, h = run_lo(jax.random.PRNGKey(3 + i), state0)
        float(h["mean"][0, 0])
        ts_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _, h = run_hi(jax.random.PRNGKey(3 + i), state0)
        float(h["mean"][0, 0])
        ts_hi.append(time.perf_counter() - t0)
    per_step = (min(ts_hi) - min(ts_lo)) / (m_hi - n_steps)
    best = max(per_step, 1e-12) * n_steps
    return {
        "n_particles": n_particles,
        "n_steps": n_steps,
        "seconds": best,
        "particle_steps_per_sec": n_particles * n_steps / best,
        "resample_frac": float(jnp.mean(hist_hi["resampled"])),
    }


def main():
    if jax.default_backend() != "tpu":
        print("scaling_curve.py requires the TPU backend; skipping.")
        return 1
    rows = []
    for logn in (14, 16, 18, 20, 22):
        r = measure(1 << logn)
        r["log2_n"] = logn
        rows.append(r)
        print(
            f"N=2^{logn}: {r['particle_steps_per_sec']:.3e} particle-steps/s "
            f"({r['seconds']*1e3/r['n_steps']:.3f} ms/step, "
            f"resample {r['resample_frac']*100:.0f}%)",
            flush=True,
        )
    with open(OUT_JSON, "w") as f:
        json.dump(
            {"device": str(jax.devices()[0]), "baseline": BASELINE,
             "rows": rows},
            f, indent=1,
        )

    sys.path.insert(0, os.path.join(REPO, "examples"))
    import figstyle

    plt = figstyle.get_pyplot()
    fig, ax = plt.subplots(figsize=(6.4, 3.6))
    ns = [r["n_particles"] for r in rows]
    ps = [r["particle_steps_per_sec"] for r in rows]
    ax.plot(ns, ps, color=figstyle.BLUE, lw=1.6, marker="o", ms=5)
    ax.axhline(1e9, color=figstyle.GRAY, lw=1.0, ls="--")
    ax.annotate("1e9 target", (ns[0], 1.1e9), color=figstyle.INK, fontsize=8)
    ax.axhline(BASELINE, color=figstyle.VERMILLION, lw=1.0, ls=":")
    ax.annotate("reference CPU (2e5)", (ns[0], 2.6e5), color=figstyle.INK,
                fontsize=8)
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xlabel("particles N")
    ax.set_ylabel("particle-steps / s / chip")
    ax.set_title(
        f"Fused SIR filter scaling — SV model, T=200 ({jax.devices()[0]})",
        fontsize=9, loc="left",
    )
    os.makedirs(os.path.dirname(OUT_PNG), exist_ok=True)
    fig.savefig(OUT_PNG, bbox_inches="tight")
    print(f"wrote {OUT_JSON} and {OUT_PNG}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
