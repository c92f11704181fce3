"""Throwaway r3 harness: row-width alignment of the resample's Q-row gather.

At N=2^22 the mega-array row gather costs 2.1 ms — 14x its N=2^20 cost
for 4x the rows (profile_resample_split with PF_LOG2N=22), i.e. ~5% of
HBM peak. Hypothesis: the mega row is 257 f32 = 1028 B, misaligned with
the 128-lane tile, so XLA's gather degrades. Measures jnp.take of
Q=3-row windows at several row widths and as split aligned gathers.

Run: PF_LOG2N={20,22} python benchmarks/exp_gather_width.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LOG2N = int(os.environ.get("PF_LOG2N", "20"))
N = 1 << LOG2N
SUB = 128
Q = 3


def slope(label, build_loop, m_lo=8, m_hi=40, reps=4):
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
    print(f"{label}: {per*1e3:.4f} ms/exec", flush=True)
    return per


def main():
    key = jax.random.PRNGKey(0)
    n_fc = N // SUB
    n_subs = n_fc
    # a0-like sorted-ish indices
    a0 = jnp.sort(
        jax.random.randint(key, (n_subs,), 0, n_fc - Q, jnp.int32)
    )
    row_idx = (a0[:, None] + jnp.arange(Q, dtype=jnp.int32)[None, :]).reshape(-1)

    def build_take(width):
        mega = jax.random.normal(
            jax.random.fold_in(key, width), (n_fc + Q, width), jnp.float32
        )

        def build(m):
            @jax.jit
            def run():
                def body(c, _):
                    g = jnp.take(mega + c, row_idx, axis=0)
                    return jnp.mean(g) * 1e-6, None

                c, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None, length=m
                )
                return c

            return run

        return build

    def build_split():
        s_arr = jax.random.normal(key, (n_fc + Q, SUB), jnp.float32)
        d_arr = jax.random.normal(
            jax.random.fold_in(key, 1), (n_fc + Q, SUB), jnp.float32
        )
        b_arr = jax.random.normal(
            jax.random.fold_in(key, 2), (n_fc + Q, 1), jnp.float32
        )

        def build(m):
            @jax.jit
            def run():
                def body(c, _):
                    g1 = jnp.take(s_arr + c, row_idx, axis=0)
                    g2 = jnp.take(d_arr + c, row_idx, axis=0)
                    g3 = jnp.take(b_arr + c, a0, axis=0)
                    return (
                        jnp.mean(g1) * 1e-7
                        + jnp.mean(g2) * 1e-7
                        + jnp.mean(g3) * 1e-7
                    ), None

                c, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None, length=m
                )
                return c

            return run

        return build

    print(f"N=2^{LOG2N}: {n_subs} subs x {Q} rows")
    for width in (257, 256, 384, 512):
        slope(f"take rows of width {width:>3}", build_take(width))
    slope("split takes 128|128|1     ", build_split())


if __name__ == "__main__":
    main()
