"""Throwaway measurement harness for resample-path optimizations (r3).

Measures, inside lax.scan with carry-fed results (CLAUDE.md timing rules):
  1. jnp.cumsum (N,) vs hand-written two-level cumsum at N=2^20
  2. the Pallas kernel alone at Q=4 vs Q=2 (unrolled batched-transpose form)
  3. relayout cost: (8, N/8) <-> (N, 1) reshape round-trip
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 1 << 20


def slope(label, build_loop, m_lo=16, m_hi=144, reps=3):
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


def two_level_cumsum(x):
    """Inclusive cumsum of (N,) via (rows, 128) blocking: lane-dim scan of
    log2(128)=7 shifted adds + a small row-offset cumsum."""
    rows = x.shape[0] // 128
    x2 = x.reshape(rows, 128)
    # within-row inclusive cumsum along lanes (7 shifted adds)
    c = x2
    for s in (1, 2, 4, 8, 16, 32, 64):
        c = c + jnp.pad(c, ((0, 0), (s, 0)))[:, :-s]
    row_tot = c[:, -1]  # (rows,)
    # row offsets: exclusive cumsum of row totals — rows is still big
    # (8192), recurse one level: (64, 128)
    r2 = row_tot.reshape(rows // 128, 128)
    cr = r2
    for s in (1, 2, 4, 8, 16, 32, 64):
        cr = cr + jnp.pad(cr, ((0, 0), (s, 0)))[:, :-s]
    blk_tot = cr[:, -1]
    blk_off = jnp.cumsum(blk_tot) - blk_tot  # (64,) tiny
    row_incl = (cr + blk_off[:, None]).reshape(rows)
    row_off = row_incl - row_tot  # exclusive
    return (c + row_off[:, None]).reshape(-1)


def main():
    key = jax.random.PRNGKey(0)
    w = jax.nn.softmax(jax.random.normal(key, (N,), jnp.float32))

    def build_xla_cumsum(m):
        @jax.jit
        def run():
            def body(c, _):
                s = jnp.cumsum(c)
                c2 = c + 1e-12 * s
                return c2 / jnp.sum(c2), None

            c, _ = jax.lax.scan(body, w, None, length=m)
            return jnp.sum(c[:8])

        return run

    def build_two_level(m):
        @jax.jit
        def run():
            def body(c, _):
                s = two_level_cumsum(c)
                c2 = c + 1e-12 * s
                return c2 / jnp.sum(c2), None

            c, _ = jax.lax.scan(body, w, None, length=m)
            return jnp.sum(c[:8])

        return run

    # correctness first
    a = jnp.cumsum(w)
    b = two_level_cumsum(w)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"two-level cumsum max abs diff vs jnp.cumsum: {err:.3e}")

    slope("xla 1-D cumsum (N=2^20)  ", build_xla_cumsum)
    slope("two-level cumsum (N=2^20)", build_two_level)

    # relayout cost: (8, N/8) -> (N, 1) -> (8, N/8)
    p8 = jax.random.normal(key, (8, N // 8), jnp.float32)

    def build_relayout(m):
        @jax.jit
        def run():
            def body(c, _):
                flat = c.reshape(N, 1) + 1e-12
                back = flat.reshape(8, N // 8)
                return back, None

            c, _ = jax.lax.scan(body, p8, None, length=m)
            return jnp.sum(c[:, :8])

        return run

    def build_natural(m):
        @jax.jit
        def run():
            def body(c, _):
                flat = c.reshape(N, ) + 1e-12
                back = flat.reshape(N // 128, 128)
                return back, None

            c, _ = jax.lax.scan(body, p8.reshape(N // 128, 128), None, length=m)
            return jnp.sum(c[:, :8])

        return run

    slope("relayout (8,N/8)<->(N,1) ", build_relayout)
    slope("natural (N/128,128) noop ", build_natural)


if __name__ == "__main__":
    main()
