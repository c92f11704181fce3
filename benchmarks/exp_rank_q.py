"""Throwaway r3 harness: ranking variants + window width for the resample.

Stage B (a0/a_hi ranking) costs 0.19 ms at N=2^20 — two 8193-slot
scatter+cumsum passes. Variants measured here, all inside lax.scan with
carry-fed results (CLAUDE.md timing rules):

  r0  current: two int32 scatters + two jnp.cumsum(8193)
  r1  r0 with blocked_cumsum instead of jnp.cumsum
  r2  dense XLA compare: ranks = sum(scf[None,:] <= probe[:,None]) in f32
  r3  one 2-wide scatter (rows carry [1, aligned]) + derived rank_lo

Then the full blocked resample at _QROWS in {4, 3} (span on this workload
is <= 2, so Q=3 keeps the fast path; gather volume and kernel compare
width both drop 25%).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from particle_filters_tpu.core.block_cumsum import blocked_cumsum
from particle_filters_tpu.ops import resample_pallas as rp
from particle_filters_tpu.resampling.hard import _systematic_starts

N = 1 << 20
SUB = 128
N_FC = N // SUB
N_SUBS_PAD = N_FC


def slope(label, build_loop, m_lo=16, m_hi=112, reps=4):
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


def make_scf(key, w):
    starts = _systematic_starts(key, w, N)
    scf = starts.reshape(N_FC, SUB)[:, 0]
    return jnp.clip(scf, 0, N_SUBS_PAD * SUB)


def rank_r0(scf_cl):
    c_lo = (scf_cl + (SUB - 1)) // SUB
    marks_lo = jnp.zeros((N_SUBS_PAD + 1,), jnp.int32).at[c_lo].add(
        1, indices_are_sorted=True, mode="drop"
    )
    a0 = jnp.maximum(jnp.cumsum(marks_lo)[:-1] - 1, 0)
    c_hi = scf_cl // SUB
    marks_hi = jnp.zeros((N_SUBS_PAD + 1,), jnp.int32).at[c_hi].add(
        1, indices_are_sorted=True, mode="drop"
    )
    a_hi = jnp.cumsum(marks_hi)[:-1] - 1
    return a0, a_hi


def rank_r1(scf_cl):
    c_lo = (scf_cl + (SUB - 1)) // SUB
    marks_lo = jnp.zeros((N_SUBS_PAD + 1,), jnp.int32).at[c_lo].add(
        1, indices_are_sorted=True, mode="drop"
    )
    a0 = jnp.maximum(blocked_cumsum(marks_lo)[:-1] - 1, 0)
    c_hi = scf_cl // SUB
    marks_hi = jnp.zeros((N_SUBS_PAD + 1,), jnp.int32).at[c_hi].add(
        1, indices_are_sorted=True, mode="drop"
    )
    a_hi = blocked_cumsum(marks_hi)[:-1] - 1
    return a0, a_hi


def rank_r2(scf_cl):
    scf_f = scf_cl.astype(jnp.float32)  # exact below 2^24
    s = jnp.arange(N_SUBS_PAD, dtype=jnp.float32)
    lo = jnp.sum(
        jnp.where(scf_f[None, :] <= (s * SUB)[:, None], 1.0, 0.0), axis=1
    )
    hi = jnp.sum(
        jnp.where(scf_f[None, :] <= (s * SUB + (SUB - 1))[:, None], 1.0, 0.0),
        axis=1,
    )
    a0 = jnp.maximum(lo.astype(jnp.int32) - 1, 0)
    a_hi = hi.astype(jnp.int32) - 1
    return a0, a_hi


def rank_r3(scf_cl):
    c_hi = scf_cl // SUB
    aligned = (scf_cl % SUB == 0).astype(jnp.int32)
    vals = jnp.stack([jnp.ones_like(c_hi), aligned], axis=1)  # (N_FC, 2)
    marks = jnp.zeros((N_SUBS_PAD + 1, 2), jnp.int32).at[c_hi].add(
        vals, indices_are_sorted=True, mode="drop"
    )
    rank_hi = blocked_cumsum(marks[:, 0])  # #{scf <= 128s+127} = #{c_hi <= s}
    eq = marks[:, 1]  # #{scf == 128s} bucketed at c_hi == s
    # rank_lo[s] = #{scf <= 128s} = #{scf <= 128(s-1)+127} + #{scf == 128s}
    rank_lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), rank_hi[:-1]]) + eq
    a0 = jnp.maximum(rank_lo[:-1] - 1, 0)
    a_hi = rank_hi[:-1] - 1
    return a0, a_hi


def main():
    key = jax.random.PRNGKey(0)
    w0 = jax.nn.softmax(jax.random.normal(key, (N,), jnp.float32))
    p = jax.random.normal(jax.random.fold_in(key, 1), (N, 1), jnp.float32)

    # correctness + span stat first
    scf = make_scf(key, w0)
    a0_0, ahi_0 = rank_r0(scf)
    for name, fn in [("r1", rank_r1), ("r2", rank_r2), ("r3", rank_r3)]:
        a0, ahi = fn(scf)
        ok = bool(jnp.all(a0 == a0_0) & jnp.all(ahi == ahi_0))
        print(f"{name} matches r0: {ok}")
        assert ok, name
    print(f"max span on this workload: {int(jnp.max(ahi_0 - a0_0))}")

    def build_rank(fn):
        def build(m):
            ks = jax.random.split(key, m)

            @jax.jit
            def run():
                def body(c, k):
                    scf = make_scf(k, c)
                    a0, ahi = fn(scf)
                    s = a0[-1] + ahi[0] + jnp.max(ahi - a0)
                    c2 = c * (1.0 + 1e-12 * s.astype(jnp.float32))
                    return c2 / jnp.sum(c2), None

                c, _ = jax.lax.scan(body, w0, ks)
                return jnp.sum(c[:8])

            return run

        return build

    for name, fn in [
        ("r0 two scatters + cumsum ", rank_r0),
        ("r1 scatters + blocked    ", rank_r1),
        ("r2 dense XLA compare     ", rank_r2),
        ("r3 one 2-wide scatter    ", rank_r3),
    ]:
        slope(name, build_rank(fn))

    # full resample at Q=4 vs Q=3 (monkeypatched; re-jit per variant)
    def build_full(q):
        def build(m):
            ks = jax.random.split(key, m)

            @jax.jit
            def run():
                old = rp._QROWS
                rp._QROWS = q
                try:

                    def body(c, k):
                        out = rp.systematic_resample_values_blocked(
                            k, c, w=w0
                        )
                        return out, None

                    c, _ = jax.lax.scan(body, p, ks)
                finally:
                    rp._QROWS = old
                return jnp.sum(c[:8])

            return run

        return build

    for q in (4, 3):
        # exactness of the Q-variant vs Q=4 reference
        old = rp._QROWS
        rp._QROWS = q
        try:
            out_q = rp.systematic_resample_values_blocked(key, p, w=w0)
        finally:
            rp._QROWS = old
        if q == 4:
            out_ref = out_q
        else:
            err = float(jnp.max(jnp.abs(out_q - out_ref)))
            print(f"Q={q} max abs diff vs Q=4: {err:.2e}")
        slope(f"full resample Q={q}        ", build_full(q))


if __name__ == "__main__":
    main()
