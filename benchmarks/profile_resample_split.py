"""Slope-profile the blocked Pallas resample's XLA PREP vs Pallas KERNEL.

VERDICT r2 weak #1: the 2.3 ms blocked resample at N=2^20 is ~70% of the
amortized north-star step, and its XLA-side prep (mega-array concat +
Q-row gather, ``ops/resample_pallas.py``) had never been profiled
separately from the Pallas kernel. This script splits it:

  stage A  weights (exp/log-normalize) + cumsum + starts
  stage B  A + fine-chunk leading starts + a0/a_hi ranking + overflow flag
  stage C  B + fine-chunk array builds (starts / diffs / bases)
  stage D  C + the Q-row gather + window slicing   (= full prep, no kernel)
  full     systematic_resample_values_blocked       (prep + Pallas kernel)

All stages run inside a ``lax.scan`` with results fed into the carry
(CLAUDE.md: standalone ops get DCE'd / mis-timed on the tunneled TPU);
per-exec time is the slope between two chained-execution counts so the RPC
floor cancels (``profile_kernels.py::slope``).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from particle_filters_tpu.ops import resample_pallas as rp
from particle_filters_tpu.resampling.hard import _systematic_starts

N = 1 << int(os.environ.get("PF_LOG2N", "20"))


def slope(label, build_loop, m_lo=8, m_hi=72, reps=4):
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
        f"{label}: {per*1e3:.4f} ms/exec  "
        f"(lo {min(ts_lo)*1e3:.1f} ms, hi {min(ts_hi)*1e3:.1f} ms)",
        flush=True,
    )
    return per


def _prep_stages(key, particles, w, stop_at):
    """Re-derive the prep pipeline of systematic_resample_values_blocked,
    cut at a given stage, returning a scalar that depends on everything
    computed so far (anti-DCE)."""
    n, d = particles.shape
    starts = _systematic_starts(key, w, n)
    if stop_at == "A":
        return starts[-1].astype(jnp.float32) + starts[n // 2].astype(jnp.float32)

    n_fc = -(-n // rp._SUB)
    n_subs = -(-n // rp._SUB)
    n_subs_pad = -(-n_subs // rp._SG) * rp._SG
    pad = n_fc * rp._SUB - n
    starts_pad = jnp.concatenate(
        [starts, jnp.full((pad,), jnp.int32(2**30))]
    )
    scf = starts_pad.reshape(n_fc, rp._SUB)[:, 0]
    # one 2-wide scatter + blocked cumsum (mirrors the r3 prep)
    from particle_filters_tpu.core.block_cumsum import blocked_cumsum

    scf_cl = jnp.clip(scf, 0, n_subs_pad * rp._SUB)
    c_hi = scf_cl // rp._SUB
    aligned = (scf_cl % rp._SUB == 0).astype(jnp.int32)
    marks = jnp.zeros((n_subs_pad + 1, 2), jnp.int32).at[c_hi].add(
        jnp.stack([jnp.ones_like(c_hi), aligned], axis=1),
        indices_are_sorted=True,
        mode="drop",
    )
    rank_hi = blocked_cumsum(marks[:, 0])
    rank_lo = (
        jnp.concatenate([jnp.zeros((1,), jnp.int32), rank_hi[:-1]])
        + marks[:, 1]
    )
    a0 = jnp.maximum(rank_lo[:-1] - 1, 0)
    a_hi = rank_hi[:-1] - 1
    overflow = jnp.max(a_hi - a0) >= rp._QROWS
    if stop_at == "B":
        return (
            a0[-1].astype(jnp.float32)
            + a_hi[0].astype(jnp.float32)
            + overflow.astype(jnp.float32)
        )

    # Mirrors the r3 split-arrays prep (three aligned-width gathers; the
    # old single misaligned mega-array take measured 14x worse at 2^22 —
    # exp_gather_width.py).
    n_fc_ext = n_fc + rp._QROWS
    n_ext = n_fc_ext * rp._SUB
    big = jnp.float32(n_subs_pad * rp._SUB + 256)
    starts_f = jnp.concatenate(
        [starts.astype(jnp.float32), jnp.full((n_ext - n,), big, jnp.float32)]
    ).reshape(n_fc_ext, rp._SUB)
    prev = jnp.concatenate(
        [jnp.zeros_like(particles[:1]), particles[:-1]], axis=0
    )
    diffs = jnp.concatenate(
        [
            (particles - prev).astype(jnp.float32),
            jnp.zeros((n_ext - n, d), jnp.float32),
        ]
    ).reshape(n_fc_ext, rp._SUB * d)
    p_pad = jnp.concatenate(
        [particles.astype(jnp.float32), jnp.zeros((n_ext - n, d), jnp.float32)]
    ).reshape(n_fc_ext, rp._SUB, d)
    chunk_base = jnp.concatenate(
        [jnp.zeros((1, d), jnp.float32), p_pad[:-1, rp._SUB - 1, :]], axis=0
    )
    if stop_at == "C":
        return (
            starts_f[0, 0]
            + diffs[-1, -1]
            + chunk_base[-1, 0]
            + overflow.astype(jnp.float32)
        )

    row_idx = (
        a0[:, None] + jnp.arange(rp._QROWS, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    num_super = n_subs_pad // rp._SG
    s_win = jnp.take(starts_f, row_idx, axis=0).reshape(
        num_super, rp._SG, rp._QROWS * rp._SUB
    )
    d_win = (
        jnp.take(diffs, row_idx, axis=0)
        .reshape(n_subs_pad, rp._QROWS * rp._SUB, d)
        .transpose(0, 2, 1)
        .reshape(num_super, rp._SG, d, rp._QROWS * rp._SUB)
    )
    bases = jnp.take(chunk_base, a0, axis=0)
    # stage D: full prep done; touch every output
    return s_win[0, 0, 0] + d_win[-1, -1, 0, -1] + bases[0, 0]


def main():
    import sys

    which = set(sys.argv[1:]) or {"full", "A", "B", "C", "D"}
    key = jax.random.PRNGKey(0)
    lw = jax.random.normal(key, (N,), jnp.float32)
    w0 = jax.nn.softmax(lw)
    p = jax.random.normal(jax.random.fold_in(key, 1), (N, 1), jnp.float32)

    def build_stage(stop_at):
        def build(m):
            ks = jax.random.split(key, m)

            @jax.jit
            def run():
                def body(c, k):
                    s = _prep_stages(k, p, c, stop_at)
                    c2 = c * (1.0 + 1e-12 * s)
                    return c2 / jnp.sum(c2), None

                c, _ = jax.lax.scan(body, w0, ks)
                return jnp.sum(c[:8])

            return run

        return build

    def build_full(m):
        ks = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                out = rp.systematic_resample_values_blocked(k, c, w=w0)
                return out, None

            c, _ = jax.lax.scan(body, p, ks)
            return jnp.sum(c[:8])

        return run

    if "full" in which:
        slope("full blocked resample      ", build_full)
    for st, label in [
        ("A", "A: weights+cumsum+starts   "),
        ("B", "B: A + a0/a_hi rank        "),
        ("C", "C: B + fine-chunk arrays   "),
        ("D", "D: C + Q-row gather+slice  "),
    ]:
        if st in which:
            slope(label, build_stage(st))


if __name__ == "__main__":
    main()
