"""Throwaway r3 harness: in-kernel DMA gather for the blocked resample.

The current fast path gathers Q mega rows per sub-group with an XLA
``jnp.take`` (writes a 25 MB intermediate, re-read by the kernel, plus
window slicing/transposes). Idea: for SG consecutive sub-groups the
needed mega rows form ONE contiguous row range [a0[first], a0[last]+Q),
because a0 is nondecreasing — so each grid step can DMA that span
straight from HBM into VMEM scratch and window it with dynamic sublane
slices, eliminating the gather, the intermediate, and the reshapes.

The span across SG=64 subs is data-dependent (local weight deserts make
a0 jump between subs), so the variant carries its own exact runtime
check: spanD = max_super(a0[last] + Q - a0[first]) <= ROWS, with the
existing gather path as fallback. This script measures:

  1. spanD distribution on bench-like lognormal weights (is ROWS=128
     a real fast path?),
  2. correctness of the DMA kernel vs systematic_resample_values_blocked
     at small N,
  3. slope-timed full-resample cost at N=2^20: DMA variant vs current.

Run on TPU: python benchmarks/exp_resample_dma.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from particle_filters_tpu.ops import resample_pallas as rp
from particle_filters_tpu.resampling.hard import _systematic_starts

SUB = 128
SG = 64
Q = 3
ROWS = 128  # DMA span budget (rows of 384 f32 = 192 KB scratch)
ROW_W = 384  # starts(128) | diffs(128) | base(1) + pad — d=1 only


def _dma_kernel(a0_ref, mega_ref, out_ref, scratch, sem):
    sup = pl.program_id(0)
    row0 = a0_ref[sup * SG]
    dma = pltpu.make_async_copy(
        mega_ref.at[pl.ds(row0, ROWS)], scratch, sem
    )
    dma.start()
    dma.wait()

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0).astype(
        jnp.float32
    )
    base_pos = (sup * SG * SUB).astype(jnp.float32)
    cols = []
    for i in range(SG):
        off = a0_ref[sup * SG + i] - row0
        pos = base_pos + jnp.float32(i * SUB) + iota_s  # (128, 1)
        acc = jnp.zeros((SUB, 1), jnp.float32)
        for r in range(Q):
            s_r = scratch[pl.ds(off + r, 1), 0:SUB]  # (1, 128) starts
            d_r = scratch[pl.ds(off + r, 1), SUB : 2 * SUB]  # (1, 128) diffs
            C = s_r <= pos  # (128, 128)
            acc = acc + jnp.sum(
                jnp.where(C, jnp.broadcast_to(d_r, C.shape), 0.0),
                axis=1,
                keepdims=True,
            )
        base_row = scratch[pl.ds(off, 1), 2 * SUB : 2 * SUB + 1]  # (1, 1)
        cols.append(acc + base_row)  # chunk base of row a0
    acc_all = jnp.concatenate(cols, axis=1)  # (128, SG)
    out_ref[0, :, :] = acc_all.T


def dma_resample_values(starts, particles, a0):
    """d=1 DMA-gather variant; same ancestry as the blocked path."""
    n = particles.shape[0]
    n_fc = n // SUB
    n_subs = n_fc
    num_super = n_subs // SG

    n_fc_ext = n_fc + ROWS  # DMA may run past the end
    n_ext = n_fc_ext * SUB
    big = jnp.float32(n + 256)
    starts_f = jnp.concatenate(
        [starts.astype(jnp.float32), jnp.full((n_ext - n,), big, jnp.float32)]
    ).reshape(n_fc_ext, SUB)
    p = particles[:, 0]
    prev = jnp.concatenate([jnp.zeros((1,), p.dtype), p[:-1]])
    diffs = jnp.concatenate(
        [(p - prev).astype(jnp.float32), jnp.zeros((n_ext - n,), jnp.float32)]
    ).reshape(n_fc_ext, SUB)
    p_pad = jnp.concatenate(
        [p.astype(jnp.float32), jnp.zeros((n_ext - n,), jnp.float32)]
    ).reshape(n_fc_ext, SUB)
    chunk_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), p_pad[:-1, SUB - 1]]
    ).reshape(n_fc_ext, 1)
    mega = jnp.concatenate(
        [starts_f, diffs, chunk_base,
         jnp.zeros((n_fc_ext, ROW_W - 2 * SUB - 1), jnp.float32)],
        axis=1,
    )

    out = pl.pallas_call(
        _dma_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_super,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, SG, SUB), lambda s, a0ref: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((ROWS, ROW_W), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_super, SG, SUB), jnp.float32),
    )(a0, mega)
    return out.reshape(n, 1).astype(particles.dtype)


def rank_a0(starts, n, n_subs_pad):
    pad = n_subs_pad * SUB - n
    starts_pad = jnp.concatenate(
        [starts, jnp.full((pad,), jnp.int32(2**30))]
    )
    scf = starts_pad.reshape(n_subs_pad, SUB)[:, 0]
    return rp._rank_window(scf, n_subs_pad)


def span_d(a0):
    a0s = a0.reshape(-1, SG)
    return jnp.max(a0s[:, -1] + Q - a0s[:, 0])


def main():
    key = jax.random.PRNGKey(0)

    # --- 1. spanD distribution -------------------------------------------
    n = 1 << 20
    print("spanD (rows needed per 64-sub super) on lognormal weights:")
    for sigma in (0.3, 1.0, 1.5, 2.0, 3.0):
        lw = sigma * jax.random.normal(key, (n,), jnp.float32)
        w = jax.nn.softmax(lw)
        ess = float(1.0 / jnp.sum(w**2) / n)
        starts = _systematic_starts(jax.random.fold_in(key, 1), w, n)
        a0, a_hi = rank_a0(starts, n, n // SUB)
        print(
            f"  sigma={sigma}: ESS/N={ess:.3f} span(sub)={int(jnp.max(a_hi - a0))} "
            f"spanD={int(span_d(a0))} (budget {ROWS - Q})",
            flush=True,
        )

    # --- 2. correctness at small N ----------------------------------------
    n_small = SG * SUB * 2  # two supers
    lw = 1.0 * jax.random.normal(key, (n_small,), jnp.float32)
    w = jax.nn.softmax(lw)
    p = jax.random.normal(jax.random.fold_in(key, 2), (n_small, 1), jnp.float32)
    k = jax.random.fold_in(key, 3)
    ref = rp.systematic_resample_values_blocked(k, p, w=w)
    starts = _systematic_starts(k, w, n_small)
    a0, _ = rank_a0(starts, n_small, n_small // SUB)
    got = dma_resample_values(starts, p, a0)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"correctness (N={n_small}): max|dma - blocked| = {err:.2e}")
    assert err < 1e-5, "DMA variant disagrees with the blocked path"

    # --- 3. slope timing at N=2^20 ----------------------------------------
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
        print(f"{label}: {per*1e3:.4f} ms/exec", flush=True)
        return per

    lw = 1.0 * jax.random.normal(key, (n,), jnp.float32)
    w0 = jax.nn.softmax(lw)
    p = jax.random.normal(jax.random.fold_in(key, 1), (n, 1), jnp.float32)

    def build_current(m):
        ks = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                out = rp.systematic_resample_values_blocked(k, c, w=w0)
                return out, None

            c, _ = jax.lax.scan(body, p, ks)
            return jnp.sum(c[:8])

        return run

    def build_dma(m):
        ks = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                starts = _systematic_starts(k, w0, n)
                a0, _ = rank_a0(starts, n, n // SUB)
                out = dma_resample_values(starts, c, a0)
                return out, None

            c, _ = jax.lax.scan(body, p, ks)
            return jnp.sum(c[:8])

        return run

    slope("current blocked resample", build_current)
    slope("DMA-gather variant      ", build_dma)


if __name__ == "__main__":
    main()
