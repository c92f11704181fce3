"""Throwaway r3 harness: Pallas resample-kernel variants, kernel-only.

Feeds PREBUILT (s_win, d_win) into pallas_call variants inside a lax.scan
(carry perturbation defeats DCE) to split the 0.55 ms kernel+output cost:

  v0  current kernel (compare + where + lane-reduce, concat, one .T)
  v1  v0 minus the select: out = sum(C) only (isolates compare+reduce)
  v2  v0 with untransposed write (XLA transposes outside instead)
  v3  Q=3 window (384 lanes)
  v4  SG=128 sub-groups per grid step (fewer, bigger steps)
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from particle_filters_tpu.ops import resample_pallas as rp
from particle_filters_tpu.resampling.hard import _systematic_starts

N = 1 << 20
SUB = 128


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


def make_inputs(q, sg):
    """Build s_win/d_win exactly as the real prep does, at window q rows."""
    key = jax.random.PRNGKey(0)
    w0 = jax.nn.softmax(jax.random.normal(key, (N,), jnp.float32))
    p = jax.random.normal(jax.random.fold_in(key, 1), (N, 1), jnp.float32)
    d = 1
    starts = _systematic_starts(key, w0, N)
    n_fc = N // SUB
    n_subs_pad = n_fc
    scf = jnp.clip(starts.reshape(n_fc, SUB)[:, 0], 0, N)
    c_lo = (scf + SUB - 1) // SUB
    marks = jnp.zeros((n_subs_pad + 1,), jnp.int32).at[c_lo].add(1)
    a0 = jnp.maximum(jnp.cumsum(marks)[:-1] - 1, 0)

    n_fc_ext = n_fc + q
    n_ext = n_fc_ext * SUB
    big = jnp.float32(n_subs_pad * SUB + 256)
    starts_f = jnp.concatenate(
        [starts.astype(jnp.float32), jnp.full((n_ext - N,), big, jnp.float32)]
    ).reshape(n_fc_ext, SUB)
    prev = jnp.concatenate([jnp.zeros_like(p[:1]), p[:-1]], axis=0)
    diffs = jnp.concatenate(
        [(p - prev), jnp.zeros((n_ext - N, d), jnp.float32)]
    ).reshape(n_fc_ext, SUB * d)
    mega = jnp.concatenate([starts_f, diffs], axis=1)
    row_idx = (a0[:, None] + jnp.arange(q, dtype=jnp.int32)[None, :]).reshape(-1)
    g_all = jnp.take(mega, row_idx, axis=0).reshape(n_subs_pad, q, SUB * 2)
    num_super = n_subs_pad // sg
    s_win = g_all[:, :, :SUB].reshape(num_super, sg, q * SUB)
    d_win = (
        g_all[:, :, SUB:]
        .reshape(n_subs_pad, q * SUB, d)
        .transpose(0, 2, 1)
        .reshape(num_super, sg, d, q * SUB)
    )
    return s_win, d_win


def kern_v0(s_ref, d_ref, o_ref, *, sg, transpose=True, sum_only=False):
    sup = pl.program_id(0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0).astype(jnp.float32)
    base = (sup * sg * SUB).astype(jnp.float32)
    cols = []
    for i in range(sg):
        pos = base + jnp.float32(i * SUB) + iota_s
        s = s_ref[0, pl.ds(i, 1), :]
        C = s <= pos
        if sum_only:
            cols.append(jnp.sum(jnp.where(C, 1.0, 0.0), axis=1, keepdims=True))
        else:
            dl = d_ref[0, i]
            masked = jnp.where(C, jnp.broadcast_to(dl[0:1], C.shape), 0.0)
            cols.append(jnp.sum(masked, axis=1, keepdims=True))
    acc = jnp.concatenate(cols, axis=1)
    if transpose:
        o_ref[0, :, :] = acc.T
    else:
        o_ref[0, :, :] = acc


def build_call(q, sg, transpose, sum_only):
    s_win, d_win = make_inputs(q, sg)
    num_super = s_win.shape[0]

    def call(sw, dw):
        out_shape = (
            (num_super, sg, SUB) if transpose else (num_super, SUB, sg)
        )
        blk = (1, sg, SUB) if transpose else (1, SUB, sg)
        return pl.pallas_call(
            functools.partial(
                kern_v0, sg=sg, transpose=transpose, sum_only=sum_only
            ),
            grid=(num_super,),
            in_specs=[
                pl.BlockSpec(
                    (1, sg, q * SUB), lambda s: (s, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, sg, 1, q * SUB), lambda s: (s, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(blk, lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(sw, dw)

    def build(m):
        @jax.jit
        def run():
            def body(c, _):
                o = call(c, d_win)
                pert = o[0, 0, 0] + o[-1, -1, -1]
                return c * (1.0 + 1e-12 * pert), None

            c, _ = jax.lax.scan(body, s_win, None, length=m)
            return jnp.sum(c[0, 0, :8])

        return run

    return build


def main():
    slope("v0 current (Q=4, SG=64)   ", build_call(4, 64, True, False))
    slope("v1 sum-only (Q=4)         ", build_call(4, 64, True, True))
    slope("v2 no-transpose (Q=4)     ", build_call(4, 64, False, False))
    slope("v3 Q=3                    ", build_call(3, 64, True, False))
    slope("v4 SG=128 (Q=4)           ", build_call(4, 128, True, False))
    slope("v5 Q=3, SG=128            ", build_call(3, 128, True, False))


if __name__ == "__main__":
    main()
