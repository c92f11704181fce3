"""Blocked gather-free systematic resampling (Pallas TPU kernel).

Problem: systematic resampling needs ``out[i] = p[j(i)]`` with
``j(i) = max{j : start_j ≤ i}`` where ``start_j = ⌈N·cdf_j − u⌉`` are the
*sorted* child-run start positions (reference semantics:
``models/particle_filter.py:146-171``, an O(N) sequential CDF walk).

On TPU v5e, XLA lowers every irregular memory op to serial loops: a
1e6-element ancestor gather ≈ 7 ms, scatter+cumsum ≈ 9 ms (slope-timed),
searchsorted+gather ≈ 140 ms. This module removes all of them except ONE
regular row gather:

1.  Outputs are split into SUB-GROUPS of S = 128 consecutive positions.
    Each ancestor is consumed exactly once globally, so a sub-group
    consumes ~S ancestors on average; its ancestors almost always lie
    within Q = 4 consecutive FINE CHUNKS of 128 particles.
2.  The fine chunk of each sub-group's first ancestor is found without
    searchsorted: rank its first output position among the fine-chunk
    leading starts with a dense compare-and-sum (VPU ops, no serial
    gathers). The same ranking at the sub-group's last REAL position
    detects span overflow exactly.
3.  Row gathers fetch the Q fine-chunk rows per sub-group from three
    SEPARATE fine-chunk arrays — starts (128-wide), particle diffs
    (128·d-wide), chunk bases p_{m·128−1} (d-wide) — kept apart so the two
    LARGE gathers (starts, diffs) ride 128-multiple-wide rows; the
    chunk-base rows are only d-wide, but that gather is Q× smaller and
    measured ~0 (exp_gather_width.py). A single concatenated
    [starts|diffs|base] row is misaligned with the lane tiling and XLA's
    gather collapses on it; see the rejected-decompositions note.
4.  The Pallas kernel computes, per sub-group,
        C[k, w] = (s_win[w] ≤ k)            (128 × Q·128 VPU compare)
        out[k]  = Σ_w C[k, w] · d_win[w]    (VPU multiply-reduce)
    with d_w = p_w − p_{w−1}: C selects the prefix of diffs up to the
    active ancestor, which telescopes to ``p[j(k)] − p[a₀·128 − 1]``
    exactly. The chunk base is added back with a broadcast+reshape.
5.  The window width is TIERED on the exact measured span: Q=3 covers
    every sub-group whose local weight deficiency is < 3x (all
    lognormal-weight workloads down to ESS ≈ N/3 — and an adaptive
    ESS<N/2 trigger usually fires in that regime); a Q=8 middle tier
    covers moderate degeneracy down to ESS ≈ 0.12·N; anything worse
    takes the exact XLA scatter+cumsum fallback. All tiers share the
    same starts ⇒ identical ancestry.

Per-output work is Q·128 compare+mac — 384 on the common Q=3 tier
(ancestor spans measure ≤ 2 chunks on every resampling step of the
north-star workload). Slope-measured at N=2^20, d=1
(``benchmarks/profile_resample_split.py``, m=8→72 spread): ~0.66 ms
full resample on the Q=3 tier (split aligned gathers, r3b; prep
stages: starts 0.04 + rank 0.08 + array builds ~0 + the three row
gathers 0.17, kernel+output ≈ 0.37) vs 0.74 ms (single 257-wide
mega-array gather — the misalignment penalty explodes with N: 4.37 ms
at N=2^22 vs 2.87 ms split) / 0.92 ms (Q=4, two-scatter ranking,
XLA-side base add) / ~2.3 ms (fori_loop + per-sub transposes, r2) /
~2.8 ms (block-dense Pallas) / ~9 ms (XLA scatter), all inside a
``lax.scan``.

Finer decompositions were tried and REJECTED on measurement: (a) in-kernel
one-hot row selection per 128-output sub (6.3 ms), (b) per-32-output fine
groups with one-hot selects (9.5 ms), (c) per-32-output fine groups with
dynamic-shift ``pltpu.roll`` row selection (bench regressed 3.7e9 →
2.2e9 particle-steps/s). On this VPU the fixed overhead of many small
per-group scalar/select/roll ops exceeds their op-count savings every
time; one dense well-shaped compare per 128 outputs is the sweet spot.

(d, r3) Replacing the XLA Q-row gather with ONE contiguous in-kernel DMA
per 64-sub grid step — the needed mega rows span only 67–94 rows even at
ESS = 0.002·N (measured, ``benchmarks/exp_resample_dma.py``), so a
128-row HBM→VMEM copy covers every tier — fails on a Mosaic limitation,
not on the data: per-sub windowing then needs (1, 128) loads at DYNAMIC
sublane offsets, which Mosaic rejects ("Invalid input layout" on
``vector.load``), and slicing lanes out of a wider loaded value breaks
the downstream (1,128)→(128,128) broadcast layout the compare needs.
The workarounds are exactly the rejected patterns above (per-sub tiny
DMAs ≈ (a)/(b); dynamic roll = (c)), so the XLA row gather — 0.15 ms of
the 0.74 — stays.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particle_filters_tpu.core.block_cumsum import blocked_cumsum
from particle_filters_tpu.core.weights import log_normalize
from particle_filters_tpu.resampling.hard import _systematic_starts

_SUB = 128  # outputs per sub-group (= fine chunk width = lane width)
_QROWS = 3  # fine-chunk rows gathered per sub-group (primary tier)
_QROWS_MID = 8  # middle-tier window for moderate degeneracy
_SG = 64  # sub-groups per pallas grid step


def _resample_kernel(
    s_win_ref,  # (1, SG, Q*128) f32 VMEM: per-sub window starts
    d_win_ref,  # (1, SG, d, Q*128) f32 VMEM: per-sub window diffs
    base_ref,  # (1, 1, SG*d) f32 VMEM: per-sub chunk bases
    out_ref,  # (1, SG*d, 128) f32 VMEM: per-sub output rows
    *,
    d_dim: int,
    sg: int,
):
    # Structure notes (all slope-measured at N=2^20, r3):
    # - The loop over the SG sub-groups is UNROLLED python, not fori_loop,
    #   and each sub-group's (128, 1) reduce result is collected into one
    #   (128, SG·d) buffer that is transposed ONCE per grid step. The
    #   previous form — fori_loop with a per-sub (128,1)→(1,128)
    #   transpose before the output write — spent ~1.8 ms/resample on
    #   8192 tiny relayouts + loop overhead; this form runs the whole
    #   resample in ~0.3 ms. The window width barely matters next to
    #   that. Kernel-only slope times at N=2^20 (exp_kernel_var, r3):
    #   Q=4 0.355 ms, Q=3 0.282 ms, SG=128 within noise of SG=64; the
    #   in-kernel transpose and the select are both ~free (sum-only and
    #   no-transpose variants measured within 3%).
    # - The chunk base is added IN the kernel (one broadcast add over the
    #   (128, SG·d) accumulator): doing it XLA-side costs a separate
    #   4 MB broadcast+add pass, and for d=1 forces a (…, 128, 1)
    #   relayout — together ~0.19 ms of the old 0.92 ms total.
    # - An MXU variant — cast the predicate to 0/1 f32 and dot it against
    #   the diffs — was tried and REVERTED: the contraction runs over the
    #   predicate's LANE dim, which Mosaic realizes with an in-kernel
    #   transpose of every compare tile (kernel 1.8 → 3.0 ms).
    # - The predicate is consumed via select, not materialized as f32
    #   (saves one VPU pass per element vs compare→astype→multiply).
    sup = pl.program_id(0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0).astype(
        jnp.float32
    )
    base = (sup * sg * _SUB).astype(jnp.float32)
    cols = []
    for i in range(sg):
        pos = base + jnp.float32(i * _SUB) + iota_s  # (128, 1) global
        # positions (exact in f32 < 2^24)
        s = s_win_ref[0, pl.ds(i, 1), :]  # (1, Q*128)
        C = s <= pos  # (128, Q*128)
        d_blk = d_win_ref[0, i]  # (d, Q*128)
        for dim in range(d_dim):
            dl = d_blk[dim : dim + 1]  # (1, Q*128)
            masked = jnp.where(C, jnp.broadcast_to(dl, C.shape), 0.0)
            cols.append(jnp.sum(masked, axis=1, keepdims=True))  # (128, 1)
    acc = jnp.concatenate(cols, axis=1)  # (128, SG*d)
    acc = acc + base_ref[0]  # broadcast (1, SG*d) chunk bases
    out_ref[0, :, :] = acc.T  # ONE relayout per grid step


def _blocked_pallas_path(starts, particles, a0, n, n_subs_pad, qrows):
    """Three aligned Q-row gathers per sub-group + the dense Pallas kernel."""
    d = particles.shape[1]
    # Shrink the per-grid-step sub-group count when the windows would
    # outgrow VMEM (wide windows x high-dim particles): keep the d_win
    # block under ~2 MB. n_subs_pad is a multiple of _SG = 64, so any
    # power-of-two sg <= 64 divides it.
    sg = _SG
    while sg > 8 and sg * d * qrows * _SUB * 4 > (2 << 20):
        sg //= 2
    num_super = n_subs_pad // sg

    # --- fine-chunk arrays: starts | diffs | chunk base -------------------
    # Kept as THREE separate 128-multiple-width arrays, NOT one concatenated
    # mega array: a single [starts|diffs|base] row is 128·(1+d)+d floats —
    # misaligned with the lane tiling — and XLA's row gather degrades
    # catastrophically on it (slope-measured jnp.take of Q=3-row windows at
    # N=2^20: 0.094 ms at width 257 vs ~0 at widths 256/384/512 or as split
    # aligned takes; at N=2^22 the misaligned gather was 2.1 ms of the
    # 4.4 ms resample — benchmarks/exp_gather_width.py).
    n_fc = -(-n // _SUB)
    n_fc_ext = n_fc + qrows  # sentinel chunks past the end
    n_ext = n_fc_ext * _SUB
    big = jnp.float32(n_subs_pad * _SUB + 256)
    starts_f = jnp.concatenate(
        [starts.astype(jnp.float32), jnp.full((n_ext - n,), big, jnp.float32)]
    ).reshape(n_fc_ext, _SUB)
    prev = jnp.concatenate(
        [jnp.zeros_like(particles[:1]), particles[:-1]], axis=0
    )
    diffs = jnp.concatenate(
        [
            (particles - prev).astype(jnp.float32),
            jnp.zeros((n_ext - n, d), jnp.float32),
        ]
    ).reshape(n_fc_ext, _SUB * d)
    p_pad = jnp.concatenate(
        [particles.astype(jnp.float32), jnp.zeros((n_ext - n, d), jnp.float32)]
    ).reshape(n_fc_ext, _SUB, d)
    chunk_base = jnp.concatenate(
        [jnp.zeros((1, d), jnp.float32), p_pad[:-1, _SUB - 1, :]], axis=0
    )  # (n_fc_ext, d) = p[m·128 − 1]

    # --- THE gathers: Q consecutive rows per sub-group --------------------
    row_idx = (
        a0[:, None] + jnp.arange(qrows, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    s_win = jnp.take(starts_f, row_idx, axis=0).reshape(
        num_super, sg, qrows * _SUB
    )
    d_win = (
        jnp.take(diffs, row_idx, axis=0)
        .reshape(n_subs_pad, qrows * _SUB, d)
        .transpose(0, 2, 1)  # (…, d, Q·128)
        .reshape(num_super, sg, d, qrows * _SUB)
    )
    # Per-sub chunk bases, row-major (sub, dim) to match the kernel's
    # accumulator column order.
    bases = jnp.take(chunk_base, a0, axis=0).reshape(num_super, 1, sg * d)

    out = pl.pallas_call(
        functools.partial(_resample_kernel, d_dim=d, sg=sg),
        grid=(num_super,),
        in_specs=[
            pl.BlockSpec(
                (1, sg, qrows * _SUB),
                lambda s: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, sg, d, qrows * _SUB),
                lambda s: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, sg * d),
                lambda s: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, sg * d, _SUB), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_super, sg * d, _SUB), jnp.float32
        ),
    )(s_win, d_win, bases)

    # (S, SG·d, 128) rows ordered (sub, dim) → (N_pad, d). Bases are
    # already added in-kernel; for d=1 the row-major order IS the output
    # order, so this is a pure reshape (no relayout pass).
    if d == 1:
        out = out.reshape(n_subs_pad * _SUB, 1)
    else:
        out = (
            out.reshape(num_super, sg, d, _SUB)
            .transpose(0, 1, 3, 2)
            .reshape(n_subs_pad * _SUB, d)
        )
    return out[:n].astype(particles.dtype)


def _rank_window(scf, n_subs_pad):
    """Fine chunks (a0, a_hi) of each sub-group's first/last ancestor.

    Ranks every sub-group boundary among the sorted fine-chunk leading
    starts ``scf`` — NOT with an (n_subs × n_fc) dense compare (67M VPU
    ops at N=2^20, ~0.3 ms) but by inverting sorted scf with the same
    scatter+cumsum trick the resampler itself uses, in ONE 2-wide scatter
    (XLA's serial scatter cost scales with rows, so two 1-wide scatters
    cost ~2x; slope-measured 0.138 -> 0.058 ms at N=2^20,
    benchmarks/exp_rank_q.py):

      rank_hi[s] = #{scf <= 128·s+127} = #{floor(scf/128) <= s}
      rank_lo[s] = #{scf <= 128·s}     = rank_hi[s-1] + #{scf == 128·s}

    so marks at floor(scf/128) with values [1, scf%128==0] give both
    ranks after one blocked cumsum. a0 = fine chunk of the sub-group's
    first ancestor; a_hi at its last REAL position detects span overflow
    exactly (the probe min(128·s+127, n−1) is conservative-exact for the
    ragged final sub-group: scf entries in (n−1, 128·s+127] could only
    be padded sentinels, clipped below, never real chunks). Both match
    the dense-compare definition bit-for-bit
    (tests/unit/test_resampling.py::test_span_ranks_match_dense_compare).
    """
    scf_cl = jnp.clip(scf, 0, n_subs_pad * _SUB)  # sentinels -> top bucket
    c_hi = scf_cl // _SUB  # floor(scf/128) in [0, n_subs_pad]
    aligned = (scf_cl % _SUB == 0).astype(jnp.int32)
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
    a0 = jnp.maximum(rank_lo[:-1] - 1, 0)  # (n_subs_pad,)
    a_hi = rank_hi[:-1] - 1
    return a0, a_hi


def systematic_resample_values_blocked(
    key: jax.Array,
    particles: jax.Array,
    *,
    logw: Optional[jax.Array] = None,
    w: Optional[jax.Array] = None,
) -> jax.Array:
    """Systematic resampling of (N, d) particle values, Pallas fast path.

    Exact: same ancestry (same u, same inverse-CDF convention) as
    ``resampling.hard.systematic_resample``. Sub-groups whose ancestor span
    exceeds the Q-row window (extreme weight degeneracy) are detected
    exactly and the whole resample falls back to the XLA scatter+cumsum
    path.
    """
    if (w is None) == (logw is None):
        raise ValueError("Pass exactly one of w= or logw=.")
    if logw is not None:
        logw_n, _ = log_normalize(logw)
        weights = jnp.exp(logw_n)
    else:
        weights = w / jnp.sum(w)

    n, d = particles.shape
    starts = _systematic_starts(key, weights, n)  # (N,) int32 sorted

    def slow_path(starts, particles):
        # Same starts → identical ancestry; XLA scatter+cumsum telescoping.
        prev = jnp.concatenate(
            [jnp.zeros_like(particles[:1]), particles[:-1]], axis=0
        )
        diffs = particles - prev
        out = jnp.zeros_like(particles).at[starts].add(
            diffs, indices_are_sorted=True, mode="drop"
        )
        if d == 1:
            return blocked_cumsum(out[:, 0])[:, None]
        return jnp.cumsum(out, axis=0)

    if n > 1 << 24:
        # The kernel compares positions in f32, exact only below 2^24.
        # Past that the exact-integer starts (resampling/exact.py) feed
        # the XLA telescoping path directly.
        return slow_path(starts, particles)

    n_fc = -(-n // _SUB)
    n_subs = -(-n // _SUB)
    n_subs_pad = -(-n_subs // _SG) * _SG

    # Fine-chunk leading starts scf_m = start_{m·128}: a strided slice.
    pad = n_fc * _SUB - n
    starts_pad = jnp.concatenate([starts, jnp.full((pad,), jnp.int32(2**30))])
    scf = starts_pad.reshape(n_fc, _SUB)[:, 0]  # (n_fc,)

    a0, a_hi = _rank_window(scf, n_subs_pad)
    span = jnp.max(a_hi - a0)

    # Three tiers, routed at runtime on the exact span (chunks touched =
    # span+1). Measured max chunks touched at N=2^20 over lognormal
    # weights softmax(σ·z) — the span is BIMODAL in the ESS fraction:
    #   ESS/N   0.94  0.37  0.33 | 0.30  0.24  0.19  0.15  0.12 | 0.03
    #   chunks     3     3     3 |    4     4     5     6     7 |   29
    # An adaptive trigger at ESS<N/2 usually lands in the left block, so
    # the Q=3 tier is the common case; the Q=8 middle tier covers the
    # moderate-degeneracy band down to ESS ≈ 0.12·N; past that spans blow
    # through any fixed window and the exact XLA telescoping fallback
    # runs. All three produce identical ancestry (same starts).
    def fast(_):
        return _blocked_pallas_path(
            starts, particles, a0, n, n_subs_pad, _QROWS
        )

    def mid(_):
        return _blocked_pallas_path(
            starts, particles, a0, n, n_subs_pad, _QROWS_MID
        )

    def slow(_):
        return slow_path(starts, particles)

    tier = (span >= _QROWS).astype(jnp.int32) + (
        span >= _QROWS_MID
    ).astype(jnp.int32)
    return lax.switch(tier, [fast, mid, slow], None)
