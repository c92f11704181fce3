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
3.  One row gather fetches the Q fine-chunk rows of a mega array
    [starts (128) | particle diffs (128·d) | chunk base p_{m·128−1} (d)]
    per sub-group.
4.  The Pallas kernel computes, per sub-group,
        C[k, w] = (s_win[w] ≤ k)            (128 × Q·128 VPU compare)
        out[k]  = Σ_w C[k, w] · d_win[w]    (VPU multiply-reduce)
    with d_w = p_w − p_{w−1}: C selects the prefix of diffs up to the
    active ancestor, which telescopes to ``p[j(k)] − p[a₀·128 − 1]``
    exactly. The chunk base is added back with a broadcast+reshape.
5.  If ANY sub-group's ancestor span exceeds Q fine chunks (extreme local
    weight degeneracy — needs a ~384-ancestor run of near-zero weights
    inside one sub-group), the whole resample takes the exact XLA
    scatter+cumsum fallback instead. Same starts ⇒ identical ancestry.

Per-output work is S×(Q·128) compare+mac = 512 ops — half the earlier
block-dense variant (window 1024) and with no in-kernel index logic.
Measured at N=2^20, d=1: ~0.29 ms full resample (unrolled batched-
transpose kernel, r3) vs ~2.3 ms (fori_loop + per-sub transposes, r2)
/ ~2.8 ms (block-dense Pallas) / ~9 ms (XLA scatter), all inside a
``lax.scan``.

Finer decompositions were tried and REJECTED on measurement: (a) in-kernel
one-hot row selection per 128-output sub (6.3 ms), (b) per-32-output fine
groups with one-hot selects (9.5 ms), (c) per-32-output fine groups with
dynamic-shift ``pltpu.roll`` row selection (bench regressed 3.7e9 →
2.2e9 particle-steps/s). On this VPU the fixed overhead of many small
per-group scalar/select/roll ops exceeds their op-count savings every
time; one dense well-shaped compare per 128 outputs is the sweet spot.
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
_QROWS = 4  # fine-chunk rows gathered per sub-group
_SG = 64  # sub-groups per pallas grid step


def _resample_kernel(
    s_win_ref,  # (1, SG, Q*128) f32 VMEM: per-sub window starts
    d_win_ref,  # (1, SG, d, Q*128) f32 VMEM: per-sub window diffs
    out_ref,  # (1, SG*d, 128) f32 VMEM: per-sub output rows
    *,
    d_dim: int,
):
    # Structure notes (all slope-measured at N=2^20, r3):
    # - The loop over the SG sub-groups is UNROLLED python, not fori_loop,
    #   and each sub-group's (128, 1) reduce result is collected into one
    #   (128, SG·d) buffer that is transposed ONCE per grid step. The
    #   previous form — fori_loop with a per-sub (128,1)→(1,128)
    #   transpose before the output write — spent ~1.8 ms/resample on
    #   8192 tiny relayouts + loop overhead; this form runs the whole
    #   resample in ~0.3 ms. The window width barely matters next to
    #   that (q2 measured SLOWER than q4 here — lane-dim 256 vectorizes
    #   worse than 512 — so there is no narrow-window cascade).
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
    base = (sup * _SG * _SUB).astype(jnp.float32)
    cols = []
    for i in range(_SG):
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
    out_ref[0, :, :] = acc.T  # ONE relayout per grid step


def _blocked_pallas_path(starts, particles, a0, n, n_subs_pad):
    """One Q-row gather per sub-group + the dense per-sub Pallas kernel."""
    num_super = n_subs_pad // _SG
    d = particles.shape[1]

    # --- fine-chunk mega array: [starts | diffs | chunk base] ------------
    n_fc = -(-n // _SUB)
    n_fc_ext = n_fc + _QROWS  # sentinel chunks past the end
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
    mega = jnp.concatenate([starts_f, diffs, chunk_base], axis=1)

    # --- THE gather: Q consecutive mega rows per sub-group ---------------
    row_idx = (
        a0[:, None] + jnp.arange(_QROWS, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    g_all = jnp.take(mega, row_idx, axis=0).reshape(
        n_subs_pad, _QROWS, _SUB * (1 + d) + d
    )

    # --- static-slice the gathered rows back apart (no gathers) ----------
    s_win = g_all[:, :, :_SUB].reshape(num_super, _SG, _QROWS * _SUB)
    d_win = (
        g_all[:, :, _SUB : _SUB * (1 + d)]
        .reshape(n_subs_pad, _QROWS * _SUB, d)
        .transpose(0, 2, 1)  # (…, d, Q·128)
        .reshape(num_super, _SG, d, _QROWS * _SUB)
    )
    bases = g_all[:, 0, _SUB * (1 + d) :]  # (n_subs_pad, d)

    out = pl.pallas_call(
        functools.partial(_resample_kernel, d_dim=d),
        grid=(num_super,),
        in_specs=[
            pl.BlockSpec(
                (1, _SG, _QROWS * _SUB),
                lambda s: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _SG, d, _QROWS * _SUB),
                lambda s: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _SG * d, _SUB), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_super, _SG * d, _SUB), jnp.float32
        ),
    )(s_win, d_win)

    # (S, SG·d, 128) rows ordered (sub, dim) → (N_pad, d); add back the
    # chunk base via broadcast + reshape (relayout only — jnp.repeat would
    # be a ~9 ms gather).
    out = (
        out.reshape(num_super, _SG, d, _SUB)
        .transpose(0, 1, 3, 2)
        .reshape(n_subs_pad * _SUB, d)
    )
    base_bc = jnp.broadcast_to(
        bases[:, None, :], (n_subs_pad, _SUB, d)
    ).reshape(n_subs_pad * _SUB, d)
    return (out + base_bc)[:n].astype(particles.dtype)


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

    # Rank every sub-group boundary among scf — NOT with an (n_subs × n_fc)
    # dense compare (67M VPU ops at N=2^20, ~0.3 ms) but by inverting the
    # sorted scf with the same scatter+cumsum trick the resampler itself
    # uses: #{m : scf_m <= k} = #{m : ceil(scf_m / 128) <= k/128} for the
    # aligned boundaries k = 128·s, so marks at ceil(scf/128) (and at
    # floor(scf/128) for the last-real-position probe) cumsum to the
    # ranks in O(n_fc) work. a0 = fine chunk of the sub-group's first
    # ancestor; a_hi at its last REAL position detects span overflow
    # exactly (both match the dense-compare definition bit-for-bit).
    scf_cl = jnp.clip(scf, 0, n_subs_pad * _SUB)  # sentinels -> top bucket
    c_lo = (scf_cl + (_SUB - 1)) // _SUB  # ceil(scf/128)  in [0, n_subs_pad]
    marks_lo = jnp.zeros((n_subs_pad + 1,), jnp.int32).at[c_lo].add(
        1, indices_are_sorted=True, mode="drop"
    )
    rank_lo = jnp.cumsum(marks_lo)  # rank_lo[s] = #{scf <= 128·s}
    a0 = jnp.maximum(rank_lo[:-1] - 1, 0)  # (n_subs_pad,)

    # probe = min(128·s + 127, n−1); for full sub-groups floor(scf/128)
    # buckets give #{scf <= 128·s + 127}. The final (ragged) sub-group's
    # probe n−1 is conservative-exact: scf entries in (n−1, 128·s+127]
    # could only be the padded sentinels (clipped above), never real
    # chunks, so the floor-bucket rank equals the dense-compare rank.
    c_hi = scf_cl // _SUB
    marks_hi = jnp.zeros((n_subs_pad + 1,), jnp.int32).at[c_hi].add(
        1, indices_are_sorted=True, mode="drop"
    )
    rank_hi = jnp.cumsum(marks_hi)
    a_hi = rank_hi[:-1] - 1
    span = jnp.max(a_hi - a0)

    # The 4-row window tolerates 4x local weight deficiency inside any
    # 128-output sub-group; anything worse (pathological degeneracy) takes
    # the exact XLA telescoping fallback. Both produce identical ancestry
    # (same starts). A narrower Q=2 window was measured SLOWER than Q=4
    # (lane-dim 256 vectorizes worse than 512), so there is no cascade.
    def fast(_):
        return _blocked_pallas_path(starts, particles, a0, n, n_subs_pad)

    def slow(_):
        return slow_path(starts, particles)

    return lax.cond(span < _QROWS, fast, slow, None)
