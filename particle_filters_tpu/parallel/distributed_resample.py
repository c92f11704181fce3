"""Memory-bounded cross-shard systematic resampling (neighbor exchange).

The all-gather resample (``models/particle_filter.py:_maybe_resample``)
replicates the FULL cloud on every device during the resample step —
exact and simple, but O(N) memory per device, which caps multi-host runs
near N ~ 1e7. This module implements the ragged-ancestry alternative
promised in ``parallel/sharded.py``: each shard materializes only its
2·radius+1 neighbor shards (ring ``ppermute``), O((2r+1)·N/S) memory.

Why neighbors suffice: under systematic resampling, output slot i draws
the ancestor with CDF cell containing (i + u)/N. Shard d owns the output
slots [d·n/S, (d+1)·n/S) — positions in ≈ [d/S, (d+1)/S) — and the global
CDF segment of shard s spans [offsets_s, offsets_{s+1}), which for a
weight imbalance bounded by a factor of (r+...) stays within r shards of
d/S. The returned ``ok`` flag reports exactly (per call, replicated)
whether every ancestor fell inside the pool; if it is False the radius
was too small for this weight distribution and the caller should widen it
(or use the all-gather path).

Exactness: same key ⇒ same u ⇒ the SAME global child-start vector
t_j = ceil(N·cdf_j − u) as the all-gather path; the local output is the
gather-free telescoping scatter+cumsum of ``resampling/hard.py`` applied
to the pooled values with the slot offset subtracted — bit-for-bit the
same convention, so the two paths agree up to cumsum rounding order.

Precision bound: the child starts are computed as ``ceil(N·cdf − u)`` in
float32 (TPU-native; x64 is globally disabled), whose unit-spacing breaks
down once N·cdf exceeds 2²⁴ ≈ 1.7e7 — starts then quantize to multi-slot
granularity and the all-gather-equivalence above degrades to
O(N·2⁻²⁴)-slot ancestry jitter. The same bound applies to the all-gather
path itself (``resampling/hard.py`` uses the identical f32 arithmetic),
so the two paths stay mutually consistent; a trace-time warning fires
beyond the bound. Exact N ≫ 2²⁴ support would need compensated (double-
single) cumsum/multiply arithmetic end to end.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
from jax import lax


def neighbor_exchange_systematic_resample(
    key: jax.Array,
    particles: jax.Array,  # (n_local, d) — this shard's slice
    logw: jax.Array,  # (n_local,) globally normalized log-weights
    *,
    axis_name: str,
    radius: int = 2,
):
    """Systematic resample of the global cloud without materializing it.

    Call inside ``shard_map``. Returns ``(new_local_particles, ok)`` where
    ``ok`` is a replicated bool: True iff every ancestor of this step's
    output slots lay within ``radius`` shards (the result is then exactly
    the all-gather systematic resample for the same key).
    """
    n_local = particles.shape[0]
    n_shards = lax.axis_size(axis_name)
    d = lax.axis_index(axis_name)
    n_total = n_local * n_shards
    if n_total > 2**24:
        warnings.warn(
            f"neighbor_exchange_systematic_resample: N={n_total} exceeds the "
            "float32 child-start exactness bound (2^24); ancestry will carry "
            f"~{n_total / 2**24:.1f}-slot quantization jitter (see module "
            "docstring).",
            stacklevel=2,
        )
    dtype = particles.dtype

    w_local = jnp.exp(logw).astype(dtype)
    local_sum = jnp.sum(w_local)
    shard_sums = lax.all_gather(local_sum, axis_name)  # (S,)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.cumsum(shard_sums)]
    )  # (S+1,)
    total = offsets[-1]

    # Global CDF values of MY particles (normalized to [0, 1]).
    my_cdf = (offsets[d] + jnp.cumsum(w_local)) / total

    # Pool the 2r+1 neighbor shards' particles and CDF segments via ring
    # ppermute; ring-wrapped (non-contiguous) sources are neutralized via
    # their CDF fill values below.
    pool_vals, pool_cdf = [], []
    for off in range(-radius, radius + 1):
        if off == 0:
            vals, cdf = particles, my_cdf
        else:
            # shard s sends to shard s - off (so we RECEIVE shard d + off)
            perm = [(int(s), int((s - off) % n_shards)) for s in range(n_shards)]
            vals = lax.ppermute(particles, axis_name, perm)
            cdf = lax.ppermute(my_cdf, axis_name, perm)
        src = d + off
        valid = jnp.logical_and(src >= 0, src <= n_shards - 1)
        # Leading out-of-range sources get CDF 0 (never selected by the
        # strict '>' inverse-CDF since positions are > 0 w.p. 1); trailing
        # get CDF 2 (> 1 ≥ any position). Keeps the pooled CDF ascending.
        fill = jnp.where(src < 0, jnp.zeros((), dtype), jnp.full((), 2.0, dtype))
        cdf = jnp.where(valid, cdf, fill)
        pool_vals.append(vals)
        pool_cdf.append(cdf)
    pool_vals = jnp.concatenate(pool_vals, axis=0)  # ((2r+1)·n_local, d)
    pool_cdf = jnp.concatenate(pool_cdf, axis=0)

    # Same u as the single-shard/all-gather path (replicated key; drawn in
    # the WEIGHTS' dtype exactly as resampling/hard.py does, so the same
    # key gives the same u even when particle and weight dtypes differ).
    u = jax.random.uniform(key, (), logw.dtype).astype(dtype)

    # Global child-start of each pooled ancestor, shifted into MY slot
    # range [d·n_local, (d+1)·n_local): starts_j = t_{j-1}, t_j =
    # ceil(N·cdf_j − u) (resampling/hard.py convention). Entries whose
    # children all precede my range clip to 0 and telescope away; entries
    # whose children all follow my range land at n_local and are dropped.
    t = jnp.clip(jnp.ceil(n_total * pool_cdf - u), 0.0, n_total)
    starts_global = jnp.concatenate(
        [jnp.zeros((1,), t.dtype), t[:-1]]
    )
    my_slot0 = (d * n_local).astype(t.dtype)
    starts = jnp.clip(starts_global - my_slot0, 0.0, n_local).astype(jnp.int32)

    prev = jnp.concatenate(
        [jnp.zeros_like(pool_vals[:1]), pool_vals[:-1]], axis=0
    )
    diffs = pool_vals - prev
    out = jnp.zeros((n_local,) + particles.shape[1:], dtype).at[starts].add(
        diffs, indices_are_sorted=True, mode="drop"
    )
    new_particles = jnp.cumsum(out, axis=0)

    # Sufficiency: the ancestor of my FIRST slot must not precede the pool
    # (its CDF cell would live on shard < d - radius), and the ancestor of
    # my LAST slot must not follow it. Positions of my slots: (i + u)/N.
    p_first = (d * n_local + u) / n_total
    p_last = ((d + 1) * n_local - 1 + u) / n_total
    lo_edge = offsets[jnp.maximum(d - radius, 0)] / total
    ok_lo = jnp.logical_or(d - radius <= 0, p_first >= lo_edge)
    hi_edge = offsets[jnp.minimum(d + radius + 1, n_shards)] / total
    ok_hi = jnp.logical_or(d + radius >= n_shards - 1, p_last < hi_edge)
    ok_local = jnp.logical_and(ok_lo, ok_hi)
    ok = lax.psum(ok_local.astype(jnp.int32), axis_name) == n_shards
    return new_particles, ok
