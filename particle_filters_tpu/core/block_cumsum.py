"""Two-level blocked cumulative sum — 5.7× faster than XLA's 1-D cumsum.

XLA lowers ``jnp.cumsum`` over a (2²⁰,) vector on TPU v5e to ~0.21 ms
(slope-measured inside a ``lax.scan``; ``benchmarks/exp_resample_opts.py``).
The same prefix sum computed as

    reshape (rows, 128) → 7 shifted adds along lanes (within-row inclusive
    cumsum) → recursive cumsum of the 1-per-row totals → broadcast row
    offsets back

runs in 0.037 ms: every pass is a full-width (rows, 128) VPU op instead of
whatever serial/log-pass form XLA picks for the 1-D op. Used by the
systematic-resampling starts (``resampling/hard.py::_child_run_ends``),
where the cumsum was the single most expensive prep stage (stage A of
``benchmarks/profile_resample_split.py``).

Summation ORDER differs from ``jnp.cumsum`` (blocked tree vs XLA's
internal association), so floating-point results differ by O(eps) — all
consumers normalize by the total and tolerate this (the inverse-CDF
convention is defined by whatever ``_child_run_ends`` computes, and every
resample path shares it). Integer dtypes are exact regardless of order.
"""

from __future__ import annotations

import jax.numpy as jnp

_LANES = 128
# Below this, padding + two passes cost more than XLA's native op.
_MIN_BLOCKED = 1 << 14


def blocked_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum of a 1-D array, TPU-blocked for large N.

    Bit-equal to ``jnp.cumsum`` for integer dtypes; O(eps)-equal for floats
    (different summation tree). Works on any backend.
    """
    n = x.shape[0]
    if n < _MIN_BLOCKED:
        return jnp.cumsum(x)
    rows = -(-n // _LANES)
    pad = rows * _LANES - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    x2 = x.reshape(rows, _LANES)
    c = x2
    for s in (1, 2, 4, 8, 16, 32, 64):
        c = c + jnp.pad(c, ((0, 0), (s, 0)))[:, :-s]
    row_tot = c[:, -1]  # (rows,)
    row_incl = blocked_cumsum(row_tot)  # recurse; rows ≤ n/128
    row_off = row_incl - row_tot  # exclusive offsets
    out = (c + row_off[:, None]).reshape(rows * _LANES)
    return out[:n] if pad else out
