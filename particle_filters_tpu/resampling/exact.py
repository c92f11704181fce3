"""Exact systematic child-run ends past the float32 N = 2^24 ceiling.

Problem (VERDICT r2 missing #1): the systematic-resampling child-run ends
``t_j = ceil(M * cdf_j - u)`` (reference convention
``models/particle_filter.py:159-171``) are computed in float32 on TPU, so
``M * cdf_j`` loses unit spacing once it exceeds 2^24 and the ancestry
quantizes to multi-slot granularity for N > ~1.7e7. A float64 rescue is
not available (TPU-native; x64 off), and *no* floating cumsum — f32, f64,
or double-single — can be platform-exact anyway: tree vs sequential
summation round differently, so CPU and TPU would disagree near every
ceil boundary.

Solution: a **quantized-integer convention** that is exact and
bit-identical on every backend AND every sharding topology, built from
vectorized int32 ops plus error-free float steps only:

1.  Quantize the weights onto a power-of-two grid:
    ``q_i = round(w_i * 2^(64 - e_max - e2))`` where ``e_max`` is the
    f32 exponent of ``max(w)`` (exact bit extraction) and ``e2`` the
    exponent of an EXACT integer rendering of ``sum(w)`` (weights
    coarsely quantized to ints on the ``2^(e_max-24)`` grid and summed
    with carry-limb int32 arithmetic — integer addition is associative,
    so the total is identical for any reduction order, shard layout, or
    backend; a float ``sum(w)`` would NOT be, which is why no float
    reduction appears anywhere in this convention). The scale is an
    exact power of two, so the product rounds identically everywhere;
    ``Q_total`` lands within a few binades of 2^40 (≥ 2^37 even for
    adversarial weight profiles), a grid ~2^13+ times finer than f32
    can resolve the cdf at N = 2^26. ``q_i`` is extracted EXACTLY into
    three 15-bit limbs — every split below is an error-free float
    operation.
2.  Exact prefix sums ``Q_j = sum_{i<=j} q_i`` via a carry-normalized
    3-limb integer add under ``lax.associative_scan`` (normalized 3-limb
    addition is associative: the value is preserved and the canonical
    form is unique).
3.  ``t_j = ceil((M*Q_j)/Q_total - u)`` with u rendered on the grid as
    ``U = floor(round(u * 2^24) * Q_total / 2^24)`` — an exact integer
    product and shift (no float division) — clamped to ``Q_total - 1``,
    evaluated as ``t_j = floor(D_j / Q_total)``,
    ``D_j = M*Q_j + (Q_total - 1 - U)`` (all terms nonnegative).
    Products are exact 5-limb integers; the division uses a
    double-single (two-float) reciprocal ESTIMATE followed by an EXACT
    integer correction (compare/adjust by one), so the quotient is
    exactly ``floor`` regardless of float rounding.

Accuracy of the convention itself: quantization perturbs each cdf value
by < 2^-37 of the total mass — strictly finer than the reference's f64
*sequential* cumsum error at N = 2^26 (~n*eps/2 ≈ 2^-29) and than any
f32 representation of the weights. Exactness claims in tests are w.r.t.
this convention, verified bit-for-bit against a Python big-integer
oracle; ``tpu_tests/test_tpu_kernels.py`` additionally pins TPU == CPU
bit-for-bit.

Engaged automatically by ``resampling.hard._child_run_ends`` when
``M > 2^24`` (and force-selectable for testing); the same limb machinery
drives the distributed neighbor-exchange path
(``parallel/distributed_resample.py``), which removes its trace-time
quantization warning.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_LB = 15  # limb bits
_BASE = 1 << _LB
_MASK = _BASE - 1
_KBITS = 40  # weight quantization grid: q_i = round(w_i * 2^40 / sum w)
EXACT_THRESHOLD = 1 << 24  # hard.py switches to this path above 2^24
_M_MAX = 1 << 27  # largest supported output count M

Limbs3 = Tuple[jax.Array, jax.Array, jax.Array]


# ---------------------------------------------------------------------------
# error-free float helpers (IEEE f32 on VPU and host alike)
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _two_prod(a, b):
    """Dekker two-product for f32: p + e == a * b exactly."""
    split = jnp.float32((1 << 12) + 1)
    ca = split * a
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = split * b
    bhi = cb - (cb - b)
    blo = b - bhi
    p = a * b
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def _ds_add_f(hi, lo, b):
    """double-single (hi, lo) + f32 b."""
    s, e = _two_sum(hi, b)
    lo = lo + e
    hi2 = s + lo
    lo2 = lo - (hi2 - s)
    return hi2, lo2


def _ds_mul_f(hi, lo, b):
    """double-single (hi, lo) * f32 b."""
    p, e = _two_prod(hi, b)
    e = e + lo * b
    hi2 = p + e
    lo2 = e - (hi2 - p)
    return hi2, lo2


# ---------------------------------------------------------------------------
# limb extraction and normalized multi-limb integer ops (int32 limbs)
# ---------------------------------------------------------------------------


def _split_f32_to_limbs3(r: jax.Array) -> Limbs3:
    """Exact 3-limb (15-bit) extraction of a nonnegative f32 < 2^44.

    Every step is an error-free f32 operation: multiplies by powers of two
    are exact; ``floor`` is exact; each subtraction cancels the leading
    bits so the result is representable. The final ``round`` defines the
    integer (round-half-even on the residual fraction), with carry fixes.
    """
    r = r.astype(jnp.float32)
    # defensive: non-finite / oversized inputs (degenerate weight sums)
    # clamp to the representable limb range instead of poisoning the
    # integer pipeline with inf/NaN casts
    r = jnp.clip(jnp.where(jnp.isfinite(r), r, 0.0), 0.0, jnp.float32(2.0**43))
    l2 = jnp.floor(r * jnp.float32(2.0**-30))
    rem = r - l2 * jnp.float32(2.0**30)
    l1 = jnp.floor(rem * jnp.float32(2.0**-15))
    frac = rem - l1 * jnp.float32(2.0**15)
    l0 = jnp.round(frac)
    # carry: round() may yield exactly 2^15
    c0 = (l0 >= _BASE).astype(jnp.float32)
    l0 = l0 - c0 * _BASE
    l1 = l1 + c0
    c1 = (l1 >= _BASE).astype(jnp.float32)
    l1 = l1 - c1 * _BASE
    l2 = l2 + c1
    return (
        l0.astype(jnp.int32),
        l1.astype(jnp.int32),
        l2.astype(jnp.int32),
    )


def _norm3(l0, l1, l2) -> Limbs3:
    c0 = l0 >> _LB
    l0 = l0 & _MASK
    l1 = l1 + c0
    c1 = l1 >> _LB
    l1 = l1 & _MASK
    l2 = l2 + c1
    return l0, l1, l2


def _add3(a: Limbs3, b: Limbs3) -> Limbs3:
    """Normalized 3-limb add — associative (exact integer addition in a
    unique canonical representation), so it is a valid
    ``associative_scan`` operator."""
    return _norm3(a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _norm5(ls):
    out = []
    c = jnp.zeros_like(ls[0])
    for l in ls[:-1]:
        s = l + c
        out.append(s & _MASK)
        c = s >> _LB
    out.append(ls[-1] + c)
    return tuple(out)


def _mul_m_by_3(m: int, q: Limbs3):
    """Exact (m * q) for python int m <= 2^27 and 3-limb q -> 5 limbs.

    Column partial products are <= 2*(2^15-1)^2 < 2^31, so every
    intermediate fits int32.
    """
    m0 = jnp.int32(m & _MASK)
    m1 = jnp.int32(m >> _LB)
    q0, q1, q2 = q
    c0 = m0 * q0
    c1 = m0 * q1 + m1 * q0
    c2 = m0 * q2 + m1 * q1
    c3 = m1 * q2
    c4 = jnp.zeros_like(q0)
    return _norm5((c0, c1, c2, c3, c4))


def _mul_2_by_3(k0, k1, q: Limbs3):
    """Exact (k * q) for 2-limb k (k <= 2^30) and 3-limb q -> 5 limbs."""
    q0, q1, q2 = q
    c0 = k0 * q0
    c1 = k0 * q1 + k1 * q0
    c2 = k0 * q2 + k1 * q1
    c3 = k1 * q2
    c4 = jnp.zeros_like(q0)
    return _norm5((c0, c1, c2, c3, c4))


def _sub5_ge(a, b):
    """(a - b, a >= b) for normalized 5-limb a, b with a - b possibly
    negative; the difference is returned normalized IF a >= b (borrow
    chain), junk otherwise (callers select on the flag)."""
    d = []
    borrow = jnp.zeros_like(a[0])
    for x, y in zip(a, b):
        s = x - y - borrow
        borrow = (s < 0).astype(jnp.int32)
        d.append(s + borrow * _BASE)
    ge = borrow == 0
    return tuple(d), ge


def _ge5(a, b):
    """a >= b for normalized 5-limb values (lexicographic from the top)."""
    gt = jnp.zeros_like(a[0], dtype=bool)
    eq = jnp.ones_like(a[0], dtype=bool)
    for x, y in zip(reversed(a), reversed(b)):
        gt = gt | (eq & (x > y))
        eq = eq & (x == y)
    return gt | eq


def _limbs_to_ds(ls):
    """double-single float value of a multi-limb integer (high -> low)."""
    hi = jnp.zeros_like(ls[0], dtype=jnp.float32)
    lo = jnp.zeros_like(hi)
    for l in reversed(ls):
        hi, lo = _ds_mul_f(hi, lo, jnp.float32(_BASE))
        hi, lo = _ds_add_f(hi, lo, l.astype(jnp.float32))
    return hi, lo


def _pad3_to5(q: Limbs3):
    z = jnp.zeros_like(q[0])
    return (q[0], q[1], q[2], z, z)


# ---------------------------------------------------------------------------
# deterministic power-of-two weight scale (no float reductions anywhere)
# ---------------------------------------------------------------------------


def _pow2i(e: jax.Array) -> jax.Array:
    """Exact f32 power of two 2^e from an int32 exponent (bit
    construction — never an ``exp2`` approximation)."""
    e = jnp.clip(e, -126, 127)
    return lax.bitcast_convert_type(
        ((e + 127) << 23).astype(jnp.int32), jnp.float32
    )


def _f32_exponent(x: jax.Array) -> jax.Array:
    """IEEE exponent of a positive normal f32 (exact bit extraction)."""
    bits = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return ((bits >> 23) & 0xFF) - 127


def _exact_int_sum3(l0, l1, l2) -> Limbs3:
    """Exact total of elementwise 3-limb int32 integers.

    Hierarchical 1024-blocks keep every int32 partial in range; because
    integer addition is associative and exact, the result is identical
    for ANY reduction order, backend, or shard topology. Returns scalar
    limbs (top limb may exceed 15 bits — value-preserving)."""
    B = 1024
    while l0.shape[0] > 1:
        n = l0.shape[0]
        npad = -(-n // B) * B
        z = jnp.zeros((npad - n,), jnp.int32)
        l0, l1, l2 = _norm3(
            *(
                jnp.concatenate([l, z]).reshape(-1, B).sum(axis=1)
                for l in (l0, l1, l2)
            )
        )
    return l0[0], l1[0], l2[0]


def clean_weights(weights: jax.Array) -> jax.Array:
    """f32, nonnegative, finite — the input contract of the quantizer."""
    w = weights.astype(jnp.float32)
    return jnp.maximum(jnp.where(jnp.isfinite(w), w, 0.0), 0.0)


def weight_scale_pow2(e_max: jax.Array, v_total: Limbs3):
    """The convention's exact power-of-two scale 2^(64 - e_max - e2).

    ``e_max`` = exponent of max(w); ``v_total`` = exact integer sum of
    the coarse quantization round(w * 2^(24 - e_max)). ``e2`` is the
    f32 exponent of v_total rendered by a FIXED Horner evaluation (the
    rendering's rounding is part of the convention). Then
    sum(w) ≈ v_total * 2^(e_max - 24) ≈ 2^(e_max - 24 + e2), so
    q_i = round(w_i * scale) sums to Q_total within a few binades of
    2^40 for any weight profile."""
    v0, v1, v2 = v_total
    vf = (
        v2.astype(jnp.float32) * jnp.float32(_BASE)
        + v1.astype(jnp.float32)
    ) * jnp.float32(_BASE) + v0.astype(jnp.float32)
    e2 = _f32_exponent(jnp.maximum(vf, jnp.float32(1.0)))
    return _pow2i(64 - e_max - e2)


def _coarse_int_limbs(w: jax.Array, e_max: jax.Array):
    """round(w * 2^(24 - e_max)) as elementwise 3-limb int32 (exact:
    power-of-two multiply then round of a value <= 2^25)."""
    v = jnp.round(w * _pow2i(24 - e_max)).astype(jnp.int32)
    return v & _MASK, (v >> _LB) & _MASK, v >> (2 * _LB)


# ---------------------------------------------------------------------------
# the exact child-run ends
# ---------------------------------------------------------------------------


def quantize_weights_limbs(weights: jax.Array) -> Limbs3:
    """Exact 3-limb integers q_i = round(w_i * 2^(64 - e_max - e2))
    (elementwise; the exact power-of-two scale makes the rounding — and
    hence the whole convention — bit-identical on every backend)."""
    w = clean_weights(weights)
    e_max = _f32_exponent(
        jnp.maximum(jnp.max(w), jnp.float32(2.0**-40))
    )
    v_total = _exact_int_sum3(*_coarse_int_limbs(w, e_max))
    scale = weight_scale_pow2(e_max, v_total)
    return _split_f32_to_limbs3(w * scale)


def exact_cumsum_limbs(q: Limbs3) -> Limbs3:
    """Exact inclusive prefix sums of 3-limb integers (carry-normalized
    associative scan)."""
    return lax.associative_scan(_add3, q)


def _shr24_5to3(P):
    """Exact right-shift by 24 bits of a normalized 5-limb (15-bit)
    integer -> 3 limbs: drop one limb (15) then 9 more bits."""
    _, p1, p2, p3, p4 = P
    m9 = (1 << 9) - 1
    n0 = (p1 >> 9) + ((p2 & m9) << 6)
    n1 = (p2 >> 9) + ((p3 & m9) << 6)
    n2 = (p3 >> 9) + (p4 << 6)
    return n0, n1, n2


def exact_u_limbs(u: jax.Array, q_total: Limbs3) -> Limbs3:
    """U = floor(round(u * 2^24) * Q_total / 2^24), clamped to
    Q_total - 1 so that t_M == M.

    An exact integer rendering of u on the Q_total grid: u * 2^24 is an
    exact power-of-two multiply, the product with Q_total is exact limb
    arithmetic and the shift is exact — no float division anywhere, so
    the value is bit-identical on every backend."""
    n_u = jnp.round(
        u.astype(jnp.float32) * jnp.float32(2.0**24)
    ).astype(jnp.int32)
    U = _shr24_5to3(_mul_2_by_3(n_u & _MASK, n_u >> _LB, q_total))
    qt_minus1, _ = _sub5_ge(
        _pad3_to5(q_total), _pad3_to5((jnp.int32(1),) * 1 + (jnp.int32(0),) * 2)
    )
    # broadcast scalars to U's shape for the comparison/select
    qm1 = tuple(jnp.broadcast_to(l, U[0].shape) for l in qt_minus1[:3])
    too_big = _ge5(_pad3_to5(U), _pad3_to5(qm1))
    return tuple(jnp.where(too_big, a, b) for a, b in zip(qm1, U))


def exact_run_ends_from_cumsum(
    Q: Limbs3, q_total: Limbs3, U: Limbs3, m: int
) -> jax.Array:
    """t_j = floor((m*Q_j + (Q_total - 1 - U)) / Q_total) as int32.

    Division = double-single reciprocal estimate + exact integer
    correction, so the result is the true floor for every element.
    """
    if m > _M_MAX:
        raise ValueError(f"exact resampling supports M <= 2^27; got {m}.")
    # D = m*Q + (Q_total - 1 - U)  (5 limbs, all nonnegative)
    one = (jnp.int32(1), jnp.int32(0), jnp.int32(0))
    qt_m1, _ = _sub5_ge(_pad3_to5(q_total), _pad3_to5(one))
    off, _ = _sub5_ge(qt_m1, _pad3_to5(U))
    mq = _mul_m_by_3(m, Q)
    D = _norm5(tuple(a + jnp.broadcast_to(b, a.shape) for a, b in zip(mq, off)))

    # float estimate of D / Q_total in double-single
    d_hi, d_lo = _limbs_to_ds(D)
    t_hi, t_lo = _limbs_to_ds(_pad3_to5(q_total))
    r0 = 1.0 / t_hi
    # one Newton step in double-single: r = r0 + r0*(1 - t*r0). The
    # residual MUST use the full double-single t (hi AND lo): refining
    # against t_hi alone leaves a 2^-24 relative error — ±2 units at
    # M = 2^25 (caught by the N=2^25 oracle test).
    p_hi, p_lo = _ds_mul_f(t_hi, t_lo, r0)
    e_hi, e_lo = _ds_add_f(-p_hi, -p_lo, jnp.float32(1.0))
    corr = r0 * (e_hi + e_lo)
    k_hi, k_lo = _ds_mul_f(d_hi, d_lo, r0)
    k_hi, k_lo = _ds_add_f(k_hi, k_lo, (d_hi * corr).astype(jnp.float32))

    # floor(k) -> 2 int32 limbs (k <= 2^27, exact extraction as above)
    kh1 = jnp.floor(k_hi * jnp.float32(2.0**-15))
    kfrac = k_hi - kh1 * jnp.float32(2.0**15)
    kh0 = jnp.floor(kfrac + k_lo)
    c = (kh0 >= _BASE).astype(jnp.float32)
    kh0 = kh0 - c * _BASE
    kh1 = kh1 + c
    cneg = (kh0 < 0).astype(jnp.float32)
    kh0 = kh0 + cneg * _BASE
    kh1 = kh1 - cneg
    k0 = jnp.clip(kh0, 0, _MASK).astype(jnp.int32)
    k1 = jnp.clip(kh1, 0, (m >> _LB) + 1).astype(jnp.int32)

    # exact correction: ensure k*Qt <= D < (k+1)*Qt
    qt5 = _pad3_to5(q_total)
    qt5b = tuple(jnp.broadcast_to(l, D[0].shape) for l in qt5)
    for _ in range(2):  # estimate is within +-1; two rounds for safety
        P = _mul_2_by_3(k0, k1, q_total)
        ge = _ge5(D, P)  # k too big -> decrement
        dec = jnp.logical_not(ge).astype(jnp.int32)
        k0, k1, _ = _norm3(k0 - dec, k1, jnp.zeros_like(k1))
        # after borrow-free decrement k0 may be negative: renormalize
        neg = (k0 < 0).astype(jnp.int32)
        k0 = k0 + neg * _BASE
        k1 = k1 - neg
        P = _mul_2_by_3(k0, k1, q_total)
        R, ge2 = _sub5_ge(D, P)
        # remainder >= Qt -> increment; gated on D >= P (R is junk when the
        # borrow chain underflows, which must never re-increment)
        inc = (ge2 & _ge5(R, qt5b)).astype(jnp.int32)
        k0, k1, _ = _norm3(k0 + inc, k1, jnp.zeros_like(k1))

    t = k1 * _BASE + k0
    return jnp.clip(t, 0, m).astype(jnp.int32)


def exact_child_run_ends(key, weights: jax.Array, m: int) -> jax.Array:
    """Drop-in exact replacement for ``hard._child_run_ends`` (same u draw
    from the same key; ancestry exact w.r.t. the quantized convention and
    bit-identical across CPU/TPU)."""
    q = quantize_weights_limbs(weights)
    Q = exact_cumsum_limbs(q)
    q_total = tuple(l[-1] for l in Q)
    u = jax.random.uniform(key, (), jnp.float32)
    U = exact_u_limbs(u, q_total)
    U = tuple(l.reshape(()) for l in U)
    return exact_run_ends_from_cumsum(Q, q_total, U, m)
