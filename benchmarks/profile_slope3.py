"""Slope-timed decomposition of the sub-granular blocked resample."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from particle_filters_tpu.ops import resample_pallas as rp
from particle_filters_tpu.resampling.hard import _systematic_starts

N = 1 << 20
SUB, Q, SG = rp._SUB, rp._QROWS, rp._SG


def slope(label, build_loop, m_lo=4, m_hi=12, reps=3):
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
    print(f"{label}: {per*1e3:.4f} ms/exec")


def main():
    key = jax.random.PRNGKey(0)
    lw = jax.random.normal(key, (N,), jnp.float32)
    w = jax.nn.softmax(lw)
    p0 = jax.random.normal(jax.random.fold_in(key, 1), (N, 1), jnp.float32)
    ks = None

    def consume(c):
        return jnp.sum(c[:8])

    # (a) weights + starts + ranks only
    def build_ranks(m):
        kk = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                logw_n, _ = rp.log_normalize(lw)
                weights = jnp.exp(logw_n)
                starts = _systematic_starts(k, weights, N)
                n_fc = N // SUB
                n_subs_pad = -(-(N // SUB) // SG) * SG
                scf = starts.reshape(n_fc, SUB)[:, 0]
                k0 = jnp.arange(n_subs_pad, dtype=jnp.int32) * SUB
                cmp_lo = (scf[None, :] <= k0[:, None]).astype(jnp.int32)
                a0 = jnp.maximum(jnp.sum(cmp_lo, axis=1) - 1, 0)
                probe = jnp.minimum(k0 + (SUB - 1), N - 1)
                cmp_hi = (scf[None, :] <= probe[:, None]).astype(jnp.int32)
                a_hi = jnp.sum(cmp_hi, axis=1) - 1
                ovf = (jnp.max(a_hi - a0) >= Q).astype(jnp.float32)
                c2 = c * (1.0 + 1e-12 * (ovf + a0[0].astype(jnp.float32)))
                return c2, None
            c, _ = jax.lax.scan(body, p0, kk)
            return consume(c)
        return run

    slope("starts + sub ranks", build_ranks)

    # (b) everything except the pallas kernel: mega + gather + relayouts
    starts0 = _systematic_starts(key, w, N)
    n_fc = N // SUB
    n_subs_pad = -(-(N // SUB) // SG) * SG
    scf = starts0.reshape(n_fc, SUB)[:, 0]
    k0 = jnp.arange(n_subs_pad, dtype=jnp.int32) * SUB
    a0 = jnp.maximum(
        jnp.sum((scf[None, :] <= k0[:, None]).astype(jnp.int32), axis=1) - 1, 0
    )

    def build_megagather(m):
        kk = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                d = c.shape[1]
                n_fc_ext = n_fc + Q
                n_ext = n_fc_ext * SUB
                big = jnp.float32(n_subs_pad * SUB + 256)
                starts_f = jnp.concatenate(
                    [starts0.astype(jnp.float32),
                     jnp.full((n_ext - N,), big, jnp.float32)]
                ).reshape(n_fc_ext, SUB)
                prev = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
                diffs = jnp.concatenate(
                    [(c - prev).astype(jnp.float32),
                     jnp.zeros((n_ext - N, d), jnp.float32)]
                ).reshape(n_fc_ext, SUB * d)
                p_pad = jnp.concatenate(
                    [c.astype(jnp.float32),
                     jnp.zeros((n_ext - N, d), jnp.float32)]
                ).reshape(n_fc_ext, SUB, d)
                chunk_base = jnp.concatenate(
                    [jnp.zeros((1, d), jnp.float32), p_pad[:-1, SUB - 1, :]],
                    axis=0,
                )
                mega = jnp.concatenate([starts_f, diffs, chunk_base], axis=1)
                row_idx = (a0[:, None]
                           + jnp.arange(Q, dtype=jnp.int32)[None, :]).reshape(-1)
                g_all = jnp.take(mega, row_idx, axis=0).reshape(
                    n_subs_pad, Q, SUB * (1 + d) + d
                )
                num_super = n_subs_pad // SG
                s_win = g_all[:, :, :SUB].reshape(num_super, SG, Q * SUB)
                d_win = (g_all[:, :, SUB:SUB * (1 + d)]
                         .reshape(n_subs_pad, Q * SUB, d)
                         .transpose(0, 2, 1)
                         .reshape(num_super, SG, d, Q * SUB))
                bases = g_all[:, 0, SUB * (1 + d):]
                c2 = c * (1.0 + 1e-12 * (s_win[0, 0, 0] + d_win[0, 0, 0, 0]
                                         + bases[0, 0]) * k[0].astype(jnp.float32))
                return c2, None
            c, _ = jax.lax.scan(body, p0, kk)
            return consume(c)
        return run

    slope("mega + gather + relayouts", build_megagather)

    # (c) full
    def build_full(m):
        kk = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                return rp.systematic_resample_values_blocked(k, c, logw=lw), None
            c, _ = jax.lax.scan(body, p0, kk)
            return consume(c)
        return run

    slope("full blocked resample", build_full)


if __name__ == "__main__":
    main()
