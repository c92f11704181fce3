"""Slope-timed breakdown of resample alternatives at N=2^20, d=1."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from particle_filters_tpu.ops import resample_pallas as rp
from particle_filters_tpu.resampling.hard import _systematic_starts

N = 1 << 20


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
    starts0 = _systematic_starts(key, w, N)

    # A. XLA scatter+cumsum telescoping (the "slow" fallback)
    def build_scatter(m):
        ks = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                prev = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
                diffs = c - prev
                out = jnp.zeros_like(c).at[starts0].add(
                    diffs, indices_are_sorted=True, mode="drop"
                )
                out = jnp.cumsum(out, axis=0)
                return out * (1.0 + 1e-12 * k[0].astype(jnp.float32)), None
            c, _ = jax.lax.scan(body, p0, ks)
            return jnp.sum(c[:8])
        return run

    slope("scatter+cumsum fallback", build_scatter)

    # B. ancestor gather: idx = cumsum(marks)-1 then take
    def build_gather_anc(m):
        ks = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                marks = jnp.zeros((N,), jnp.int32).at[starts0].add(
                    1, indices_are_sorted=True, mode="drop"
                )
                idx = jnp.cumsum(marks) - 1
                out = jnp.take(c, idx, axis=0)
                return out * (1.0 + 1e-12 * k[0].astype(jnp.float32)), None
            c, _ = jax.lax.scan(body, p0, ks)
            return jnp.sum(c[:8])
        return run

    slope("marks+cumsum+take", build_gather_anc)

    # C. mega-build + row gather only (current internals, no pallas kernel)
    block_k, window, chunk = 512, 1024, 256
    num_blocks = -(-N // block_k)
    n_chunks = -(-N // chunk)
    starts_pad = jnp.concatenate(
        [starts0, jnp.full((n_chunks * chunk - N,), jnp.int32(2**30))]
    )
    sc = starts_pad.reshape(n_chunks, chunk)[:, 0]
    bounds = jnp.arange(num_blocks, dtype=jnp.int32) * block_k
    cmp = (sc[None, :] <= bounds[:, None]).astype(jnp.int32)
    m_b = jnp.maximum(jnp.sum(cmp, axis=1) - 1, 0)

    def build_megagather(m):
        ks = jax.random.split(key, m)
        nw = window // chunk
        num_super = -(-num_blocks // rp._GROUP)
        num_blocks_pad = num_super * rp._GROUP

        @jax.jit
        def run():
            def body(c, k):
                n, d = c.shape
                n_chunks_ext = n_chunks + nw
                n_ext = n_chunks_ext * chunk
                big = jnp.float32(n + block_k * num_blocks_pad + 1)
                starts_f = jnp.concatenate(
                    [starts0.astype(jnp.float32),
                     jnp.full((n_ext - n,), big, jnp.float32)]
                ).reshape(n_chunks_ext, chunk)
                prev = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
                diffs = jnp.concatenate(
                    [(c - prev).astype(jnp.float32),
                     jnp.zeros((n_ext - n, d), jnp.float32)]
                ).reshape(n_chunks_ext, chunk * d)
                p_pad = jnp.concatenate(
                    [c.astype(jnp.float32), jnp.zeros((n_ext - n, d), jnp.float32)]
                ).reshape(n_chunks_ext, chunk, d)
                chunk_base = jnp.concatenate(
                    [jnp.zeros((1, d), jnp.float32), p_pad[:-1, chunk - 1, :]],
                    axis=0,
                )
                mega = jnp.concatenate([starts_f, diffs, chunk_base], axis=1)
                pad_b = num_blocks_pad - num_blocks
                mb2 = jnp.concatenate([m_b, jnp.zeros((pad_b,), jnp.int32)])
                row_idx = (mb2[:, None]
                           + jnp.arange(nw, dtype=jnp.int32)[None, :]).reshape(-1)
                g_all = jnp.take(mega, row_idx, axis=0)
                c2 = c * (1.0 + 1e-12 * g_all[0, 0] * k[0].astype(jnp.float32))
                return c2, None
            c, _ = jax.lax.scan(body, p0, ks)
            return jnp.sum(c[:8])
        return run

    slope("mega-build + row gather", build_megagather)

    # D. current full blocked resample (for reference)
    def build_full(m):
        ks = jax.random.split(key, m)

        @jax.jit
        def run():
            def body(c, k):
                out = rp.systematic_resample_values_blocked(k, c, logw=lw)
                return out, None
            c, _ = jax.lax.scan(body, p0, ks)
            return jnp.sum(c[:8])
        return run

    slope("full blocked resample", build_full)


if __name__ == "__main__":
    main()
