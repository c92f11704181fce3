"""Break down the 4 ms blocked resample: starts vs mega-build vs gather vs kernel."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from particle_filters_tpu.resampling.hard import _systematic_starts
from particle_filters_tpu.ops import resample_pallas as rp


def timed(label, fn, *args, n=5, inner=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)/inner*1e3:.4f} ms/call")
    return out


def main():
    N = 1 << 20
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (N, 1), jnp.float32)
    lw = jax.random.normal(jax.random.fold_in(key, 1), (N,), jnp.float32)
    w = jax.nn.softmax(lw)
    ks = jax.random.split(key, 20)

    # 1. starts only
    @jax.jit
    def starts_only(w0):
        def body(c, k):
            s = _systematic_starts(k, c, N)
            # fold result into carry so nothing is DCEd
            return c + 1e-12 * s[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, w0, ks)
        return c

    timed("starts (cumsum+searchsorted-free)", starts_only, w)

    # 2. full resample (reference composition)
    @jax.jit
    def full(p0):
        def body(c, k):
            out = rp.systematic_resample_values_blocked(k, c, logw=lw)
            return out, None
        c, _ = jax.lax.scan(body, p0, ks)
        return c

    timed("full blocked resample", full, p)

    # 3. fast path without the cond/overflow check, fixed starts
    starts = _systematic_starts(key, w, N)
    nb = -(-N // 512)
    n_chunks = -(-N // 256)
    starts_pad = jnp.concatenate([starts, jnp.full((n_chunks * 256 - N,), jnp.int32(2**30))])
    sc = starts_pad.reshape(n_chunks, 256)[:, 0]
    bounds = jnp.arange(nb, dtype=jnp.int32) * 512
    cmp = (sc[None, :] <= bounds[:, None]).astype(jnp.int32)
    m_b = jnp.maximum(jnp.sum(cmp, axis=1) - 1, 0)

    @jax.jit
    def fastpath(p0):
        def body(c, k):
            out = rp._blocked_pallas_path(starts, c, m_b, N, 512, 1024, 256)
            return out, None
        c, _ = jax.lax.scan(body, p0, ks)
        return c

    timed("pallas fast path (fixed starts)", fastpath, p)

    # 4. the block-ranking compare (B x M dense)
    @jax.jit
    def ranking(w0):
        def body(c, k):
            s = _systematic_starts(k, w0, N)
            sp = jnp.concatenate([s, jnp.full((n_chunks * 256 - N,), jnp.int32(2**30))])
            sc_ = sp.reshape(n_chunks, 256)[:, 0]
            cmp_ = (sc_[None, :] <= bounds[:, None]).astype(jnp.int32)
            mb_ = jnp.maximum(jnp.sum(cmp_, axis=1) - 1, 0)
            return c + 1e-12 * mb_[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, w0, ks)
        return c

    timed("starts + block ranking", ranking, w)

    # 5. mega-build + gather only (no pallas kernel): replicate internals
    def mega_gather(starts_, particles):
        n, d = particles.shape
        block_k, window, chunk = 512, 1024, 256
        num_blocks = -(-n // block_k)
        num_super = -(-num_blocks // rp._GROUP)
        num_blocks_pad = num_super * rp._GROUP
        nw = window // chunk
        n_chunks_ = -(-n // chunk)
        n_chunks_ext = n_chunks_ + nw
        n_ext = n_chunks_ext * chunk
        big = jnp.float32(n + block_k * num_blocks_pad + 1)
        starts_f = jnp.concatenate(
            [starts_.astype(jnp.float32), jnp.full((n_ext - n,), big, jnp.float32)]
        ).reshape(n_chunks_ext, chunk)
        prev = jnp.concatenate([jnp.zeros_like(particles[:1]), particles[:-1]], axis=0)
        diffs = jnp.concatenate(
            [(particles - prev).astype(jnp.float32), jnp.zeros((n_ext - n, d), jnp.float32)]
        ).reshape(n_chunks_ext, chunk * d)
        p_pad = jnp.concatenate(
            [particles.astype(jnp.float32), jnp.zeros((n_ext - n, d), jnp.float32)]
        ).reshape(n_chunks_ext, chunk, d)
        chunk_base = jnp.concatenate(
            [jnp.zeros((1, d), jnp.float32), p_pad[:-1, chunk - 1, :]], axis=0
        )
        mega = jnp.concatenate([starts_f, diffs, chunk_base], axis=1)
        pad_b = num_blocks_pad - num_blocks
        mb2 = jnp.concatenate([m_b, jnp.zeros((pad_b,), jnp.int32)])
        row_idx = (mb2[:, None] + jnp.arange(nw, dtype=jnp.int32)[None, :]).reshape(-1)
        return jnp.take(mega, row_idx, axis=0)

    @jax.jit
    def gather_only(p0):
        def body(c, k):
            g = mega_gather(starts, c)
            return c + 1e-12 * g[0, 0], None
        c, _ = jax.lax.scan(body, p0, ks)
        return c

    timed("mega-build + row gather", gather_only, p)


if __name__ == "__main__":
    main()
