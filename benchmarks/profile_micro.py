"""Micro-profiles: cumsum variants for starts; fused-kernel cost structure."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(label, fn, *args, inner=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)/inner*1e3:.4f} ms/call")


def main():
    N = 1 << 20
    key = jax.random.PRNGKey(0)
    w = jax.nn.softmax(jax.random.normal(key, (N,), jnp.float32))
    ks = jax.random.split(key, 20)

    # --- cumsum variants --------------------------------------------------
    @jax.jit
    def plain_cumsum(w0):
        def body(c, k):
            s = jnp.cumsum(c)
            return c + 1e-20 * s[-1], None
        c, _ = jax.lax.scan(body, w0, ks)
        return c

    timed("plain cumsum 1e6", plain_cumsum, w)

    @jax.jit
    def twolevel_cumsum(w0):
        def body(c, k):
            x = c.reshape(1024, 1024)
            within = jnp.cumsum(x, axis=1)
            rows = within[:, -1]
            offs = jnp.cumsum(rows) - rows
            s = (within + offs[:, None]).reshape(-1)
            return c + 1e-20 * s[-1], None
        c, _ = jax.lax.scan(body, w0, ks)
        return c

    timed("two-level cumsum 1e6 (1024x1024)", twolevel_cumsum, w)

    @jax.jit
    def twolevel8(w0):
        def body(c, k):
            x = c.reshape(8192, 128)
            within = jnp.cumsum(x, axis=1)
            rows = within[:, -1]
            offs = jnp.cumsum(rows) - rows
            s = (within + offs[:, None]).reshape(-1)
            return c + 1e-20 * s[-1], None
        c, _ = jax.lax.scan(body, w0, ks)
        return c

    timed("two-level cumsum 1e6 (8192x128)", twolevel8, w)

    # --- fused-kernel cost structure -------------------------------------
    # full Box-Muller pair kernel vs no-transcendental vs no-prng, each
    # writing the same outputs so traffic is identical.
    def mk_kernel(mode):
        def kern(p_ref, out_ref):
            b = pl.program_id(0)
            pltpu.prng_seed(7, b)
            shape = p_ref[:, :].shape
            if mode == "const":
                eps = jnp.full(shape, 0.1, jnp.float32)
            elif mode == "prng_only":
                bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
                f = pltpu.bitcast(
                    jnp.bitwise_or(jnp.right_shift(bits, jnp.uint32(9)),
                                   jnp.uint32(0x3F800000)), jnp.float32)
                eps = (2.0 - f) - 0.5
            else:  # full box-muller pair
                half = (shape[0], shape[1] // 2)
                b1 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
                b2 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
                u1 = 2.0 - pltpu.bitcast(
                    jnp.bitwise_or(jnp.right_shift(b1, jnp.uint32(9)),
                                   jnp.uint32(0x3F800000)), jnp.float32)
                u2 = 2.0 - pltpu.bitcast(
                    jnp.bitwise_or(jnp.right_shift(b2, jnp.uint32(9)),
                                   jnp.uint32(0x3F800000)), jnp.float32)
                r = jnp.sqrt(-2.0 * jnp.log(u1))
                th = 6.283185307179586 * u2
                eps = jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)], axis=1)
            x = p_ref[:, :]
            x_new = 0.95 * x + 0.2 * eps
            if mode == "full+ll":
                ll = -0.5 * (1.7 / jnp.exp(x_new) + x_new)
                x_new = x_new + 0.0 * ll
            out_ref[:, :] = x_new
        return kern

    block = 65536
    rows, cols = 8, N // 8
    bcols = block // 8
    p = jax.random.normal(key, (rows, cols), jnp.float32)

    def run_mode(mode):
        kern = mk_kernel(mode)
        call = pl.pallas_call(
            kern,
            grid=(N // block,),
            in_specs=[pl.BlockSpec((rows, bcols), lambda b: (0, b),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, bcols), lambda b: (0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        )

        @jax.jit
        def loop(p0):
            def body(c, _):
                return call(c), None
            c, _ = jax.lax.scan(body, p0, None, length=20)
            return c

        timed(f"kernel[{mode}]", loop, p)

    for mode in ("const", "prng_only", "full", "full+ll"):
        run_mode(mode)


if __name__ == "__main__":
    main()
