"""Redo micro-profiles with un-DCE-able carries and scaling checks."""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(label, fn, *args, inner):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)/inner*1e3:.4f} ms/iter ({min(ts)*1e3:.2f} ms total)")


def main():
    N = 1 << 20
    key = jax.random.PRNGKey(0)
    w = jax.nn.softmax(jax.random.normal(key, (N,), jnp.float32))

    # cumsum with the FULL result threaded through the carry
    def make_cumsum(variant, length):
        @jax.jit
        def run(w0):
            def body(c, _):
                if variant == "plain":
                    s = jnp.cumsum(c)
                else:
                    x = c.reshape(1024, 1024)
                    within = jnp.cumsum(x, axis=1)
                    rows = within[:, -1]
                    offs = jnp.cumsum(rows) - rows
                    s = (within + offs[:, None]).reshape(-1)
                # normalize so the carry stays bounded and every element of
                # s is consumed
                return s / s[-1] * (1.0 / N), None
            c, _ = jax.lax.scan(body, w0, None, length=length)
            return c
        return run

    for variant in ("plain", "twolevel"):
        for length in (20, 100):
            timed(f"cumsum[{variant}] x{length}",
                  make_cumsum(variant, length), w, inner=length)

    # pallas kernel, same scaling check
    block = 65536
    rows, cols = 8, N // 8
    bcols = block // 8
    p = jax.random.normal(key, (rows, cols), jnp.float32)

    def kern(p_ref, out_ref):
        b = pl.program_id(0)
        pltpu.prng_seed(7, b)
        shape = p_ref[:, :].shape
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
        out_ref[:, :] = 0.95 * p_ref[:, :] + 0.2 * eps

    call = pl.pallas_call(
        kern,
        grid=(N // block,),
        in_specs=[pl.BlockSpec((rows, bcols), lambda b: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, bcols), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
    )

    def make_loop(length):
        @jax.jit
        def loop(p0):
            def body(c, _):
                return call(c), None
            c, _ = jax.lax.scan(body, p0, None, length=length)
            return c
        return loop

    for length in (20, 100):
        timed(f"bm-kernel x{length}", make_loop(length), p, inner=length)


if __name__ == "__main__":
    main()
