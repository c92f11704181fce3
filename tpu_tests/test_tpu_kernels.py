"""On-device Pallas kernel tests (run with: pytest tpu_tests/ -m tpu).

Kept OUTSIDE tests/ because tests/conftest.py pins the suite to CPU at
import time. These validate the compiled kernels on real hardware; the CPU
suite covers the same code through interpret mode and XLA fallback paths.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_jax():
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU available")
    return jax


class TestBlockedResampleOnTPU:
    def test_matches_reference_indices(self, tpu_jax):
        jax = tpu_jax
        import jax.numpy as jnp

        from particle_filters_tpu.ops.resample_pallas import (
            systematic_resample_values_blocked,
        )
        from particle_filters_tpu.resampling.hard import systematic_resample

        key = jax.random.PRNGKey(3)
        for n, d in [(100_000, 1), (65_536, 3)]:
            w = jax.nn.softmax(jax.random.normal(key, (n,)) * 2)
            p = jax.random.normal(jax.random.fold_in(key, 1), (n, d))
            v_ref = jnp.take(p, systematic_resample(key, w), axis=0)
            v_blk = systematic_resample_values_blocked(key, p, w=w)
            np.testing.assert_allclose(
                np.asarray(v_ref), np.asarray(v_blk), atol=1e-4
            )

    def test_mid_tier_matches_reference(self, tpu_jax):
        """Spans in [Q, Q_MID) route to the compiled Q=8 middle tier on
        device; ancestry must still match the hard-path reference. The
        640-particle near-zero-weight run starting mid-sub-group forces a
        ~6-chunk span (see tests/unit/test_resampling.py::test_mid_tier_exact
        for the span assertion under interpret mode)."""
        jax = tpu_jax
        import jax.numpy as jnp

        from particle_filters_tpu.ops.resample_pallas import (
            systematic_resample_values_blocked,
        )
        from particle_filters_tpu.resampling.hard import systematic_resample

        key = jax.random.PRNGKey(17)
        n = 65_536
        w = jnp.ones((n,)).at[64:704].set(1e-6)
        w = w / jnp.sum(w)
        p = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
        v_ref = jnp.take(p, systematic_resample(key, w), axis=0)
        v_blk = systematic_resample_values_blocked(key, p, w=w)
        np.testing.assert_allclose(
            np.asarray(v_ref), np.asarray(v_blk), atol=1e-4
        )

    def test_degenerate_fallback(self, tpu_jax):
        jax = tpu_jax
        import jax.numpy as jnp

        from particle_filters_tpu.ops.resample_pallas import (
            systematic_resample_values_blocked,
        )

        n = 50_000
        w = jnp.zeros(n).at[123].set(1.0)
        p = jax.random.normal(jax.random.PRNGKey(0), (n, 2))
        v = systematic_resample_values_blocked(jax.random.PRNGKey(1), p, w=w)
        np.testing.assert_allclose(
            np.asarray(v), np.tile(np.asarray(p[123]), (n, 1)), atol=1e-4
        )


class TestExactResampleOnTPU:
    def test_bit_identical_to_cpu(self, tpu_jax):
        """The quantized-integer child-run ends are pure int32 ops plus
        error-free float splits — TPU must match the CPU result BIT FOR
        BIT (the property that makes the N > 2^24 convention
        platform-exact)."""
        jax = tpu_jax
        import jax.numpy as jnp

        from particle_filters_tpu.resampling.exact import (
            exact_child_run_ends,
        )

        rng = np.random.default_rng(5)
        n = 1 << 16
        w = rng.lognormal(0, 1.5, n).astype(np.float32)
        w /= w.sum()
        key = jax.random.PRNGKey(11)

        t_tpu = np.asarray(
            jax.jit(lambda w: exact_child_run_ends(key, w, n))(jnp.asarray(w))
        )
        cpus = jax.devices("cpu")
        with jax.default_device(cpus[0]):
            t_cpu = np.asarray(
                jax.jit(lambda w: exact_child_run_ends(key, w, n))(
                    jnp.asarray(w)
                )
            )
        assert np.array_equal(t_tpu, t_cpu)


class TestFusedStepOnTPU:
    def test_tracks_sv(self, tpu_jax):
        jax = tpu_jax
        import jax.numpy as jnp

        from particle_filters_tpu.ops.fused_pf import FusedSIRFilter
        from particle_filters_tpu.simulators import simulate_sv_1d

        alpha, sigma = 0.95, 0.2
        sv = simulate_sv_1d(100, alpha, sigma, 1.0, seed=42)
        f = FusedSIRFilter(
            lambda x: alpha * x,
            lambda x, z: -0.5 * (z[0] ** 2 / jnp.exp(x) + x),
            Q=np.array([[sigma**2]]),
            Np=65_536,
        )
        st = f.initialize(
            jax.random.PRNGKey(0), np.zeros(1), np.array([[0.41]])
        )
        _, hist = jax.jit(lambda k, s: f.run(k, s, sv.Y[:, None]))(
            jax.random.PRNGKey(1), st
        )
        rmse = float(jnp.sqrt(jnp.mean((hist["mean"][:, 0] - sv.X) ** 2)))
        assert rmse < 1.5
        assert np.all(np.isfinite(np.asarray(hist["ess"])))
