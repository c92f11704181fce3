"""Kernel particle filter tests.

Reproduces the reference archetypes: kernel & Gaspari-Cohn properties
(``test_kernel_pf_kernels.py:181-298``), posterior-beats-prior and s-reaches-1
integration checks (``test_kpf_vs_simulator_lorenz96.py:195-313``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_filters_tpu.models import (
    KPFConfig,
    KernelParticleFilter,
    Model,
    build_localization_matrix,
    gaspari_cohn,
)
from particle_filters_tpu.models.kernel_particle_filter import (
    matrix_kernel_and_divergence,
    rbf_1d,
    scalar_kernel_full_matrix,
)


class TestGaspariCohn:
    def test_at_zero_is_one(self):
        assert np.isclose(float(gaspari_cohn(jnp.array(0.0))), 1.0)

    def test_compact_support(self):
        r = jnp.array([2.001, 3.0, 10.0])
        np.testing.assert_allclose(np.asarray(gaspari_cohn(r)), 0.0, atol=1e-6)

    def test_monotone_decreasing(self):
        r = jnp.linspace(0, 2, 50)
        v = np.asarray(gaspari_cohn(r))
        assert np.all(np.diff(v) <= 1e-6)

    def test_continuous_at_one(self):
        lo = float(gaspari_cohn(jnp.array(1.0 - 1e-4)))
        hi = float(gaspari_cohn(jnp.array(1.0 + 1e-4)))
        assert abs(lo - hi) < 1e-2

    def test_localization_matrix(self):
        L = build_localization_matrix(10, radius=3.0)
        assert L.shape == (10, 10)
        np.testing.assert_allclose(np.asarray(jnp.diag(L)), 1.0, atol=1e-6)
        assert float(L[0, 9]) == 0.0  # |i−j|=9 > 2·radius
        np.testing.assert_allclose(np.asarray(L), np.asarray(L.T), atol=1e-6)

    def test_localization_inf_radius_disables(self):
        L = build_localization_matrix(5, radius=np.inf)
        np.testing.assert_allclose(np.asarray(L), 1.0)


class TestKernels:
    def test_rbf_1d(self):
        K, dK = rbf_1d(jnp.array(0.0), 1.0)
        assert np.isclose(float(K), 1.0) and np.isclose(float(dK), 0.0)
        K2, dK2 = rbf_1d(jnp.array(1.0), 1.0)
        assert np.isclose(float(K2), np.exp(-0.5), atol=1e-6)
        assert float(dK2) < 0

    def test_matrix_kernel_shapes_and_selfkernel(self, key):
        X = jax.random.normal(key, (7, 3))
        K, divK = matrix_kernel_and_divergence(X[0], X, jnp.ones(3))
        assert K.shape == (7, 3) and divK.shape == (3,)
        np.testing.assert_allclose(np.asarray(K[0]), 1.0, atol=1e-6)

    def test_scalar_kernel(self, key):
        X = jax.random.normal(key, (5, 2))
        k, grad_k, divK = scalar_kernel_full_matrix(X[1], X, 1.0)
        assert k.shape == (5,) and grad_k.shape == (5, 2) and divK.shape == (2,)
        assert np.isclose(float(k[1]), 1.0)
        np.testing.assert_allclose(np.asarray(grad_k[1]), 0.0, atol=1e-6)


def _gaussian_model(n, R_scale=0.1):
    H = lambda x: x
    JH = lambda x: jnp.eye(n)
    R = R_scale * jnp.eye(n)
    return Model(H=H, JH=JH, R=R)


class TestKPFAnalyze:
    def test_reaches_s_one(self, key):
        model = _gaussian_model(2)
        kpf = KernelParticleFilter(model, KPFConfig(max_steps=50))
        X = jax.random.normal(key, (64, 2)) + 2.0
        st = kpf.analyze(X, jnp.zeros(2))
        assert float(st.s) >= 1.0 - 1e-5
        assert int(st.steps) >= 5  # min_steps

    def test_posterior_beats_prior(self, key):
        """Flow moves the ensemble toward the observation: posterior mean
        error < prior mean error (reference ``test_kpf_vs_simulator_lorenz96``
        semantics on a toy Gaussian)."""
        model = _gaussian_model(2, R_scale=0.05)
        kpf = KernelParticleFilter(model, KPFConfig())
        X = 3.0 + 0.7 * jax.random.normal(key, (128, 2))
        y = jnp.zeros(2)  # truth at origin
        st = kpf.analyze(X, y)
        prior_err = float(jnp.linalg.norm(jnp.mean(X, axis=0) - y))
        post_err = float(jnp.linalg.norm(jnp.mean(st.particles, axis=0) - y))
        assert post_err < prior_err

    def test_matches_gaussian_posterior(self, key):
        """Linear-Gaussian case: flow posterior ≈ conjugate posterior."""
        n = 2
        model = _gaussian_model(n, R_scale=0.5)
        kpf = KernelParticleFilter(
            model, KPFConfig(ds_init=0.05, max_steps=100, c_move_max=5.0)
        )
        prior_mean = jnp.array([1.0, -1.0])
        prior_cov = 1.0 * jnp.eye(n)
        X = prior_mean + jax.random.normal(key, (512, n))
        y = jnp.array([0.0, 0.5])
        st = kpf.analyze(X, y)
        # conjugate posterior: P = (P0^-1 + R^-1)^-1, m = P(P0^-1 m0 + R^-1 y)
        P = np.linalg.inv(np.eye(n) + np.eye(n) / 0.5)
        m = P @ (np.asarray(prior_mean) + np.asarray(y) / 0.5)
        got = np.asarray(jnp.mean(st.particles, axis=0))
        np.testing.assert_allclose(got, m, atol=0.3)

    def test_scalar_kernel_mode(self, key):
        model = _gaussian_model(2)
        kpf = KernelParticleFilter(model, KPFConfig(kernel_type="scalar"))
        X = jax.random.normal(key, (32, 2))
        st = kpf.analyze(X, jnp.zeros(2))
        assert np.all(np.isfinite(np.asarray(st.particles)))

    def test_localization(self, key):
        model = _gaussian_model(4)
        kpf = KernelParticleFilter(
            model, KPFConfig(localization_radius=1.5)
        )
        X = jax.random.normal(key, (32, 4))
        st = kpf.analyze(X, jnp.zeros(4))
        assert np.all(np.isfinite(np.asarray(st.particles)))

    def test_move_clamp_respected(self, key):
        """With a tiny c_move_max the flow cannot jump; particles move
        slowly (reference per-particle clamp :428-434)."""
        model = _gaussian_model(2, R_scale=0.01)
        kpf_free = KernelParticleFilter(model, KPFConfig(c_move_max=100.0, max_steps=10, min_steps=1))
        kpf_clamped = KernelParticleFilter(model, KPFConfig(c_move_max=0.01, max_steps=10, min_steps=1))
        X = 5.0 + jax.random.normal(key, (64, 2))
        y = jnp.zeros(2)
        d_free = float(jnp.mean(jnp.linalg.norm(kpf_free.analyze(X, y).particles - X, axis=1)))
        d_clamped = float(jnp.mean(jnp.linalg.norm(kpf_clamped.analyze(X, y).particles - X, axis=1)))
        assert d_clamped < d_free

    def test_ds_history_recorded(self, key):
        model = _gaussian_model(2)
        kpf = KernelParticleFilter(model, KPFConfig(ds_init=0.25))
        X = jax.random.normal(key, (32, 2))
        st = kpf.analyze(X, jnp.zeros(2))
        hist = np.asarray(st.ds_history)
        used = hist[: int(st.steps)]
        assert np.all(used >= 0) and used.sum() >= 0.99  # sums to ~s
