"""EDH / LEDH particle-flow filter tests.

Reproduces the reference archetypes: flow filters track on linear-Gaussian
systems (≈ KF), per-particle-linearization properties and log-det-Jacobian
tracking for LEDH (``test_ledh_flow_pf.py:503-582``), condition-number
diagnostics, and nonlinear tracking sanity
(``test_filters_snlg_simulator.py:123-267`` semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_filters_tpu.core.linalg import mvn_logpdf_chol
from particle_filters_tpu.models import (
    EDHConfig,
    EDHFlowPF,
    ExtendedKalmanFilter,
    GaussianTracker,
    LEDHConfig,
    LEDHFlowPF,
    kalman_filter_general,
)


def _linear_setup(small_system):
    """Flow-filter ingredients for the 2-D LGSSM."""
    s = small_system
    A = jnp.asarray(s["A"])
    C = jnp.asarray(s["C"])
    Q = jnp.asarray(s["Q"])
    R = jnp.asarray(s["R"])
    LQ = jnp.linalg.cholesky(Q + 1e-10 * jnp.eye(2))
    LR = jnp.linalg.cholesky(R)

    g = lambda x, u, v: A @ x + v
    h = lambda x: C @ x
    jac_h = lambda x: C
    log_trans = lambda x_new, x_old: mvn_logpdf_chol(x_new, A @ x_old, LQ)
    log_like = lambda z, x: mvn_logpdf_chol(z, C @ x, LR)

    def noise_sampler(key, n, nx):
        return jax.random.normal(key, (n, nx)) @ LQ.T

    ekf = ExtendedKalmanFilter(lambda x, u: A @ x, h, Q, R)
    tracker = GaussianTracker(ekf)
    return g, h, jac_h, log_trans, log_like, R, tracker, noise_sampler


@pytest.fixture(scope="module")
def linear_flow(small_system):
    return _linear_setup(small_system)


def _kf_rmse(small_system, lgssm_data):
    s = small_system
    res = kalman_filter_general(
        lgssm_data.Y, s["A"], s["C"], np.eye(2, dtype=np.float32),
        s["Q"], s["R"], x0=np.zeros(2, np.float32), P0=s["Sigma"],
    )
    return float(jnp.sqrt(jnp.mean((res.x_filt - lgssm_data.X) ** 2)))


class TestEDH:
    def test_init_from_gaussian(self, key, linear_flow):
        g, h, jh, lt, ll, R, tracker, ns = linear_flow
        edh = EDHFlowPF(tracker, g, h, jh, lt, ll, R, EDHConfig(n_particles=256))
        st = edh.init_from_gaussian(key, jnp.zeros(2), jnp.eye(2))
        assert st.particles.shape == (256, 2)
        assert np.isclose(float(jnp.sum(st.weights)), 1.0, atol=1e-4)

    @pytest.mark.parametrize("integrator", ["euler", "rk4"])
    def test_tracks_linear_system(
        self, key, small_system, lgssm_data, linear_flow, integrator
    ):
        """On the LGSSM the EDH flow must track close to the exact KF."""
        g, h, jh, lt, ll, R, tracker, ns = linear_flow
        edh = EDHFlowPF(
            tracker, g, h, jh, lt, ll, R,
            EDHConfig(n_particles=256, n_lambda_steps=8, flow_integrator=integrator),
        )
        st = edh.init_from_gaussian(key, jnp.zeros(2), jnp.eye(2))
        ts = tracker.init(jnp.zeros(2), jnp.eye(2))
        zs = lgssm_data.Y[:100]
        _, _, hist = jax.jit(
            lambda k, s, t: edh.run(k, s, t, zs, process_noise_sampler=ns)
        )(jax.random.fold_in(key, 1), st, ts)
        rmse = float(jnp.sqrt(jnp.mean((hist["mean"] - lgssm_data.X[:100]) ** 2)))
        kf_rmse = _kf_rmse(small_system, lgssm_data)
        assert rmse < 2.5 * kf_rmse + 0.1

    def test_condition_numbers_finite(self, key, lgssm_data, linear_flow):
        g, h, jh, lt, ll, R, tracker, ns = linear_flow
        edh = EDHFlowPF(tracker, g, h, jh, lt, ll, R, EDHConfig(n_particles=64))
        st = edh.init_from_gaussian(key, jnp.zeros(2), jnp.eye(2))
        ts = tracker.init(jnp.zeros(2), jnp.eye(2))
        st2, _ = edh.step(key, st, ts, lgssm_data.Y[0], process_noise_sampler=ns)
        conds = np.asarray(st2.diagnostics["condition_numbers"])
        assert conds.shape == (8,)
        assert np.all(np.isfinite(conds)) and np.all(conds >= 1.0)

    def test_flow_moves_particles_toward_observation(self, key, linear_flow):
        """After the flow, particles concentrate near the posterior, not the
        prior: the flow migration is the whole point of EDH."""
        g, h, jh, lt, ll, R, tracker, ns = linear_flow
        edh = EDHFlowPF(tracker, g, h, jh, lt, ll, R, EDHConfig(n_particles=512))
        st = edh.init_from_gaussian(key, jnp.zeros(2), jnp.eye(2))
        ts = tracker.init(jnp.zeros(2), jnp.eye(2))
        z = jnp.array([2.0, -1.0])
        st2, _ = edh.step(key, st, ts, z, process_noise_sampler=ns)
        # posterior mean pulled toward z (h = identity-ish C = I)
        assert float(jnp.linalg.norm(st2.mean - z)) < float(jnp.linalg.norm(0.0 - z))

    def test_ess_resampling_trigger(self, key, lgssm_data, linear_flow):
        g, h, jh, lt, ll, R, tracker, ns = linear_flow
        edh = EDHFlowPF(
            tracker, g, h, jh, lt, ll, R,
            EDHConfig(n_particles=128, resample_ess_ratio=2.0),  # always
        )
        st = edh.init_from_gaussian(key, jnp.zeros(2), jnp.eye(2))
        ts = tracker.init(jnp.zeros(2), jnp.eye(2))
        st2, _ = edh.step(key, st, ts, lgssm_data.Y[0], process_noise_sampler=ns)
        np.testing.assert_allclose(
            np.asarray(st2.weights), np.full(128, 1 / 128), atol=1e-6
        )


class TestLEDH:
    def test_tracks_linear_system(self, key, small_system, lgssm_data, linear_flow):
        g, h, jh, lt, ll, R, tracker, ns = linear_flow
        ledh = LEDHFlowPF(
            tracker, g, h, jh, lt, ll, R,
            LEDHConfig(n_particles=128, n_lambda_steps=8),
        )
        st = ledh.init_from_gaussian(key, jnp.zeros(2), jnp.eye(2))
        ts = tracker.init(jnp.zeros(2), jnp.eye(2))
        zs = lgssm_data.Y[:60]
        _, _, hist = jax.jit(
            lambda k, s, t: ledh.run(k, s, t, zs, process_noise_sampler=ns)
        )(jax.random.fold_in(key, 1), st, ts)
        rmse = float(jnp.sqrt(jnp.mean((hist["mean"] - lgssm_data.X[:60]) ** 2)))
        kf_rmse = _kf_rmse(small_system, lgssm_data)
        assert rmse < 2.5 * kf_rmse + 0.1

    def test_close_to_edh_on_linear_system(self, key, lgssm_data, linear_flow):
        """For a LINEAR observation model both flows approximate the same
        Gaussian posterior, so the posterior MEANS agree closely. (The
        particle clouds differ: LEDH's drift bⁱ anchors at each particle's
        own η₀ⁱ — reference ``LEDH_particle_filter.py:163-165`` — while EDH
        anchors at the mean path η̄.)"""
        g, h, jh, lt, ll, R, tracker, ns = linear_flow
        cfg = dict(n_particles=512, n_lambda_steps=8)
        edh = EDHFlowPF(
            tracker, g, h, jh, lt, ll, R,
            EDHConfig(flow_integrator="euler", **cfg),
        )
        ledh = LEDHFlowPF(tracker, g, h, jh, lt, ll, R, LEDHConfig(**cfg))
        st = edh.init_from_gaussian(key, jnp.zeros(2), jnp.eye(2))
        ts = tracker.init(jnp.zeros(2), jnp.eye(2))
        z = lgssm_data.Y[0]
        st_e, _ = edh.step(key, st, ts, z, process_noise_sampler=ns)
        st_l, _ = ledh.step(key, st, ts, z, process_noise_sampler=ns)
        np.testing.assert_allclose(
            np.asarray(st_e.mean), np.asarray(st_l.mean), atol=0.25
        )

    def test_theta_logdet_is_tracked(self, key, lgssm_data, linear_flow):
        """LEDH weights include |det(I + εA)| θ-corrections: with a linear h
        the A matrix is contraction-like, so θ < 1 (log θ < 0); weights must
        remain finite and normalized (reference ``test_ledh_flow_pf.py:503``)."""
        g, h, jh, lt, ll, R, tracker, ns = linear_flow
        ledh = LEDHFlowPF(
            tracker, g, h, jh, lt, ll, R, LEDHConfig(n_particles=64)
        )
        st = ledh.init_from_gaussian(key, jnp.zeros(2), jnp.eye(2))
        ts = tracker.init(jnp.zeros(2), jnp.eye(2))
        st2, _ = ledh.step(key, st, ts, lgssm_data.Y[0], process_noise_sampler=ns)
        w = np.asarray(st2.weights)
        assert np.all(np.isfinite(w))
        assert np.isclose(w.sum(), 1.0, atol=1e-4)

    def test_nonlinear_observation(self, key, small_system):
        """LEDH on a nonlinear (quadratic-norm) observation stays finite and
        reduces uncertainty."""
        s = small_system
        A = jnp.asarray(s["A"])
        Q = jnp.asarray(s["Q"])
        LQ = jnp.linalg.cholesky(Q + 1e-10 * jnp.eye(2))
        R = jnp.array([[0.1]])
        LR = jnp.linalg.cholesky(R)

        h = lambda x: jnp.array([jnp.sum(x**2)])
        jac_h = jax.jacfwd(h)
        g = lambda x, u, v: A @ x + v
        lt = lambda xn, xo: mvn_logpdf_chol(xn, A @ xo, LQ)
        ll = lambda z, x: mvn_logpdf_chol(z, h(x), LR)
        ns = lambda k, n, nx: jax.random.normal(k, (n, nx)) @ LQ.T

        ekf = ExtendedKalmanFilter(lambda x, u: A @ x, h, Q, R)
        tracker = GaussianTracker(ekf)
        ledh = LEDHFlowPF(tracker, g, h, jac_h, lt, ll, R, LEDHConfig(n_particles=128))
        st = ledh.init_from_gaussian(key, jnp.array([1.0, 0.5]), 0.5 * jnp.eye(2))
        ts = tracker.init(jnp.array([1.0, 0.5]), 0.5 * jnp.eye(2))
        st2, _ = ledh.step(key, st, ts, jnp.array([1.2]), process_noise_sampler=ns)
        assert np.all(np.isfinite(np.asarray(st2.mean)))
        assert np.all(np.isfinite(np.asarray(st2.particles)))
