"""Fused Pallas SIR step: correctness vs the generic ParticleFilter.

Runs the kernel in Pallas interpret mode on CPU (the real kernel is
exercised on TPU by bench.py / benchmarks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from particle_filters_tpu.models import ParticleFilter
from particle_filters_tpu.ops.fused_pf import FusedSIRFilter, _combine_partials

ALPHA, SIGMA, BETA = 0.9, 0.2, 1.0


def _make_fused(n, **kw):
    g_vec = lambda x: ALPHA * x
    obs_ll_vec = lambda x, z: -0.5 * (z[0] ** 2 / jnp.exp(x) + x)
    return FusedSIRFilter(
        g_vec, obs_ll_vec, Q=np.array([[SIGMA**2]]), Np=n, **kw
    )


class TestCombinePartials:
    def test_matches_direct_computation(self, key):
        """Blockwise (max, Σe, Σe², Σe·x, Σe·x⊗x) combination reproduces the
        exact global log-normalizer / ESS / moments."""
        n_blocks, b, nx = 4, 64, 2
        lw = jax.random.normal(key, (n_blocks, b)) * 2.0
        x = jax.random.normal(jax.random.fold_in(key, 1), (n_blocks, nx, b))

        partials = []
        for i in range(n_blocks):
            m = jnp.max(lw[i])
            e = jnp.exp(lw[i] - m)
            exx = ((x[i] * e[None, :]) @ x[i].T).reshape(-1)
            row = jnp.concatenate([
                jnp.stack([m, jnp.sum(e), jnp.sum(e * e)]),
                jnp.sum(e[None, :] * x[i], axis=1),
                exx,
                jnp.zeros(128 - 3 - nx - nx * nx),
            ])
            partials.append(row)
        partials = jnp.stack(partials)

        log_z, ess, mean, exx = _combine_partials(partials, nx)
        # combine returns the normalized second moment; covariance
        # completion happens post-scan (FusedSIRFilter._unpack_rows)
        cov = exx.reshape(nx, nx) - jnp.outer(mean, mean)

        lw_flat = lw.reshape(-1)
        x_flat = jnp.concatenate([x[i] for i in range(n_blocks)], axis=1)
        ref_logz = jax.scipy.special.logsumexp(lw_flat)
        w = jax.nn.softmax(lw_flat)
        ref_ess = 1.0 / jnp.sum(w**2)
        ref_mean = x_flat @ w
        ref_cov = (x_flat * w[None, :]) @ x_flat.T - jnp.outer(ref_mean, ref_mean)
        assert np.isclose(float(log_z), float(ref_logz), rtol=1e-5)
        assert np.isclose(float(ess), float(ref_ess), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cov), np.asarray(ref_cov), atol=1e-4)


class TestFusedFilterInterpret:
    def test_shapes_and_history(self, key, sv_data):
        f = _make_fused(2048, block=1024)
        st = f.initialize(key, np.zeros(1), np.array([[0.21]]))
        with pltpu.force_tpu_interpret_mode():
            _, hist = f.run(jax.random.fold_in(key, 1), st, sv_data.Y[:10, None])
        assert hist["mean"].shape == (10, 1)
        assert hist["cov"].shape == (10, 1, 1)
        assert np.all(np.isfinite(np.asarray(hist["mean"])))
        assert np.all(np.asarray(hist["ess"]) > 0)

    def test_tracks_like_generic_pf(self, key, sv_data):
        """Fused path statistically matches ParticleFilter on the SV model."""
        T = 60
        zs = sv_data.Y[:T, None]
        xs = sv_data.X[:T]

        f = _make_fused(4096, block=1024)
        st = f.initialize(key, np.zeros(1), np.array([[0.21]]))
        with pltpu.force_tpu_interpret_mode():
            _, hist_f = f.run(jax.random.fold_in(key, 1), st, zs)
        rmse_fused = float(jnp.sqrt(jnp.mean((hist_f["mean"][:, 0] - xs) ** 2)))

        def obs_ll(x, z):
            var = BETA**2 * jnp.exp(x[0])
            return -0.5 * (z[0] ** 2 / var + jnp.log(var))

        pf = ParticleFilter(
            lambda x, u: ALPHA * x, None, Q=np.array([[SIGMA**2]], np.float32),
            R=None, Np=4096, obs_loglik=obs_ll,
        )
        st_g = pf.initialize(key, np.zeros(1, np.float32), np.array([[0.21]], np.float32))
        _, hist_g = pf.run(jax.random.fold_in(key, 1), st_g, zs)
        rmse_gen = float(jnp.sqrt(jnp.mean((hist_g["mean"][:, 0] - xs) ** 2)))

        assert rmse_fused < 1.5
        assert abs(rmse_fused - rmse_gen) < 0.3 * max(rmse_fused, rmse_gen) + 0.05
        # ESS dynamics comparable
        assert abs(
            float(jnp.mean(hist_f["ess"])) - float(jnp.mean(hist_g["ess"]))
        ) < 0.35 * 4096

    def test_resampling_resets_weights(self, key):
        f = _make_fused(1024, block=512, resample_thresh=2.0)  # always
        st = f.initialize(key, np.zeros(1), np.array([[0.21]]))
        with pltpu.force_tpu_interpret_mode():
            st_out, hist = f.run(
                jax.random.fold_in(key, 1), st, jnp.full((2, 1), 3.0)
            )
        assert bool(hist["resampled"][0]) and bool(hist["resampled"][1])
        # normalized-uniform convention: logsumexp == 0, each -log(Np).
        # The carry keeps uniformity as a flag; effective_logw materializes.
        np.testing.assert_allclose(
            np.asarray(f.effective_logw(st_out)), -np.log(1024.0), atol=1e-6
        )

    def test_nx2_matches_generic_pf(self, key):
        """nx=2 path (single-row log-weight carry): tracks a 2-D LGSSM like
        the generic ParticleFilter — regression for the multi-dim layout."""
        A = np.array([[0.9, 0.1], [0.0, 0.8]], np.float32)
        Q = np.diag([0.05, 0.02]).astype(np.float32)
        r = 0.1
        T, Np = 30, 2048

        # simulate a short 2-D LGSSM, observe the first coordinate
        rng = np.random.default_rng(0)
        xs = np.zeros((T, 2), np.float32)
        x = np.zeros(2, np.float32)
        Lq = np.linalg.cholesky(Q)
        for t in range(T):
            x = A @ x + Lq @ rng.standard_normal(2).astype(np.float32)
            xs[t] = x
        zs = xs[:, :1] + np.sqrt(r) * rng.standard_normal((T, 1)).astype(
            np.float32
        )

        # Pallas kernels cannot capture array constants, so g_vec spells the
        # 2x2 transition out with Python scalars.
        f = FusedSIRFilter(
            lambda x: jnp.stack([0.9 * x[0, :] + 0.1 * x[1, :], 0.8 * x[1, :]]),
            lambda x, z: -0.5 * (z[0] - x[0, :]) ** 2 / r,
            Q=Q,
            Np=Np,
        )
        st = f.initialize(key, np.zeros(2), 0.3 * np.eye(2))
        assert st[1].shape == (1, Np)  # one log-weight per particle
        with pltpu.force_tpu_interpret_mode():
            _, hist = f.run(jax.random.fold_in(key, 1), st, zs)
        assert hist["mean"].shape == (T, 2)
        assert hist["cov"].shape == (T, 2, 2)
        rmse_fused = float(
            jnp.sqrt(jnp.mean((hist["mean"] - xs) ** 2))
        )

        pf = ParticleFilter(
            lambda x, u: jnp.asarray(A) @ x, None, Q=Q, R=None, Np=Np,
            obs_loglik=lambda x, z: -0.5 * (z[0] - x[0]) ** 2 / r,
        )
        st_g = pf.initialize(
            key, np.zeros(2, np.float32), 0.3 * np.eye(2, dtype=np.float32)
        )
        _, hist_g = pf.run(jax.random.fold_in(key, 1), st_g, zs)
        rmse_gen = float(jnp.sqrt(jnp.mean((hist_g["mean"] - xs) ** 2)))

        assert np.all(np.isfinite(np.asarray(hist["mean"])))
        assert rmse_fused < 0.5
        assert abs(rmse_fused - rmse_gen) < 0.3 * max(rmse_fused, rmse_gen) + 0.05

    def test_nx2_resample_weight_alignment(self, key):
        """After an nx>1 resample, weights reset and moments stay sane."""
        Q = np.diag([0.05, 0.05]).astype(np.float32)
        f = FusedSIRFilter(
            lambda x: x,
            lambda x, z: -0.5 * ((z[0] - x[0, :]) ** 2 + (z[1] - x[1, :]) ** 2) / 0.01,
            Q=Q,
            Np=1024,
            block=512,
            resample_thresh=2.0,  # always resample
        )
        st = f.initialize(key, np.zeros(2), np.eye(2))
        zs = jnp.full((3, 2), 1.5)
        with pltpu.force_tpu_interpret_mode():
            st_out, hist = f.run(jax.random.fold_in(key, 1), st, zs)
        assert np.all(np.asarray(hist["resampled"]))
        # normalized-uniform convention: logsumexp == 0, each -log(Np)
        np.testing.assert_allclose(
            np.asarray(f.effective_logw(st_out)), -np.log(1024.0), atol=1e-6
        )
        # posterior mean pulled toward the (1.5, 1.5) observations
        assert float(hist["mean"][-1, 0]) > 0.5
        assert float(hist["mean"][-1, 1]) > 0.5

    def test_validation(self):
        with pytest.raises(ValueError, match="multiple of the block"):
            _make_fused(1000, block=512)
        with pytest.raises(ValueError, match="nx <= 10"):
            FusedSIRFilter(
                lambda x: x, lambda x, z: x[0:1], Q=np.eye(16), Np=1024
            )
