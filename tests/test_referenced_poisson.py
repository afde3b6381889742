"""ReferencedPoissonModel and learned-sigma GaussianRandomWalkModel tests.

Reference parity: ``derived_models.py::ReferencedPoissonModel`` and the
learned-Σ ``GaussianRandomWalkModel`` variant.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import poisson

import qinfer_tpu as q


@pytest.fixture
def rp_model():
    return q.ReferencedPoissonModel(q.SimplePrecessionModel(), max_count=100)


def test_likelihood_matches_scipy_signal(rp_model):
    mps = jnp.array([[0.5, 40.0, 2.0]])
    p0 = float(np.cos(0.5 * 2 / 2) ** 2)
    rate = p0 * 40 + (1 - p0) * 2
    eps = {"t": jnp.array([2.0]), "mode": jnp.array([rp_model.SIGNAL])}
    for count in (0, 10, 30):
        L = float(rp_model.likelihood(jnp.array([count]), mps, eps)[0, 0, 0])
        assert np.isclose(L, poisson.pmf(count, rate), rtol=1e-3, atol=1e-8)


def test_likelihood_reference_modes(rp_model):
    mps = jnp.array([[0.5, 40.0, 2.0]])
    for mode, rate in ((rp_model.BRIGHT, 40.0), (rp_model.DARK, 2.0)):
        eps = {"t": jnp.array([1.0]), "mode": jnp.array([mode])}
        L = float(rp_model.likelihood(jnp.array([5]), mps, eps)[0, 0, 0])
        assert np.isclose(L, poisson.pmf(5, rate), rtol=1e-3, atol=1e-8)


def test_simulation_mean(rp_model, key):
    mps = jnp.array([[0.5, 40.0, 2.0]])
    eps = {"t": jnp.array([2.0]), "mode": jnp.array([0])}
    p0 = float(np.cos(0.5) ** 2)
    rate = p0 * 40 + (1 - p0) * 2
    sims = rp_model.simulate_experiment(key, mps, eps, repeat=3000)
    assert np.isclose(float(jnp.mean(sims.astype(jnp.float32))), rate,
                      rtol=0.05)


def test_validity_orders_references(rp_model):
    ok = rp_model.are_models_valid(jnp.array(
        [[0.5, 40.0, 2.0], [0.5, 2.0, 40.0], [0.5, 10.0, -1.0]]))
    np.testing.assert_array_equal(np.asarray(ok), [True, False, False])


def test_smc_inference_with_calibration(rp_model):
    prior = q.ProductDistribution(
        q.UniformDistribution([[0.0, 1.0]]),
        q.NormalDistribution(40.0, 4.0),
        q.NormalDistribution(2.0, 0.25))
    u = q.SMCUpdater(rp_model, 2000, prior, seed=0)
    true = jnp.array([[0.7, 40.0, 2.0]])
    key = jax.random.key(5)
    for k in range(40):
        mode = 0 if k % 4 else 1
        t = (9 / 8) ** k / 10
        eps = {"t": jnp.array([t]), "mode": jnp.array([mode])}
        key, sk = jax.random.split(key)
        o = rp_model.simulate_experiment(sk, true, eps)
        u.update(o, eps)
    est = np.asarray(u.est_mean())
    assert abs(est[0] - 0.7) < 0.1
    assert abs(est[1] - 40.0) < 3.0


def test_grw_learned_sigma_shapes():
    g = q.GaussianRandomWalkModel(q.SimplePrecessionModel(),
                                  model_mu_sigma=True)
    assert g.n_modelparams == 2
    assert g.modelparam_names == ["omega", "log_sigma_omega"]
    assert len(g.Q) == 2


def test_grw_learned_sigma_walk_scale(key):
    g = q.GaussianRandomWalkModel(q.SimplePrecessionModel(),
                                  model_mu_sigma=True)
    mps = jnp.tile(jnp.array([[0.5, np.log(0.05)]]), (800, 1))
    moved = g.update_timestep(key, mps, {"t": jnp.array([1.0])})
    assert moved.shape == (800, 2, 1)
    assert np.isclose(float(jnp.std(moved[:, 0, 0])), 0.05, rtol=0.2)
    # sigma coordinates do not walk
    np.testing.assert_allclose(np.asarray(moved[:, 1, 0]),
                               np.log(0.05), atol=1e-6)


def test_grw_learned_sigma_smc_runs():
    g = q.GaussianRandomWalkModel(q.SimplePrecessionModel(),
                                  model_mu_sigma=True)
    prior = q.ProductDistribution(
        q.UniformDistribution([[0.0, 1.0]]),
        q.UniformDistribution([[np.log(1e-3), np.log(0.2)]]))
    u = q.SMCUpdater(g, 500, prior, seed=0)
    key = jax.random.key(1)
    for k in range(10):
        key, sk = jax.random.split(key)
        o = q.SimplePrecessionModel().simulate_experiment(
            sk, jnp.array([[0.5]]), {"t": jnp.array([3.0])})
        u.update(o, {"t": jnp.array([3.0])})
    assert np.isfinite(np.asarray(u.est_mean())).all()
