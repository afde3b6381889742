"""Derived-model decorator tests.

Reference parity: ``src/qinfer/tests`` coverage of ``derived_models.py`` —
binomial lifting, model chains, MLE annealing, random-walk timestep,
poisoning.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import binom

import qinfer_tpu as q


def test_model_chain_and_base_model():
    base = q.SimplePrecessionModel()
    m = q.BinomialModel(q.MLEModel(base, 2.0), n_meas_max=8)
    assert m.base_model is base
    assert len(m.model_chain) == 3


def test_binomial_likelihood_matches_scipy():
    model = q.BinomialModel(q.SimplePrecessionModel(), n_meas_max=10)
    omega, t, n_meas = 0.5, 2.0, 10
    pr0 = np.cos(omega * t / 2) ** 2
    eps = {"t": jnp.array([t]), "n_meas": jnp.array([n_meas])}
    outcomes = jnp.arange(11)
    L = np.asarray(model.likelihood(outcomes, jnp.array([[omega]]), eps))
    expect = binom.pmf(np.arange(11), n_meas, pr0)
    np.testing.assert_allclose(L[:, 0, 0], expect, atol=1e-5)


def test_binomial_outcome_mask_padding():
    model = q.BinomialModel(q.SimplePrecessionModel(), n_meas_max=10)
    eps = {"t": jnp.array([1.0, 1.0]), "n_meas": jnp.array([10, 4])}
    mask = np.asarray(model.outcome_mask(eps))
    assert mask.shape == (11, 2)
    assert mask[:, 0].all()
    assert mask[5, 1] == False  # noqa: E712 — outcome 5 invalid for n_meas=4
    # likelihood of padded outcomes is exactly zero
    L = np.asarray(model.likelihood(
        jnp.arange(11), jnp.array([[0.5]]), eps))
    assert np.all(L[5:, 0, 1] == 0.0)
    # masked likelihoods still sum to one for the short experiment
    assert np.isclose(L[:5, 0, 1].sum(), 1.0, atol=1e-4)


def test_binomial_simulation_moments(key):
    model = q.BinomialModel(q.SimplePrecessionModel(), n_meas_max=20)
    omega, t = 0.5, 2.0
    pr0 = np.cos(omega * t / 2) ** 2
    eps = {"t": jnp.array([t]), "n_meas": jnp.array([20])}
    draws = np.asarray(model.simulate_experiment(
        key, jnp.array([[omega]]), eps, repeat=3000)).ravel()
    assert np.isclose(draws.mean(), 20 * pr0, atol=0.3)
    assert np.isclose(draws.var(), 20 * pr0 * (1 - pr0), rtol=0.2)


def test_binomial_smc_convergence():
    model = q.BinomialModel(q.SimplePrecessionModel(), n_meas_max=25)
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdater(model, 2000, prior, seed=0)
    true = jnp.array([[0.37]])
    key = jax.random.key(4)
    for k in range(30):
        t = (9 / 8) ** k / 5
        eps = {"t": jnp.array([t]), "n_meas": jnp.array([25])}
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(sk, true, eps)
        u.update(o, eps)
    mean = float(u.est_mean()[0])
    std = float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
    assert abs(mean - 0.37) < 6 * std + 0.005
    assert std < 0.02


def test_mle_model_sharpens_posterior():
    """Likelihood annealing: power > 1 concentrates weights faster."""
    base = q.SimplePrecessionModel()
    mle = q.MLEModel(base, likelihood_power=4.0)
    prior = q.UniformDistribution([[0.0, 1.0]])
    u_base = q.SMCUpdater(base, 1000, prior, seed=0)
    u_mle = q.SMCUpdater(mle, 1000, prior, seed=0)
    key = jax.random.key(1)
    for k in range(8):
        key, sk = jax.random.split(key)
        o = base.simulate_experiment(
            sk, jnp.array([[0.5]]), {"t": jnp.array([3.0])})
        u_base.update(o, {"t": jnp.array([3.0])}, check_for_resample=False)
        u_mle.update(o, {"t": jnp.array([3.0])}, check_for_resample=False)
    assert float(u_mle.est_entropy()) < float(u_base.est_entropy())


def test_poisoned_model_perturbs_within_tol():
    base = q.SimplePrecessionModel()
    poisoned = q.PoisonedModel(base, tol=0.01, seed=0)
    eps = {"t": jnp.array([1.0])}
    mps = jnp.linspace(0, 1, 50)[:, None]
    L_base = np.asarray(base.likelihood(jnp.array([0, 1]), mps, eps))
    L_pois = np.asarray(poisoned.likelihood(jnp.array([0, 1]), mps, eps))
    err = np.abs(L_base - L_pois)
    assert err.max() > 0  # actually poisoned
    assert err.max() < 0.08  # ~within a few tolerances
    assert np.all(L_pois >= 0) and np.all(L_pois <= 1)


def test_poisoned_model_ale_mode():
    base = q.SimplePrecessionModel()
    poisoned = q.PoisonedModel(base, n_samples=100, hedge=0.5, seed=0)
    eps = {"t": jnp.array([1.0])}
    L = np.asarray(poisoned.likelihood(
        jnp.array([0]), jnp.array([[0.5]]), eps))
    assert np.isfinite(L).all()


def test_random_walk_update_timestep(key):
    step = q.NormalDistribution(0.0, 0.01)
    model = q.RandomWalkModel(q.SimplePrecessionModel(), step)
    mps = jnp.full((200, 1), 0.5)
    eps = {"t": jnp.array([1.0])}
    moved = model.update_timestep(key, mps, eps)
    assert moved.shape == (200, 1, 1)
    deltas = np.asarray(moved[:, 0, 0]) - 0.5
    assert np.isclose(deltas.std(), 0.1, rtol=0.2)
    assert not np.allclose(deltas, 0)


def test_random_walk_tracking():
    """SMC with RandomWalkModel tracks a drifting parameter better than a
    static model whose posterior over-narrows."""
    drift = q.NormalDistribution(0.0, 1e-4)
    model = q.RandomWalkModel(q.SimplePrecessionModel(), drift)
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdater(model, 1000, prior, seed=0)
    true = jnp.array([[0.5]])
    key = jax.random.key(8)
    for k in range(30):
        key, k_sim, k_drift = jax.random.split(key, 3)
        eps = {"t": jnp.array([10.0])}
        o = q.SimplePrecessionModel().simulate_experiment(k_sim, true, eps)
        u.update(o, eps)
        true = true + jax.random.normal(k_drift, (1, 1)) * 0.01
    # posterior keeps nonzero width (does not collapse while truth drifts)
    assert float(u.est_covariance_mtx()[0, 0]) > 1e-6


def test_gaussian_random_walk():
    model = q.GaussianRandomWalkModel(q.RamseyModel(), scale=[0.01, 0.001])
    key = jax.random.key(0)
    mps = jnp.full((100, 2), 0.5)
    moved = model.update_timestep(key, mps, {"t": jnp.array([1.0])})
    stds = np.asarray(moved[:, :, 0]).std(axis=0)
    assert stds[0] > stds[1]


def test_multinomial_model_likelihood():
    from scipy.stats import multinomial as sp_multinomial

    die = q.NDieModel(3)
    m = q.MultinomialModel(die, n_meas_max=12)
    p = np.array([0.5, 0.3, 0.2])
    counts = np.array([[6, 4, 2]])
    eps = {"exp_num": jnp.array([0]), "n_meas": jnp.array([12])}
    L = float(m.likelihood(jnp.asarray(counts), jnp.asarray(p)[None, :],
                           eps)[0, 0, 0])
    assert np.isclose(L, sp_multinomial.pmf(counts[0], 12, p), rtol=1e-4)


def test_multinomial_model_simulation(key):
    die = q.NDieModel(3)
    m = q.MultinomialModel(die, n_meas_max=30)
    p = jnp.array([[0.5, 0.3, 0.2]])
    eps = {"exp_num": jnp.array([0]), "n_meas": jnp.array([30])}
    draws = np.asarray(m.simulate_experiment(key, p, eps, repeat=500))
    assert draws.shape == (500, 1, 1, 3)
    assert np.all(draws.sum(axis=-1) == 30)
    freqs = draws.mean(axis=(0, 1, 2)) / 30
    np.testing.assert_allclose(freqs, [0.5, 0.3, 0.2], atol=0.05)


def test_ale_estimates_within_tolerance(key):
    sim = q.SimplePrecessionModel()
    ale = q.ALEApproximateModel(sim, error_tol=0.02)
    eps = {"t": jnp.array([1.0])}
    mps = jnp.array([[0.5]])
    L_est = float(ale.likelihood(jnp.array([0]), mps, eps)[0, 0, 0])
    L_true = float(sim.likelihood(jnp.array([0]), mps, eps)[0, 0, 0])
    assert abs(L_est - L_true) < 5 * 0.02


def test_ale_warns_when_capped():
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        q.ALEApproximateModel(q.SimplePrecessionModel(),
                              error_tol=0.001, max_samp=100)
    assert any(issubclass(w.category, q.ApproximationWarning)
               for w in caught)


def test_ale_smc_inference():
    sim = q.SimplePrecessionModel()
    ale = q.ALEApproximateModel(sim, error_tol=0.05, max_samp=400)
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdater(ale, 500, prior, seed=0)
    key = jax.random.key(3)
    for k in range(15):
        t = (9 / 8) ** k / 5
        key, sk = jax.random.split(key)
        o = sim.simulate_experiment(sk, jnp.array([[0.5]]),
                                    {"t": jnp.array([t])})
        u.update(o, {"t": jnp.array([t])})
    assert abs(float(u.est_mean()[0]) - 0.5) < 0.15


def test_rb_fidelity_conversions():
    p = 0.98
    F = q.p_to_F(p)
    assert np.isclose(q.F_to_p(F), p)
    assert np.isclose(F, 0.99)  # qubit: F = 1 - (1-p)/2


def test_log_likelihood_engine_survives_underflow():
    """With n_meas so large that every particle's linear binomial pmf
    underflows float32, the engine's max-shifted log path must keep
    inferring (a linear engine would hit the zero-weight policy every
    step)."""
    model = q.BinomialModel(q.SimplePrecessionModel(), n_meas_max=20000)
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdater(model, 1000, prior, seed=0)
    true = jnp.array([[0.43]])
    key = jax.random.key(7)
    for k in range(8):
        t = 0.3 * (k + 1)
        eps = {"t": jnp.array([t]), "n_meas": jnp.array([20000])}
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(sk, true, eps)
        # sanity: the linear pmf of this outcome underflows f32 everywhere
        u.update(o, eps)
    std = float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
    assert abs(float(u.est_mean()[0]) - 0.43) < 6 * std + 0.01
    assert std < 0.01
    assert int(u.state.zero_weight_count) == 0
    # evidence record stays finite and positive
    assert all(n >= 0 for n in u.normalization_record)
    assert np.isfinite(u.log_total_likelihood)


def test_referenced_poisson_log_likelihood_high_counts():
    m = q.ReferencedPoissonModel(q.SimplePrecessionModel(), max_count=5000)
    mps = jnp.array([[0.5, 2000.0, 50.0]])
    eps = {"t": jnp.array([1.0]), "mode": jnp.array([0])}
    ll = float(m.log_likelihood(jnp.array([1500]), mps, eps)[0, 0, 0])
    assert np.isfinite(ll) and ll < 0
    # linear pmf would underflow f32 for far-tail counts; log stays finite
    ll_tail = float(m.log_likelihood(jnp.array([4000]), mps, eps)[0, 0, 0])
    assert np.isfinite(ll_tail) and ll_tail < -100


def test_multinomial_smc_update_vector_outcomes():
    """Code-review regression: SMCUpdater.update must consume a full count
    VECTOR for MultinomialModel (it used to silently truncate to the first
    element and broadcast a wrong posterior)."""
    from scipy.stats import multinomial as sp_multinomial

    die = q.NDieModel(3)
    m = q.MultinomialModel(die, n_meas_max=12)
    prior = q.MVUniformDistribution(3)
    u = q.SMCUpdater(m, 300, prior, seed=0)
    eps = {"exp_num": jnp.array([0]), "n_meas": jnp.array([12])}
    outcome = jnp.array([6, 4, 2])
    u.update(outcome, eps, check_for_resample=False)
    # manual posterior
    w0 = np.full(300, 1 / 300)
    x = np.asarray(u.particle_locations)
    L = np.array([sp_multinomial.pmf([6, 4, 2], 12, p / p.sum())
                  for p in x])
    expect = w0 * L
    expect /= expect.sum()
    np.testing.assert_allclose(np.asarray(u.particle_weights), expect,
                               atol=1e-5)
    # and batch_update with a record of vectors
    outs = jnp.array([[6, 4, 2], [5, 5, 2]])
    eps2 = {"exp_num": jnp.array([0, 0]), "n_meas": jnp.array([12, 12])}
    u.batch_update(outs, eps2)
    assert np.isfinite(np.asarray(u.est_mean())).all()


def test_multinomial_simulation_per_experiment_n_meas(key):
    """Code-review regression: each experiment's n_meas must be honored
    (used to use the first experiment's count for every experiment)."""
    die = q.NDieModel(3)
    m = q.MultinomialModel(die, n_meas_max=16)
    p = jnp.array([[0.5, 0.3, 0.2]])
    eps = {"exp_num": jnp.array([0, 1]), "n_meas": jnp.array([12, 5])}
    draws = np.asarray(m.simulate_experiment(key, p, eps, repeat=100))
    totals = draws.sum(axis=-1)  # (100, 1, 2)
    assert np.all(totals[:, 0, 0] == 12)
    assert np.all(totals[:, 0, 1] == 5)


def test_poisoned_noise_fresh_per_step():
    """Code-review regression: poison noise must differ across scanned
    steps (the underscore key was dropped by pytree flattening, freezing
    the noise)."""
    base = q.SimplePrecessionModel()
    poisoned = q.PoisonedModel(base, tol=0.02, seed=0)
    u = q.SMCUpdater(poisoned, 200, q.UniformDistribution([[0, 1]]),
                     seed=0, zero_weight_policy="reset")
    # identical experiments & outcomes: normalizations differ iff noise is
    # re-drawn per step
    outs = jnp.zeros(8, dtype=jnp.int32)
    eps = {"t": jnp.full((8,), 1.0)}
    norms = np.asarray(u.batch_update(outs, eps))
    assert len(np.unique(np.round(norms, 8))) > 4


def test_ale_single_sample_budget():
    """Review regression: n_samples==1 must not crash (simulate squeezes
    the repeat axis; likelihood re-adds it)."""
    import warnings as _w

    sim = q.SimplePrecessionModel()
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        m = q.ALEApproximateModel(sim, error_tol=1.0, min_samp=1,
                                  samp_step=1, max_samp=1)
    assert m.n_samples == 1
    L = m.likelihood(jnp.array([0]), jnp.ones((4, 1)) * 0.5,
                     {"t": jnp.array([1.0])}, key=jax.random.key(0))
    assert L.shape == (1, 4, 1)
    assert np.all(np.isfinite(np.asarray(L)))


def test_ale_adaptive_chunking_stops_early():
    """Adaptive ALE (lax.while_loop chunks) must reach error_tol and agree
    with the exact likelihood; easy cells should not consume the worst-case
    budget (reference parity: the host adaptive loop)."""
    sim = q.CoinModel()
    m = q.ALEApproximateModel(sim, error_tol=0.05, samp_step=50)
    # worst-case budget is 0.25/0.0025 = 100 -> only 2 chunks needed at most
    assert m.n_samples >= 100
    mps = jnp.array([[0.9], [0.5], [0.1]])
    # CoinModel convention: Pr(outcome=0) = p
    L = m.likelihood(jnp.array([0]), mps, {"null": jnp.array([0.0])},
                     key=jax.random.key(0))
    np.testing.assert_allclose(
        np.asarray(L)[0, :, 0], [0.9, 0.5, 0.1], atol=0.12)
    # non-adaptive path still works and agrees
    m2 = q.ALEApproximateModel(sim, error_tol=0.05, samp_step=50,
                               adaptive=False)
    L2 = m2.likelihood(jnp.array([0]), mps, {"null": jnp.array([0.0])},
                       key=jax.random.key(0))
    np.testing.assert_allclose(
        np.asarray(L2)[0, :, 0], [0.9, 0.5, 0.1], atol=0.12)


def test_ale_respects_min_samp_floor():
    """Review regression: the adaptive loop must not stop below min_samp
    even when the first chunk's std-err looks small."""
    sim = q.CoinModel()
    m = q.ALEApproximateModel(sim, error_tol=0.2, min_samp=200,
                              samp_step=10)
    # p=0 coin: every chunk counts zero successes, so the hedged estimate
    # h/(N+2h) directly encodes how many samples the loop actually drew
    # (N=10 would give 0.046; N=200 gives 0.0025)
    # CoinModel: Pr(outcome=0) = p, so outcome 0 is never simulated at p=0
    L = float(np.asarray(m.likelihood(
        jnp.array([0]), jnp.array([[0.0]]),
        {"null": jnp.array([0.0])}, key=jax.random.key(0)))[0, 0, 0])
    n_eff = 0.509 / L - 2 * 0.509
    assert n_eff >= 190, f"loop stopped at ~{n_eff:.0f} samples"


def test_ale_delegates_time_dependence():
    """Review regression: wrapping a time-dependent simulator must keep
    is_time_dependent True (the engine skips update_timestep otherwise)."""
    walk = q.RandomWalkModel(q.SimplePrecessionModel(),
                             q.NormalDistribution(0.0, 1e-4))
    m = q.ALEApproximateModel(walk, error_tol=0.2)
    assert m.is_time_dependent is True
    assert q.ALEApproximateModel(q.SimplePrecessionModel(),
                                 error_tol=0.2).is_time_dependent is False
