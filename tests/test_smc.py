"""SMC engine tests: convergence, estimators, regions, evidence.

Reference parity: the statistical/convergence integration tests of
``src/qinfer/tests`` (SURVEY.md §4) — seed-derandomized, MC-tolerant
assertions: posterior mean within k·sigma of truth, covariance shrinks, ESS
sane.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qinfer_tpu as q


def run_precession(n_particles=2000, n_exp=60, true_omega=0.7, seed=0,
                   **updater_kwargs):
    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdater(model, n_particles, prior, seed=seed, **updater_kwargs)
    key = jax.random.key(seed + 100)
    for k in range(n_exp):
        t = (9 / 8) ** k / 10
        key, sk = jax.random.split(key)
        outcome = model.simulate_experiment(
            sk, jnp.array([[true_omega]]), {"t": jnp.array([t])})
        u.update(outcome, {"t": jnp.array([t])})
    return u


def test_precession_convergence():
    u = run_precession()
    mean = float(u.est_mean()[0])
    std = float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
    assert std < 0.02, "posterior did not sharpen"
    assert abs(mean - 0.7) < 6 * std + 0.005


def test_batch_update_equivalent_convergence():
    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    true_omega = 0.55
    ts = jnp.asarray([(9 / 8) ** k / 10 for k in range(60)])
    outs = model.simulate_experiment(
        jax.random.key(1), jnp.array([[true_omega]]), {"t": ts})[0]
    u = q.SMCUpdater(model, 2000, prior, seed=2)
    u.batch_update(outs, {"t": ts}, resample_interval=5)
    mean = float(u.est_mean()[0])
    std = float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
    assert abs(mean - true_omega) < 6 * std + 0.01
    assert len(u.normalization_record) == 60
    assert u.log_total_likelihood < 0


def test_ess_and_resampling():
    u = run_precession(n_particles=500, n_exp=40)
    assert u.resample_count > 0
    assert 1.0 <= u.n_ess <= 500.0
    assert u.min_n_ess <= u.n_ess + 1e-3


def test_no_resample_when_disabled():
    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdater(model, 200, prior, seed=0)
    key = jax.random.key(5)
    for k in range(20):
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(
            sk, jnp.array([[0.5]]), {"t": jnp.array([5.0])})
        u.update(o, {"t": jnp.array([5.0])}, check_for_resample=False)
    assert u.resample_count == 0


def test_explicit_resample_resets_weights():
    u = run_precession(n_exp=20, n_particles=300)
    u.resample()
    w = np.asarray(u.particle_weights)
    np.testing.assert_allclose(w, 1.0 / 300, atol=1e-6)
    assert u.just_resampled


def test_est_meanfn():
    u = run_precession(n_exp=30)
    m2 = u.est_meanfn(lambda x: x ** 2)
    mean = u.est_mean()
    var = u.est_covariance_mtx()[0, 0]
    np.testing.assert_allclose(
        float(m2[0]), float(mean[0] ** 2 + var), rtol=1e-3)


def test_est_covariance_corr():
    u = run_precession(n_exp=20)
    corr = np.asarray(u.est_covariance_mtx(corr=True))
    np.testing.assert_allclose(np.diag(corr), 1.0, atol=1e-4)


def test_est_entropy_decreases():
    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdater(model, 1000, prior, seed=0)
    h0 = float(u.est_entropy())
    key = jax.random.key(0)
    for k in range(10):
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(
            sk, jnp.array([[0.5]]), {"t": jnp.array([3.0])})
        u.update(o, {"t": jnp.array([3.0])}, check_for_resample=False)
    assert float(u.est_entropy()) < h0


def test_hypothetical_update_shapes():
    u = run_precession(n_exp=5)
    eps = {"t": jnp.array([1.0, 2.0, 3.0])}
    w, L, norms = u.hypothetical_update(
        jnp.array([0, 1]), eps, return_likelihood=True,
        return_normalization=True)
    assert w.shape == (2, 3, 2000)
    assert L.shape == (2, 2000, 3)
    assert norms.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(w.sum(axis=-1)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(norms.sum(axis=0)), 1.0, atol=1e-4)


def test_sample_posterior():
    u = run_precession(n_exp=40)
    s = u.sample(500)
    assert s.shape == (500, 1)
    mean = float(u.est_mean()[0])
    assert abs(float(s.mean()) - mean) < 0.05


def test_bayes_risk_prefers_informative_experiments():
    """After convergence to ~sigma, the 1/sigma-scale time should beat a
    hopelessly short experiment (t->0 gives no information)."""
    u = run_precession(n_exp=40)
    sigma = float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
    risks = np.asarray(u.bayes_risk(
        {"t": jnp.array([1e-4, 1.0 / sigma])}))
    assert risks[1] < risks[0]


def test_information_gain_positive_and_bounded():
    u = run_precession(n_exp=30)
    ig = np.asarray(u.expected_information_gain(
        {"t": jnp.array([0.001, 1.0, 10.0, 100.0])}))
    assert np.all(ig >= -1e-6)
    assert np.all(ig <= np.log(2) + 1e-5)  # binary outcome: <= 1 bit


def test_credible_region_mass():
    u = run_precession(n_exp=40)
    inside = u.est_credible_region(level=0.9)
    w = np.asarray(u.particle_weights)
    order = np.argsort(-w)
    mass = w[order[: len(inside)]].sum()
    assert mass >= 0.9 - 1e-5
    # true value should be in a high-level credible interval
    lo, hi = inside.min(), inside.max()
    assert lo - 0.02 <= 0.7 <= hi + 0.02


def test_in_credible_region_methods():
    u = run_precession(n_exp=40)
    mean = np.asarray(u.est_mean())[None, :]
    far = np.array([[10.0]])
    for method in ("hpd_hull", "hpd_mvee"):
        got = u.in_credible_region(
            np.concatenate([mean, far]), level=0.95, method=method)
        assert got[0] and not got[1], method


def test_posterior_marginal():
    u = run_precession(n_exp=40)
    xs, ys = u.posterior_marginal(0, res=50, smoothing=1.0)
    assert xs.shape == (50,) and ys.shape == (50,)
    # density peaks near the posterior mean
    assert abs(xs[np.argmax(ys)] - float(u.est_mean()[0])) < 0.05


def test_kl_divergence_self_small():
    u1 = run_precession(n_exp=30, seed=0)
    u2 = run_precession(n_exp=30, seed=0)
    u3 = run_precession(n_exp=30, seed=0, true_omega=0.2)
    d_same = float(u1.est_kl_divergence(u2))
    d_diff = float(u1.est_kl_divergence(u3))
    assert abs(d_same) < 0.5
    assert d_diff > d_same


def test_evidence_model_selection():
    """log_total_likelihood must favor the true model over a wrong one."""
    model = q.SimplePrecessionModel()
    good_prior = q.UniformDistribution([[0.6, 0.8]])   # contains true 0.7
    bad_prior = q.UniformDistribution([[0.0, 0.1]])    # excludes it
    key = jax.random.key(9)
    u_good = q.SMCUpdater(model, 1000, good_prior, seed=1,
                          zero_weight_policy="reset")
    u_bad = q.SMCUpdater(model, 1000, bad_prior, seed=1,
                         zero_weight_policy="reset")
    for k in range(25):
        t = (9 / 8) ** k / 10
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(
            sk, jnp.array([[0.7]]), {"t": jnp.array([t])})
        u_good.update(o, {"t": jnp.array([t])})
        u_bad.update(o, {"t": jnp.array([t])})
    assert u_good.log_total_likelihood > u_bad.log_total_likelihood


def test_zero_weight_error_policy():
    m = q.CoinModel()
    u = q.SMCUpdater(m, 50, q.ConstantDistribution([1.0]),
                     zero_weight_policy="error", seed=0)
    with pytest.raises(q.ZeroWeightError):
        u.update(1, {"exp_num": jnp.array([0])})


def test_zero_weight_reset_policy():
    m = q.CoinModel()
    u = q.SMCUpdater(m, 50, q.ConstantDistribution([1.0]),
                     zero_weight_policy="reset", seed=0)
    u.update(1, {"exp_num": jnp.array([0])})
    np.testing.assert_allclose(np.asarray(u.particle_weights), 1 / 50,
                               atol=1e-7)


def test_posterior_distribution_warm_start():
    u = run_precession(n_exp=40)
    post = u.posterior_distribution()
    u2 = q.SMCUpdater(q.SimplePrecessionModel(), 500, post, seed=3)
    m1 = float(u.est_mean()[0])
    m2 = float(u2.est_mean()[0])
    assert abs(m1 - m2) < 0.02


def test_state_checkpoint_roundtrip(tmp_path):
    """Engine state is a plain pytree of arrays — numpy round-trip restores
    the posterior exactly (SURVEY.md §5 checkpoint/resume)."""
    u = run_precession(n_exp=20)
    st = u.state
    path = tmp_path / "ckpt.npz"
    np.savez(path, **{k: np.asarray(v) for k, v in st._asdict().items()
                      if k != "key"},
             key=jax.random.key_data(st.key))
    loaded = np.load(path)
    from qinfer_tpu.smc import SMCState

    restored = SMCState(
        weights=jnp.asarray(loaded["weights"]),
        locations=jnp.asarray(loaded["locations"]),
        key=jax.random.wrap_key_data(jnp.asarray(loaded["key"])),
        resample_count=jnp.asarray(loaded["resample_count"]),
        just_resampled=jnp.asarray(loaded["just_resampled"]),
        log_total_likelihood=jnp.asarray(loaded["log_total_likelihood"]),
        min_n_ess=jnp.asarray(loaded["min_n_ess"]),
        zero_weight_count=jnp.asarray(loaded["zero_weight_count"]),
        resampler_fallback_count=jnp.asarray(
            loaded["resampler_fallback_count"]),
    )
    u2 = q.SMCUpdater(q.SimplePrecessionModel(), 2000,
                      q.UniformDistribution([[0, 1]]), seed=0)
    u2.state = restored
    np.testing.assert_allclose(np.asarray(u2.est_mean()),
                               np.asarray(u.est_mean()), atol=1e-7)
    # restored updater keeps updating
    u2.update(0, {"t": jnp.array([1.0])})


def test_bcrb_tracking():
    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdaterBCRB(model, 500, prior, seed=0)
    key = jax.random.key(2)
    for k in range(15):
        t = float(k + 1)
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(
            sk, jnp.array([[0.5]]), {"t": jnp.array([t])})
        u.update(o, {"t": jnp.array([t])})
    bim = u.current_bim
    assert bim.shape == (1, 1) and bim[0, 0] > 0
    bcrb = u.current_bcrb
    assert bcrb[0, 0] > 0
    # BCRB must lower-bound within MC slop: posterior var >= ~bcrb
    var = float(u.est_covariance_mtx()[0, 0])
    assert var > 0.01 * bcrb[0, 0]


def test_cluster_moments():
    # bimodal cloud -> >= 2 clusters
    locs = np.concatenate([
        np.random.RandomState(0).randn(200, 1) * 0.01,
        5.0 + np.random.RandomState(1).randn(200, 1) * 0.01])
    dist = q.ParticleDistribution(jnp.asarray(locs))
    model = q.SimplePrecessionModel()
    u = q.SMCUpdater(model, 400, dist, seed=0)
    moments = list(u.est_cluster_moments(
        {"eps": 0.5, "min_particles": 5}))
    labels = [m[0] for m in moments]
    assert len([l for l in labels if l != q.NO_CLUSTER]) >= 2
    metrics = u.est_cluster_metrics({"eps": 0.5, "min_particles": 5})
    assert metrics["n_clusters"] >= 2


def test_track_resampling_divergence():
    """Reference parity: track_resampling_divergence records one KL value
    per resample event (``smc.py::SMCUpdater`` diagnostics)."""
    model = q.SimplePrecessionModel()
    u = q.SMCUpdater(model, 400, q.UniformDistribution([[0, 1]]), seed=0,
                     track_resampling_divergence=True, resample_thresh=0.9)
    key = jax.random.key(1)
    for k in range(20):
        t = (9 / 8) ** k / 5
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(sk, jnp.array([[0.6]]),
                                      {"t": jnp.array([t])})
        u.update(o, {"t": jnp.array([t])})
    assert u.resample_count > 0
    assert len(u.resampling_divergences) == u.resample_count
    assert all(np.isfinite(d) for d in u.resampling_divergences)


def test_in_credible_region_est_cov():
    u = run_precession(n_exp=40)
    mean = np.asarray(u.est_mean())[None, :]
    far = np.array([[10.0]])
    got = u.in_credible_region(
        np.concatenate([mean, far]), level=0.95, method="est_cov")
    assert got[0] and not got[1]


def test_bcrb_consumes_only_first_experiment_of_batch():
    """Review regression: like the base updater, SMCUpdaterBCRB must slice
    the batch to its first experiment BEFORE the Fisher evaluation."""
    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdaterBCRB(model, 200, prior, adaptive=False, seed=0)
    eps = {"t": jnp.array([3.0, 100.0, 200.0])}
    u.update(0, eps)
    # precession Fisher info is t^2; only t=3 may contribute
    assert np.isclose(u.current_bim[0, 0], 9.0, rtol=1e-3)


def test_sim_count_bookkeeping():
    """Review regression: sim_count = n_models * n_expparams * repeat."""
    model = q.SimplePrecessionModel()
    mps = jnp.ones((5, 1)) * 0.5
    eps = {"t": jnp.array([1.0, 2.0, 3.0])}
    model.simulate_experiment(jax.random.key(0), mps, eps, repeat=2)
    assert model.sim_count == 5 * 3 * 2


def test_engine_call_counters():
    """Reference parity (``abstract_model.py::Simulatable`` counters): the
    engine counts likelihood element-evaluations host-side — one per
    (outcome, particle, experiment) — across update/batch/design calls;
    device code cannot mutate Python state, so the engine's host entry
    points do the bookkeeping."""
    u = q.SMCUpdater(q.SimplePrecessionModel(), 100,
                     q.UniformDistribution([[0.0, 1.0]]), seed=0)
    assert u.model.call_count == 0
    u.update(1, {"t": jnp.array([1.0])})
    assert u.model.call_count == 100
    u.batch_update(jnp.array([0, 1]), {"t": jnp.array([1.0, 2.0])})
    assert u.model.call_count == 300
    u.bayes_risk({"t": jnp.array([1.0, 2.0, 3.0])})   # 2 outcomes x 3 cands
    assert u.model.call_count == 300 + 2 * 100 * 3
    u.model.reset_counters()
    assert u.model.call_count == 0
