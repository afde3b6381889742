"""Regression tests for the round-2 tree-wide review findings."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qinfer_tpu as q


def test_wrapper_chain_keeps_log_likelihood():
    """RandomWalkModel(BinomialModel(...)) must keep the stable log-space
    weight update: the delegating wrapper previously hid the underlying
    log_likelihood from the engine, so 10^4-shot outcomes underflowed the
    linear f32 path into a spurious ZeroWeightError."""
    from qinfer_tpu.smc import _has_log_likelihood

    inner = q.BinomialModel(q.SimplePrecessionModel(), n_meas_max=10000)
    walk = q.RandomWalkModel(inner, q.NormalDistribution(0.0, 1e-8))
    assert _has_log_likelihood(inner)
    assert _has_log_likelihood(walk)

    u = q.SMCUpdater(walk, 500, q.UniformDistribution([[0.0, 1.0]]),
                     seed=0)
    eps = {"t": jnp.array([20.0], jnp.float32),
           "n_meas": jnp.array([10000], jnp.int32)}
    u.update(jnp.asarray(5321), eps)   # far tail for most particles
    assert np.isfinite(float(u.est_mean()[0]))

    # transforming wrappers must NOT blindly advertise the underlying form
    poisoned = q.PoisonedModel(inner, tol=0.01)
    assert not _has_log_likelihood(poisoned)
    # MLE anneals the log form when the underlying provides one
    mle = q.MLEModel(inner, likelihood_power=4.0)
    assert _has_log_likelihood(mle)
    mle_plain = q.MLEModel(q.SimplePrecessionModel(), likelihood_power=4.0)
    assert not _has_log_likelihood(mle_plain)


def test_rescaled_distance_dimensionless():
    """Uniform weights must leave distances unchanged (the old formula
    used w_i ** w_j and shrank everything by n^2, merging every cloud
    into one DBSCAN cluster at large n)."""
    from qinfer_tpu.metrics import rescaled_distance_mtx

    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 2))
    w = np.full(200, 1.0 / 200)
    from scipy.spatial.distance import pdist, squareform

    base = squareform(pdist(x))
    np.testing.assert_allclose(
        rescaled_distance_mtx(w, x), base, rtol=1e-10)
    # heavier pair -> closer
    w2 = w.copy(); w2[0] = w2[1] = 0.1; w2 /= w2.sum()
    d2 = rescaled_distance_mtx(w2, x)
    assert d2[0, 1] < base[0, 1]


def test_ale_design_scores_get_fresh_noise():
    """bayes_risk on a Monte-Carlo-likelihood model must not freeze one
    noise realization into the compiled scorer."""
    model = q.ALEApproximateModel(q.CoinModel(), error_tol=0.2,
                                  min_samp=8, samp_step=8)
    u = q.SMCUpdater(model, 64, q.UniformDistribution([[0.2, 0.8]]),
                     seed=0)
    eps = {"exp_num": jnp.array([0])}
    scores = {float(np.asarray(u.bayes_risk(eps))[0]) for _ in range(6)}
    assert len(scores) > 1, "design scores identical across calls"


def test_batch_update_commits_prefix_on_zero_weight():
    """batch_update with zero_weight_policy='error' must behave like the
    sequential API: commit the good prefix, stop at the failing step."""
    m = q.BinomialModel(q.CoinModel(), n_meas_max=5)
    u = q.SMCUpdater(m, 50, q.ConstantDistribution([1.0]),
                     zero_weight_policy="error")
    outs = jnp.array([5, 5, 0, 5])   # step 2 impossible under p=1
    eps = {"exp_num": jnp.zeros(4, jnp.int32),
           "n_meas": jnp.full((4,), 5, jnp.int32)}
    with pytest.raises(q.ZeroWeightError):
        u.batch_update(outs, eps)
    # the two good updates before the failure are committed
    assert len(u.data_record) == 2
    assert len(u.normalization_record) == 2


def test_cluster_metrics_counts_noise_particles():
    rng = np.random.default_rng(1)
    # two tight clusters + scattered noise
    x = np.concatenate([rng.normal(0, 0.01, (40, 2)),
                        rng.normal(5, 0.01, (40, 2)),
                        rng.uniform(-20, 20, (20, 2))])
    w = np.full(100, 0.01)
    u = q.SMCUpdater(q.SimplePrecessionModel(), 100,
                     q.UniformDistribution([[0.0, 1.0]]), seed=0)
    from qinfer_tpu.smc import SMCState
    u._state = SMCState.initial(jnp.asarray(x, jnp.float32),
                                jax.random.key(0))
    metrics = u.est_cluster_metrics({"eps": 0.5, "min_particles": 5})
    assert metrics["n_clusters"] == 2
    assert metrics["n_noise"] >= 10          # counted, not an indicator
    assert 0.7 < metrics["weight_in_clusters"] <= 1.0


def test_plot_covariance_accepts_index_lists():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = q.BinomialModel(q.RandomizedBenchmarkingModel(), n_meas_max=8)
    u = q.SMCUpdater(m, 200, q.UniformDistribution(
        [[0.6, 0.99], [0.2, 0.4], [0.4, 0.5]]), seed=0)
    im = u.plot_covariance(param_slice=[0, 2])
    assert im.get_array().shape == (2, 2)
    plt.close("all")
    im2 = u.plot_covariance(param_slice=slice(0, 2))
    assert im2.get_array().shape == (2, 2)
    plt.close("all")
