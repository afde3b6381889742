"""Unit tests for resample-move rejuvenation (qinfer_tpu.rejuvenation) and
the distribution log_pdf protocol it targets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

import qinfer_tpu as q
from qinfer_tpu.rejuvenation import (mcmc_rejuvenate, record_log_likelihood,
                                     resolve_prior_log_pdf)


# ---------------------------------------------------------------------------
# log_pdf protocol
# ---------------------------------------------------------------------------

def test_log_pdfs_match_scipy():
    x = np.linspace(0.05, 0.95, 7)
    cases = [
        (q.NormalDistribution(0.3, 0.04),
         st.norm(0.3, 0.2).logpdf(x)),
        (q.LogNormalDistribution(0.1, 0.5),
         st.lognorm(0.5, scale=np.exp(0.1)).logpdf(x)),
        (q.BetaDistribution(alpha=3.0, beta=2.0),
         st.beta(3.0, 2.0).logpdf(x)),
        (q.GammaDistribution(alpha=2.0, beta=4.0),
         st.gamma(2.0, scale=0.25).logpdf(x)),
    ]
    for dist, ref in cases:
        got = np.asarray(dist.log_pdf(x[:, None]))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    mvn = q.MultivariateNormalDistribution([0.1, -0.2],
                                           [[0.5, 0.1], [0.1, 0.3]])
    pts = np.random.default_rng(0).normal(size=(9, 2)).astype(np.float32)
    ref = st.multivariate_normal([0.1, -0.2],
                                 [[0.5, 0.1], [0.1, 0.3]]).logpdf(pts)
    np.testing.assert_allclose(np.asarray(mvn.log_pdf(pts)), ref,
                               rtol=1e-4, atol=1e-4)

    uni = q.UniformDistribution([[0.0, 2.0], [1.0, 3.0]])
    lp = np.asarray(uni.log_pdf(np.array([[1.0, 2.0], [1.0, 5.0]])))
    assert np.isclose(lp[0], -np.log(4.0))
    assert np.isneginf(lp[1])

    prod = q.ProductDistribution(q.NormalDistribution(0.0, 1.0),
                                 q.BetaDistribution(alpha=2.0, beta=2.0))
    pt = np.array([[0.5, 0.4]])
    ref = st.norm(0, 1).logpdf(0.5) + st.beta(2, 2).logpdf(0.4)
    np.testing.assert_allclose(np.asarray(prod.log_pdf(pt))[0], ref,
                               rtol=1e-4)


def test_flat_on_support_declarations():
    import qinfer_tpu.tomography as tomo

    b = tomo.pauli_basis(1)
    assert tomo.GinibreDistribution(b).is_flat_on_support
    assert not tomo.GinibreDistribution(b, rank=1).is_flat_on_support
    b2 = tomo.pauli_basis(2)
    assert tomo.BCSZChoiDistribution(b2).is_flat_on_support
    # resolution: flat prior yields a zero log-density
    fn = resolve_prior_log_pdf(tomo.GinibreDistribution(b))
    out = fn(jnp.zeros((5, 3)))
    assert out.shape == (5,) and bool(jnp.all(out == 0))
    with pytest.raises(ValueError):
        resolve_prior_log_pdf(q.ParticleDistribution(jnp.zeros((4, 1)),
                                                     jnp.ones(4) / 4))


# ---------------------------------------------------------------------------
# MH kernel correctness
# ---------------------------------------------------------------------------

def _coin_record(n_zeros, n_ones):
    outcomes = jnp.asarray([0] * n_zeros + [1] * n_ones, jnp.int32)
    T = n_zeros + n_ones
    eps = {"exp_num": jnp.zeros((T,), jnp.int32)}
    return outcomes, eps, jnp.ones((T,), bool)


def test_mcmc_converges_to_analytic_posterior():
    """Coin posterior is conjugate: uniform prior + 14 heads / 6 tails →
    Beta(15, 7). Starting from PRIOR samples, the move kernel alone must
    converge to the analytic posterior (this is the invariant-distribution
    property that makes resample-move correct)."""
    model = q.CoinModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    outcomes, eps, mask = _coin_record(14, 6)
    n = 4096
    x0 = prior.sample(jax.random.key(0), n)
    x, acc = jax.jit(mcmc_rejuvenate, static_argnames=("n_moves",))(
        model, prior, jax.random.key(1), x0, outcomes, eps, mask,
        n_moves=40)
    x = np.asarray(x)[:, 0]
    ref = st.beta(15, 7)
    # MC error of the mean at n=4096 with autocorrelated chains: be loose
    assert abs(x.mean() - ref.mean()) < 0.02
    assert abs(x.std() - ref.std()) < 0.02
    assert 0.05 < float(acc) < 0.9  # the chain genuinely mixes


def test_mcmc_preserves_exact_posterior():
    """Starting AT the target (exact Beta(15,7) samples), moves must leave
    the distribution invariant."""
    model = q.CoinModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    outcomes, eps, mask = _coin_record(14, 6)
    n = 4096
    x0 = jnp.asarray(st.beta(15, 7).rvs((n, 1),
                                        random_state=3).astype(np.float32))
    x, _ = jax.jit(mcmc_rejuvenate, static_argnames=("n_moves",))(
        model, prior, jax.random.key(2), x0, outcomes, eps, mask,
        n_moves=20)
    x = np.asarray(x)[:, 0]
    ref = st.beta(15, 7)
    assert abs(x.mean() - ref.mean()) < 0.015
    assert abs(x.std() - ref.std()) < 0.015


def test_record_log_likelihood_masks_and_sums():
    model = q.CoinModel()
    outcomes, eps, _ = _coin_record(3, 2)
    locs = jnp.asarray([[0.25], [0.5]])
    mask = jnp.asarray([True, True, True, False, False])
    ll = np.asarray(record_log_likelihood(model, locs, outcomes, eps, mask))
    np.testing.assert_allclose(ll, [3 * np.log(0.25), 3 * np.log(0.5)],
                               rtol=1e-5)


def test_rejuvenated_updater_matches_conjugate_posterior():
    """End-to-end: BinomialModel(CoinModel) batch with rejuvenation lands
    on the conjugate Beta posterior."""
    model = q.BinomialModel(q.CoinModel(), n_meas_max=20)
    prior = q.UniformDistribution([[0.0, 1.0]])
    # 5 experiments × 20 flips at p(heads=outcome 0)=0.7: feed fixed counts
    counts = jnp.asarray([14, 15, 13, 14, 14], jnp.int32)
    eps = {"exp_num": jnp.zeros((5,), jnp.int32),
           "n_meas": jnp.full((5,), 20, jnp.int32)}
    # likelihood: pr0 = p, outcome counts the 0s -> Beta(1+70, 1+30)
    u = q.SMCUpdater(model, 4000, prior, seed=5, n_mcmc_moves=5,
                     resample_thresh=0.9)  # force resamples -> moves run
    u.batch_update(counts, eps, resample_interval=1)
    ref = st.beta(71, 31)
    assert abs(float(u.est_mean()[0]) - ref.mean()) < 0.02
    assert abs(float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
               - ref.std()) < 0.015


# ---------------------------------------------------------------------------
# Waste-free resample-move (Dau & Chopin) — round 4
# ---------------------------------------------------------------------------

def test_waste_free_recovers_conjugate_posterior():
    """CoinModel + binomial record has a Beta(1+s, 1+f) conjugate
    posterior: waste-free resample-move from a reweighted prior ensemble
    must land on it (mean/std), with every chain state kept (shape n) and
    uniform output weights."""
    import scipy.stats as st
    from qinfer_tpu.rejuvenation import waste_free_rejuvenate_binomial

    model = q.BinomialModel(q.CoinModel(), n_meas_max=20)
    prior = q.UniformDistribution([[0.0, 1.0]])
    n = 4096
    key = jax.random.key(0)
    x = prior.sample(key, n)
    # observed: 70 successes / 100 trials over one repeated experiment
    succ = jnp.asarray([70.0])
    trials = jnp.asarray([100.0])
    pool_eps = {"exp_num": jnp.zeros((1,), jnp.int32)}

    # importance-reweight the prior ensemble toward the posterior first
    # (waste-free replaces the RESAMPLE: it expects meaningful weights)
    from qinfer_tpu.rejuvenation import binomial_record_log_likelihood
    ll = binomial_record_log_likelihood(q.CoinModel(), x, succ, trials,
                                        pool_eps)
    w = jax.nn.softmax(ll)

    w2, x2, acc = waste_free_rejuvenate_binomial(
        model, prior, jax.random.key(7), w, x, succ, trials, pool_eps,
        n_stages=8)
    assert x2.shape == (n, 1)
    np.testing.assert_allclose(np.asarray(w2), 1.0 / n)
    assert 0.05 < float(acc) < 0.95

    ref = st.beta(71, 31)
    xs = np.asarray(x2)[:, 0]
    assert abs(xs.mean() - ref.mean()) < 0.01
    assert abs(xs.std() - ref.std()) < 0.012


def test_waste_free_validates_inputs():
    from qinfer_tpu.rejuvenation import waste_free_rejuvenate_binomial

    model = q.BinomialModel(q.CoinModel(), n_meas_max=4)
    prior = q.UniformDistribution([[0.0, 1.0]])
    x = prior.sample(jax.random.key(0), 100)
    w = jnp.full((100,), 0.01)
    with pytest.raises(ValueError, match="divide"):
        waste_free_rejuvenate_binomial(
            model, prior, jax.random.key(1), w, x,
            jnp.asarray([1.0]), jnp.asarray([4.0]),
            {"exp_num": jnp.zeros((1,), jnp.int32)}, n_stages=3)


def test_updater_waste_free_engine_paths():
    """SMCUpdater(waste_free_stages=P): the waste-free kernel replaces the
    Liu-West resample on BOTH engine paths and recovers the conjugate
    Beta posterior."""
    import scipy.stats as st

    model = q.BinomialModel(q.CoinModel(), n_meas_max=20)
    prior = q.UniformDistribution([[0.0, 1.0]])
    counts = jnp.asarray([14, 15, 13, 14, 14], jnp.int32)
    eps = {"exp_num": jnp.zeros((5,), jnp.int32),
           "n_meas": jnp.full((5,), 20, jnp.int32)}

    for batch in (True, False):
        u = q.SMCUpdater(model, 4096, prior, seed=5,
                         compress_mcmc_record=True, waste_free_stages=8,
                         resample_thresh=0.9, zero_weight_policy="reset")
        if batch:
            u.batch_update(counts, eps, resample_interval=1)
        else:
            for i in range(5):
                u.update(int(counts[i]),
                         {"exp_num": eps["exp_num"][i:i + 1],
                          "n_meas": eps["n_meas"][i:i + 1]})
        ref = st.beta(71, 31)
        assert int(u.resample_count) >= 1
        assert abs(float(u.est_mean()[0]) - ref.mean()) < 0.02, batch
        assert abs(float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
                   - ref.std()) < 0.015, batch


def test_updater_waste_free_validation():
    prior = q.UniformDistribution([[0.0, 1.0]])
    model = q.BinomialModel(q.CoinModel(), n_meas_max=4)
    with pytest.raises(ValueError, match="compress_mcmc_record"):
        q.SMCUpdater(model, 64, prior, waste_free_stages=8)
    with pytest.raises(ValueError, match="divide"):
        q.SMCUpdater(model, 100, prior, compress_mcmc_record=True,
                     waste_free_stages=8)
    with pytest.raises(ValueError, match="zero_weight_policy"):
        q.SMCUpdater(model, 64, prior, compress_mcmc_record=True,
                     waste_free_stages=8, zero_weight_policy="error")


# ---------------------------------------------------------------------------
# Round-5 waste-free intermediate kernels (pCN / LW-seeded ancestors)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kernel,lw_seed", [("pcn", None), ("rwm", 0.98),
                                            ("pcn", 0.98)])
def test_waste_free_variants_recover_conjugate_posterior(kernel, lw_seed):
    """pCN chains and LW-seeded ancestors must preserve the conjugate
    Beta(71, 31) target exactly like the round-4 random-walk kernel."""
    import scipy.stats as st
    from qinfer_tpu.rejuvenation import (binomial_record_log_likelihood,
                                         waste_free_rejuvenate_binomial)

    model = q.BinomialModel(q.CoinModel(), n_meas_max=20)
    prior = q.UniformDistribution([[0.0, 1.0]])
    n = 4096
    x = prior.sample(jax.random.key(0), n)
    succ = jnp.asarray([70.0])
    trials = jnp.asarray([100.0])
    pool_eps = {"exp_num": jnp.zeros((1,), jnp.int32)}
    ll = binomial_record_log_likelihood(q.CoinModel(), x, succ, trials,
                                        pool_eps)
    w = jax.nn.softmax(ll)
    w2, x2, acc = waste_free_rejuvenate_binomial(
        model, prior, jax.random.key(7), w, x, succ, trials, pool_eps,
        n_stages=8, kernel=kernel, lw_seed_a=lw_seed, beta=0.5)
    assert x2.shape == (n, 1)
    assert 0.05 < float(acc) < 0.995
    ref = st.beta(71, 31)
    xs = np.asarray(x2)[:, 0]
    assert abs(xs.mean() - ref.mean()) < 0.012, (kernel, lw_seed)
    assert abs(xs.std() - ref.std()) < 0.012, (kernel, lw_seed)


def test_waste_free_kernel_validation():
    from qinfer_tpu.rejuvenation import waste_free_rejuvenate_binomial

    model = q.BinomialModel(q.CoinModel(), n_meas_max=4)
    prior = q.UniformDistribution([[0.0, 1.0]])
    x = prior.sample(jax.random.key(0), 64)
    with pytest.raises(ValueError, match="kernel"):
        waste_free_rejuvenate_binomial(
            model, prior, jax.random.key(1), jnp.full((64,), 1 / 64.0),
            x, jnp.asarray([1.0]), jnp.asarray([4.0]),
            {"exp_num": jnp.zeros((1,), jnp.int32)}, n_stages=8,
            kernel="hmc")
    with pytest.raises(ValueError, match="waste_free_kernel"):
        q.SMCUpdater(model, 64, prior, compress_mcmc_record=True,
                     waste_free_stages=8, waste_free_kernel="hmc",
                     zero_weight_policy="reset")


def test_updater_waste_free_pcn_engine_path():
    """Engine integration: waste_free_kernel='pcn' + LW seeding through
    the scanned batch path recovers the conjugate posterior."""
    import scipy.stats as st

    model = q.BinomialModel(q.CoinModel(), n_meas_max=20)
    prior = q.UniformDistribution([[0.0, 1.0]])
    counts = jnp.asarray([14, 15, 13, 14, 14], jnp.int32)
    eps = {"exp_num": jnp.zeros((5,), jnp.int32),
           "n_meas": jnp.full((5,), 20, jnp.int32)}
    u = q.SMCUpdater(model, 4096, prior, seed=5,
                     compress_mcmc_record=True, waste_free_stages=8,
                     waste_free_kernel="pcn", waste_free_lw_seed=0.98,
                     waste_free_beta=0.5,
                     resample_thresh=0.9, zero_weight_policy="reset")
    u.batch_update(counts, eps, resample_interval=1)
    ref = st.beta(71, 31)
    assert int(u.resample_count) >= 1
    assert abs(float(u.est_mean()[0]) - ref.mean()) < 0.02
    assert abs(float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
               - ref.std()) < 0.015
