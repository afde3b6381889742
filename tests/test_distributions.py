"""Distribution tests: sample moments vs analytic values.

Reference parity: ``src/qinfer/tests/test_distributions.py`` (SURVEY.md §4:
"moments of sample(n) vs analytic mean/cov for every Distribution").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qinfer_tpu as q

N = 20_000


def draw(dist, key, n=N):
    s = np.asarray(dist.sample(key, n))
    assert s.shape == (n, dist.n_rvs)
    return s


def test_uniform(key):
    d = q.UniformDistribution([[0.0, 1.0], [-2.0, 2.0]])
    s = draw(d, key)
    np.testing.assert_allclose(s.mean(axis=0), [0.5, 0.0], atol=0.05)
    np.testing.assert_allclose(s.var(axis=0), [1 / 12, 16 / 12], rtol=0.1)
    assert s[:, 0].min() >= 0 and s[:, 0].max() <= 1


def test_uniform_single_range(key):
    d = q.UniformDistribution([0.0, 2.0])
    assert d.n_rvs == 1
    s = draw(d, key)
    assert np.isclose(s.mean(), 1.0, atol=0.05)


def test_constant(key):
    d = q.ConstantDistribution([1.5, -2.0])
    s = draw(d, key, 10)
    assert np.all(s == np.array([1.5, -2.0]))


def test_normal(key):
    d = q.NormalDistribution(mean=2.0, var=0.25)
    s = draw(d, key)
    assert np.isclose(s.mean(), 2.0, atol=0.02)
    assert np.isclose(s.var(), 0.25, rtol=0.05)


def test_truncated_normal(key):
    d = q.NormalDistribution(mean=0.0, var=1.0, trunc=(0.0, 1.0))
    s = draw(d, key)
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_multivariate_normal(key):
    cov = np.array([[1.0, 0.5], [0.5, 2.0]])
    d = q.MultivariateNormalDistribution([1.0, -1.0], cov)
    s = draw(d, key)
    np.testing.assert_allclose(s.mean(axis=0), [1.0, -1.0], atol=0.05)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.1)


def test_lognormal(key):
    d = q.LogNormalDistribution(mu=0.0, sigma=0.5)
    s = draw(d, key)
    assert np.isclose(s.mean(), np.exp(0.125), rtol=0.05)


def test_beta(key):
    d = q.BetaDistribution(alpha=2.0, beta=5.0)
    s = draw(d, key)
    assert np.isclose(s.mean(), 2 / 7, atol=0.01)
    d2 = q.BetaDistribution(mean=0.3, var=0.01)
    s2 = draw(d2, key)
    assert np.isclose(s2.mean(), 0.3, atol=0.01)
    assert np.isclose(s2.var(), 0.01, rtol=0.15)


def test_beta_binomial(key):
    d = q.BetaBinomialDistribution(10, alpha=1.0, beta=1.0)
    s = draw(d, key, 5000)
    assert s.min() >= 0 and s.max() <= 10
    assert np.isclose(s.mean(), 5.0, atol=0.2)


def test_gamma(key):
    d = q.GammaDistribution(alpha=3.0, beta=2.0)
    s = draw(d, key)
    assert np.isclose(s.mean(), 1.5, rtol=0.05)
    d2 = q.GammaDistribution(mean=4.0, var=2.0)
    s2 = draw(d2, key)
    assert np.isclose(s2.mean(), 4.0, rtol=0.05)
    assert np.isclose(s2.var(), 2.0, rtol=0.15)


def test_discrete_uniform(key):
    d = q.DiscreteUniformDistribution(3)
    s = draw(d, key, 4000)
    assert set(np.unique(s)).issubset(set(range(8)))
    assert np.isclose(s.mean(), 3.5, atol=0.15)


def test_mv_uniform_simplex(key):
    d = q.MVUniformDistribution(4)
    s = draw(d, key, 2000)
    np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-5)
    assert s.min() >= 0


def test_slanted_normal(key):
    d = q.SlantedNormalDistribution([[0.0, 1.0]], weight=0.05)
    s = draw(d, key)
    assert np.isclose(s.mean(), 0.5, atol=0.02)


def test_interpolated(key):
    # triangular pdf on [0, 1]
    d = q.InterpolatedUnivariateDistribution(
        lambda x: np.where((x >= 0) & (x <= 1), x, 0.0),
        compactification_scale=2.0)
    s = draw(d, key)
    assert np.isclose(s.mean(), 2 / 3, atol=0.02)


def test_product(key):
    d = q.ProductDistribution(
        q.NormalDistribution(0.0, 1.0),
        q.UniformDistribution([[5.0, 6.0]]))
    assert d.n_rvs == 2
    s = draw(d, key)
    assert np.isclose(s[:, 0].mean(), 0.0, atol=0.05)
    assert s[:, 1].min() >= 5.0


def test_mixture(key):
    d = q.MixtureDistribution(
        [0.3, 0.7],
        [q.NormalDistribution(-5.0, 0.01), q.NormalDistribution(5.0, 0.01)])
    s = draw(d, key)
    frac_high = (s > 0).mean()
    assert np.isclose(frac_high, 0.7, atol=0.02)
    assert np.isclose(s.mean(), 0.3 * -5 + 0.7 * 5, atol=0.1)


def test_mixture_from_class(key):
    d = q.MixtureDistribution(
        [0.5, 0.5], q.NormalDistribution,
        dist_args=[(0.0, 1.0), (10.0, 1.0)])
    s = draw(d, key)
    assert np.isclose(s.mean(), 5.0, atol=0.1)


def test_postselected(key):
    model = q.SimplePrecessionModel(min_freq=0.5)
    d = q.PostselectedDistribution(
        q.UniformDistribution([[0.0, 1.0]]), model, maxiters=50)
    s = draw(d, key, 2000)
    assert s.min() >= 0.5


def test_constrained_sum(key):
    d = q.ConstrainedSumDistribution(
        q.UniformDistribution([[0.0, 1.0]] * 3), desired_total=1.0)
    s = draw(d, key, 1000)
    np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-5)


def test_particle_distribution(key):
    locs = jnp.array([[0.0], [1.0], [2.0]])
    w = jnp.array([0.2, 0.5, 0.3])
    d = q.ParticleDistribution(locs, w)
    assert np.isclose(float(d.est_mean()[0]), 1.1)
    s = draw(d, key, 5000)
    assert np.isclose((s == 1.0).mean(), 0.5, atol=0.03)


def test_haar_uniform(key):
    d = q.HaarUniform()
    s = draw(d, key, 3000)
    norms = np.linalg.norm(s, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)  # pure states
    np.testing.assert_allclose(s.mean(axis=0), np.zeros(3), atol=0.05)


def test_ginibre_uniform(key):
    d = q.GinibreUniform(k=2)
    s = draw(d, key, 2000)
    norms = np.linalg.norm(s, axis=1)
    assert np.all(norms <= 1.0 + 1e-5)  # physical states
    assert norms.mean() < 0.9  # mixed on average


def test_hilbert_schmidt_uniform(key):
    d = q.HilbertSchmidtUniform()
    s = draw(d, key, 2000)
    assert np.all(np.linalg.norm(s, axis=1) <= 1.0 + 1e-5)


def test_postselected_raises_on_exhaustion(key):
    """Code-review regression: host-level sampling must RAISE (like the
    reference) when the validity region is essentially unreachable, not
    silently return invalid particles."""
    model = q.SimplePrecessionModel(min_freq=0.999999)
    d = q.PostselectedDistribution(
        q.UniformDistribution([[0.0, 1.0]]), model, maxiters=2)
    with pytest.raises(RuntimeError, match="still"):
        d.sample(key, 2000)


def test_haar_uniform_qutrit(key):
    """Generalized (Gell-Mann) Bloch coordinates for d=3 pure states:
    Tr(rho^2)=1 gives |n|^2 = 2(1 - 1/d) = 4/3."""
    d = q.HaarUniform(dim=3)
    assert d.n_rvs == 8
    s = draw(d, key, 2000)
    np.testing.assert_allclose(np.sum(s ** 2, axis=1), 4 / 3, atol=1e-4)
    np.testing.assert_allclose(s.mean(axis=0), np.zeros(8), atol=0.06)


def test_hilbert_schmidt_uniform_qutrit(key):
    """HS-random qutrits are mixed: Tr(rho^2) = |n|^2/2 + 1/d < 1."""
    d = q.HilbertSchmidtUniform(dim=3)
    s = draw(d, key, 2000)
    purity = np.sum(s ** 2, axis=1) / 2 + 1 / 3
    assert np.all(purity <= 1.0 + 1e-5)
    # HS measure on qutrits: E[Tr rho^2] = (2d)/(d^2+1) = 0.6
    assert np.isclose(purity.mean(), 0.6, atol=0.02)


def test_ginibre_rank1_is_pure(key):
    """Rank-1 Ginibre == Haar pure: purity 1 for any dim."""
    d = q.GinibreUniform(dim=4, k=1)
    assert d.n_rvs == 15
    s = draw(d, key, 500)
    purity = np.sum(s ** 2, axis=1) / 2 + 1 / 4
    np.testing.assert_allclose(purity, 1.0, atol=1e-4)
