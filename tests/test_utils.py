"""Utility tests. Reference parity: ``src/qinfer/tests/test_utils.py``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qinfer_tpu.utils import (
    binomial_pdf,
    multinomial_pdf,
    sample_multinomial,
    particle_meanfn,
    particle_covariance_mtx,
    weighted_moments,
    n_ess,
    sqrtm_psd,
    in_ellipsoid,
    ellipsoid_volume,
    mvee,
    to_simplex,
    from_simplex,
    uniquify,
    format_uncertainty,
    compactspace,
    safe_shape,
    assert_sigfigs_equal,
)


def test_binomial_pdf_matches_scipy():
    from scipy.stats import binom

    N, n, p = 20, 7, 0.3
    assert np.isclose(float(binomial_pdf(N, n, p)), binom.pmf(n, N, p),
                      rtol=1e-5)


def test_binomial_pdf_broadcasts():
    out = binomial_pdf(10, jnp.arange(11), 0.5)
    assert out.shape == (11,)
    assert np.isclose(float(jnp.sum(out)), 1.0, atol=1e-5)


def test_multinomial_pdf():
    from scipy.stats import multinomial

    n = jnp.array([3, 2, 5])
    p = jnp.array([0.2, 0.3, 0.5])
    expect = multinomial.pmf(np.array([3, 2, 5]), 10, np.array([0.2, 0.3, 0.5]))
    assert np.isclose(float(multinomial_pdf(n, p)), expect, rtol=1e-5)


def test_sample_multinomial_counts(key):
    p = jnp.array([0.1, 0.2, 0.7])
    draws = sample_multinomial(key, 50, p, shape=(200,))
    assert draws.shape == (200, 3)
    assert np.all(np.asarray(draws).sum(axis=-1) == 50)
    freq = np.asarray(draws).mean(axis=0) / 50
    np.testing.assert_allclose(freq, np.asarray(p), atol=0.05)


def test_particle_moments(key):
    n, d = 5000, 3
    x = jax.random.normal(key, (n, d)) * jnp.array([1.0, 2.0, 0.5])
    w = jnp.full((n,), 1.0 / n)
    mu, cov = weighted_moments(w, x)
    np.testing.assert_allclose(np.asarray(mu), np.zeros(d), atol=0.1)
    np.testing.assert_allclose(np.diag(np.asarray(cov)),
                               [1.0, 4.0, 0.25], rtol=0.2)
    # consistency with the individual functions
    cov2 = particle_covariance_mtx(w, x)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov2), atol=1e-5)


def test_particle_meanfn(key):
    x = jax.random.uniform(key, (1000, 1))
    w = jnp.full((1000,), 1e-3)
    m = particle_meanfn(w, x, lambda xi: xi ** 2)
    assert np.isclose(float(m[0]), 1.0 / 3, atol=0.05)


def test_n_ess():
    w = jnp.array([0.5, 0.5, 0.0, 0.0])
    assert np.isclose(float(n_ess(w)), 2.0)


def test_sqrtm_psd():
    A = np.array([[4.0, 1.0], [1.0, 3.0]])
    S = np.asarray(sqrtm_psd(jnp.asarray(A)))
    np.testing.assert_allclose(S @ S, A, atol=1e-4)


def test_sqrtm_psd_singular():
    A = np.zeros((3, 3))
    S = np.asarray(sqrtm_psd(jnp.asarray(A)))
    assert np.all(np.isfinite(S))


def test_mvee_contains_points():
    rng = np.random.RandomState(1)
    pts = rng.randn(40, 2)
    A, c = mvee(pts, tol=1e-3)
    # all points inside (x-c)^T A (x-c) <= 1 (+tolerance)
    d = pts - c
    vals = np.einsum("ni,ij,nj->n", d, A, d)
    assert np.all(vals <= 1.0 + 5e-2)


def test_ellipsoid_volume_unit_ball():
    # volume of unit ball in 2D is pi
    assert np.isclose(ellipsoid_volume(A=np.eye(2)), np.pi, rtol=1e-6)


def test_in_ellipsoid():
    A = np.eye(2) * 4.0  # radius-2 ball
    c = np.zeros(2)
    pts = np.array([[0.0, 0.0], [1.9, 0.0], [2.1, 0.0]])
    np.testing.assert_array_equal(
        in_ellipsoid(pts, A, c), [True, True, False])


def test_simplex_roundtrip():
    y = jnp.array([[0.3, 0.6], [0.5, 0.5]])
    p = to_simplex(y)
    assert np.allclose(np.asarray(p).sum(axis=-1), 1.0, atol=1e-6)
    y2 = from_simplex(p)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_uniquify():
    assert uniquify([3, 1, 3, 2, 1]) == [3, 1, 2]


def test_format_uncertainty():
    s = format_uncertainty(0.12345, 0.002)
    assert "0.123" in s and "0.002" in s


def test_compactspace():
    xs = compactspace(1.0, 11)
    assert xs.shape == (11,)
    assert np.all(np.diff(xs) > 0)


def test_safe_shape():
    assert safe_shape(np.zeros((3, 4)), 1) == 4
    assert safe_shape(np.zeros(3), 1, default=7) == 7


def test_assert_sigfigs_equal():
    assert_sigfigs_equal(np.array([1.2345]), np.array([1.2349]), 3)
    with pytest.raises(AssertionError):
        assert_sigfigs_equal(np.array([1.23]), np.array([1.29]), 3)
