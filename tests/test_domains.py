"""Domain tests. Reference parity: ``src/qinfer/tests/test_domains.py``."""

import numpy as np
import jax.numpy as jnp
import pytest

from qinfer_tpu.domains import RealDomain, IntegerDomain, MultinomialDomain


def test_real_domain():
    d = RealDomain(0.0, 1.0)
    assert d.is_continuous and not d.is_finite
    ok = np.asarray(d.in_domain(jnp.array([-0.1, 0.0, 0.5, 1.0, 1.1])))
    np.testing.assert_array_equal(ok, [False, True, True, True, False])


def test_real_domain_unbounded():
    d = RealDomain()
    assert bool(np.all(np.asarray(d.in_domain(jnp.array([-1e9, 0.0, 1e9])))))


def test_integer_domain():
    d = IntegerDomain(0, 5)
    assert d.is_finite and d.n_members == 6
    np.testing.assert_array_equal(np.asarray(d.values), np.arange(6))
    ok = np.asarray(d.in_domain(jnp.array([0, 3, 5, 6, -1])))
    np.testing.assert_array_equal(ok, [True, True, True, False, False])


def test_integer_domain_infinite():
    d = IntegerDomain(0, None)
    assert not d.is_finite
    with pytest.raises(ValueError):
        d.values


def test_multinomial_domain():
    d = MultinomialDomain(n_meas=3, n_elements=2)
    assert d.n_members == 4
    vals = np.asarray(d.values)
    assert vals.shape == (4, 2)
    assert np.all(vals.sum(axis=1) == 3)
    ok = np.asarray(d.in_domain(jnp.array([[2, 1], [3, 1], [-1, 4]])))
    np.testing.assert_array_equal(ok, [True, False, False])


def test_multinomial_regular_array_roundtrip():
    d = MultinomialDomain(n_meas=4, n_elements=3)
    vals = d.values
    flat = d.to_regular_array(vals)
    back = d.from_regular_array(flat)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(back))
