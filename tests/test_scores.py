"""Differentiable-model tests: autodiff scores and Fisher information.

Reference parity: ``abstract_model.py::DifferentiableModel.score`` /
``fisher_information`` and ``ScoreMixin`` finite differences.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import qinfer_tpu as q
from qinfer_tpu.abstract_model import ScoreMixin


def test_score_matches_analytic_precession():
    """d/dω log Pr(0) = -t tan(ωt/2)."""
    model = q.SimplePrecessionModel()
    omega, t = 0.5, 2.0
    s = model.score(jnp.array([0, 1]), jnp.array([[omega]]),
                    {"t": jnp.array([t])})
    assert s.shape == (1, 2, 1, 1)
    expect0 = -t * np.tan(omega * t / 2)
    expect1 = t / np.tan(omega * t / 2)
    assert np.isclose(float(s[0, 0, 0, 0]), expect0, rtol=1e-3)
    assert np.isclose(float(s[0, 1, 0, 0]), expect1, rtol=1e-3)


def test_score_mixin_matches_autodiff():
    class FDPrecession(ScoreMixin, q.SimplePrecessionModel):
        pass

    ad = q.SimplePrecessionModel()
    fd = FDPrecession()
    mps = jnp.array([[0.3], [0.7]])
    eps = {"t": jnp.array([1.5])}
    s_ad = np.asarray(ad.score(jnp.array([0, 1]), mps, eps))
    s_fd = np.asarray(fd.score(jnp.array([0, 1]), mps, eps))
    np.testing.assert_allclose(s_ad, s_fd, rtol=1e-2, atol=1e-3)


def test_fisher_information_precession():
    """For Pr(0)=cos²(ωt/2): F(ω; t) = t² (exact, independent of ω away
    from degeneracies)."""
    model = q.SimplePrecessionModel()
    for t in (0.7, 2.0):
        F = model.fisher_information(
            jnp.array([[0.5]]), {"t": jnp.array([t])})
        assert F.shape == (1, 1, 1, 1)
        assert np.isclose(float(F[0, 0, 0, 0]), t ** 2, rtol=1e-3)


def test_fisher_information_ramsey_psd():
    model = q.RamseyModel()
    F = model.fisher_information(
        jnp.array([[0.5, 0.05]]), {"t": jnp.array([3.0])})
    mat = np.asarray(F[:, :, 0, 0])
    evals = np.linalg.eigvalsh(mat)
    assert np.all(evals >= -1e-5)
