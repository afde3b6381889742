"""Pallas kernel tests (interpret mode on CPU; identical code path compiles
on TPU).

Reference parity: the correctness check the reference applies to
``gpu_models.py::AcceleratedPrecessionModel`` — kernel output must equal the
plain NumPy/XLA likelihood.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qinfer_tpu as q
from qinfer_tpu.ops import (
    fused_precession_update,
    precession_pr0,
    systematic_resample_indices,
    AcceleratedPrecessionModel,
)
from qinfer_tpu.ops.resample import ancestor_multiplicities


def test_precession_pr0_matches_xla(key):
    omega = jax.random.uniform(key, (4096,))
    t = 3.7
    got = np.asarray(precession_pr0(omega, t))
    want = np.cos(np.asarray(omega) * t / 2) ** 2
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_update_matches_engine_math(key):
    n = 4096
    k1, k2 = jax.random.split(key)
    omega = jax.random.uniform(k1, (n,))
    w = jax.random.uniform(k2, (n,))
    w = w / w.sum()
    t, outcome = 2.5, 0

    new_w, norm, ess, mean = fused_precession_update(omega, w, t, outcome)

    pr0 = jnp.cos(omega * t / 2) ** 2
    hyp = w * pr0
    norm_ref = jnp.sum(hyp)
    w_ref = hyp / norm_ref
    np.testing.assert_allclose(np.asarray(new_w), np.asarray(w_ref),
                               atol=1e-6)
    assert np.isclose(float(norm), float(norm_ref), rtol=1e-5)
    assert np.isclose(float(ess),
                      float(1.0 / jnp.sum(w_ref ** 2)), rtol=1e-4)
    assert np.isclose(float(mean), float(w_ref @ omega), rtol=1e-4)


def test_fused_update_outcome_one(key):
    n = 2048
    omega = jax.random.uniform(key, (n,))
    w = jnp.full((n,), 1.0 / n)
    new_w, norm, ess, mean = fused_precession_update(omega, w, 1.0, 1)
    pr1 = 1 - jnp.cos(omega / 2) ** 2
    ref = (w * pr1) / jnp.sum(w * pr1)
    np.testing.assert_allclose(np.asarray(new_w), np.asarray(ref), atol=1e-6)


def test_fused_update_rejects_unaligned():
    with pytest.raises(ValueError):
        fused_precession_update(jnp.ones(100), jnp.ones(100) / 100, 1.0, 0)


def test_accelerated_model_matches_plain(key):
    acc = AcceleratedPrecessionModel()
    plain = q.SimplePrecessionModel()
    mps = jax.random.uniform(key, (2048, 1))
    eps = {"t": jnp.array([1.0, 4.0])}
    La = np.asarray(acc.likelihood(jnp.array([0, 1]), mps, eps))
    Lp = np.asarray(plain.likelihood(jnp.array([0, 1]), mps, eps))
    np.testing.assert_allclose(La, Lp, atol=1e-6)


def test_accelerated_model_unaligned_fallback(key):
    acc = AcceleratedPrecessionModel()
    mps = jax.random.uniform(key, (100, 1))
    L = acc.likelihood(jnp.array([0, 1]), mps, {"t": jnp.array([1.0])})
    assert L.shape == (2, 100, 1)


def test_accelerated_model_in_smc_loop():
    acc = AcceleratedPrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdater(acc, 2048, prior, seed=0)
    key = jax.random.key(3)
    for k in range(30):
        t = (9 / 8) ** k / 10
        key, sk = jax.random.split(key)
        o = acc.simulate_experiment(sk, jnp.array([[0.7]]),
                                    {"t": jnp.array([t])})
        u.update(o, {"t": jnp.array([t])})
    std = float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
    assert abs(float(u.est_mean()[0]) - 0.7) < 6 * std + 0.02


def test_ancestor_multiplicities_sum(key):
    w = jax.random.uniform(key, (1000,))
    w = w / w.sum()
    m = ancestor_multiplicities(w, 0.37)
    assert int(m.sum()) == 1000
    assert int(m.min()) >= 0


def test_systematic_resample_indices_unbiased(key):
    w = jnp.array([0.1, 0.2, 0.3, 0.4])
    idx = systematic_resample_indices(key, jnp.tile(w / 4, 4))
    assert idx.shape == (16,)
    # indices sorted and within range
    idx_np = np.asarray(idx)
    assert np.all(np.diff(idx_np) >= 0)
    assert idx_np.min() >= 0 and idx_np.max() < 16

    # unbiasedness: counts proportional to weights over many draws
    w2 = jnp.array([0.05, 0.15, 0.5, 0.3])
    total = np.zeros(4)
    for s in range(200):
        idx = systematic_resample_indices(jax.random.key(s), w2)
        total += np.bincount(np.asarray(idx), minlength=4)
    np.testing.assert_allclose(total / total.sum(), np.asarray(w2),
                               atol=0.01)


def test_systematic_variance_below_multinomial(key):
    """Systematic resampling must have (much) lower multiplicity variance
    than multinomial for the same weights."""
    from qinfer_tpu.resamplers import multinomial_ancestors

    w = jax.random.dirichlet(key, jnp.ones(256))
    sys_counts, mult_counts = [], []
    for s in range(100):
        ks = jax.random.key(1000 + s)
        sys_counts.append(np.bincount(
            np.asarray(systematic_resample_indices(ks, w)), minlength=256))
        mult_counts.append(np.bincount(
            np.asarray(multinomial_ancestors(ks, w)), minlength=256))
    var_sys = np.stack(sys_counts).var(axis=0).mean()
    var_mult = np.stack(mult_counts).var(axis=0).mean()
    assert var_sys < 0.5 * var_mult


def test_fused_reweight_hook_in_engine():
    """The SMC engine must route through AcceleratedPrecessionModel's
    fused_reweight hook and produce the same posterior as the plain
    likelihood path (outcomes identical; only kernel fusion differs)."""
    acc = AcceleratedPrecessionModel()
    plain = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    ua = q.SMCUpdater(acc, 2048, prior, seed=0)
    up = q.SMCUpdater(plain, 2048, prior, seed=0)
    key = jax.random.key(2)
    for k in range(12):
        t = (9 / 8) ** k / 5
        key, sk = jax.random.split(key)
        o = plain.simulate_experiment(sk, jnp.array([[0.6]]),
                                      {"t": jnp.array([t])})
        ua.update(o, {"t": jnp.array([t])}, check_for_resample=False)
        up.update(o, {"t": jnp.array([t])}, check_for_resample=False)
    np.testing.assert_allclose(np.asarray(ua.particle_weights),
                               np.asarray(up.particle_weights), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ua.normalization_record),
        np.asarray(up.normalization_record), rtol=1e-4)


def test_fused_reweight_hook_unaligned_fallback():
    acc = AcceleratedPrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdater(acc, 1000, prior, seed=0)  # not tile-aligned
    u.update(0, {"t": jnp.array([1.0])})
    assert np.isfinite(float(u.est_mean()[0]))
