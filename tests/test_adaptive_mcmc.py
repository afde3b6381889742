"""Adaptive rejuvenation kernels (round 5, VERDICT r4 #1): MALA proposals
and Robbins-Monro step-size adaptation.

The MH-invariance bar: starting AT the analytic conjugate posterior, the
kernel must leave it invariant; starting from the prior it must converge
to it. The adaptation bar: from a deliberately bad initial scale, the
Robbins-Monro recursion must drive acceptance into a band around the
method's optimal target."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

import qinfer_tpu as q
from qinfer_tpu.rejuvenation import (
    default_target_accept, initial_log_scale,
    mcmc_rejuvenate_adaptive_jit, mcmc_rejuvenate_binomial_adaptive_jit)


def _coin_record(n_zeros, n_ones):
    outcomes = jnp.asarray([0] * n_zeros + [1] * n_ones, jnp.int32)
    T = n_zeros + n_ones
    eps = {"exp_num": jnp.zeros((T,), jnp.int32)}
    return outcomes, eps, jnp.ones((T,), bool)


def test_defaults_and_validation():
    assert default_target_accept("mala") == 0.574
    assert default_target_accept("rwm") == 0.234
    with pytest.raises(ValueError):
        default_target_accept("hmc")
    with pytest.raises(ValueError):
        initial_log_scale(4, method="nuts")
    # RGG / MALA optimal-scaling inits
    assert np.isclose(initial_log_scale(4, "rwm"), np.log(2.38 / 2.0))
    assert np.isclose(initial_log_scale(64, "mala"),
                      np.log(1.65) - np.log(64) / 6)
    assert np.isclose(initial_log_scale(4, "rwm", proposal_scale=5.0),
                      np.log(5.0 / 2.0))


@pytest.mark.parametrize("method", ["mala", "rwm"])
def test_adaptive_converges_to_analytic_posterior(method):
    """Uniform prior + 14/6 coin record → Beta(15, 7); the adaptive move
    kernel alone, started from PRIOR samples, must land on it."""
    model = q.CoinModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    outcomes, eps, mask = _coin_record(14, 6)
    n = 4096
    x0 = prior.sample(jax.random.key(0), n)
    x, acc, ls, t = mcmc_rejuvenate_adaptive_jit(
        model, prior, jax.random.key(1), x0, outcomes, eps, mask,
        n_moves=60, log_scale=initial_log_scale(1, method), adapt_t=0,
        method=method)
    xs = np.asarray(x)[:, 0]
    ref = st.beta(15, 7)
    assert abs(xs.mean() - ref.mean()) < 0.02
    assert abs(xs.std() - ref.std()) < 0.02
    assert 0.05 < float(acc) < 0.95
    assert int(t) == 60


@pytest.mark.parametrize("method", ["mala", "rwm"])
def test_adaptive_preserves_exact_posterior(method):
    """Starting AT exact Beta(15,7) samples, adaptive moves must leave the
    distribution invariant (detailed balance incl. the truncated-drift
    MALA correction)."""
    model = q.CoinModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    outcomes, eps, mask = _coin_record(14, 6)
    n = 4096
    x0 = jnp.asarray(st.beta(15, 7).rvs(
        (n, 1), random_state=3).astype(np.float32))
    x, _, _, _ = mcmc_rejuvenate_adaptive_jit(
        model, prior, jax.random.key(2), x0, outcomes, eps, mask,
        n_moves=30, log_scale=initial_log_scale(1, method), adapt_t=0,
        method=method)
    xs = np.asarray(x)[:, 0]
    ref = st.beta(15, 7)
    assert abs(xs.mean() - ref.mean()) < 0.015
    assert abs(xs.std() - ref.std()) < 0.015


def test_binomial_adaptive_matches_full_record_target():
    """The compressed sufficient-statistic target recovers the same
    conjugate posterior (mean/std) as the full-record kernel."""
    bmodel = q.BinomialModel(q.CoinModel(), n_meas_max=20)
    prior = q.UniformDistribution([[0.0, 1.0]])
    succ = jnp.asarray([14], jnp.int32)
    trials = jnp.asarray([20], jnp.int32)
    pool = {"exp_num": jnp.zeros((1,), jnp.int32)}
    n = 4096
    x0 = prior.sample(jax.random.key(0), n)
    x, acc, _, _ = mcmc_rejuvenate_binomial_adaptive_jit(
        bmodel, prior, jax.random.key(1), x0, succ, trials, pool,
        n_moves=60, log_scale=initial_log_scale(1, "mala"), adapt_t=0,
        method="mala")
    xs = np.asarray(x)[:, 0]
    ref = st.beta(15, 7)
    assert abs(xs.mean() - ref.mean()) < 0.02
    assert abs(xs.std() - ref.std()) < 0.02


@pytest.mark.parametrize("method,ls0", [("rwm", 3.0), ("mala", -6.0)])
def test_robbins_monro_drives_acceptance_to_target(method, ls0):
    """From a deliberately bad initial scale (huge for RWM → acceptance
    ~0; tiny for MALA → acceptance ~1), adaptation must bring the NEXT
    call's acceptance into a band around the target."""
    bmodel = q.BinomialModel(q.CoinModel(), n_meas_max=20)
    prior = q.UniformDistribution([[0.0, 1.0]])
    succ = jnp.asarray([140], jnp.int32)
    trials = jnp.asarray([200], jnp.int32)
    pool = {"exp_num": jnp.zeros((1,), jnp.int32)}
    target = default_target_accept(method)
    n = 2048
    x0 = jnp.asarray(st.beta(141, 61).rvs(
        (n, 1), random_state=7).astype(np.float32))
    ls, t = jnp.float32(ls0), jnp.int32(0)
    x = x0
    accs = []
    for i in range(6):
        x, acc, ls, t = mcmc_rejuvenate_binomial_adaptive_jit(
            bmodel, prior, jax.random.fold_in(jax.random.key(3), i), x,
            succ, trials, pool, n_moves=40, log_scale=ls, adapt_t=t,
            method=method)
        accs.append(float(acc))
    # trailing call's mean acceptance lands near the optimum
    assert abs(accs[-1] - target) < 0.12, accs
    # and the adapted scale moved substantially off the bad init
    assert abs(float(ls) - ls0) > 0.5


def test_keyed_model_mala_raises():
    class Keyed(q.CoinModel):
        wants_likelihood_key = True

    prior = q.UniformDistribution([[0.0, 1.0]])
    outcomes, eps, mask = _coin_record(3, 2)
    with pytest.raises(ValueError, match="deterministic"):
        mcmc_rejuvenate_adaptive_jit(
            Keyed(), prior, jax.random.key(0),
            prior.sample(jax.random.key(1), 64), outcomes, eps, mask,
            n_moves=2, log_scale=0.0, adapt_t=0, method="mala")
    with pytest.raises(ValueError):
        q.SMCUpdater(Keyed(), 64, prior, n_mcmc_moves=2,
                     mcmc_method="mala")


def test_updater_adaptive_engine_paths():
    """End-to-end conjugate recovery through BOTH engine paths (scanned
    batch + sequential), with the Robbins-Monro state persisting across
    calls and through a checkpoint roundtrip."""
    from qinfer_tpu.checkpoint import load_updater, save_updater

    model = q.BinomialModel(q.CoinModel(), n_meas_max=20)
    prior = q.UniformDistribution([[0.0, 1.0]])
    counts = jnp.asarray([14, 15, 13, 14, 14], jnp.int32)
    eps = {"exp_num": jnp.zeros((5,), jnp.int32),
           "n_meas": jnp.full((5,), 20, jnp.int32)}
    ref = st.beta(71, 31)
    u = q.SMCUpdater(model, 4000, prior, seed=5, n_mcmc_moves=5,
                     resample_thresh=0.9, mcmc_method="mala",
                     mcmc_adapt=True, compress_mcmc_record=True)
    u.batch_update(counts, eps, resample_interval=1)
    assert abs(float(u.est_mean()[0]) - ref.mean()) < 0.02
    assert abs(float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
               - ref.std()) < 0.015
    assert u._mcmc_adapt_t > 0  # adaptation actually ran in-scan
    ls_after_batch = u._mcmc_log_scale
    assert ls_after_batch != u._mcmc_log_scale0

    # sequential path continues adapting from the batch's state: force a
    # resample-move event and check the acceptance record grew and the
    # sweep counter advanced past the batch's value
    t_after_batch = u._mcmc_adapt_t
    n_acc = len(u.mcmc_acceptance_record)
    u.resample()  # manual resample fires _rejuvenate_now
    assert len(u.mcmc_acceptance_record) == n_acc + 1
    assert u._mcmc_adapt_t == t_after_batch + u.n_mcmc_moves

    save_updater("/tmp/test_adaptive_ck", u)
    u2 = q.SMCUpdater(model, 4000, prior, seed=5, n_mcmc_moves=5,
                      resample_thresh=0.9, mcmc_method="mala",
                      mcmc_adapt=True, compress_mcmc_record=True)
    load_updater("/tmp/test_adaptive_ck", u2)
    assert u2._mcmc_log_scale == u._mcmc_log_scale
    assert u2._mcmc_adapt_t == u._mcmc_adapt_t


def test_adaptive_full_record_engine_path():
    """Adaptive kernel on the UNcompressed record path (Bernoulli
    two-outcome record carried in full) through batch_update."""
    model = q.CoinModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    outcomes = jnp.asarray([0] * 14 + [1] * 6, jnp.int32)
    eps = {"exp_num": jnp.zeros((20,), jnp.int32)}
    u = q.SMCUpdater(model, 4000, prior, seed=2, n_mcmc_moves=5,
                     resample_thresh=0.9, mcmc_method="mala",
                     mcmc_adapt=True)
    u.batch_update(outcomes, eps, resample_interval=1)
    ref = st.beta(15, 7)
    assert abs(float(u.est_mean()[0]) - ref.mean()) < 0.03
    assert u._mcmc_adapt_t > 0


def test_adaptive_waste_free_combination_raises():
    prior = q.UniformDistribution([[0.0, 1.0]])
    with pytest.raises(ValueError, match="waste-free"):
        q.SMCUpdater(q.CoinModel(), 100, prior, waste_free_stages=10,
                     compress_mcmc_record=True, mcmc_adapt=True,
                     zero_weight_policy="reset")


def test_legacy_checkpoint_does_not_clobber_seeded_scale():
    """Restoring a fixed-kernel (non-adaptive) checkpoint into an
    adaptive updater must keep the target's seeded initial_log_scale —
    the source never adapted, so its stored 0.0 placeholder is not
    adaptation state (round-5 review fix)."""
    from qinfer_tpu.checkpoint import load_updater, save_updater

    model = q.BinomialModel(q.CoinModel(), n_meas_max=20)
    prior = q.UniformDistribution([[0.0, 1.0]])
    legacy = q.SMCUpdater(model, 256, prior, seed=1, n_mcmc_moves=2,
                          compress_mcmc_record=True)
    legacy.update(jnp.asarray(14), {"exp_num": jnp.zeros((1,), jnp.int32),
                                    "n_meas": jnp.full((1,), 20,
                                                       jnp.int32)})
    save_updater("/tmp/test_legacy_ck", legacy)
    target = q.SMCUpdater(model, 256, prior, seed=2, n_mcmc_moves=2,
                          compress_mcmc_record=True, mcmc_method="mala",
                          mcmc_adapt=True)
    seeded = target._mcmc_log_scale
    assert seeded != 0.0
    load_updater("/tmp/test_legacy_ck", target)
    assert target._mcmc_log_scale == seeded
    assert target._mcmc_adapt_t == 0
