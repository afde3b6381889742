"""Sufficient-statistic rejuvenation records (VERDICT r3 #5).

For records of Bernoulli bits / binomial counts over a finite experiment
pool, the record log-likelihood collapses EXACTLY to per-candidate
success/trial totals (the binomial coefficients are θ-independent, so they
cancel in every Metropolis ratio). These tests pin:

* the algebraic identity (full-record vs compressed log-likelihood differ
  by a per-particle CONSTANT);
* chain equivalence of ``mcmc_rejuvenate`` vs ``mcmc_rejuvenate_binomial``
  under the same key;
* ``SMCUpdater(compress_mcmc_record=True)`` on both the sequential and the
  scanned ``batch_update`` path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qinfer_tpu as q
from qinfer_tpu.rejuvenation import (
    record_log_likelihood, binomial_record_log_likelihood,
    mcmc_rejuvenate, mcmc_rejuvenate_binomial)


def _binomial_setup(T=24, n=256, n_meas=16, seed=0):
    """A BinomialModel precession record drawn from a 4-candidate pool."""
    two = q.SimplePrecessionModel()
    model = q.BinomialModel(two, n_meas_max=n_meas)
    prior = q.UniformDistribution([[0.0, 1.0]])
    pool_t = np.asarray([0.5, 1.7, 3.1, 6.4], np.float32)

    rng = np.random.default_rng(seed)
    c_idx = rng.integers(0, 4, size=T)
    eps_rec = {"t": jnp.asarray(pool_t[c_idx]),
               "n_meas": jnp.full((T,), n_meas, jnp.int32)}
    outs = np.asarray(model.simulate_experiment(
        jax.random.key(seed + 1), jnp.array([[0.43]]),
        {"t": eps_rec["t"], "n_meas": eps_rec["n_meas"]}))[0]
    outcomes = jnp.asarray(outs, jnp.int32)

    succ = np.zeros(4, np.float32)
    trials = np.zeros(4, np.float32)
    for k in range(T):
        succ[c_idx[k]] += float(outs[k])
        trials[c_idx[k]] += n_meas
    pool_eps = {"t": jnp.asarray(pool_t)}
    locations = prior.sample(jax.random.key(seed + 2), n)
    return (model, two, prior, locations, outcomes, eps_rec,
            jnp.asarray(succ), jnp.asarray(trials), pool_eps)


def test_compressed_ll_differs_by_constant():
    """Full-record vs sufficient-statistic log-likelihood: the difference
    must be the SAME for every particle (the summed log-binomial
    coefficients), so every MH ratio is identical.

    The identity holds wherever neither path saturates its numerical
    floor — the two paths clamp impossible states differently (the full
    record floors per STEP at ~-85, the compressed path clips p₀), but
    both only engage at per-step log-likelihoods < -85, i.e. states with
    e^-85 posterior mass that no chain occupies. The test restricts to
    particles whose every record step stays above the floor."""
    (model, two, prior, x, outcomes, eps_rec, succ, trials,
     pool_eps) = _binomial_setup()
    mask = jnp.ones(outcomes.shape[0], bool)
    full = np.asarray(record_log_likelihood(model, x, outcomes, eps_rec,
                                            mask), np.float64)
    comp = np.asarray(binomial_record_log_likelihood(
        two, x, succ, trials, pool_eps), np.float64)
    # per-step log-likelihood matrix (T, n) to locate floored particles
    per_step = np.stack([
        np.asarray(model.log_likelihood(
            outcomes[k][None], x,
            {"t": eps_rec["t"][k:k + 1],
             "n_meas": eps_rec["n_meas"][k:k + 1]}))[0, :, 0]
        for k in range(int(outcomes.shape[0]))])
    ok = np.all(per_step > -80.0, axis=0)
    assert np.sum(ok) > 100  # the bulk of the prior ensemble
    diff = (full - comp)[ok]
    assert np.std(diff) < 1e-3
    # and the constant really is the log-binomial-coefficient sum
    from scipy.special import gammaln
    outs = np.asarray(outcomes, np.float64)
    m = np.asarray(eps_rec["n_meas"], np.float64)
    const = np.sum(gammaln(m + 1) - gammaln(outs + 1)
                   - gammaln(m - outs + 1))
    np.testing.assert_allclose(np.mean(diff), const, rtol=1e-3, atol=0.05)


def test_zero_trial_padding_contributes_nothing():
    """Padding rows with succ = trials = 0 must contribute exactly 0."""
    (model, two, prior, x, outcomes, eps_rec, succ, trials,
     pool_eps) = _binomial_setup()
    base = binomial_record_log_likelihood(two, x, succ, trials, pool_eps)
    pad_eps = {"t": jnp.concatenate([pool_eps["t"],
                                     jnp.zeros((4,), jnp.float32)])}
    pad_s = jnp.concatenate([succ, jnp.zeros(4)])
    pad_t = jnp.concatenate([trials, jnp.zeros(4)])
    padded = binomial_record_log_likelihood(two, x, pad_s, pad_t, pad_eps)
    # zero-trial rows contribute exactly 0; the only allowed deviation is
    # reduction-order ulp drift from the longer contraction
    np.testing.assert_allclose(np.asarray(base), np.asarray(padded),
                               rtol=1e-6, atol=1e-3)


def test_mh_chain_equivalence():
    """Same key, same target (up to a constant) ⇒ same chain, modulo
    float-boundary accept flips (none observed at this size)."""
    (model, two, prior, x, outcomes, eps_rec, succ, trials,
     pool_eps) = _binomial_setup()
    mask = jnp.ones(outcomes.shape[0], bool)
    key = jax.random.key(99)
    x_full, acc_full = mcmc_rejuvenate(
        model, prior, key, x, outcomes, eps_rec, mask, 4)
    x_comp, acc_comp = mcmc_rejuvenate_binomial(
        model, prior, key, x, succ, trials, pool_eps, 4)
    assert abs(float(acc_full) - float(acc_comp)) < 0.02
    match = np.mean(np.all(np.isclose(np.asarray(x_full),
                                      np.asarray(x_comp), atol=1e-5),
                           axis=1))
    assert match > 0.99


def test_rejects_unsuitable_models():
    multi = q.MultinomialModel(q.NDieModel(3), n_meas_max=8)
    prior = q.UniformDistribution([[0.0, 1.0]] * 2)
    with pytest.raises(ValueError, match="two-outcome"):
        q.SMCUpdater(multi, 64, prior, n_mcmc_moves=2,
                     compress_mcmc_record=True)
    with pytest.raises(ValueError, match="n_mcmc_moves"):
        q.SMCUpdater(q.SimplePrecessionModel(), 64,
                     q.UniformDistribution([[0.0, 1.0]]),
                     compress_mcmc_record=True)


def _run_updater(compress, batch, n_meas=12, T=20, n=512):
    two = q.SimplePrecessionModel()
    model = q.BinomialModel(two, n_meas_max=n_meas)
    prior = q.UniformDistribution([[0.0, 1.0]])
    pool_t = np.asarray([0.5, 1.7, 3.1, 6.4], np.float32)
    rng = np.random.default_rng(5)
    ts = pool_t[rng.integers(0, 4, size=T)]
    eps = {"t": jnp.asarray(ts),
           "n_meas": jnp.full((T,), n_meas, jnp.int32)}
    outs = np.asarray(model.simulate_experiment(
        jax.random.key(6), jnp.array([[0.43]]), eps))[0]
    u = q.SMCUpdater(model, n, prior, seed=7, n_mcmc_moves=3,
                     compress_mcmc_record=compress,
                     zero_weight_policy="reset")
    if batch:
        u.batch_update(jnp.asarray(outs), eps, resample_interval=3)
    else:
        for i in range(T):
            u.update(int(outs[i]), {"t": eps["t"][i:i + 1],
                                    "n_meas": eps["n_meas"][i:i + 1]})
    return u


@pytest.mark.parametrize("batch", [False, True])
def test_updater_compressed_record_matches_full(batch):
    """compress_mcmc_record=True must land on the same posterior as the
    full-record path (identical target; same key stream) and must have
    deduplicated the pool to the 4 distinct experiments."""
    u_full = _run_updater(compress=False, batch=batch)
    u_comp = _run_updater(compress=True, batch=batch)
    assert len(u_comp._pool_eps) == 4
    assert sum(u_comp._pool_trials) == 20 * 12
    m_full = float(u_full.est_mean()[0])
    m_comp = float(u_comp.est_mean()[0])
    sd = float(jnp.sqrt(u_full.est_covariance_mtx()[0, 0]))
    assert abs(m_full - m_comp) < 5 * sd
    assert abs(m_comp - 0.43) < 6 * sd


def test_rejuvenate_no_canonicalize_stays_valid():
    """canonicalize=False must still return only validity-gated locations
    (accepted proposals passed are_models_valid; rejected keep originals)
    and match the canonicalized chain wherever projection is a no-op."""
    import qinfer_tpu.tomography as tomo
    from qinfer_tpu.rejuvenation import mcmc_rejuvenate_binomial

    b = tomo.pauli_basis(1)
    model = tomo.TomographyModel(b)
    prior = tomo.GinibreDistribution(b)
    x = model.canonicalize(prior.sample(jax.random.key(0), 512))
    eps_pool = {"meas": jnp.asarray(
        np.eye(4, dtype=np.float32) * np.sqrt(2))}
    succ = jnp.asarray([30.0, 10.0, 20.0, 5.0])
    trials = jnp.asarray([50.0, 50.0, 50.0, 50.0])

    key = jax.random.key(4)
    x_canon, acc1 = mcmc_rejuvenate_binomial(
        model, prior, key, x, succ, trials, eps_pool, 3)
    x_raw, acc2 = mcmc_rejuvenate_binomial(
        model, prior, key, x, succ, trials, eps_pool, 3,
        canonicalize=False)
    assert float(acc1) == float(acc2)  # identical chains pre-projection
    assert bool(np.all(np.asarray(model.are_models_valid(x_raw))))
    # projection only nudges marginal rows: small bounded difference
    assert float(jnp.max(jnp.abs(x_raw - x_canon))) < 5e-2


def test_updater_mcmc_canonicalize_flag():
    """SMCUpdater(mcmc_canonicalize=False) runs both engine paths and
    keeps a valid, converged posterior."""
    u = None
    two = q.SimplePrecessionModel()
    model = q.BinomialModel(two, n_meas_max=12)
    prior = q.UniformDistribution([[0.0, 1.0]])
    pool_t = np.asarray([0.5, 1.7, 3.1, 6.4], np.float32)
    rng = np.random.default_rng(5)
    ts = pool_t[rng.integers(0, 4, size=20)]
    eps = {"t": jnp.asarray(ts), "n_meas": jnp.full((20,), 12, jnp.int32)}
    outs = np.asarray(model.simulate_experiment(
        jax.random.key(6), jnp.array([[0.43]]), eps))[0]
    u = q.SMCUpdater(model, 512, prior, seed=7, n_mcmc_moves=3,
                     compress_mcmc_record=True, mcmc_canonicalize=False,
                     zero_weight_policy="reset")
    u.batch_update(jnp.asarray(outs[:12]), {k: v[:12] for k, v in
                                            eps.items()},
                   resample_interval=3)
    for i in range(12, 20):  # sequential path too
        u.update(int(outs[i]), {"t": eps["t"][i:i + 1],
                                "n_meas": eps["n_meas"][i:i + 1]})
    m = float(u.est_mean()[0])
    sd = float(np.sqrt(u.est_covariance_mtx()[0, 0]))
    assert abs(m - 0.43) < 6 * sd
    assert bool(np.all(np.asarray(
        model.are_models_valid(u.particle_locations))))


def test_boundary_particles_not_favored():
    """Round-4 review finding: an upper clip of p0 at 1-1e-7 floored an
    observed FAILURE's contribution at only ~-16 per trial (vs the
    full-record path's -85 per step), letting boundary particles whose
    f32 likelihood saturates to 1.0 be accepted with ~e^69 higher odds
    than the full-record target. The compressed record must score such
    states at least as low as the full record (up to the record
    constant)."""
    from scipy.special import gammaln

    two = q.SimplePrecessionModel()
    model = q.BinomialModel(two, n_meas_max=4)
    # t=3.0, outcome 3 of 4: a particle at omega ~ 0 has pr0 -> 1.0
    # exactly in f32 yet observed one failure
    eps_rec = {"t": jnp.asarray([3.0], jnp.float32),
               "n_meas": jnp.asarray([4], jnp.int32)}
    outcomes = jnp.asarray([3], jnp.int32)
    succ = jnp.asarray([3.0])
    trials = jnp.asarray([4.0])
    pool_eps = {"t": jnp.asarray([3.0], jnp.float32)}
    x = jnp.asarray([[1e-7], [0.43]])  # boundary particle + normal one

    full = np.asarray(record_log_likelihood(
        model, x, outcomes, eps_rec, jnp.ones(1, bool)), np.float64)
    comp = np.asarray(binomial_record_log_likelihood(
        two, x, succ, trials, pool_eps), np.float64)
    const = float(gammaln(5) - gammaln(4) - gammaln(2))  # log C(4,3)
    # normal particle: exact constant difference
    np.testing.assert_allclose(full[1] - comp[1], const, atol=1e-3)
    # boundary particle: the compressed score must never exceed the full
    # score by MORE than the record constant (pre-fix it exceeded it by
    # +69 nats, an e^69 acceptance bias toward the boundary)
    assert comp[0] - full[0] <= const + 1e-3, (full[0], comp[0])


def test_error_replay_rolls_back_phantom_pool_rows():
    """zero_weight_policy='error' + compress: pool rows registered for
    batch experiments that never commit must be rolled back (phantom
    zero-total rows would permanently inflate E and every later pool
    pass)."""
    from qinfer_tpu._exceptions import ZeroWeightError

    two = q.SimplePrecessionModel()
    model = q.BinomialModel(two, n_meas_max=8)
    prior = q.UniformDistribution([[0.0, 1.0]])
    # step 2 is impossible: t=0 makes Pr(outcome 0 | any omega) = 1
    # exactly, so observing 8 failures (count 0 is all-success; count 8
    # of underlying outcome 1... success:=outcome0 so counts=0 means all
    # failures) annihilates every weight
    ts = np.asarray([0.7, 1.9, 0.0, 3.7, 5.1], np.float32)
    outs = np.asarray([4, 5, 0, 3, 6], np.int64)
    eps = {"t": jnp.asarray(ts), "n_meas": jnp.full((5,), 8, jnp.int32)}
    u = q.SMCUpdater(model, 256, prior, seed=3, n_mcmc_moves=2,
                     compress_mcmc_record=True,
                     zero_weight_policy="error")
    with pytest.raises(ZeroWeightError):
        u.batch_update(jnp.asarray(outs), eps, resample_interval=2)
    # only the committed prefix's experiments remain in the pool
    assert len(u._pool_eps) == len(u._pool_succ) == len(u._pool_trials)
    assert len(u._pool_index) == len(u._pool_eps)
    committed = len(u.data_record)
    distinct_committed = len({float(ts[i]) for i in range(committed)})
    assert len(u._pool_eps) == distinct_committed
    assert sum(u._pool_trials) == committed * 8
