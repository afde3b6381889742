"""Regression tests for the round-5 advisor findings (ADVICE r4):

* ``update(check_for_resample=False)`` must suppress the waste-free
  resample-move exactly like it suppresses the Liu-West resample
  (reference parity: ``smc.py::SMCUpdater.update`` semantics);
* ``batch_update(resample_interval=0)`` means NEVER check — including in
  waste-free mode (the 0-means-never convention documented on
  ``resample_interval_gate``);
* compressed-record sufficient statistics accumulate in int32 on device
  (f32 silently saturates at 2^24), with a loud overflow guard at 2^30;
* waste-free resample events feed the engine's resampling diagnostics
  (``track_resampling_divergence`` / ``debug_resampling``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qinfer_tpu as q


def _wf_updater(n=512, stages=8, **kwargs):
    """A coin-flip updater whose ESS collapses fast (tight posterior,
    broad prior) so the waste-free gate WOULD fire if checked."""
    model = q.BinomialModel(q.CoinModel(), n_meas_max=50)
    prior = q.UniformDistribution([[0.0, 1.0]])
    kwargs.setdefault("zero_weight_policy", "reset")
    return q.SMCUpdater(model, n, prior, seed=11,
                        compress_mcmc_record=True,
                        waste_free_stages=stages,
                        resample_thresh=0.9, **kwargs), model


def _eps(i=0, n_meas=50):
    return {"exp_num": jnp.zeros((1,), jnp.int32),
            "n_meas": jnp.full((1,), n_meas, jnp.int32)}


def test_update_check_for_resample_false_suppresses_waste_free():
    """With check_for_resample=False, no waste-free resample-move may
    fire no matter how far the ESS collapses (ADVICE r4 medium)."""
    u, _ = _wf_updater()
    for k in [35, 36, 34, 35]:
        u.update(k, _eps(), check_for_resample=False)
    assert int(u.resample_count) == 0
    assert float(u.n_ess) < 0.9 * u.n_particles  # the gate WOULD fire

    # sanity: the same record with the default check DOES waste-free
    u2, _ = _wf_updater()
    for k in [35, 36, 34, 35]:
        u2.update(k, _eps())
    assert int(u2.resample_count) >= 1


def test_batch_update_interval_zero_never_waste_frees():
    """resample_interval=0 is the documented NEVER-check convention for
    batch_update; the waste-free kernel obeys it too (ADVICE r4 low)."""
    u, _ = _wf_updater()
    counts = jnp.asarray([35, 36, 34, 35, 33, 36], jnp.int32)
    eps = {"exp_num": jnp.zeros((6,), jnp.int32),
           "n_meas": jnp.full((6,), 50, jnp.int32)}
    u.batch_update(counts, eps, resample_interval=0)
    assert int(u.resample_count) == 0
    assert float(u.n_ess) < 0.9 * u.n_particles

    u2, _ = _wf_updater()
    u2.batch_update(counts, eps, resample_interval=1)
    assert int(u2.resample_count) >= 1


def test_pool_arrays_are_int32_and_exact_past_2_24():
    """Device-side sufficient statistics must survive totals past the f32
    integer ceiling 2^24 = 16_777_216 (ADVICE r4 low: f32 .at[].add
    silently stops counting there)."""
    u, _ = _wf_updater()
    u.update(35, _eps())
    # simulate a long-horizon record: bump the host totals past 2^24
    big = float(2 ** 24 + 3)
    u._pool_succ[0] = big
    u._pool_trials[0] = big + 7.0
    _, succ, trials = u._pool_arrays()
    assert succ.dtype == jnp.int32
    assert trials.dtype == jnp.int32
    assert int(succ[0]) == 2 ** 24 + 3          # f32 would round to 2^24+4
    assert int(trials[0]) == 2 ** 24 + 10

    # loud guard long before int32 could overflow
    u._pool_trials[0] = float(2 ** 30 + 1)
    with pytest.raises(OverflowError, match="2\\^30"):
        u._pool_arrays()


def test_batch_scan_accumulates_int32():
    """The scanned batch path carries the totals as int32 (exact), and the
    compressed update still matches the full-record posterior."""
    u, _ = _wf_updater()
    counts = jnp.asarray([35, 36, 34], jnp.int32)
    eps = {"exp_num": jnp.zeros((3,), jnp.int32),
           "n_meas": jnp.full((3,), 50, jnp.int32)}
    u.batch_update(counts, eps, resample_interval=1)
    _, succ, trials = u._pool_arrays()
    assert succ.dtype == jnp.int32
    assert int(trials[0]) == 150
    assert int(succ[0]) == 35 + 36 + 34


def test_waste_free_feeds_resampling_diagnostics():
    """track_resampling_divergence must record one KL entry per waste-free
    resample event (ADVICE r4 low: the diagnostics hook previously saw
    just_resampled=False and skipped them)."""
    u, _ = _wf_updater(track_resampling_divergence=True)
    for k in [35, 36, 34, 35]:
        u.update(k, _eps())
    n_events = int(u.resample_count)
    assert n_events >= 1
    assert len(u.resampling_divergences) == n_events
    assert all(np.isfinite(d) for d in u.resampling_divergences)
