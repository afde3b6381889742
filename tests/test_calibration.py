"""Posterior calibration: credible intervals must cover the truth at their
nominal rate.

The strongest correctness evidence an SMC engine can produce (beyond
point-estimate convergence): over many independent trials with true
parameters drawn from the prior, the q-credible interval must contain the
truth in ≈ q of trials, and the posterior-CDF value of the truth (PIT)
must be uniform. Uses the trial-parallel compiled harness.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qinfer_tpu as q
from qinfer_tpu.perf_testing import perf_test_scan_batch


@pytest.fixture(scope="module")
def trials():
    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    rec = perf_test_scan_batch(model, 1024, prior, 40, n_trials=48, seed=7)
    return rec


def _pit_values(rec):
    """Posterior CDF evaluated at the truth, per trial (weighted particle
    CDF)."""
    w = np.asarray(rec["final_weights"])     # (T, n)
    x = np.asarray(rec["final_locations"])[:, :, 0]  # (T, n)
    true = np.asarray(rec["true_mps"])[:, 0]  # (T,)
    pits = []
    for t in range(w.shape[0]):
        pits.append(w[t][x[t] <= true[t]].sum())
    return np.asarray(pits)


def test_interval_coverage(trials):
    """Central q-credible intervals cover the truth ≈ q of the time."""
    pit = _pit_values(trials)
    n = len(pit)
    for level in (0.5, 0.8, 0.95):
        lo = (1 - level) / 2
        covered = np.mean((pit >= lo) & (pit <= 1 - lo))
        # binomial 3-sigma band around the nominal level
        sigma = np.sqrt(level * (1 - level) / n)
        assert abs(covered - level) < 3.5 * sigma + 0.05, (
            f"coverage {covered:.3f} at nominal {level}")


def test_pit_uniformity(trials):
    """PIT values are U(0,1) for a calibrated posterior (KS test)."""
    from scipy.stats import kstest

    pit = _pit_values(trials)
    stat, pvalue = kstest(pit, "uniform")
    assert pvalue > 1e-3, f"PIT not uniform: KS p={pvalue:.2g}"


def test_losses_decrease(trials):
    loss = np.asarray(trials["loss"])
    assert np.median(loss[:, -1]) < np.median(loss[:, 0]) / 100
