"""Approximate likelihood estimation (ALE).

Reference parity: ``src/qinfer/ale.py`` (SURVEY.md §2 #12) —
``ALEApproximateModel(simulator, error_tol, min_samp, samp_step, est_hedge,
adapt_hedge)`` wrapping a :class:`~qinfer_tpu.abstract_model.Simulatable`
that has no analytic likelihood, plus the hedged-beta estimator helpers
``binom_est_p`` / ``binom_est_error``.

TPU-native stance: instead of the reference's host loop that keeps adding
``samp_step`` simulations until the standard error drops below tolerance,
the sample budget here is resolved to a **static** count
``n = clamp(ceil(hedge-budget for error_tol), min_samp, max_samp)`` so the
whole estimate is one fixed-shape batched simulation under jit. A host-side
``ApproximationWarning`` fires when ``max_samp`` cannot reach the requested
tolerance (the reference warns in the same situation).
"""

from __future__ import annotations

import math
import warnings

import jax
import jax.numpy as jnp

from ._exceptions import ApproximationWarning
from .abstract_model import FiniteOutcomeModel, n_expparams

__all__ = ["ALEApproximateModel", "binom_est_p", "binom_est_error"]


def binom_est_p(n, N, hedge=0.0):
    """Hedged estimate of a binomial parameter: ``(n + h) / (N + 2h)``.

    Reference parity: ``src/qinfer/ale.py::binom_est_p``.
    """
    return (n + hedge) / (N + 2 * hedge)


def binom_est_error(p, N, hedge=0.0):
    """Standard error of the hedged binomial estimate.

    Reference parity: ``src/qinfer/ale.py::binom_est_error``.
    """
    return jnp.sqrt(p * (1 - p) / (N + 2 * hedge + 1))


class ALEApproximateModel(FiniteOutcomeModel):
    """Estimate likelihoods of a likelihood-free simulator by repeated
    simulation with a hedged beta estimator.

    Reference parity: ``src/qinfer/ale.py::ALEApproximateModel``.

    :param simulator: a :class:`Simulatable` with finite outcomes.
    :param float error_tol: target standard error of the estimate.
    :param int min_samp: minimum simulations per (model, experiment).
    :param int samp_step: granularity used to round the sample budget.
    :param float est_hedge: hedging for the returned estimate.
    :param float adapt_hedge: hedging used when sizing the sample budget.
    :param int max_samp: static cap on simulations (TPU fixed-shape budget).
    """

    #: The engine threads a fresh per-step PRNG key into ``likelihood`` so
    #: the Monte-Carlo estimate is re-drawn on every (scanned) update.
    wants_likelihood_key = True

    def __init__(self, simulator, error_tol=1e-2, min_samp=1,
                 samp_step=10, est_hedge=0.509, adapt_hedge=0.509,
                 max_samp=None):
        super().__init__()
        if error_tol <= 0 or error_tol > 1:
            raise ValueError("error_tol must be in (0, 1]")
        self.simulator = simulator
        self.error_tol = float(error_tol)
        self.min_samp = int(min_samp)
        self.samp_step = int(samp_step)
        self.est_hedge = float(est_hedge)
        self.adapt_hedge = float(adapt_hedge)
        # worst-case p = 1/2: err ≈ sqrt(0.25 / (N + 2h + 1)) ≤ tol
        needed = 0.25 / (self.error_tol ** 2) - 2 * self.adapt_hedge - 1
        needed = max(self.min_samp, int(math.ceil(
            max(needed, 1) / self.samp_step) * self.samp_step))
        self.n_samples = int(min(needed, max_samp) if max_samp else needed)
        if max_samp is not None and needed > max_samp:
            warnings.warn(
                f"ALE sample cap {max_samp} cannot reach error_tol="
                f"{self.error_tol}; worst-case std-err is "
                f"{0.5 / math.sqrt(max_samp):.3g}", ApproximationWarning)

    # -- delegation --------------------------------------------------------
    @property
    def n_modelparams(self):
        return self.simulator.n_modelparams

    @property
    def modelparam_names(self):
        return self.simulator.modelparam_names

    @property
    def expparams_dtype(self):
        return self.simulator.expparams_dtype

    def n_outcomes(self, expparams=None):
        return self.simulator.n_outcomes(expparams)

    def domain(self, expparams=None):
        return self.simulator.domain(expparams)

    def are_models_valid(self, modelparams):
        return self.simulator.are_models_valid(modelparams)

    def canonicalize(self, modelparams):
        return self.simulator.canonicalize(modelparams)

    def simulate_experiment(self, key, modelparams, expparams, repeat=1):
        return self.simulator.simulate_experiment(
            key, modelparams, expparams, repeat=repeat)

    # -- the approximation -------------------------------------------------

    def likelihood(self, outcomes, modelparams, expparams, key=None):
        """Monte-Carlo likelihood: simulate ``n_samples`` outcomes per
        (model, experiment) cell and return hedged frequency estimates for
        each requested outcome.
        """
        self._bump("_call_count")
        if key is None:
            key = jax.random.key(self._fresh_seed())
        modelparams = jnp.atleast_2d(modelparams)
        eps = self.canonicalize_expparams(expparams)
        outcomes = jnp.atleast_1d(outcomes)
        sims = self.simulator.simulate_experiment(
            key, modelparams, eps, repeat=self.n_samples
        )  # (n_samples, n_m, n_e); repeat==1 comes back squeezed
        if self.n_samples == 1:
            sims = sims[None]
        counts = jnp.sum(
            sims[None, :, :, :] == outcomes[:, None, None, None], axis=1
        )  # (n_out, n_m, n_e)
        return binom_est_p(counts.astype(jnp.float32), self.n_samples,
                           self.est_hedge)

    def _fresh_seed(self):
        self._bump("_seed_counter")
        return getattr(self, "_seed_counter", 0)
