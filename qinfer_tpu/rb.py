"""Randomized benchmarking models.

Reference parity: ``src/qinfer/rb.py`` (SURVEY.md §2 #10) —
``RandomizedBenchmarkingModel(interleaved, order)`` with survival
probability ``Pr(0 | p, A, B; m) = A p^m + B`` (0th order), the interleaved
variant over ``(p̃, p_ref, A, B)``, and the fidelity conversion helpers
(average gate fidelity ``F = (d-1) p / d + 1/d``... expressed per-qubit as
``F = 1 - (1-p)/2`` for d=2).
"""

from __future__ import annotations

import jax.numpy as jnp

from .abstract_model import DifferentiableModel, FiniteOutcomeModel

__all__ = ["RandomizedBenchmarkingModel", "p_to_F", "F_to_p"]


def p_to_F(p, d=2):
    """Average gate fidelity from an RB decay parameter:
    ``F = (d-1) p / d + 1/d``.

    Reference parity: the fidelity conversion helper in ``src/qinfer/rb.py``.
    """
    return (d - 1.0) * p / d + 1.0 / d


def F_to_p(F, d=2):
    """Inverse of :func:`p_to_F`."""
    return (d * F - 1.0) / (d - 1.0)


class RandomizedBenchmarkingModel(DifferentiableModel, FiniteOutcomeModel):
    """Zeroth-order randomized benchmarking.

    Reference parity: ``src/qinfer/rb.py::RandomizedBenchmarkingModel`` —
    model parameters ``(p, A, B)`` (interleaved: ``(p̃, p_ref, A, B)``),
    expparams ``[('m', uint)]`` (+ ``reference`` flag when interleaved),
    survival probability ``A p^m + B``, validity constraints ``0 ≤ p ≤ 1``,
    ``A, B ≥ 0``, ``A + B ≤ 1``.
    """

    def __init__(self, interleaved=False, order=0):
        super().__init__()
        if order != 0:
            raise NotImplementedError(
                "only 0th-order RB is supported (matching the reference)")
        self.interleaved = bool(interleaved)
        self.order = int(order)

    @property
    def n_modelparams(self):
        return 4 if self.interleaved else 3

    @property
    def modelparam_names(self):
        if self.interleaved:
            return ["p_tilde", "p_ref", "A", "B"]
        return ["p", "A", "B"]

    @property
    def expparams_dtype(self):
        if self.interleaved:
            return [("m", "int32"), ("reference", "int32")]
        return [("m", "int32")]

    def n_outcomes(self, expparams=None):
        return 2

    def are_models_valid(self, modelparams):
        modelparams = jnp.atleast_2d(modelparams)
        if self.interleaved:
            p_t, p_r, A, B = (modelparams[:, i] for i in range(4))
            p_ok = ((p_t >= 0) & (p_t <= 1)) & ((p_r >= 0) & (p_r <= 1))
        else:
            p, A, B = (modelparams[:, i] for i in range(3))
            p_ok = (p >= 0) & (p <= 1)
            p_t = p
        return (p_ok & (A >= 0) & (B >= 0)
                & (modelparams[:, -2] + modelparams[:, -1] <= 1))

    def likelihood(self, outcomes, modelparams, expparams):
        self._bump("_call_count")
        modelparams = jnp.atleast_2d(modelparams)
        eps = self.canonicalize_expparams(expparams)
        m = jnp.asarray(eps["m"]).astype(modelparams.dtype)
        if self.interleaved:
            ref = jnp.asarray(eps["reference"]).astype(bool)
            p_tilde = modelparams[:, 0:1]
            p_ref = modelparams[:, 1:2]
            A = modelparams[:, 2:3]
            B = modelparams[:, 3:4]
            p = jnp.where(ref[None, :], p_ref, p_tilde)
        else:
            p = modelparams[:, 0:1]
            A = modelparams[:, 1:2]
            B = modelparams[:, 2:3]
        pr0 = A * p ** m[None, :] + B
        pr0 = jnp.clip(pr0, 0.0, 1.0)
        return self.pr0_to_likelihood_array(outcomes, pr0)
