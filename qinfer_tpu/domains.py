"""Outcome domains.

Reference parity: ``src/qinfer/domains.py`` — ``Domain`` ABC with
``RealDomain``, ``IntegerDomain``, ``MultinomialDomain`` (SURVEY.md §2 #7).

TPU-native stance: domains describe *static* shape information (number of
possible outcomes, dtype) that the jit-compiled engine needs at trace time,
plus jittable membership tests. Finite domains expose a dense ``values``
array so outcome marginalization (``bayes_risk`` /
``expected_information_gain``) is a fixed-shape reduction.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ._pytree import Module

__all__ = [
    "Domain",
    "RealDomain",
    "IntegerDomain",
    "MultinomialDomain",
]


class Domain(Module):
    """Abstract base for outcome domains.

    Reference parity: ``src/qinfer/domains.py::Domain`` (``is_continuous``,
    ``is_finite``, ``dtype``, ``n_members``, ``example_point``, ``values``,
    ``in_domain``).
    """

    @property
    def is_continuous(self):
        raise NotImplementedError

    @property
    def is_finite(self):
        return not self.is_continuous

    @property
    def is_discrete(self):
        return not self.is_continuous

    @property
    def dtype(self):
        raise NotImplementedError

    @property
    def n_members(self):
        """Number of members for finite domains, else ``None``."""
        return None

    @property
    def example_point(self):
        raise NotImplementedError

    @property
    def values(self):
        """Dense array of all members (finite domains only)."""
        raise NotImplementedError

    def in_domain(self, points):
        """Elementwise membership test (jittable)."""
        raise NotImplementedError


class RealDomain(Domain):
    """A (possibly unbounded) real interval.

    Reference parity: ``src/qinfer/domains.py::RealDomain(min, max)``.
    """

    def __init__(self, min=None, max=None):
        self.min = min
        self.max = max

    @property
    def is_continuous(self):
        return True

    @property
    def dtype(self):
        return np.dtype(np.float32)

    @property
    def example_point(self):
        lo = self.min if self.min is not None else 0.0
        return np.array([lo], dtype=self.dtype)

    def in_domain(self, points):
        points = jnp.asarray(points)
        ok = jnp.ones(points.shape, dtype=bool)
        if self.min is not None:
            ok = ok & (points >= self.min)
        if self.max is not None:
            ok = ok & (points <= self.max)
        return ok


class IntegerDomain(Domain):
    """Consecutive integers ``min..max`` inclusive (either may be None for
    an unbounded side).

    Reference parity: ``src/qinfer/domains.py::IntegerDomain(min, max)``.
    """

    def __init__(self, min=0, max=None):
        self.min = min
        self.max = max

    @property
    def is_continuous(self):
        return False

    @property
    def is_finite(self):
        return self.min is not None and self.max is not None

    @property
    def dtype(self):
        return np.dtype(np.int32)

    @property
    def n_members(self):
        if not self.is_finite:
            return None
        return int(self.max - self.min + 1)

    @property
    def example_point(self):
        return np.array([self.min if self.min is not None else 0],
                        dtype=self.dtype)

    @property
    def values(self):
        if not self.is_finite:
            raise ValueError("values undefined for an infinite IntegerDomain")
        return np.arange(self.min, self.max + 1, dtype=self.dtype)

    def in_domain(self, points):
        points = jnp.asarray(points)
        ok = points == jnp.round(points).astype(points.dtype)
        if self.min is not None:
            ok = ok & (points >= self.min)
        if self.max is not None:
            ok = ok & (points <= self.max)
        return ok


class MultinomialDomain(Domain):
    """Vectors of ``n_elements`` non-negative integer counts summing to
    ``n_meas``.

    Reference parity: ``src/qinfer/domains.py::MultinomialDomain`` with its
    ``to_regular_array`` / ``from_regular_array`` helpers.
    """

    def __init__(self, n_meas, n_elements=2):
        self.n_meas = int(n_meas)
        self.n_elements = int(n_elements)

    @property
    def is_continuous(self):
        return False

    @property
    def dtype(self):
        return np.dtype(np.int32)

    @property
    def n_members(self):
        # compositions of n_meas into n_elements parts: C(n+k-1, k-1)
        from math import comb

        return comb(self.n_meas + self.n_elements - 1, self.n_elements - 1)

    @property
    def example_point(self):
        pt = np.zeros((1, self.n_elements), dtype=self.dtype)
        pt[0, 0] = self.n_meas
        return pt

    @property
    def values(self):
        """All count vectors, shape (n_members, n_elements)."""
        out = np.array(
            list(_compositions(self.n_meas, self.n_elements)),
            dtype=self.dtype,
        )
        return out

    def to_regular_array(self, A):
        """Flatten (..., n_elements) count vectors into a 2-D regular array.

        Reference parity: ``domains.py::MultinomialDomain.to_regular_array``.
        """
        A = np.asarray(A)
        return A.reshape(-1, self.n_elements)

    def from_regular_array(self, A):
        """Inverse of :meth:`to_regular_array`."""
        A = np.asarray(A)
        return A.reshape(A.shape[:-1] + (self.n_elements,))

    def in_domain(self, points):
        points = jnp.asarray(points)
        nonneg = jnp.all(points >= 0, axis=-1)
        total = jnp.sum(points, axis=-1) == self.n_meas
        return nonneg & total


def _compositions(n, k):
    """Yield all k-tuples of non-negative ints summing to n (lex order)."""
    if k == 1:
        yield (n,)
        return
    for head in range(n, -1, -1):
        for rest in _compositions(n - head, k - 1):
            yield (head,) + rest
