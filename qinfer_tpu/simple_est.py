"""Simplified estimation façade — data in, estimate out.

Reference parity: ``src/qinfer/simple_est.py`` (SURVEY.md §2 #16) —
``simple_est_prec`` / ``simple_est_rb`` one-liners and the shared
``load_data`` coercion helper (ndarray / CSV path / file-like / DataFrame).
"""

from __future__ import annotations

import io

import numpy as np
import jax.numpy as jnp

from .distributions import UniformDistribution, PostselectedDistribution
from .derived_models import BinomialModel
from .test_models import SimplePrecessionModel
from .rb import RandomizedBenchmarkingModel
from .smc import SMCUpdater

__all__ = ["simple_est_prec", "simple_est_rb", "load_data"]


def load_data(data, n_cols=3):
    """Coerce user data to a float ndarray with ``n_cols`` columns.

    Accepts a 2-D array-like, a CSV path or file-like object, or a pandas
    DataFrame. Reference parity: the ``load_data`` helper used by
    ``src/qinfer/simple_est.py``.
    """
    try:
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            data = data.to_numpy()
    except ImportError:  # pragma: no cover
        pass
    if isinstance(data, (str, io.IOBase)) or hasattr(data, "read"):
        data = np.loadtxt(data, delimiter=",", skiprows=0, ndmin=2)
    data = np.asarray(data, dtype=np.float64)
    if data.ndim != 2 or data.shape[1] != n_cols:
        raise ValueError(
            f"expected data with {n_cols} columns, got shape {data.shape}")
    return data


def _finish(updater, return_all):
    mean = np.asarray(updater.est_mean())
    cov = np.asarray(updater.est_covariance_mtx())
    if return_all:
        return mean, cov, {"updater": updater}
    return mean, cov


def simple_est_prec(data, freq_min=0.0, freq_max=1.0, n_particles=6000,
                    return_all=False, n_meas_max=None, seed=0):
    """One-line frequency estimation from precession count data.

    Reference parity: ``src/qinfer/simple_est.py::simple_est_prec`` — data
    columns are ``(counts, t, n_shots)``; builds
    ``BinomialModel(SimplePrecessionModel())`` with a uniform frequency
    prior, batch-updates, and returns ``(mean, cov)`` (or ``(..., extra)``).
    """
    data = load_data(data)
    counts = data[:, 0].astype(np.int64)
    ts = data[:, 1]
    n_shots = data[:, 2].astype(np.int64)

    cap = int(n_meas_max if n_meas_max is not None else n_shots.max())
    model = BinomialModel(SimplePrecessionModel(min_freq=freq_min),
                          n_meas_max=cap)
    prior = UniformDistribution([[freq_min, freq_max]])
    updater = SMCUpdater(model, n_particles, prior, seed=seed)
    eps = {"t": jnp.asarray(ts, dtype=jnp.float32),
           "n_meas": jnp.asarray(n_shots, dtype=jnp.int32)}
    updater.batch_update(jnp.asarray(counts, dtype=jnp.int32), eps)
    return _finish(updater, return_all)


def simple_est_rb(data, interleaved=False, p_min=0.0, p_max=1.0,
                  n_particles=8000, return_all=False, n_meas_max=None,
                  seed=0):
    """One-line randomized-benchmarking estimation from count data.

    Reference parity: ``src/qinfer/simple_est.py::simple_est_rb`` — data
    columns are ``(counts, m, n_shots)`` (interleaved: plus a ``reference``
    0/1 column); estimates the posterior over ``(p, A, B)``.
    """
    data = load_data(data, n_cols=4 if interleaved else 3)
    counts = data[:, 0].astype(np.int64)
    ms = data[:, 1].astype(np.int64)
    n_shots = data[:, 2].astype(np.int64)

    cap = int(n_meas_max if n_meas_max is not None else n_shots.max())
    rb = RandomizedBenchmarkingModel(interleaved=interleaved)
    model = BinomialModel(rb, n_meas_max=cap)
    if interleaved:
        prior = PostselectedDistribution(
            UniformDistribution(
                [[p_min, p_max], [p_min, p_max], [0.0, 1.0], [0.0, 1.0]]),
            rb)
    else:
        prior = PostselectedDistribution(
            UniformDistribution([[p_min, p_max], [0.0, 1.0], [0.0, 1.0]]),
            rb)
    updater = SMCUpdater(model, n_particles, prior, seed=seed)
    eps = {"m": jnp.asarray(ms, dtype=jnp.int32),
           "n_meas": jnp.asarray(n_shots, dtype=jnp.int32)}
    if interleaved:
        eps["reference"] = jnp.asarray(data[:, 3], dtype=jnp.int32)
    updater.batch_update(jnp.asarray(counts, dtype=jnp.int32), eps)
    return _finish(updater, return_all)
