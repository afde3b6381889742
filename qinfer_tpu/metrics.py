"""Distance metrics for weighted particle clouds.

Reference parity: ``src/qinfer/metrics.py`` (SURVEY.md §2 #20) —
``rescaled_distance_mtx``, the weighted pairwise-distance helper consumed by
:mod:`qinfer_tpu.clustering`.
"""

from __future__ import annotations

import numpy as np

__all__ = ["rescaled_distance_mtx", "weighted_pairwise_distances"]


def rescaled_distance_mtx(weights, locations, w_pow=0.5, metric="euclidean"):
    """Pairwise distance matrix rescaled by particle weights:
    ``D_ij = d(x_i, x_j) / (n² w_i w_j)^{w_pow}`` — heavier-than-average
    particle pairs look closer, so clusters form around posterior mass,
    and uniform weights leave distances unchanged (the ``n²`` inside the
    power makes the rescale dimensionless, so results are comparable
    across ensemble sizes).

    Reference parity: ``src/qinfer/metrics.py::rescaled_distance_mtx``.
    """
    from scipy.spatial.distance import pdist, squareform

    locations = np.asarray(locations)
    weights = np.asarray(weights)
    base = squareform(pdist(locations, metric=metric))
    n = weights.shape[0]
    scale = (n * n * np.multiply.outer(weights, weights)) ** w_pow
    # avoid division blowups for (numerically) zero-weight particles
    scale = np.clip(scale, np.finfo(float).tiny ** 0.5, None)
    return base / scale


def weighted_pairwise_distances(weights, locations, w_pow=0.5,
                                metric="euclidean"):
    """Alias kept for discoverability; see :func:`rescaled_distance_mtx`."""
    return rescaled_distance_mtx(weights, locations, w_pow=w_pow,
                                 metric=metric)
