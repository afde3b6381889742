"""Particle clustering (multimodal posterior support).

Reference parity: ``src/qinfer/clustering.py`` (SURVEY.md §2 #19) —
``particle_clusters`` generator over DBSCAN cluster masks and the
``NO_CLUSTER`` sentinel.

Host-side scikit-learn by design: clustering runs occasionally on a gathered
particle cloud, never inside the jitted hot loop (the reference makes the
same choice with its optional sklearn dependency).
"""

from __future__ import annotations

import numpy as np

from .metrics import rescaled_distance_mtx

__all__ = ["particle_clusters", "NO_CLUSTER"]

#: DBSCAN label for noise points. Reference parity:
#: ``src/qinfer/clustering.py::NO_CLUSTER``.
NO_CLUSTER = -1


def particle_clusters(particle_locations, particle_weights=None,
                      eps=0.5, min_particles=5, metric="euclidean",
                      weighted=False, w_pow=0.5, quiet=True):
    """Yield ``(cluster_label, index_mask)`` pairs from a DBSCAN clustering
    of the particle cloud.

    Reference parity: ``src/qinfer/clustering.py::particle_clusters`` —
    same signature and semantics: optional weighting rescales distances by
    ``w^(-w_pow)`` so heavy particles attract clusters.
    """
    from sklearn.cluster import DBSCAN

    locations = np.asarray(particle_locations)
    if weighted and particle_weights is None:
        raise ValueError("weighted clustering requires particle_weights")

    if weighted:
        weights = np.asarray(particle_weights)
        dist = rescaled_distance_mtx(weights, locations, w_pow=w_pow,
                                     metric=metric)
        labels = DBSCAN(
            eps=eps, min_samples=min_particles, metric="precomputed"
        ).fit(dist).labels_
    else:
        labels = DBSCAN(
            eps=eps, min_samples=min_particles, metric=metric
        ).fit(locations).labels_

    if not quiet and (labels == NO_CLUSTER).all():
        import warnings

        warnings.warn("DBSCAN found no clusters; all particles are noise")

    for label in np.unique(labels):
        yield int(label), labels == label
