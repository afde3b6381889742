"""Priors over density operators.

Reference parity: ``src/qinfer/tomography/distributions.py`` —
``DensityOperatorDistribution`` ABC plus ``GinibreDistribution``,
``GinibreReditDistribution`` (real-valued rebits/redits),
``BCSZChoiDistribution`` (random channels as Choi states) and
``GADFLIDistribution`` (fiducial-state-informed prior).

TPU-native: sampling is batched complex-normal linear algebra
(``vmap``-able, explicit keys); coordinates are produced directly in the
model's :class:`~qinfer_tpu.tomography.bases.TomographyBasis`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions import Distribution

__all__ = [
    "DensityOperatorDistribution",
    "GinibreDistribution",
    "GinibreReditDistribution",
    "BCSZChoiDistribution",
    "GADFLIDistribution",
]


class DensityOperatorDistribution(Distribution):
    """Distribution over density operators expressed in a tomography
    basis; samples are the ``d²−1`` free coordinates (trace component
    dropped, matching :class:`~qinfer_tpu.tomography.models.TomographyModel`).

    Reference parity:
    ``tomography/distributions.py::DensityOperatorDistribution``.
    """

    def __init__(self, basis):
        self.basis = basis

    @property
    def dim(self):
        return self.basis.dim

    @property
    def n_rvs(self):
        return self.basis.n_ops - 1

    def sample(self, key, n=1):
        rhos = self._sample_states(key, n)  # (n, d, d)
        coords = self.basis.state_to_modelparams(rhos)
        return coords[:, 1:]

    def _sample_states(self, key, n):
        raise NotImplementedError


class GinibreDistribution(DensityOperatorDistribution):
    """Ginibre-ensemble random states of given rank: ρ ∝ GG† with G a
    ``d × rank`` complex standard normal.

    Reference parity: ``tomography/distributions.py::GinibreDistribution``.
    """

    def __init__(self, basis, rank=None):
        super().__init__(basis)
        self.rank = int(rank) if rank is not None else self.dim

    def _sample_states(self, key, n):
        d, r = self.dim, self.rank
        kr, ki = jax.random.split(key)
        g = (jax.random.normal(kr, (n, d, r))
             + 1j * jax.random.normal(ki, (n, d, r))).astype(jnp.complex64)
        rho = jnp.einsum("nij,nkj->nik", g, g.conj())
        tr = jnp.trace(rho, axis1=1, axis2=2).real
        return rho / tr[:, None, None]


class GinibreReditDistribution(DensityOperatorDistribution):
    """Real-valued Ginibre states (rebits/redits): ρ ∝ GGᵀ with G real.

    Reference parity:
    ``tomography/distributions.py::GinibreReditDistribution``.
    """

    def __init__(self, basis, rank=None):
        super().__init__(basis)
        self.rank = int(rank) if rank is not None else self.dim

    def _sample_states(self, key, n):
        d, r = self.dim, self.rank
        g = jax.random.normal(key, (n, d, r))
        rho = jnp.einsum("nij,nkj->nik", g, g)
        tr = jnp.trace(rho, axis1=1, axis2=2)
        return (rho / tr[:, None, None]).astype(jnp.complex64)


class BCSZChoiDistribution(DensityOperatorDistribution):
    """BCSZ-random CPTP channels represented as (normalized) Choi states.

    Sampling (Bruzda-Cappellini-Sommers-Życzkowski): W = GG† with G a
    ``d² × rank`` complex normal; enforce trace preservation by the
    partial-trace whitening W ↦ (√S⁻¹ ⊗ I) W (√S⁻¹ ⊗ I) with
    S = Tr₂ W, then normalize to unit trace (Choi *state*).

    Reference parity: ``tomography/distributions.py::BCSZChoiDistribution``
    — the basis must live on the doubled space (dim d²).
    """

    def __init__(self, basis, hilbert_dim=None, rank=None):
        super().__init__(basis)
        d2 = self.dim
        hd = int(hilbert_dim) if hilbert_dim is not None else int(d2 ** 0.5)
        if hd * hd != d2:
            raise ValueError(
                "BCSZChoiDistribution needs a basis on a d² space")
        self.hilbert_dim = hd
        self.rank = int(rank) if rank is not None else d2

    def _sample_states(self, key, n):
        d = self.hilbert_dim
        d2, r = d * d, self.rank
        kr, ki = jax.random.split(key)
        g = (jax.random.normal(kr, (n, d2, r))
             + 1j * jax.random.normal(ki, (n, d2, r))).astype(jnp.complex64)
        W = jnp.einsum("nij,nkj->nik", g, g.conj())  # (n, d², d²)
        # partial trace over the SECOND factor: S_ab = Σ_k W_{(a k),(b k)}
        W4 = W.reshape(n, d, d, d, d)
        S = jnp.einsum("nakbk->nab", W4)
        # inverse sqrt of S via real-embedded eigh (complex eigh is
        # unimplemented on the TPU backend; see tomography.bases helpers)
        from .bases import hermitian_eigh_embedded

        inv_sqrt = hermitian_eigh_embedded(
            S, lambda ev: 1.0 / jnp.sqrt(jnp.clip(ev, 1e-12, None)))
        # (S^{-1/2} ⊗ I) W (S^{-1/2} ⊗ I)
        KI = jnp.einsum("nab,cd->nacbd", inv_sqrt, jnp.eye(
            d, dtype=jnp.complex64)).reshape(n, d2, d2)
        choi = jnp.einsum("nij,njk,nlk->nil", KI, W, KI.conj())
        tr = jnp.trace(choi, axis1=1, axis2=2).real
        return choi / tr[:, None, None]


class GADFLIDistribution(DensityOperatorDistribution):
    """Fiducial-state-informed prior: convex mixtures
    ρ = (1−β) ρ_Ginibre + β ρ_fiducial with β ~ Beta(alpha, beta) — mass
    concentrates near an experimenter's fiducial guess while keeping full
    support.

    Reference parity: ``tomography/distributions.py::GADFLIDistribution``
    [SURVEY.md marks this MED-confidence; the mixing form here follows the
    GADFLI construction of Granade et al., Practical Bayesian tomography
    (NJP 18 033024, 2016)].
    """

    def __init__(self, basis, fiducial_state, alpha=1.0, beta=9.0,
                 rank=None):
        super().__init__(basis)
        self.fiducial_state = jnp.asarray(fiducial_state,
                                          dtype=jnp.complex64)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self._ginibre = GinibreDistribution(basis, rank=rank)

    def _sample_states(self, key, n):
        k1, k2 = jax.random.split(key)
        rho_g = self._ginibre._sample_states(k1, n)
        mix = jax.random.beta(k2, self.alpha, self.beta, (n, 1, 1))
        mix = mix.astype(jnp.complex64)
        return (1.0 - mix) * rho_g + mix * self.fiducial_state[None]
