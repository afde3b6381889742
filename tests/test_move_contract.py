"""Validity-tolerant Liu-West contract for resample-move configs
(round 5, VERDICT r4 #2): when Metropolis moves follow every resample,
the resampler's own strict ``model.canonicalize`` is redundant — the
moves re-gate validity per proposal and the end-of-move projection
(``mcmc_canonicalize``) owns strictness."""

import numpy as np
import jax
import jax.numpy as jnp

import qinfer_tpu as q
from qinfer_tpu.resamplers import LiuWestResampler


class _CanonCounting(q.CoinModel):
    """CoinModel that counts eager canonicalize invocations (the resampler
    test below calls it outside jit, so the count is exact)."""
    calls = []

    def canonicalize(self, modelparams):
        _CanonCounting.calls.append(1)
        return jnp.clip(modelparams, 0.0, 1.0)


def test_resampler_canonicalize_flag_skips_model_projection():
    model = _CanonCounting()
    prior = q.UniformDistribution([[0.0, 1.0]])
    x = prior.sample(jax.random.key(0), 256)
    w = jnp.ones(256) / 256

    _CanonCounting.calls = []
    LiuWestResampler(a=0.98, canonicalize=False).call_with_diagnostics(
        model, jax.random.key(1), w, x)
    assert _CanonCounting.calls == []

    _CanonCounting.calls = []
    LiuWestResampler(a=0.98).call_with_diagnostics(
        model, jax.random.key(1), w, x)
    assert len(_CanonCounting.calls) == 1


def test_updater_selects_tolerant_resampler_for_move_configs():
    prior = q.UniformDistribution([[0.0, 1.0]])
    # moves > 0 and no explicit resampler -> validity-tolerant contract
    u = q.SMCUpdater(q.CoinModel(), 64, prior, n_mcmc_moves=2)
    assert u.resampler.canonicalize is False
    # no moves -> strict (reference parity)
    u = q.SMCUpdater(q.CoinModel(), 64, prior)
    assert u.resampler.canonicalize is True
    # the move block's projection disabled -> the resampler must keep
    # strictness (at least one strict projection per resample-move
    # event; the measured high-dim collapse otherwise)
    u = q.SMCUpdater(q.CoinModel(), 64, prior, n_mcmc_moves=2,
                     mcmc_canonicalize=False)
    assert u.resampler.canonicalize is True
    # waste-free replaces the resampler; the default stays strict
    u = q.SMCUpdater(q.BinomialModel(q.CoinModel(), n_meas_max=4), 64,
                     prior, waste_free_stages=8,
                     compress_mcmc_record=True,
                     zero_weight_policy="reset")
    assert u.resampler.canonicalize is True
    # an explicit resampler is never second-guessed
    r = LiuWestResampler(a=0.9)
    u = q.SMCUpdater(q.CoinModel(), 64, prior, n_mcmc_moves=2, resampler=r)
    assert u.resampler is r and u.resampler.canonicalize is True


def test_tolerant_resample_plus_move_projection_ends_strict():
    """Composition contract on the tomography family: Liu-West WITHOUT its
    own projection + moves WITH mcmc_canonicalize leaves a strictly-PSD
    ensemble (min eigenvalue of every embedded state >= -1e-5), and the
    estimate still converges."""
    import qinfer_tpu.tomography as tomo

    basis = tomo.pauli_basis(1)
    model = tomo.TomographyModel(basis)
    prior = tomo.GinibreDistribution(basis)
    # random-Pauli record against a fixed true state
    true_rho = np.array([[0.85, 0.3], [0.3, 0.15]], dtype=np.complex64)
    true_mps = jnp.asarray(np.asarray(
        model.states_to_modelparams(true_rho[None])))
    d = basis.dim
    eye_coords = np.zeros(basis.n_ops)
    eye_coords[0] = np.sqrt(d)
    proj = jnp.asarray(0.5 * (eye_coords[None, :]
                              + np.sqrt(d) * np.eye(basis.n_ops))[1:],
                       dtype=jnp.float32)
    rng = np.random.default_rng(0)
    T = 60
    picks = rng.integers(0, proj.shape[0], T)
    eps = {"meas": proj[picks]}
    outs = model.simulate_experiment(
        jax.random.key(2), true_mps,
        {"meas": proj[picks]}).reshape(-1)
    u = q.SMCUpdater(model, 2000, prior, seed=3, n_mcmc_moves=4,
                     compress_mcmc_record=True, resample_thresh=0.7)
    assert u.resampler.canonicalize is False  # the tolerant contract
    u.batch_update(outs, eps, resample_interval=1)
    assert int(u.state.resample_count) > 0  # moves actually ran
    # strict-PSD check on the full final ensemble
    locs = np.asarray(u.state.locations)
    coords = np.concatenate(
        [np.full((locs.shape[0], 1), 1.0 / np.sqrt(d)), locs], axis=1)
    ops = np.asarray(basis.data)           # (n_ops, d, d) complex
    rhos = np.einsum("ni,iab->nab", coords, ops)
    evs = np.linalg.eigvalsh(rhos)
    assert evs.min() >= -1e-5, evs.min()
    # and the estimate is sane
    est = np.asarray(u.est_mean())
    truth = np.asarray(true_mps)[0]
    assert np.linalg.norm(est - truth) < 0.2
