"""Checkpoint/resume subsystem tests (beyond-reference addition; SURVEY.md
§5 notes the reference has no checkpoint subsystem)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qinfer_tpu as q


def _run_updater(seed=0, n=800, steps=15):
    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    u = q.SMCUpdater(model, n, prior, seed=seed)
    key = jax.random.key(seed + 50)
    for k in range(steps):
        t = (9 / 8) ** k / 5
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(sk, jnp.array([[0.5]]),
                                      {"t": jnp.array([t])})
        u.update(o, {"t": jnp.array([t])})
    return u


def test_npz_roundtrip(tmp_path):
    u = _run_updater()
    path = tmp_path / "ckpt.npz"
    q.save_updater(path, u)
    u2 = q.SMCUpdater(q.SimplePrecessionModel(), 800,
                      q.UniformDistribution([[0, 1]]), seed=99)
    q.load_updater(path, u2)
    np.testing.assert_allclose(np.asarray(u2.particle_weights),
                               np.asarray(u.particle_weights))
    np.testing.assert_allclose(np.asarray(u2.particle_locations),
                               np.asarray(u.particle_locations))
    assert u2.resample_count == u.resample_count
    assert len(u2.data_record) == len(u.data_record)
    assert np.isclose(u2.log_total_likelihood, u.log_total_likelihood)


def test_resume_continues_identically(tmp_path):
    """Saving, restoring, then updating must match never having saved."""
    u = _run_updater(seed=3)
    path = tmp_path / "c.npz"
    q.save_updater(path, u)
    u2 = q.SMCUpdater(q.SimplePrecessionModel(), 800,
                      q.UniformDistribution([[0, 1]]), seed=1)
    q.load_updater(path, u2)
    eps = {"t": jnp.array([2.0])}
    u.update(0, eps)
    u2.update(0, eps)
    np.testing.assert_allclose(np.asarray(u2.est_mean()),
                               np.asarray(u.est_mean()), atol=1e-7)


def test_restore_onto_sharded_mesh(tmp_path):
    """A single-device checkpoint restores onto an 8-device mesh."""
    from qinfer_tpu.parallel import ParticleMesh

    u = _run_updater(n=800)
    path = tmp_path / "c.npz"
    q.save_updater(path, u)
    pm = ParticleMesh()
    u2 = q.SMCUpdater(q.SimplePrecessionModel(), 800,
                      q.UniformDistribution([[0, 1]]), seed=1,
                      sharding=pm.particle_sharding)
    q.load_updater(path, u2)
    assert len(u2.particle_weights.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(u2.est_mean()),
                               np.asarray(u.est_mean()), atol=1e-6)
    u2.update(1, {"t": jnp.array([1.0])})


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    u = _run_updater()
    path = tmp_path / "orbax_ckpt"
    q.checkpoint.save_updater_orbax(path, u)
    u2 = q.SMCUpdater(q.SimplePrecessionModel(), 800,
                      q.UniformDistribution([[0, 1]]), seed=5)
    q.checkpoint.load_updater_orbax(path, u2)
    np.testing.assert_allclose(np.asarray(u2.est_mean()),
                               np.asarray(u.est_mean()), atol=1e-6)


def test_bcrb_adaptive_vs_prior_ensembles():
    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    ua = q.SMCUpdaterBCRB(model, 400, prior, adaptive=True, seed=0)
    un = q.SMCUpdaterBCRB(model, 400, prior, adaptive=False, seed=0)
    key = jax.random.key(1)
    for k in range(10):
        t = float(k + 1)
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(sk, jnp.array([[0.5]]),
                                      {"t": jnp.array([t])})
        ua.update(o, {"t": jnp.array([t])})
        un.update(o, {"t": jnp.array([t])})
    # for precession F = t² independent of ω, so both agree analytically
    expect = sum((k + 1.0) ** 2 for k in range(10))
    assert np.isclose(un.current_bim[0, 0], expect, rtol=1e-3)
    assert np.isclose(ua.current_bim[0, 0], expect, rtol=1e-3)


def test_checkpoint_vector_outcomes_roundtrip(tmp_path):
    """Code-review regression: data_record entries with vector outcomes
    (multinomial counts) must survive the checkpoint intact."""
    die = q.NDieModel(3)
    m = q.MultinomialModel(die, n_meas_max=10)
    u = q.SMCUpdater(m, 200, q.MVUniformDistribution(3), seed=0)
    eps = {"exp_num": jnp.array([0]), "n_meas": jnp.array([10])}
    u.update(jnp.array([5, 3, 2]), eps, check_for_resample=False)
    u.update(jnp.array([4, 4, 2]), eps, check_for_resample=False)
    path = tmp_path / "vec_ckpt.npz"
    q.save_updater(path, u)
    u2 = q.SMCUpdater(m, 200, q.MVUniformDistribution(3), seed=1)
    q.load_updater(path, u2)
    np.testing.assert_array_equal(
        np.asarray(u2.data_record), [[5, 3, 2], [4, 4, 2]])


def test_checkpoint_extensionless_path_roundtrip(tmp_path):
    """Code-review regression: np.savez appends '.npz'; load must too."""
    u = _run_updater(n=200, steps=5)
    path = str(tmp_path / "noext")
    q.save_updater(path, u)
    u2 = q.SMCUpdater(q.SimplePrecessionModel(), 200,
                      q.UniformDistribution([[0, 1]]), seed=5)
    q.load_updater(path, u2)
    np.testing.assert_allclose(np.asarray(u2.est_mean()),
                               np.asarray(u.est_mean()), atol=1e-7)


def test_checkpoint_restores_n_particles(tmp_path):
    u = _run_updater(n=800, steps=5)
    path = tmp_path / "big.npz"
    q.save_updater(path, u)
    u2 = q.SMCUpdater(q.SimplePrecessionModel(), 100,
                      q.UniformDistribution([[0, 1]]), seed=5)
    q.load_updater(path, u2)
    assert u2.n_particles == 800


def test_roundtrip_preserves_rejuvenation_record(tmp_path):
    """Round-4 composition gap: checkpoints must carry the rejuvenation
    record (compressed pool AND full per-experiment record) — without it
    a resumed updater's moves silently target an EMPTY record. A resumed
    run must continue IDENTICALLY to an uninterrupted one (all stochastic
    state lives in the checkpointed SMCState key)."""
    two = q.SimplePrecessionModel()
    model = q.BinomialModel(two, n_meas_max=12)
    prior = q.UniformDistribution([[0.0, 1.0]])
    pool_t = np.asarray([0.5, 1.7, 3.1, 6.4], np.float32)
    ts = pool_t[np.random.default_rng(5).integers(0, 4, 24)]
    eps = {"t": jnp.asarray(ts), "n_meas": jnp.full((24,), 12, jnp.int32)}
    outs = np.asarray(model.simulate_experiment(
        jax.random.key(6), jnp.array([[0.43]]), eps))[0]

    def make(compress):
        return q.SMCUpdater(model, 512, prior, seed=7, n_mcmc_moves=3,
                            compress_mcmc_record=compress,
                            zero_weight_policy="reset")

    for compress in (True, False):
        # uninterrupted reference
        ref = make(compress)
        for i in range(24):
            ref.update(int(outs[i]), {"t": eps["t"][i:i + 1],
                                      "n_meas": eps["n_meas"][i:i + 1]})
        # interrupted at step 12: save → restore into a FRESH updater
        u = make(compress)
        for i in range(12):
            u.update(int(outs[i]), {"t": eps["t"][i:i + 1],
                                    "n_meas": eps["n_meas"][i:i + 1]})
        path = str(tmp_path / f"ck_{compress}")
        q.save_updater(path, u)
        v = make(compress)
        q.load_updater(path, v)
        if compress:
            assert len(v._pool_eps) == len(u._pool_eps) > 0
            assert v._pool_index.keys() == u._pool_index.keys()
            assert v._pool_trials == u._pool_trials
            assert v._n_record == 12
        else:
            assert len(v._eps_record) == 12
        for i in range(12, 24):
            v.update(int(outs[i]), {"t": eps["t"][i:i + 1],
                                    "n_meas": eps["n_meas"][i:i + 1]})
        np.testing.assert_allclose(
            np.asarray(v.est_mean()), np.asarray(ref.est_mean()),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(v.est_covariance_mtx()),
            np.asarray(ref.est_covariance_mtx()), atol=1e-7)
