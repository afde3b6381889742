"""Distributed (two-level systematic) Liu-West resampler tests on the
virtual 8-device mesh — SURVEY.md §7 hard part #1.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qinfer_tpu as q
from qinfer_tpu.parallel import ParticleMesh
from qinfer_tpu.parallel.resample import (
    DistributedLiuWestResampler,
    shard_systematic_ancestors,
)
from qinfer_tpu.utils import weighted_moments


class FreeModel(q.Model):
    """Unconstrained 2-param model (no canonicalization side effects)."""

    def __init__(self):
        super().__init__()

    @property
    def n_modelparams(self):
        return 2

    @property
    def expparams_dtype(self):
        return [("t", "float32")]

    def n_outcomes(self, expparams=None):
        return 2

    def are_models_valid(self, mps):
        return jnp.ones(jnp.atleast_2d(mps).shape[0], dtype=bool)

    def likelihood(self, outcomes, mps, eps):
        raise NotImplementedError


@pytest.fixture
def pm():
    return ParticleMesh()


def _weighted_cloud(pm, key, n=8192):
    x = jax.device_put(jax.random.normal(key, (n, 2)) * jnp.array([1.0, 0.5])
                       + jnp.array([2.0, -1.0]), pm.location_sharding)
    logw = -0.1 * jnp.sum(x ** 2, axis=1)
    w = jnp.exp(logw)
    w = jax.device_put(w / w.sum(), pm.particle_sharding)
    return w, x


def test_shard_ancestors_proportional():
    masses = jnp.array([0.7, 0.1, 0.1, 0.1])
    # with mass 0.7 on shard 0, most output shards take ancestor 0
    counts = np.zeros(4)
    for s in range(50):
        u = float(jax.random.uniform(jax.random.key(s), ()))
        anc = np.asarray(shard_systematic_ancestors(u, masses))
        counts += np.bincount(anc, minlength=4)
    frac = counts / counts.sum()
    np.testing.assert_allclose(frac, np.asarray(masses), atol=0.08)


def test_moments_preserved(pm, key):
    k1, k2 = jax.random.split(key)
    w, x = _weighted_cloud(pm, k1)
    rs = DistributedLiuWestResampler(pm.mesh, a=0.98)
    new_w, new_x = rs(FreeModel(), k2, w, x)
    mu0, cov0 = weighted_moments(w, x)
    mu1, cov1 = weighted_moments(new_w, new_x)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=0.1)
    np.testing.assert_allclose(np.asarray(cov1), np.asarray(cov0),
                               rtol=0.3, atol=0.05)


def test_uniform_weights_and_sharding(pm, key):
    w, x = _weighted_cloud(pm, key)
    rs = DistributedLiuWestResampler(pm.mesh)
    new_w, new_x = rs(FreeModel(), key, w, x)
    np.testing.assert_allclose(np.asarray(new_w), 1.0 / w.shape[0],
                               atol=1e-9)
    assert len(new_w.sharding.device_set) == 8
    assert len(new_x.sharding.device_set) == 8


def test_rebalances_concentrated_mass(pm, key):
    """All posterior mass on ONE shard: after resampling, every shard must
    hold particles near the heavy region (the ring exchange must actually
    move blocks)."""
    n = 8192
    x = jnp.concatenate([
        jnp.full((n // 8, 2), 5.0),          # shard 0's block: the mode
        jax.random.normal(key, (n - n // 8, 2)),
    ])
    w = jnp.concatenate([
        jnp.full((n // 8,), 1.0),
        jnp.full((n - n // 8,), 1e-12),
    ])
    w = w / w.sum()
    x = jax.device_put(x, pm.location_sharding)
    w = jax.device_put(w, pm.particle_sharding)

    rs = DistributedLiuWestResampler(pm.mesh, a=0.98)
    new_w, new_x = rs(FreeModel(), jax.random.key(3), w, x)
    # nearly all new particles should sit near (5, 5)
    near = np.asarray(jnp.mean(
        (jnp.linalg.norm(new_x - 5.0, axis=1) < 1.0).astype(jnp.float32)))
    assert near > 0.95
    # and every shard's local block moved there too (check per-shard means)
    per_shard = np.asarray(new_x).reshape(8, -1, 2).mean(axis=1)
    assert np.all(np.abs(per_shard - 5.0) < 1.0)


def test_validity_respected(pm, key):
    model = q.SimplePrecessionModel(min_freq=0.0)

    class Free1(q.Model):
        def __init__(self):
            super().__init__()

        @property
        def n_modelparams(self):
            return 1

        @property
        def expparams_dtype(self):
            return [("t", "float32")]

        def n_outcomes(self, expparams=None):
            return 2

        def are_models_valid(self, mps):
            return jnp.atleast_2d(mps)[:, 0] >= 0

        def likelihood(self, outcomes, mps, eps):
            raise NotImplementedError

    n = 4096
    x = jax.device_put(jnp.abs(jax.random.normal(key, (n, 1))) * 0.01,
                       pm.location_sharding)
    w = jax.device_put(jnp.full((n,), 1.0 / n), pm.particle_sharding)
    rs = DistributedLiuWestResampler(pm.mesh, a=0.9, maxiter=10)
    _, new_x = rs(Free1(), jax.random.key(1), w, x)
    assert bool(jnp.all(new_x[:, 0] >= 0))


def test_full_smc_with_distributed_resampler(pm):
    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    rs = DistributedLiuWestResampler(pm.mesh, a=0.98)
    u = q.SMCUpdater(model, 8192, prior, seed=1,
                     sharding=pm.particle_sharding, resampler=rs)
    key = jax.random.key(2)
    for k in range(40):
        t = (9 / 8) ** k / 10
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(
            sk, jnp.array([[0.62]]), {"t": jnp.array([t])})
        u.update(o, {"t": jnp.array([t])})
    assert u.resample_count > 0
    std = float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
    assert abs(float(u.est_mean()[0]) - 0.62) < 6 * std + 0.01
    assert len(u.particle_weights.sharding.device_set) == 8


# ---------------------------------------------------------------------------
# log-depth butterfly exchange (VERDICT r2 weak #4)
# ---------------------------------------------------------------------------

def _random_masses(rng, D, kind):
    if kind == 0:
        return rng.dirichlet(np.ones(D))
    if kind == 1:
        return rng.dirichlet(np.ones(D) * 0.05)   # spiky
    if kind == 2:
        m = np.full(D, 1e-9)
        m[rng.integers(D)] = 1.0                   # all mass on one shard
        return m / m.sum()
    if kind == 3:
        m = np.full(D, 1e-9)
        i, j = rng.integers(D, size=2)
        m[i] += 0.5
        m[j] += 0.5
        return m / m.sum()
    return rng.dirichlet(np.ones(D) * 20)          # near-uniform


@pytest.mark.parametrize("D", [4, 8, 16, 32])
def test_butterfly_schedule_delivers_every_assignment(D):
    """The 3·log₂D-round schedule must deliver block anc[s] to every shard
    s for arbitrary (including adversarial) mass patterns — emulated with
    np.roll standing in for ppermute, so D beyond the virtual device count
    is covered (the VERDICT asked for D ∈ {4, 8, 16})."""
    from qinfer_tpu.parallel.resample import butterfly_exchange_schedule

    rng = np.random.default_rng(D)
    for trial in range(60):
        masses = _random_masses(rng, D, trial % 5)
        A = np.asarray(shard_systematic_ancestors(
            rng.uniform(), jnp.asarray(masses, jnp.float32)))
        shifts, takes = butterfly_exchange_schedule(jnp.asarray(A), D)
        assert len(shifts) == 3 * (D.bit_length() - 1)  # log-depth rounds
        takes = np.asarray(takes)
        blk = np.arange(D)
        for k, sh in enumerate(shifts):
            blk = np.where(takes[k], np.roll(blk, sh), blk)
        np.testing.assert_array_equal(blk, A)


@pytest.mark.parametrize("D", [4, 8])
def test_butterfly_equals_ring_bitwise(D, key):
    """Ring and butterfly are different routes to the SAME exchange, so
    with identical keys the full resampler outputs must be bit-identical
    (level-2 local resampling consumes the same uniforms either way)."""
    pm = ParticleMesh(jax.devices()[:D])
    n = 4096
    x = jax.device_put(jax.random.normal(key, (n, 2)), pm.location_sharding)
    logw = -2.0 * x[:, 0] ** 2  # concentrates mass -> nontrivial exchange
    w = jnp.exp(logw)
    w = jax.device_put(w / w.sum(), pm.particle_sharding)
    model = FreeModel()
    outs = {}
    for exchange in ("ring", "butterfly"):
        rs = DistributedLiuWestResampler(pm.mesh, a=0.95, exchange=exchange)
        assert rs.exchange == exchange
        new_w, new_x = rs(model, jax.random.key(7), w, x)
        outs[exchange] = (np.asarray(new_w), np.asarray(new_x))
    np.testing.assert_array_equal(outs["ring"][0], outs["butterfly"][0])
    np.testing.assert_array_equal(outs["ring"][1], outs["butterfly"][1])


def test_butterfly_moments_match_global(pm, key):
    """Butterfly-exchange resampling preserves the weighted moments (the
    unbiasedness check the ring path already passes)."""
    w, x = _weighted_cloud(pm, key, n=16384)
    mu0, _ = weighted_moments(w, x)
    rs = DistributedLiuWestResampler(pm.mesh, a=0.98, exchange="butterfly")
    new_w, new_x = rs(FreeModel(), jax.random.key(3), w, x)
    mu1, _ = weighted_moments(new_w, new_x)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=0.05)
    assert len(new_x.sharding.device_set) == 8


def test_butterfly_rejects_non_power_of_two():
    pm = ParticleMesh(jax.devices()[:6])
    with pytest.raises(ValueError):
        DistributedLiuWestResampler(pm.mesh, exchange="butterfly")
    # auto on a non-power-of-two mesh falls back to the ring
    rs = DistributedLiuWestResampler(pm.mesh, exchange="auto")
    assert rs.exchange == "ring"
