"""Façade tests. Reference parity: ``simple_est.py`` one-liners with
ndarray / CSV / DataFrame input coercion."""

import io

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qinfer_tpu as q


def _prec_data(true_omega=0.43, n_shots=20, n_exp=40, seed=0):
    model = q.BinomialModel(q.SimplePrecessionModel(), n_meas_max=n_shots)
    ts = np.asarray([(9 / 8) ** k / 5 for k in range(n_exp)])
    eps = {"t": jnp.asarray(ts, dtype=jnp.float32),
           "n_meas": jnp.full((n_exp,), n_shots, dtype=jnp.int32)}
    counts = model.simulate_experiment(
        jax.random.key(seed), jnp.array([[true_omega]]), eps)[0]
    return np.stack(
        [np.asarray(counts, dtype=float), ts, np.full(n_exp, n_shots)],
        axis=1)


def test_simple_est_prec_ndarray():
    data = _prec_data()
    mean, cov = q.simple_est_prec(data, n_particles=3000)
    std = np.sqrt(cov[0, 0])
    assert abs(mean[0] - 0.43) < 6 * std + 0.01


def test_simple_est_prec_return_all():
    data = _prec_data()
    mean, cov, extra = q.simple_est_prec(data, n_particles=2000,
                                         return_all=True)
    assert isinstance(extra["updater"], q.SMCUpdater)


def test_simple_est_prec_csv():
    data = _prec_data()
    buf = io.StringIO()
    np.savetxt(buf, data, delimiter=",")
    buf.seek(0)
    mean, cov = q.simple_est_prec(buf, n_particles=2000)
    assert np.isfinite(mean[0])


def test_simple_est_prec_dataframe():
    pd = pytest.importorskip("pandas")
    data = _prec_data()
    df = pd.DataFrame(data, columns=["counts", "t", "n_shots"])
    mean, cov = q.simple_est_prec(df, n_particles=2000)
    assert np.isfinite(mean[0])


def test_simple_est_prec_bad_columns():
    with pytest.raises(ValueError):
        q.simple_est_prec(np.zeros((10, 2)))


def test_simple_est_rb():
    true_p = 0.9
    rb = q.RandomizedBenchmarkingModel()
    bmodel = q.BinomialModel(rb, n_meas_max=40)
    ms = np.unique(np.logspace(0, 1.8, 15).astype(int))
    eps = {"m": jnp.asarray(ms, dtype=jnp.int32),
           "n_meas": jnp.full((len(ms),), 40, dtype=jnp.int32)}
    counts = bmodel.simulate_experiment(
        jax.random.key(2), jnp.array([[true_p, 0.5, 0.5]]), eps)[0]
    data = np.stack([np.asarray(counts, dtype=float), ms,
                     np.full(len(ms), 40)], axis=1)
    mean, cov = q.simple_est_rb(data, n_particles=4000)
    assert mean.shape == (3,)
    assert abs(mean[0] - true_p) < 6 * np.sqrt(cov[0, 0]) + 0.05
