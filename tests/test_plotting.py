"""Plotting smoke tests (Agg backend; host-side matplotlib like the
reference's ``plot_posterior_marginal`` / ``plot_covariance`` /
``tomography/plotting_tools.py``)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qinfer_tpu as q
from qinfer_tpu import tomography as tomo


@pytest.fixture
def converged_updater():
    model = q.SimplePrecessionModel()
    u = q.SMCUpdater(model, 500, q.UniformDistribution([[0, 1]]), seed=0)
    key = jax.random.key(1)
    for k in range(25):
        t = (9 / 8) ** k / 5
        key, sk = jax.random.split(key)
        o = model.simulate_experiment(sk, jnp.array([[0.6]]),
                                      {"t": jnp.array([t])})
        u.update(o, {"t": jnp.array([t])})
    return u


def test_plot_posterior_marginal(converged_updater):
    import matplotlib.pyplot as plt

    line = converged_updater.plot_posterior_marginal(smoothing=1.0)
    assert line is not None
    plt.close("all")


def test_plot_covariance():
    import matplotlib.pyplot as plt

    model = q.RamseyModel()
    u = q.SMCUpdater(model, 300,
                     q.UniformDistribution([[0, 1], [0, 0.2]]), seed=0)
    im = u.plot_covariance()
    assert im is not None
    plt.close("all")


def test_plot_rebit_posterior():
    import matplotlib.pyplot as plt
    from qinfer_tpu.tomography.plotting_tools import plot_rebit_posterior

    b = tomo.pauli_basis(1)
    model = tomo.TomographyModel(b)
    prior = tomo.GinibreReditDistribution(b, rank=2)
    u = q.SMCUpdater(model, 300, prior, seed=0)
    true_rho = np.array([[0.8, 0.25], [0.25, 0.2]], dtype=np.complex64)
    ax = plot_rebit_posterior(u, true_state=true_rho)
    assert ax is not None
    plt.close("all")


def test_plot_decaying_exponentials():
    import matplotlib.pyplot as plt
    from qinfer_tpu.tomography.plotting_tools import \
        plot_decaying_exponentials

    rb = q.RandomizedBenchmarkingModel()
    prior = q.PostselectedDistribution(
        q.UniformDistribution([[0.8, 1.0], [0.3, 0.6], [0.3, 0.6]]), rb)
    u = q.SMCUpdater(rb, 300, prior, seed=0)
    ax = plot_decaying_exponentials(
        u, true_modelparams=np.array([0.95, 0.5, 0.5]))
    assert ax is not None
    plt.close("all")


def test_progress_bars():
    from qinfer_tpu.ipy import TextProgressBar, IPythonProgressBar
    import io

    bar = TextProgressBar(stream=io.StringIO())
    bar.start(10)
    for i in range(10):
        bar.update(i + 1)
    bar.finished()

    nb = IPythonProgressBar()  # degrades to text outside notebooks
    nb.start(5)
    nb.update(3)
    nb.finished()
