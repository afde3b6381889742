"""Conformance suite applied to every concrete model.

Reference parity: ``src/qinfer/tests/test_concrete_models.py`` (SURVEY.md
§4) — a single shared contract check instantiated per model: likelihood
shape ``(n_outcomes, n_models, n_expparams)``, likelihoods summing to 1 over
the finite domain, validity of prior samples, simulated outcomes inside the
domain, dtype honoring.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qinfer_tpu as q

# Each case: (name, model factory, prior, expparams dict of >=2 experiments)
CASES = [
    (
        "precession",
        lambda: q.SimplePrecessionModel(),
        q.UniformDistribution([[0.0, 1.0]]),
        {"t": jnp.array([1.0, 5.0, 10.0])},
    ),
    (
        "inversion",
        lambda: q.SimpleInversionModel(),
        q.UniformDistribution([[0.0, 1.0]]),
        {"t": jnp.array([1.0, 5.0]), "w_": jnp.array([0.3, 0.4])},
    ),
    (
        "coin",
        lambda: q.CoinModel(),
        q.UniformDistribution([[0.0, 1.0]]),
        {"exp_num": jnp.array([0, 1])},
    ),
    (
        "noisy_coin",
        lambda: q.NoisyCoinModel(),
        q.UniformDistribution([[0.0, 1.0]]),
        {"alpha": jnp.array([0.9, 0.8]), "beta": jnp.array([0.05, 0.1])},
    ),
    (
        "ndie",
        lambda: q.NDieModel(4),
        q.MVUniformDistribution(4),
        {"exp_num": jnp.array([0, 1])},
    ),
    (
        "multicos",
        lambda: q.MultiCosineModel(2),
        q.UniformDistribution([[0.0, 1.0], [0.0, 1.0]]),
        {"t": jnp.array([1.0, 3.0])},
    ),
    (
        "ramsey",
        lambda: q.RamseyModel(),
        q.UniformDistribution([[0.0, 1.0], [0.0, 0.2]]),
        {"t": jnp.array([1.0, 4.0])},
    ),
    (
        "rb",
        lambda: q.RandomizedBenchmarkingModel(),
        q.PostselectedDistribution(
            q.UniformDistribution([[0.0, 1.0]] * 3),
            q.RandomizedBenchmarkingModel()),
        {"m": jnp.array([1, 10, 100])},
    ),
    (
        "rb_interleaved",
        lambda: q.RandomizedBenchmarkingModel(interleaved=True),
        q.PostselectedDistribution(
            q.UniformDistribution([[0.0, 1.0]] * 4),
            q.RandomizedBenchmarkingModel(interleaved=True)),
        {"m": jnp.array([1, 10]), "reference": jnp.array([0, 1])},
    ),
    (
        "binomial_precession",
        lambda: q.BinomialModel(q.SimplePrecessionModel(), n_meas_max=10),
        q.UniformDistribution([[0.0, 1.0]]),
        {"t": jnp.array([1.0, 5.0]), "n_meas": jnp.array([10, 5])},
    ),
    (
        "mle",
        lambda: q.MLEModel(q.SimplePrecessionModel(), 2.0),
        q.UniformDistribution([[0.0, 1.0]]),
        {"t": jnp.array([1.0, 2.0])},
    ),
    (
        "random_walk",
        lambda: q.RandomWalkModel(
            q.SimplePrecessionModel(), q.NormalDistribution(0.0, 1e-4)),
        q.UniformDistribution([[0.0, 1.0]]),
        {"t": jnp.array([1.0, 2.0])},
    ),
    (
        "gaussian_random_walk",
        lambda: q.GaussianRandomWalkModel(q.SimplePrecessionModel(), 0.01),
        q.UniformDistribution([[0.0, 1.0]]),
        {"t": jnp.array([1.0, 2.0])},
    ),
]

IDS = [c[0] for c in CASES]


@pytest.fixture(params=CASES, ids=IDS)
def case(request):
    name, factory, prior, eps = request.param
    return name, factory(), prior, eps


def test_likelihood_shape_and_normalization(case, key):
    name, model, prior, eps = case
    mps = model.canonicalize(prior.sample(key, 5))
    outcomes = model.outcomes(eps)
    L = model.likelihood(outcomes, mps, eps)
    n_e = len(next(iter(eps.values())))
    assert L.shape == (outcomes.shape[0], 5, n_e)
    assert bool(jnp.all(L >= 0)) and bool(jnp.all(L <= 1.0 + 1e-5))
    if name == "mle":
        # MLEModel anneals likelihoods to a power — deliberately unnormalized
        return
    # likelihoods over the (masked) finite domain sum to 1
    mask = model.outcome_mask(eps)
    total = jnp.einsum("omE,oE->mE", L, mask.astype(L.dtype))
    np.testing.assert_allclose(np.asarray(total), 1.0, atol=1e-3)


def test_prior_samples_valid(case, key):
    name, model, prior, eps = case
    mps = model.canonicalize(prior.sample(key, 100))
    valid = np.asarray(model.are_models_valid(mps))
    assert valid.all(), f"{name}: {100 - valid.sum()} invalid prior samples"


def test_simulate_outputs_in_domain(case, key):
    name, model, prior, eps = case
    k1, k2 = jax.random.split(key)
    mps = model.canonicalize(prior.sample(k1, 3))
    outcomes = model.simulate_experiment(k2, mps, eps, repeat=4)
    n_e = len(next(iter(eps.values())))
    assert outcomes.shape[:3] == (4, 3, n_e)
    domain = model.domain(eps)
    domains = domain if isinstance(domain, list) else [domain] * n_e
    for e_idx, dom in enumerate(domains):
        ok = np.asarray(dom.in_domain(outcomes[..., e_idx]))
        assert ok.all(), f"{name}: outcomes escaped domain for eps {e_idx}"


def test_simulation_frequencies_match_likelihood(case, key):
    """Empirical outcome frequencies from simulate_experiment must match the
    analytic likelihood (the core contract tying the two methods)."""
    name, model, prior, eps = case
    if name in ("random_walk", "gaussian_random_walk"):
        pytest.skip("stochastic likelihood-free trajectory models")
    if name == "mle":
        pytest.skip("MLEModel simulates from the underlying (unannealed) "
                    "model by design")
    k1, k2 = jax.random.split(key)
    mps = model.canonicalize(prior.sample(k1, 1))
    one_eps = {k: v[:1] for k, v in eps.items()}
    outcomes = model.outcomes(one_eps)
    L = np.asarray(model.likelihood(outcomes, mps, one_eps))[:, 0, 0]
    sims = np.asarray(model.simulate_experiment(k2, mps, one_eps,
                                                repeat=4000)).ravel()
    outcome_vals = np.asarray(outcomes)
    if outcome_vals.ndim > 1:
        pytest.skip("vector-valued outcomes")
    freqs = np.array([(sims == v).mean() for v in outcome_vals])
    np.testing.assert_allclose(freqs, L, atol=0.05)


def test_expparams_structured_array_interop(case):
    """Models must accept reference-style NumPy structured arrays."""
    name, model, prior, eps = case
    from qinfer_tpu.abstract_model import dict_to_expparams

    try:
        structured = dict_to_expparams(
            {k: np.asarray(v) for k, v in eps.items()}, model.expparams_dtype)
    except (KeyError, ValueError):
        pytest.skip("expparams fields beyond declared dtype")
    mps = jnp.zeros((2, model.n_modelparams)) + 0.3
    mps = model.canonicalize(mps)
    outcomes = model.outcomes(eps)
    L1 = model.likelihood(outcomes, mps, structured)
    L2 = model.likelihood(outcomes, mps, eps)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L2), atol=1e-6)


def test_model_metadata(case):
    name, model, prior, eps = case
    assert model.n_modelparams == prior.n_rvs
    assert len(model.modelparam_names) == model.n_modelparams
    assert len(model.Q) == model.n_modelparams
    assert model.n_outcomes(eps) >= 2
