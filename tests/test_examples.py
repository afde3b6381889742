"""Run the example scripts end-to-end at reduced scale (the reference's
companion qinfer-examples repo serves as acceptance tests; SURVEY.md §4)."""

import importlib.util
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def load_example(name):
    path = os.path.join(EXAMPLES, name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_frequency_estimation_example():
    mod = load_example("frequency_estimation.py")
    u = mod.main(n_particles=1000, n_experiments=40)
    assert u.resample_count >= 0


def test_randomized_benchmarking_example():
    mod = load_example("randomized_benchmarking.py")
    u = mod.main(n_shots=50)
    assert u.n_particles == 8000


def test_state_tomography_example():
    mod = load_example("state_tomography.py")
    u = mod.main(n_particles=1500, n_experiments=100)
    assert u.n_ess > 0


def test_process_tomography_example():
    mod = load_example("process_tomography.py")
    u = mod.main(n_particles=3000, n_experiments=150)
    assert u.n_particles == 3000


def test_model_selection_example():
    """The damped (true) model must win the evidence comparison
    decisively; this also regression-tests the weighted max-shift in the
    log-space reweight (the pure model's weights span ~40 f32 decades
    between interval resamples and previously hit a spurious
    ZeroWeightError)."""
    mod = load_example("model_selection.py")
    log_bf = mod.main(n_particles=2000, n_times=30)
    assert log_bf > 10.0
