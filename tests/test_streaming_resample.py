"""Pallas streaming-resample kernel validation (interpret mode on CPU).

The kernel must be BIT-IDENTICAL to the XLA counting-fill formulation
(``resamplers.counting_locations_from_u``) given the same uniform offset:
both derive the same multiplicities/offsets from the same cumsum, so any
difference is a kernel bug, not MC noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qinfer_tpu.resamplers import (
    counting_multiplicities_from_u,
    counting_locations_from_u,
)
from qinfer_tpu.ops.streaming_resample import streaming_resample_locations

# small tiles keep interpret mode fast; the TPU defaults (128, 16) only
# change tiling, not the algorithm
_BLK = dict(block=64, flush=4)


def _reference_fill(m, starts, locations):
    """Host-side ground truth: write m_i copies of row i at starts_i."""
    n, d = locations.shape
    out = np.zeros((n, d), np.float32)
    m = np.asarray(m)
    starts = np.asarray(starts)
    x = np.asarray(locations)
    for i in range(n):
        out[starts[i]:starts[i] + m[i]] = x[i]
    return out


def _run(weights, locations, u, **kw):
    kw = {**_BLK, **kw}
    m, starts = counting_multiplicities_from_u(
        u, jnp.asarray(weights), weights.shape[0])
    got = streaming_resample_locations(
        m, starts, jnp.asarray(locations), **kw)
    want = _reference_fill(m, starts, locations)
    np.testing.assert_array_equal(np.asarray(got), want)
    # and bit-identical to the XLA counting fill the engine used before
    # (strategy='scan' is the exact last-written-wins fill; the CPU
    # 'telescope' strategy carries documented ~sqrt(n)*eps cancellation)
    xla = counting_locations_from_u(
        u, jnp.asarray(weights), jnp.asarray(locations), strategy="scan")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(xla))


@pytest.mark.parametrize("d", [1, 2, 3, 5, 9])
def test_random_weights_match_reference(d):
    rng = np.random.default_rng(d)
    n = 1024
    w = rng.random(n).astype(np.float32)
    w /= w.sum()
    x = rng.normal(size=(n, d)).astype(np.float32)
    _run(jnp.asarray(w), x, 0.37)


def test_point_mass_spans_every_tile():
    """Degenerate skew: one particle owns ALL output slots — its input
    block's grid step must stream through every output tile while all
    other blocks no-op."""
    rng = np.random.default_rng(0)
    n = 1024
    for p in (0, 511, 777, n - 1):
        w = np.full(n, 1e-12, np.float32)
        w[p] = 1.0
        x = rng.normal(size=(n, 2)).astype(np.float32)
        _run(jnp.asarray(w / w.sum()), x, 0.5)


def test_uniform_weights_identity_like():
    n = 512
    w = jnp.full((n,), 1.0 / n)
    x = np.arange(n, dtype=np.float32)[:, None]
    _run(w, x, 0.25)


def test_sparse_survivors():
    """Heavy-tailed weights: few survivors with large multiplicities and
    long runs of empty particles — ancestors of one output tile span many
    input blocks (the case that breaks any fixed-window formulation)."""
    rng = np.random.default_rng(3)
    n = 1024
    w = rng.pareto(0.3, n).astype(np.float32) + 1e-12
    w /= w.sum()
    x = rng.normal(size=(n, 3)).astype(np.float32)
    for u in (0.0, 0.001, 0.5, 0.999):
        _run(jnp.asarray(w), x, u)


def test_extreme_sparsity_two_survivors():
    """Only two survivors at opposite ends: maximal empty runs plus a
    chunk-boundary-straddling span."""
    n = 1024
    w = np.full(n, 1e-15, np.float32)
    w[3] = 0.6
    w[n - 2] = 0.4
    w /= w.sum()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n, 2)).astype(np.float32)
    _run(jnp.asarray(w), x, 0.42)


def test_default_tpu_tiling_shapes():
    """The production tiling (block=128, flush=16) on a conforming n."""
    rng = np.random.default_rng(5)
    n = 4096
    w = rng.random(n).astype(np.float32)
    w /= w.sum()
    x = rng.normal(size=(n, 1)).astype(np.float32)
    _run(jnp.asarray(w), x, 0.7, block=128, flush=16)


@pytest.mark.parametrize("n", [300, 1000, 1025, 4096 + 1, 500])
def test_nonconforming_n_padded(n):
    """n that is not a multiple of block*flush (or below two chunks) is
    padded internally with a dummy tail span; the sliced result must stay
    bit-identical to the XLA fill (the tomography config runs at 500k
    particles, which is not a multiple of 2048)."""
    rng = np.random.default_rng(n)
    w = rng.pareto(0.5, n).astype(np.float32) + 1e-12
    w /= w.sum()
    x = rng.normal(size=(n, 3)).astype(np.float32)
    _run(jnp.asarray(w), x, 0.31)


@pytest.mark.parametrize("d", [1, 2, 3, 4, 5, 8, 13, 16])
def test_nonaligned_d_padded(d):
    """d that is not a packable sublane count (1/2/4/multiple-of-8) is
    padded with zero columns and sliced back — process tomography runs at
    d=16, qubit state tomography at d=3."""
    n = 4096
    rng = np.random.default_rng(d)
    w = rng.pareto(0.6, n).astype(np.float32) + 1e-12
    w /= w.sum()
    x = rng.normal(size=(n, d)).astype(np.float32)
    _run(jnp.asarray(w), x, 0.42)


def test_nonconforming_n_point_mass_tail():
    """Point mass on the LAST particle with non-conforming n: the real
    span ends exactly at n, adjacent to the dummy tail span."""
    n = 1000
    w = np.full(n, 1e-15, np.float32)
    w[n - 1] = 1.0
    w /= w.sum()
    rng = np.random.default_rng(9)
    x = rng.normal(size=(n, 2)).astype(np.float32)
    _run(jnp.asarray(w), x, 0.5)


def test_every_f32_bit_pattern_exact():
    """The int8 one-hot selection must reproduce EVERY f32 bit pattern —
    subnormals, +-0, NaN payloads, the full exponent range. Ground truth
    is the literal NumPy span expansion (np.repeat): the XLA fills
    themselves flush subnormals (associative_scan under FTZ), so they
    cannot serve as the reference on these vectors."""
    rng = np.random.default_rng(11)
    n, d = 8192, 2
    w = rng.pareto(0.7, n).astype(np.float32) + 1e-12
    w /= w.sum()
    mant = rng.integers(0, 1 << 23, size=(n, d), dtype=np.int64)
    expo = rng.integers(0, 256, size=(n, d), dtype=np.int64)
    sign = rng.integers(0, 2, size=(n, d), dtype=np.int64) << 31
    x = (sign | (expo << 23) | mant).astype(np.uint32).view(np.float32)
    m, s = jax.jit(counting_multiplicities_from_u, static_argnums=2)(
        0.37, jnp.asarray(w), n)
    got = streaming_resample_locations(m, s, jnp.asarray(x))
    want = np.repeat(x, np.asarray(m), axis=0)
    np.testing.assert_array_equal(
        np.asarray(got).view(np.uint32), want.view(np.uint32))
