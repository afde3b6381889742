"""Fused Pallas kernel for the precession-model SMC update.

The TPU-native replacement for the reference's OpenCL likelihood kernel
(``src/qinfer/gpu_models.py::AcceleratedPrecessionModel`` — cos² over a
particle × experiment grid). Where the reference only offloads the cos²
table, this kernel fuses the ENTIRE per-step weight update into one pass
over HBM:

    pr0_i   = cos²(ω_i t / 2)
    ℓ_i     = outcome == 0 ? pr0_i : 1 − pr0_i
    h_i     = w_i · ℓ_i
    returns h (unnormalized weights) plus the step's three global
    reductions: Σ h (normalization), Σ h² (for ESS), Σ h ω (first moment)

so the engine finishes normalization + ESS + mean with O(1) extra work
instead of three more HBM sweeps. Particle vectors are viewed as
``(n/128, 128)`` tiles (f32 native layout); grid iterations on a TPU core
run sequentially, so partial sums accumulate safely into one accumulator
block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_precession_update", "precession_pr0"]

_LANES = 128
_ROWS = 16          # sublane rows per grid step -> block = 16 * 128 = 2048
_BLOCK = _ROWS * _LANES


def _interpret():
    return jax.default_backend() != "tpu"


def _update_kernel(scalars_ref, omega_ref, w_ref, hyp_ref, sums_ref):
    """One grid step: fused likelihood × weight for a (ROWS, 128) particle
    tile.

    scalars_ref (SMEM): [t, outcome_is_zero]
    omega_ref / w_ref (VMEM): (ROWS, 128) tiles of frequencies / weights
    hyp_ref (VMEM): (ROWS, 128) unnormalized posterior weights out
    sums_ref (VMEM): (8, 128) accumulator; rows 0..2 accumulate the lane-
                     parallel partials of Σh, Σh², Σhω across grid steps
    """
    i = pl.program_id(0)

    t = scalars_ref[0]
    out_is_zero = scalars_ref[1]

    omega = omega_ref[:]
    w = w_ref[:]

    c = jnp.cos(omega * (t * 0.5))
    pr0 = c * c
    ell = jnp.where(out_is_zero > 0, pr0, 1.0 - pr0)
    hyp = w * ell
    hyp_ref[:] = hyp

    h_sum = jnp.sum(hyp, axis=0)           # (128,)
    h2_sum = jnp.sum(hyp * hyp, axis=0)
    hw_sum = jnp.sum(hyp * omega, axis=0)

    @pl.when(i == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    sums_ref[0, :] = sums_ref[0, :] + h_sum
    sums_ref[1, :] = sums_ref[1, :] + h2_sum
    sums_ref[2, :] = sums_ref[2, :] + hw_sum


@partial(jax.jit, static_argnames=("rows_per_block", "normalize"))
def fused_precession_update(omega, weights, t, outcome,
                            rows_per_block=_ROWS, normalize=True):
    """Fused SMC reweighting step for ``SimplePrecessionModel``.

    :param omega: (n,) particle frequencies; n must be a multiple of
        ``rows_per_block * 128`` (the engine pads ensembles to tile
        boundaries).
    :param weights: (n,) current normalized weights.
    :param t: scalar evolution time.
    :param outcome: scalar observed outcome (0 or 1).
    :return: ``(new_weights, norm, ess, mean)`` — normalized posterior
        weights plus the step's normalization, effective sample size and
        posterior mean frequency.
    """
    n = omega.shape[0]
    block = rows_per_block * _LANES
    if n % block:
        raise ValueError(f"n={n} must be a multiple of {block}")
    grid = n // block

    scalars = jnp.array(
        [t, jnp.where(jnp.asarray(outcome) == 0, 1.0, 0.0)],
        dtype=jnp.float32)
    omega2d = omega.astype(jnp.float32).reshape(-1, _LANES)
    w2d = weights.astype(jnp.float32).reshape(-1, _LANES)

    hyp, sums = pl.pallas_call(
        _update_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows_per_block, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows_per_block, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((8, _LANES), jnp.float32),
        ],
        interpret=_interpret(),
    )(scalars, omega2d, w2d)

    norm = jnp.sum(sums[0])
    sum_h2 = jnp.sum(sums[1])
    sum_hw = jnp.sum(sums[2])
    safe = jnp.maximum(norm, 1e-35)
    out_w = (hyp / safe if normalize else hyp).reshape(n)
    ess = safe * safe / jnp.maximum(sum_h2, 1e-35)
    mean = sum_hw / safe
    return out_w, norm, ess, mean


def _pr0_kernel(scalars_ref, omega_ref, out_ref):
    t = scalars_ref[0]
    c = jnp.cos(omega_ref[:] * (t * 0.5))
    out_ref[:] = c * c


@partial(jax.jit, static_argnames=("rows_per_block",))
def precession_pr0(omega, t, rows_per_block=_ROWS):
    """Pr(0 | ω; t) table via Pallas — the direct analogue of the
    reference's OpenCL kernel (``gpu_models.py``): cos²(ωt/2) over the
    particle grid for one experiment time."""
    n = omega.shape[0]
    block = rows_per_block * _LANES
    if n % block:
        raise ValueError(f"n={n} must be a multiple of {block}")
    scalars = jnp.array([t], dtype=jnp.float32)
    out = pl.pallas_call(
        _pr0_kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows_per_block, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_block, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.float32),
        interpret=_interpret(),
    )(scalars, omega.astype(jnp.float32).reshape(-1, _LANES))
    return out.reshape(n)
