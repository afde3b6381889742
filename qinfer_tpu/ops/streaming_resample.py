"""Pallas streaming systematic-resample kernel — the TPU-native
replacement for the ~20-30 ms XLA scatter floor on the resampling hot path.

Reference anchor: ``src/qinfer/gpu_models.py::AcceleratedPrecessionModel``
is the reference's one native-code artifact (an OpenCL likelihood kernel);
this kernel is its TPU-native counterpart for the SECOND hot loop
(``src/qinfer/resamplers.py::LiuWestResampler.__call__`` ancestor
selection), which BASELINE.json explicitly mandates moving to Pallas.

Why a kernel at all
-------------------
The sort-free counting formulation (docs/PERF_NOTES.md) reduces systematic
resampling to: multiplicities ``m_i`` and output offsets ``starts_i`` from
ONE cumsum (sub-ms), then "write ``m_i`` copies of particle ``i`` at
``starts_i``". XLA can only express that fill as scatter + prefix fill,
and *any* scatter flavor on TPU v5e costs ~20-30 ms at 2²¹ elements — the
lowering cannot exploit that these indices are sorted and the writes
contiguous. This kernel exploits exactly that.

Streaming-merge formulation (no scatter, no gather)
---------------------------------------------------
Particle ``i`` owns the contiguous output span ``[starts_i, starts_i +
m_i)``; spans partition ``[0, n)`` and are emitted in order — so the fill
is a single left-to-right merge of input blocks against output tiles. TPU
grid steps on one core run **sequentially**, which makes a carried
accumulator correct:

* grid = input blocks of ``B`` particles (standard pipelined VMEM loads
  of their ``starts``/``stops``/coordinates);
* an SMEM-prefetched ``bounds`` array gives each block's output span
  ``[bounds[k], bounds[k+1])`` (just ``starts[::B]`` — spans are
  contiguous);
* in-kernel, a ``while_loop`` walks the output tiles intersecting the
  block's span. For each tile, interval membership
  ``M[s, i] = starts_i <= g_s < stops_i`` is built on the VPU and the
  tile's rows are produced by a **one-hot matmul on the MXU** — the
  TPU-native way to express a sorted gather. The matmul runs in
  **int8 arithmetic** on the bitcast coordinates (each f32 dim split
  into 4 bias-128 bytes, plus an ownership-count row that undoes the
  bias), so the selection is bit-exact for EVERY f32 pattern —
  subnormals, ±0, NaN, the full exponent range — at one MXU pass
  (f32 ``Precision.HIGHEST`` needs 3-6 passes, and a 3-way bf16 split
  of the float operand is inexact below ~2⁻¹⁰⁹ and at the top of the
  f32 range). Each output slot matches exactly one particle interval
  (empty particles have empty intervals), so the reassembled words
  reproduce ``x[ancestor]`` exactly.
* tiles accumulate into a ``(F, d, B)`` VMEM buffer (a boundary tile
  straddling two input blocks receives both contributions — the
  sequential carry); every ``F`` completed tiles are flushed to HBM with
  ONE aligned async copy, so DMA descriptor overhead is amortized.

Skew-proof: a point-mass weight makes one input block span every output
tile — its grid step simply iterates the while_loop ``n/B`` times while
all other blocks no-op. Total tile-iterations are ``≤ 2·n/B`` regardless
of the weight distribution (each tile is visited once per input block
overlapping it, and spans are contiguous).

Cost: ~2·n·B VPU comparisons + one int8 MXU matmul per tile + ~4 regular
passes over HBM — 5.8 ms at 2²¹ instead of the 20-30 ms scatter. Output
is BIT-IDENTICAL to the literal span expansion ``np.repeat(x, m)`` for
every f32 pattern, and to ``counting_locations_from_u`` on normal/zero
inputs (the XLA fills themselves flush subnormals under FTZ, so on
subnormal coordinates this kernel is MORE bit-faithful than the XLA
path it replaces).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["streaming_resample_locations"]

#: particle-block / output-tile size. 128 minimizes the O(n·B) VPU
#: membership-comparison cost while keeping lanes aligned.
_B = 128

#: tiles per DMA flush chunk — amortizes descriptor overhead (one copy
#: per F·B output slots).
_F = 16



def _interpret():
    return jax.default_backend() != "tpu"


def _make_kernel(block, tile, flush, group, d):
    def kernel(bounds_ref, s_ref, e_ref, x_ref, out_ref, acc, sem):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        # `group` input blocks per grid step: the sequential-grid overhead
        # (block loads, loop setup) amortizes over group·B particles —
        # at group=1 the ~16k grid steps of a 2²¹ fill dominated the
        # kernel (measured 7.7 ms vs a sub-ms roofline). The unrolled
        # sub-block walk preserves the left-to-right emission order the
        # carried accumulator relies on.
        for sub in range(group):
            blk = k * group + sub
            span_start = bounds_ref[blk]
            span_end = bounds_ref[blk + 1]
            lo = sub * block
            starts = s_ref[:, lo:lo + block]     # (1, B) int32
            stops = e_ref[:, lo:lo + block]      # (1, B) int32
            xw = x_ref[:, lo:lo + block]         # (d, B) f32
            # The one-hot selection runs on the MXU in INTEGER arithmetic
            # so it is bit-exact for EVERY f32 pattern (subnormals, ±0,
            # the top of the exponent range — a 3-way bf16 split of the
            # f32 operand is NOT exact there, and f32 HIGHEST costs 3-6
            # MXU passes). Bitcast the coordinates to i32, split each
            # dim into 4 bytes biased to i8 range, and append a row of
            # ones: one (4d+1, B) x (B, B) i8 matmul then yields, per
            # output slot, its unique ancestor's biased bytes plus a
            # 0/1 ownership count used to undo the bias (boundary tiles
            # are visited by two blocks; the count keeps the bias from
            # being applied by the non-owning block). Hoisted out of the
            # tile loop.
            xb = jax.lax.bitcast_convert_type(xw, jnp.int32)  # (d, B)
            rows = [((xb >> (8 * b)) & 0xFF) - 128 for b in range(4)]
            packed = jnp.concatenate(
                rows + [jnp.ones_like(xb[:1])]).astype(jnp.int8)

            def cond(carry):
                _, go = carry
                return go

            def body(carry, starts=starts, stops=stops, packed=packed,
                     span_end=span_end):
                t, _ = carry
                # one-hot interval membership for output tile t (slots
                # [t·tile, (t+1)·tile)) against this block's particle
                # spans; tile > block halves the while_loop trip count
                # (per-iteration fixed costs were ~35% of the kernel at
                # tile == block) at unchanged total compare lanes
                g = (jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
                     + t * tile)
                mem = ((starts <= g) & (g < stops)).astype(jnp.int8)
                sel = jax.lax.dot_general(
                    packed, mem, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)  # (4d+1, tile)
                cnt = sel[4 * d:]                      # (1, tile) 0/1
                # reassemble the i32 words from the un-biased bytes; the
                # top byte's shift relies on JAX's wrapping i32 semantics
                y = jnp.concatenate([
                    sum((sel[b * d + j:b * d + j + 1] + (cnt << 7))
                        << (8 * b) for b in range(4))
                    for j in range(d)])                # (d, tile) i32
                f = t % flush
                acc[f] = acc[f] + y

                complete = (t + 1) * tile <= span_end

                @pl.when(complete & (f == flush - 1))
                def _():
                    # the whole chunk t//flush is complete (spans are
                    # emitted left-to-right): one aligned DMA, recycle
                    dma = pltpu.make_async_copy(
                        acc, out_ref.at[t // flush], sem)
                    dma.start()
                    dma.wait()
                    acc[...] = jnp.zeros_like(acc)

                go = complete & ((t + 1) * tile < span_end)
                return (t + 1, go)

            t0 = span_start // tile
            jax.lax.while_loop(cond, body, (t0, span_start < span_end))

    return kernel


@partial(jax.jit, static_argnames=("block", "flush", "tile"))
def streaming_resample_locations(m, starts, locations, block=_B, flush=_F,
                                 tile=None):
    """Expand each particle's coordinates into its output span.

    :param m: (n,) int32 copy counts (``Σ m = n``), from
        :func:`qinfer_tpu.resamplers.counting_multiplicities_from_u`.
    :param starts: (n,) int32 first output slot per particle (the
        exclusive cumsum of ``m`` — free from the same counting pass).
    :param locations: (n, d) f32 particle coordinates.
    :param tile: output-tile slots per while_loop iteration (default
        ``2 * block`` — two output tiles per iteration, halving the
        per-iteration fixed costs; must be a multiple of ``block``).
    :return: (n, d) resampled locations, bit-identical to the span
        expansion ``np.repeat(locations, m, axis=0)`` with the same
        ``(m, starts)`` (and to ``counting_locations_from_u`` away from
        subnormals, which XLA's fills flush).
    """
    n, d = locations.shape
    tile = 2 * block if tile is None else tile
    if tile % block:
        raise ValueError("tile must be a multiple of block")
    chunk = tile * flush
    # Sublane alignment: the (d, block) VMEM tiles and the (flush, d,
    # block) DMA to HBM abort on-chip when d is not a packable sublane
    # count (measured: d in {1,2,4,8} ok, d=5 ABORTED on v5e). Pad the
    # coordinate axis up to the next power of two (<=8) or multiple of 8;
    # the zero columns ride along and are sliced off at the end.
    d_out = d
    d_pad = (1 << (d - 1).bit_length()) if d <= 8 else -(-d // 8) * 8
    if d_pad != d:
        locations = jnp.pad(locations.astype(jnp.float32),
                            ((0, 0), (0, d_pad - d)))
        d = d_pad
    # Arbitrary n: pad to a whole number of flush chunks (and at least two,
    # so the pipeline has work). ONE dummy particle owns the tail span
    # [n, n_pad) — spans must partition the padded output so every chunk
    # completes and gets its DMA flush — and the remaining pad particles are
    # empty. Slots < n each still match exactly one real span, so the
    # sliced result is bit-identical to the unpadded fill.
    n_out = n
    n_pad = max(-(-n // chunk) * chunk, 2 * chunk)
    if n_pad != n:
        pad = n_pad - n
        m = jnp.concatenate([
            m.astype(jnp.int32),
            jnp.full((1,), pad, jnp.int32),
            jnp.zeros((pad - 1,), jnp.int32)])
        starts = jnp.concatenate([
            starts.astype(jnp.int32),
            jnp.full((1,), n, jnp.int32),
            jnp.full((pad - 1,), n_pad, jnp.int32)])
        locations = jnp.concatenate(
            [locations.astype(jnp.float32),
             jnp.zeros((pad, d), jnp.float32)])
        n = n_pad
    n_chunks = n // chunk
    # input blocks per grid step (amortizes sequential-grid overhead);
    # group = chunk/block means each step consumes exactly one OUTPUT
    # chunk's worth of input, so the padded n is a whole number of both
    # grid steps and DMA chunks
    group = chunk // block
    span = block * group

    stops = starts + m
    # each block's output span start; final bound closes the last span
    bounds = jnp.concatenate(
        [starts[::block], jnp.array([n], jnp.int32)])

    # row layouts — TPU block shapes must have their second-to-last dim
    # equal to the full array dim (or a multiple of 8), so the per-block
    # windows are cut along the LANE axis of flat (1, n) / (d, n) arrays
    s2d = starts.reshape(1, n)
    e2d = stops.reshape(1, n)
    # lanes run along the particle axis (d is tiny)
    x2d = locations.astype(jnp.float32).T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // span,),
        in_specs=[
            pl.BlockSpec((1, span), lambda k, b: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, span), lambda k, b: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, span), lambda k, b: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((flush, d, tile), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(block, tile, flush, group, d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, flush, d, tile), jnp.int32),
        interpret=_interpret(),
    )(bounds, s2d, e2d, x2d)
    out = jax.lax.bitcast_convert_type(out, jnp.float32)
    return jnp.transpose(out, (2, 0, 1, 3)).reshape(d, n).T[:n_out, :d_out]
