"""Pallas batched small-symmetric-eigh kernel (parallel-ordered Jacobi).

Reference anchor: ``src/qinfer/tomography/models.py::TomographyModel``
(PSD canonicalization) — the reference projects via ``np.linalg.eigh``
on the host; this kernel is the TPU-native equivalent for the hot path.

Why a kernel
------------
``batched_jacobi_eigh_small`` (`tomography/bases.py`) expresses one
cyclic-Jacobi round as batched d×d matmuls. Each of the ``sweeps·(d−1)``
rounds is a data-dependent full pass over the ``(n, d, d)`` batch in
HBM, and d×d=8×8 batched matmuls cannot tile the 128×128 MXU — measured
**144 ms** per projection at (1e5, 8, 8) on v5e, which made every
`DiffusiveTomographyModel` step (and every strict post-resample
canonicalize) pay ~0.14 s.

This kernel flips the layout: **particles ride the vector lanes**. The
input is staged as ``(d·d, 8, 128)`` tiles — matrix entry (i, j) of
1024 particles is ONE native ``(8, 128)`` vector register — and ALL
rotation rounds run in registers/VMEM between a single HBM read and a
single HBM write. Every rotation is a handful of elementwise VPU ops on
1024 particles at once; there are no matmuls, no gathers, no scatters,
and exactly 2 HBM passes instead of ~250.

Within a round-robin round the pair rotations act on disjoint planes,
so applying them sequentially equals the simultaneous product (the
rotations commute) — bitwise-identical plane arithmetic to the jnp
formulation, modulo f32 reassociation inside the two-sided update,
which both implementations do in the same order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["jacobi_eigh_lanes", "jacobi_project_lanes",
           "jacobi_project_lanes_looped"]

#: particles per grid step: one (8, 128) vector tile per matrix entry.
_NB = 1024


def _round_robin_rounds(d):
    """Round-robin (circle-method) pairing — same schedule as
    ``tomography.bases._round_robin_rounds`` (kept in sync by test)."""
    others = list(range(1, d))
    rounds = []
    for _ in range(d - 1):
        ring = [0] + others
        rounds.append([(min(ring[i], ring[d - 1 - i]),
                        max(ring[i], ring[d - 1 - i]))
                       for i in range(d // 2)])
        others = [others[-1]] + others[:-1]
    return rounds


def _make_kernel(d, sweeps, project=False, trace=2.0, eps=1e-35):
    rounds = _round_robin_rounds(d)

    def _iterate(a_ref):
        """Load the batch (entry (i, j) = one (8, 128) tile) and run all
        rotation rounds in-register; returns the worked A and V lists."""
        A = [[a_ref[i * d + j] for j in range(d)] for i in range(d)]
        one = jnp.ones_like(A[0][0])
        zero = jnp.zeros_like(A[0][0])
        V = [[one if i == j else zero for j in range(d)] for i in range(d)]

        for _ in range(sweeps):
            for pairs in rounds:
                for p, q in pairs:
                    apq, app, aqq = A[p][q], A[p][p], A[q][q]
                    small = jnp.abs(apq) <= 1e-30
                    theta = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
                    sgn = jnp.where(theta >= 0, 1.0, -1.0)
                    # t = tan(phi); theta² overflow on denormal apq
                    # yields t = 0 (skipped rotation), never NaN
                    t = sgn / (jnp.abs(theta)
                               + jnp.sqrt(theta * theta + 1.0))
                    c = 1.0 / jnp.sqrt(t * t + 1.0)
                    s = t * c
                    c = jnp.where(small, 1.0, c)
                    s = jnp.where(small, 0.0, s)
                    # two-sided plane rotation A ← GᵀAG, G=[[c,s],[−s,c]]
                    # on rows/cols p, q (elementwise over the particle
                    # lanes; all other entries untouched)
                    for r in range(d):
                        arp, arq = A[r][p], A[r][q]
                        A[r][p] = c * arp - s * arq
                        A[r][q] = s * arp + c * arq
                    for r in range(d):
                        apr, aqr = A[p][r], A[q][r]
                        A[p][r] = c * apr - s * aqr
                        A[q][r] = s * apr + c * aqr
                    for r in range(d):
                        vrp, vrq = V[r][p], V[r][q]
                        V[r][p] = c * vrp - s * vrq
                        V[r][q] = s * vrp + c * vrq
        return A, V

    def kernel(a_ref, ev_ref, v_ref):
        A, V = _iterate(a_ref)
        for i in range(d):
            ev_ref[i] = A[i][i]
            for j in range(d):
                v_ref[i * d + j] = V[i][j]

    def kernel_project(a_ref, out_ref):
        # same iteration, but finish with the PSD projection in-register:
        # clip negatives, renormalize the (embedded) trace, rebuild
        # V diag(ev) Vᵀ — saves the two batched tiny-matmul passes the
        # jnp reconstruction would cost outside, plus the ev/V writes
        A, V = _iterate(a_ref)
        ev = [jnp.maximum(A[i][i], 0.0) for i in range(d)]
        tr = ev[0]
        for i in range(1, d):
            tr = tr + ev[i]
        scale = trace / jnp.maximum(tr, eps)
        W = [[V[i][b] * (ev[b] * scale) for b in range(d)]
             for i in range(d)]
        for i in range(d):
            for j in range(i, d):
                acc = W[i][0] * V[j][0]
                for b in range(1, d):
                    acc = acc + W[i][b] * V[j][b]
                out_ref[i * d + j] = acc
                if j > i:
                    out_ref[j * d + i] = acc

    return kernel_project if project else kernel


def _make_kernel_looped(d, sweeps, trace=2.0, eps=1e-35):
    """Projection kernel for LARGE d (> 16): rotation schedule streamed
    from SMEM with dynamically-indexed VMEM tiles, ``fori_loop`` over
    sweeps × rounds — compile size O(d) per round instead of
    O(sweeps·d³) total, which is what makes embedded d = 32 (dim-16 Choi
    states: two-qubit channels) compile in seconds rather than tens of
    minutes. Arithmetic per rotation is IDENTICAL to the unrolled
    kernel (same plane-update ordering), so the two agree bitwise on
    shared shapes modulo nothing — the only difference is code shape.

    VMEM budget: in-block (d²·4 KB) is rotated IN PLACE (input blocks
    are private VMEM copies), the eigenvector accumulator is a scratch
    of the same size, and the output block holds the rebuilt
    projection: 3·d²·4 KB = 12 MB at d = 32 — inside the ~16 MB/core
    VMEM only when the grid is NOT double-buffered, so the wrapper
    dispatches one grid step per call and ``lax.map``s over 1024-
    particle chunks.
    """
    rounds = _round_robin_rounds(d)
    n_rounds = len(rounds)

    def kernel(sp_ref, sq_ref, a_ref, out_ref, v_ref):
        one = jnp.ones_like(a_ref[0])
        zero = jnp.zeros_like(a_ref[0])
        for i in range(d):
            for j in range(d):
                v_ref[i * d + j] = one if i == j else zero

        def rotation(p, q):
            apq, app, aqq = a_ref[p * d + q], a_ref[p * d + p], a_ref[q * d + q]
            small = jnp.abs(apq) <= 1e-30
            theta = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
            sgn = jnp.where(theta >= 0, 1.0, -1.0)
            t = sgn / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
            c = 1.0 / jnp.sqrt(t * t + 1.0)
            s = t * c
            c = jnp.where(small, 1.0, c)
            s = jnp.where(small, 0.0, s)
            for r in range(d):
                arp, arq = a_ref[r * d + p], a_ref[r * d + q]
                a_ref[r * d + p] = c * arp - s * arq
                a_ref[r * d + q] = s * arp + c * arq
            for r in range(d):
                apr, aqr = a_ref[p * d + r], a_ref[q * d + r]
                a_ref[p * d + r] = c * apr - s * aqr
                a_ref[q * d + r] = s * apr + c * aqr
            for r in range(d):
                vrp, vrq = v_ref[r * d + p], v_ref[r * d + q]
                v_ref[r * d + p] = c * vrp - s * vrq
                v_ref[r * d + q] = s * vrp + c * vrq

        def round_body(k, _):
            for pair in range(d // 2):
                rotation(sp_ref[k, pair], sq_ref[k, pair])
            return 0

        jax.lax.fori_loop(
            0, sweeps * n_rounds,
            lambda it, c: round_body(it % n_rounds, c), 0)

        # PSD projection epilogue: clip, trace-renormalize, rebuild
        # P = V diag(ev·scale) Vᵀ. Rows are STATIC (unrolled) with a
        # fori_loop over the upper-triangle columns; each dot is written
        # to BOTH (i,j) and (j,i) so the output is exactly symmetric
        # (independent recomputation differs in the last ulp under FMA
        # contraction) and the rebuild does half the work. The W =
        # V·diag row is recomputed per row instead of staged — saves a
        # third d²-tile VMEM buffer.
        ev = [jnp.maximum(a_ref[i * d + i], 0.0) for i in range(d)]
        tr = ev[0]
        for i in range(1, d):
            tr = tr + ev[i]
        scale = trace / jnp.maximum(tr, eps)
        evs = [ev[b] * scale for b in range(d)]

        for i in range(d):
            wi = [v_ref[i * d + b] * evs[b] for b in range(d)]

            def out_col(j, _, wi=wi, i=i):
                acc = wi[0] * v_ref[j * d]
                for b in range(1, d):
                    acc = acc + wi[b] * v_ref[j * d + b]
                out_ref[i * d + j] = acc
                out_ref[j * d + i] = acc
                return 0

            jax.lax.fori_loop(i, d, out_col, 0)

    return kernel, np.asarray(rounds)


@partial(jax.jit, static_argnames=("sweeps", "trace", "eps", "interpret"))
def jacobi_project_lanes_looped(a, sweeps=6, trace=2.0, eps=1e-35,
                                interpret=False):
    """PSD-cone projection for LARGE small-matrix batches (d > 16, e.g.
    embedded 32×32 dim-16 Choi states). Same contract as
    :func:`jacobi_project_lanes`; see :func:`_make_kernel_looped` for
    why the rotation schedule is looped instead of unrolled. One grid
    step per ``pallas_call`` (3·d²·4 KB VMEM already at the budget —
    double-buffering would overflow), ``lax.map`` over chunks."""
    n, d, _ = a.shape
    if d % 2:
        raise ValueError("jacobi_project_lanes_looped requires even d")
    n_pad = -(-n // _NB) * _NB
    if n_pad != n:
        eye = jnp.broadcast_to(jnp.eye(d, dtype=a.dtype),
                               (n_pad - n, d, d))
        a = jnp.concatenate([a, eye])
    nb = n_pad // _NB
    a2 = (a.reshape(nb, 8, 128, d * d)
           .transpose(0, 3, 1, 2))  # (nb, d*d, 8, 128)
    kernel, rounds = _make_kernel_looped(d, int(sweeps), float(trace),
                                         float(eps))
    sp = jnp.asarray(rounds[:, :, 0], jnp.int32)
    sq = jnp.asarray(rounds[:, :, 1], jnp.int32)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((d * d, 8, 128), lambda: (0, 0, 0))],
        out_specs=pl.BlockSpec((d * d, 8, 128), lambda: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((d * d, 8, 128), a.dtype),
        scratch_shapes=[pltpu.VMEM((d * d, 8, 128), a.dtype)],
        interpret=interpret,
    )
    out = jax.lax.map(lambda blk: call(sp, sq, blk), a2)
    return (out.reshape(nb, d * d, 8, 128).transpose(0, 2, 3, 1)
               .reshape(n_pad, d, d)[:n])


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def jacobi_eigh_lanes(a, sweeps=6, interpret=False):
    """Eigendecomposition of a batch of small symmetric matrices
    ``(n, d, d)`` with the particle axis on the vector lanes.

    Returns ``(ev, V)`` with ``a ≈ V @ diag(ev) @ V.T`` (eigenvalues
    UNSORTED), matching ``batched_jacobi_eigh_small``'s contract and
    rotation schedule. d must be even (callers pad odd d).
    """
    n, d, _ = a.shape
    if d % 2:
        raise ValueError("jacobi_eigh_lanes requires even d (pad first)")
    n_pad = -(-n // _NB) * _NB
    if n_pad != n:
        # pad with identity matrices — a fixed point of the iteration
        eye = jnp.broadcast_to(jnp.eye(d, dtype=a.dtype),
                               (n_pad - n, d, d))
        a = jnp.concatenate([a, eye])
    nb = n_pad // _NB
    # (n, d, d) -> (d*d, nb·8, 128): entry-major, particles on lanes —
    # one grid step owns an (8, 128) sublane×lane tile per matrix entry
    a2 = (a.reshape(nb, 8, 128, d * d)
           .transpose(3, 0, 1, 2).reshape(d * d, nb * 8, 128))
    ev, v = pl.pallas_call(
        _make_kernel(d, int(sweeps)),
        grid=(nb,),
        in_specs=[pl.BlockSpec((d * d, 8, 128), lambda k: (0, k, 0))],
        out_specs=[pl.BlockSpec((d, 8, 128), lambda k: (0, k, 0)),
                   pl.BlockSpec((d * d, 8, 128), lambda k: (0, k, 0))],
        out_shape=[jax.ShapeDtypeStruct((d, nb * 8, 128), a.dtype),
                   jax.ShapeDtypeStruct((d * d, nb * 8, 128), a.dtype)],
        interpret=interpret,
    )(a2)
    ev = (ev.reshape(d, nb, 8, 128).transpose(1, 2, 3, 0)
            .reshape(n_pad, d)[:n])
    v = (v.reshape(d * d, nb, 8, 128).transpose(1, 2, 3, 0)
           .reshape(n_pad, d, d)[:n])
    return ev, v


@partial(jax.jit, static_argnames=("sweeps", "trace", "eps", "interpret"))
def jacobi_project_lanes(a, sweeps=6, trace=2.0, eps=1e-35,
                         interpret=False):
    """PSD-cone projection of a batch of small symmetric matrices
    ``(n, d, d)``: eigendecompose (same lane-parallel Jacobi as
    :func:`jacobi_eigh_lanes`), clip negative eigenvalues, renormalize
    the trace to ``trace``, and rebuild — all inside the kernel, so the
    whole projection is ONE HBM read + ONE HBM write. This is the hot
    op of ``TomographyModel.canonicalize`` (general dim) and of every
    ``DiffusiveTomographyModel`` step."""
    n, d, _ = a.shape
    if d % 2:
        raise ValueError("jacobi_project_lanes requires even d")
    n_pad = -(-n // _NB) * _NB
    if n_pad != n:
        eye = jnp.broadcast_to(jnp.eye(d, dtype=a.dtype),
                               (n_pad - n, d, d))
        a = jnp.concatenate([a, eye])
    nb = n_pad // _NB
    a2 = (a.reshape(nb, 8, 128, d * d)
           .transpose(3, 0, 1, 2).reshape(d * d, nb * 8, 128))
    out = pl.pallas_call(
        _make_kernel(d, int(sweeps), project=True, trace=float(trace),
                     eps=float(eps)),
        grid=(nb,),
        in_specs=[pl.BlockSpec((d * d, 8, 128), lambda k: (0, k, 0))],
        out_specs=pl.BlockSpec((d * d, 8, 128), lambda k: (0, k, 0)),
        out_shape=jax.ShapeDtypeStruct((d * d, nb * 8, 128), a.dtype),
        interpret=interpret,
    )(a2)
    return (out.reshape(d * d, nb, 8, 128).transpose(1, 2, 3, 0)
               .reshape(n_pad, d, d)[:n])
