"""Isolate the dim-16-Choi (embedded 32x32) resample-path costs on-chip.

Times K-chained scans of each phase of the 2-qubit process-tomography
resample: (a) the jnp.linalg.eigh PSD projection fallback, (b) the
unrolled-Cholesky validity pass, (c) one full Liu-West resample at
(n, 255). Per PERF_NOTES rule #8, each phase is one compiled scan with
K >= 100 and a single final block_until_ready; cross-check the timing
scales with K before trusting it.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_d32.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def timed_scan(fn, x0, K, label, results):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), ()
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    out = run(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    results[label] = round(dt / K * 1e3, 3)
    print(label, results[label], "ms/iter", flush=True)
    return out


def main():
    n = 50_000
    from qinfer_tpu import tomography as tomo
    from qinfer_tpu.tomography.models import ProcessTomographyModel
    from qinfer_tpu.resamplers import LiuWestResampler
    from qinfer_tpu.tomography.bases import batched_cholesky_small

    b1 = tomo.pauli_basis(2)
    b2 = tomo.pauli_basis(4)
    model = ProcessTomographyModel(b2, b1)
    prior = tomo.BCSZChoiDistribution(b2)
    mp = prior.sample(jax.random.key(0), n)  # (n, 255)

    results = {}

    # (a) embedded states + eigh + rebuild (the canonicalize fallback)
    def project(x):
        m = model._embedded_states(x)             # (n, 32, 32)
        ev, V = jnp.linalg.eigh(m)
        ev = jnp.clip(ev, 0.0, None)
        tr = jnp.sum(ev, axis=-1, keepdims=True)
        ev = 2.0 * ev / jnp.clip(tr, 1e-35, None)
        m2 = jnp.einsum("nab,nb,ncb->nac", V, ev, V)
        coords = model.basis.embedded_to_coords(m2)
        return coords[..., 1:].astype(x.dtype)

    # K=100 of the batched 32x32 eigh in ONE program faults the device
    # (UNAVAILABLE kernel fault — likely an execution watchdog; K=20
    # faulted too at 3.63 s/call). K=10 measured 3630 ms/iter.
    if "--eigh" in sys.argv:
        timed_scan(project, mp, 10, "eigh_project_32_K10", results)

    # (b) validity: unrolled Cholesky at embedded d=32
    def validity(x):
        m = model._embedded_states(x)
        eye = jnp.eye(m.shape[-1], dtype=m.dtype)
        L = batched_cholesky_small(m + 1e-3 * eye)
        ok = ~jnp.any(jnp.isnan(L), axis=(-2, -1))
        # Keep the Cholesky live: couple the carry ADDITIVELY to the
        # validity count. A multiplicative `x * (1 + 0*sum(ok))` can be
        # algebraically folded to `x` (0*finite → 0), letting XLA
        # dead-code-eliminate the whole measured computation; an additive
        # 1e-30*count perturbation has no such simplification.
        return x + 1e-30 * jnp.sum(ok.astype(x.dtype))

    timed_scan(validity, mp, 100, "cholesky_validity_32", results)

    # (c) one full Liu-West resample at (n, 255)
    rs = LiuWestResampler(a=0.98, maxiter=4)
    w = jnp.full((n,), 1.0 / n)

    def resample(carry):
        x, key = carry
        key, sub = jax.random.split(key)
        w2, x2, _ = rs.call_with_diagnostics(model, sub, w, x)
        return (x2, key)

    # K sized for the ~1 min execution watchdog: one resample at 255
    # dims ≈ 0.1-0.3 s with the looped-Jacobi projection
    timed_scan(resample, (mp, jax.random.key(1)), 50,
               "liu_west_resample_255", results)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
