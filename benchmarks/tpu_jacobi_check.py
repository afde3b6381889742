"""On-TPU validation + timing of the lane-parallel Jacobi kernel.

Checks `jacobi_eigh_lanes` / `jacobi_project_lanes` (ops/jacobi.py)
against the host float64 eigh at the production shape (1e5, 8, 8),
including degenerate spectra, then times K=100 chained projections
inside one compiled scan (K=20 probes read ~0 through the tunnel's
host-side caching — docs/PERF_NOTES.md rule #8).

Run sequentially — ONE TPU client at a time (CLAUDE.md rule 2).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from qinfer_tpu.ops.jacobi import (  # noqa: E402
    jacobi_eigh_lanes,
    jacobi_project_lanes,
    jacobi_project_lanes_looped,
)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    if "--d32" in sys.argv:
        # the LOOPED kernel (schedule in SMEM): embedded dim-16 Choi
        # states — two-qubit channels. jnp.linalg.eigh at this shape
        # measures 3.63 s/call on the v5e (probe_d32.py); K=100 of it
        # in one program faults the device.
        n, d = 50_000, 32
    else:
        n, d = (50_000, 16) if "--d16" in sys.argv else (100_000, 8)
    project = (jacobi_project_lanes_looped if d > 16
               else jacobi_project_lanes)
    B = rng.normal(size=(n, d, d)).astype(np.float32)
    A = (B + B.transpose(0, 2, 1)) / 2
    # adversarial rows: identity, rank-deficient, clustered/negative
    A[0] = np.eye(d)
    A[1] = np.diag([1.0] * (d // 2) + [0.0] * (d // 2))
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    spec = np.resize([2, 2, 1e-7, 1e-7, -1e-3, -1e-3, 0.5, 0.5], d)
    A[2] = Q @ np.diag(spec) @ Q.T
    A[2] = ((A[2] + A[2].T) / 2).astype(np.float32)
    Aj = jnp.asarray(A)

    if d <= 16:
        ev, V = jacobi_eigh_lanes(Aj)
        evs = np.sort(np.asarray(ev), -1)
        want = np.sort(np.linalg.eigvalsh(A.astype(np.float64)), -1)
        print("eigh: max ev err vs host f64:",
              float(np.max(np.abs(evs - want))), flush=True)
        rec = np.einsum("nab,nb,ncb->nac", np.asarray(V), np.asarray(ev),
                        np.asarray(V))
        print("eigh: max reconstruction err:",
              float(np.max(np.abs(rec - A))), flush=True)

    got = np.asarray(project(Aj))
    ev64, V64 = np.linalg.eigh(A.astype(np.float64))
    ev64 = np.clip(ev64, 0, None)
    ev64 = 2.0 * ev64 / np.clip(ev64.sum(-1, keepdims=True), 1e-35, None)
    want_p = np.einsum("nab,nb,ncb->nac", V64, ev64, V64)
    print("project: max err vs host f64:",
          float(np.max(np.abs(got - want_p))), flush=True)

    K = 100

    @jax.jit
    def run(A0):
        def step(Ac, _):
            A2 = project(Ac)
            return A2, jnp.sum(A2[:, 0, 0])
        Af, ys = jax.lax.scan(step, A0, jnp.arange(K))
        return ys.sum() + jnp.sum(Af)

    r = run(Aj)
    r.block_until_ready()
    t0 = time.perf_counter()
    run(Aj).block_until_ready()
    print(f"fused projection: {(time.perf_counter() - t0) / K * 1e3:.2f} "
          f"ms at ({n}, {d}, {d}) [K={K}]", flush=True)


if __name__ == "__main__":
    main()
