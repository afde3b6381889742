"""Worker process for the REAL 2-process ``jax.distributed`` test
(VERDICT r3 #3). Launched by tests/test_multiprocess.py as

    python tests/_multiprocess_worker.py <process_id> <num_processes> <coord>

Each process contributes 2 virtual CPU devices to a process-spanning
4-device mesh, runs ONE fused SMC update + a forced
``DistributedLiuWestResampler`` resample + posterior moments, and prints
the (replicated) results as one JSON line. The parent asserts both
processes agree with each other and with a single-process 4-device
reference — the cross-host leg of the BASELINE scaling bar (reference
anchor: ``src/qinfer/parallel.py::DirectViewParallelizedModel``, the
ipyparallel controller/engine analogue).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp
import numpy as np


def main():
    proc_id, n_proc, coord = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3])
    from qinfer_tpu.parallel import initialize_multihost

    initialize_multihost(coordinator_address=coord,
                         num_processes=n_proc, process_id=proc_id)
    assert jax.process_count() == n_proc, jax.process_count()
    n_dev = len(jax.devices())
    assert n_dev == 2 * n_proc, n_dev

    import qinfer_tpu as q
    from qinfer_tpu.parallel import ParticleMesh
    from qinfer_tpu.parallel.resample import DistributedLiuWestResampler
    from qinfer_tpu.smc import SMCState, _update_step_impl

    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    pmesh = ParticleMesh()  # all 4 global devices
    n = 4096

    # identical host-side trace on every process (multi-controller SPMD):
    # the prior ensemble and the experiment are derived from fixed keys
    x_host = np.asarray(prior.sample(jax.random.key(0), n))
    w_host = np.full((n,), 1.0 / n, np.float32)

    def put(host, sharding):
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx])

    x = put(x_host, pmesh.location_sharding)
    w = put(w_host, pmesh.particle_sharding)

    # one fused update (XLA auto-collectives over the process-spanning
    # mesh handle the reduction)
    state = SMCState.initial(x, jax.random.key(1))
    state = state._replace(weights=w, locations=x)
    eps = {"t": jnp.full((1,), 4.3, jnp.float32)}
    outcome = jnp.ones((1,), jnp.int32)
    new_state, log_norm, _ = _update_step_impl(
        model, q.LiuWestResampler(a=0.98), state, outcome, eps,
        0.0,  # resample_thresh 0: never fires inside the step
        1e-10, check_resample=True)

    # forced distributed resample (explicit shard_map psum/ppermute path)
    rs = DistributedLiuWestResampler(pmesh.mesh, a=0.98, exchange="ring")
    w2, x2 = rs(model, jax.random.key(2), new_state.weights,
                new_state.locations)

    # posterior moments (replicated outputs are fully addressable)
    @jax.jit
    def moments(w, x):
        mu = jnp.sum(w[:, None] * x, axis=0)
        xc = x - mu[None, :]
        cov = (w[:, None] * xc).T @ xc
        return mu, cov

    mu, cov = moments(w2, x2)
    out = {
        "process_id": proc_id,
        "process_count": jax.process_count(),
        "n_global_devices": n_dev,
        "log_norm": float(log_norm),
        "mean": np.asarray(mu).tolist(),
        "cov": np.asarray(cov).tolist(),
        "weights_uniform": bool(np.allclose(
            np.asarray(jax.jit(lambda w: jnp.max(jnp.abs(w - 1.0 / n)))(w2)),
            0.0, atol=1e-9)),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
