"""Scaling-efficiency benchmark: particle-updates/s at 1 device vs N.

BASELINE.md target: >= 80% samples/s scaling efficiency from 1 host to
N >= 2 hosts. Real multi-host hardware is not available in this
environment, so this harness measures the same quantity over any mesh JAX
exposes (one real chip; or a virtual N-device CPU mesh via
``--virtual N``, which validates the sharding/collective structure rather
than wall-clock speedup).

Usage:
    python benchmarks/scaling.py               # real devices
    python benchmarks/scaling.py --virtual 8   # 8 virtual CPU devices

Prints one JSON line:
    {"metric": "scaling_efficiency", "n_devices": N,
     "updates_per_s_1dev": ..., "updates_per_s_Ndev": ..., "value": eff}
"""

import argparse
import json
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--virtual", type=int, default=0,
                        help="force N virtual CPU devices")
    parser.add_argument("--particles-per-device", type=int,
                        default=1 << 20)
    parser.add_argument("--steps", type=int, default=64)
    args = parser.parse_args()

    import os

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import qinfer_tpu as q
    from qinfer_tpu.smc import SMCState, _update_step_impl
    from qinfer_tpu.resamplers import LiuWestResampler

    from qinfer_tpu.parallel.resample import DistributedLiuWestResampler

    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    devices = jax.devices()
    n_dev = len(devices)

    def throughput(device_list, n_particles):
        mesh = Mesh(np.asarray(device_list), ("particles",))
        # distributed two-level resampler when multi-device, plain otherwise
        if len(device_list) > 1:
            resampler = DistributedLiuWestResampler(mesh, a=0.98)
        else:
            resampler = LiuWestResampler(a=0.98)
        shard = NamedSharding(mesh, P("particles"))
        shard2d = NamedSharding(mesh, P("particles", None))
        repl = NamedSharding(mesh, P())

        key = jax.random.key(0)
        kp, kr = jax.random.split(key)
        base = SMCState.initial(prior.sample(kp, n_particles), kr)
        state = SMCState(
            weights=jax.device_put(base.weights, shard),
            locations=jax.device_put(base.locations, shard2d),
            key=jax.device_put(base.key, repl),
            resample_count=jax.device_put(base.resample_count, repl),
            just_resampled=jax.device_put(base.just_resampled, repl),
            log_total_likelihood=jax.device_put(
                base.log_total_likelihood, repl),
            min_n_ess=jax.device_put(base.min_n_ess, repl),
            zero_weight_count=jax.device_put(base.zero_weight_count, repl),
            resampler_fallback_count=jax.device_put(
                base.resampler_fallback_count, repl),
        )
        true = jax.device_put(jnp.array([[0.7]], dtype=jnp.float32), repl)

        def step(carry, idx):
            st, key = carry
            key, k1, k2, ks = jax.random.split(key, 4)
            logits = jnp.log(jnp.clip(st.weights, 1e-35, None))
            i = jax.random.categorical(k1, logits)
            j = jax.random.categorical(k2, logits)
            sep = jnp.abs(st.locations[i, 0] - st.locations[j, 0])
            t = 1.0 / jnp.maximum(sep, 1e-12)
            eps = {"t": t[None]}
            o = model.simulate_experiment(ks, true, eps).reshape(-1)[0]
            new, _, _ = _update_step_impl(
                model, resampler, st, o, eps, 0.5, 1e-10,
                check_resample=True)
            return (new, key), ()

        @jax.jit
        def run(st, key):
            (f, _), _ = jax.lax.scan(step, (st, key),
                                     jnp.arange(args.steps))
            return f

        k_run = jax.random.key(1)
        jax.block_until_ready(run(state, k_run).weights)  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(run(state, k_run).weights)
        dt = time.perf_counter() - t0
        return n_particles * args.steps / dt

    # weak scaling: particles proportional to devices
    tp1 = throughput(devices[:1], args.particles_per_device)
    if n_dev > 1:
        tpn = throughput(devices, args.particles_per_device * n_dev)
        eff = tpn / (tp1 * n_dev)
    else:
        tpn, eff = tp1, 1.0
        print("only one device visible; efficiency trivially 1.0",
              file=sys.stderr)

    print(json.dumps({
        "metric": "scaling_efficiency",
        "n_devices": n_dev,
        "updates_per_s_1dev": round(tp1, 1),
        "updates_per_s_Ndev": round(tpn, 1),
        "value": round(eff, 4),
    }))


if __name__ == "__main__":
    main()
