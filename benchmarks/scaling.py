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
    parser.add_argument("--flagship", action="store_true",
                        help="run the flagship-recipe leg instead of the "
                        "precession weak-scaling leg: 2-qubit state "
                        "tomography sharded over the mesh with EIG-"
                        "scored candidates (policy='auto'), compressed "
                        "sufficient-statistic record, and adaptive MALA "
                        "resample-moves — the round-4/5 kernels under "
                        "real particle shardings, reporting fidelity "
                        "(does it CONVERGE sharded?) plus wall")
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

    def shard_state(base, mesh):
        shard = NamedSharding(mesh, P("particles"))
        shard2d = NamedSharding(mesh, P("particles", None))
        repl = NamedSharding(mesh, P())
        return SMCState(
            weights=jax.device_put(base.weights, shard),
            locations=jax.device_put(base.locations, shard2d),
            key=jax.device_put(base.key, repl),
            resample_count=jax.device_put(base.resample_count, repl),
            just_resampled=jax.device_put(base.just_resampled, repl),
            log_total_likelihood=jax.device_put(
                base.log_total_likelihood, repl),
            min_n_ess=jax.device_put(base.min_n_ess, repl),
            zero_weight_count=jax.device_put(base.zero_weight_count,
                                             repl),
            resampler_fallback_count=jax.device_put(
                base.resampler_fallback_count, repl),
        )

    def flagship_throughput(device_list, n_particles, steps, shots=8):
        """Flagship-recipe leg: EIG('auto')-designed multi-shot 2-qubit
        state tomography with compressed-record adaptive-MALA
        resample-moves, particles sharded over the mesh (XLA
        auto-collectives; the validity-tolerant Liu-West contract).
        Returns (updates/s, fidelity, resamples)."""
        import qinfer_tpu.tomography as tomo
        from qinfer_tpu.expdesign import select_candidate
        from qinfer_tpu.rejuvenation import (
            initial_log_scale, mcmc_rejuvenate_binomial_adaptive)
        from qinfer_tpu.smc import _expected_information_gain

        mesh = Mesh(np.asarray(device_list), ("particles",))
        repl = NamedSharding(mesh, P())
        basis = tomo.pauli_basis(2)
        two = tomo.TomographyModel(basis)
        fmodel = q.BinomialModel(two, n_meas_max=shots)
        fprior = tomo.GinibreDistribution(basis)
        resampler = LiuWestResampler(a=0.98, maxiter=4,
                                     canonicalize=False)

        dd = basis.dim
        psi = np.zeros(dd, dtype=np.complex64)
        psi[0] = psi[-1] = 1 / np.sqrt(2)
        true_rho = (0.75 * np.outer(psi, psi.conj())
                    + 0.25 * np.eye(dd, dtype=np.complex64) / dd)
        true_mps = jax.device_put(jnp.asarray(np.asarray(
            two.states_to_modelparams(true_rho[None]))), repl)
        eye_coords = np.zeros(basis.n_ops)
        eye_coords[0] = np.sqrt(dd)
        proj = jax.device_put(jnp.asarray(
            0.5 * (eye_coords[None, :]
                   + np.sqrt(dd) * np.eye(basis.n_ops))[1:],
            dtype=jnp.float32), repl)
        n_pool = proj.shape[0]
        pool_eps = {"meas": proj}
        eig_mask = jax.device_put(jnp.ones((2, n_pool), jnp.float32),
                                  repl)
        eig_out = jax.device_put(jnp.arange(2), repl)
        shots_arr = jnp.full((1,), shots, jnp.int32)

        kp, kr = jax.random.split(jax.random.key(0))
        state = shard_state(
            SMCState.initial(fprior.sample(kp, n_particles), kr), mesh)
        ls0 = jnp.float32(initial_log_scale(
            int(two.n_modelparams), "mala"))

        def step(carry, idx):
            st, key, succ, trials, ls, t_ad = carry
            key, k_d, k_sim = jax.random.split(key, 3)
            scores = _expected_information_gain(
                two, st.weights, st.locations, eig_out, eig_mask,
                pool_eps)
            pick = select_candidate(k_d, scores, policy="auto")
            eps = {"meas": proj[pick][None], "n_meas": shots_arr}
            outcome = fmodel.simulate_experiment(k_sim, true_mps, eps)
            outcome = jnp.asarray(outcome).reshape(-1)[:1]
            new_st, _, _ = _update_step_impl(
                fmodel, resampler, st, outcome, eps, 0.5, 1e-10,
                check_resample=True)
            succ = succ.at[pick].add(outcome[0].astype(jnp.int32))
            trials = trials.at[pick].add(shots)

            def move(op):
                s, ls_, t_ = op
                key2, sub = jax.random.split(s.key)
                x, _, ls_, t_ = mcmc_rejuvenate_binomial_adaptive(
                    fmodel, fprior, sub, s.locations, succ, trials,
                    pool_eps, 4, ls_, t_, method="mala")
                return s._replace(locations=x, key=key2), ls_, t_

            new_st, ls, t_ad = jax.lax.cond(
                new_st.just_resampled, move, lambda op: op,
                (new_st, ls, t_ad))
            return (new_st, key, succ, trials, ls, t_ad), ()

        @jax.jit
        def run(st, key):
            carry = (st, key, jnp.zeros((n_pool,), jnp.int32),
                     jnp.zeros((n_pool,), jnp.int32), ls0,
                     jnp.int32(0))
            (f, _, _, _, _, _), _ = jax.lax.scan(
                step, carry, jnp.arange(steps))
            return f

        k_run = jax.random.key(1)
        jax.block_until_ready(run(state, k_run).weights)  # compile
        t0 = time.perf_counter()
        final = run(state, k_run)
        jax.block_until_ready(final.weights)
        dt = time.perf_counter() - t0

        est = np.asarray(final.weights) @ np.asarray(final.locations)
        rho_est = np.asarray(two.modelparams_to_states(est[None]))[0]
        from scipy.linalg import sqrtm

        s_sig = sqrtm(true_rho)
        inner = sqrtm(s_sig @ rho_est @ s_sig)
        fidelity = float(np.real(np.trace(inner)) ** 2)
        return (n_particles * steps / dt, fidelity,
                int(final.resample_count))

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

    if args.flagship:
        # weak scaling of the flagship recipe (fidelity must hold up:
        # a sharded run that stops converging is a sharding bug, not a
        # perf number)
        ppd = min(args.particles_per_device, 1 << 14)
        steps = min(args.steps, 200)
        tp1, fid1, rs1 = flagship_throughput(devices[:1], ppd, steps)
        if n_dev > 1:
            tpn, fidn, rsn = flagship_throughput(devices, ppd * n_dev,
                                                 steps)
            eff = tpn / (tp1 * n_dev)
        else:
            tpn, fidn, rsn, eff = tp1, fid1, rs1, 1.0
        print(json.dumps({
            "metric": "flagship_scaling_efficiency",
            "n_devices": n_dev,
            "particles_per_device": ppd,
            "steps": steps,
            "updates_per_s_1dev": round(tp1, 1),
            "updates_per_s_Ndev": round(tpn, 1),
            "fidelity_1dev": round(fid1, 4),
            "fidelity_Ndev": round(fidn, 4),
            "resamples_1dev": rs1,
            "resamples_Ndev": rsn,
            "value": round(eff, 4),
        }))
        return

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
