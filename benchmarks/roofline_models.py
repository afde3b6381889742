"""Per-phase roofline audit of BASELINE configs 2-3 (round 5, VERDICT r4
#3): Ramsey+T2 and randomized benchmarking run 17-36x below the headline
updates/s and nothing said WHY. Decompose the scanned batch_update at the
BASELINE shapes into cumulative variants — each ONE compiled ``lax.scan``
timed end-to-end (PERF_NOTES rule #8) — and sweep the ensemble size to
separate per-step fixed cost from bandwidth/compute-bound work.

  noop       scan + state-carry floor (one elementwise pass per step)
  reweight   + binomial log-likelihood reweight of the observed count
             (check_resample=False: no gate machinery in the program)
  gated      full engine step, resample gate compiled in but never fires
             (resample_thresh=0)
  full       production step (thresh 0.5, Liu-West when ESS fires)

Usage (real TPU): python benchmarks/roofline_models.py
                  [--config 2|3|both] [--sweep]
Writes benchmarks/ROOFLINE_MODELS_r05.json and prints the table.
"""

import argparse
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


def build_config(cfg, n_particles, repeats=8):
    import qinfer_tpu as q

    rng = np.random.default_rng(0)
    if cfg == 2:
        n_shots = 20
        ladder = np.minimum(np.asarray([1.2 ** k for k in range(32)]),
                            30.0)
        ts = np.tile(ladder, repeats).astype(np.float32)
        true = np.array([0.71, 0.08])
        vis = np.exp(-true[1] * ts)
        pr0 = vis * np.cos(true[0] * ts / 2) ** 2 + (1 - vis) / 2
        counts = rng.binomial(n_shots, pr0)
        model = q.BinomialModel(q.RamseyModel(), n_meas_max=n_shots)
        prior = q.UniformDistribution([[0.0, 1.0], [0.0, 0.5]])
        eps = {"t": jnp.asarray(ts),
               "n_meas": jnp.full((len(ts),), n_shots, jnp.int32)}
    else:
        n_shots = 25
        ms = np.tile(np.unique(np.round(1.6 ** np.arange(1, 17))),
                     2 * repeats).astype(np.float32)
        true = np.array([0.95, 0.5, 0.5])
        p_surv = np.clip(true[1] * true[0] ** ms + true[2], 0.0, 1.0)
        counts = rng.binomial(n_shots, p_surv)
        model = q.BinomialModel(q.RandomizedBenchmarkingModel(),
                                n_meas_max=n_shots)
        prior = q.UniformDistribution([[0.8, 1.0], [0.3, 0.7],
                                       [0.3, 0.7]])
        eps = {"m": jnp.asarray(ms),
               "n_meas": jnp.full((len(ms),), n_shots, jnp.int32)}
    return model, prior, eps, jnp.asarray(counts)


def timed_scan(variant, cfg, n_particles):
    import qinfer_tpu as q
    from qinfer_tpu.resamplers import LiuWestResampler
    from qinfer_tpu.smc import SMCState, _batch_update, _update_step_impl

    model, prior, eps, outs = build_config(cfg, n_particles)
    resampler = LiuWestResampler(a=0.98)
    kp, kr = jax.random.split(jax.random.key(0))
    state = SMCState.initial(prior.sample(kp, n_particles), kr)
    T = int(outs.shape[0])

    if variant == "engine":
        # the REAL engine program (exactly what SMCUpdater.batch_update
        # jits, default resample_interval=5), minus its host-side prep —
        # isolates compiled-program overhead vs harness overhead
        def run_engine():
            final, norms = _batch_update(
                model, resampler, state, outs, eps, 0.5, 1e-10,
                resample_interval=5)
            return final, norms

        f, n0 = run_engine()
        jax.block_until_ready(f.weights)            # compile
        t0 = time.perf_counter()
        f, n0 = run_engine()
        jax.block_until_ready(f.weights)
        dt = time.perf_counter() - t0
        return {
            "variant": variant,
            "n_particles": n_particles,
            "n_steps": T,
            "wall_s": round(dt, 5),
            "ms_per_step": round(1e3 * dt / T, 4),
            "updates_per_s": round(n_particles * T / dt, 1),
            "resamples": int(f.resample_count),
        }

    def step(st, idx):
        eps_i = {k: v[idx][None] for k, v in eps.items()}
        o = outs[idx][None]
        if variant == "noop":
            # carry floor: one elementwise pass over the weights
            w = st.weights * (1.0 + 1e-9)
            return st._replace(weights=w / jnp.sum(w)), ()
        if variant == "reweight":
            new, _, _ = _update_step_impl(
                model, resampler, st, o, eps_i, 0.5, 1e-10,
                check_resample=False)
            return new, ()
        thresh = 0.0 if variant == "gated" else 0.5
        new, _, _ = _update_step_impl(
            model, resampler, st, o, eps_i, thresh, 1e-10,
            check_resample=True)
        return new, ()

    @jax.jit
    def run(st):
        final, _ = jax.lax.scan(step, st, jnp.arange(T))
        return final

    jax.block_until_ready(run(state).weights)       # compile
    t0 = time.perf_counter()
    final = run(state)
    jax.block_until_ready(final.weights)
    dt = time.perf_counter() - t0
    return {
        "variant": variant,
        "n_particles": n_particles,
        "n_steps": T,
        "wall_s": round(dt, 5),
        "ms_per_step": round(1e3 * dt / T, 4),
        "updates_per_s": round(n_particles * T / dt, 1),
        "resamples": int(final.resample_count),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (develop/smoke path; "
                        "NEVER point this at the TPU while another TPU "
                        "job is running — one tunnel client at a time)")
    parser.add_argument("--config", default="both", choices=["2", "3",
                                                             "both"])
    parser.add_argument("--particles", type=int, default=50_000)
    parser.add_argument("--sweep", action="store_true",
                        help="ensemble-size sweep of the 'full' variant")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfgs = [2, 3] if args.config == "both" else [int(args.config)]
    results = {"phases": [], "sweep": []}
    for cfg in cfgs:
        for variant in ["noop", "reweight", "gated", "full", "engine"]:
            r = timed_scan(variant, cfg, args.particles)
            r["config"] = cfg
            results["phases"].append(r)
            print(json.dumps(r), flush=True)
    if args.sweep:
        for cfg in cfgs:
            for n in [50_000, 200_000, 1_000_000, 4_000_000]:
                r = timed_scan("full", cfg, n)
                r["config"] = cfg
                results["sweep"].append(r)
                print(json.dumps(r), flush=True)
    out = args.out or os.path.join(os.path.dirname(__file__),
                                   "ROOFLINE_MODELS_r05.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
