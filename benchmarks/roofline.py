"""Per-phase roofline audit of the headline bench step (VERDICT r2 #2).

Decomposes the 256-step adaptive scan at the bench ensemble size into
cumulative variants, each a single compiled ``lax.scan`` timed end-to-end
(the only trustworthy TPU measurement through the tunnel — PERF_NOTES rule
#8), and reports per-step wall time plus the achieved HBM bandwidth implied
by each phase's minimum data movement. Differences between variants isolate
phases:

  noop            scan + state-carry floor (one elementwise pass)
  pgh             + production PGH proposal (gumbel-argmax posterior draws)
  sim             + outcome simulation at the true parameters
  reweight        + fused likelihood x weight x normalize x ESS
  step_gated      full engine step, resample gate never fires
  full            full engine step, production resampling (the bench)
  resample_every  full step, resample forced every step

Usage (real TPU): python benchmarks/roofline.py [--particles 4194304]
Writes benchmarks/ROOFLINE_r03.json and prints the table.
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

N_STEPS = 256


def build(variant, n_particles, engine="fused"):
    import qinfer_tpu as q
    from qinfer_tpu.smc import SMCState, _update_step_impl
    from qinfer_tpu.resamplers import LiuWestResampler
    from qinfer_tpu.heuristics import PGH

    if engine == "fused":
        from qinfer_tpu.ops.accelerated import AcceleratedPrecessionModel

        model = AcceleratedPrecessionModel()
    else:
        model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    resampler = LiuWestResampler(a=0.98)

    class _Stub:
        pass

    stub = _Stub()
    stub.model = model
    pgh = PGH(stub)
    true_omega = jnp.array([[0.7]], dtype=jnp.float32)
    thresh = {"full": 0.5, "resample_every": 2.0}.get(variant, 0.5)

    def step(carry, idx):
        st, key = carry
        key, k_pgh, k_sim = jax.random.split(key, 3)
        if variant == "noop":
            # one forced pass over the carried buffers so the carry is
            # genuinely alive (and cannot be DCE'd)
            new_w = st.weights + 1e-9
            return (st._replace(weights=new_w), key), ()
        eps = pgh.propose(k_pgh, st.weights, st.locations, idx)
        if variant == "pgh":
            new_w = st.weights + 1e-9 * eps["t"][0]
            return (st._replace(weights=new_w), key), ()
        outcome = model.simulate_experiment(k_sim, true_omega, eps)
        outcome = jnp.asarray(outcome).reshape(-1)[0]
        if variant == "sim":
            new_w = st.weights + 1e-9 * outcome
            return (st._replace(weights=new_w), key), ()
        if variant == "reweight":
            from qinfer_tpu.smc import _reweight

            hyp, norm, _ = _reweight(model, st.weights, st.locations,
                                     outcome, eps, None)
            new_w = hyp / jnp.maximum(norm, 1e-35)
            ess = 1.0 / jnp.sum(new_w * new_w)
            return (st._replace(weights=new_w,
                                min_n_ess=jnp.minimum(st.min_n_ess, ess)),
                    key), ()
        new_st, _, _ = _update_step_impl(
            model, resampler, st, outcome, eps, thresh, 1e-10,
            check_resample=(variant != "step_gated"))
        if variant == "step_gated":
            # ESS check compiled in, branch never taken at thresh<=0
            pass
        return (new_st, key), ()

    if variant == "step_gated":
        def step_gated(carry, idx):
            st, key = carry
            key, k_pgh, k_sim = jax.random.split(key, 3)
            eps = pgh.propose(k_pgh, st.weights, st.locations, idx)
            outcome = model.simulate_experiment(k_sim, true_omega, eps)
            outcome = jnp.asarray(outcome).reshape(-1)[0]
            new_st, _, _ = _update_step_impl(
                model, resampler, st, outcome, eps, -1.0, 1e-10,
                check_resample=True)
            return (new_st, key), ()

        step = step_gated

    @jax.jit
    def run(state, key):
        (final, _), _ = jax.lax.scan(step, (state, key),
                                     jnp.arange(N_STEPS))
        return final

    def make_state(seed):
        key = jax.random.key(seed)
        k_prior, k_run = jax.random.split(key)
        locations = prior.sample(k_prior, n_particles)
        return SMCState.initial(locations, k_run), jax.random.key(seed + 1)

    return run, make_state


def time_variant(variant, n_particles, engine, repeats=3):
    run, make_state = build(variant, n_particles, engine)
    state, key = make_state(0)
    jax.block_until_ready(run(state, key).weights)  # compile
    best = float("inf")
    for rep in range(repeats):
        state, key = make_state(rep + 1)
        jax.block_until_ready(state.weights)
        t0 = time.perf_counter()
        jax.block_until_ready(run(state, key).weights)
        best = min(best, time.perf_counter() - t0)
    return best / N_STEPS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=1 << 22)
    p.add_argument("--engine", choices=["fused", "xla"], default="fused")
    p.add_argument("--out", default="benchmarks/ROOFLINE_r03.json")
    args = p.parse_args()
    n = args.particles

    variants = ["noop", "pgh", "sim", "reweight", "step_gated", "full",
                "resample_every"]
    results = {}
    for v in variants:
        dt = time_variant(v, n, args.engine)
        results[v] = dt
        print(f"{v:>16}: {dt * 1e3:8.3f} ms/step", flush=True)

    # minimum HBM bytes per phase at d=1 (f32): weights+locations read,
    # weights written; deltas between variants carry the same state
    bytes_state_pass = n * 4 * 3  # read w, read x, write w
    table = {
        "n_particles": n,
        "engine": args.engine,
        "ms_per_step": {k: v * 1e3 for k, v in results.items()},
        "phase_deltas_ms": {
            "pgh": (results["pgh"] - results["noop"]) * 1e3,
            "sim": (results["sim"] - results["pgh"]) * 1e3,
            "reweight": (results["reweight"] - results["sim"]) * 1e3,
            "ess_gate": (results["step_gated"] - results["reweight"]) * 1e3,
            "resample_amortized": (results["full"]
                                   - results["step_gated"]) * 1e3,
            "resample_forced": (results["resample_every"]
                                - results["step_gated"]) * 1e3,
        },
        "min_bytes_state_pass": bytes_state_pass,
        "achieved_gbps": {
            k: (bytes_state_pass / max(v, 1e-9)) / 1e9
            for k, v in results.items() if k in ("noop", "reweight")
        },
    }
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table["phase_deltas_ms"], indent=1))


if __name__ == "__main__":
    main()
