"""Headline benchmark: particle-updates/s/chip on SimplePrecessionModel.

Runs the fully-compiled adaptive SMC loop (PGH heuristic → outcome
simulation → fused reweight/resample step, all inside one ``lax.scan``) on
the available accelerator and reports throughput as particle-updates per
second per chip.

Baseline: the reference (QInfer) publishes no numbers (BASELINE.md); the
driver-set north star is ≥ 1e7 particle-updates/s/chip, so
``vs_baseline = value / 1e7``.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import jax

# persistent compilation cache: first-compile through the TPU tunnel takes
# minutes; caching makes driver re-runs and repeated benchmarking cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp


N_PARTICLES = 1 << 21      # 2,097,152 particles
N_STEPS = 256              # adaptive experiments per run
N_REPEATS = 3              # timed repetitions (best taken)
BASELINE = 1e7             # driver north star: particle-updates/s/chip


def build_run():
    import qinfer_tpu as q
    from qinfer_tpu.smc import SMCState, _update_step_impl
    from qinfer_tpu.resamplers import LiuWestResampler

    model = q.SimplePrecessionModel()
    prior = q.UniformDistribution([[0.0, 1.0]])
    resampler = LiuWestResampler(a=0.98)
    resample_thresh = 0.5
    zero_thresh = 1e-10

    true_omega = jnp.array([[0.7]], dtype=jnp.float32)

    def step(carry, idx):
        st, key = carry
        key, k_pgh1, k_pgh2, k_sim = jax.random.split(key, 4)
        # PGH: t = 1 / |omega_1 - omega_2| from two posterior draws
        logits = jnp.log(jnp.clip(st.weights, 1e-35, None))
        i = jax.random.categorical(k_pgh1, logits)
        j = jax.random.categorical(k_pgh2, logits)
        sep = jnp.abs(st.locations[i, 0] - st.locations[j, 0])
        t = 1.0 / jnp.maximum(sep, 1e-12)
        eps = {"t": t[None]}
        outcome = model.simulate_experiment(k_sim, true_omega, eps)
        outcome = jnp.asarray(outcome).reshape(-1)[0]
        new_st, _, _ = _update_step_impl(
            model, resampler, st, outcome, eps,
            resample_thresh, zero_thresh, check_resample=True)
        return (new_st, key), ()

    @jax.jit
    def run(state, key):
        (final, _), _ = jax.lax.scan(step, (state, key),
                                     jnp.arange(N_STEPS))
        return final

    def make_state(seed):
        key = jax.random.key(seed)
        k_prior, k_run = jax.random.split(key)
        locations = prior.sample(k_prior, N_PARTICLES)
        return SMCState.initial(locations, k_run), jax.random.key(seed + 1)

    return run, make_state


def main():
    run, make_state = build_run()

    # Warmup / compile
    state, key = make_state(0)
    final = run(state, key)
    jax.block_until_ready(final.weights)

    best = float("inf")
    for rep in range(N_REPEATS):
        state, key = make_state(rep + 1)
        jax.block_until_ready(state.weights)
        t0 = time.perf_counter()
        final = run(state, key)
        jax.block_until_ready(final.weights)
        dt = time.perf_counter() - t0
        best = min(best, dt)

    n_chips = max(1, jax.device_count())
    updates_per_sec_per_chip = (N_PARTICLES * N_STEPS) / best / n_chips

    # sanity: the run must actually have inferred something
    est = float(final.weights @ final.locations[:, 0])
    ok = abs(est - 0.7) < 0.05
    if not ok:
        print(f"WARNING: benchmark posterior mean {est:.4f} != 0.7",
              file=sys.stderr)

    print(json.dumps({
        "metric": "particle_updates_per_s_per_chip",
        "value": round(updates_per_sec_per_chip, 1),
        "unit": "particle-updates/s/chip",
        "vs_baseline": round(updates_per_sec_per_chip / BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
