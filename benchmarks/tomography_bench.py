"""BASELINE config 4: qubit state tomography at 500k particles.

Runs the fully-compiled adaptive loop (random-Pauli measurement proposal →
Born-rule simulation at the true state → fused SMC update with
constrained-PSD Liu-West resampling) on the available accelerator and
reports particle-updates/s plus the recovered fidelity.

    python benchmarks/tomography_bench.py [--particles N] [--steps K]

Prints one JSON line.
"""

import argparse
import itertools
import json
import os
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--particles", type=int, default=500_000)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--process", action="store_true",
                        help="dim-4 Choi-state process tomography (the "
                        "general-dim path: Cholesky validity + embedded-"
                        "eigh PSD projection; d=16 params)")
    parser.add_argument("--process-qubits", type=int, default=1,
                        help="system size for --process (2 = two-qubit "
                        "channels: 255-parameter dim-16 Choi states, "
                        "embedded 32x32 — beyond the lane-Jacobi gate, "
                        "exercising the jnp fallback paths)")
    parser.add_argument("--diffusive", action="store_true",
                        help="dim-4 DIFFUSIVE state tomography: every "
                        "step diffuses all particles and re-projects "
                        "leavers onto the PSD cone (per-particle masked "
                        "batched-Jacobi path — VERDICT r2 weak #5)")
    parser.add_argument("--diffusion-rate", type=float, default=0.003)
    parser.add_argument("--qubits", type=int, default=1,
                        help="system size for plain state tomography "
                        "(1 = BASELINE config 4 qubit; 3 = dim-8, the "
                        "embedded-16 lane-Jacobi projection path)")
    parser.add_argument("--eig", action="store_true",
                        help="plain state tomography only: choose each "
                        "measurement by argmax expected information gain "
                        "over the full Pauli-projector candidate grid "
                        "(config-5-style adaptive design on the "
                        "tomography family) instead of uniformly at "
                        "random. NOTE: measured to LOSE to random on "
                        "fidelity at long horizons (greedy one-step MI "
                        "myopia; see PERF_NOTES) — kept as the design-"
                        "stack composition demo")
    parser.add_argument("--moves", type=int, default=0,
                        help="Metropolis rejuvenation moves after every "
                        "resample (resample-move; qinfer_tpu.rejuvenation)"
                        " — measures the on-chip cost of n_mcmc_moves on "
                        "this config (time-independent configs only)")
    parser.add_argument("--shots", type=int, default=0,
                        help="repetitions per fiducial pair: wrap the "
                        "model in BinomialModel(n_meas_max=shots) so each "
                        "experiment contributes a success COUNT instead "
                        "of one Bernoulli bit (VERDICT r3 #1 — the "
                        "flagship convergence config; two-outcome "
                        "configs only, i.e. --process or plain state "
                        "tomography)")
    parser.add_argument("--chunk", type=int, default=0,
                        help="execute the adaptive loop as ceil(steps/"
                        "chunk) invocations of ONE compiled chunk-step "
                        "scan instead of a single program — required on "
                        "TPU when many-resample configs would blow the "
                        "~1 min execution watchdog (0 = single program)")
    parser.add_argument("--proposal-scale", type=float, default=2.38,
                        help="MH random-walk scale for --moves "
                        "(Roberts-Gelman-Gilks 2.38 default)")
    parser.add_argument("--mcmc-method", default="rwm",
                        choices=["rwm", "mala"],
                        help="rejuvenation proposal family (round 5): "
                        "'mala' drifts along the record-posterior "
                        "gradient (two extra matvecs on the compressed "
                        "record; optimal acceptance 0.574). Sufficient-"
                        "record configs only")
    parser.add_argument("--target-accept", type=float, default=None,
                        help="Robbins-Monro acceptance target for --adapt "
                        "(default: the method's optimal-scaling constant, "
                        "0.234 rwm / 0.574 mala; constrained high-dim "
                        "targets can prefer lower)")
    parser.add_argument("--adapt", action="store_true",
                        help="Robbins-Monro adaptation of the proposal "
                        "step size toward the method's optimal "
                        "acceptance — replaces the hand-tuned "
                        "--proposal-scale (which only seeds the initial "
                        "scale; left at 2.38 the method default is used)")
    parser.add_argument("--eig-policy", default="greedy",
                        choices=["greedy", "egreedy", "softmax", "auto"],
                        help="candidate-selection policy for --eig "
                        "(expdesign.select_candidate; greedy = round-3 "
                        "argmax, the measured-myopic baseline)")
    parser.add_argument("--eig-epsilon", type=float, default=0.25,
                        help="exploration rate for --eig-policy egreedy")
    parser.add_argument("--eig-interval", type=int, default=1,
                        help="rescore the candidate pool only every K-th "
                        "step AND whenever the previous step resampled "
                        "(round 5 score amortization: between resamples "
                        "the posterior drifts slowly, so cached scores "
                        "select nearly as well; 1 = rescore every step)")
    parser.add_argument("--waste-free", type=int, default=0,
                        help="replace the Liu-West resample + K moves "
                        "with waste-free resample-move (Dau-Chopin): "
                        "resample n/P ancestors and keep every state of "
                        "a (P-1)-step chain. P must divide --particles; "
                        "requires --moves semantics via the sufficient "
                        "record (set --moves > 0 to enable the path; "
                        "the move count itself is ignored)")
    parser.add_argument("--waste-free-kernel", default="rwm",
                        choices=["rwm", "pcn"],
                        help="waste-free chain proposal family (round 5):"
                        " 'pcn' = preconditioned Crank-Nicolson against "
                        "the ensemble Gaussian (dimension-robust "
                        "acceptance)")
    parser.add_argument("--waste-free-lw-seed", type=float, default=None,
                        help="Liu-West shrinkage a: perturb the "
                        "waste-free ancestors with one LW step before "
                        "chaining (restores spread at high dim)")
    parser.add_argument("--waste-free-beta", type=float, default=0.3,
                        help="pCN step size for --waste-free-kernel pcn")
    parser.add_argument("--interval", type=int, default=0,
                        help="check the ESS resample condition only "
                        "every K-th step (reference batch_update "
                        "semantics; 0 = every step). Fewer resamples "
                        "means fewer resample-move events on the "
                        "flagship configs")
    parser.add_argument("--strict-resample-canonicalize",
                        action="store_true",
                        help="force the resampler's own strict "
                        "model.canonicalize even when --moves > 0 "
                        "(round-4 behavior; by default move configs use "
                        "the validity-tolerant Liu-West contract — the "
                        "moves re-gate validity and own the strict "
                        "projection)")
    parser.add_argument("--project-every", type=int, default=0,
                        help="strict-project the ensemble only on every "
                        "K-th resample-move event (round-5 lever probe: "
                        "the per-event d=32 projection is ~40%% of the "
                        "composed flagship wall, and the measured "
                        "zero-projection collapse takes hundreds of "
                        "events to develop — K amortizes containment). "
                        "Implies the tolerant resampler + no per-move "
                        "projection; 0 = off (sufficient-record "
                        "configs only)")
    parser.add_argument("--no-move-canonicalize", action="store_true",
                        help="skip the strict PSD re-projection at the "
                        "end of each rejuvenation call (accepted "
                        "proposals already passed are_models_valid; the "
                        "projection is ~90%% of the move-call cost at "
                        "embedded d=32 — VERDICT r3 #5 cost bound)")
    parser.add_argument("--seed", type=int, default=0,
                        help="offsets every PRNG stream (prior draw, run "
                        "keys). NOTE: round-4 changed the proposal key "
                        "consumption and the timed run's initial "
                        "ensemble, so no seed reproduces round-3 "
                        "trajectories bit-for-bit")
    parser.add_argument("--record", default="auto",
                        choices=["auto", "full"],
                        help="rejuvenation record form for --moves: "
                        "'auto' uses the sufficient-statistic pool "
                        "whenever the config has a finite candidate "
                        "pool; 'full' forces the O(T·n)-per-evaluation "
                        "full-record path (the round-3 form, kept "
                        "reachable for cost comparisons)")
    args = parser.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    # persistent compilation cache: the tunneled-TPU compile of the scan
    # body (batched embedded eigh) takes minutes; cache across processes
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import qinfer_tpu as q
    from qinfer_tpu import tomography as tomo
    from qinfer_tpu.smc import SMCState, _update_step_impl
    from qinfer_tpu.resamplers import LiuWestResampler

    # Invariant (round 5, measured): at least ONE strict projection per
    # resample-move event. The Liu-West resampler may skip its own
    # projection ONLY when the move block's end-of-block projection is
    # active; with both off the 255-dim flagship collapses (0.98 →
    # 0.48-0.65 on-chip, R05_BATCH2) — the strict projection is
    # correctness at high dimension, not hygiene.
    # tolerant ONLY when the move path is genuinely active (--waste-free
    # without --moves leaves the wf/move path dormant — the resampler
    # must then keep the strict projection itself). --project-every
    # replaces the per-event projection with a periodic one, so it also
    # releases the resampler.
    resampler = LiuWestResampler(
        a=0.98, maxiter=4,
        canonicalize=((args.moves == 0)
                      or (args.no_move_canonicalize
                          and args.project_every == 0)
                      or args.strict_resample_canonicalize))
    n = args.particles

    if args.process:
        from functools import reduce

        from qinfer_tpu.tomography.models import ProcessTomographyModel

        nq = int(args.process_qubits)
        if nq > 2:
            # 4^nq product fiducials are enumerated eagerly on the host
            # below (nq=3 → 64 kets of dim 8, dd²=64-dim coords, and an
            # embedded-128 device path far past the lane-Jacobi gate) —
            # refuse rather than silently become the bottleneck.
            raise SystemExit("--process-qubits > 2 unsupported: fiducial "
                             "enumeration is combinatorial (4^nq) and the "
                             "PSD projection path is unmeasured past "
                             "embedded d=64")
        dd = 2 ** nq
        b1 = tomo.pauli_basis(nq)
        b2 = tomo.pauli_basis(2 * nq)
        model = ProcessTomographyModel(b2, b1)
        prior = tomo.BCSZChoiDistribution(b2)

        # true channel: depolarizing at rate 0.25 (host-side complex)
        p_dep = 0.25
        J_id = np.zeros((dd * dd, dd * dd), dtype=np.complex64)
        for mm in range(dd):
            for nn in range(dd):
                E = np.zeros((dd, dd), dtype=np.complex64)
                E[mm, nn] = 1
                J_id += np.kron(E, E)
        true_rho = ((1 - p_dep) * J_id
                    + p_dep * np.kron(np.eye(dd), np.eye(dd) / dd)) / dd
        true_mps = jnp.asarray(np.asarray(
            model.states_to_modelparams(true_rho[None])))

        # tetrahedral-ish single-qubit fiducials, tensored over the system
        # qubits (4^nq informationally-complete product preparations /
        # measurement effects), as real coords (device-safe)
        kets1 = np.asarray(
            [[1, 0], [0, 1],
             [1 / np.sqrt(2), 1 / np.sqrt(2)],
             [1 / np.sqrt(2), 1j / np.sqrt(2)]], dtype=np.complex64)
        kets = [reduce(np.kron, combo)
                for combo in itertools.product(kets1, repeat=nq)]
        fid = jnp.asarray(np.stack([
            np.asarray(b1.state_to_modelparams(np.outer(k, k.conj())))
            for k in kets]), dtype=jnp.float32)  # (4^nq, dd^2)
        n_fid = fid.shape[0]

        # the full (prep, meas) candidate pool, for sufficient-statistic
        # rejuvenation AND adaptive design (E = n_fid² experiments)
        pool_eps = {"prep": jnp.repeat(fid, n_fid, axis=0),
                    "meas": jnp.tile(fid, (n_fid, 1))}
        n_pool = n_fid * n_fid

        if args.eig:
            # adaptive fiducial selection: score the whole pool by the
            # TWO-OUTCOME expected information gain of the underlying
            # process model (the binomial count EIG over a 65-outcome
            # grid would cost 65x per step; single-shot EIG is a
            # monotone proxy for fixed n_meas) and pick with
            # --eig-policy. Composition demo: design stack x flagship.
            from qinfer_tpu.smc import _expected_information_gain
            from qinfer_tpu.expdesign import select_candidate

            eig_mask = jnp.ones((2, n_pool), jnp.float32)
            eig_outcomes = jnp.arange(2)
            two_model = model  # bind BEFORE any BinomialModel rebind

            def pool_scores(weights, locations):
                return _expected_information_gain(
                    two_model, weights, locations, eig_outcomes,
                    eig_mask, pool_eps)

            def propose_with_pool_idx(key, weights, locations, idx,
                                      scores=None):
                if scores is None:
                    scores = pool_scores(weights, locations)
                pick = select_candidate(key, scores,
                                        policy=args.eig_policy,
                                        epsilon=args.eig_epsilon)
                return ({"prep": pool_eps["prep"][pick][None],
                         "meas": pool_eps["meas"][pick][None]}, pick)
        else:
            def propose_with_pool_idx(key, weights, locations, idx,
                                      scores=None):
                k1, k2 = jax.random.split(key)
                i = jax.random.randint(k1, (), 0, n_fid)
                j = jax.random.randint(k2, (), 0, n_fid)
                return ({"prep": fid[i][None], "meas": fid[j][None]},
                        i * n_fid + j)

        def propose(key, weights, locations, idx, scores=None):
            return propose_with_pool_idx(key, weights, locations, idx,
                                         scores)[0]
    elif args.diffusive:
        b2 = tomo.pauli_basis(2)
        model = tomo.DiffusiveTomographyModel(
            b2, diffusion_rate=args.diffusion_rate)
        prior = tomo.GinibreDistribution(b2)
        # true: a fixed mixed two-qubit state (diffuses during the run)
        psi = np.array([1, 0, 0, 1], dtype=np.complex64) / np.sqrt(2)
        true_rho = (0.8 * np.outer(psi, psi.conj())
                    + 0.2 * np.eye(4, dtype=np.complex64) / 4)
        true_mps = jnp.asarray(np.asarray(
            model.states_to_modelparams(true_rho[None])))
        # product-Pauli effect projectors (I + P)/2 as real coords
        effs = []
        P1 = [np.eye(2, dtype=np.complex64),
              np.array([[0, 1], [1, 0]], np.complex64),
              np.array([[0, -1j], [1j, 0]], np.complex64),
              np.array([[1, 0], [0, -1]], np.complex64)]
        for a_i in range(4):
            for b_i in range(4):
                if a_i == b_i == 0:
                    continue
                P = np.kron(P1[a_i], P1[b_i])
                E = (np.eye(4, dtype=np.complex64) + P) / 2
                effs.append(np.asarray(b2.state_to_modelparams(E)))
        eff = jnp.asarray(np.stack(effs), dtype=jnp.float32)  # (15, 16)

        def propose(key, weights, locations, idx):
            k1, _ = jax.random.split(key)
            return {"meas": eff[jax.random.randint(k1, (), 0, 15)][None],
                    "t": jnp.ones((1,), jnp.float32)}
    else:
        basis = tomo.pauli_basis(args.qubits)
        model = tomo.TomographyModel(basis)
        prior = tomo.GinibreDistribution(basis)

        if args.qubits == 1:
            true_rho = np.array([[0.85, 0.3], [0.3, 0.15]],
                                dtype=np.complex64)
        else:
            # GHZ-leaning mixed state (full rank, fidelity well-defined)
            dd = 2 ** args.qubits
            psi = np.zeros(dd, dtype=np.complex64)
            psi[0] = psi[-1] = 1 / np.sqrt(2)
            true_rho = (0.75 * np.outer(psi, psi.conj())
                        + 0.25 * np.eye(dd, dtype=np.complex64) / dd)
        true_mps = jnp.asarray(np.asarray(
            model.states_to_modelparams(true_rho[None])))

        # random-Pauli proposal, inlined jittably (coords precomputed
        # host-side)
        u_stub = type("U", (), {})()
        u_stub.model = model
        heur = tomo.RandomPauliHeuristic.__new__(tomo.RandomPauliHeuristic)
        heur._updater = u_stub
        heur.other_fields = {}
        d = basis.dim
        eye_coords = np.zeros(basis.n_ops)
        eye_coords[0] = np.sqrt(d)
        heur.proj_coords = jnp.asarray(
            0.5 * (eye_coords[None, :]
                   + np.sqrt(d) * np.eye(basis.n_ops))[1:],
            dtype=jnp.float32)

        # the projector pool doubles as the sufficient-statistic
        # rejuvenation candidate set (d²−1 Pauli projectors)
        pool_eps = {"meas": heur.proj_coords}
        n_pool = heur.proj_coords.shape[0]

        if args.eig:
            # adaptive design: score EVERY Pauli projector by expected
            # information gain (the MXU two-matmul contraction,
            # smc._expected_information_gain) and select per
            # --eig-policy — 'greedy' is the round-3 argmax;
            # 'egreedy'/'softmax' are the round-4 stochastic policies
            # (qinfer_tpu.expdesign.select_candidate)
            from qinfer_tpu.smc import _expected_information_gain
            from qinfer_tpu.expdesign import select_candidate

            cand = heur.proj_coords                   # (n_cand, d²)
            eig_mask = jnp.ones((2, cand.shape[0]), jnp.float32)
            eig_outcomes = jnp.arange(2)
            two_model = model  # bind BEFORE any BinomialModel rebind

            def pool_scores(weights, locations):
                return _expected_information_gain(
                    two_model, weights, locations, eig_outcomes,
                    eig_mask, {"meas": cand})

            def propose_with_pool_idx(key, weights, locations, idx,
                                      scores=None):
                if scores is None:
                    scores = pool_scores(weights, locations)
                pick = select_candidate(
                    key, scores, policy=args.eig_policy,
                    epsilon=args.eig_epsilon)
                return {"meas": cand[pick][None]}, pick
        else:
            def propose_with_pool_idx(key, weights, locations, idx,
                                      scores=None):
                k1, _ = jax.random.split(key)
                pick = jax.random.randint(k1, (), 0, n_pool)
                return {"meas": heur.proj_coords[pick][None]}, pick

        def propose(key, weights, locations, idx, scores=None):
            return propose_with_pool_idx(key, weights, locations, idx,
                                         scores)[0]

    tomo_model = model  # coordinate<->state conversions stay on the base
    if args.shots > 0:
        # VERDICT r3 #1: multi-shot fiducials. Each proposed (prep, meas)
        # pair is repeated `shots` times and the engine updates on the
        # success COUNT via the stable log-binomial (reference parity:
        # derived_models.py::BinomialModel over the tomography family,
        # the composition tests/test_calibration.py proves at dim 4).
        if args.diffusive:
            raise SystemExit("--shots requires a time-independent "
                             "two-outcome config (--process or plain "
                             "state tomography)")
        model = q.BinomialModel(model, n_meas_max=args.shots)
        shots_arr = jnp.full((1,), args.shots, jnp.int32)
        _propose_two = propose

        def propose(key, weights, locations, idx, scores=None):
            eps = dict(_propose_two(key, weights, locations, idx, scores))
            eps["n_meas"] = shots_arr
            return eps

    k_prior, k_run = jax.random.split(jax.random.key(3 * args.seed))
    state = SMCState.initial(prior.sample(k_prior, n), k_run)

    n_moves = int(args.moves)
    if n_moves > 0 and bool(model.is_time_dependent):
        raise SystemExit("--moves requires a time-independent config "
                         "(rejuvenation targets a fixed record posterior)")
    # chunked mode runs ceil(steps/chunk) FULL chunks, i.e. total_steps =
    # C * n_chunks >= args.steps actual updates — every fixed-size buffer
    # below (and the per-step metric) must use total_steps, or the scan
    # index clamps past the buffer end and overwrites the last record row
    # on padded steps (round-4 advisor finding).
    C = args.chunk if args.chunk > 0 else args.steps
    n_chunks = -(-args.steps // C)
    total_steps = C * n_chunks
    # sufficient-statistic record (VERDICT r3 #5): every --process
    # experiment comes from the finite (prep, meas) fiducial pool, so the
    # record collapses EXACTLY to per-candidate success/trial totals and
    # each MH evaluation costs one (n, E) pool pass instead of a (T, n)
    # record pass — rejuvenation cost no longer grows with the horizon.
    sufficient = (n_moves > 0 and args.record != "full"
                  and (args.process or not args.diffusive))
    if n_moves > 0 and not sufficient:
        from qinfer_tpu.rejuvenation import mcmc_rejuvenate

        # fixed-size experiment record carried through the scan: the
        # rejuvenation target is prior x likelihood of everything
        # observed so far (masked to the first idx+1 rows)
        eps0 = propose(jax.random.key(42), state.weights,
                       state.locations, 0)
        rec_eps0 = {k: jnp.zeros((total_steps,) + tuple(v.shape[1:]),
                                 v.dtype) for k, v in eps0.items()}
        rec_out0 = jnp.zeros((total_steps,), jnp.int32)
    use_adaptive = n_moves > 0 and (args.adapt or args.mcmc_method != "rwm")
    if args.project_every > 0 and (n_moves == 0 or args.waste_free > 0):
        raise SystemExit("--project-every requires the sufficient-record "
                         "move path (--moves > 0, no --waste-free)")
    # with periodic projection the per-move-call projection is off
    move_canon = (not args.no_move_canonicalize) and args.project_every == 0

    def periodic_project(s):
        """Strict-project the ensemble on every K-th resample-move event
        (amortized containment of the psd_tol-shell leak — see the
        round-5 projection-invariant measurements)."""
        if args.project_every <= 0:
            return s
        return jax.lax.cond(
            s.just_resampled
            & (s.resample_count % args.project_every == 0),
            lambda ss: ss._replace(
                locations=model.canonicalize(ss.locations)),
            lambda ss: ss, s)
    if use_adaptive and not sufficient:
        raise SystemExit("--adapt / --mcmc-method mala require the "
                         "sufficient-statistic record path")
    if use_adaptive and args.waste_free > 0:
        raise SystemExit("--adapt / --mcmc-method mala apply to the "
                         "post-resample move kernel, not --waste-free")
    if sufficient:
        from qinfer_tpu.rejuvenation import (
            mcmc_rejuvenate_binomial, waste_free_rejuvenate_binomial)

        succ0 = jnp.zeros((n_pool,), jnp.float32)
        trials0 = jnp.zeros((n_pool,), jnp.float32)
    if use_adaptive:
        from qinfer_tpu.rejuvenation import (
            initial_log_scale, mcmc_rejuvenate_binomial_adaptive)

        ps_seed = (None if args.proposal_scale == 2.38
                   else args.proposal_scale)
        ls_init = initial_log_scale(int(model.n_modelparams),
                                    args.mcmc_method, ps_seed)

    # EIG score amortization (round 5): with --eig-interval K > 1 the pool
    # scores ride in the scan carry and are refreshed only every K-th step
    # or right after a resample (just_resampled on the carried state)
    carry_scores = args.eig and args.eig_interval > 1

    def step_core(carry, idx, scores=None):
        ls = t_ad = None
        if use_adaptive:
            st, key, true, succ, trials, acc_sum, ls, t_ad = carry
        elif sufficient:
            st, key, true, succ, trials, acc_sum = carry
        elif n_moves > 0:
            st, key, true, rec_o, rec_e = carry
        else:
            st, key, true = carry
        key, k_h, k_sim = jax.random.split(key, 3)
        if sufficient:
            eps, pool_idx = propose_with_pool_idx(
                k_h, st.weights, st.locations, idx, scores)
            if args.shots > 0:
                eps = dict(eps)
                eps["n_meas"] = shots_arr
        else:
            eps = propose(k_h, st.weights, st.locations, idx, scores)
        outcome = model.simulate_experiment(k_sim, true, eps)
        outcome = jnp.asarray(outcome).reshape(-1)[:1]
        if bool(model.is_time_dependent):
            key, k_ts = jax.random.split(key)
            true = model.update_timestep(k_ts, true, eps)[:, :, 0]
        from qinfer_tpu.smc import resample_interval_gate

        gate = resample_interval_gate(idx, args.interval)
        use_wf = sufficient and args.waste_free > 0
        new_st, _, _ = _update_step_impl(
            model, resampler, st, outcome, eps, 0.5, 1e-10,
            # waste-free REPLACES the resample entirely: the update step
            # only reweights, and the ESS gate below triggers the
            # resample-move in one shot
            check_resample=not use_wf, resample_gate=gate)
        if sufficient:
            # success := underlying-outcome-0 count (BinomialModel
            # convention); single-shot outcomes are Bernoulli bits
            if args.shots > 0:
                n_succ = outcome[0].astype(jnp.float32)
                n_trials = jnp.float32(args.shots)
            else:
                n_succ = (outcome[0] == 0).astype(jnp.float32)
                n_trials = jnp.float32(1.0)
            succ = succ.at[pool_idx].add(n_succ)
            trials = trials.at[pool_idx].add(n_trials)

            if use_wf:
                ess = 1.0 / jnp.sum(new_st.weights * new_st.weights)
                do_wf = ess <= 0.5 * n
                if args.interval > 0:
                    do_wf = do_wf & resample_interval_gate(
                        idx, args.interval)

                def wf(s):
                    key2, sub = jax.random.split(s.key)
                    w2, x2, acc = waste_free_rejuvenate_binomial(
                        model, prior, sub, s.weights, s.locations,
                        succ, trials, pool_eps, args.waste_free,
                        args.proposal_scale,
                        canonicalize=not args.no_move_canonicalize,
                        kernel=args.waste_free_kernel,
                        lw_seed_a=args.waste_free_lw_seed,
                        beta=args.waste_free_beta)
                    return s._replace(
                        weights=w2, locations=x2, key=key2,
                        just_resampled=jnp.asarray(True),
                        resample_count=s.resample_count + 1), acc

                new_st, acc = jax.lax.cond(
                    do_wf, wf,
                    lambda s: (s._replace(
                        just_resampled=jnp.asarray(False)),
                        jnp.float32(0.0)), new_st)
                acc_sum = acc_sum + acc
                return (new_st, key, true, succ, trials, acc_sum), ()

            if use_adaptive:
                def move_ad(op):
                    s, ls_, t_ = op
                    key2, sub = jax.random.split(s.key)
                    x, acc, ls_, t_ = mcmc_rejuvenate_binomial_adaptive(
                        model, prior, sub, s.locations, succ, trials,
                        pool_eps, n_moves, ls_, t_,
                        method=args.mcmc_method, adapt=args.adapt,
                        target_accept=args.target_accept,
                        canonicalize=move_canon)
                    return (s._replace(locations=x, key=key2), ls_,
                            t_), acc

                (new_st, ls, t_ad), acc = jax.lax.cond(
                    new_st.just_resampled, move_ad,
                    lambda op: (op, jnp.float32(0.0)),
                    (new_st, ls, t_ad))
                acc_sum = acc_sum + acc
                new_st = periodic_project(new_st)
                return (new_st, key, true, succ, trials, acc_sum,
                        ls, t_ad), ()

            def move(s):
                key2, sub = jax.random.split(s.key)
                x, acc = mcmc_rejuvenate_binomial(
                    model, prior, sub, s.locations, succ, trials,
                    pool_eps, n_moves, args.proposal_scale,
                    canonicalize=move_canon)
                return s._replace(locations=x, key=key2), acc

            new_st, acc = jax.lax.cond(
                new_st.just_resampled, move,
                lambda s: (s, jnp.float32(0.0)), new_st)
            acc_sum = acc_sum + acc
            new_st = periodic_project(new_st)
            return (new_st, key, true, succ, trials, acc_sum), ()
        if n_moves > 0:
            rec_o = rec_o.at[idx].set(outcome[0].astype(jnp.int32))
            rec_e = {k: rec_e[k].at[idx].set(eps[k][0])
                     for k in rec_e}

            def move(s):
                key2, sub = jax.random.split(s.key)
                mask = jnp.arange(total_steps) < (idx + 1)
                x, _ = mcmc_rejuvenate(
                    model, prior, sub, s.locations, rec_o, rec_e,
                    mask, n_moves, args.proposal_scale)
                return s._replace(locations=x, key=key2)

            new_st = jax.lax.cond(new_st.just_resampled, move,
                                  lambda s: s, new_st)
            return (new_st, key, true, rec_o, rec_e), ()
        return (new_st, key, true), ()

    if carry_scores:
        def step(carry, idx):
            inner, prev_scores = carry
            st0 = inner[0]

            def fresh(_):
                return pool_scores(st0.weights, st0.locations)

            scores = jax.lax.cond(
                (idx % args.eig_interval == 0) | st0.just_resampled,
                fresh, lambda _: prev_scores, None)
            new_inner, _ = step_core(inner, idx, scores)
            return (new_inner, scores), ()
    else:
        step = step_core

    # one compiled chunk-step scan, invoked ceil(steps/chunk) times with a
    # traced offset (all invocations share the one compilation); chunk=0
    # keeps the whole loop in a single program. C / n_chunks / total_steps
    # are computed above the record-buffer allocation.

    @jax.jit
    def run_chunk(carry, offset):
        out, _ = jax.lax.scan(step, carry, offset + jnp.arange(C))
        return out

    def run(st, key):
        if use_adaptive:
            carry = (st, key, true_mps, succ0, trials0, jnp.float32(0.0),
                     jnp.float32(ls_init), jnp.int32(0))
        elif sufficient:
            carry = (st, key, true_mps, succ0, trials0, jnp.float32(0.0))
        elif n_moves > 0:
            carry = (st, key, true_mps, rec_out0, rec_eps0)
        else:
            carry = (st, key, true_mps)
        if carry_scores:
            # idx=0 hits the `idx % K == 0` refresh, so zeros never select
            carry = (carry, jnp.zeros((n_pool,), jnp.float32))
        chunk_walls = []
        for c in range(n_chunks):
            t0 = time.perf_counter()
            carry = run_chunk(carry, jnp.int32(c * C))
            jax.block_until_ready(
                (carry[0][0] if carry_scores else carry[0]).weights)
            chunk_walls.append(time.perf_counter() - t0)
        if carry_scores:
            carry = carry[0]
        acc = carry[5] if sufficient else None
        final_ls = float(carry[6]) if use_adaptive else None
        return carry[0], carry[2], acc, chunk_walls, final_ls

    # warmup run: pays the compile inside its first chunk; later chunks
    # are clean executions (kept as the timing fallback below)
    k0 = jax.random.key(3 * args.seed + 1)
    _, _, _, warm_walls, _ = run(state, k0)

    # timed run: a FRESH prior ensemble (different key), so no layer of
    # the tunnel's host-side result caching can serve stale buffers
    state2 = SMCState.initial(
        prior.sample(jax.random.fold_in(k_prior, 7), n), k_run)
    t0 = time.perf_counter()
    final, final_true, acc_total, chunk_walls, final_log_scale = run(
        state2, jax.random.key(3 * args.seed + 2))
    jax.block_until_ready(final.weights)
    dt = time.perf_counter() - t0
    # tunnel pathology guard (PERF_NOTES rule #8): a chunk whose wall
    # reads ~0 was served from host-side caching, not executed fresh.
    # Fall back to the warmup's post-compile chunks (scaled to the full
    # chunk count) before declaring the timing unusable.
    timing_suspect = n_chunks > 1 and (min(chunk_walls) < 1e-3
                                       or dt < 0.01 * n_chunks)
    if timing_suspect and n_chunks > 1 and min(warm_walls[1:]) > 1e-3:
        dt = sum(warm_walls[1:]) * n_chunks / (n_chunks - 1)
        chunk_walls = warm_walls
        timing_suspect = False
        timing_source = "warmup_chunks"
    else:
        timing_source = "timed_run"

    # host-side fidelity (scipy; keeps complex math off the device);
    # time-dependent runs score against the DIFFUSED final truth
    true_rho = np.asarray(tomo_model.modelparams_to_states(
        np.asarray(final_true)))[0]
    est = np.asarray(final.weights) @ np.asarray(final.locations)
    rho_est = np.asarray(tomo_model.modelparams_to_states(est[None]))[0]
    from scipy.linalg import sqrtm

    s_sig = sqrtm(true_rho)
    inner = sqrtm(s_sig @ rho_est @ s_sig)
    fidelity = float(np.real(np.trace(inner)) ** 2)
    ups = n * total_steps / dt
    n_resamples = int(final.resample_count)
    mean_acc = (round(float(acc_total) / max(n_resamples, 1), 3)
                if acc_total is not None and n_moves > 0 else None)

    print(json.dumps({
        "metric": ("process_tomography_particle_updates_per_s"
                   if args.process else
                   "diffusive_tomography_particle_updates_per_s"
                   if args.diffusive else
                   "tomography_particle_updates_per_s"),
        "n_particles": n,
        "n_steps": total_steps,
        "n_qubits": (None if args.process or args.diffusive
                     else int(args.qubits)),
        "mcmc_moves": int(args.moves),
        "mcmc_method": (args.mcmc_method if args.moves > 0 else None),
        "mcmc_adapt": bool(args.adapt),
        "final_log_scale": (round(final_log_scale, 4)
                            if final_log_scale is not None else None),
        "shots": int(args.shots),
        "eig_design": bool(args.eig),
        "eig_policy": (args.eig_policy if args.eig else None),
        "eig_interval": (int(args.eig_interval) if args.eig else None),
        "value": round(ups, 1),
        "fidelity": round(fidelity, 4),
        "resamples": n_resamples,
        "mean_move_acceptance": mean_acc,
        "wall_s": round(dt, 2),
        "chunk_walls_s": [round(w, 3) for w in chunk_walls],
        "timing_suspect": timing_suspect,
        "timing_source": timing_source,
    }))


if __name__ == "__main__":
    main()
