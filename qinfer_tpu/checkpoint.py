"""Engine checkpoint / resume.

Reference parity: the reference has **no checkpoint subsystem** — users
pickle the updater or re-seed from a ``ParticleDistribution`` (SURVEY.md
§5). This module is the promised "strict superset": the engine state is an
explicit pytree (:class:`~qinfer_tpu.smc.SMCState`), so checkpointing is a
plain array serialization, restorable into a fresh updater on any device
topology (resharding happens automatically on ``device_put``).

Two formats:
* ``save_updater`` / ``load_updater`` — single-file ``.npz`` (no extra
  deps; host-side).
* ``save_updater_orbax`` / ``load_updater_orbax`` — orbax-checkpoint
  directories when available (async, multi-host friendly).
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from .smc import SMCState

__all__ = [
    "state_to_arrays",
    "arrays_to_state",
    "save_updater",
    "load_updater",
    "save_updater_orbax",
    "load_updater_orbax",
]


def state_to_arrays(state):
    """Flatten an :class:`SMCState` to a dict of NumPy arrays (PRNG key
    exported via ``jax.random.key_data``)."""
    out = {k: np.asarray(v) for k, v in state._asdict().items()
           if k != "key"}
    out["key"] = np.asarray(jax.random.key_data(state.key))
    return out


def arrays_to_state(arrays, sharding=None):
    """Rebuild an :class:`SMCState` from :func:`state_to_arrays` output."""
    def put(x, s=None):
        x = jnp.asarray(x)
        return jax.device_put(x, s) if s is not None else x

    loc_sharding = None
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        loc_sharding = NamedSharding(
            sharding.mesh, P(sharding.spec[0], None))
    return SMCState(
        weights=put(arrays["weights"], sharding),
        locations=put(arrays["locations"], loc_sharding),
        key=jax.random.wrap_key_data(jnp.asarray(arrays["key"])),
        resample_count=put(arrays["resample_count"]),
        just_resampled=put(arrays["just_resampled"]),
        log_total_likelihood=put(arrays["log_total_likelihood"]),
        min_n_ess=put(arrays["min_n_ess"]),
        zero_weight_count=put(arrays["zero_weight_count"]),
        resampler_fallback_count=put(
            arrays.get("resampler_fallback_count",
                       np.asarray(0, np.int32))),
    )


def _rejuvenation_record_arrays(updater):
    """The rejuvenation record as flat arrays: the compressed
    sufficient-statistic pool (``_pool_*``) and/or the full per-experiment
    record (``_eps_record``). Without these a restored updater's
    resample-move would silently target an EMPTY record (prior-only
    moves) — a correctness gap for any rejuvenating updater that resumes
    (caught round 4)."""
    extra = {"__n_record": np.asarray(getattr(updater, "_n_record", 0),
                                      np.int64),
             # Robbins-Monro adaptive-kernel state (round 5): without it
             # a resumed adaptive updater would restart from the initial
             # scale and re-pay the adaptation transient. The flag marks
             # whether the SOURCE actually used the adaptive kernel —
             # restoring a legacy/fixed-kernel checkpoint must not
             # clobber a fresh updater's seeded initial scale.
             "__mcmc_adaptive": np.asarray(
                 1 if getattr(updater, "_use_adaptive_kernel", False)
                 else 0, np.int64),
             "__mcmc_log_scale": np.asarray(
                 getattr(updater, "_mcmc_log_scale", 0.0), np.float64),
             "__mcmc_adapt_t": np.asarray(
                 getattr(updater, "_mcmc_adapt_t", 0), np.int64)}
    if updater._pool_eps:
        for k in updater._pool_eps[0]:
            extra[f"__pool_eps__{k}"] = np.concatenate(
                [np.atleast_1d(e[k]) for e in updater._pool_eps], axis=0)
        extra["__pool_succ"] = np.asarray(updater._pool_succ, np.float64)
        extra["__pool_trials"] = np.asarray(updater._pool_trials,
                                            np.float64)
    if updater._eps_record:
        for k in updater._eps_record[0]:
            extra[f"__eps_record__{k}"] = np.concatenate(
                [np.asarray(e[k]) for e in updater._eps_record], axis=0)
    return extra


def _restore_rejuvenation_record(updater, arrays):
    """Inverse of :func:`_rejuvenation_record_arrays`; ``arrays`` keys are
    consumed (popped). Clears any stale record the target updater holds."""
    updater._n_record = int(arrays.pop("__n_record", 0))
    src_adaptive = bool(int(arrays.pop("__mcmc_adaptive", 0)))
    ls = arrays.pop("__mcmc_log_scale", None)
    t_ad = arrays.pop("__mcmc_adapt_t", None)
    if (src_adaptive and ls is not None
            and getattr(updater, "_use_adaptive_kernel", False)):
        updater._mcmc_log_scale = float(ls)
        updater._mcmc_adapt_t = int(t_ad)
    pool_keys = [k for k in list(arrays) if k.startswith("__pool_eps__")]
    updater._pool_eps, updater._pool_succ, updater._pool_trials = [], [], []
    updater._pool_index = {}
    if pool_keys:
        fields = {k[len("__pool_eps__"):]: np.asarray(arrays.pop(k))
                  for k in pool_keys}
        succ = np.asarray(arrays.pop("__pool_succ"))
        trials = np.asarray(arrays.pop("__pool_trials"))
        E = succ.shape[0]
        for i in range(E):
            eps_i = {k: v[i:i + 1] for k, v in fields.items()}
            key_bytes = b"\x00".join(
                k.encode() + b"="
                + np.ascontiguousarray(eps_i[k]).tobytes()
                for k in sorted(eps_i))
            updater._pool_index[key_bytes] = i
            updater._pool_eps.append(eps_i)
            updater._pool_succ.append(float(succ[i]))
            updater._pool_trials.append(float(trials[i]))
    rec_keys = [k for k in list(arrays) if k.startswith("__eps_record__")]
    updater._eps_record = []
    if rec_keys:
        fields = {k[len("__eps_record__"):]: np.asarray(arrays.pop(k))
                  for k in rec_keys}
        T = next(iter(fields.values())).shape[0]
        updater._eps_record = [
            {k: jnp.asarray(v[i:i + 1]) for k, v in fields.items()}
            for i in range(T)]
        if updater._n_record == 0:
            updater._n_record = T


def save_updater(path, updater):
    """Checkpoint an updater's full inference state (ensemble + records,
    including the rejuvenation record / compressed pool) to one ``.npz``
    file (``np.savez`` appends the extension if missing)."""
    arrays = state_to_arrays(updater.state)
    arrays.update(_rejuvenation_record_arrays(updater))
    if updater.data_record:
        # preserves vector-valued outcomes (outcome_ndim > 0 models) —
        # records within one run share a shape, so a plain stack works
        arrays["__data_record"] = np.asarray(
            [np.asarray(o, dtype=np.float64) for o in updater.data_record])
    else:
        arrays["__data_record"] = np.zeros((0,), dtype=np.float64)
    arrays["__normalization_record"] = np.asarray(
        updater.normalization_record, dtype=np.float64)
    np.savez(path, **arrays)


def load_updater(path, updater):
    """Restore state saved by :func:`save_updater` into an existing updater
    (which supplies model/prior/resampler config). Returns the updater."""
    try:
        loaded = dict(np.load(path))
    except FileNotFoundError:
        # np.savez appended '.npz' on save; mirror that here
        loaded = dict(np.load(str(path) + ".npz"))
    data_record = loaded.pop("__data_record")
    norm_record = loaded.pop("__normalization_record")
    _restore_rejuvenation_record(updater, loaded)
    updater.state = arrays_to_state(loaded, sharding=updater.sharding)
    updater.data_record = list(data_record)
    updater.normalization_record = list(norm_record)
    # keep host-side bookkeeping consistent with the restored ensemble
    updater._n_particles = int(updater.state.weights.shape[0])
    return updater


def save_updater_orbax(path, updater):
    """Orbax-checkpoint variant (async-capable, multi-host)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    arrays = state_to_arrays(updater.state)
    arrays.update(_rejuvenation_record_arrays(updater))
    ckptr.save(path, arrays, force=True)
    ckptr.wait_until_finished()
    meta = {
        "data_record": [np.asarray(o, dtype=np.float64).tolist()
                        for o in updater.data_record],
        "normalization_record": [float(x)
                                 for x in updater.normalization_record],
    }
    with open(str(path) + ".meta.json", "w") as fh:
        json.dump(meta, fh)


def load_updater_orbax(path, updater):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    arrays = dict(ckptr.restore(path))
    _restore_rejuvenation_record(updater, arrays)
    updater.state = arrays_to_state(arrays, sharding=updater.sharding)
    try:
        with open(str(path) + ".meta.json") as fh:
            meta = json.load(fh)
        updater.data_record = list(meta["data_record"])
        updater.normalization_record = list(meta["normalization_record"])
    except FileNotFoundError:
        pass
    return updater
