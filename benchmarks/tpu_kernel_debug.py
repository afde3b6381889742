"""Debug harness for the streaming resample kernel on real TPU."""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from qinfer_tpu.resamplers import (  # noqa: E402
    counting_multiplicities_from_u,
    counting_locations_from_u,
)
from qinfer_tpu.ops.streaming_resample import (  # noqa: E402
    streaming_resample_locations,
)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n, d = 4096, 2
    w = rng.pareto(0.7, n).astype(np.float32) + 1e-12
    w /= w.sum()
    x = rng.normal(size=(n, d)).astype(np.float32)
    w, x = jnp.asarray(w), jnp.asarray(x)
    u = 0.37

    m, starts = jax.jit(counting_multiplicities_from_u,
                        static_argnums=2)(u, w, n)
    got = np.asarray(streaming_resample_locations(m, starts, x))
    want = np.asarray(counting_locations_from_u(u, w, x, strategy="scan"))

    print("zeros in got:", float((got == 0).mean()), flush=True)
    print("got[:3]:", got[:3].tolist())
    print("want[:3]:", want[:3].tolist())
    print("got[2000:2003]:", got[2000:2003].tolist())
    print("want[2000:2003]:", want[2000:2003].tolist())
    # is got a permutation of want rows?
    gs = set(map(tuple, np.round(got, 4)))
    ws = set(map(tuple, np.round(want, 4)))
    print("row-set equal:", gs == ws, "len", len(gs), len(ws))
    # maybe d-axis mixed: compare column-swapped
    print("col-swap match:", bool((got[:, ::-1] == want).all()))
    # maybe chunk-major mixing: reshape tests
    g4 = got  # (n, d)
    for perm_tag, arr in [
        ("chunk-transpose", g4.reshape(2, 16, 128, d).transpose(
            1, 0, 2, 3).reshape(n, d)),
    ]:
        print(perm_tag, "match:", bool((arr == want).all()))


if __name__ == "__main__":
    main()
