"""On-TPU validation of the Pallas streaming-resample kernel.

Compares the kernel against the XLA 'scan' counting fill on the real
chip (bit-identical expected: the kernel's one-hot matmul multiplies by
exactly 0.0/1.0) at the production tiling, then times both inside a
compiled loop.

Run sequentially — ONE TPU client at a time (CLAUDE.md rule 2).
"""

import time

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

    for n, d, tag in [(4096, 2, "small"), (2**21, 1, "bench-size"),
                      (2**21, 5, "bench-d5"),
                      (500_000, 4, "tomo-padded"),
                      (4096, 3, "qubit-d3"), (4096, 16, "process-d16"),
                      (8192, 2, "extreme-values")]:
        w = rng.pareto(0.7, n).astype(np.float32) + 1e-12
        w /= w.sum()
        if tag == "extreme-values":
            # stress the exact int8 one-hot selection: full-mantissa
            # values across the ENTIRE f32 bit space — subnormals, ±0,
            # ±inf and NaN payloads (exponent 255 included)
            mant = rng.integers(0, 1 << 23, size=(n, d), dtype=np.int64)
            expo = rng.integers(0, 256, size=(n, d), dtype=np.int64)
            sign = rng.integers(0, 2, size=(n, d), dtype=np.int64) << 31
            bits = (sign | (expo << 23) | mant).astype(np.uint32)
            x = bits.view(np.float32)
        else:
            x = rng.normal(size=(n, d)).astype(np.float32)
        w, x = jnp.asarray(w), jnp.asarray(x)
        u = 0.37

        m, starts = jax.jit(counting_multiplicities_from_u,
                            static_argnums=2)(u, w, n)
        got = streaming_resample_locations(m, starts, x)
        got.block_until_ready()
        if tag == "extreme-values":
            # ground truth by literal span expansion: XLA's own fills
            # flush subnormals (associative_scan under FTZ), so only the
            # NumPy expansion is bit-faithful on these vectors
            want = jnp.asarray(np.repeat(
                np.asarray(x), np.asarray(m), axis=0))
            same = bool(jnp.all(
                got.view(jnp.int32) == want.view(jnp.int32)))
        else:
            want = counting_locations_from_u(u, w, x, strategy="scan")
            want.block_until_ready()
            same = bool(jnp.all(
                got.view(jnp.int32) == want.view(jnp.int32)))
        print(f"[{tag}] n={n} d={d} bit-identical: {same}", flush=True)
        if not same:
            # diagnose on raw bits (float != is wrong for NaN / ±0)
            gb = np.asarray(got).view(np.uint32)
            wb = np.asarray(want).view(np.uint32)
            rows = np.any(gb != wb, axis=1)
            print(f"  mismatched rows: {int(rows.sum())}/{n}")
            print("  first idx:", np.nonzero(rows)[0][:10])
            return

    # timing at bench size: K resamples inside one compiled scan
    n, d, K = 2**21, 1, 30
    w = rng.pareto(0.7, n).astype(np.float32) + 1e-12
    w /= w.sum()
    x = rng.normal(size=(n, d)).astype(np.float32)
    w, x = jnp.asarray(w), jnp.asarray(x)

    def loop(strategy):
        @jax.jit
        def run(x0):
            def step(xc, u):
                m, starts = counting_multiplicities_from_u(u, w, n)
                if strategy == "pallas":
                    out = streaming_resample_locations(m, starts, xc)
                elif strategy.startswith("pallas-tile"):
                    out = streaming_resample_locations(
                        m, starts, xc, tile=int(strategy[11:]))
                else:
                    out = counting_locations_from_u(u, w, xc,
                                                    strategy=strategy)
                # touch the output so steps chain (no DCE)
                return out + 0.0, out[0, 0]
            us = jnp.linspace(0.01, 0.99, K)
            xf, ys = jax.lax.scan(step, x0, us)
            return ys.sum()
        run(x).block_until_ready()  # compile
        t0 = time.perf_counter()
        run(x).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"{strategy}: {dt / K * 1e3:.2f} ms/resample", flush=True)

    loop("scan")
    loop("pallas")
    # tile-size A/B (docs/PERF_NOTES.md round 3): the round-2 baseline
    # (tile == block == 128) vs the two-tile default (256) vs 512
    loop("pallas-tile128")
    loop("pallas-tile512")


if __name__ == "__main__":
    main()
