"""Window-gather granularity probe (round-6 candidate evidence).

Every decode window is fetched by gather_aligned_windows: a row gather
from a (n/G, G) view at GRANULE G=8 — 32-byte rows, 1/16 of a v5e lane
tile per index.  The wideband isolation put ~2.7 ms in these gathers.
A coarser granule fetches fewer, wider rows per event (G=64 → one full
lane tile per row, 8x fewer indices) at the price of up to G-1 samples
of slack that the decoders' selection matrices would have to absorb
(8x more column groups - "compute is ~free" on this design, but the
refactor touches fm0/miller/sync/frames + compat pins, so measure the
gather side first).

Timing-only: gathers of E windows of `width` samples at random starts,
K-chained difference quotient, at G in {8, 16, 32, 64}.

Run: timeout 3600 python tools/tpu_gather_granule_probe.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    n = 1_936_000          # flagship post-decim length
    e = 1160               # wideband-scale event count
    width = 1392           # EPC window + GRANULE
    rng = np.random.default_rng(0)
    y2 = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    starts = jnp.asarray(
        rng.integers(0, n - width - 64, size=e).astype(np.int32))

    for g in (8, 16, 32, 64):
        n_rows = -(-n // g)
        w_rows = width // g + 2

        def gather(y2, starts, g=g, n_rows=n_rows, w_rows=w_rows):
            yp = jnp.pad(y2, ((0, 0), (0, n_rows * g - n))).reshape(
                2, n_rows, g)
            r0 = jnp.maximum(starts, 0) // g
            rows = jnp.minimum(
                r0[:, None] + jnp.arange(w_rows, dtype=jnp.int32)[None, :],
                n_rows - 1)
            out = yp[:, rows]                       # (2, E, w_rows, g)
            return out.reshape(2, e, w_rows * g)

        @functools.partial(jax.jit, static_argnames=("k",))
        def repeat(y2, st, k: int, gather=gather):
            def it(i, carry):
                acc, s = carry
                out = gather(y2, s)
                acc = acc + jnp.sum(out[:, :, 0])
                s = s + jnp.minimum(acc.astype(jnp.int32), 0)
                return acc, s
            acc, _ = jax.lax.fori_loop(0, k, it, (jnp.float32(0), st))
            return acc.reshape(1)

        def timed(k):
            t0 = time.perf_counter()
            np.asarray(repeat(y2, starts, k))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        timed(1); timed(17)
        compile_s = time.perf_counter() - t0
        qs = [max((timed(17) - timed(1)) / 16, 1e-9) for _ in range(3)]
        per = float(np.median(qs))
        print(json.dumps({"granule": g, "ms": round(per * 1e3, 3),
                          "band_ms": [round(min(qs) * 1e3, 3),
                                      round(max(qs) * 1e3, 3)],
                          "bytes_gathered_mb": round(
                              2 * e * w_rows * g * 4 / 1e6, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
