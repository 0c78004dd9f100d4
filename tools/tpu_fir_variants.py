"""FIR variant shootout + full-pipeline bench on TPU.

Variants of the 25-tap boxcar matched filter + decimate-5 front-end
(XLA conv measured 5.9 ms/iter = ~60x above the HBM roofline), plus the
full decode pipeline with the selection-matmul decode rewrites.
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

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.dsp.filters import matched_filter_decimate
    from gen2_rfid_tpu.runtime.inventory import (decode_block, matched_taps,
                                                 to_planar)
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(max_events=2048)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=80,
                              seed=2)
    iq2 = to_planar(np.concatenate([tr.iq] * 8))
    n_adc = iq2.shape[1]
    taps_np = np.asarray(matched_taps(cfg), np.float32)
    d = cfg.decim

    def fir_conv(x2):
        iq = jax.lax.complex(x2[0], x2[1])
        y = matched_filter_decimate(iq, taps_np, d)
        return jnp.real(y), jnp.imag(y)

    def fir_poly(x2):
        t = taps_np.shape[0]
        n = x2.shape[1]
        n_out = n // d
        e = taps_np[::-1]
        m_rows = -(-t // d)
        ln = (n_out + m_rows) * d
        xp = jnp.pad(x2, ((0, 0), (t - 1, max(0, ln - (n + t - 1)))))[:, :ln]
        r = xp.reshape(2, n_out + m_rows, d)
        tm = np.zeros((m_rows, d), np.float32)
        for j in range(t):
            tm[j // d, j % d] = e[j]
        acc = jnp.zeros((2, n_out, d), jnp.float32)
        for m in range(m_rows):
            acc = acc + r[:, m:m + n_out, :] * jnp.asarray(tm[m])[None, None, :]
        y = acc.sum(axis=2)
        return y[0], y[1]

    def fir_strided(x2):
        t = taps_np.shape[0]
        n = x2.shape[1]
        n_out = n // d
        e = taps_np[::-1]
        xp = jnp.pad(x2, ((0, 0), (t - 1, d)))
        acc = jnp.zeros((2, n_out), jnp.float32)
        for j in range(t):
            acc = acc + float(e[j]) * jax.lax.slice(
                xp, (0, j), (2, j + n_out * d), (1, d))
        return acc[0], acc[1]

    def fir_selmm(x2):
        # Round-5: blocked overlap-save SELECTION MATMUL (the PFB-winning
        # pattern): slabs of B outputs x a dense (h + B*d, B) tap matrix
        # on the MXU; the conv path measured movement-bound (~60 GB/s
        # effective).
        t = taps_np.shape[0]
        n = x2.shape[1]
        n_out = n // d
        bsz = 512
        nb = -(-n_out // bsz)
        h = t - 1
        flat = jnp.pad(x2, ((0, 0), (h, nb * bsz * d - n)))
        blocks = flat[:, h:].reshape(2, nb, bsz * d)
        tails = flat[:, : nb * bsz * d].reshape(2, nb, bsz * d)[:, :, :h]
        sel = np.zeros((h + bsz * d, bsz), np.float32)
        for i in range(bsz):
            sel[i * d: i * d + t, i] = taps_np
        hi = jax.lax.Precision.HIGHEST
        y = (jnp.einsum("cbj,jo->cbo", tails, jnp.asarray(sel[:h]),
                        precision=hi)
             + jnp.einsum("cbj,jo->cbo", blocks, jnp.asarray(sel[h:]),
                          precision=hi))
        y = y.reshape(2, nb * bsz)[:, :n_out]
        return y[0], y[1]

    FIRS = {"conv": fir_conv, "poly": fir_poly, "strided": fir_strided,
            "selmm": fir_selmm}

    def make_fn(which: str, front_only: bool):
        fir = FIRS[which]

        def fn(x2):
            yr, yi = fir(x2)
            if front_only:
                return jnp.sum(yr) + jnp.sum(yi)
            stats, _ = decode_block(jax.lax.complex(yr, yi), cfg)
            return stats.n_epc_correct.astype(jnp.float32)
        return fn

    @functools.partial(jax.jit, static_argnames=("which", "front_only", "k"))
    def repeat(x2, which: str, front_only: bool, k: int):
        fn = make_fn(which, front_only)

        def body(i, carry):
            acc, x = carry
            acc = acc + fn(x)
            x = x + acc * jnp.float32(1e-30)
            return acc, x
        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), x2))
        return acc.reshape(1)

    def timed(which, front_only, k):
        t0 = time.perf_counter()
        out = repeat(iq2, which, front_only, k)
        np.asarray(out)
        return time.perf_counter() - t0

    k1, k2 = 1, 9
    for which in os.environ.get("FIR_VARIANTS",
                                 "conv,poly,strided").split(","):
        for front_only in (True,):
            t_comp0 = time.perf_counter()
            timed(which, front_only, k1)
            timed(which, front_only, k2)
            compile_s = time.perf_counter() - t_comp0
            t1 = min(timed(which, front_only, k1) for _ in range(2))
            t2 = min(timed(which, front_only, k2) for _ in range(2))
            per = max((t2 - t1) / (k2 - k1), 1e-9)
            print(json.dumps({"fir": which, "front_only": front_only,
                              "ms": round(per * 1e3, 2),
                              "Msps": round(n_adc / per / 1e6, 1),
                              "compile_s": round(compile_s, 1)}), flush=True)
    # Full pipeline with the best front (conv baseline first for reference).
    for which in ("conv", "poly"):
        t_comp0 = time.perf_counter()
        timed(which, False, k1)
        timed(which, False, k2)
        compile_s = time.perf_counter() - t_comp0
        t1 = min(timed(which, False, k1) for _ in range(2))
        t2 = min(timed(which, False, k2) for _ in range(2))
        per = max((t2 - t1) / (k2 - k1), 1e-9)
        print(json.dumps({"full_with": which, "ms": round(per * 1e3, 2),
                          "Msps": round(n_adc / per / 1e6, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
