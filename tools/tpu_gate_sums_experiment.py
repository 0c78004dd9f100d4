"""TPU experiment: gate windowed-sum formulations + Pallas re-probe.

The final round-2 profile (docs/PERF.md) leaves ~2.5 ms/iter in the gate's
elementwise pass stack (amp moving average + the qualify/quiet run sums +
the segmented pulse scan) - ~4x above its pass-count roofline.  Candidates:

A. dyadic doubling (current run_sum): log2(win) shifted adds, flat arrays.
B. multi-channel overlap-save conv: the SAME re-blocking trick that took
   the FIR from 7.8 -> 1.55 ms; all indicator windows of one input become
   output channels of ONE strided conv (stride 1), so the MXU does the
   windowed sums in a single pass.
C. blocked-cumsum moving_sum (round-1 formulation) for reference.

Also re-probes Pallas execution on this runtime (CLAUDE.md: re-validate
each round) with a trivial elementwise kernel.

Timing: K-loop difference quotient inside one jit (see bench.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")


def main():
    import jax
    import jax.numpy as jnp

    from gen2_rfid_tpu.dsp.filters import moving_sum, run_sum, _overlap_blocks

    n = 9_700_000 // 5  # post-decim length of the bench iteration
    rng = np.random.default_rng(0)
    amp_h = np.abs(rng.normal(1.0, 0.1, n)).astype(np.float32)

    def conv_sums(amp, wins, block=8192):
        """All windowed sums of one input via a single multi-channel
        overlap-save conv.  out[c][i] = sum(amp[i-wins[c]+1 .. i])."""
        t = max(wins)
        halo = t - 1
        nb = -(-n // block)
        xp = jnp.pad(amp, (0, nb * block - n))
        blocks = xp.reshape(nb, block)
        heads = jnp.pad(blocks[:-1, block - halo:], ((1, 0), (0, 0)))
        ext = jnp.concatenate([heads, blocks], axis=1)     # (nb, halo+block)
        taps = np.zeros((len(wins), 1, t), np.float32)
        for c, w in enumerate(wins):
            # After the [::-1] below the ones sit at [t-w, t): each output
            # sums the LAST w samples of its t-span (causal window).
            taps[c, 0, :w] = 1.0
        out = jax.lax.conv_general_dilated(
            ext[:, None, :], jnp.asarray(taps[:, :, ::-1]),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))        # (nb, C, block)
        return out.transpose(1, 0, 2).reshape(len(wins), -1)[:, :n]

    def variant_dyadic(amp):
        a = run_sum(amp, 100)
        b = run_sum(amp, 98)
        c = run_sum(amp, 4)
        return a[::97].sum() + b[::97].sum() + c[::97].sum()

    def variant_conv(amp):
        s = conv_sums(amp, (100, 98, 4))
        return s[0, ::97].sum() + s[1, ::97].sum() + s[2, ::97].sum()

    def variant_cumsum(amp):
        a = moving_sum(amp, 100)
        b = moving_sum(amp, 98)
        c = moving_sum(amp, 4)
        return a[::97].sum() + b[::97].sum() + c[::97].sum()

    def timed(name, fn, k1=4, k2=12):
        def loop(k):
            @jax.jit
            def body(x):
                def it(i, carry):
                    # data dependency chains iterations
                    return fn(x + carry * 0.0) + 0.0 * carry
                return jax.lax.fori_loop(0, k, it, jnp.float32(0))
            return body

        x = jnp.asarray(amp_h)
        f1, f2 = loop(k1), loop(k2)
        _ = np.asarray(f1(x)); _ = np.asarray(f2(x))   # compile+run BOTH
        t0 = time.perf_counter(); _ = np.asarray(f1(x)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = np.asarray(f2(x)); t2 = time.perf_counter() - t0
        per = (t2 - t1) / (k2 - k1) * 1e3
        print(f"{name}: {per:.2f} ms/iter  (k{k1} {t1*1e3:.1f} ms, k{k2} {t2*1e3:.1f} ms)",
              flush=True)
        return per

    # Correctness cross-check on small input first (CPU-verifiable shapes).
    s = conv_sums(jnp.asarray(amp_h), (100, 98, 4))
    d = (run_sum(jnp.asarray(amp_h), 100),
         run_sum(jnp.asarray(amp_h), 98),
         run_sum(jnp.asarray(amp_h), 4))
    for c in range(3):
        err = float(jnp.max(jnp.abs(s[c] - d[c])))
        print(f"win{(100, 98, 4)[c]}: max|conv - dyadic| = {err}", flush=True)

    timed("dyadic run_sum x3", variant_dyadic)
    timed("multi-channel conv", variant_conv)
    timed("blocked cumsum x3", variant_cumsum)

    # Pallas re-probe (hardware execution check, trivial kernel).
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0 + 1.0

        x = jnp.asarray(amp_h[: 8 * 128].reshape(8, 128))

        @jax.jit
        def run(x):
            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        got = np.asarray(run(x))
        ok = np.allclose(got, np.asarray(x) * 2 + 1)
        print(f"pallas probe: {'EXECUTES OK' if ok else 'WRONG RESULT'}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas probe: FAILED ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()


def rises_probe():
    """Isolate _rises_since_reset (the 11-step segmented doubling)."""
    import jax
    import jax.numpy as jnp

    from gen2_rfid_tpu.dsp.gate import _rises_since_reset

    n = 9_700_000 // 5
    rng = np.random.default_rng(1)
    rise_h = (rng.random(n) < 0.002)
    reset_h = (rng.random(n) < 0.001)

    def fn(rise, reset):
        return _rises_since_reset(rise, reset, 1664)[::97].sum()

    def loop(k):
        @jax.jit
        def body(a, b):
            def it(i, carry):
                return fn(a, b != (carry > 1e30)) + 0.0 * carry
            return jax.lax.fori_loop(0, k, it, jnp.float32(0))
        return body

    a, b = jnp.asarray(rise_h), jnp.asarray(reset_h)
    f1, f2 = loop(4), loop(12)
    _ = np.asarray(f1(a, b)); _ = np.asarray(f2(a, b))
    t0 = time.perf_counter(); _ = np.asarray(f1(a, b)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); _ = np.asarray(f2(a, b)); t2 = time.perf_counter() - t0
    print(f"_rises_since_reset: {(t2 - t1) / 8 * 1e3:.2f} ms/iter "
          f"(k4 {t1*1e3:.1f} ms, k12 {t2*1e3:.1f} ms)", flush=True)


def rises_blocked_probe():
    """Candidate: segmented windowed scan via overlap blocks + ONE cumsum +
    ONE cummax along the minor axis.

    out[i] = c[i] - max(cummax_{j<=i}(reset_j ? c[j] : -1), 0) with
    c = within-block inclusive cumsum of rise - exact because c is
    nondecreasing (the value at the last reset IS the running max of
    values at resets) and integer-valued f32 (< 2^24).  Lookback is
    bounded by the protocol's reset-within-span guarantee, so each
    overlap block of halo >= span computes its samples exactly.
    """
    import jax
    import jax.numpy as jnp

    from gen2_rfid_tpu.dsp.filters import _overlap_blocks
    from gen2_rfid_tpu.dsp.gate import _rises_since_reset

    n = 9_700_000 // 5
    span = 1664
    rng = np.random.default_rng(1)
    rise_h = (rng.random(n) < 0.002)
    reset_h = (rng.random(n) < 0.001)
    # Enforce the protocol guarantee for the equality check: a reset at
    # least every `span` positions.
    reset_h[::span // 2] = True

    def blocked(rise, reset, block=8192, halo=span):
        er = _overlap_blocks(rise.astype(jnp.float32), block, halo)
        es = _overlap_blocks(reset, block, halo)
        c = jnp.cumsum(er, axis=1)
        cm = jax.lax.cummax(jnp.where(es, c, -1.0), axis=1)
        out = c - jnp.maximum(cm, 0.0)
        return out[:, halo:].reshape(-1)[: rise.shape[0]]

    a, b = jnp.asarray(rise_h), jnp.asarray(reset_h)
    ref = _rises_since_reset(a, b, span)
    got = blocked(a, b)
    print("blocked == dyadic:", bool(jnp.all(ref == got)), flush=True)

    def timed(name, fn):
        def loop(k):
            @jax.jit
            def body(x, y):
                def it(i, carry):
                    return fn(x, y != (carry > 1e30))[::97].sum() + 0.0 * carry
                return jax.lax.fori_loop(0, k, it, jnp.float32(0))
            return body

        f1, f2 = loop(4), loop(12)
        _ = np.asarray(f1(a, b)); _ = np.asarray(f2(a, b))
        t0 = time.perf_counter(); _ = np.asarray(f1(a, b)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); _ = np.asarray(f2(a, b)); t2 = time.perf_counter() - t0
        print(f"{name}: {(t2 - t1) / 8 * 1e3:.2f} ms/iter", flush=True)

    timed("dyadic _rises_since_reset", lambda x, y: _rises_since_reset(x, y, span))
    timed("blocked cumsum+cummax", blocked)
