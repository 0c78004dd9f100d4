"""SIC collision-recovery envelope: pair-recovery rate over amplitude
ratio x T1 offset x SNR (companion to classifier_sweep.py).

Writes a markdown table to stdout; the numbers behind docs/COLLISION.md.
Run: env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/sic_sweep.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.dsp.collision import rn16_sic
    from gen2_rfid_tpu.dsp.filters import boxcar_taps, matched_filter_decimate
    from gen2_rfid_tpu.sim.tag import fm0_chips, superpose_reply

    cfg = ReaderConfig()
    sp_us = cfg.adc_rate / 1e6

    def window(tags, noise, rng):
        n = int(round((cfg.t1_us + cfg.t2_us + cfg.rn16_us) * sp_us)) + 4000
        seg = np.full(n, 1.0, dtype=np.complex64)
        for bits, bs, t1 in tags:
            superpose_reply(seg, fm0_chips(bits), t1, bs, cfg.tag_bit_us / 2,
                            sp_us, cfg.adc_rate)
        x = np.concatenate([np.full(2000, 1.0, np.complex64), seg])
        if noise:
            x = x + (rng.normal(0, noise / 2 ** 0.5, x.size)
                     + 1j * rng.normal(0, noise / 2 ** 0.5, x.size)
                     ).astype(np.complex64)
        y = np.asarray(matched_filter_decimate(
            jnp.asarray(x), boxcar_taps(25), cfg.decim))
        dc = y[300:348].mean()
        start = 400 + int(round(252.5 * sp_us)) // 5 - 4
        return jnp.asarray(y[start:start + cfg.rn16_window + 8] - dc)

    # Post-MF half-symbol SNR of the WEAKER tag (sim/snr.py definition).
    def sigma_for(bs_abs, snr_db):
        return bs_abs * np.sqrt(25 / (10 ** (snr_db / 10.0)))

    ratios = [1.0, 0.7, 0.4, 0.2, 0.1]
    dt1s = [0.0, 2.5, 5.0]      # us of T1 offset between the two tags
    snrs = [30.0, 15.0]
    n_trials = 12
    bs1 = 0.08 + 0.03j

    print("| ratio |h2|/|h1| | ΔT1 (µs) | weak-tag SNR (dB) | pair rate |")
    print("|---|---|---|---|")
    for ratio in ratios:
        for dt1 in dt1s:
            for snr in snrs:
                ok = 0
                for trial in range(n_trials):
                    rng = np.random.default_rng(1000 * trial + 7)
                    b1 = rng.integers(0, 2, 16)
                    b2 = rng.integers(0, 2, 16)
                    ph = rng.uniform(0, 2 * np.pi)
                    bs2 = abs(bs1) * ratio * np.exp(1j * ph)
                    noise = sigma_for(abs(bs2), snr)
                    r = rn16_sic(window([(b1, bs1, 252.5),
                                         (b2, bs2, 252.5 + dt1)],
                                        noise, rng), cfg)
                    g1 = np.array_equal(np.asarray(r.bits1), b1)
                    g2 = np.array_equal(np.asarray(r.bits2), b2)
                    ok += g1 and g2
                print(f"| {ratio} | {dt1} | {snr} | {ok}/{n_trials} |")


if __name__ == "__main__":
    main()


def epc_sweep():
    """EPC-window SIC envelope: both-frames-CRC-pass rate over amplitude
    ratio x T1 offset x SNR (random 96-bit EPC payloads; same-RN16
    collision scenario).  Run:
    env -u PYTHONPATH JAX_PLATFORMS=cpu python -c
    "import sys; sys.path.insert(0,'.');
     from tools.sic_sweep import epc_sweep; epc_sweep()"
    """
    import jax.numpy as jnp

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.dsp.collision import epc_sic
    from gen2_rfid_tpu.dsp.filters import boxcar_taps, matched_filter_decimate
    from gen2_rfid_tpu.sim.tag import Tag, fm0_chips, superpose_reply

    cfg = ReaderConfig()
    sp_us = cfg.adc_rate / 1e6

    def window(tags, noise, rng):
        n = int(round((3 * cfg.t1_us + cfg.t2_us + cfg.epc_us) * sp_us)) + 4000
        seg = np.full(n, 1.0, dtype=np.complex64)
        for tag, t1 in tags:
            superpose_reply(seg, fm0_chips(tag.epc_frame_bits()), t1,
                            tag.backscatter, cfg.tag_bit_us / 2, sp_us,
                            cfg.adc_rate)
        x = np.concatenate([np.full(2000, 1.0, np.complex64), seg])
        x = x + (rng.normal(0, noise / 2 ** 0.5, x.size)
                 + 1j * rng.normal(0, noise / 2 ** 0.5, x.size)
                 ).astype(np.complex64)
        y = np.asarray(matched_filter_decimate(
            jnp.asarray(x), boxcar_taps(25), cfg.decim))
        dc = y[300:348].mean()
        start = 400 + int(round(252.5 * sp_us)) // 5 - 4
        return jnp.asarray(y[start:start + cfg.epc_window + 8] - dc)

    trials = 8
    ratios = (1.0, 0.7, 0.4, 0.15)
    dts = (0.0, 2.5)
    noises = (0.004, 0.02)
    print("| |h2|/|h1| | " + " | ".join(
        f"dT1 {dt} us, noise {nz}" for nz in noises for dt in dts) + " |")
    print("|---|" + "---|" * (len(dts) * len(noises)))
    for ratio in ratios:
        row = [f"| {ratio} "]
        for nz in noises:
            for dt in dts:
                ok = 0
                for s in range(trials):
                    rng = np.random.default_rng(1000 + s)
                    b1 = 0.085 * np.exp(1j * rng.uniform(0, 6.28))
                    b2 = (0.085 * ratio) * np.exp(1j * rng.uniform(0, 6.28))
                    t1 = Tag(epc96=rng.integers(0, 2, 96), backscatter=b1)
                    t2 = Tag(epc96=rng.integers(0, 2, 96), backscatter=b2)
                    r = epc_sic(window([(t1, 252.5), (t2, 252.5 + dt)],
                                       nz, rng), cfg)
                    got = {tuple(int(x) for x in fr)
                           for fr, o in zip(np.asarray(r.bits),
                                            np.asarray(r.crc_ok)) if o}
                    want = {tuple(int(x) for x in t1.epc_frame_bits()),
                            tuple(int(x) for x in t2.epc_frame_bits())}
                    ok += want <= got
                row.append(f"| {ok}/{trials} ")
        print("".join(row) + "|")
