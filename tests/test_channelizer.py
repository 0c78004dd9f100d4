"""Polyphase channelizer: oracle identity, channel isolation, and
dual-reader wideband decode (dsp/channelizer.py - new capability; the
reference front end is one single-channel USRP, gr-rfid/apps/reader.py:53)."""

import numpy as np

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.dsp.channelizer import (
    channel_frequency,
    channelize,
    decode_wideband,
    pfb_taps,
)
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

N_CHAN = 8
T_BRANCH = 6


def _oracle_channel(x, h, n_chan, k):
    """Mix-down -> causal lowpass -> decimate-by-N: the textbook per-channel
    pipeline the PFB must reproduce exactly (same windows, f64 oracle)."""
    n = np.arange(x.size)
    mixed = x.astype(np.complex128) * np.exp(-2j * np.pi * k * n / n_chan)
    filt = np.convolve(mixed, h.astype(np.float64))[: x.size]
    return filt[::n_chan]


def test_pfb_matches_mix_filter_decimate_oracle():
    rng = np.random.default_rng(11)
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(np.complex64)
    h = pfb_taps(N_CHAN, T_BRANCH)
    out = channelize(x, N_CHAN, T_BRANCH)
    assert out.shape == (N_CHAN, x.size // N_CHAN)
    for k in [0, 1, 3, 4, 7]:
        ref = _oracle_channel(x, h, N_CHAN, k)[: out.shape[1]]
        err = np.max(np.abs(out[k] - ref)) / np.max(np.abs(ref))
        assert err < 2e-5, (k, err)


def test_tone_lands_in_its_channel_only():
    rate = 16e6
    n = 65536
    k_tone = 3
    off = 100e3                       # 100 kHz inside channel 3
    f = channel_frequency(k_tone, N_CHAN, rate) + off
    t = np.arange(n) / rate
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    out = channelize(x, N_CHAN, 12)
    body = out[:, 256:]               # skip the filter's startup transient
    rms = np.sqrt(np.mean(np.abs(body) ** 2, axis=1))
    assert rms[k_tone] > 0.9          # passband ~unity
    others = np.delete(rms, k_tone)
    assert np.all(others < 0.01), others   # > 40 dB isolation
    # The channelized tone sits at the offset frequency at rate/N.
    seg = body[k_tone]
    spec = np.fft.fftfreq(seg.size, N_CHAN / rate)[
        np.argmax(np.abs(np.fft.fft(seg)))
    ]
    assert abs(spec - off) < 2e3


def test_negative_channel_frequency():
    assert channel_frequency(6, 8, 16e6) == -4e6
    assert channel_frequency(1, 8, 16e6) == 2e6


def test_dual_reader_wideband_decode():
    """Two independent inventories on different FCC-style channels of one
    16 Msps capture: channelize, then the stock 2 Msps pipeline decodes
    each - the dense-reader monitoring workflow."""
    synth_cfg = ReaderConfig(adc_rate=16e6)   # writer rate only
    tr_a = synthesize_inventory(synth_cfg, [Tag.with_id(27, seed=7)],
                                n_rounds=2, seed=3, noise=0.0)
    tr_b = synthesize_inventory(synth_cfg, [Tag.with_id(99, seed=9)],
                                n_rounds=2, seed=4, noise=0.0)
    n = max(tr_a.iq.size, tr_b.iq.size)

    def place(iq, k):
        pad = np.zeros(n, np.complex64)
        pad[: iq.size] = iq
        t = np.arange(n)
        return pad * np.exp(2j * np.pi * k * t / N_CHAN).astype(np.complex64)

    rng = np.random.default_rng(5)
    wide = place(tr_a.iq, 1) + place(tr_b.iq, 6)   # +2 MHz and -4 MHz
    wide += (rng.normal(0, 0.002, n) + 1j * rng.normal(0, 0.002, n)).astype(
        np.complex64)

    cfg = ReaderConfig()                            # stock 2 Msps pipeline
    results = decode_wideband(wide, N_CHAN, cfg)
    stats_a = results[1][0]
    stats_b = results[6][0]
    assert int(stats_a.n_epc_correct) == tr_a.expected_epc_pass
    assert int(np.asarray(stats_a.tag_reads)[27]) == tr_a.expected_epc_pass
    assert int(stats_b.n_epc_correct) == tr_b.expected_epc_pass
    assert int(np.asarray(stats_b.tag_reads)[99]) == tr_b.expected_epc_pass
    # Unoccupied channels decode nothing.
    for k in (0, 3, 4):
        assert int(results[k][0].n_epc_correct) == 0


def test_wideband_sharded_mesh_decode():
    """The full pod path in one jitted program: PFB channelization feeding
    the (time, chan) sharded decode - 2 time shards x 4 channel shards on
    the virtual 8-device mesh, per-channel stats match the host loop."""
    from gen2_rfid_tpu.dsp.channelizer import decode_wideband_sharded
    from gen2_rfid_tpu.shard.mesh import make_mesh

    synth_cfg = ReaderConfig(adc_rate=16e6)
    tr_a = synthesize_inventory(synth_cfg, [Tag.with_id(27, seed=7)],
                                n_rounds=2, seed=3, noise=0.0)
    tr_b = synthesize_inventory(synth_cfg, [Tag.with_id(99, seed=9)],
                                n_rounds=2, seed=4, noise=0.0)
    n = max(tr_a.iq.size, tr_b.iq.size)

    def place(iq, k):
        pad = np.zeros(n, np.complex64)
        pad[: iq.size] = iq
        t = np.arange(n)
        return pad * np.exp(2j * np.pi * k * t / N_CHAN).astype(np.complex64)

    wide = place(tr_a.iq, 1) + place(tr_b.iq, 6)
    cfg = ReaderConfig(max_events=128)
    mesh = make_mesh(n_time=2, n_chan=4)
    stats, _ = decode_wideband_sharded(wide, N_CHAN, cfg, mesh)
    n_ok = np.asarray(stats.n_epc_correct)          # (8,) per channel
    assert n_ok[1] == tr_a.expected_epc_pass
    assert n_ok[6] == tr_b.expected_epc_pass
    assert np.asarray(stats.tag_reads)[1, 27] == tr_a.expected_epc_pass
    assert np.asarray(stats.tag_reads)[6, 99] == tr_b.expected_epc_pass
    assert n_ok[[0, 2, 3, 4, 5, 7]].sum() == 0


import pytest


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_wideband_random_placement(seed):
    """Wideband fuzz (round-5: the PFB got a new selection-matmul core):
    random channel count, random occupied channels, random tags with
    small in-envelope impairments - per-channel stats from the one-shot
    channelize+sharded-decode program must equal each placed stream's
    own slot oracle, and unoccupied channels must stay silent."""
    from gen2_rfid_tpu.dsp.channelizer import decode_wideband_sharded
    from gen2_rfid_tpu.shard.mesh import make_mesh

    rng = np.random.default_rng(7000 + seed)
    n_chan = int(rng.choice([4, 8]))
    n_occ = int(rng.integers(1, 3))
    occupied = rng.choice(n_chan, size=n_occ, replace=False)
    synth_cfg = ReaderConfig(adc_rate=2e6 * n_chan)
    traces = {}
    for k in occupied:
        tag = Tag.with_id(int(rng.integers(1, 255)),
                          seed=int(rng.integers(1 << 16)),
                          backscatter=float(rng.uniform(0.06, 0.1))
                          * np.exp(2j * np.pi * rng.uniform()),
                          blf_offset=float(rng.uniform(-5e-3, 5e-3)),
                          cfo_hz=float(rng.uniform(-20, 20)))
        traces[int(k)] = synthesize_inventory(
            synth_cfg, [tag], n_rounds=2, seed=int(rng.integers(1 << 16)))
    n = max(tr.iq.size for tr in traces.values())
    n += (-n) % (n_chan * 2 * ReaderConfig().decim * 8)
    t = np.arange(n)
    wide = np.zeros(n, np.complex64)
    for k, tr in traces.items():
        pad = np.zeros(n, np.complex64)
        pad[: tr.iq.size] = tr.iq
        wide += pad * np.exp(2j * np.pi * k * t / n_chan).astype(np.complex64)
    wide += (rng.normal(0, 0.002, n)
             + 1j * rng.normal(0, 0.002, n)).astype(np.complex64)
    cfg = ReaderConfig(max_events=64)
    mesh = make_mesh(n_time=2, n_chan=2)
    stats, _ = decode_wideband_sharded(wide, n_chan, cfg, mesh)
    n_ok = np.asarray(stats.n_epc_correct)
    reads = np.asarray(stats.tag_reads)
    for k in range(n_chan):
        if k in traces:
            tr = traces[k]
            assert n_ok[k] == tr.expected_epc_pass, (seed, k)
            (tid, cnt), = tr.expected_tag_reads.items()
            assert reads[k, tid] == cnt, (seed, k)
        else:
            assert n_ok[k] == 0, (seed, k)
