"""Sharded decode tests on the virtual 8-CPU-device mesh.

Correctness criterion (SURVEY.md section 7): shard-count invariance - the
decoded event set and inventory stats must not depend on how the capture is
split across devices.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.shard.decode_sharded import decode_capture_sharded, halo_sizes
from gen2_rfid_tpu.shard.mesh import make_mesh
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

CFG = ReaderConfig()


def _pad_to(iq: np.ndarray, mult: int) -> np.ndarray:
    pad = (-len(iq)) % mult
    return np.pad(iq, (0, pad))


@pytest.fixture(scope="module")
def trace():
    return synthesize_inventory(
        CFG, [Tag.with_id(42, seed=4)], n_rounds=8, seed=21
    )


def test_time_sharded_matches_single_device(trace):
    n_dev = len(jax.devices())
    assert n_dev >= 4, "tests need the virtual multi-device CPU platform"
    mesh = make_mesh(n_time=4, n_chan=1)
    iq = _pad_to(trace.iq, 4 * CFG.decim)
    stats_s, _ = decode_capture_sharded(jnp.asarray(iq[None, :]), CFG, mesh)
    stats_1, _ = decode_capture(jnp.asarray(iq), CFG)
    assert int(stats_s.n_queries[0]) == int(stats_1.n_queries)
    assert int(stats_s.n_epc_correct[0]) == int(stats_1.n_epc_correct)
    assert int(stats_s.cur_inventory_round[0]) == int(stats_1.cur_inventory_round)
    np.testing.assert_array_equal(
        np.asarray(stats_s.tag_reads[0]), np.asarray(stats_1.tag_reads)
    )


def test_shard_count_invariance(trace):
    results = []
    for n_time in (2, 8):
        mesh = make_mesh(n_time=n_time, n_chan=1)
        iq = _pad_to(trace.iq, n_time * CFG.decim)
        stats, dec = decode_capture_sharded(jnp.asarray(iq[None, :]), CFG, mesh)
        idx = np.asarray(dec.index[0])
        valid = np.asarray(dec.valid[0])
        results.append(
            (
                int(stats.n_queries[0]),
                int(stats.n_epc_correct[0]),
                tuple(sorted(idx[valid])),
            )
        )
    assert results[0] == results[1]


def test_channel_sharding(trace):
    """Two independent channels on the chan axis: identical stats per channel."""
    mesh = make_mesh(n_time=2, n_chan=2)
    iq = _pad_to(trace.iq, 2 * CFG.decim)
    two = jnp.stack([jnp.asarray(iq), jnp.asarray(iq)])
    stats, _ = decode_capture_sharded(two, CFG, mesh)
    assert int(stats.n_epc_correct[0]) == int(stats.n_epc_correct[1])
    assert int(stats.n_queries[0]) == int(stats.n_queries[1])
    np.testing.assert_array_equal(
        np.asarray(stats.tag_reads[0]), np.asarray(stats.tag_reads[1])
    )
    assert int(stats.n_epc_correct[0]) == trace.expected_epc_pass


def test_halo_sizes_cover_windows():
    hl, hr = halo_sizes(CFG)
    assert hr >= CFG.epc_window
    assert hl >= CFG.n_samples_t1 + CFG.win_length


def test_distributed_file_decode(tmp_path, trace):
    """decode_file_distributed: per-device file slicing + global jax.Array
    assembly, same shard_map program (single process, 8 virtual devices)."""
    from gen2_rfid_tpu.io.tracefile import write_trace
    from gen2_rfid_tpu.shard.distributed import (
        decode_file_distributed,
        init_distributed,
    )

    init_distributed()  # no-op single process
    path = str(tmp_path / "cap.bin")
    write_trace(path, trace.iq)
    stats, dec = decode_file_distributed(path, CFG)
    stats1, _ = decode_capture(jnp.asarray(trace.iq), CFG)
    # The distributed path truncates the capture to a shard multiple; the
    # trailing tail CW holds no events, so stats must match exactly.
    assert int(stats.n_queries[0]) == int(stats1.n_queries)
    assert int(stats.n_epc_correct[0]) == int(stats1.n_epc_correct)
    np.testing.assert_array_equal(
        np.asarray(stats.tag_reads[0]), np.asarray(stats1.tag_reads)
    )


def test_many_channel_mesh(trace):
    """4 channels x 2 time shards: per-channel independent inventories."""
    mesh = make_mesh(n_time=2, n_chan=4)
    iq = _pad_to(trace.iq, 2 * CFG.decim)
    four = jnp.stack([jnp.asarray(iq)] * 4)
    stats, _ = decode_capture_sharded(four, CFG, mesh)
    for c in range(4):
        assert int(stats.n_epc_correct[c]) == trace.expected_epc_pass


def test_sixteen_channels_on_eight_devices(trace):
    """BASELINE config '4-16 channel parallel demod': 16 channels fold onto
    an 8-chan device mesh (2 per device), each decoding independently -
    and distinct per-channel content stays separated."""
    import dataclasses

    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    mesh = make_mesh(n_time=1, n_chan=8)
    other = synthesize_inventory(
        CFG, [Tag.with_id(9, seed=4)], n_rounds=3, seed=8)
    n = max(trace.iq.size, other.iq.size)
    n += (-n) % CFG.decim
    a = np.zeros(n, np.complex64); a[: trace.iq.size] = trace.iq
    b = np.zeros(n, np.complex64); b[: other.iq.size] = other.iq
    chans = jnp.asarray(np.stack([a, b] * 8))        # 16 channels, alternating
    stats, _ = decode_capture_sharded(chans, CFG, mesh)
    for c in range(16):
        exp = trace if c % 2 == 0 else other
        (tid, reads), = exp.expected_tag_reads.items()
        assert int(stats.n_epc_correct[c]) == exp.expected_epc_pass, c
        assert int(np.asarray(stats.tag_reads)[c, tid]) == reads


def test_decode_events_multi_bitexact_vs_vmap(trace):
    """The channel-flattened specialized decode (decode_events_multi - the
    round-5 wideband perf fix) must be bit-identical to the per-channel
    vmap of decode_events(specialize=True) it replaces, including pad
    slots, on channels with *different* content and event counts."""
    from gen2_rfid_tpu.dsp.filters import matched_filter_decimate
    from gen2_rfid_tpu.dsp.gate import gate_detect
    from gen2_rfid_tpu.runtime.inventory import (decode_events,
                                                 decode_events_multi,
                                                 matched_taps)
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    other = synthesize_inventory(
        CFG, [Tag.with_id(9, seed=4)], n_rounds=3, seed=8)
    n = max(trace.iq.size, other.iq.size)
    a = np.zeros(n, np.complex64); a[: trace.iq.size] = trace.iq
    b = np.zeros(n, np.complex64); b[: other.iq.size] = other.iq
    c = np.zeros(n, np.complex64)                    # empty channel
    taps = jnp.asarray(matched_taps(CFG))
    ys = jnp.stack([
        matched_filter_decimate(jnp.asarray(x), taps, CFG.decim)
        for x in (a, b, c)])
    cfg = ReaderConfig(max_events=64)
    events_c = jax.vmap(lambda y: gate_detect(y, cfg))(ys)
    got = jax.jit(lambda y, ev: decode_events_multi(y, ev, cfg))(ys, events_c)
    want = jax.jit(jax.vmap(lambda y, ev: decode_events(
        y, ev, cfg, specialize=True, overflow_fallback=False)))(ys, events_c)
    for name in got._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            err_msg=name)


GEOMETRIES = {
    # VERDICT round-4 weak item 2: halo_sizes derives from config-dependent
    # command-span/window arithmetic but was only ever validated at the
    # default FM0 geometry.  Each entry stresses a different term: Miller
    # (decim 1, much larger EPC windows), BLF 640 kHz (decim 2, short
    # windows / long commands relative), short-Tari for_link (command span
    # shrinks; halos must not under-cover the T1+window terms).
    "miller4": lambda: ReaderConfig(miller_m=4, decim=1, max_events=64),
    "blf640": lambda: ReaderConfig(blf_hz=640e3, adc_rate=8e6, decim=2,
                                   max_events=64),
    "tari625": lambda: ReaderConfig.for_link(640e3, tari_us=6.25, dr=1,
                                             adc_rate=8e6, decim=1,
                                             max_events=64),
    "miller8_blf320": lambda: ReaderConfig.for_link(320e3, tari_us=12.5,
                                                    dr=1, miller_m=8,
                                                    adc_rate=8e6,
                                                    decim=1, max_events=64),
}


@pytest.mark.parametrize("name", sorted(GEOMETRIES))
@pytest.mark.parametrize("n_time", [2, 8])
def test_shard_invariance_link_geometries(name, n_time):
    """Sharded == single-device decode at non-default link geometries
    (events, stats, and tag reads identical at every shard count)."""
    cfg = GEOMETRIES[name]()
    tr = synthesize_inventory(cfg, [Tag.with_id(42, seed=4)], n_rounds=4,
                              seed=21)
    iq = _pad_to(tr.iq, n_time * cfg.decim)
    mesh = make_mesh(n_time=n_time, n_chan=1)
    stats_s, dec = decode_capture_sharded(jnp.asarray(iq[None, :]), cfg, mesh)
    stats_1, dec_1 = decode_capture(jnp.asarray(iq), cfg)
    assert int(stats_s.n_epc_correct[0]) == tr.expected_epc_pass, name
    assert int(stats_s.n_queries[0]) == int(stats_1.n_queries)
    assert int(stats_s.cur_inventory_round[0]) == int(
        stats_1.cur_inventory_round)
    np.testing.assert_array_equal(
        np.asarray(stats_s.tag_reads[0]), np.asarray(stats_1.tag_reads))
    # Event-level invariance: same owned trigger indices as unsharded.
    idx_s = np.sort(np.asarray(dec.index[0])[np.asarray(dec.valid[0])])
    idx_1 = np.sort(np.asarray(dec_1.index)[np.asarray(dec_1.valid)])
    np.testing.assert_array_equal(idx_s, idx_1)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sharded_invariance(seed):
    """Fuzz dimension (round-4 VERDICT): random in-spec link scenario
    (test_fuzz._scenario: Tari/BLF/DR/M/TRext/Q/EPC-length/impairment
    draws) x random mesh shape - sharded decode must equal single-device
    exactly (stats, tag reads, owned trigger indices)."""
    from tests.test_fuzz import _scenario

    cfg, tags, rng = _scenario(100 + seed)
    n_time = int(rng.choice([2, 4, 8]))
    tr = synthesize_inventory(cfg, tags, n_rounds=3,
                              seed=int(rng.integers(1 << 16)))
    iq = _pad_to(tr.iq, n_time * cfg.decim)
    mesh = make_mesh(n_time=n_time, n_chan=1)
    stats_s, dec = decode_capture_sharded(jnp.asarray(iq[None, :]), cfg, mesh)
    stats_1, dec_1 = decode_capture(jnp.asarray(iq), cfg)
    assert int(stats_s.n_queries[0]) == int(stats_1.n_queries)
    assert int(stats_s.n_epc_correct[0]) == int(stats_1.n_epc_correct)
    np.testing.assert_array_equal(
        np.asarray(stats_s.tag_reads[0]), np.asarray(stats_1.tag_reads))
    idx_s = np.sort(np.asarray(dec.index[0])[np.asarray(dec.valid[0])])
    idx_1 = np.sort(np.asarray(dec_1.index)[np.asarray(dec_1.valid)])
    np.testing.assert_array_equal(idx_s, idx_1)


def test_replay_batch_matches_vmap(trace):
    """replay_inventory_batch (cond hoisted above the channel vmap) must be
    bit-identical to vmap(replay_inventory) for well-formed tables AND for
    a batch containing a malformed channel (unsorted indices force the
    sequential-scan fallback)."""
    from gen2_rfid_tpu.runtime.inventory import (replay_inventory,
                                                 replay_inventory_batch)

    cfg = ReaderConfig(max_events=64)
    _, dec = decode_capture(jnp.asarray(trace.iq), cfg)
    good = jax.tree.map(lambda a: jnp.stack([a, a]), dec)
    # Malformed channel: reverse the event order (breaks the sorted/gap
    # preconditions) in channel 1.
    rev = jax.tree.map(lambda a: a[::-1], dec)
    mixed = jax.tree.map(lambda a, b: jnp.stack([a, b]), dec, rev)
    for batch in (good, mixed):
        got = jax.jit(lambda d: replay_inventory_batch(d, cfg))(batch)
        want = jax.jit(jax.vmap(lambda d: replay_inventory(d, cfg)))(batch)
        for name in got._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(want, name)), err_msg=name)
