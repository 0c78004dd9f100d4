"""Cross-feature live-loop fuzz: random LiveReader feature combinations.

The round-3 verdict's gap: every live feature is individually tested, but
interactions (SIC + session targets + adaptive Q + link ladder + LBT +
Select + security ops drawn *together*) were not.  Each seed draws a
random in-spec combination and runs the full waveform loop against the
channel oracle; assertions are physics/consistency invariants, not a
mirror of the channel model:

* conservation: sum(tag_reads) == n_epc_correct; every reported id is a
  real tag id (no ghost reads), restricted to the Select-matching
  population when a Select rides the session;
* bounds: no tag is read more often than round-starting commands (or
  passes + 1 under A/B session inventory);
* reported access/security successes match physical tag state (memory
  contents, untraceable state, key equality), reusing
  test_fuzz_access.py's no-false-success discipline;
* feature-specific: clean-channel LBT never defers; a busy starting
  channel is escaped and reads still happen.

The plain-fuzz harness (test_fuzz.py) found two real envelope bugs on
its first day; this extends the method across the feature matrix.
"""

import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.live import (
    ETSI_LOWER_MHZ,
    LiveReader,
    default_link_profiles,
)
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag

KEY = bytes(range(16))


def _draw_scenario(seed):
    rng = np.random.default_rng(7000 + seed)
    n_tags = int(rng.integers(1, 4))
    ids = rng.choice(np.arange(1, 250), size=n_tags, replace=False)
    tags = [Tag.with_id(int(t), seed=int(rng.integers(1 << 16)),
                        backscatter=0.08 * np.exp(2j * np.pi * rng.random()),
                        aes_keys={1: KEY})
            for t in ids]

    opts = {}
    ch_kw = {}
    session_ab = bool(rng.random() < 0.3)
    if session_ab:
        opts["target_ab"] = True
        ch_kw["session_ab"] = True
    opts["sic"] = bool(rng.random() < 0.4)
    opts["nak_on_fail"] = bool(rng.random() < 0.3)
    if rng.random() < 0.25:
        opts["power_down_every"] = 2
    adaptive = rng.random() < 0.4
    if adaptive:
        opts["adaptive"] = True
        opts["q_init"] = int(rng.integers(0, 3))
        if rng.random() < 0.5 and opts["sic"]:
            opts["q_mode"] = "backlog"
    else:
        opts["q_init"] = int(rng.integers(0, 3)) if n_tags > 1 else 0

    want_profiles = rng.random() < 0.25
    cfg = ReaderConfig()
    interferer = None
    rf_draw = rng.random()
    if rf_draw < 0.3:
        import dataclasses

        cfg = dataclasses.replace(cfg, freq_hz=866.3e6)
        opts["lbt_mhz"] = list(ETSI_LOWER_MHZ)
        if rng.random() < 0.5:
            interferer = {866.34e6: -10.0}
            ch_kw["interferers"] = interferer
    elif rf_draw < 0.5:
        opts["hop_mhz"] = [902.75, 912.25, 922.25]
    if want_profiles:
        # Built from the final cfg so the starting rung IS cfg.
        profiles = default_link_profiles(cfg)
        cfg = profiles[0]
        opts["link_profiles"] = profiles

    select_tag = None
    if rng.random() < 0.35 and not session_ab:
        select_tag = tags[int(rng.integers(0, n_tags))]
        opts["select_mask"] = (select_tag.epc96[:8].copy(), 0x20)

    if rng.random() < 0.35:
        wordptr = int(rng.integers(0, 6))
        word = rng.integers(0, 2, 16)
        opts["access_write"] = (wordptr, word, "user")
        opts["access_read"] = (wordptr, 1, "user")
    if rng.random() < 0.25:
        opts["secure_read"] = (1, KEY, int(rng.integers(0, 6)), 1, "user")
    if rng.random() < 0.25:
        opts["untraceable"] = dict(
            tid="all" if rng.random() < 0.5 else "none",
            range_="reduced" if rng.random() < 0.5 else "normal")

    n_rounds = int(rng.integers(4, 9))

    # Encoding axis (round 4): draw Miller-M so the live loop exercises
    # the rebuilt segment cascade inside random feature combinations (the
    # link-profile ladder already controls M when it rides, so skip then).
    import dataclasses

    miller = False
    if not want_profiles and rng.random() < 0.35:
        miller = True
        cfg = dataclasses.replace(
            cfg, miller_m=int(rng.choice([2, 4])), decim=1)

    # Tag clock/carrier impairments, scaled to each encoding's pinned
    # tolerance envelope (FM0 default grid +-1%, Miller joint search
    # +-4%; CFO: the *untracked* coherent detector is exact only to a few
    # tens of Hz by design - tests/test_impairments.py pins 30 Hz exact /
    # 400 Hz dead - so large CFO draws ride with track_channel=True, the
    # first fuzz run of this draw proved +-200 Hz untracked dies).
    if rng.random() < 0.4:
        lim = 0.025 if miller else 0.008
        if rng.random() < 0.5 and not want_profiles:
            # cfg must stay one of link_profiles when the ladder rides,
            # so the tracking variant only draws without profiles.
            cfg = dataclasses.replace(cfg, track_channel=True)
            cfo_lim = 250.0
        else:
            cfo_lim = 25.0
        tags = [dataclasses.replace(
            t, blf_offset=float(rng.uniform(-lim, lim)),
            cfo_hz=float(rng.uniform(-cfo_lim, cfo_lim))) for t in tags]

    return cfg, tags, opts, ch_kw, select_tag, interferer, n_rounds, rng


@pytest.mark.parametrize("seed", range(16))
def test_random_feature_combination(seed):
    cfg, tags, opts, ch_kw, select_tag, interferer, n_rounds, rng = (
        _draw_scenario(seed))
    user_before = {int(t.epc96[88:96] @ (1 << np.arange(8)[::-1])):
                   t.user_bank.copy() for t in tags}
    ch = SimTagChannel(cfg, tags, seed=int(rng.integers(1 << 16)), **ch_kw)
    rd = LiveReader(cfg, **opts)
    st = rd.run_inventory(ch, n_rounds)

    tag_ids = {int(t.epc96[88:96] @ (1 << np.arange(8)[::-1])) for t in tags}
    reads = np.asarray(st.tag_reads)
    read_ids = set(np.nonzero(reads)[0].tolist())

    # Conservation: every correct EPC is attributed to exactly one tag id,
    # and every reported id is a real tag (no ghost decodes), further
    # restricted to the Select-matching population when one rides.
    assert int(reads.sum()) == st.n_epc_correct, opts
    allowed = tag_ids
    if select_tag is not None:
        mask = select_tag.epc96[:8]
        allowed = {int(t.epc96[88:96] @ (1 << np.arange(8)[::-1]))
                   for t in tags if np.array_equal(t.epc96[:8], mask)}
    assert read_ids <= allowed, (read_ids, allowed, opts)

    # Bounds: a tag answers at most once per round-starting command; under
    # A/B session inventory at most once per pass - where a power-down
    # also starts a fresh pass (S0 inventoried flags die with reader
    # power per Gen2 table 6.20, so the same target re-reads the tag).
    cap = n_rounds
    if opts.get("target_ab"):
        pde = opts.get("power_down_every", 0)
        n_pd = (n_rounds - 1) // pde + 1 if pde else 0
        cap = 1 + st.n_target_flips + n_pd
    for t in tag_ids:
        assert reads[t] <= cap, (t, int(reads[t]), cap, opts)

    # Baseline liveness: one tag, no gating features -> every round reads.
    simple = (len(tags) == 1 and select_tag is None
              and not opts.get("target_ab") and not opts.get("adaptive")
              and opts.get("q_init", 0) == 0 and interferer is None)
    if simple:
        assert st.n_epc_correct == n_rounds, opts

    # LBT invariants.
    if opts.get("lbt_mhz"):
        if interferer is None:
            assert st.n_lbt_defers == 0, opts
        else:
            assert rd._carrier_hz != 866.3e6   # escaped the busy channel
            if simple or len(tags) == 1:
                assert st.n_epc_correct > 0

    # Access-op physics (no false success).
    if opts.get("access_write") is not None:
        wordptr, word, _ = opts["access_write"]
        for t in tags:
            tid = int(t.epc96[88:96] @ (1 << np.arange(8)[::-1]))
            if st.n_write_ok and reads[tid]:
                # At least the last-written tag holds the word; any tag
                # whose memory changed must hold exactly the written word.
                seg = t.user_bank[16 * wordptr: 16 * wordptr + 16]
                if not np.array_equal(seg,
                                      user_before[tid][16 * wordptr:
                                                       16 * wordptr + 16]):
                    np.testing.assert_array_equal(seg, word)
        if st.n_read_ok:
            for tid, got in st.read_words.items():
                tag = next(t for t in tags
                           if int(t.epc96[88:96]
                                  @ (1 << np.arange(8)[::-1])) == tid)
                np.testing.assert_array_equal(
                    got, tag.user_bank[16 * wordptr: 16 * wordptr + 16])

    # SecureComm reads return the tag's actual memory, decrypted.
    if opts.get("secure_read") is not None and st.n_secure_read_ok:
        ptr = opts["secure_read"][2]
        for tid, got in st.secure_read_words.items():
            tag = next(t for t in tags
                       if int(t.epc96[88:96]
                              @ (1 << np.arange(8)[::-1])) == tid)
            np.testing.assert_array_equal(
                got, tag.user_bank[16 * ptr: 16 * ptr + 16])

    # Untraceable success implies the physical state changed accordingly.
    if opts.get("untraceable") is not None and st.n_untraceable_ok:
        want_tid = opts["untraceable"]["tid"]
        changed = [t for t in tags if t.hide_tid == want_tid]
        assert changed, opts
        if opts["untraceable"]["range_"] == "reduced":
            assert any(t.reduced_range for t in changed)
