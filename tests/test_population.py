"""Large-population closed-loop inventory: the full protocol stack at once.

24 tags with geometrically-spread backscatter amplitudes, inventoried by a
single LiveReader running everything the framework adds over the reference
simultaneously: backlog-estimating adaptive Q (Schoute occupancy + SIC
multiplicity), RN16/EPC-window SIC collision recovery, and A/B session
inventory with target flips.  The invariant is strong: across 40
round-starting commands the reader completes exactly 4 passes (3 target
flips) and reads EVERY tag EXACTLY once per pass - no tag starved, no tag
double-counted, through hundreds of slots whose every reply is decoded
from waveforms.
"""

import numpy as np

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag


def test_24_tag_session_inventory_reads_each_tag_once_per_pass():
    cfg = ReaderConfig()
    ids = list(range(0x10, 0x10 + 24))
    tags = [
        Tag.with_id(t, seed=i, backscatter=0.08 * 0.93**i * np.exp(1.3j * i))
        for i, t in enumerate(ids)
    ]
    ch = SimTagChannel(cfg, tags, seed=3, session_ab=True)
    rd = LiveReader(cfg, adaptive=True, q_mode="backlog", q_init=0,
                    sic=True, target_ab=True)
    st = rd.run_inventory(ch, 40)

    reads = {t: int(st.tag_reads[t]) for t in ids}
    assert st.n_target_flips == 3                      # 4 complete passes
    assert all(v == 4 for v in reads.values()), reads  # 1 read/tag/pass
    assert st.n_epc_correct == 4 * 24
    # The backlog controller must actually engage (Q grows past 0 to
    # resolve 24 tags, then collapses as the pass drains).
    assert max(st.q_trace) >= 4
