"""Access/security invariant fuzz: reported outcomes match tag physics.

Random per-seed access scenarios (random passwords, locks, keys, read/
write targets) run through the full waveform loop; rather than mirroring
the channel model (a tautology), the assertions are *consistency
invariants* between what the reader reports and what physically happened
to the tag:

* a reported Write/BlockWrite success means the memory actually changed
  to the written value ("no false success");
* a reported error / silence means the memory did NOT change;
* a reported Read success returns the tag's actual stored bits;
* a reported TAM1 success implies the reader's key equals the tag's,
  and a crypto failure implies it does not.
"""

import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import gen2
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag

CFG = ReaderConfig()
KEY_A = bytes(range(16))
KEY_B = bytes(range(16, 32))


def _scenario(seed):
    rng = np.random.default_rng(2000 + seed)
    tag = Tag.with_id(int(rng.integers(1, 255)), seed=int(rng.integers(1 << 16)),
                      access_pwd=(0 if rng.random() < 0.5
                                  else int(rng.integers(1, 1 << 32))),
                      aes_keys=({1: KEY_A} if rng.random() < 0.7 else None))
    if rng.random() < 0.5:
        tag.apply_lock(gen2.lock_payload(user=(1, 0)))   # write-lock USER
    wordptr = int(rng.integers(0, 10))
    word = rng.integers(0, 2, 16)
    rd_ptr = int(rng.integers(0, 10))
    rd_cnt = int(rng.integers(1, 4))
    reader_key = KEY_A if rng.random() < 0.7 else KEY_B
    use_pwd = rng.random() < 0.5 and tag.access_pwd != 0
    return tag, dict(
        access_write=(wordptr, word, "user"),
        access_read=(rd_ptr, rd_cnt, "user"),
        access_pwd=tag.access_pwd if use_pwd else None,
        authenticate=(1, reader_key),
    ), rng


@pytest.mark.parametrize("seed", range(6))
def test_access_outcomes_match_tag_state(seed):
    tag, opts, rng = _scenario(seed)
    before = tag.user_bank.copy()
    wordptr, word, _ = opts["access_write"]
    rd_ptr, rd_cnt, _ = opts["access_read"]
    reader_key = opts["authenticate"][1]
    n_rounds = 2

    ch = SimTagChannel(CFG, [tag], seed=int(rng.integers(1 << 16)))
    st = LiveReader(CFG, **opts).run_inventory(ch, n_rounds)
    assert st.n_epc_correct == n_rounds           # inventory never breaks
    tid = int(np.nonzero(np.asarray(st.tag_reads))[0][0])

    # Write: success reports and physical state must agree exactly.
    if st.n_write_ok:
        np.testing.assert_array_equal(
            tag.user_bank[16 * wordptr: 16 * wordptr + 16], word)
    else:
        np.testing.assert_array_equal(tag.user_bank, before)
        # The failure must be *explained*: either an error reply was
        # decoded or the tag was silent by spec (never a lost success).
        locked = bool(tag.lock_state[2 * gen2.LOCK_FIELDS.index("user")])
        secured = tag.access_pwd == 0 or opts["access_pwd"] is not None
        assert locked and not secured
        assert st.error_counts.get("memory locked", 0) >= 1

    # Read: returned words are the tag's actual memory (post-write).
    if st.n_read_ok:
        got = st.read_words[tid]
        np.testing.assert_array_equal(
            got, tag.user_bank[16 * rd_ptr: 16 * rd_ptr + 16 * rd_cnt])

    # Authentication: crypto verdicts imply key equality/difference.
    if st.n_auth_ok:
        assert tag.aes_keys and bytes(tag.aes_keys[1]) == reader_key
        assert st.n_auth_fail == 0
    if st.n_auth_fail:
        assert tag.aes_keys and bytes(tag.aes_keys[1]) != reader_key
    if tag.aes_keys is None:
        assert st.n_auth_ok == 0 and st.n_auth_fail == 0
