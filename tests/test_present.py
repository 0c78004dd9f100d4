"""ISO 29167-11 PRESENT-80 crypto suite (protocol/crypto.py).

Second TAM1 suite next to AES-128 (ISO 29167-10): the ultralightweight
cipher tags with tiny gate budgets run.  The suite rides the existing
Gen2 v2 command plumbing — the Authenticate/Challenge CSI field selects
it, the key length selects it on the reader/tag APIs, and the message's
challenge width (48 vs 96 bits) discriminates it on the air.
"""

import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import crypto
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag

KEY10 = bytes(range(1, 11))


@pytest.mark.parametrize("key,plain,want", [
    (b"\x00" * 10, b"\x00" * 8, "5579c1387b228445"),
    (b"\xff" * 10, b"\x00" * 8, "e72c46c0f5945049"),
    (b"\x00" * 10, b"\xff" * 8, "a112ffc72f68417b"),
    (b"\xff" * 10, b"\xff" * 8, "3333dcd3213210d2"),
])
def test_present80_known_answers(key, plain, want):
    """The CHES 2007 paper's appendix vectors."""
    c = crypto.present80_encrypt_block(key, plain)
    assert c.hex() == want
    assert crypto.present80_decrypt_block(key, c) == plain


def test_present80_roundtrip_random():
    rng = np.random.default_rng(5)
    for _ in range(16):
        key = bytes(rng.integers(0, 256, 10, dtype=np.uint8))
        p = bytes(rng.integers(0, 256, 8, dtype=np.uint8))
        assert crypto.present80_decrypt_block(
            key, crypto.present80_encrypt_block(key, p)) == p


def test_tam1_suite_dispatch():
    """tam1_message/response/verify follow the key length; the 48-bit
    challenge width discriminates PRESENT on the air."""
    chal = np.arange(48) % 2
    msg = crypto.tam1_message(7, chal)
    assert msg.size == 64
    kid, parsed = crypto.parse_tam1_message(msg)
    assert kid == 7 and np.array_equal(parsed, chal)
    trnd = (np.arange(16) // 3) % 2
    resp = crypto.tam1_response(KEY10, chal, trnd)
    assert resp.size == crypto.PRESENT_TAM1_RESPONSE_BITS
    ok, t = crypto.tam1_verify(KEY10, chal, resp)
    assert ok and np.array_equal(t, trnd)
    ok_wrong, _ = crypto.tam1_verify(bytes(10), chal, resp)
    assert not ok_wrong


def test_tag_silent_on_suite_mismatch():
    """A tag holding an AES key must not answer a PRESENT-CSI challenge
    (and vice versa), nor a challenge of the wrong width."""
    aes_tag = Tag.with_id(1, seed=1, aes_keys={1: bytes(16)})
    pres_tag = Tag.with_id(2, seed=2, aes_keys={1: KEY10})
    c48 = np.zeros(48, np.int64)
    c96 = np.zeros(96, np.int64)
    assert aes_tag.tam1_answer(crypto.CSI_PRESENT80, 1, c48) is None
    assert pres_tag.tam1_answer(crypto.CSI_AES128, 1, c96) is None
    assert pres_tag.tam1_answer(crypto.CSI_PRESENT80, 1, c96) is None
    assert pres_tag.tam1_answer(crypto.CSI_PRESENT80, 1, c48) is not None


def test_present_authenticate_live():
    """Closed loop: per-tag TAM1 under PRESENT-80 verifies every round;
    a reader with the wrong key sees crypto failures, a keyless tag
    stays silent."""
    cfg = ReaderConfig()
    tags = [Tag.with_id(27, seed=7, aes_keys={3: KEY10})]
    st = LiveReader(cfg, authenticate=(3, KEY10)).run_inventory(
        SimTagChannel(cfg, tags, seed=1), 3)
    assert st.n_epc_correct == 3 and st.n_auth_ok == 3
    assert st.n_auth_fail == 0

    tags = [Tag.with_id(27, seed=7, aes_keys={3: KEY10})]
    st = LiveReader(cfg, authenticate=(3, bytes(10))).run_inventory(
        SimTagChannel(cfg, tags, seed=1), 3)
    assert st.n_auth_ok == 0 and st.n_auth_fail == 3

    tags = [Tag.with_id(27, seed=7)]   # keyless: silence, not failure
    st = LiveReader(cfg, authenticate=(3, KEY10)).run_inventory(
        SimTagChannel(cfg, tags, seed=1), 3)
    assert st.n_auth_ok == 0 and st.n_auth_fail == 0


def test_present_broadcast_challenge_live():
    """Broadcast Challenge + post-singulation ReadBuffer under
    PRESENT-80: the precomputed 64-bit response verifies."""
    cfg = ReaderConfig()
    tags = [Tag.with_id(27, seed=7, aes_keys={3: KEY10})]
    st = LiveReader(cfg, challenge_auth=(3, KEY10)).run_inventory(
        SimTagChannel(cfg, tags, seed=1), 3)
    assert st.n_buffer_auth_ok == 3 and st.n_auth_fail == 0
