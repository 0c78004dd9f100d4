"""Gen2 v2 AuthComm / SecureComm encapsulation (6.3.2.12.3.14-15).

New capability two protocol generations past the reference: after a TAM1
exchange establishes a session secret on both sides, access commands ride
a cryptographic envelope — AuthComm authenticates the command (cleartext
+ truncated CBC-MAC, so a keyless rogue reader cannot forge a Write),
SecureComm encrypts the command and the secret half of the reply (CTR
keystream; confidential read/write — unlike plain Read, or Write's
RN16 cover-coding, the data never travels in clear).  All waveform-level
through the live loop.
"""

import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import crypto, gen2
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag

CFG = ReaderConfig()
KEY = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
KEY2 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")


def _tag(**kw):
    user = np.zeros(128, np.int64)
    user[:32] = crypto.bytes_to_bits(bytes.fromhex("deadbeef"))
    return Tag.with_id(0x2B, seed=7, aes_keys={1: KEY}, user_bank=user,
                       **kw)


# ---- session crypto unit properties ----------------------------------------

def test_session_keystream_and_mac_properties():
    rng = np.random.default_rng(3)
    chal = rng.integers(0, 2, 96)
    trnd = rng.integers(0, 2, 32)
    # Deterministic, direction- and counter-separated.
    a = crypto.session_keystream(KEY, chal, trnd, 0, 256, direction=0)
    assert np.array_equal(
        a, crypto.session_keystream(KEY, chal, trnd, 0, 256, direction=0))
    b = crypto.session_keystream(KEY, chal, trnd, 0, 256, direction=1)
    c = crypto.session_keystream(KEY, chal, trnd, 1, 256, direction=0)
    assert not np.array_equal(a, b) and not np.array_equal(a, c)
    # No keystream block equals the TAM1 response (the n=0 block).
    tam1 = crypto.tam1_response(KEY, chal, trnd)
    assert not np.array_equal(a[:128], tam1)
    assert not np.array_equal(c[:128], tam1)
    # MAC is sensitive to every message bit and to the session key.
    msg = rng.integers(0, 2, 66)
    mac = crypto.session_mac(KEY, chal, trnd, msg)
    for k in (0, 33, 65):
        m2 = msg.copy()
        m2[k] ^= 1
        assert not np.array_equal(mac, crypto.session_mac(
            KEY, chal, trnd, m2))
    assert not np.array_equal(mac, crypto.session_mac(KEY2, chal, trnd, msg))


# ---- SecureComm: confidential read -----------------------------------------

def test_secure_read_returns_words_never_in_clear():
    tag = _tag()
    ch = SimTagChannel(CFG, [tag], seed=1)
    sent = []
    orig = ch.exchange

    def spy(kind, bits, *a, **kw):
        sent.append((kind, np.asarray(bits).copy()))
        return orig(kind, bits, *a, **kw)

    ch.exchange = spy
    st = LiveReader(CFG, secure_read=(1, KEY, 0, 2)).run_inventory(ch, 2)
    assert st.n_epc_correct == 2
    assert st.n_secure_read_ok == 2
    np.testing.assert_array_equal(
        st.secure_read_words[0x2B],
        crypto.bytes_to_bits(bytes.fromhex("deadbeef")))
    # The encapsulated Read command never appears in clear on the air.
    sc = [b for k, b in sent if k == "secure_comm"]
    assert len(sc) == 2
    for b in sc:
        enc, _, crc_ok = gen2.parse_secure_comm(b)
        assert crc_ok and enc.size == 58
        assert tuple(enc[:8]) != gen2.READ_CODE   # opcode is masked too


def test_secure_read_wrong_key_is_silence():
    ch = SimTagChannel(CFG, [_tag()], seed=1)
    st = LiveReader(CFG, secure_read=(1, KEY2, 0, 2)).run_inventory(ch, 2)
    # TAM1 fails the crypto check -> no session, no SecureComm result.
    assert st.n_secure_read_ok == 0 and st.n_auth_fail == 2
    assert 0x2B not in st.secure_read_words


def test_secure_write_then_secure_read_roundtrip():
    tag = _tag()
    data = crypto.bytes_to_bits(bytes.fromhex("beef"))
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, secure_write=(1, KEY, 3, data),
                    secure_read=(1, KEY, 3, 1)).run_inventory(ch, 2)
    assert st.n_secure_write_ok == 2
    assert st.n_secure_read_ok == 2
    np.testing.assert_array_equal(st.secure_read_words[0x2B], data)
    np.testing.assert_array_equal(tag.user_bank[48:64], data)


def test_secure_read_respects_lock_state():
    """The envelope does not bypass memory protection: a pwd-locked kill
    password read via SecureComm outside the Secured state fails like a
    plain Read would (Annex-I error through the session)."""
    tag = _tag(access_pwd=0x1234_5678, kill_pwd=0xA0A0_B0B0)
    tag.lock_state[0] = 1          # kill-password pwd-read/write lock
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, secure_read=(1, KEY, 0, 2, "reserved")
                    ).run_inventory(ch, 2)
    assert st.n_secure_read_ok == 0
    assert st.error_counts.get("memory locked", 0) == 2


# ---- AuthComm: command integrity --------------------------------------------

def test_auth_comm_write_executes():
    tag = _tag()
    data = crypto.bytes_to_bits(bytes.fromhex("cafe"))
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, auth_comm_write=(1, KEY, 5, data)).run_inventory(
        ch, 2)
    assert st.n_auth_comm_ok == 2
    np.testing.assert_array_equal(tag.user_bank[80:96], data)


def test_auth_comm_forged_mac_is_silence(monkeypatch):
    """A MAC not computed under the session key silences the tag and the
    write never lands (command-forgery resistance)."""
    tag = _tag()
    data = crypto.bytes_to_bits(bytes.fromhex("cafe"))
    before = tag.user_bank.copy()
    rng = np.random.default_rng(9)
    monkeypatch.setattr(crypto, "session_mac",
                        lambda *a, **k: rng.integers(0, 2, 32))
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, auth_comm_write=(1, KEY, 5, data)).run_inventory(
        ch, 2)
    assert st.n_auth_comm_ok == 0
    np.testing.assert_array_equal(tag.user_bank, before)
