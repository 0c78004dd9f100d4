"""Gen2 v2 cryptographic tag authentication (Challenge / Authenticate /
ReadBuffer + ISO 29167-10 AES-128 TAM1).

New capability a protocol generation past the reference (whose command set
stops at inventory, reader_impl.cc:200-380): the reader proves a tag holds
a secret AES-128 key via challenge-response, either per-tag (Authenticate,
immediate reply) or population-wide (broadcast Challenge precompute +
post-singulation ReadBuffer) - all waveform-level through the live loop,
every reply decoded from backscatter and CRC-16-verified before the
crypto check.
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


def _tag(tag_id=0x2B, **kw):
    return Tag.with_id(tag_id, seed=kw.pop("seed", 7), **kw)


# ---- AES-128 primitive (FIPS-197 known-answer vectors) ---------------------

def test_aes128_fips197_vectors():
    # Appendix C.1
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = crypto.aes128_encrypt_block(KEY, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert crypto.aes128_decrypt_block(KEY, ct) == pt
    # Appendix B
    pt2 = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    assert crypto.aes128_encrypt_block(KEY2, pt2).hex() == (
        "3925841d02dc09fbdc118597196a0b32")


def test_aes128_roundtrip_random():
    rng = np.random.default_rng(5)
    for _ in range(8):
        key = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
        pt = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
        assert crypto.aes128_decrypt_block(
            key, crypto.aes128_encrypt_block(key, pt)) == pt


# ---- TAM1 crypto suite ------------------------------------------------------

def test_tam1_response_verifies_and_rejects_wrong_key():
    rng = np.random.default_rng(11)
    chal = rng.integers(0, 2, 96)
    trnd = rng.integers(0, 2, 32)
    resp = crypto.tam1_response(KEY, chal, trnd)
    ok, t = crypto.tam1_verify(KEY, chal, resp)
    assert ok
    np.testing.assert_array_equal(t, trnd)
    assert not crypto.tam1_verify(KEY2, chal, resp)[0]
    # A replayed response fails a fresh challenge.
    assert not crypto.tam1_verify(KEY, rng.integers(0, 2, 96), resp)[0]


def test_tam1_message_roundtrip():
    chal = np.random.default_rng(3).integers(0, 2, 96)
    msg = crypto.tam1_message(0x42, chal)
    key_id, c = crypto.parse_tam1_message(msg)
    assert key_id == 0x42
    np.testing.assert_array_equal(c, chal)
    assert crypto.parse_tam1_message(msg[:-1]) is None


# ---- command bit synthesis --------------------------------------------------

def test_v2_command_bit_synthesis():
    rng = np.random.default_rng(9)
    h = rng.integers(0, 2, 16)
    msg = crypto.tam1_message(3, rng.integers(0, 2, 96))

    cb = gen2.challenge_bits(msg)
    immed, csi, m, ok = gen2.parse_challenge(cb)
    assert ok and immed == 0 and csi == crypto.CSI_AES128
    np.testing.assert_array_equal(m, msg)
    bad = cb.copy()
    bad[20] ^= 1
    assert not gen2.parse_challenge(bad)[3]

    ab = gen2.authenticate_bits(h, msg)
    senrep, csi, m, hh, ok = gen2.parse_authenticate(ab)
    assert ok and senrep == 1 and csi == crypto.CSI_AES128
    np.testing.assert_array_equal(m, msg)
    np.testing.assert_array_equal(hh, h)

    rb = gen2.readbuffer_bits(h, bitptr=16, bitcount=64)
    ptr, cnt, hh, ok = gen2.parse_readbuffer(rb)
    assert ok and ptr == 16 and cnt == 64
    np.testing.assert_array_equal(hh, h)


# ---- closed-loop authentication over the air --------------------------------

def test_live_authenticate_tam1():
    """Each correct EPC is followed by Req_RN + Authenticate; the 128-bit
    response decodes from backscatter and decrypt-verifies."""
    tag = _tag(aes_keys={1: KEY})
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, authenticate=(1, KEY)).run_inventory(ch, 2)
    assert st.n_epc_correct == 2
    assert st.n_auth_ok == 2 and st.n_auth_fail == 0


def test_live_authenticate_wrong_key_fails_crypto():
    """The tag answers (it holds key_id 1) but the reader's key differs:
    the reply decodes fine and the crypto check rejects it."""
    tag = _tag(aes_keys={1: KEY})
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, authenticate=(1, KEY2)).run_inventory(ch, 2)
    assert st.n_auth_ok == 0 and st.n_auth_fail == 2


def test_live_authenticate_keyless_tag_silent():
    """A tag without the crypto suite never replies to Authenticate."""
    tag = _tag()                                  # no aes_keys
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, authenticate=(1, KEY)).run_inventory(ch, 2)
    assert st.n_epc_correct == 2                  # inventory unaffected
    assert st.n_auth_ok == 0 and st.n_auth_fail == 0


def test_live_challenge_precompute_readbuffer():
    """Broadcast Challenge before inventory; each singulated tag's stored
    response is fetched via ReadBuffer and verified against the challenge."""
    tags = [_tag(0x2B, aes_keys={5: KEY}, seed=3)]
    ch = SimTagChannel(CFG, tags, seed=4)
    st = LiveReader(CFG, challenge_auth=(5, KEY)).run_inventory(ch, 2)
    assert st.n_epc_correct == 2
    assert st.n_buffer_auth_ok == 2 and st.n_auth_fail == 0


def test_live_challenge_power_down_invalidates_buffer():
    """Power loss wipes the ResponseBuffer (Gen2 v2 6.3.2.12.3.10); the
    reader re-challenges after every power-down, so verification still
    succeeds across the power cycle."""
    tag = _tag(aes_keys={5: KEY})
    ch = SimTagChannel(CFG, [tag], seed=4)
    st = LiveReader(CFG, challenge_auth=(5, KEY),
                    power_down_every=1).run_inventory(ch, 3)
    assert st.n_epc_correct == 3
    assert st.n_buffer_auth_ok == 3 and st.n_auth_fail == 0


def test_tam2_roundtrip_and_rejection():
    rng = np.random.default_rng(21)
    chal = rng.integers(0, 2, 96)
    data = rng.integers(0, 2, 256)                # 2 blocks
    r1 = crypto.tam2_response(KEY, chal, rng.integers(0, 2, 32), data)
    r2 = crypto.tam2_response(KEY, chal, rng.integers(0, 2, 32), data)
    ok, d = crypto.tam2_verify(KEY, chal, r1)
    assert ok
    np.testing.assert_array_equal(d, data)
    # Tag-random IV: same words, different ciphertext every read.
    assert not np.array_equal(r1[128:], r2[128:])
    ok2, d2 = crypto.tam2_verify(KEY, chal, r2)
    assert ok2
    np.testing.assert_array_equal(d2, data)
    # Wrong key: auth block fails, no data recovered.
    ok3, d3 = crypto.tam2_verify(KEY2, chal, r1)
    assert not ok3 and d3.size == 0

    msg = crypto.tam2_message(9, chal, gen2.MEMBANK_USER, 4, 2)
    kid, c, mb, ptr, nb = crypto.parse_tam2_message(msg)
    assert kid == 9 and mb == gen2.MEMBANK_USER and ptr == 4 and nb == 2
    np.testing.assert_array_equal(c, chal)
    # TAM1 and TAM2 messages are disjoint (AuthMethod field).
    assert crypto.parse_tam1_message(msg) is None
    assert crypto.parse_tam2_message(crypto.tam1_message(9, chal)) is None


def test_live_tam2_confidential_read():
    """One Authenticate proves the key AND returns USER-bank words
    CBC-encrypted; the decrypted words match tag memory exactly."""
    rng = np.random.default_rng(31)
    tag = _tag(aes_keys={1: KEY})
    tag.user_bank[:] = rng.integers(0, 2, tag.user_bank.size)
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, authenticate_read=(1, KEY, 0, 1, "user")
                    ).run_inventory(ch, 2)
    assert st.n_tam2_ok == 2 and st.n_auth_fail == 0
    np.testing.assert_array_equal(st.secure_read_words[0x2B],
                                  tag.user_bank[:128])


def test_live_tam2_refuses_hidden_memory():
    """Untraceable-hidden USER memory stays hidden even from a keyed
    TAM2 read (the privacy state outranks the crypto read)."""
    tag = _tag(aes_keys={1: KEY}, hide_user=True)
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, authenticate_read=(1, KEY, 0, 1, "user")
                    ).run_inventory(ch, 2)
    assert st.n_tam2_ok == 0 and not st.secure_read_words


def test_keyupdate_bit_synthesis():
    rng = np.random.default_rng(12)
    h = rng.integers(0, 2, 16)
    enc = rng.integers(0, 2, 128)
    kb = gen2.keyupdate_bits(h, 7, enc)
    csi, kid, e, hh, ok = gen2.parse_keyupdate(kb)
    assert ok and csi == crypto.CSI_AES128 and kid == 7
    np.testing.assert_array_equal(e, enc)
    np.testing.assert_array_equal(hh, h)


def test_live_keyupdate_provisions_new_key():
    """Pass A installs KEY2 over the air (encrypted under KEY); pass B
    authenticates under KEY2; the retired KEY then fails crypto."""
    tag = _tag(aes_keys={1: KEY})
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, key_update=(1, KEY, KEY2)).run_inventory(ch, 1)
    assert st.n_keyupdate_ok == 1
    assert bytes(tag.aes_keys[1]) == KEY2

    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, authenticate=(1, KEY2)).run_inventory(ch, 1)
    assert st.n_auth_ok == 1 and st.n_auth_fail == 0
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, authenticate=(1, KEY)).run_inventory(ch, 1)
    assert st.n_auth_ok == 0 and st.n_auth_fail == 1


def test_live_keyupdate_needs_secured():
    """A nonzero access password without the Access sequence leaves the
    tag Open: KeyUpdate is refused and the key is unchanged."""
    tag = _tag(aes_keys={1: KEY}, access_pwd=0x13572468)
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, key_update=(1, KEY, KEY2)).run_inventory(ch, 1)
    assert st.n_keyupdate_ok == 0 and bytes(tag.aes_keys[1]) == KEY
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, access_pwd=0x13572468,
                    key_update=(1, KEY, KEY2)).run_inventory(ch, 1)
    assert st.n_keyupdate_ok == 1 and bytes(tag.aes_keys[1]) == KEY2


def test_cli_live_auth(capsys):
    from gen2_rfid_tpu.apps.reader import main as cli_main

    assert cli_main(["live", "--rounds", "2", "--tags", "27",
                     "--auth", "1:" + KEY.hex()]) == 0
    out = capsys.readouterr().out
    assert "2 TAM1 OK" in out and "0 crypto failures" in out


def test_live_auth_composes_with_access_and_read():
    """Authentication composes with the rest of the access sequence
    (Access -> Secured, Read) on the same handle."""
    tag = _tag(access_pwd=0x12345678, aes_keys={1: KEY})
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_pwd=0x12345678, authenticate=(1, KEY),
                    access_read=(2, 2, "epc")).run_inventory(ch, 1)
    assert st.n_access_ok == 1 and st.n_auth_ok == 1 and st.n_read_ok == 1
