"""GS1 EPC Tag Data Standard decode (protocol/tds.py).

New capability: the reference reports only raw bits + an 8-bit tag id
(tag_decoder_impl.cc:348-352); production reader stacks surface GS1 EPC
URIs.  Vectors are cross-checked two ways: (a) the module's own
encode/decode roundtrip, (b) an independent pure-Python bit assembly in
this file, and (c) the canonical TDS example
urn:epc:id:sgtin:0614141.812345.6789 <-> 3074257BF7194E4000001A85.
"""

import numpy as np
import pytest

from gen2_rfid_tpu.protocol import tds


def _bits_from_hex(h: str) -> np.ndarray:
    v = int(h, 16)
    n = len(h) * 4
    return np.asarray([(v >> (n - 1 - i)) & 1 for i in range(n)], np.int64)


def test_sgtin96_canonical_vector():
    """The TDS worked example: GTIN 80614141123458 serial 6789, filter 3
    (CAG pallet), partition 5 (7-digit company prefix)."""
    d = tds.decode_epc(_bits_from_hex("3074257BF7194E4000001A85"))
    assert d["scheme"] == "sgtin-96"
    assert d["uri"] == "urn:epc:id:sgtin:0614141.812345.6789"
    assert d["tag_uri"] == "urn:epc:tag:sgtin-96:3.0614141.812345.6789"
    assert d["filter"] == 3 and d["partition"] == 5


def test_sgtin96_roundtrip_and_independent_assembly():
    bits = tds.encode_sgtin96("0614141", "812345", 6789, filter_value=3)
    # Independent assembly: header 0x30, filter 3, partition 5, CP 24 bits,
    # item ref 20 bits, serial 38 bits.
    v = (0x30 << 88) | (3 << 85) | (5 << 82) | (614141 << 58) \
        | (812345 << 38) | 6789
    ref = np.asarray([(v >> (95 - i)) & 1 for i in range(96)], np.int64)
    np.testing.assert_array_equal(bits, ref)
    d = tds.decode_epc(bits)
    assert d["uri"] == "urn:epc:id:sgtin:0614141.812345.6789"
    assert d["hex"] == "3074257BF7194E4000001A85"


def test_leading_zeros_significant():
    """Partition encodes the company-prefix length: same numeric values,
    different split, different URI."""
    a = tds.decode_epc(tds.encode_sgtin96("0614141", "812345", 1))
    b = tds.decode_epc(tds.encode_sgtin96("06141410", "12345", 1))
    assert a["partition"] == 5 and b["partition"] == 4
    assert a["uri"] != b["uri"]
    assert a["company_prefix"] == "0614141"
    assert b["company_prefix"] == "06141410"


def test_sgtin198_string_serial():
    bits = tds.encode_sgtin198("0614141", "812345", "32a%2Bz7", 3)
    assert bits.size == 208          # 13 on-tag words, zero-padded
    d = tds.decode_epc(bits)
    assert d["scheme"] == "sgtin-198"
    # '%' is TDS-reserved and must be percent-escaped in the URI.
    assert d["uri"] == "urn:epc:id:sgtin:0614141.812345.32a%252Bz7"


def test_sscc96():
    bits = tds.encode_sscc96("0614141", "1234567890", filter_value=2)
    d = tds.decode_epc(bits)
    assert d["scheme"] == "sscc-96"
    assert d["uri"] == "urn:epc:id:sscc:0614141.1234567890"
    assert d["tag_uri"] == "urn:epc:tag:sscc-96:2.0614141.1234567890"
    # Reserved trailing 24 bits nonzero -> not a valid SSCC-96.
    bad = bits.copy()
    bad[-1] = 1
    assert tds.decode_epc(bad)["scheme"] == "unknown"


def test_sgln_grai_giai_gid():
    d = tds.decode_epc(tds.encode_sgln96("0614141", "12345", 400))
    assert d["uri"] == "urn:epc:id:sgln:0614141.12345.400"
    d = tds.decode_epc(tds.encode_grai96("0614141", "12345", 5678))
    assert d["uri"] == "urn:epc:id:grai:0614141.12345.5678"
    d = tds.decode_epc(tds.encode_giai96("0614141", "12345", filter_value=1))
    assert d["uri"] == "urn:epc:id:giai:0614141.12345"
    assert d["tag_uri"] == "urn:epc:tag:giai-96:1.0614141.12345"
    d = tds.decode_epc(tds.encode_gid96(95100000, 12345, 400))
    assert d["uri"] == "urn:epc:id:gid:95100000.12345.400"


def test_unknown_and_malformed_never_raise():
    assert tds.decode_epc(np.zeros(96, np.int64))["scheme"] == "unknown"
    assert tds.decode_epc(np.ones(96, np.int64))["scheme"] == "unknown"
    assert tds.decode_epc(np.zeros(4, np.int64))["scheme"] == "unknown"
    # Valid header, partition 7 (undefined) -> unknown.
    bad = tds.encode_sgtin96("0614141", "812345", 1)
    bad[11:14] = [1, 1, 1]
    assert tds.decode_epc(bad)["scheme"] == "unknown"
    # Truncated frame (header says 96, only 80 bits present).
    assert tds.decode_epc(
        tds.encode_sgtin96("0614141", "812345", 1)[:80]
    )["scheme"] == "unknown"


def test_encode_validation():
    with pytest.raises(ValueError):
        tds.encode_sgtin96("0614141", "81234", 1)      # 12 digits, not 13
    with pytest.raises(ValueError):
        tds.encode_sgtin96("06141", "81234567", 1)     # 5-digit CP invalid
    with pytest.raises(ValueError):
        tds.encode_gsrn96("0614141061414", "123", 1)   # 13-digit CP invalid
    with pytest.raises(ValueError):
        tds.encode_sgtin198("0614141", "812345", "x" * 21)  # serial > 20
    with pytest.raises(ValueError):
        tds.encode_sgtin96("0614141", "812345", 1 << 38)    # serial width


def test_gdti96_roundtrip_and_independent_assembly():
    bits = tds.encode_gdti96("0614141", "12345", 400, filter_value=1)
    # header 0x2C, filter 1, partition 5, CP 24 bits, doc type 17 bits,
    # serial 41 bits (TDS 14.5.6 layout).
    v = (0x2C << 88) | (1 << 85) | (5 << 82) | (614141 << 58) \
        | (12345 << 41) | 400
    ref = np.asarray([(v >> (95 - i)) & 1 for i in range(96)], np.int64)
    np.testing.assert_array_equal(bits, ref)
    d = tds.decode_epc(bits)
    assert d["scheme"] == "gdti-96"
    assert d["uri"] == "urn:epc:id:gdti:0614141.12345.400"
    assert d["tag_uri"] == "urn:epc:tag:gdti-96:1.0614141.12345.400"


def test_gdti174_string_serial():
    bits = tds.encode_gdti174("0614141", "12345", "DOC-7a")
    assert bits.size == 176          # 11 on-tag words, zero-padded
    d = tds.decode_epc(bits)
    assert d["scheme"] == "gdti-174"
    assert d["uri"] == "urn:epc:id:gdti:0614141.12345.DOC-7a"


def test_gsrn_and_gsrnp():
    d = tds.decode_epc(tds.encode_gsrn96("0614141", "1234567890"))
    assert d["scheme"] == "gsrn-96"
    assert d["uri"] == "urn:epc:id:gsrn:0614141.1234567890"
    p = tds.decode_epc(tds.encode_gsrn96("0614141", "1234567890",
                                         provider=True))
    assert p["scheme"] == "gsrnp-96"
    assert p["uri"] == "urn:epc:id:gsrnp:0614141.1234567890"
    # Reserved trailing 24 bits nonzero -> invalid.
    bad = tds.encode_gsrn96("0614141", "1234567890").copy()
    bad[-3] = 1
    assert tds.decode_epc(bad)["scheme"] == "unknown"


def test_sgcn96_keeps_leading_zeros():
    """The coupon serial is a digit string; '0042' and '42' are different
    coupons (TDS 14.4.5 prefixes the digits with '1' before encoding)."""
    a = tds.decode_epc(tds.encode_sgcn96("0614141", "12345", "0042"))
    b = tds.decode_epc(tds.encode_sgcn96("0614141", "12345", "42"))
    assert a["scheme"] == "sgcn-96" and b["scheme"] == "sgcn-96"
    assert a["serial"] == "0042" and b["serial"] == "42"
    assert a["uri"] == "urn:epc:id:sgcn:0614141.12345.0042"
    assert a["uri"] != b["uri"]
    with pytest.raises(ValueError):
        tds.encode_sgcn96("0614141", "12345", "1234567890123")  # 13 digits
    with pytest.raises(ValueError):
        tds.encode_sgcn96("0614141", "12345", "4a")             # non-digit


def test_usdod96():
    bits = tds.encode_usdod96("2S194", 9999, filter_value=3)
    d = tds.decode_epc(bits)
    assert d["scheme"] == "usdod-96"
    assert d["cage"] == "2S194" and d["serial"] == 9999 and d["filter"] == 3
    assert d["uri"] == "urn:epc:id:usdod:2S194.9999"
    # Interior space (pad must be leading-only) -> not a valid CAGE.
    # Layout: ' 2S194' -> char 2 ('S', bits 28..36) forced to 0x20 after
    # the non-space '2'.
    bad = bits.copy()
    bad[28:36] = [0, 0, 1, 0, 0, 0, 0, 0]
    assert tds.decode_epc(bad)["scheme"] == "unknown"


def test_sgtin96_reads_back_through_the_full_pipeline():
    """A simulated tag carrying a real SGTIN-96 decodes end-to-end and the
    tag report carries the pure-identity URI (runtime/stats.py)."""
    import jax.numpy as jnp

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.runtime.inventory import decode_capture
    from gen2_rfid_tpu.runtime.stats import tag_report_records
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(max_events=64)
    epc = tds.encode_sgtin96("0614141", "812345", 6789, filter_value=3)
    tr = synthesize_inventory(cfg, [Tag(epc96=epc, seed=3)], n_rounds=2,
                              seed=4)
    stats, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_epc_correct) == 2
    recs = tag_report_records(dec, cfg)
    assert len(recs) == 2
    for r in recs:
        assert r["epc"] == "3074257bf7194e4000001a85"
        assert r["epc_uri"] == "urn:epc:id:sgtin:0614141.812345.6789"
