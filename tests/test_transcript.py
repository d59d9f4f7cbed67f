from zprize_tpu.transcript.merlin import Transcript
from zprize_tpu.transcript.serialize import (serialize_fr, serialize_g1,
                                             serialize_public_inputs)
from zprize_tpu.ref.curve import G1_GEN
from zprize_tpu.params import Q_MOD


def test_merlin_vector():
    """Upstream merlin test vector (merlin/src/transcript.rs tests)."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == ("d5a21972d0d5fe320c0d263fac7fffb8"
                       "145aa640af6e9bca177c03c7efcf0615")


def test_transcript_determinism_and_divergence():
    t1 = Transcript(b"proto")
    t2 = Transcript(b"proto")
    t1.append_message(b"x", b"1")
    t2.append_message(b"x", b"1")
    assert t1.challenge_bytes(b"c", 31) == t2.challenge_bytes(b"c", 31)
    t1.append_message(b"x", b"1")
    t2.append_message(b"x", b"2")
    assert t1.challenge_bytes(b"c", 31) != t2.challenge_bytes(b"c", 31)


def test_serialize_fr():
    assert serialize_fr(1) == b"\x01" + b"\x00" * 31


def test_serialize_g1_flags():
    b = serialize_g1(None)
    assert b[47] & (1 << 6)
    x, y = G1_GEN
    enc = serialize_g1(G1_GEN)
    assert int.from_bytes(enc[:47] + bytes([enc[47] & 0x3F]), "little") == x
    # positive-y flag must match y > -y
    assert bool(enc[47] & (1 << 7)) == (y > Q_MOD - y)


def test_serialize_pi():
    b = serialize_public_inputs({5: 7})
    assert b[:8] == (1).to_bytes(8, "little")
    assert b[8:16] == (5).to_bytes(8, "little")
    assert b[16:48] == (7).to_bytes(32, "little")
