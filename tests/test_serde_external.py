"""Serialization vs EXTERNALLY-anchored byte vectors.

`transcript/serialize.py` implements arkworks CanonicalSerialize point
compression: x-coordinate 48 bytes LITTLE-endian with SWFlags packed in
the top bits of the LAST byte (infinity = 1<<6, y-is-larger = 1<<7) —
the format the reference's C++ serializer reproduces
(`lib/PLONK/src/serialize.cuh:52-63`, SURVEY.md §5 note 8). Until round
3 this was only round-trip-tested against itself (VERDICT r3 missing
#5).

External anchor: the BLS12-381 G1 generator's compressed encoding in the
zcash/IETF format is a published constant (zkcrypto/bls12_381, py_ecc,
blst all emit it):

    0x97f1d3a7...c6bb  (48 bytes, big-endian, flags in FIRST byte:
                        0x80 = compressed, 0x20 = y lexicographically
                        largest — clear for the generator)

arkworks' layout rule maps this to: strip the 0x80 flag, byte-reverse
the x coordinate, set bit 7 of the last byte iff y > -y. Deriving the
expected bytes from the public constant (rather than from this repo's
own serializer) pins both the endianness and the flag semantics."""

import binascii

from zprize_tpu.params import Q_MOD
from zprize_tpu.ref.curve import G1_GEN
from zprize_tpu.transcript.serialize import serialize_g1, serialize_fr
from zprize_tpu.protocol.serde import deserialize_g1

# public zcash-format compressed G1 generator (zkcrypto/bls12_381 README,
# IETF pairing-friendly-curves draft)
G1_GEN_ZCASH_HEX = (
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb"
)


def _ark_bytes_from_zcash(zcash_hex):
    be = bytearray(binascii.unhexlify(zcash_hex))
    assert be[0] & 0x80, "public vector must carry the compression flag"
    y_largest = bool(be[0] & 0x20)
    be[0] &= 0x1F                        # strip zcash flag bits -> raw x BE
    le = bytes(reversed(be))             # arkworks: little-endian x
    out = bytearray(le)
    if y_largest:
        out[47] |= 0x80                  # arkworks SWFlags::PositiveY
    return bytes(out)


def test_g1_generator_matches_public_constant():
    expected = _ark_bytes_from_zcash(G1_GEN_ZCASH_HEX)
    assert serialize_g1(G1_GEN) == expected
    # cross-check the x coordinate itself against the public value
    x_be = int.from_bytes(
        bytes([0x17]) + binascii.unhexlify(G1_GEN_ZCASH_HEX)[1:48], "big")
    assert G1_GEN[0] == x_be
    # zcash sign bit clear for the generator => y is NOT the larger root
    assert not (G1_GEN[1] > (Q_MOD - G1_GEN[1]) % Q_MOD)


def test_g1_infinity_flag():
    enc = serialize_g1(None)
    assert enc == b"\x00" * 47 + bytes([0x40])
    pt, off = deserialize_g1(enc, 0)
    assert pt is None and off == 48


def test_g1_roundtrip_external_vector():
    pt, off = deserialize_g1(_ark_bytes_from_zcash(G1_GEN_ZCASH_HEX), 0)
    assert off == 48
    assert pt == G1_GEN


def test_g1_negated_generator_sign_flag():
    neg = (G1_GEN[0], (Q_MOD - G1_GEN[1]) % Q_MOD)
    enc_g = serialize_g1(G1_GEN)
    enc_n = serialize_g1(neg)
    assert enc_g[:47] == enc_n[:47]
    assert (enc_g[47] ^ enc_n[47]) == 0x80   # PositiveY differs
    assert deserialize_g1(enc_n, 0)[0] == neg


def test_fr_scalar_le_bytes():
    # arkworks Fr CanonicalSerialize = 32-byte little-endian integer
    assert serialize_fr(1) == b"\x01" + b"\x00" * 31
    v = 0x1234567890ABCDEF
    assert serialize_fr(v) == v.to_bytes(8, "little") + b"\x00" * 24
