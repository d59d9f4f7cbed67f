from zprize_tpu.poseidon.round_numbers import calc_round_numbers
from zprize_tpu.poseidon.constants import PoseidonConstants
from zprize_tpu.poseidon.ref import hash2
from zprize_tpu.poseidon.gadget import assert_hash_constraints
from zprize_tpu.circuit.composer import StandardComposer
from zprize_tpu.poseidon import matrix as mx


def test_round_numbers():
    # reference values (round_numbers.rs test table is for the
    # no-security-margin variant; the ZPrize path uses margin=True -> (8,55))
    assert calc_round_numbers(3, True) == (8, 55)


def test_constants_shape():
    c = PoseidonConstants.generate(3)
    assert c.domain_tag == 3
    assert len(c.round_constants) == (c.full_rounds + c.partial_rounds) * 3
    assert len(c.compressed_round_constants) == \
        c.full_rounds * 3 + c.partial_rounds


def test_mds_properties():
    c = PoseidonConstants.generate(3)
    m = c.mds_matrices.m
    assert mx.is_identity(mx.matmul(m, c.mds_matrices.m_inv))
    assert m == mx.transpose(m)  # Cauchy symmetric
    assert mx.is_sparse(c.mds_matrices.m_double_prime)


def test_gadget_matches_native():
    c = PoseidonConstants.generate(3)
    h = hash2(c, 11, 22)
    cs = StandardComposer()
    l = cs.add_input(11)
    r = cs.add_input(22)
    o = cs.add_input(h)
    n0 = cs.n
    assert_hash_constraints(cs, c, l, r, o)
    assert cs.n - n0 == 193  # 3 addi + 63*3 rounds + 1 assert_equal
    cs.check_circuit_satisfied()


def test_gadget_unsatisfied_on_wrong_output():
    import pytest
    c = PoseidonConstants.generate(3)
    cs = StandardComposer()
    l = cs.add_input(11)
    r = cs.add_input(22)
    o = cs.add_input(999)  # wrong
    assert_hash_constraints(cs, c, l, r, o)
    with pytest.raises(AssertionError):
        cs.check_circuit_satisfied()
