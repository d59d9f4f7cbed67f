"""Extended gate library: logic, conditional select, ECC gadgets."""

import pytest

import zprize_tpu.circuit.gates_ext  # noqa: F401 (attaches methods)
from zprize_tpu.circuit.composer import StandardComposer
from zprize_tpu.circuit.gates_ext import Point
from zprize_tpu.curve import jubjub
from zprize_tpu.params import R_MOD


def test_xor_and_gates():
    cs = StandardComposer()
    a = cs.add_input(0b1101)
    b = cs.add_input(0b1011)
    x = cs.xor_gate(a, b, 8)
    assert cs.variables[x] == 0b1101 ^ 0b1011
    y = cs.and_gate(a, b, 8)
    assert cs.variables[y] == 0b1101 & 0b1011
    cs.check_circuit_satisfied()


def test_conditional_select():
    cs = StandardComposer()
    one = cs.add_input(1)
    zero_bit = cs.add_input(0)
    a = cs.add_input(111)
    b = cs.add_input(222)
    assert cs.variables[cs.conditional_select(one, a, b)] == 111
    assert cs.variables[cs.conditional_select(zero_bit, a, b)] == 222
    assert cs.variables[cs.conditional_select_one(zero_bit, a)] == 1
    assert cs.variables[cs.conditional_select_zero(zero_bit, a)] == 0
    cs.check_circuit_satisfied()


def test_point_addition_gate():
    cs = StandardComposer()
    g = jubjub.GENERATOR
    g2 = jubjub.double(g)
    pa = Point(cs.add_input(g[0]), cs.add_input(g[1]))
    pb = Point(cs.add_input(g2[0]), cs.add_input(g2[1]))
    pc = cs.point_addition_gate(pa, pb)
    expect = jubjub.add(g, g2)
    assert (cs.variables[pc.x], cs.variables[pc.y]) == expect
    cs.check_circuit_satisfied()


def test_fixed_base_scalar_mul():
    cs = StandardComposer()
    k = 0x1234567890ABCDEF
    kv = cs.add_input(k)
    out = cs.fixed_base_scalar_mul(kv)
    expect = jubjub.mul(jubjub.GENERATOR, k)
    assert (cs.variables[out.x], cs.variables[out.y]) == expect
    cs.check_circuit_satisfied()


@pytest.mark.slow
def test_variable_base_scalar_mul():
    cs = StandardComposer()
    k = 987654321
    kv = cs.add_input(k)
    g = jubjub.GENERATOR
    p = Point(cs.add_input(g[0]), cs.add_input(g[1]))
    out = cs.variable_base_scalar_mul(kv, p)
    expect = jubjub.mul(g, k)
    assert (cs.variables[out.x], cs.variables[out.y]) == expect
    cs.check_circuit_satisfied()
