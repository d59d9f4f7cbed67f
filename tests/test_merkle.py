import random

from zprize_tpu.params import R_MOD
from zprize_tpu.poseidon.constants import PoseidonConstants
from zprize_tpu.poseidon.ref import hash2
from zprize_tpu.merkle.tree import MerkleTree
from zprize_tpu.merkle.circuit import MerkleTreeCircuit, gen_constraints
from zprize_tpu.circuit.composer import StandardComposer

HEIGHT = 4


def _tree(height=HEIGHT, seed=7):
    rng = random.Random(seed)
    param = PoseidonConstants.generate(3)
    leaves = [rng.randrange(R_MOD) for _ in range(1 << (height - 1))]
    return param, MerkleTree(param, leaves, height)


def test_tree_structure():
    param, tree = _tree()
    # root = H(H(H(l0,l1),H(l2,l3)), ...)
    lvl = list(tree.leaf_nodes)
    while len(lvl) > 1:
        lvl = [hash2(param, lvl[i], lvl[i + 1]) for i in range(0, len(lvl), 2)]
    assert lvl[0] == tree.root()


def test_membership_proofs():
    param, tree = _tree()
    for idx in range(1 << (HEIGHT - 1)):
        path = tree.gen_proof(idx)
        assert path.verify(param, tree.root())


def test_constraints_satisfied():
    param, tree = _tree(height=3)
    cs = StandardComposer()
    gen_constraints(tree, cs, param)
    cs.check_circuit_satisfied()
    # 3 internal nodes x 193 gates + root PI gate + 4 initial gates
    assert cs.n == 4 + 3 * 193 + 1


def test_circuit_padded_size():
    param, tree = _tree(height=3)
    c = MerkleTreeCircuit(param, tree)
    assert c.padded_circuit_size() == 1 << 12
