from .tree import MerkleTree
from .circuit import MerkleTreeCircuit
