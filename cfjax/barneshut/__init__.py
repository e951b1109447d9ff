from .bh import BarnesHutFactorization, bh_matvec
from .tree import BalancedTree, build_tree
