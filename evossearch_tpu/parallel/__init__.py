from .mesh import CORPUS_AXIS, corpus_mesh
from .sharded_search import ShardedIndex
from .sharded_ivf import ShardedIVFIndex
from .sharded_sq8 import SQ8ShardedIndex

__all__ = [
    "CORPUS_AXIS", "corpus_mesh", "ShardedIndex", "ShardedIVFIndex",
    "SQ8ShardedIndex",
]
