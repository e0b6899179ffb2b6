from .mesh import CORPUS_AXIS, corpus_mesh
from .sharded_search import ShardedIndex

__all__ = ["CORPUS_AXIS", "corpus_mesh", "ShardedIndex"]
