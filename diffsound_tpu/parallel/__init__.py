from .mesh import make_device_mesh
from .ops import shard_element_ops, ShardedFEM

__all__ = ["make_device_mesh", "shard_element_ops", "ShardedFEM"]
