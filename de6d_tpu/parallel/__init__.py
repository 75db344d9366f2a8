from .mesh import make_mesh, shard_batch, replicate, data_sharding
from . import collectives

__all__ = [
    "make_mesh", "shard_batch", "replicate", "data_sharding", "collectives",
]
