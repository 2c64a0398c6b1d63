from .mesh import ROW_AXIS, make_mesh, replicated, row_sharding, shard_rows
from .dist_groupby import dist_groupby_dense, dist_groupby_shuffle
from .dist_join import dist_csr_join
from .shuffle import partition_for_shuffle

__all__ = [
    "ROW_AXIS",
    "make_mesh",
    "replicated",
    "row_sharding",
    "shard_rows",
    "dist_groupby_dense",
    "dist_groupby_shuffle",
    "dist_csr_join",
    "partition_for_shuffle",
]
