from .mesh import ROW_AXIS, make_mesh, replicated, row_sharding, shard_rows
from .dist_groupby import dist_groupby_dense, dist_groupby_shuffle
from .dist_join import dist_csr_join, dist_csr_join_ring, dist_csr_join_skew
from .dist_scan import dist_filter
from .dist_sort import dist_sort
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
    "dist_csr_join_skew",
    "dist_filter",
    "dist_sort",
    "partition_for_shuffle",
]
