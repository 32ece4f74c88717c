from .dist_beyn import batched_moments, beyn_batched
from .dist_spmv import dist_dot, halo_exchange, make_dist_spmv
from .multihost import init_multihost, pod_mesh, pod_spec_check
from .partition import RowPartitionedEll, partition_rows, partition_stack

__all__ = ["batched_moments", "beyn_batched", "dist_dot", "halo_exchange",
           "make_dist_spmv", "RowPartitionedEll", "partition_rows",
           "partition_stack", "init_multihost", "pod_mesh",
           "pod_spec_check"]
