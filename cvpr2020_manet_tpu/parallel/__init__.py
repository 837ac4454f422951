from cvpr2020_manet_tpu.parallel import distributed
from cvpr2020_manet_tpu.parallel.mesh import (
    batch_sharding, create_mesh, replicated_sharding)

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "distributed"]
