from .mesh import (device_mesh, mlp_partition_specs, shard_flow, shard_case,
                   make_sharded_train_step, make_sharded_piso_step,
                   shard_turbulence, make_sharded_sst_step)
from .distributed import (DistributedConfig, init_distributed,
                          is_multihost, global_device_mesh)
