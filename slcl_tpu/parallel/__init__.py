from .mesh import (make_mesh, shard_batch, replicate_state,  # noqa: F401
                   data_parallel_step, fsdp_shard_state, make_multihost_batch)
