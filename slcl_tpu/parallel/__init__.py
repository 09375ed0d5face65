from .mesh import make_mesh, shard_batch, replicate_state, data_parallel_step  # noqa: F401
