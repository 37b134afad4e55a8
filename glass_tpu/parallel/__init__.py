from .mesh import make_mesh, shard_batch, make_parallel_train_step
