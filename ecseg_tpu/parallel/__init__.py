from .mesh import make_mesh, param_shardings, shard_patch_batch
