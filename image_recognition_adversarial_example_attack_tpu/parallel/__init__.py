"""Device mesh + sharding: the framework's scale-out layer."""

from .mesh import make_mesh, data_sharding, replicated_sharding, shard_batch, shard_model_variables
from .distributed import maybe_initialize_distributed
