from .mesh import (batch_sharding, get_mesh, replicate, shard_batch,
                   shard_batch_stack)
