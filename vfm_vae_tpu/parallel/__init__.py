from .mesh import (make_mesh, batch_sharding, replicated, shard_batch, local_mesh,
                   zero1_sharding, shard_opt_state, zero1_state_shardings, place_state,
                   check_replica_consistency, warm_up_collectives)
from .tp import shard_heads, shard_hidden, shard_replicated_features
from .serving import ShardedFn, process_shard, replicate, serving_mesh
