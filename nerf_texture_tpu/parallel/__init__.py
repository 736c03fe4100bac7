from .distributed import initialize_multihost, make_global_mesh
from .sharding import (data_sharded, make_mesh, param_shardings, replicated,
                       shard_params)
from .train import dp_train_step, shard_curved_state, shard_state

__all__ = ["data_sharded", "make_mesh", "param_shardings", "replicated",
           "shard_params", "dp_train_step", "shard_curved_state",
           "shard_state", "initialize_multihost", "make_global_mesh"]
