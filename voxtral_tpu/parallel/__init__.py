from voxtral_tpu.parallel.sharding import (
    make_mesh, param_pspecs, shard_params, fleet_state_pspecs, shard_tree,
)

__all__ = ["make_mesh", "param_pspecs", "shard_params", "fleet_state_pspecs",
           "shard_tree"]
