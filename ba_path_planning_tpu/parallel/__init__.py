from .mesh import (SCENARIO_AXIS, Mesh, ShardedSCPSolver, make_mesh,
                   pad_to_multiple)
from .pair_sharded import (PAIR_AXIS, PairShardedSCPSolver, make_pair_mesh,
                           padded_pair_index)

__all__ = ["SCENARIO_AXIS", "Mesh", "ShardedSCPSolver", "make_mesh",
           "pad_to_multiple", "PAIR_AXIS", "PairShardedSCPSolver",
           "make_pair_mesh", "padded_pair_index"]
