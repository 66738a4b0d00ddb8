from .mesh import (SCENARIO_AXIS, Mesh, ShardedSCPSolver, make_mesh,
                   pad_to_multiple)

__all__ = ["SCENARIO_AXIS", "Mesh", "ShardedSCPSolver", "make_mesh",
           "pad_to_multiple"]
