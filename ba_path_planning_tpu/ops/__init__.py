from .rollout import (rollout, rollout_positions_zero_ic,
                      rollout_positions_zero_ic_adjoint)
from .constraints import (ConstraintBlocks, Bounds, apply_static,
                          apply_static_adjoint, apply_collision,
                          apply_collision_adjoint, apply_A, apply_AT,
                          static_bounds, pair_incidence)
from .collisions import (PairIndex, make_pair_index, linearize,
                         collision_lower_bounds, check_feasible,
                         min_pairwise_distance, pairwise_diffs)

__all__ = [
    "rollout", "rollout_positions_zero_ic", "rollout_positions_zero_ic_adjoint",
    "ConstraintBlocks", "Bounds", "apply_static", "apply_static_adjoint",
    "apply_collision", "apply_collision_adjoint", "apply_A", "apply_AT",
    "static_bounds", "pair_incidence",
    "PairIndex", "make_pair_index", "linearize", "collision_lower_bounds",
    "check_feasible", "min_pairwise_distance", "pairwise_diffs",
]
