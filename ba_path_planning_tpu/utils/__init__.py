from .config import (Limits, ProblemConfig, SolverConfig, load_yaml,
                     problem_from_dict, solver_from_dict)
from .layout import to_flat, from_flat

__all__ = ["Limits", "ProblemConfig", "SolverConfig", "load_yaml",
           "problem_from_dict", "solver_from_dict", "to_flat", "from_flat"]
