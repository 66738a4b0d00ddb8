"""TPU-native Sequential Convex Programming engine for multi-vehicle
collision-free path planning.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
``jankammeth/BA-path-planning`` package: same public API surface
(``SCP``, ``generate_positions``, ``make_boxplot`` — reference
``src/path_planning/__init__.py:1-5``) plus the batched, sharded TPU API
(``SCPEngine``, ``ShardedSCPSolver``, ``generate_scenario_batch``).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy exports: keep `import ba_path_planning_tpu` cheap (no jax import).
    if name == "SCP":
        from .solvers.scp import SCP
        return SCP
    if name == "SCPEngine":
        from .solvers.scp import SCPEngine
        return SCPEngine
    if name == "SCPResult":
        from .solvers.scp import SCPResult
        return SCPResult
    if name == "ShardedSCPSolver":
        from .parallel.mesh import ShardedSCPSolver
        return ShardedSCPSolver
    if name == "generate_positions":
        from .scenarios import generate_positions
        return generate_positions
    if name == "generate_scenario_batch":
        from .scenarios import generate_scenario_batch
        return generate_scenario_batch
    if name == "make_boxplot":
        from .viz.boxplot import make_boxplot
        return make_boxplot
    if name in ("ProblemConfig", "SolverConfig", "Limits"):
        from .utils import config as _c
        return getattr(_c, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["SCP", "SCPEngine", "SCPResult", "ShardedSCPSolver",
           "generate_positions", "generate_scenario_batch", "make_boxplot",
           "ProblemConfig", "SolverConfig", "Limits"]
