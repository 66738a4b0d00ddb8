"""Device-mesh scenario parallelism.

The reference's batch workload is a sequential Python loop over independent
trials (``compute_trajectories_batch.py:103-110``).  Here the same workload is
one sharded program: scenarios live on a ``('scenarios',)`` mesh axis, each
device solves its shard with the vmapped SCP engine, and no collectives are
needed in steady state (solves are independent; only metric reductions cross
devices).  Multi-host runs extend the same mesh over DCN via
``jax.distributed.initialize`` — the program is identical.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers.scp import SCPEngine, SCPResult
from ..utils.config import ProblemConfig, SolverConfig

SCENARIO_AXIS = "scenarios"


def make_mesh(devices=None, axis_name: str = SCENARIO_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices for scenario data-parallelism."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class ShardedSCPSolver:
    """Batch SCP solver sharded over a scenario mesh.

    One jitted executable: inputs and outputs carry
    ``NamedSharding(mesh, P('scenarios'))`` on the batch axis, so XLA keeps
    every scenario's entire solve resident on its device — zero steady-state
    communication, near-linear scaling in device count.
    """

    def __init__(self, problem: ProblemConfig,
                 solver: SolverConfig | None = None,
                 mesh: Mesh | None = None, dtype=jnp.float32):
        self.engine = SCPEngine(problem, solver, dtype=dtype)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = self.mesh.devices.size
        self.sharding = NamedSharding(self.mesh, P(SCENARIO_AXIS))
        self.replicated = NamedSharding(self.mesh, P())

        solve_one = self.engine.solve_fn()

        def _solve(p0, v0, pf, vf, keys):
            return jax.vmap(solve_one)(p0, v0, pf, vf, keys)

        batch_shard = NamedSharding(self.mesh, P(SCENARIO_AXIS))
        self._solve = jax.jit(
            _solve,
            in_shardings=(batch_shard,) * 4 + (batch_shard,),
            out_shardings=batch_shard)

    def solve(self, p0, v0, pf, vf, keys) -> SCPResult:
        """p0/v0/pf/vf: (B, N, 2); keys: (B,) PRNG keys.

        B must be a multiple of the device count (use ``pad_batch`` helpers
        or the harness which pads and masks automatically).
        """
        B = p0.shape[0]
        if B % self.n_devices != 0:
            raise ValueError(
                f"batch {B} not divisible by {self.n_devices} devices")
        dt = self.engine.dtype
        arrs = [jax.device_put(jnp.asarray(a, dtype=dt), self.sharding)
                for a in (p0, v0, pf, vf)]
        keys = jax.device_put(keys, self.sharding)
        return self._solve(*arrs, keys)
