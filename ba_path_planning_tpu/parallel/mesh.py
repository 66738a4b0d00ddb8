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
                 mesh: Mesh | None = None, dtype=jnp.float32,
                 microbatch: int | None = None):
        """``microbatch``: per-device chunk size.  The batched `while_loop`
        runs every lane until the slowest lane in the program converges, so
        solving the batch as sequential chunks of ``microbatch`` scenarios
        bounds that tail to the chunk maximum instead of the global maximum
        (total work = sum of per-chunk maxima).  None = one chunk.
        """
        self.engine = SCPEngine(problem, solver, dtype=dtype)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = self.mesh.devices.size
        self.sharding = NamedSharding(self.mesh, P(SCENARIO_AXIS))
        self.replicated = NamedSharding(self.mesh, P())
        self.microbatch = microbatch

        solve_one = self.engine.solve_fn()
        n_dev = self.n_devices
        mb = microbatch

        def _solve(p0, v0, pf, vf, keys):
            B = p0.shape[0]
            per_dev = B // n_dev
            if mb is None or mb >= per_dev:
                return jax.vmap(solve_one)(p0, v0, pf, vf, keys)
            # chunk the per-device batch: (B,...) -> (C, n_dev*mb, ...) and
            # lax.map over chunks (sequential), vmap within a chunk.
            # Reshape keeps each device's scenarios contiguous per chunk by
            # splitting the per-device axis: (n_dev, per_dev, ...) ->
            # (n_dev, C, mb, ...) -> (C, n_dev*mb, ...)
            C = per_dev // mb
            assert per_dev % mb == 0, (per_dev, mb)

            def chunked(x):
                rest = x.shape[1:]
                return (x.reshape((n_dev, C, mb) + rest)
                        .transpose((1, 0, 2) + tuple(
                            range(3, 3 + len(rest))))
                        .reshape((C, n_dev * mb) + rest))

            args = jax.tree.map(chunked, (p0, v0, pf, vf, keys))
            out = jax.lax.map(lambda a: jax.vmap(solve_one)(*a), args)

            def unchunk(x):
                return (x.reshape((C, n_dev, mb) + x.shape[2:])
                        .transpose((1, 0, 2) + tuple(
                            range(3, 3 + len(x.shape[2:]))))
                        .reshape((B,) + x.shape[2:]))

            return jax.tree.map(unchunk, out)

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
