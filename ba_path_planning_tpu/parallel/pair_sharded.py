"""Agent-pair parallelism: shard ONE large-N scenario over a 'pairs' axis.

Scenario data-parallelism (``mesh.py``) is the workload's dominant axis, but
for large vehicle counts a SINGLE solve grows quadratically in the pair
count P = N(N-1)/2: the collision linearization, the K x P constraint-row
z/y updates, and the normal-equation collision blocks
(``banded.collision_blocks``, O(K (2N)^2 P) flops) all scale with P.

This module shards everything pair-indexed across devices with
``shard_map`` — the SURVEY 2.3 "tensor parallel" analogue of the
reference's ``for k, i, j>i`` triplet loops (``scp.py:488-552``):

* each device holds P/n_dev pairs' eta, collision bounds, and z/y rows;
* partial normal-equation blocks and A^T contributions are reduced with
  ``psum`` over ICI (2 collectives per ADMM iteration, each O(K 6N) or
  O(K (2N)^2) bytes — tiny next to the local pair work they summarize);
* the block-tridiagonal x-update stays replicated (it is sequential in K
  and shared by all pairs).

The per-pair work is padded to a multiple of the shard count with INERT
pairs: zero incidence columns (no force contribution) and -inf collision
bounds (rows disabled), marked via ``PairIndex.valid``.

Semantics are shared with the unsharded engine down to the same functions:
``_scp_start/step/finalize_direct`` simply receive a shard-local
``PairIndex`` plus the mesh axis name.
"""

from __future__ import annotations


import inspect

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

# JAX renamed shard_map's replication-check kwarg: check_rep (<=0.8) ->
# check_vma (>=0.9). We disable it either way: the solver's outputs are
# made replicated by explicit psum reductions, which the static checker
# cannot always prove.
if "check_vma" in inspect.signature(shard_map).parameters:
    _NOCHECK = {"check_vma": False}
else:  # pragma: no cover - older JAX
    _NOCHECK = {"check_rep": False}

from ..ops.collisions import PairIndex
from ..solvers.admm import make_solver_params
from ..solvers.scp import (SCPResult, _scp_finalize_direct, _scp_start_direct,
                           _scp_step_direct)
from ..utils.config import ProblemConfig, SolverConfig

PAIR_AXIS = "pairs"


def make_pair_mesh(devices=None, axis_name: str = PAIR_AXIS) -> Mesh:
    """1-D mesh over devices for intra-scenario pair parallelism."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def padded_pair_index(n_vehicles: int, n_shards: int,
                      dtype=jnp.float32) -> PairIndex:
    """All-pair index padded to a multiple of ``n_shards`` with inert pairs
    (zero E columns, valid=False)."""
    N = n_vehicles
    ii, jj = np.triu_indices(N, k=1)
    Pn = len(ii)
    Pp = -(-Pn // n_shards) * n_shards
    i_idx = np.zeros(Pp, np.int32)
    j_idx = np.zeros(Pp, np.int32)
    i_idx[:Pn], j_idx[:Pn] = ii, jj
    E = np.zeros((N, Pp))
    E[ii, np.arange(Pn)] = 1.0
    E[jj, np.arange(Pn)] = -1.0
    valid = np.zeros(Pp, bool)
    valid[:Pn] = True
    return PairIndex(i_idx=jnp.asarray(i_idx), j_idx=jnp.asarray(j_idx),
                     E=jnp.asarray(E, dtype=dtype), valid=jnp.asarray(valid))


class PairShardedSCPSolver:
    """Single-scenario SCP solver with pair-sharded QP subproblems.

    Complements :class:`~ba_path_planning_tpu.parallel.mesh.ShardedSCPSolver`
    (scenario axis): use this one when a single problem instance is large
    (many vehicles) rather than when there are many instances.
    """

    def __init__(self, problem: ProblemConfig,
                 solver: SolverConfig | None = None,
                 mesh: Mesh | None = None, axis_name: str = PAIR_AXIS,
                 dtype=jnp.float32):
        solver = solver if solver is not None else SolverConfig()
        if solver.method != "direct":
            solver = solver.replace(method="direct")
        # the pair-sharded QP runs the XLA banded path per shard; the
        # grouped/pallas streaming kernels are per-scenario-batch machinery
        solver = solver.replace(pallas=False, group=-1, fused=False)
        self.problem = problem
        self.solver = solver
        self.dtype = dtype
        self.mesh = mesh if mesh is not None else make_pair_mesh()
        self.axis = axis_name
        n_shards = self.mesh.shape[axis_name]
        self.pairs = padded_pair_index(problem.n_vehicles, n_shards, dtype)
        self.params = make_solver_params(solver, dtype)
        static = solver.static_part()

        pspecs = PairIndex(i_idx=P(axis_name), j_idx=P(axis_name),
                           E=P(None, axis_name), valid=P(axis_name))
        rep = P()

        def solve_fn(p0, v0, pf, vf, key, pairs_local):
            carry = _scp_start_direct(p0, v0, pf, vf, key,
                                      params=self.params, pairs=pairs_local,
                                      problem=problem, solver=static,
                                      axis_name=axis_name)
            carry = _scp_step_direct(carry, p0, v0, pf, vf, key,
                                     jnp.int32(problem.max_iterations),
                                     params=self.params, pairs=pairs_local,
                                     problem=problem, solver=static,
                                     axis_name=axis_name)
            res = _scp_finalize_direct(carry, p0, v0, pf, vf,
                                       pairs=pairs_local,
                                       problem=problem, axis_name=axis_name)
            # y (dual rows) stays sharded internally; the public result is
            # fully replicated
            return res

        self._solve = jax.jit(shard_map(
            solve_fn, mesh=self.mesh,
            in_specs=(rep, rep, rep, rep, rep, pspecs),
            out_specs=rep, **_NOCHECK))

    def solve(self, p0, v0, pf, vf, key=None) -> SCPResult:
        """p0/v0/pf/vf: (N, 2) single large-N scenario."""
        if key is None:
            key = jax.random.key(0)
        dt = self.dtype
        args = [jnp.asarray(a, dt) for a in (p0, v0, pf, vf)]
        return self._solve(*args, key, self.pairs)
