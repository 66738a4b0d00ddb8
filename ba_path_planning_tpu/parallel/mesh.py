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

    # -- compacting driver ---------------------------------------------------

    def _build_compacted(self, chunk: int):
        start, step, finalize = self.engine.start_step_finalize_fns()
        sh = self.sharding
        max_iters = self.engine.problem.max_iterations

        finalize_c = jax.jit(jax.vmap(finalize), out_shardings=sh)

        def active_flags(carry):
            return (~carry.stop & ~carry.feasible_initial
                    & (carry.it < max_iters))

        def start_with_flags(*args):
            carry = jax.vmap(start)(*args)
            return carry, active_flags(carry)

        start_c = jax.jit(start_with_flags, out_shardings=(sh, sh))

        # gather active lanes + SCP step + scatter back + next active mask,
        # all in ONE dispatch: the remote tunnel charges a round-trip per
        # jitted call, which at three calls per compaction dispatch rivaled
        # the QP work itself.  The full carry is donated so the scatter
        # updates in place.
        #
        # Compaction is SHARD-LOCAL (shard_map): each device gathers and
        # scatters only its own lanes, with indices the host builds per
        # device shard — a global gather would reshard lanes across
        # devices every round (measured 23x wall at 8 virtual devices).
        # ``valid`` masks pad slots on devices whose active-lane count
        # doesn't fill their chunk slice (their step result is discarded).
        from jax import shard_map as _shard_map
        from .pair_sharded import _NOCHECK

        mesh_ = self.mesh
        spec1 = P(SCENARIO_AXIS)

        def _leading_spec(x):
            return P(*((SCENARIO_AXIS,) + (None,) * (x.ndim - 1)))

        def fused(carry, jidx, valid, si, p0, v0, pf, vf, keys):
            cspec = jax.tree.map(_leading_spec, carry)
            aspec = jax.tree.map(_leading_spec, (p0, v0, pf, vf, keys))

            def local(carry_l, jidx_l, valid_l, args_l):
                cpart = jax.tree.map(lambda x: x[jidx_l], carry_l)
                apart = jax.tree.map(lambda x: x[jidx_l], args_l)
                stepped = jax.vmap(step)(cpart, *apart, cpart.it + si)
                stepped = jax.tree.map(
                    lambda s, c: jnp.where(
                        valid_l.reshape((-1,) + (1,) * (s.ndim - 1)), s, c),
                    stepped, cpart)
                new = jax.tree.map(lambda f, p: f.at[jidx_l].set(p),
                                   carry_l, stepped)
                return new, active_flags(new)

            return _shard_map(
                local, mesh=mesh_,
                in_specs=(cspec, spec1, spec1, aspec),
                out_specs=(cspec, spec1), **_NOCHECK)(
                    carry, jidx, valid, (p0, v0, pf, vf, keys))

        step_c = jax.jit(fused, static_argnames=("si",),
                         donate_argnums=0)

        # tail dispatch size: late compaction rounds have few active lanes,
        # so padding them to the full chunk wastes most of the dispatch — a
        # second, smaller executable (one XLA program per distinct shape)
        # bounds that waste to tail_chunk - 1 lanes
        tail = chunk // 4
        if tail >= self.n_devices and tail % self.n_devices == 0:
            tail_chunk = tail
        else:
            tail_chunk = chunk
        self._compact = (start_c, step_c, finalize_c, chunk,
                         tail_chunk)
        return self._compact

    def _run_phase1(self, start_c, args, B, chunk):
        """Initial-QP phase over the full batch in as FEW dispatches as
        possible: the channel-factorized phase-1 QP is far cheaper per
        scenario than a compaction step, so one full-batch dispatch stays
        well under the runtime's execution deadline while saving
        (B/chunk - 1) tunnel round-trips (~30 ms each on the remote
        tunnel).  Falls back to chunked dispatches only when the batch is
        very large (bounded on-device time per call)."""
        max_start = max(chunk, 8192 * self.n_devices)
        if B <= max_start:
            return start_c(*args)
        carries, flag_parts = [], []
        for lo in range(0, B, max_start):
            c, f = start_c(*jax.tree.map(
                lambda x: x[lo:lo + max_start], args))
            carries.append(c)
            flag_parts.append(f)
        carry = jax.tree.map(lambda *xs: jnp.concatenate(xs), *carries)
        return carry, jnp.concatenate(flag_parts)

    def solve_compacted(self, p0, v0, pf, vf, keys,
                        chunk: int | None = None,
                        step_iters: int = 1) -> SCPResult:
        """Batch solve with host-side straggler compaction.

        The plain batched solve pays the SLOWEST lane's SCP iteration count
        for the whole batch (the vmapped ``while_loop`` runs until every lane
        stops; mean ~1.3 iterations but max ~3 on the benchmark workload).
        Here the loop is driven from the host at ``step_iters`` granularity:
        after each round each device's still-active lanes are packed
        densely into as few fixed-size ``chunk`` dispatches as possible
        (compaction is SHARD-LOCAL — no cross-device lane movement, so
        the rounds are communication-free on a multi-chip mesh), and
        total QP work approaches ``sum(per-lane iterations)`` instead of
        ``B * max(per-lane iterations)``.  Results are semantically
        identical to :meth:`solve` — same per-lane iteration counts,
        statuses, and the same degenerate-pair PRNG stream (the resumable
        carry includes the global iteration index that keys the fold);
        float values agree to batching-width roundoff (XLA lowers
        different vmap widths differently).

        Compaction-round dispatches use two fixed shapes (``chunk`` and a
        tail chunk), so the compaction loop itself never recompiles.  The
        phase-1 and finalize dispatches run at the full batch size — one
        executable per distinct B a caller uses (cheap channel-factorized /
        rollout work; the single dispatch saves B/chunk tunnel round-trips).
        Callers cycling many batch sizes should pin B to a small grid.
        The final partial chunk is padded by repeating active lanes
        (identical duplicate work, scattered back idempotently).
        """
        import time as time_
        import numpy as np_

        B = p0.shape[0]
        if chunk is None:
            chunk = min(B, 128 * self.n_devices)
        if B % chunk != 0 or chunk % self.n_devices != 0:
            raise ValueError(
                f"batch {B} must be a multiple of chunk {chunk}, and chunk "
                f"a multiple of the device count {self.n_devices}")
        dt = self.engine.dtype
        p0, v0, pf, vf = (
            jax.device_put(jnp.asarray(a, dtype=dt), self.sharding)
            for a in (p0, v0, pf, vf))
        keys = jax.device_put(keys, self.sharding)

        compact = getattr(self, "_compact", None)
        if compact is None or compact[3] != chunk:
            compact = self._build_compacted(chunk)
        start_c, step_c, finalize_c, _, tail_chunk = compact

        args = (p0, v0, pf, vf, keys)
        si = int(step_iters)
        n_dev = self.n_devices
        B_loc = B // n_dev

        # phase 1 over the full batch in one dispatch (flags ride along in
        # the same dispatch — the tunnel charges a round-trip per call)
        t0 = time_.perf_counter()
        carry, flags = self._run_phase1(start_c, args, B, chunk)
        flags_h = np_.asarray(flags)
        t1 = time_.perf_counter()

        # fine-grained loop accounting (scaling root-cause telemetry):
        # t_prep    host-side index build + device_put of compaction inputs
        # t_enqueue async step dispatch calls (enqueue only)
        # t_sync    flags device->host transfers (the loop's sync points,
        #           so this also absorbs the dispatched compute)
        t_prep = t_enqueue = t_sync = 0.0
        n_rounds = n_dispatches = 0
        lanes_dispatched = 0

        def dispatch(act_slices, size):
            # per-device local index + validity arrays (shard-local
            # compaction): a device's pad slots repeat its OWN active
            # lanes (idempotent duplicate scatter) or are masked invalid
            # when the device has no active lanes this round
            nonlocal t_prep, t_enqueue, n_dispatches, lanes_dispatched
            tp = time_.perf_counter()
            c_loc = size // n_dev
            idx_parts, val_parts = [], []
            for sl in act_slices:
                if sl.size:
                    idx_parts.append(np_.resize(sl, c_loc))
                    val_parts.append(np_.ones(c_loc, bool))
                else:
                    idx_parts.append(np_.zeros(c_loc, np_.int64))
                    val_parts.append(np_.zeros(c_loc, bool))
            jidx = jax.device_put(
                jnp.asarray(np_.concatenate(idx_parts), jnp.int32),
                self.sharding)
            valid = jax.device_put(jnp.asarray(np_.concatenate(val_parts)),
                                   self.sharding)
            te = time_.perf_counter()
            out = step_c(carry, jidx, valid, si, *args)
            t_prep += te - tp
            t_enqueue += time_.perf_counter() - te
            n_dispatches += 1
            lanes_dispatched += size
            return out

        while True:
            acts = [np_.flatnonzero(flags_h[d * B_loc:(d + 1) * B_loc])
                    for d in range(n_dev)]
            n_active = max(a.size for a in acts)
            if n_active == 0:
                break
            n_rounds += 1
            lo = 0
            c_full = chunk // n_dev
            c_tail = tail_chunk // n_dev
            while lo < n_active:
                rem = n_active - lo
                size = chunk if rem > c_full - c_tail else tail_chunk
                c_loc = size // n_dev
                carry, flags = dispatch(
                    [a[lo:lo + c_loc] for a in acts], size)
                lo += c_loc
            ts = time_.perf_counter()
            flags_h = np_.asarray(flags)
            t_sync += time_.perf_counter() - ts
        t2 = time_.perf_counter()
        # per-phase wall split for callers building per-scenario time proxies
        # (synced on the flags transfers the loop performs anyway)
        self.last_timing = {"phase1_s": t1 - t0, "loop_s": t2 - t1,
                            "loop_prep_s": t_prep,
                            "loop_enqueue_s": t_enqueue,
                            "loop_sync_s": t_sync,
                            "loop_rounds": n_rounds,
                            "loop_dispatches": n_dispatches,
                            "loop_lanes_dispatched": lanes_dispatched}

        # finalize (rollout + feasibility check) is cheap: one full-batch
        # dispatch instead of B/chunk chunked ones
        max_fin = max(chunk, 16384 * self.n_devices)
        if B <= max_fin:
            return finalize_c(carry, p0, v0, pf, vf)
        results = []
        for lo in range(0, B, max_fin):
            sl = jax.tree.map(lambda x: x[lo:lo + max_fin],
                              (carry, p0, v0, pf, vf))
            results.append(finalize_c(*sl))
        return jax.tree.map(lambda *xs: jnp.concatenate(xs), *results)
