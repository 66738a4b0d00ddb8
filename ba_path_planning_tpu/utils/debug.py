"""Numerical-sanitizer layer (the TPU-native analogue of race detectors /
sanitizers, SURVEY section 6).

The functional JAX model rules out data races, so the failure class that
remains is NUMERICAL: NaN/Inf escaping a kernel, division blow-ups in the
ADMM scaling, or a divergent linearization poisoning a whole batch lane.
Production guards against the last one structurally (the divergence guard,
``solvers/scp.py``); this module adds an OPT-IN debug harness built on
``jax.experimental.checkify`` that instruments any solve callable with
float checks (nan/inf on every primitive output) plus explicit postcondition
checks on the result, without touching the production path.

Usage::

    from ba_path_planning_tpu.utils.debug import checked
    fn = checked(engine.solve_fn())         # same signature
    err, res = fn(p0, v0, pf, vf, key)
    err.throw()                             # raises with the failing check

Reference context: the reference has nothing of this kind — its only
runtime defenses are shape asserts (``scp.py:259-321``) and per-trial
exception capture (``compute_trajectories_batch.py:50-54``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import checkify


#: float-domain error set: NaN and Inf surfacing anywhere in the solve
FLOAT_CHECKS = checkify.float_checks


def _result_postconditions(res):
    """Explicit postconditions on an SCPResult-shaped pytree."""
    checkify.check(jnp.all(jnp.isfinite(res.positions)),
                   "non-finite positions in SCP result")
    checkify.check(jnp.all(jnp.isfinite(res.accelerations)),
                   "non-finite accelerations in SCP result")
    checkify.check(jnp.all(res.iterations >= 0),
                   "negative iteration count")


def checked(solve_fn, errors=FLOAT_CHECKS, postconditions=True):
    """Wrap a solve callable with checkify instrumentation.

    Returns a function with the same signature whose result is
    ``(error, result)``; call ``error.throw()`` to surface the first failed
    check (works under jit — checks ride the computation as values).
    """
    def base(*args, **kwargs):
        res = solve_fn(*args, **kwargs)
        if postconditions:
            _result_postconditions(res)
        return res

    return checkify.checkify(base, errors=errors)


def checked_jit(solve_fn, errors=FLOAT_CHECKS, postconditions=True):
    """`checked` + jit (checkify must wrap INSIDE jit to stay traceable)."""
    return jax.jit(checked(solve_fn, errors=errors,
                           postconditions=postconditions))


def find_nan_lanes(res) -> jnp.ndarray:
    """Boolean (B,) mask of batch lanes whose trajectories contain NaN/Inf —
    host-side triage for batched results (which lane poisoned the batch)."""
    flat = res.positions.reshape(res.positions.shape[0], -1)
    bad_p = ~jnp.all(jnp.isfinite(flat), axis=-1)
    flat_a = res.accelerations.reshape(res.accelerations.shape[0], -1)
    bad_a = ~jnp.all(jnp.isfinite(flat_a), axis=-1)
    return bad_p | bad_a
