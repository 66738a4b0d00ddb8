#!/usr/bin/env python
"""Batched linalg primitive costs at solver shapes (scalar-reduced outputs:
the remote-tunnel transfer otherwise dominates; see ROUND1_STATUS.md)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

B, K, n = 128, 50, 120
M = B * K

key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (M, n, n), jnp.float32)
spd = jnp.einsum('bij,bkj->bik', A, A) + 10.0 * jnp.eye(n)
rhs = jax.random.normal(key, (M, n, n), jnp.float32)
L = jax.lax.linalg.cholesky(spd)


def timeit(name, fn, *args, iters=10):
    f = jax.jit(lambda *a: jax.tree.map(jnp.sum, fn(*a)))
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.2f} ms  ({dt/B*1e3:7.3f} ms/scenario-equiv)")


timeit("batched cholesky (6400,120,120)", jax.lax.linalg.cholesky, spd)
timeit("batched trsm right T (6400)",
       lambda l, b: jax.lax.linalg.triangular_solve(
           l, b, lower=True, transpose_a=True, left_side=False), L, rhs)
timeit("batched trsm vs I (6400)",
       lambda l: jax.lax.linalg.triangular_solve(
           l, jnp.broadcast_to(jnp.eye(n, dtype=l.dtype), l.shape),
           lower=True, left_side=True), L)
timeit("batched matmul EE^T (6400)",
       lambda a, b: jnp.einsum('bij,bkj->bik', a, b), rhs, rhs)

from ba_path_planning_tpu.solvers import banded

Ds = spd.reshape(B, K, n, n)
Bs = rhs.reshape(B, K, n, n)[:, 1:] * 0.01
timeit("vmap(scan factorize) (128 scen)", jax.vmap(banded.factorize), Ds, Bs)

timeit("vmap(factorize_matmul) (128 scen)",
       jax.vmap(banded.factorize_matmul), Ds, Bs)
from ba_path_planning_tpu.ops.blocked_chol import chol_inv
timeit("batched chol_inv (6400,120,120)", chol_inv, spd)
