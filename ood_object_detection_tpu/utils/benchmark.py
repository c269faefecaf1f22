"""Device-time measurement that is robust to async/tunneled backends.

On tunneled TPU backends (axon), ``jax.block_until_ready`` can return before
execution finishes and every host sync costs a ~30ms round trip — naive
per-call timing measures dispatch, not compute. The harness here runs N
iterations *inside one jitted lax.fori_loop* (single dispatch), carries a
data dependence between iterations so XLA cannot CSE or parallelize them,
and hard-syncs once via a scalar host fetch.
"""
from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _hard_sync(x) -> float:
    """Force real completion: fetch a scalar to host."""
    return float(jnp.sum(jax.tree.leaves(x)[0]).astype(jnp.float32))


def device_time(fn: Callable, args: Tuple, iters: int = 20,
                warmup: bool = True) -> float:
    """Average wall seconds per call of ``fn(*args)`` measured on device.

    fn must be jit-compatible and return a pytree of arrays. Iterations are
    chained through a carry perturbation on the first float input so the
    loop cannot be collapsed.
    """
    def loop(n, args):
        def body(i, carry):
            # make the input depend on the carry so iterations serialize and
            # the call cannot be hoisted out of the loop (1e-30*x is exact-0
            # in the f32 sum but opaque to the compiler)
            leaves, treedef = jax.tree.flatten(args)
            first_float = next(
                i for i, l in enumerate(leaves)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))
            leaves[first_float] = leaves[first_float] + (carry * 1e-30).astype(
                leaves[first_float].dtype)
            out = fn(*jax.tree.unflatten(treedef, leaves))
            leaf = jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
            return carry + leaf * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # n is a traced operand -> one executable serves every iteration count
    looped = jax.jit(loop)

    if warmup:
        _hard_sync(looped(1, args))

    # measure round-trip + loop overhead with a 1-iteration run
    t0 = time.perf_counter()
    _hard_sync(looped(1, args))
    t_one = time.perf_counter() - t0

    t0 = time.perf_counter()
    _hard_sync(looped(iters + 1, args))
    t_many = time.perf_counter() - t0

    return max(t_many - t_one, 1e-9) / iters


def throughput(fn: Callable, args: Tuple, batch_size: int,
               iters: int = 20) -> float:
    """Images/sec of a batched callable."""
    return batch_size / device_time(fn, args, iters=iters)
