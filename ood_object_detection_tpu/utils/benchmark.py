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

    fn must be jit-compatible and return a pytree of arrays. Iterations
    are chained through a carry perturbation on the first float leaf of
    EVERY top-level argument, so no argument is loop-invariant and no
    stage of fn can be hoisted out of the timing loop (1e-30*x is
    exact-0 in the f32 sum but opaque to the compiler).

    Perturbing only ONE leaf is not enough: XLA's while-loop invariant
    code motion hoists any stage that depends solely on unperturbed
    arguments — e.g. with constant episode images and perturbed params,
    the whole frozen feature-extraction ran ONCE outside the loop and
    the MAML episode step measured 3.6x faster than its true cost
    (14.6 ms vs the traced 53 ms).
    """
    def loop(n, args):
        def body(i, carry):
            perturbed = []
            for arg in args:
                leaves, treedef = jax.tree.flatten(arg)
                any_float = False
                for j, l in enumerate(leaves):
                    if hasattr(l, "dtype") and \
                            jnp.issubdtype(l.dtype, jnp.floating):
                        # exact-0 add in the f32 sum; fuses into each
                        # consumer's read (no extra HBM traffic)
                        leaves[j] = l + (carry * 1e-30).astype(l.dtype)
                        any_float = True
                if not any_float:
                    for j, l in enumerate(leaves):
                        if hasattr(l, "dtype") and \
                                jnp.issubdtype(l.dtype, jnp.integer):
                            # (carry*1e-30) truncates to exactly 0, but
                            # the cast of a runtime value is opaque to
                            # LICM — uint8 image batches chain too
                            leaves[j] = l + (carry * 1e-30).astype(l.dtype)
                perturbed.append(jax.tree.unflatten(treedef, leaves))
            out = fn(*perturbed)
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
