"""Pallas TPU kernel: fused per-anchor class reductions over head logits.

NEGATIVE RESULT — kept as a parity-tested alternative, NOT wired into
ops.post_process. The XLA path (_packed_f32_key_reduce) originally cost
three passes over the logits (the shared f32 convert had two reduce
consumers, so XLA materialized the [B,H,W,A,C] f32 view to HBM); after
its i32-key rewrite each reduce fuses straight against the bf16 logits
and energy rides the same pass for free. Measured on the v5e chip at
D0@512 bs=128 (serialized fori_loop timing, 30 iters):

    xla  keys-only  11.5 ms      xla  +energy  11.5 ms
    pallas keys     25.8 ms      pallas +energy 30.2 ms

This kernel is 2.2-2.6x slower: the per-anchor Python loop issues A=9
sequential 90-lane slices per row block, underfilling the 128-lane VPU,
while XLA reduces the whole [*, A, C] view in one tiled fusion. A
lane-aligned variant would need C padded to 128 (1.4x more HBM read —
worse than the thing it replaces).

This kernel does everything in ONE pass: each grid step streams a row
block of the level's [rows, A*C] bf16 logits into VMEM and emits the
[rows, A] f32 packed key and (optionally) the [rows, A] f32 energy.

Key packing must bit-match ops.post_process._packed_f32_key_reduce:
key = mono16(bf16 bits) * 256 + (255 - class), exactly representable in
f32 (24-bit value), decoded by _unpack_f32_key. Energy matches
ops.ood.energy_score (f32 logsumexp over the class axis) to f32
round-off of the summation order.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reduce_kernel(x_ref, key_ref, ood_ref, *, num_anchors: int,
                   num_classes: int, energy: bool):
    # Mosaic cannot reshape [R, A*C] -> [R, A, C] in registers (C=90 is
    # not lane-aligned), so loop over the A anchor slots with static lane
    # slices instead; the VPU work hides under the next block's DMA.
    x = x_ref[:]                                      # [R, A*C] bf16
    keys, oods = [], []
    for a in range(num_anchors):
        xa = jax.lax.slice_in_dim(
            x, a * num_classes, (a + 1) * num_classes, axis=1)  # [R, C]
        # i32 arithmetic: Mosaic has no u32->f32 cast; every value here
        # fits in 24 bits so signed ops are exact and bit-match the u32
        # XLA path in ops.post_process.
        bits = jax.lax.bitcast_convert_type(xa, jnp.uint16).astype(jnp.int32)
        mono = jnp.where(bits >= 0x8000, 0xFFFF - bits, bits | 0x8000)
        cls_ids = jax.lax.broadcasted_iota(jnp.int32, xa.shape, 1)
        key = mono * 256 + (255 - cls_ids)
        keys.append(jnp.max(key, axis=-1, keepdims=True))       # [R, 1]
        if energy:
            f = xa.astype(jnp.float32)
            m = jnp.max(f, axis=-1, keepdims=True)
            oods.append(jnp.log(
                jnp.sum(jnp.exp(f - m), axis=-1, keepdims=True)) + m)
    key_ref[:] = jnp.concatenate(keys, axis=-1).astype(jnp.float32)
    if energy:
        ood_ref[:] = jnp.concatenate(oods, axis=-1)


def _pick_rows(total_rows: int, max_rows: int = 512) -> int:
    """Largest row-block <= max_rows that divides total_rows."""
    r = min(total_rows, max_rows)
    while total_rows % r:
        r -= 1
    return r


@functools.partial(jax.jit, static_argnames=("num_classes", "energy",
                                             "interpret"))
def _level_reduce(lvl: jnp.ndarray, num_classes: int, energy: bool,
                  interpret: bool = False):
    """[B, H, W, A*C] bf16 -> (key [B, H*W*A] f32, ood [B, H*W*A] f32|None).

    Anchor order matches the XLA path: row-major cells, then the A
    per-cell anchors (the reshape(b, -1) of a [B, H, W, A] reduce).
    """
    b, h, w, ac = lvl.shape
    num_anchors = ac // num_classes
    rows = b * h * w
    x = lvl.reshape(rows, ac)
    r_blk = _pick_rows(rows)
    grid = (rows // r_blk,)

    kernel = functools.partial(
        _reduce_kernel, num_anchors=num_anchors, num_classes=num_classes,
        energy=energy)
    out_shapes = (
        jax.ShapeDtypeStruct((rows, num_anchors), jnp.float32),
        jax.ShapeDtypeStruct((rows, num_anchors) if energy else (1, 1),
                             jnp.float32),
    )
    out_spec = pl.BlockSpec((r_blk, num_anchors), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dummy_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    key, ood = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec((r_blk, ac), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec if energy else dummy_spec),
        interpret=interpret,
    )(x)
    key = key.reshape(b, h * w * num_anchors)
    return key, (ood.reshape(b, h * w * num_anchors) if energy else None)


def fused_key_ood_reduce(
        cls_outputs: List[jnp.ndarray],
        num_classes: int,
        ood_method: Optional[str] = None,
        interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-level fused (packed key, energy) reduction, concatenated over
    levels -> (key_all [B, A_tot] f32, ood_all [B, A_tot] f32 | None).

    Drop-in for ops.post_process._packed_f32_key_reduce on TPU backends
    (bf16 logits, num_classes <= 256). ``ood_method`` other than
    'energy' returns ood_all=None — max_logit/msp are derived from the
    key by the caller, so only energy needs the extra reduce.
    """
    assert num_classes <= 256
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    energy = ood_method == "energy"
    keys, oods = [], []
    for lvl in cls_outputs:
        if lvl.dtype != jnp.bfloat16:
            lvl = lvl.astype(jnp.bfloat16)
        k, o = _level_reduce(lvl, num_classes, energy, interpret=interpret)
        keys.append(k)
        if energy:
            oods.append(o)
    key_all = jnp.concatenate(keys, axis=1)
    ood_all = jnp.concatenate(oods, axis=1) if energy else None
    return key_all, ood_all
