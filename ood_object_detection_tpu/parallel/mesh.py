"""Device mesh + sharding helpers (SPMD data-parallel core).

TPU-native replacement for the reference's torch.distributed layer
(effdet/distributed.py): instead of NCCL process groups and pickled-object
gathers, training shards the batch over a ``jax.sharding.Mesh`` axis and XLA
inserts the gradient psums over ICI; host-side metric merges use
fixed-shape device all-gathers (the [B, max_det, 6] detection layout).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(mesh_shape: Sequence[int] = (-1,),
                axis_names: Sequence[str] = ("data",),
                devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh; -1 in mesh_shape absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    known = int(np.prod([s for s in shape if s != -1])) or 1
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch pytree with its leading dim sharded over ``axis``.

    Multi-host: each process holds only ITS loader shard (the per-process
    sharded PrefetchLoader, reference DistributedSampler split
    loader.py:207-214), so the local arrays are assembled into one global
    jax.Array whose leading dim is the global batch — device_put would
    wrongly treat the local shard as the global value."""
    sharding = data_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def all_gather_detections(detections, axis: str = "data"):
    """Inside-pjit merge of fixed-shape per-shard detections.

    Equivalent of reference all_gather_container for eval
    (effdet/distributed.py:255-283) — but as an XLA collective over ICI on
    the fixed [B_local, max_det, 6] layout.
    """
    return jax.lax.all_gather(detections, axis, axis=0, tiled=True)


def local_shard(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global jax.Array, in batch
    order (multi-host: pulls only the addressable shards — np.asarray on
    a non-fully-addressable array would raise)."""
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def process_merge(tree):
    """Host-side merge across processes (multi-host): reference's pickled
    Gloo gathers (distributed.py:139-209) become a fixed-shape
    process_allgather."""
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree)


def reduce_dict(metrics: dict, axis: str = "data", average: bool = True):
    """Inside-pjit metric reduction across the mesh (reference reduce_dict,
    effdet/distributed.py:225-252 — NCCL reduce becomes a psum)."""
    import jax
    out = {}
    for k, v in metrics.items():
        s = jax.lax.psum(v, axis)
        if average:
            s = s / jax.lax.psum(1.0, axis)
        out[k] = s
    return out


def shared_random_seed(base_key=None):
    """A PRNG key identical on every process (reference shared_random_seed,
    distributed.py:212-222: rank-0 broadcast of a seed)."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils
    if base_key is None:
        base_key = jax.random.key(np.random.SeedSequence().entropy % (2**31))
    # typed PRNG keys can't cross the host-broadcast boundary; ship raw bits
    data = multihost_utils.broadcast_one_to_all(jax.random.key_data(base_key))
    return jax.random.wrap_key_data(data)


def is_main_process() -> bool:
    """Rank-0 check (reference is_main_process, distributed.py:58-64)."""
    import jax
    return jax.process_index() == 0
