"""Device mesh + data-parallel sharding helpers.

TPU-native replacement for the reference's torch.distributed/NCCL stack
(`/root/reference/yolox/utils/dist.py`, `yolox/core/launch.py`): no process
spawning per device — JAX runs one process per host, the mesh spans all
devices, and collectives are expressed in-program (`lax.pmean` inside
shard_map). DCN multi-host works through `jax.distributed.initialize` with
the same code path.

Equivalences (SURVEY.md §2.9):
  - DDP gradient allreduce      -> lax.pmean over the 'data' mesh axis
  - InfiniteSampler rank stride -> per-process batch sharding (data/sampler)
  - BN stat allreduce_norm      -> lax.pmean on BN stat updates every step
    (mathematically identical to the reference's pre-eval allreduce: the
    EMA update is linear in the per-step batch stats)
  - rank 0                      -> jax.process_index() == 0
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def data_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over local (or all) devices for data parallelism."""
    devices = np.array(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devices, (DATA_AXIS,))


def serving_mesh(n_data: int, n_space: int = 1) -> Mesh:
    """2-D (data, space) mesh for sharded serving.

    `space` shards the image-height axis: every conv runs as a local conv
    over its row slab with XLA-inserted halo exchanges at slab borders
    (GSPMD spatial partitioning) — this scales *batch-1 latency* across
    chips, which pure data parallelism cannot, and has no reference
    analog (torch DDP is data-parallel only)."""
    devices = np.array(
        jax.devices()[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(devices, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC input sharding: batch over 'data', H over 'space' (if the
    mesh has one). Convs partition spatially via GSPMD halo exchange."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays onto the mesh, sharded along the batch axis."""
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree onto every device of the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def put_process_local(arr, sharding: NamedSharding):
    """Place this process's slice of a batch onto a batch sharding.

    Single process: a plain async `jax.device_put`. Multi-process (the
    mesh spans non-addressable devices): `arr` is this host's shard of
    the global batch — the loader yields per-host batches
    (`config.get_data_loader` divides by `process_count()`), so the
    global array is assembled from the per-process slices. Reference
    analog: DDP's implicit per-rank batch
    (`/root/reference/yolox/core/launch.py:99-145`)."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(arr))


def all_gather_objects(obj):
    """Gather a picklable object from every process; returns a list ordered
    by process index. Host-level analog of the reference's gloo-based
    object gather (`yolox/utils/dist.py:193-272`)."""
    import pickle

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    lengths = multihost_utils.process_allgather(
        np.array([payload.size], np.int64))
    max_len = int(np.max(lengths))
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(lengths[i, 0])].tobytes())
        for i in range(gathered.shape[0])
    ]
