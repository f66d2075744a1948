"""Data parallelism over a device mesh — the TPU-native scale-out story.

The reference is strictly single-GPU (SURVEY.md §2.3: no torch.distributed
anywhere); scale-out here is a *TPU-first addition*: a 1-D ``Mesh`` over all
chips with the batch dimension sharded (``NamedSharding(P('data'))``) and
parameters replicated.  Under ``jax.jit`` XLA's SPMD partitioner inserts the
gradient ``psum`` over ICI automatically — the equivalent of the NCCL
all-reduce the reference never had.  The same axis performs the global CMVN
reduction (``frontend.cmvn.accumulate_cmvn(axis_name=...)``) and evaluation
metric sums.

TP/PP/SP/EP are deliberately out of scope: a 4x BiLSTM(384) model is ~15 M
params — far below the threshold where intra-layer sharding pays; DP scales
TIMIT-sized training to a full pod slice (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(arrays: tuple, mesh: Mesh, axis: str = "data"):
    """Place batch-major arrays with the batch axis sharded over the mesh."""
    n_dev = mesh.shape[axis]
    for a in arrays:
        if hasattr(a, "shape") and a.shape and a.shape[0] % n_dev != 0:
            raise ValueError(
                f"batch size {a.shape[0]} must divide the {n_dev}-device "
                f"'{axis}' axis; pick batch_size as a multiple (see "
                "pad_batch_to_devices)"
            )
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def pad_batch_to_devices(n: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= n (batch must divide evenly)."""
    return ((n + n_devices - 1) // n_devices) * n_devices


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """``jax.shard_map`` across jax versions.

    Newer jax exposes ``jax.shard_map(..., check_vma=...)``; the older
    experimental API only accepts ``check_rep``.  Both checks are disabled
    (our steps use explicit psums, not replication inference)."""
    try:
        from jax import shard_map as _sm
        kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        kw = {"check_rep": False}
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)
