"""Multi-host initialisation and per-host input sharding.

The TPU-native equivalent of the distributed backend the reference never
had (SURVEY.md §5 "Distributed communication backend"): ``jax.distributed``
brings up the cross-host runtime (DCN), after which the 1-D data mesh spans
every chip of the slice and the gradient psum rides ICI within hosts and
DCN across them automatically.

Input pipeline: each host reads only its shard of the scp list
(``shard_for_host``), so no host touches more than 1/num_hosts of the
corpus; ``global_batch_slice`` maps a per-host batch into the right rows of
the global sharded batch via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed.

    With all arguments None this calls ``jax.distributed.initialize()``
    bare, letting JAX auto-detect the pod topology from the environment —
    the standard multi-host TPU bring-up.  (Silently skipping that case
    would leave each host of a pod training an independent model:
    process_count stays 1 everywhere and no error ever surfaces.)  When no
    cluster environment is detectable (single-process dev runs) this is a
    logged no-op.  Pass ``num_processes=1`` for an explicit no-op."""
    if num_processes == 1:
        return
    if (coordinator_address is None and num_processes is None
            and process_id is None):
        import logging

        try:
            jax.distributed.initialize()  # env auto-detection
        except (ValueError, RuntimeError) as exc:
            logging.getLogger(__name__).info(
                "jax.distributed auto-detection found no cluster "
                "environment (%s); continuing single-process", exc,
            )
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_for_host(
    items: Sequence, process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> list:
    """Deterministic per-host shard of a (scp) list: round-robin by index,
    so shards stay balanced even with length-sorted input lists."""
    pid = jax.process_index() if process_index is None else process_index
    pcount = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pcount == pid]


def make_global_batch(local_arrays: tuple, mesh, axis: str = "data"):
    """Assemble a globally-sharded batch from per-host local arrays."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in local_arrays
    )
