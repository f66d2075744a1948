"""Multi-host helpers (single-process semantics + host sharding math)."""

import numpy as np

import jax

from ctc_pytorch_tpu.parallel import make_mesh
from ctc_pytorch_tpu.parallel.distributed import (
    initialize,
    make_global_batch,
    shard_for_host,
)


def test_initialize_noop_single_process():
    initialize()  # must not raise in single-process mode
    initialize(num_processes=1)


def test_shard_for_host_balanced_roundrobin():
    items = list(range(103))
    shards = [shard_for_host(items, pid, 4) for pid in range(4)]
    assert sorted(sum(shards, [])) == items
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    # round-robin: consecutive (length-sorted) items spread across hosts
    assert shards[0][:3] == [0, 4, 8]


def test_make_global_batch_single_host():
    mesh = make_mesh()
    arrays = (np.arange(16, dtype=np.float32).reshape(8, 2),)
    (out,) = make_global_batch(arrays, mesh)
    assert out.shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(out), arrays[0])
    # sharded over the 8 virtual devices
    assert len(out.sharding.device_set) == 8
