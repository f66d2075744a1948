from ctc_pytorch_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    pad_batch_to_devices,
)
