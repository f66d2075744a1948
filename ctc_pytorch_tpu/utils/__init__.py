from ctc_pytorch_tpu.utils.misc import (  # noqa: F401
    init_file_logger,
    flatten_targets,
    unflatten_targets,
    seed_all,
)
