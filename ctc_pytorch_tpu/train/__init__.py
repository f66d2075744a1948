from ctc_pytorch_tpu.train.state import TrainState, create_train_state  # noqa: F401
from ctc_pytorch_tpu.train.scheduler import PlateauScheduler  # noqa: F401
from ctc_pytorch_tpu.train.checkpoint import (  # noqa: F401
    save_package,
    load_package,
    model_from_package,
)
from ctc_pytorch_tpu.train.loop import (  # noqa: F401
    Trainer,
    make_fused_fns,
    run_epoch,
    run_epoch_fused,
)
