from ctc_pytorch_tpu.ops.ctc_loss import ctc_loss, ctc_forward_score  # noqa: F401
from ctc_pytorch_tpu.ops.editdistance import edit_distance, batch_edit_distance  # noqa: F401
from ctc_pytorch_tpu.ops.ctc_pallas import ctc_loss_pallas  # noqa: F401
from ctc_pytorch_tpu.ops.lstm_pallas import lstm_bidir_pallas  # noqa: F401
from ctc_pytorch_tpu.ops.lstm_pallas_train import lstm_bidir_train  # noqa: F401
