from ctc_pytorch_tpu.ops.ctc_loss import ctc_loss, ctc_forward_score  # noqa: F401
from ctc_pytorch_tpu.ops.editdistance import edit_distance, batch_edit_distance  # noqa: F401
