from ctc_pytorch_tpu.models.ctc_model import CTCModel  # noqa: F401
