"""ctc_pytorch_tpu — a TPU-native (JAX/XLA/Pallas) CTC speech-recognition framework.

A from-scratch rebuild of the capabilities of Diamondfan/CTC_pytorch
(reference layout surveyed in /root/repo/SURVEY.md), designed TPU-first:

- on-device audio frontend (framing / window / rFFT / mel / DCT / deltas / CMVN)
  instead of Kaldi C++ binaries,
- pure-functional CNN + bidirectional LSTM/GRU acoustic models as pytrees under
  ``jax.jit`` (fused Pallas scan kernels on the hot path) instead of cuDNN,
- a log-space alpha-beta CTC loss with a custom VJP instead of
  ``nn.CTCLoss``/warp-ctc,
- batched on-device greedy decoding and a fixed-width CTC prefix beam search
  with a dense bigram-LM table instead of the per-utterance python loop,
- data parallelism via ``jax.sharding.Mesh`` + ``NamedSharding`` (psum over
  ICI/DCN) — the reference is single-GPU only.
"""

__version__ = "0.1.0"

from ctc_pytorch_tpu.config import Config, load_config  # noqa: F401
from ctc_pytorch_tpu.vocab import Vocab  # noqa: F401
