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

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Some images preload jax._src at interpreter startup, which captures
    # JAX_PLATFORMS before user env handling — the variable then silently
    # does nothing and "CPU-only" subprocesses (e.g. the parity harness
    # with --cpu) end up queueing on the TPU.  Re-assert the requested
    # platform via config, which works as long as no backend is
    # initialised yet.
    try:
        import jax as _jax

        # Only act when the captured config DISAGREES with the env: the
        # preloaded-jax capture holds the launch-time value, so a changed
        # env var is being ignored.  When they agree (e.g. dryrun_multichip
        # already forced cpu and the driver env says cpu) this is a no-op.
        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - backend already initialised
        pass

from ctc_pytorch_tpu.config import Config, load_config  # noqa: F401
from ctc_pytorch_tpu.vocab import Vocab  # noqa: F401
