"""High-level recognition API: checkpoint package -> transcripts.

The serving-facing surface: load a trained package once, then
``recognize(path_or_samples)`` runs frontend -> model -> decode fully
batched.  Feature extraction runs on device via the waveform frontend
(frontend/e2e.py) with the training-time CMVN stats; decoding is greedy or
LM-fused beam.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Union

import numpy as np

from ctc_pytorch_tpu.config import Config
from ctc_pytorch_tpu.frontend.e2e import WaveFrontendSpec, waveform_frontend
from ctc_pytorch_tpu.frontend.features import FrontendConfig
from ctc_pytorch_tpu.vocab import Vocab

AudioInput = Union[str, Path, np.ndarray]


class Recognizer:
    def __init__(
        self,
        package_path: str | Path,
        vocab: Vocab,
        *,
        frontend: Optional[WaveFrontendSpec] = None,
        cmvn: Optional[tuple] = None,
        decode_type: str = "Greedy",
        beam_width: int = 10,
        lm_path: Optional[str] = None,
        lm_alpha: float = 0.1,
    ):
        import jax

        from ctc_pytorch_tpu.decode import BeamDecoder, GreedyDecoder
        from ctc_pytorch_tpu.models import CTCModel
        from ctc_pytorch_tpu.train.checkpoint import model_from_package

        self.vocab = vocab
        self.spec, self.params, self.mstate, self.manifest = (
            model_from_package(package_path)
        )
        self.frontend = frontend or WaveFrontendSpec()
        self.cmvn = cmvn
        if decode_type == "Greedy":
            self.decoder = GreedyDecoder(vocab.index2word)
        else:
            self.decoder = BeamDecoder(
                vocab.index2word, beam_width=beam_width, lm_path=lm_path,
                lm_alpha=lm_alpha,
            )

        spec = self.spec

        def _forward(params, mstate, wavs, wav_lengths):
            feats, frac, _ = waveform_frontend(
                self.frontend, wavs, wav_lengths, self.cmvn
            )
            log_probs, _ = CTCModel.apply(spec, params, mstate, feats)
            t_out = log_probs.shape[0]
            return log_probs, (frac * t_out).astype("int32")

        self._forward = jax.jit(_forward)

    def _load(self, item: AudioInput) -> np.ndarray:
        if isinstance(item, (str, Path)):
            from ctc_pytorch_tpu.data.prep.sphere import read_audio

            return read_audio(item)
        return np.asarray(item, np.float32)

    def recognize(self, audio: Union[AudioInput, Sequence[AudioInput]],
                  pad_multiple: int = 16000) -> List[str]:
        """One utterance or a batch; returns decoded unit strings."""
        items = (
            [audio] if isinstance(audio, (str, Path, np.ndarray)) else
            list(audio)
        )
        wavs = [self._load(i) for i in items]
        lengths = np.asarray([len(w) for w in wavs], np.int32)
        s_max = ((int(lengths.max()) + pad_multiple - 1) // pad_multiple
                 ) * pad_multiple
        batch = np.zeros((len(wavs), s_max), np.float32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
        import jax.numpy as jnp

        log_probs, sizes = self._forward(
            self.params, self.mstate, jnp.asarray(batch), jnp.asarray(lengths)
        )
        out = self.decoder.decode(np.asarray(log_probs), np.asarray(sizes))
        return [s.strip() for s in out]
