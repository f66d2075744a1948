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
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis —
        params are replicated across it and each ``recognize`` batch is
        sharded over the axis, so frontend + model run SPMD on all chips
        (the per-utterance pipeline needs no collectives)."""
        import jax

        from ctc_pytorch_tpu.decode import BeamDecoder, GreedyDecoder
        from ctc_pytorch_tpu.models import CTCModel
        from ctc_pytorch_tpu.train.checkpoint import model_from_package

        self.vocab = vocab
        self.spec, self.params, self.mstate, self.manifest = (
            model_from_package(package_path)
        )
        self.mesh = mesh
        if mesh is not None:
            from ctc_pytorch_tpu.parallel.mesh import replicate

            self.params = replicate(self.params, mesh)
            self.mstate = replicate(self.mstate, mesh)
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
            log_probs, _ = CTCModel.apply(spec, params, mstate, feats,
                                          frac=frac)
            t_out = log_probs.shape[0]
            return log_probs, CTCModel.input_sizes(
                spec, frac, feats.shape[1], t_out
            )

        if mesh is None:
            self._forward = jax.jit(_forward)
        else:
            # per-shard full pipeline via shard_map (same rationale as the
            # train step: GSPMD cannot partition Pallas custom calls
            # through a jit boundary); frontend + eval-mode BN need no
            # cross-shard collectives
            from jax.sharding import PartitionSpec as P

            from ctc_pytorch_tpu.parallel.mesh import shard_map_compat

            repl, data = P(), P("data")
            self._forward = jax.jit(shard_map_compat(
                _forward, mesh,
                in_specs=(repl, repl, data, data),
                # log_probs is time-major (T, B, C): batch is axis 1
                out_specs=(P(None, "data"), data),
            ))

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
        b = len(wavs)
        lengths = np.asarray([len(w) for w in wavs], np.int32)
        s_max = ((int(lengths.max()) + pad_multiple - 1) // pad_multiple
                 ) * pad_multiple
        batch = np.zeros((b, s_max), np.float32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
        import jax
        import jax.numpy as jnp

        batch, lengths = jnp.asarray(batch), jnp.asarray(lengths)
        if self.mesh is not None:
            from ctc_pytorch_tpu.parallel.mesh import (
                batch_sharding, pad_batch_to_devices,
            )

            bp = pad_batch_to_devices(b, self.mesh.devices.size)
            if bp != b:
                # repeat row 0 so padded rows stay numerically well-formed;
                # their outputs are sliced away below
                batch = jnp.concatenate(
                    [batch, jnp.broadcast_to(batch[:1], (bp - b, s_max))])
                lengths = jnp.concatenate(
                    [lengths, jnp.broadcast_to(lengths[:1], (bp - b,))])
            sh = batch_sharding(self.mesh)
            batch = jax.device_put(batch, sh)
            lengths = jax.device_put(lengths, sh)
        log_probs, sizes = self._forward(
            self.params, self.mstate, batch, lengths
        )
        log_probs, sizes = np.asarray(log_probs)[:, :b], np.asarray(sizes)[:b]
        out = self.decoder.decode(log_probs, sizes)
        return [s.strip() for s in out]


class StreamingRecognizer:
    """Chunked/online decoding over a (bidirectional) Recognizer.

    The reference model family is bidirectional (``rnn_type nn.LSTM,
    bidirectional True`` — ``timit/conf/ctc_config.yaml:26-27``), so exact
    frame-synchronous streaming is impossible; this implements the standard
    chunk-rescoring pattern instead: audio accumulates in a ring buffer,
    and every ``hop_seconds`` of new audio the model re-decodes the last
    ``window_seconds``.  Tokens whose frames are older than the lookahead
    margin are **committed** (never retracted); the tail stays provisional
    until ``finish()``.

    Buffers are padded to power-of-two sample counts so the jitted forward
    compiles once per bucket, not per feed.
    """

    def __init__(self, recognizer: Recognizer, *, window_seconds: float = 10.0,
                 hop_seconds: float = 0.5, lookahead_seconds: float = 0.4,
                 sample_rate: int = 16000):
        self.rec = recognizer
        self.sr = sample_rate
        self.window = int(window_seconds * sample_rate)
        self.hop = int(hop_seconds * sample_rate)
        self.lookahead = lookahead_seconds
        self._buf = np.zeros(0, np.float32)
        self._buf_start = 0  # absolute sample index of _buf[0]
        self._since_decode = 0
        self._committed: List[str] = []
        # absolute sample position of the last committed token's frame
        # centre; every window's tokens are mapped to absolute positions so
        # commits stay correct after audio slides out of the window
        self._committed_pos = -1.0
        self._provisional: List[str] = []

    def _decode_window(self, final: bool) -> None:
        import jax.numpy as jnp

        wav = (self._buf[-self.window:] if len(self._buf) > self.window
               else self._buf)
        if len(wav) < self.sr // 50:  # <20 ms: nothing decodable yet
            return
        abs0 = self._buf_start + (len(self._buf) - len(wav))
        n = 1 << max(int(np.ceil(np.log2(len(wav)))), 12)
        # under a mesh Recognizer the shard_map'd forward shards the batch
        # over the data axis, so the single stream is replicated to one row
        # per device and row 0's outputs are used
        bp = 1
        if self.rec.mesh is not None:
            from ctc_pytorch_tpu.parallel.mesh import pad_batch_to_devices

            bp = pad_batch_to_devices(1, self.rec.mesh.devices.size)
        batch = np.zeros((bp, n), np.float32)
        batch[:, : len(wav)] = wav
        lengths = np.full((bp,), len(wav), np.int32)
        batch, lengths = jnp.asarray(batch), jnp.asarray(lengths)
        if self.rec.mesh is not None:
            import jax

            from ctc_pytorch_tpu.parallel.mesh import batch_sharding

            sh = batch_sharding(self.rec.mesh)
            batch = jax.device_put(batch, sh)
            lengths = jax.device_put(lengths, sh)
        log_probs, sizes = self.rec._forward(
            self.rec.params, self.rec.mstate, batch, lengths,
        )
        lp = np.asarray(log_probs)
        t_valid = int(np.asarray(sizes)[0])
        hyp_tokens, frame_idx = self._greedy_with_frames(lp[:, 0, :], t_valid)
        spf = len(wav) / max(t_valid, 1)  # samples per output frame
        pos = [abs0 + (fi + 0.5) * spf for fi in frame_idx]
        if final and self._buf_start == 0 and len(self._buf) <= self.window:
            # nothing ever slid out of the window: the fresh hypothesis
            # covers the whole stream and supersedes the running state
            self._committed = hyp_tokens
            self._committed_pos = pos[-1] if pos else -1.0
            self._provisional = []
            return
        # tokens strictly after the committed span; a same-label token
        # within ~1.5 frames of the last commit is a re-detection (frame
        # positions jitter by a frame or so between overlapping decodes)
        fresh = []
        for tok, p in zip(hyp_tokens, pos):
            if p <= self._committed_pos:
                continue
            if (not fresh and self._committed
                    and tok == self._committed[-1]
                    and p - self._committed_pos < 1.5 * spf):
                continue
            fresh.append((tok, p))
        if final:
            self._committed += [t for t, _ in fresh]
            if fresh:
                self._committed_pos = fresh[-1][1]
            self._provisional = []
            return
        # commit tokens older than the lookahead margin (absolute horizon)
        horizon = abs0 + len(wav) - self.lookahead * self.sr
        stable = [(t, p) for t, p in fresh if p < horizon]
        self._committed += [t for t, _ in stable]
        if stable:
            self._committed_pos = stable[-1][1]
        self._provisional = [t for t, _ in fresh[len(stable):]]
        # bound host memory: only the last window is ever decoded again
        if len(self._buf) > self.window:
            cut = len(self._buf) - self.window
            self._buf = self._buf[cut:]
            self._buf_start += cut

    def _greedy_with_frames(self, lp_tc: np.ndarray, t_valid: int):
        """Greedy collapse keeping each emitted token's frame index."""
        ids = np.argmax(lp_tc[:t_valid], axis=-1)
        toks, frames = [], []
        prev = 0
        for i, c in enumerate(ids):
            if c != 0 and c != prev:
                toks.append(self.rec.vocab.index2word.get(int(c), "<UNK>"))
                frames.append(i)
            prev = int(c)
        return toks, frames

    def feed(self, samples: np.ndarray) -> str:
        """Append audio; returns the current hypothesis (committed+tail)."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._since_decode += len(samples)
        if self._since_decode >= self.hop:
            self._since_decode = 0
            self._decode_window(final=False)
        return " ".join(self._committed + self._provisional).strip()

    def finish(self) -> str:
        """Flush: decode everything buffered and return the final text."""
        self._decode_window(final=True)
        out = " ".join(self._committed).strip()
        self._buf = np.zeros(0, np.float32)
        self._buf_start = 0
        self._committed, self._provisional = [], []
        self._committed_pos = -1.0
        self._since_decode = 0
        return out
