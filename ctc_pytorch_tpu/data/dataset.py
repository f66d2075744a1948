"""Speech dataset: scp/ark features + transcript labels, host-side.

Mirrors ``SpeechDataset`` (``timit/utils/data_loader.py:50-117``): per item
``load_mat`` -> context splice -> frame skip -> zero-pad rows to a multiple of
``n_downsample``; labels come from ``utt unit unit ...`` transcript lines with
OOV -> UNK.  Adds over the reference:

- an optional in-memory feature cache (replacing the 863 recipe's h5py cache,
  ``my_863_corpus/steps/data_loader.py:141-155``) — TIMIT-scale corpora fit
  trivially in host RAM;
- a waveform mode where items return raw samples and feature extraction runs
  on-device in the training step (the "waveform-in end-to-end" configuration;
  the reference's equivalent path is dead code, ``data_loader.py:62-68``);
- deterministic ordering (scp file order) for reproducible bucketing.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ctc_pytorch_tpu.config import Config
from ctc_pytorch_tpu.data import kaldi_io
from ctc_pytorch_tpu.frontend.splice import (
    downsampled_len,
    skipped_len,
)
from ctc_pytorch_tpu.vocab import Vocab


def _splice_numpy(feat: np.ndarray, left: int, right: int) -> np.ndarray:
    """Edge-replicated context splice (tools.py:66-75 semantics), host numpy."""
    if left == 0 and right == 0:
        return feat
    cols = []
    for shift in range(-left, right + 1):
        if shift < 0:
            cols.append(np.vstack([np.repeat(feat[:1], -shift, 0), feat[:shift]]))
        elif shift > 0:
            cols.append(np.vstack([feat[shift:], np.repeat(feat[-1:], shift, 0)]))
        else:
            cols.append(feat)
    return np.hstack(cols)


def read_labels(lab_path: str | Path, vocab: Vocab) -> Dict[str, List[int]]:
    """``utt unit unit ...`` lines -> id lists (OOV -> UNK)."""
    labels = {}
    for line in Path(lab_path).read_text().splitlines():
        parts = line.strip().split(" ", 1)
        if not parts or not parts[0]:
            continue
        utt = parts[0]
        labels[utt] = vocab.encode(parts[1]) if len(parts) > 1 else []
    return labels


class SpeechDataset:
    def __init__(
        self,
        vocab: Vocab,
        scp_path: str | Path,
        lab_path: str | Path,
        opts: Config,
        cache: bool = True,
    ):
        self.vocab = vocab
        self.opts = opts
        self.left_ctx = opts.left_ctx
        self.right_ctx = opts.right_ctx
        self.n_skip_frame = opts.n_skip_frame
        self.n_downsample = opts.n_downsample
        self.feature_type = opts.feature_type

        self.scp = kaldi_io.read_scp(scp_path)
        label_dict = read_labels(lab_path, vocab)
        missing = [u for u, _ in self.scp if u not in label_dict]
        if missing:
            raise ValueError(f"{len(missing)} utts missing labels, e.g. {missing[:3]}")
        self.items: List[Tuple[str, str, List[int]]] = [
            (utt, rx, label_dict[utt]) for utt, rx in self.scp
        ]
        self._cache: Optional[list] = [None] * len(self.items) if cache else None
        self._lengths: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.items)

    def raw_feature(self, idx: int) -> np.ndarray:
        utt, rx, _ = self.items[idx]
        if self.feature_type == "waveform":
            from ctc_pytorch_tpu.data.prep.sphere import read_audio

            return read_audio(rx)
        return kaldi_io.load_mat(rx)

    def process_feature(self, feat: np.ndarray) -> np.ndarray:
        """splice -> skip -> pad-to-downsample (data_loader.py:104-110)."""
        feat = _splice_numpy(feat, self.left_ctx, self.right_ctx)
        if self.n_skip_frame > 1:
            feat = feat[:: self.n_skip_frame]
        if self.n_downsample > 1:
            rem = feat.shape[0] % self.n_downsample
            if rem:
                feat = np.vstack(
                    [feat, np.zeros((self.n_downsample - rem, feat.shape[1]), feat.dtype)]
                )
        return feat.astype(np.float32)

    def _native_processed(self, rx: str):
        """read+splice+skip+pad in one native pass (ark_native.cpp); None
        when unavailable or the entry isn't an uncompressed BFM matrix."""
        if self.feature_type == "waveform" or getattr(self.opts, "mel", False):
            return None
        from ctc_pytorch_tpu import native

        return native.ark_load_processed_native(
            rx, self.left_ctx, self.right_ctx, self.n_skip_frame,
            self.n_downsample,
        )

    def preload(self, workers: int = 4) -> None:
        """Fill the cache with `workers` threads (the reference's
        ``num_workers`` DataLoader knob, ``timit/utils/data_loader.py:148``).
        The native loader releases the GIL, so threads parallelise for real;
        without it this still overlaps file IO."""
        if self._cache is None:
            return
        from concurrent.futures import ThreadPoolExecutor

        todo = [i for i in range(len(self)) if self._cache[i] is None]
        if not todo:
            return
        with ThreadPoolExecutor(max_workers=max(workers, 1)) as pool:
            list(pool.map(self.__getitem__, todo))

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, str]:
        if self._cache is not None and self._cache[idx] is not None:
            return self._cache[idx]
        utt, rx, label = self.items[idx]
        if self.feature_type == "waveform":
            # raw samples as (S, 1) so batching pads them like features;
            # splice/skip happen on-device inside the fused frontend
            feat = self.raw_feature(idx).reshape(-1, 1).astype(np.float32)
            out = (feat, np.asarray(label, np.int32), utt)
            if self._cache is not None:
                self._cache[idx] = out
            return out
        feat = self._native_processed(rx)
        if feat is None:
            feat = self.process_feature(self.raw_feature(idx))
        if getattr(self.opts, "mel", False):
            # F_Mel warping of the processed log spectrum (data_loader.py:111)
            from ctc_pytorch_tpu.frontend.fmel import f_mel

            feat = np.asarray(f_mel(feat))
        out = (feat, np.asarray(label, np.int32), utt)
        if self._cache is not None:
            self._cache[idx] = out
        return out

    def _raw_rows(self, idx: int) -> int:
        """Raw row/sample count of one item from the file HEADER when the
        format allows (BFM/BDM/CM ark matrices, SPHERE/WAV) — a length scan
        then costs a few bytes per item instead of decoding the corpus
        twice (once for bucketing, once for preload)."""
        _, rx, _ = self.items[idx]
        if self.feature_type == "waveform":
            from ctc_pytorch_tpu.data.prep.sphere import audio_num_samples

            n = audio_num_samples(rx)
            if n is not None:
                return n
        else:
            rows = kaldi_io.mat_rows(rx)
            if rows is not None:
                return rows
        return self.raw_feature(idx).shape[0]

    def lengths(self) -> np.ndarray:
        """Processed frame count per item (cheap: header peek, no payload)."""
        if self._lengths is None:
            lens = []
            for i in range(len(self.items)):
                if self._cache is not None and self._cache[i] is not None:
                    lens.append(self._cache[i][0].shape[0])
                else:
                    t = self._raw_rows(i)
                    if self.feature_type != "waveform":
                        # sample counts stay raw; frame transforms happen
                        # on-device for the waveform path
                        t = skipped_len(t, self.n_skip_frame)
                        t = downsampled_len(t, self.n_downsample)
                    lens.append(t)
            self._lengths = np.asarray(lens)
        return self._lengths

    def label_lengths(self) -> np.ndarray:
        return np.asarray([len(it[2]) for it in self.items])
