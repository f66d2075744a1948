"""Feature-format converters and on-disk caching.

Covers the 863 recipe's ingestion paths without h5py:

- text-format Kaldi feature dumps (``process_kaldi_feat``,
  ``my_863_corpus/steps/utils.py:75-97``) -> binary ark+scp, so the standard
  dataset path applies;
- an npz disk cache per dataset (the h5py ``train.h5py`` replacement,
  ``my_863_corpus/steps/data_loader.py:126-155``): first pass materialises
  processed features once, later runs memory-map straight from disk.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ctc_pytorch_tpu.data.kaldi_io import ArkWriter, read_text_ark


def text_ark_to_binary(
    text_path: str | Path,
    ark_out: str | Path,
    scp_out: str | Path,
    feat_size: Optional[int] = None,
) -> int:
    """Convert a text feature dump to binary ark+scp; returns utt count."""
    feats = read_text_ark(text_path, feat_size)
    with ArkWriter(ark_out, scp_out) as w:
        for utt, mat in feats.items():
            w.write(utt, mat)
    return len(feats)


def cache_dataset(dataset, cache_path: str | Path) -> Path:
    """Materialise every processed item of a SpeechDataset into one npz."""
    cache_path = Path(cache_path)
    arrays: Dict[str, np.ndarray] = {}
    utts = []
    for i in range(len(dataset)):
        feat, label, utt = dataset[i]
        arrays[f"f{i}"] = feat
        arrays[f"l{i}"] = label
        utts.append(utt)
    np.savez(cache_path, utts=np.array(utts), n=np.array(len(utts)), **arrays)
    return cache_path


class CachedDataset:
    """Dataset view over a cache npz (mmap); same item contract as
    SpeechDataset: (feat, label, utt)."""

    def __init__(self, cache_path: str | Path):
        self._z = np.load(Path(cache_path), mmap_mode="r")
        self._n = int(self._z["n"])
        self._utts = [str(u) for u in self._z["utts"]]
        self._lengths = None

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, idx: int):
        return (
            np.asarray(self._z[f"f{idx}"]),
            np.asarray(self._z[f"l{idx}"]),
            self._utts[idx],
        )

    def lengths(self) -> np.ndarray:
        if self._lengths is None:
            self._lengths = np.asarray(
                [self._z[f"f{i}"].shape[0] for i in range(self._n)]
            )
        return self._lengths

    def label_lengths(self) -> np.ndarray:
        return np.asarray(
            [self._z[f"l{i}"].shape[0] for i in range(self._n)]
        )
