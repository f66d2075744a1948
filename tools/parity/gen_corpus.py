"""Synthetic phone-structured feature corpus for the reference-parity run.

Writes exactly the on-disk artifacts stage 1 of the pipeline would leave
behind (``data/<split>/{fbank.scp,fbank.ark,phn_text}`` + ``data/units``),
shared bit-for-bit by the reference (via the kaldiio shim) and by this
framework.  Each phone is a fixed prototype trajectory in feature space;
utterances concatenate per-phone segments with speaker offsets and AR
noise, so the task is learnable but non-trivial.

Per VERDICT round-1 item 1: >=40 phones, >=500 train utterances,
realistic lengths (~50-200 frames).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ctc_pytorch_tpu.data.kaldi_io import ArkWriter
from ctc_pytorch_tpu.data.prep.phones import PHONE_MAP_60_48_39


def phone_names(n: int) -> list:
    """First n of the TIMIT 48-phone inventory (sorted), >=40 available."""
    p48 = sorted({p48 for p48, _ in PHONE_MAP_60_48_39.values() if p48})
    if n <= len(p48):
        return p48[:n]
    return p48 + [f"zz{i}" for i in range(n - len(p48))]


def generate(
    root: str | Path,
    *,
    n_train: int = 600,
    n_dev: int = 100,
    n_test: int = 100,
    n_phones: int = 40,
    dim: int = 40,
    min_phones: int = 8,
    max_phones: int = 25,
    min_dur: int = 3,
    max_dur: int = 9,
    noise: float = 0.35,
    confusable: float = 0.0,
    seed: int = 0,
    unit_names: list | None = None,
    feat_name: str = "fbank",
    text_name: str = "phn_text",
) -> dict:
    """``unit_names``/``feat_name``/``text_name`` let the 863 soak reuse this
    generator with Mandarin-syllable units and the ``spectrum.scp``/``text``
    on-disk layout (my_863_corpus/conf/cnn_lstm_ctc_setting.conf)."""
    root = Path(root)
    rng = np.random.RandomState(seed)
    phones = unit_names if unit_names is not None else phone_names(n_phones)
    n_phones = len(phones)
    # per-phone prototype trajectory: start + drift, unit-scale features
    proto_a = rng.randn(n_phones, dim).astype(np.float32)
    proto_b = rng.randn(n_phones, dim).astype(np.float32) * 0.5
    if confusable > 0.0:
        # "hard" regime (VERDICT r2 item 3): phones come in near-identical
        # pairs — odd prototypes are a small perturbation of the preceding
        # even one, so the task stops being linearly separable and both
        # frameworks land at a realistic (15-30%) PER where the plateau
        # scheduler's band/decay/rollback logic actually trips
        for i in range(1, n_phones, 2):
            proto_a[i] = proto_a[i - 1] + confusable * rng.randn(
                dim).astype(np.float32)
            proto_b[i] = proto_b[i - 1] + confusable * 0.5 * rng.randn(
                dim).astype(np.float32)

    # simple bigram structure so the LM has something to learn
    trans = rng.dirichlet(np.full(n_phones, 0.5), size=n_phones)

    counts = {}
    for split, n_utt in (("train", n_train), ("dev", n_dev), ("test", n_test)):
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        lab_lines = []
        with ArkWriter(d / f"{feat_name}.ark", d / f"{feat_name}.scp") as w:
            for u in range(n_utt):
                utt = f"{split}{u:05d}"
                spk_off = rng.randn(dim).astype(np.float32) * 0.15
                n_ph = rng.randint(min_phones, max_phones + 1)
                seq = [rng.randint(n_phones)]
                for _ in range(n_ph - 1):
                    seq.append(rng.choice(n_phones, p=trans[seq[-1]]))
                frames = []
                for ph in seq:
                    dur = rng.randint(min_dur, max_dur + 1)
                    t = np.linspace(0.0, 1.0, dur, dtype=np.float32)[:, None]
                    seg = proto_a[ph][None, :] + t * proto_b[ph][None, :]
                    frames.append(seg)
                feat = np.concatenate(frames, 0) + spk_off[None, :]
                # AR(1) noise: temporally-correlated like real residuals
                e = rng.randn(feat.shape[0], dim).astype(np.float32) * noise
                for t_i in range(1, e.shape[0]):
                    e[t_i] += 0.5 * e[t_i - 1]
                feat = (feat + e).astype(np.float32)
                w.write(utt, feat)
                lab_lines.append(utt + " " + " ".join(phones[p] for p in seq))
        (d / text_name).write_text("\n".join(lab_lines) + "\n")
        counts[split] = n_utt
    (root / "units").write_text("\n".join(sorted(phones)) + "\n")
    return counts


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--n-train", type=int, default=600)
    ap.add_argument("--n-dev", type=int, default=100)
    ap.add_argument("--n-test", type=int, default=100)
    ap.add_argument("--n-phones", type=int, default=40)
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--confusable", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    print(generate(a.root, n_train=a.n_train, n_dev=a.n_dev,
                   n_test=a.n_test, n_phones=a.n_phones, noise=a.noise,
                   confusable=a.confusable, seed=a.seed))
