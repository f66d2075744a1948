"""End-to-end PER-parity harness: the torch reference vs this framework.

Runs the reference's OWN entrypoints (``timit/steps/train_ctc.py`` /
``test_ctc.py``) unmodified, via subprocess with dependency shims
(kaldiio/editdistance/visdom) on PYTHONPATH, and this framework's CLI on
the SAME on-disk corpus (tools/parity/gen_corpus.py artifacts), then:

  1. compares dev/test PER (reference target: |delta| <= 0.3 abs),
  2. imports the reference's trained checkpoint (cli/import_torch) and
     asserts greedy-decode string equality utterance-by-utterance through
     the full splice->model->length-rescale->decode chain (CPU, fp32).

Usage:  python tools/parity/run_parity.py WORKDIR [--small] [--report OUT.md]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
REF = Path("/root/reference/timit")
SHIMS = REPO / "tools" / "parity" / "shims"

def cnn_keys(add_cnn: bool) -> str:
    """The reference flagship conv stack (``timit/conf/ctc_config.yaml:30-40``):
    2x Conv(3,3) pad (1,1), freq stride 2 both layers, time stride 2 on the
    second — time downsample x2 through the conv on top of any frame skip."""
    return f"""\
add_cnn: {add_cnn}
layers: 2
channel: "[(1, 32), (32, 32)]"
kernel_size: "[(3, 3), (3, 3)]"
stride: "[(1, 2), (2, 2)]"
padding: "[(1, 1), (1, 1)]"
pooling: "None"
activation_function: "relu"
"""


def base_conf(data: Path, ckpt: Path, exp: str, hp: dict, test_split: str) -> str:
    return f"""\
exp_name: '{exp}'
checkpoint_dir: '{ckpt}'
use_gpu: False
vocab_file: '{data}/units'
train_scp_path: '{data}/train/fbank.scp'
train_lab_path: '{data}/train/phn_text'
valid_scp_path: '{data}/dev/fbank.scp'
valid_lab_path: '{data}/dev/phn_text'
test_scp_path: '{data}/{test_split}/fbank.scp'
test_lab_path: '{data}/{test_split}/phn_text'
left_ctx: 1
right_ctx: 1
n_skip_frame: {hp.get('skip', 1)}
n_downsample: 2
num_workers: 0
shuffle_train: True
feature_dim: {hp['dim']}
output_class_dim: {hp['n_phones']}
mel: False
feature_type: "fbank"
rnn_input_size: {hp['dim'] * 3}
rnn_hidden_size: {hp['hidden']}
rnn_layers: {hp['layers']}
rnn_type: "nn.LSTM"
bidirectional: True
batch_norm: True
drop_out: 0.0
{cnn_keys(hp.get('cnn', False))}
init_lr: {hp['lr']}
num_epoches: {hp['epochs']}
end_adjust_acc: {hp['band']}
lr_decay: 0.5
batch_size: {hp['batch']}
weight_decay: 0.0005
seed: {hp.get('seed', 1)}
verbose_step: 1000
decode_type: "Greedy"
beam_width: 20
lm_alpha: 0.1
lm_path: '{data}/lm_phone_bg.arpa'
"""


def ours_extra(hp: dict) -> str:
    # quantized batching pads each random-composition batch up to the next
    # boundary; boundary count controls the padding overshoot vs the
    # reference's exact per-batch-max padding (BN statistics include padded
    # frames on both sides, so overshoot is a real training-dynamics knob:
    # measured ~5.5% at 4 buckets vs ~2.5% at 16 on the hard corpus).
    # pad_dynamics 'batchmax' (the round-5 default) removes the knob: BN
    # statistics stop at the batch's true max inside the static boundary.
    extra = f"""\
num_buckets: {hp.get('buckets', 4)}
dtype: "float32"
ctc_impl: "scan"
"""
    if hp.get("pad_dynamics"):
        extra += f"pad_dynamics: \"{hp['pad_dynamics']}\"\n"
    if hp.get("fused"):
        extra += "fused_epoch: True\n"
    return extra


def run(cmd, *, cwd=None, env=None, log_to=None, check=True):
    t0 = time.time()
    print(f"+ {' '.join(map(str, cmd))}", flush=True)
    r = subprocess.run(
        [str(c) for c in cmd], cwd=cwd, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    if log_to:
        Path(log_to).write_text(r.stdout)
    print(f"  -> rc={r.returncode} in {time.time() - t0:.0f}s", flush=True)
    if check and r.returncode != 0:
        print(r.stdout[-4000:])
        raise RuntimeError(f"command failed: {cmd}")
    return r.stdout


def _pythonpath(*parts):
    """Prepend to PYTHONPATH, preserving the image's entries (the axon TPU
    plugin registers via /root/.axon_site on PYTHONPATH)."""
    old = os.environ.get("PYTHONPATH", "")
    return ":".join([str(p) for p in parts] + ([old] if old else []))


def ref_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = _pythonpath(SHIMS, REPO)
    env["TORCH_FORCE_NO_WEIGHTS_ONLY_LOAD"] = "1"
    env.setdefault("OMP_NUM_THREADS", "1")
    # keep jax (imported transitively by the kaldiio shim) off the TPU
    env["JAX_PLATFORMS"] = "cpu"
    return env


def eval_cmd(conf_path, package_path) -> list:
    """The shared CPU/highest-precision evaluate invocation — one builder so
    the greedy and beam equality checks always run under identical numerics."""
    return [sys.executable, "-c",
            "import sys, jax; jax.config.update('jax_platforms', 'cpu');"
            "jax.config.update('jax_default_matmul_precision', 'highest');"
            "from ctc_pytorch_tpu.config import load_config;"
            "from ctc_pytorch_tpu.cli.test import evaluate;"
            f"cfg = load_config(r'{conf_path}');"
            f"evaluate(cfg, r'{package_path}', verbose=True)"]


def parse_wer(text: str) -> float:
    m = re.findall(r"[Ww]ord error rate on test set:\s*([0-9.]+)", text)
    if not m:
        raise RuntimeError("no WER line found")
    return float(m[-1])


def parse_decodes(text: str) -> list:
    """decoded strings in print order (reference and ours print the same)."""
    return [l.split(":", 1)[1].strip()
            for l in text.splitlines() if l.startswith("decoded")]


def scp_utts(scp: Path) -> list:
    return [l.split()[0] for l in scp.read_text().splitlines() if l.strip()]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--small", action="store_true",
                    help="reduced pilot corpus/model (CI-sized)")
    ap.add_argument("--cnn", action="store_true",
                    help="flagship chain: add_cnn=True conv stack + "
                         "n_skip_frame=2 (VERDICT r2 item 1)")
    ap.add_argument("--hard", action="store_true",
                    help="confusable-prototype corpus so both sides land at "
                         "a realistic 15-30%% PER and the plateau scheduler "
                         "trips decays (VERDICT r2 item 3)")
    ap.add_argument("--mid", action="store_true",
                    help="the PARITY_RUN.md section-2 mid regime (~3.5-4%% "
                         "PER): confusable 0.45 / noise 0.55 on the --hard "
                         "sizing — the calibration --hard shipped with "
                         "before it was re-aimed at 15-30%%")
    ap.add_argument("--beam", action="store_true",
                    help="also compare LM-fused beam decode (beam=20) vs the "
                         "reference's own BeamSearch (VERDICT r2 item 2)")
    ap.add_argument("--report", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="run our framework's stages on CPU (hermetic CI)")
    ap.add_argument("--skip-ref-train", action="store_true",
                    help="reuse an existing reference checkpoint")
    ap.add_argument("--seed", type=int, default=1,
                    help="training seed for BOTH sides (envelope studies)")
    ap.add_argument("--buckets", type=int, default=None,
                    help="override our side's num_buckets (padding-ladder "
                         "studies; the regime default otherwise)")
    ap.add_argument("--ours-only", action="store_true",
                    help="train/score only our side (padding-ladder seeds: "
                         "the reference result for a given seed+regime is "
                         "independent of our num_buckets knob, so reuse the "
                         "recorded envelope instead of retraining torch)")
    ap.add_argument("--ref-only", action="store_true",
                    help="train/score only the torch reference (seed-"
                         "envelope extension runs: our side's results for "
                         "these seeds are already recorded)")
    ap.add_argument("--pad-dynamics", default=None,
                    choices=("padded", "batchmax", "valid"),
                    help="our side's pad_dynamics (framework default when "
                         "omitted; 'padded' reproduces the pre-round-5 "
                         "ladder rows)")
    ap.add_argument("--fused", action="store_true",
                    help="train our side with fused_epoch: True (grouped "
                         "batch-order dynamics check)")
    args = ap.parse_args(argv)

    wd = Path(args.workdir).resolve()
    data = wd / "data"
    ckpt = wd / "ckpt"
    wd.mkdir(parents=True, exist_ok=True)

    if args.small:
        corpus = dict(n_train=80, n_dev=24, n_test=24, n_phones=12, dim=20,
                      min_phones=4, max_phones=10)
        hp = dict(dim=20, n_phones=12, hidden=32, layers=1, lr=4e-3,
                  epochs=8, band=2, batch=8)
    else:
        corpus = dict(n_train=600, n_dev=100, n_test=100, n_phones=40, dim=40)
        hp = dict(dim=40, n_phones=40, hidden=128, layers=2, lr=1e-3,
                  epochs=30, band=2, batch=8)
    if args.hard or args.mid:
        # near-pair prototypes + hotter noise: lands the torch reference at
        # a realistic PER (~15-30%) where band/decay/rollback dynamics act;
        # tighter band + enough epochs that decays actually trip.  Model and
        # corpus sized for a single-core rig (the torch side trains at
        # minutes/epoch at hidden 128) — the REGIME is the point, not scale.
        # calibrated on this corpus generator: (0.45, 0.55) lands at ~4%
        # dev PER, (0.18, 0.75) at ~35%; this pair sits in the target
        # 15-30% window where the reference's plateau loop trips decays.
        # --mid keeps the (0.45, 0.55) point: PARITY_RUN.md section 2.
        corpus.update(confusable=0.45 if args.mid else 0.25,
                      noise=0.55 if args.mid else 0.68)
        if not args.small:
            corpus.update(n_train=400, n_dev=80, n_test=80)
            hp.update(hidden=64, lr=2e-3)
        # 16 quantized boundaries keep padding overshoot ~2.5% (vs ~5.5%
        # at 4) — at this regime padding-in-BN is a measurable dynamics
        # knob (see PARITY_RUN.md bucket study)
        hp.update(band=0.1, epochs=30 if not args.small else 12, buckets=16)
    hp.update(seed=args.seed, fused=args.fused,
              pad_dynamics=args.pad_dynamics)
    if args.buckets is not None:
        hp.update(buckets=args.buckets)
    if args.cnn:
        hp.update(cnn=True, skip=2)
        # frame budget: skip x2 then conv time-stride x2 leaves T/4 output
        # frames; CTC needs T_out >= n_labels (+1 per adjacent repeat), so
        # phones must last >= ~8 input frames or the torch side hits inf
        # loss -> nan grads on short utterances
        corpus.update(min_dur=10, max_dur=20)

    # ---- shared corpus ----------------------------------------------------
    # a corpus built for a different flag combination (--small/--hard/--cnn
    # change durations/noise/sizes) must be REGENERATED, not silently
    # reused — e.g. the CNN regime needs min_dur>=10 or the torch side hits
    # inf loss on short utterances; stamp the params and compare
    stamp = data / "corpus_params.json"
    want = json.dumps(corpus, sort_keys=True)
    if not (data / "units").exists() or (
        not stamp.exists() or stamp.read_text() != want
    ):
        if data.exists():
            import shutil

            shutil.rmtree(data)
        from tools.parity.gen_corpus import generate

        counts = generate(data, **corpus)
        stamp.write_text(want)
        print("corpus:", counts, flush=True)

    # ---- shared bigram LM (ours trains it; both sides read the ARPA) ------
    if not (data / "lm_phone_bg.arpa").exists():
        env_lm = dict(os.environ)
        env_lm["PYTHONPATH"] = _pythonpath(REPO)
        env_lm["JAX_PLATFORMS"] = "cpu"
        run([sys.executable, "-m", "ctc_pytorch_tpu.cli.train_lm", data],
            cwd=REPO, env=env_lm)

    # ---- confs -------------------------------------------------------------
    # decode confs use batch_size 1 + (ours) reference-exact padding: with a
    # CNN, int(frac * T_out(T_pad)) depends on the padded batch length, so
    # per-utterance greedy equality is only well-defined when both sides pad
    # each utterance identically (batch of 1, padded to % n_downsample)
    confs = {}
    for side in ("ref", "ours"):
        for split in ("dev", "test"):
            text = base_conf(data, ckpt, side, hp, split)
            text = text.replace(f"batch_size: {hp['batch']}", "batch_size: 1")
            if side == "ours":
                text += ours_extra(dict(hp, buckets=0))
            p = wd / f"conf_{side}_{split}.yaml"
            p.write_text(text)
            confs[(side, split)] = p
    for side in ("ref", "ours"):
        text = base_conf(data, ckpt, side, hp, "test")
        if side == "ours":
            text += ours_extra(hp)
        p = wd / f"conf_{side}_train.yaml"
        p.write_text(text)
        confs[(side, "train")] = p

    results = {}

    # ---- reference: train + score dev/test ---------------------------------
    ref_ckpt = ckpt / "ref" / "ctc_best_model.pkl"
    if not args.ours_only:
        if not (args.skip_ref_train and ref_ckpt.exists()):
            run([sys.executable, "steps/train_ctc.py", "--conf",
                 confs[("ref", "train")]], cwd=REF, env=ref_env(),
                log_to=wd / "ref_train.log")
        for split in ("dev", "test"):
            out = run([sys.executable, "steps/test_ctc.py", "--conf",
                       confs[("ref", split)]], cwd=REF, env=ref_env(),
                      log_to=wd / f"ref_test_{split}.log")
            results[f"ref_per_{split}"] = parse_wer(out)

    if args.ref_only:
        print(json.dumps(results, indent=2))
        (wd / "results.json").write_text(json.dumps(results, indent=2))
        return results

    # ---- ours: train + score dev/test --------------------------------------
    env = dict(os.environ)
    env["PYTHONPATH"] = _pythonpath(REPO)
    if args.cpu:
        env["JAX_PLATFORMS"] = "cpu"
    # reference-exact (num_buckets=0) runs jit per batch shape; the
    # persistent cache makes the per-shape compiles a one-time cost
    env["JAX_COMPILATION_CACHE_DIR"] = str(wd / "jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    run([sys.executable, "-m", "ctc_pytorch_tpu.cli.train", "--conf",
         confs[("ours", "train")]], cwd=REPO, env=env,
        log_to=wd / "ours_train.log")
    for split in ("dev", "test"):
        out = run([sys.executable, "-m", "ctc_pytorch_tpu.cli.test", "--conf",
                   confs[("ours", split)]], cwd=REPO, env=env,
                  log_to=wd / f"ours_test_{split}.log")
        results[f"ours_per_{split}"] = parse_wer(out)

    if args.ours_only:
        print(json.dumps(results, indent=2))
        (wd / "results.json").write_text(json.dumps(results, indent=2))
        return results

    # ---- greedy bit-equality on imported reference weights -----------------
    imported = wd / "imported.npz"
    run([sys.executable, "-m", "ctc_pytorch_tpu.cli.import_torch",
         ckpt / "ref" / "ctc_best_model.pkl", imported], cwd=REPO, env=env)
    eq = {}
    for split in ("dev", "test"):
        ref_dec = parse_decodes((wd / f"ref_test_{split}.log").read_text())
        out = run(
            eval_cmd(confs[("ours", split)], imported),
            cwd=REPO, env=env, log_to=wd / f"imported_test_{split}.log")
        our_dec = parse_decodes(out)
        # ours prints utt ids; align by scp order for the reference side
        utts = scp_utts(data / split / "fbank.scp")
        our_utts = [l.strip() for l in out.splitlines()
                    if re.fullmatch(r"(train|dev|test)\d+", l.strip())]
        ref_map = dict(zip(utts, ref_dec))
        our_map = dict(zip(our_utts, our_dec))
        assert set(ref_map) == set(our_map), "utterance sets differ"
        n_eq = sum(ref_map[u] == our_map[u] for u in ref_map)
        eq[split] = (n_eq, len(ref_map))
        results[f"greedy_eq_{split}"] = f"{n_eq}/{len(ref_map)}"
        results[f"imported_per_{split}"] = parse_wer(out)

    results["delta_dev"] = round(
        results["ours_per_dev"] - results["ref_per_dev"], 4)
    results["delta_test"] = round(
        results["ours_per_test"] - results["ref_per_test"], 4)

    # ---- LM-fused beam decode (beam=20) vs the reference's own search ------
    if args.beam:
        beam_eq = {}
        for split in ("dev", "test"):
            conf_b = wd / f"conf_ref_beam_{split}.yaml"
            conf_b.write_text(
                confs[("ref", split)].read_text()
                .replace('decode_type: "Greedy"', 'decode_type: "Beam"'))
            out = run([sys.executable, "steps/test_ctc.py", "--conf", conf_b],
                      cwd=REF, env=ref_env(),
                      log_to=wd / f"ref_beam_{split}.log")
            ref_dec = parse_decodes(out)
            results[f"ref_beam_per_{split}"] = parse_wer(out)
            utts = scp_utts(data / split / "fbank.scp")
            ref_map = dict(zip(utts, ref_dec))

            for impl, extra in (
                ("python", 'decode_type: "Beam"\nbeam_use_native: False\n'),
                ("native", 'decode_type: "Beam"\nbeam_use_native: True\n'),
                ("device", 'decode_type: "BeamDevice"\n'),
            ):
                conf_o = wd / f"conf_ours_beam_{impl}_{split}.yaml"
                conf_o.write_text(
                    confs[("ours", split)].read_text()
                    .replace('decode_type: "Greedy"\n', extra))
                out = run(
                    eval_cmd(conf_o, imported), cwd=REPO, env=env,
                    log_to=wd / f"ours_beam_{impl}_{split}.log")
                our_dec = parse_decodes(out)
                our_utts = [l.strip() for l in out.splitlines()
                            if re.fullmatch(r"(train|dev|test)\d+", l.strip())]
                our_map = dict(zip(our_utts, our_dec))
                assert set(ref_map) == set(our_map), "utterance sets differ"
                n_eq = sum(ref_map[u] == our_map[u] for u in ref_map)
                beam_eq[(impl, split)] = (n_eq, len(ref_map))
                results[f"beam_eq_{impl}_{split}"] = f"{n_eq}/{len(ref_map)}"
                results[f"beam_per_{impl}_{split}"] = parse_wer(out)
        results["beam_eq"] = {f"{i}_{s}": v for (i, s), v in beam_eq.items()}

    print(json.dumps(results, indent=2))
    (wd / "results.json").write_text(json.dumps(results, indent=2))

    if args.report:
        frac = {s: f"{a}/{b} ({100.0 * a / b:.1f}%)" for s, (a, b) in eq.items()}
        Path(args.report).write_text(REPORT_TMPL.format(
            hp=json.dumps(hp), corpus=json.dumps(corpus), **results,
            eq_dev=frac["dev"], eq_test=frac["test"],
        ))
        print("report ->", args.report)
    return results


REPORT_TMPL = """\
# PARITY_RUN — measured reference-vs-framework numbers

Harness: `tools/parity/run_parity.py` (reference entrypoints run unmodified
via dependency shims; shared binary-ark corpus from `tools/parity/gen_corpus.py`).

Corpus: {corpus}
Hyperparams (both sides): {hp}

## Dev/test PER (trained independently, same data + recipe)

| | reference (torch) | this framework | delta |
|---|---|---|---|
| dev PER % | {ref_per_dev} | {ours_per_dev} | {delta_dev} |
| test PER % | {ref_per_test} | {ours_per_test} | {delta_test} |

North-star target (BASELINE.md): |delta dev PER| <= 0.3 abs.

## Greedy bit-equality on the reference's own weights

Reference checkpoint imported with `cli/import_torch.py`; full chain
(splice -> model -> fractional length rescale -> greedy collapse) decoded
by both frameworks on CPU fp32:

| split | identical decoded strings | PER ours-on-imported vs reference |
|---|---|---|
| dev | {eq_dev} | {imported_per_dev} vs {ref_per_dev} |
| test | {eq_test} | {imported_per_test} vs {ref_per_test} |
"""


if __name__ == "__main__":
    main()
