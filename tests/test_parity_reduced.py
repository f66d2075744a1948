"""CI-runnable reduced version of the reference-parity run (VERDICT r1 #1).

Runs the actual torch reference (``timit/steps/train_ctc.py`` /
``test_ctc.py``) via tools/parity/run_parity.py on a small shared corpus,
then asserts:

- greedy decode STRING EQUALITY utterance-by-utterance on the reference's
  own trained weights imported through cli/import_torch (the "bitwise
  comparable greedy" contract), and
- our independently-trained model reaches a dev PER at least as good as
  (or within a small band of) the reference's on the same data+recipe.

The full-size measured numbers live in PARITY_RUN.md.
"""

import json
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REF = Path("/root/reference/timit/steps/train_ctc.py")
REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.mark.skipif(not REF.exists(), reason="reference checkout not present")
def test_parity_reduced(tmp_path):
    from tools.parity.run_parity import main

    results = main([str(tmp_path / "wd"), "--small", "--cpu"])
    (tmp_path / "results.json").write_text(json.dumps(results))

    for split in ("dev", "test"):
        n_eq, n_tot = map(int, results[f"greedy_eq_{split}"].split("/"))
        assert n_eq == n_tot, (
            f"greedy decode diverged on {split}: {results}"
        )
        # ours-on-imported-weights must reproduce the reference's own PER
        assert abs(results[f"imported_per_{split}"]
                   - results[f"ref_per_{split}"]) < 1e-6, results

    # independent training on the same recipe: at tiny scale the trajectories
    # differ (init/batching RNG), so allow a loose band — ours must not be
    # materially worse
    assert results["ours_per_dev"] <= results["ref_per_dev"] + 5.0, results


@pytest.mark.skipif(not REF.exists(), reason="reference checkout not present")
def test_parity_reduced_cnn_beam(tmp_path):
    """Flagship-chain parity (VERDICT r2 items 1+2): add_cnn=True conv stack
    + n_skip_frame=2 through conv->reshape->rnn->frac-rescale->decode, plus
    LM-fused beam decode (beam=20) vs the reference's own BeamSearch, on the
    hard (confusable) corpus so the regime is non-trivial."""
    from tools.parity.run_parity import main

    results = main([str(tmp_path / "wd"), "--small", "--cpu",
                    "--cnn", "--hard", "--beam"])
    (tmp_path / "results.json").write_text(json.dumps(results))

    for split in ("dev", "test"):
        n_eq, n_tot = map(int, results[f"greedy_eq_{split}"].split("/"))
        assert n_eq == n_tot, f"CNN greedy diverged on {split}: {results}"
        assert abs(results[f"imported_per_{split}"]
                   - results[f"ref_per_{split}"]) < 1e-6, results
        for impl in ("python", "native", "device"):
            n_eq, n_tot = map(
                int, results[f"beam_eq_{impl}_{split}"].split("/"))
            assert n_eq == n_tot, (
                f"beam ({impl}) diverged from the reference BeamSearch on "
                f"{split}: {results}"
            )
    assert results["ours_per_dev"] <= results["ref_per_dev"] + 5.0, results
