"""Package-style checkpoints: the checkpoint is the model description.

Reproduces the reference contract (``CTC_Model.save_package``,
``timit/models/model_ctc.py:209-229``; consumed by ``test_ctc.py:38-60`` and
``visualize.py:18-48`` which rebuild the model purely from the package):

    package = {spec, config, params, model_state, opt_state, scheduler,
               epoch, loss_results, dev_loss_results, dev_cer_results}

plus what the reference lacks (SURVEY.md §5): **periodic resume checkpoints**
— crash-resume and plateau-rollback use the same durable mechanism.  Arrays
are stored as numpy inside a single ``np.savez`` container with a JSON
manifest; no pickle of arbitrary objects.
"""

from __future__ import annotations

import io
import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ctc_pytorch_tpu.config import Config
from ctc_pytorch_tpu.models.ctc_model import ModelSpec


def _flatten(tree: Any) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(l) for l in leaves], treedef


def save_package(
    path: str | Path,
    spec: ModelSpec,
    state,
    *,
    config: Optional[Config] = None,
    scheduler_state: Optional[dict] = None,
    epoch: Optional[int] = None,
    loss_results: Optional[list] = None,
    dev_loss_results: Optional[list] = None,
    dev_cer_results: Optional[list] = None,
    training_cer_results: Optional[list] = None,  # 863 dev-over-train
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    structs: Dict[str, str] = {}
    for name, tree in (
        ("params", state.params),
        ("model_state", state.model_state),
        ("opt_state", state.opt_state),
    ):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        for i, leaf in enumerate(leaves):
            arrays[f"{name}.{i}"] = np.asarray(leaf)
        structs[name] = str(treedef)
    manifest = {
        "spec": spec.to_dict(),
        "config": config.to_dict() if config else None,
        "scheduler": scheduler_state,
        "epoch": epoch,
        "step": int(np.asarray(state.step)),
        "loss_results": loss_results or [],
        "dev_loss_results": dev_loss_results or [],
        "dev_cer_results": dev_cer_results or [],
        "training_cer_results": training_cer_results or [],
        "extra": extra or {},
        "leaf_counts": {
            "params": sum(1 for k in arrays if k.startswith("params.")),
            "model_state": sum(1 for k in arrays if k.startswith("model_state.")),
            "opt_state": sum(1 for k in arrays if k.startswith("opt_state.")),
        },
    }
    buf = io.BytesIO()
    np.savez(buf, manifest=np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    ), **arrays)
    path.write_bytes(buf.getvalue())


def load_package(path: str | Path) -> Dict[str, Any]:
    """Load raw package: manifest dict + named leaf arrays."""
    with np.load(Path(path), allow_pickle=False) as z:
        manifest = json.loads(bytes(z["manifest"].tobytes()).decode())
        arrays = {k: z[k] for k in z.files if k != "manifest"}
    return {"manifest": manifest, "arrays": arrays}


def _leaves_of(arrays: Dict[str, np.ndarray], prefix: str) -> list:
    items = [(int(k.split(".")[-1]), v) for k, v in arrays.items()
             if k.startswith(prefix + ".")]
    return [v for _, v in sorted(items)]


def model_from_package(path: str | Path):
    """Rebuild (spec, params, model_state) from a package alone —
    the ``test_ctc.py:38-58`` contract.

    Tree structure is recovered by re-initialising a model from the stored
    spec and unflattening the stored leaves into it.
    """
    from ctc_pytorch_tpu.models import CTCModel

    pkg = load_package(path)
    spec = ModelSpec.from_dict(pkg["manifest"]["spec"])
    params0, mstate0 = CTCModel.init(jax.random.PRNGKey(0), spec)
    params = _unflatten_like(params0, _leaves_of(pkg["arrays"], "params"))
    mstate = _unflatten_like(mstate0, _leaves_of(pkg["arrays"], "model_state"))
    return spec, params, mstate, pkg["manifest"]


def restore_train_state(path: str | Path, state_template, tx=None):
    """Restore a full TrainState (params+model_state+opt_state) for resume."""
    from ctc_pytorch_tpu.train.state import TrainState

    pkg = load_package(path)
    import jax.numpy as jnp

    params = _unflatten_like(
        state_template.params, _leaves_of(pkg["arrays"], "params")
    )
    mstate = _unflatten_like(
        state_template.model_state, _leaves_of(pkg["arrays"], "model_state")
    )
    opt = _unflatten_like(
        state_template.opt_state, _leaves_of(pkg["arrays"], "opt_state")
    )
    step = jnp.asarray(pkg["manifest"].get("step", 0), jnp.int32)
    return TrainState(step, params, mstate, opt), pkg["manifest"]


def _unflatten_like(template, leaves: list):
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, model expects {len(t_leaves)}"
        )
    import jax.numpy as jnp

    cast = [
        jnp.asarray(l, t.dtype if hasattr(t, "dtype") else None)
        for l, t in zip(leaves, t_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, cast)


def latest_checkpoint(ckpt_dir: str | Path, pattern: str = "resume_ep*.npz"):
    ckpts = sorted(
        Path(ckpt_dir).glob(pattern),
        key=lambda p: int("".join(ch for ch in p.stem if ch.isdigit()) or 0),
    )
    return ckpts[-1] if ckpts else None
