"""Self-describing orbax checkpoints with auto-resume discovery.

Replaces the reference's Lightning ModelCheckpoint + W&B artifact resume
(src/train.py:304, src/utils.py:38-53, SURVEY.md §5): checkpoints carry the
model's `hyper_parameters` dict (like the reference's save_hyperparameters,
multi_task_compressor.py:64) so a model is reconstructable from the
checkpoint alone, and `find_last_checkpoint` replaces the W&B artifact
lookup with a local directory scan.

Layout: <dir>/step_<N>/state   (orbax PyTree of the TrainState fields)
        <dir>/step_<N>/hyper_parameters.json
"""

import json
import os
import re
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state, hyper_parameters: dict):
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "hyper_parameters.json"), "w") as f:
        json.dump(hyper_parameters, f, indent=2)
    ckptr = ocp.StandardCheckpointer()
    payload = {"step": int(step), "params": state.params,
               "opt_state": state.opt_state}
    ckptr.save(os.path.join(path, "state"), payload, force=True)
    ckptr.wait_until_finished()
    return path


def find_last_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Latest step_<N> directory under ckpt_dir, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def restore_checkpoint(path: str, abstract_state=None
                       ) -> Tuple[dict, dict]:
    """-> (payload {step, params, opt_state}, hyper_parameters)."""
    path = os.path.abspath(path)
    with open(os.path.join(path, "hyper_parameters.json")) as f:
        hp = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    if abstract_state is not None:
        abstract = {"step": 0, "params": abstract_state.params,
                    "opt_state": abstract_state.opt_state}
        # a concrete sharding makes the restore platform-independent: a
        # TPU-saved checkpoint carries TPU device metadata that orbax
        # refuses to resolve on a CPU process unless told where to put
        # the arrays (callers restore before any mesh sharding, so
        # single-device is always the right target here)
        dev = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=getattr(x, "sharding", None) or dev)
            if hasattr(x, "shape") else x, abstract)
        payload = ckptr.restore(os.path.join(path, "state"), abstract)
    else:
        payload = ckptr.restore(os.path.join(path, "state"))
    return payload, hp


def rebuild_model_from_checkpoint(path: str):
    """Reconstruct the codec purely from hyper_parameters.json (reference
    behavior: compress.py:101-102 rebuilds from ckpt['hyper_parameters'])."""
    from ..models import MODEL_NAME

    with open(os.path.join(path, "hyper_parameters.json")) as f:
        hp = json.load(f)
    cls = MODEL_NAME[hp["model_class"]]
    return cls(
        tasks=tuple(hp["tasks"]),
        input_channels=tuple(hp["input_channels"]),
        output_channels=tuple(hp["output_channels"]),
        latent_channels=hp["latent_channels"],
        conv_channels=hp["conv_channels"],
        lmbda=hp["lmbda"],
        learning_rate_main=hp["learning_rate_main"],
        learning_rate_aux=hp["learning_rate_aux"],
        legacy_broadcast=hp.get("legacy_broadcast", True),
    ), hp
