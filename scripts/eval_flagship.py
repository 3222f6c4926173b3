"""Post-training evaluation of a shared-latent flagship checkpoint:
check_bpp (actual vs estimated), per-channel rate attribution, and a
partial-decode demonstration. Writes a JSON summary next to the ckpt."""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# tunnel-outage escape hatch: the axon TPU plugin ignores JAX_PLATFORMS,
# so a dead tunnel would hang backend init; MMNC_FORCE_PLATFORM=cpu runs
# the eval on the host instead (slow but correct)
if os.environ.get("MMNC_FORCE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MMNC_FORCE_PLATFORM"])


def main(ckpt_path: str, out_path: str, data_style: str = "auto"):
    from mmnc_tpu.utils.checkpoint import (restore_checkpoint,
                                           rebuild_model_from_checkpoint)
    from mmnc_tpu.train.state import create_train_state
    from mmnc_tpu.data import SyntheticMultiTaskDataset, BatchLoader
    from mmnc_tpu import analysis

    if data_style == "auto":
        # the sweep keeps clevr-style runs under runs/rd_clevr/...; eval
        # must match the training distribution or the metrics are bogus
        data_style = "clevr" if "clevr" in ckpt_path else "legacy"

    model, hp = rebuild_model_from_checkpoint(ckpt_path)
    variables = model.init(jax.random.PRNGKey(0),
                           model.example_batch(image_size=256))
    state = create_train_state(variables["params"], 1)
    payload, _ = restore_checkpoint(ckpt_path, state)
    variables = {"params": payload["params"]}
    tables = model.update_bottleneck_values(variables)

    ds = SyntheticMultiTaskDataset(model.tasks, size=64, image_size=256,
                                   seed=10 ** 6, style=data_style)
    batch = jax.tree.map(jnp.asarray,
                         next(iter(BatchLoader(ds, 16, shuffle=False))))

    summary = {"checkpoint": ckpt_path, "step": int(payload["step"]),
               "data_style": data_style, "hyper_parameters": hp}

    # 1. check_bpp
    summary["check_bpp"] = analysis.check_bpp(model, variables, tables, batch)

    # 2. per-channel rate attribution
    ch = analysis.channel_bpp(model, variables, batch)
    summary["channel_bpp"] = {
        "task_slices": [list(s) for s in ch["task_slices"]],
        "y_per_slice": {
            name: float(ch["y"][lo:hi].sum())
            for name, lo, hi in ch["task_slices"]},
        "z_total": float(ch["z"].sum()),
    }

    # 3. partial decode: bytes needed per single task vs full
    if model.variant in ("disjoint", "shared"):
        ans, total = model.compress_partial(variables, tables, batch)
        per_task = {}
        z_bytes = sum(len(s) for s in ans["z_strings"])
        shared_bytes = (sum(len(s) for s in ans["task_streams"]["shared"])
                        if "shared" in ans["task_streams"] else 0)
        for t in model.tasks:
            t_bytes = sum(len(s) for s in ans["task_streams"][t])
            per_task[t] = t_bytes + z_bytes + shared_bytes
        summary["partial_decode_bytes"] = {
            "total": total, "per_task_incl_shared_z": per_task}
        sub = model.decompress_tasks(variables, tables, ans,
                                     tasks=[model.tasks[0]])
        full_ans, _ = model.compress(variables, tables, batch)
        full = model.decompress(variables, tables, full_ans["strings"],
                                full_ans["shape"], full_ans["y_shape"],
                                batch_size=full_ans["batch_size"])
        t0 = model.tasks[0]
        summary["partial_matches_full"] = bool(np.allclose(
            np.asarray(sub[t0]), np.asarray(full[t0]), atol=1e-5))

    # 4. eval metrics on this batch
    from mmnc_tpu.train import make_eval_step
    logs = jax.device_get(make_eval_step(model)(variables["params"], batch))
    summary["val_metrics"] = {k: float(v) for k, v in logs.items()}

    # 5. qualitative sample grids next to the summary (the reference's
    # image-logging callback equivalent for the flagship row)
    from mmnc_tpu.utils.logging import save_image_grid
    x_hats, _ = model.forward(variables, batch, training=False)
    # derive the grid dir from the output stem (round-agnostic; a
    # hardcoded round tag silently mislabeled later-round re-runs)
    stem = os.path.splitext(os.path.basename(out_path))[0]
    grid_dir = os.path.join(os.path.dirname(out_path) or ".",
                            f"{stem}_samples")
    save_image_grid(grid_dir, jax.tree.map(np.asarray, x_hats), batch)
    summary["sample_grids"] = grid_dir

    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "hyper_parameters"}, indent=2))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2
         else "flagship_eval.json",
         sys.argv[3] if len(sys.argv) > 3 else "auto")
