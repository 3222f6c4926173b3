"""Offline compression CLI (reference src/compress.py — with the 2-vs-3
tuple-unpack crash of compress.py:109 fixed rather than reproduced;
SURVEY.md §2.5 known defects).

    python -m mmnc_tpu.cli.compress -p runs/myrun/checkpoints/step_100 \
        -d synthetic --batch-size 8 --num-batches 4

Loads a checkpoint, rebuilds the model purely from its stored
hyper_parameters, rebuilds the entropy coding tables
(update_bottleneck_values), compresses batches with the real rANS coder and
reports actual bytes next to the likelihood-estimated bpp (the check_bpp
notebook flow as a CLI).
"""

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ..data import SyntheticMultiTaskDataset, CLEVRDataset, BatchLoader
from ..utils.checkpoint import restore_checkpoint, rebuild_model_from_checkpoint
from ..train.state import create_train_state
from .train import DATASET_ROOTS


def parse_args(argv):
    p = argparse.ArgumentParser(description="Compress a dataset with a "
                                "trained checkpoint")
    p.add_argument("-p", "--model-path", required=True,
                   help="checkpoint dir (runs/<run>/checkpoints/step_<N>)")
    p.add_argument("-d", "--dataset", required=True,
                   choices=("synthetic", "clevr"))
    p.add_argument("--split", default="train", choices=("train", "val", "test"))
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-batches", type=int, default=None)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--out", default=None,
                   help="optional path to write the raw bitstream of the "
                        "first batch")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])

    model, hp = rebuild_model_from_checkpoint(args.model_path)
    print(f"restored {hp['model_class']} tasks={hp['tasks']}")
    variables = model.init(jax.random.PRNGKey(0),
                           model.example_batch(image_size=args.image_size))
    state = create_train_state(variables["params"], 1)
    payload, _ = restore_checkpoint(args.model_path, state)
    variables = {"params": payload["params"]}

    tables = model.update_bottleneck_values(variables)

    # corrected-geometry twin: same params, scales cropped to y's support
    model_corrected = model.corrected_geometry_twin()

    if args.dataset == "synthetic":
        ds = SyntheticMultiTaskDataset(model.tasks, size=1024,
                                       image_size=args.image_size)
    else:
        ds = CLEVRDataset(DATASET_ROOTS["clevr"], list(model.tasks),
                          args.split, args.image_size)
    loader = BatchLoader(ds, args.batch_size, shuffle=False)

    total_bytes = 0
    total_pixels = 0
    est_bpp_sum = 0.0
    est_corrected_sum = 0.0
    n_batches = 0
    for i, batch in enumerate(loader):
        if args.num_batches is not None and i >= args.num_batches:
            break
        jbatch = jax.tree.map(jnp.asarray, batch)
        ans, n_bytes = model.compress(variables, tables, jbatch)
        if args.out and i == 0:
            with open(args.out, "wb") as f:
                for group in ans["strings"]:
                    for s in group:
                        f.write(len(s).to_bytes(8, "little"))
                        f.write(s)
            print(f"wrote first-batch bitstream to {args.out}")
        b, h, w, _ = batch[model.tasks[0]].shape
        total_bytes += n_bytes
        total_pixels += b * h * w * model.n_tasks

        # the variant compression loss is exactly bits/(B*H*W*n_tasks),
        # directly comparable to the bitstream bpp (reference compress()
        # print_info, multi_task_compressor.py:520-532). NOTE: under the
        # default legacy_broadcast geometry the training-time estimate
        # counts each saturated-latent y value 16x (SURVEY.md §2.4); the
        # corrected-geometry estimate is what the real coder should match.
        _, lik = model.forward(variables, jbatch, training=False)
        est, _ = model._compression_loss(lik, jbatch)
        est_bpp_sum += float(est)
        _, lik_c = model_corrected.forward(variables, jbatch, training=False)
        est_c, _ = model_corrected._compression_loss(lik_c, jbatch)
        est_corrected_sum += float(est_c)
        n_batches += 1

    actual_bpp = total_bytes * 8 / total_pixels
    est_bpp = est_bpp_sum / max(n_batches, 1)
    est_corrected = est_corrected_sum / max(n_batches, 1)
    print(f"batches: {n_batches}  bytes: {total_bytes}")
    print(f"actual BPP (rANS bitstream):            {actual_bpp:.4f}")
    print(f"estimated BPP (training geometry):      {est_bpp:.4f}")
    print(f"estimated BPP (corrected geometry):     {est_corrected:.4f}")
    return actual_bpp, est_corrected


if __name__ == "__main__":
    main()
