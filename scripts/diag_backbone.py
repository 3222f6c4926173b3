"""Backbone-isolation diagnostic for the PSNR plateau (round-4).

All trained runs — including single-task fixed-lambda ones whose
distortion term outweighs rate by ~4 orders of magnitude — plateau at
~21-23 dB on piecewise-constant synthetic scenes, and a one-batch
overfit probe crawls (~0.05 dB / 256 steps). This script trains the SAME
net (MultiTaskCodecNet, single-rgb) on ONE batch under progressively
simpler objectives to isolate where distortion descent breaks:

  ae     y_hat = y (no noise, no rounding), loss = MSE only
  noisy  y_hat = y + U(-.5,.5),             loss = MSE only
  full   standard rate-distortion loss via the model API

If `ae` also crawls, the defect is in the transforms (conv/deconv/GDN)
or the optimizer wiring; if `ae` soars and `noisy` crawls, it is the
quantization-noise interface; if only `full` crawls, it is the rate
term / entropy model.

    python scripts/diag_backbone.py --modes ae,noisy,full --steps 1500
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mmnc_tpu.data import SyntheticMultiTaskDataset
from mmnc_tpu.models import build_model
from mmnc_tpu.models.codecs import MultiTaskCodecNet


def patch_activation(act: str):
    """Swap every GDN in the net for a parameter-free activation.

    Isolation lever: if `ae` crawls with GDN but soars with relu/identity,
    the slow-distortion-descent defect lives in the (I)GDN chain.
    """
    import flax.linen as nn
    from mmnc_tpu.ops import layers as lay

    if act == "gdn":
        return
    if act == "relu":
        def call(self, x):  # noqa: ANN001
            return nn.leaky_relu(x, 0.2)
    elif act == "none":
        def call(self, x):  # noqa: ANN001
            return x
    else:
        raise SystemExit(f"unknown --act {act}")
    lay.GDN.__call__ = call
    # heads.py / backbone.py bind the class by reference, so patching the
    # method is enough.


def run_mode(mode, model, batch, steps, lr, log_every=128, label=""):
    rng = jax.random.PRNGKey(21)
    variables = model.init(rng, batch)
    params = variables["params"]

    def ae_loss(params, rng, noisy):
        v = {"params": params}
        y, _z = model.net.apply(v, batch, method=MultiTaskCodecNet.analyze)
        if noisy:
            y = y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
        x_hats = model.net.apply(v, y,
                                 method=MultiTaskCodecNet.synthesize_from_y)
        x, xh = batch["rgb"], x_hats["rgb"]
        return jnp.mean((x - xh) ** 2) * 65536.0, (y, xh)

    def full_loss(params, rng):
        v = {"params": params}
        loss, (logs, x_hats, _) = model.loss_and_logs(
            v, batch, rng=rng, training=True)
        return loss + model.aux_loss(v), (jnp.zeros(()), x_hats["rgb"])

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        if mode == "full":
            (loss, (y, xh)), grads = jax.value_and_grad(
                full_loss, has_aux=True)(params, rng)
        else:
            (loss, (y, xh)), grads = jax.value_and_grad(
                ae_loss, has_aux=True)(params, rng, mode == "noisy")
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mse = jnp.mean((batch["rgb"] - xh) ** 2)
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        ystd = jnp.std(y) if mode != "full" else jnp.zeros(())
        return params, opt_state, loss, psnr, ystd

    hist = []
    t0 = time.time()
    for i in range(1, steps + 1):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss, psnr, ystd = step(params, opt_state, sub)
        if i % log_every == 0 or i == steps:
            row = {"step": i, "loss": round(float(loss), 3),
                   "rgb_psnr": round(float(psnr), 2),
                   "y_std": round(float(ystd), 3)}
            hist.append(row)
            print(f"  [{mode}{label}] " +
                  " ".join(f"{k}={v}" for k, v in row.items()), flush=True)
    print(f"  [{mode}{label}] {steps} steps in {time.time()-t0:.0f}s")
    return hist


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="ae,noisy,full")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lmbda", type=float, default=0.1)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--conv-channels", type=int, default=48)
    p.add_argument("--latent-channels", type=int, default=300)
    p.add_argument("--act", default="gdn", choices=["gdn", "relu", "none"])
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    patch_activation(args.act)

    ds = SyntheticMultiTaskDataset(["rgb"], size=args.batch_size,
                                   image_size=args.image_size, seed=0)
    batch = {"rgb": jnp.asarray(
        np.stack([ds[i]["rgb"] for i in range(args.batch_size)]))}

    model = build_model(1, ["rgb"], latent_channels=args.latent_channels,
                        conv_channels=args.conv_channels, lmbda=args.lmbda)

    results = {}
    for mode in args.modes.split(","):
        print(f"mode={mode}")
        results[mode] = run_mode(mode, model, batch, args.steps, args.lr)

    if args.out:
        cfg = vars(args)
        with open(args.out, "w") as f:
            json.dump({"config": cfg, "results": results}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
