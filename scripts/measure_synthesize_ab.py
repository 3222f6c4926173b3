"""TPU A/B: deconv lowering (dilated / packed / phase) on the REAL bench
synthesize program, plus end-to-end streamed roundtrip MP/s per impl.

The per-layer A/B (artifacts/deconv_impl_ab.json) measured isolated jits,
where round-2 analysis found XLA's standalone deconv chain anomalously
slow — so the only decisive comparison is the full `_synthesize_from_symbols`
program exactly as the bench dispatches it. MMNC_DECONV_IMPL is read at
import time, so each impl runs in a fresh subprocess.

    python scripts/measure_synthesize_ab.py [--batch-size 512] [--iters 8]

Writes artifacts/synthesize_impl_ab.json. Run on an idle chip only.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
sys.path.insert(0, %(repo)r)
import numpy as np, jax, jax.numpy as jnp
from mmnc_tpu.models import build_model
from mmnc_tpu.models.streaming import stream_roundtrip

bs, iters, dtype_s = %(bs)d, %(iters)d, %(dtype)r
dtype = jnp.bfloat16 if dtype_s == "bf16" else None
kwargs = {} if dtype is None else {"dtype": dtype}
model = build_model(1, ["rgb"], latent_channels=128, conv_channels=100,
                    lmbda=1e-2, **kwargs)
rng = np.random.default_rng(0)
batch = {"rgb": jnp.asarray(rng.random((bs, 256, 256, 3), np.float32))}
variables = model.init(jax.random.PRNGKey(0), batch)
tables = model.update_bottleneck_values(variables)

# --- stage E alone: synthesize program on representative symbols
y_sym, z_sym, _ = jax.device_get(model._compress_device_lean(variables, batch))
y_dev = jnp.asarray(y_sym)
r = model._synthesize_from_symbols(variables, y_dev)
jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(iters):
    r = model._synthesize_from_symbols(variables, y_dev)
jax.block_until_ready(r)
e_ms = (time.perf_counter() - t0) / iters * 1e3

# --- stage A alone (h_a/g_a side, no deconvs; control for chip noise)
r = model._compress_device_lean(variables, batch)
jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(iters):
    r = model._compress_device_lean(variables, batch)
jax.block_until_ready(r)
a_ms = (time.perf_counter() - t0) / iters * 1e3

# --- full pipelined roundtrip (the bench's own measurement)
for x_hats, _ in stream_roundtrip(model, variables, tables, [batch] * 2):
    jax.block_until_ready(x_hats)
t0 = time.perf_counter()
results = list(stream_roundtrip(model, variables, tables, [batch] * iters))
jax.block_until_ready(results[-1][0])
dt = (time.perf_counter() - t0) / iters
mps = bs * 256 * 256 / 1e6 / dt

# checksum so impls can be cross-checked for agreement
chk = float(jnp.mean(jnp.abs(
    results[-1][0]["rgb"].astype(jnp.float32))))
print(json.dumps({"synthesize_ms": round(e_ms, 3),
                  "compress_ms": round(a_ms, 3),
                  "roundtrip_mps": round(mps, 2),
                  "rgb_mean_abs": chk}))
"""


def run_child(impl, bs, iters, dtype):
    env = dict(os.environ, MMNC_DECONV_IMPL=impl)
    code = CHILD % {"repo": REPO, "bs": bs, "iters": iters, "dtype": dtype}
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1200)
    if r.returncode != 0:
        return {"error": r.stderr.strip()[-400:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--impls", default="dilated,packed,phase")
    ap.add_argument("--dtypes", default="bf16,f32")
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "synthesize_impl_ab.json"))
    args = ap.parse_args()

    out = {"batch_size": args.batch_size, "iters": args.iters, "results": {}}
    for dtype in args.dtypes.split(","):
        for impl in args.impls.split(","):
            res = run_child(impl, args.batch_size, args.iters, dtype)
            out["results"][f"{dtype}/{impl}"] = res
            print(f"{dtype}/{impl}: {res}", flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
