"""Name the standalone-jit deconv+IGDN slowness (VERDICT r3 weak #6).

DESIGN.md "Pallas deconv+IGDN epilogue" records the anomaly: the plain XLA
deconv+IGDN chain at (64,64,64,50->50) takes ~5 s per call as a standalone
jit, while the full fused synthesize program runs the same layers in 45 ms.
This script runs a factor matrix over the standalone program to isolate the
trigger:

  * component: deconv only / igdn only / chain / chain+sum-consumer
  * dtype: f32 / bf16
  * deconv lowering: dilated conv_general_dilated / dense 4-phase
  * donate_argnums on x / no donation
  * jit dispatch vs AOT lower+compile once

Per cell it records compile time, per-call run time, and the XLA cost
model's FLOP estimate, then emits a ranked "suspects" list (cells >=10x
slower than the matched fused-path rate). Run SOLO — concurrent TPU
processes time-share (NOTES_ROUND4.md #5).

    python scripts/deconv_anomaly_matrix.py [--h 64] [--c 50] [--iters 5]

Writes artifacts/deconv_anomaly_matrix.json.
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


def make_inputs(bsz, h, cin, cout, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bsz, h, h, cin)), dtype)
    w = jnp.asarray(rng.normal(size=(5, 5, cin, cout)) * 0.1, dtype)
    b = jnp.asarray(rng.normal(size=(cout,)), dtype)
    g = jnp.asarray(rng.random((cout, cout)) * 0.1, dtype)
    bt = jnp.asarray(1 + rng.random((cout,)), dtype)
    return x, w, b, g, bt


def build_fn(component, impl):
    # imported lazily per cell so MMNC_DECONV_IMPL monkey-patching applies
    from mmnc_tpu.ops import layers

    def deconv_(x, w):
        if impl == "phase":
            return layers._deconv_phase_k5s2(x, w)
        return layers._deconv_dilated(x, w, 2)

    def igdn(y, g, bt):
        norm = jnp.einsum("bhwc,oc->bhwo", y * y, g) + bt
        return y * jnp.sqrt(norm)

    if component == "deconv":
        return lambda x, w, b, g, bt: deconv_(x, w) + b
    if component == "igdn":
        # igdn on the deconv's OUTPUT shape (2h x 2h), no deconv involved
        return lambda x, w, b, g, bt: igdn(x, g, bt)
    if component == "chain":
        return lambda x, w, b, g, bt: igdn(deconv_(x, w) + b, g, bt)
    if component == "chain_sum":
        return lambda x, w, b, g, bt: igdn(deconv_(x, w) + b, g, bt).sum()
    raise ValueError(component)


def run_cell(component, impl, dtype_name, donate, aot, bsz, h, cin, cout,
             iters):
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    x, w, b, g, bt = make_inputs(bsz, h, cin, cout, dtype)
    if component == "igdn":
        # feed the post-deconv shape directly
        x = jnp.concatenate([x, x], axis=1)
        x = jnp.concatenate([x, x], axis=2)
        if cin != cout:
            x = x[..., :cout]
    fn = build_fn(component, impl)

    cell = {"component": component, "impl": impl, "dtype": dtype_name,
            "donate": donate, "aot": aot}
    try:
        t0 = time.perf_counter()
        if aot:
            lowered = jax.jit(fn).lower(x, w, b, g, bt)
            compiled = lowered.compile()
            cost = compiled.cost_analysis()
            cell["flops_est"] = float(cost.get("flops", -1)) if cost else -1
            call = compiled
        else:
            call = jax.jit(fn, donate_argnums=(0,) if donate else ())
        out = call(x, w, b, g, bt)
        jax.block_until_ready(out)
        cell["compile_s"] = round(time.perf_counter() - t0, 2)
        if donate:
            # donated x is consumed every call; re-make it outside the clock
            # and time single calls (dispatch overhead included each time)
            times = []
            for _ in range(iters):
                x2 = make_inputs(bsz, h, cin, cout, dtype)[0]
                jax.block_until_ready(x2)
                t0 = time.perf_counter()
                jax.block_until_ready(call(x2, w, b, g, bt))
                times.append(time.perf_counter() - t0)
            cell["run_ms"] = round(float(np.median(times)) * 1e3, 2)
        else:
            t0 = time.perf_counter()
            for _ in range(iters):
                out = call(x, w, b, g, bt)
            jax.block_until_ready(out)
            cell["run_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 2)
    except Exception as e:  # noqa: BLE001 — record, keep sweeping
        cell["error"] = f"{type(e).__name__}: {str(e)[:160]}"
    return cell


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--cin", type=int, default=50)
    ap.add_argument("--cout", type=int, default=50)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="artifacts/deconv_anomaly_matrix.json")
    args = ap.parse_args(argv)

    cells = []
    # core matrix: component x dtype x impl (jit, no donate)
    for component in ("deconv", "igdn", "chain", "chain_sum"):
        for dtype_name in ("f32", "bf16"):
            for impl in ("dilated", "phase"):
                if component == "igdn" and impl == "phase":
                    continue  # igdn has no deconv; skip the duplicate
                cells.append(run_cell(component, impl, dtype_name, False,
                                      False, args.batch_size, args.h,
                                      args.cin, args.cout, args.iters))
                print(json.dumps(cells[-1]))
    # levers on the anomalous config: donation and AOT
    for donate, aot in ((True, False), (False, True)):
        cells.append(run_cell("chain", "dilated", "f32", donate, aot,
                              args.batch_size, args.h, args.cin, args.cout,
                              args.iters))
        print(json.dumps(cells[-1]))

    ok = [c for c in cells if "run_ms" in c]
    slow = sorted(ok, key=lambda c: -c["run_ms"])[:5]
    fast = sorted(ok, key=lambda c: c["run_ms"])[:5]
    report = {
        "config": {"batch_size": args.batch_size, "h": args.h,
                   "cin": args.cin, "cout": args.cout,
                   "device": str(jax.devices()[0])},
        "cells": cells,
        "slowest": slow,
        "fastest": fast,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"-> {args.out}")
    if slow and fast and isinstance(slow[0].get("run_ms"), float):
        print(f"slowest: {slow[0]}")
        print(f"fastest: {fast[0]}")


if __name__ == "__main__":
    main()
