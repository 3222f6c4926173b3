"""TPU timing: fused deconv+IGDN Pallas kernel vs the XLA chain.

Measures the decoder's hot shapes (output-head deconv+IGDN stages at the
bench config and the flagship upsample-stack stages). Records the verdict
for DESIGN.md per the measure-first rule (round-1 NOTES #4 / VERDICT #10).

    python scripts/measure_deconv_igdn.py
"""

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

from mmnc_tpu.ops import layers
from mmnc_tpu.ops.layers import deconv
from mmnc_tpu.ops.deconv_igdn_pallas import deconv_igdn_pallas


def xla_chain(x, w, b, gamma, beta):
    y = deconv(x, w, stride=2) + b
    norm = jnp.einsum("bhwc,oc->bhwo", y * y, gamma) + beta
    return y * jnp.sqrt(norm)


def bench_one(bsz, h, w_, cin, cout, iters=20):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bsz, h, w_, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 5, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    g = jnp.asarray(rng.random((cout, cout)) * 0.1, jnp.float32)
    bt = jnp.asarray(1 + rng.random((cout,)), jnp.float32)

    f_xla = jax.jit(xla_chain)
    f_pl = jax.jit(lambda *a: deconv_igdn_pallas(*a, mode="igdn"))

    out = {}
    for name, fn, args in [("xla", f_xla, (x, w, b, g, bt)),
                           ("pallas", f_pl, (x, w, b, g, bt))]:
        try:
            r = fn(*args)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(*args)
            jax.block_until_ready(r)
            out[name] = (time.perf_counter() - t0) / iters * 1e3
        except Exception as e:  # noqa: BLE001
            out[name] = f"FAILED: {type(e).__name__}: {str(e)[:120]}"
    if all(isinstance(v, float) for v in out.values()):
        np.testing.assert_allclose(
            np.asarray(f_pl(x, w, b, g, bt)),
            np.asarray(f_xla(x, w, b, g, bt)), rtol=2e-2, atol=2e-3)
        out["speedup_xla_over_pallas"] = round(out["pallas"] / out["xla"], 3)
    return out


def bench_deconv_impls(bsz, h, w_, cin, cout, iters=30, dtype=jnp.float32):
    """A/B the two deconv lowerings (dilated conv vs dense 4-phase)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bsz, h, w_, cin)), dtype)
    w = jnp.asarray(rng.normal(size=(5, 5, cin, cout)) * 0.1, dtype)
    f_dil = jax.jit(lambda a, b: layers._deconv_dilated(a, b, 2))
    f_ph = jax.jit(layers._deconv_phase_k5s2)
    out = {}
    for name, fn in [("dilated_ms", f_dil), ("phase_ms", f_ph)]:
        r = fn(x, w)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(x, w)
        jax.block_until_ready(r)
        out[name] = (time.perf_counter() - t0) / iters * 1e3
    np.testing.assert_allclose(np.asarray(f_ph(x, w)),
                               np.asarray(f_dil(x, w)), rtol=2e-2, atol=2e-3)
    out["speedup_phase"] = round(out["dilated_ms"] / out["phase_ms"], 3)
    return out


def main():
    # decoder-realistic stages: (B, H, W, Cin, Cout)
    shapes = [
        (64, 16, 16, 100, 50),    # bench output head, early
        (64, 64, 64, 50, 50),     # bench output head, mid
        (64, 128, 128, 50, 3),    # bench output head, final upsample
        (64, 8, 8, 300, 150),     # flagship g_s-equivalent first stage
        (256, 32, 32, 64, 64),    # generic large-batch mid stage
    ]
    report = {"device": str(jax.devices()[0]), "shapes": {},
              "deconv_impls": {}}
    for s in shapes:
        key = "x".join(map(str, s))
        report["shapes"][key] = bench_one(*s)
        print(key, report["shapes"][key])
        try:
            report["deconv_impls"][key] = bench_deconv_impls(*s)
        except Exception as e:  # noqa: BLE001 — record, keep measuring
            report["deconv_impls"][key] = f"FAILED: {type(e).__name__}"
        print("  impls:", report["deconv_impls"][key])
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/deconv_igdn_timing.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote artifacts/deconv_igdn_timing.json")


if __name__ == "__main__":
    main()
