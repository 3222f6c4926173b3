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


def bench_anomaly_chain(iters=5):
    """Reproduce round-2 NOTES #5: a standalone jitted deconv+IGDN chain at
    64-128px reportedly ran in SECONDS while the same layers inside the
    fused synthesize program took ms. Times (a) each chain standalone,
    (b) the equivalent whole-decoder jit, (c) the model's actual
    _decompress_synthesize — all at the bench config — and records
    compile time separately from steady-state (the prime suspect: earlier
    timings folded remote-AOT compile or queue stalls into the first call).
    """
    from mmnc_tpu.models import build_model
    rng = np.random.default_rng(0)
    out = {}

    def timed_split(fn, *args):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        return {"first_call_s": round(first, 3),
                "steady_ms": round((time.perf_counter() - t0) / iters * 1e3,
                                   3)}

    # (a) standalone 2-stage deconv+IGDN chains at the suspect sizes
    for h, cin in [(64, 50), (128, 50)]:
        x = jnp.asarray(rng.normal(size=(64, h, h, cin)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(5, 5, cin, cin)) * 0.05, jnp.float32)
        g = jnp.asarray(rng.random((cin, cin)) * 0.1, jnp.float32)
        bt = jnp.asarray(1 + rng.random((cin,)), jnp.float32)

        def chain(x, w1=w1, g=g, bt=bt):
            y = deconv(x, w1, stride=2)
            n = jnp.einsum("bhwc,oc->bhwo", y * y, g) + bt
            y = y * jnp.sqrt(n)
            y = deconv(y, w1, stride=2)
            n = jnp.einsum("bhwc,oc->bhwo", y * y, g) + bt
            return y * jnp.sqrt(n)

        out[f"standalone_chain_{h}px"] = timed_split(jax.jit(chain), x)

    # (c) the model's fused synthesize program at the bench config
    model = build_model(1, ["rgb"], latent_channels=128, conv_channels=100,
                        lmbda=1e-2)
    batch = {"rgb": jnp.asarray(rng.random((64, 256, 256, 3), np.float32))}
    variables = model.init(jax.random.PRNGKey(0), batch)
    y_hat = jnp.zeros((64, 1, 1, 128), jnp.float32)
    out["fused_synthesize_64"] = timed_split(
        lambda v, y: model._decompress_synthesize(v, y), variables, y_hat)
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
    try:
        report["anomaly_chain"] = bench_anomaly_chain()
        print("anomaly_chain:", report["anomaly_chain"])
    except Exception as e:  # noqa: BLE001
        report["anomaly_chain"] = f"FAILED: {type(e).__name__}"
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/deconv_igdn_timing.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote artifacts/deconv_igdn_timing.json")


if __name__ == "__main__":
    main()
