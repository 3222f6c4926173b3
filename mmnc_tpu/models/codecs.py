"""The four multi-task codec variants with the reference's public surface.

Re-designs the reference model zoo (SURVEY.md C4, C6-C9) as one flax module
(`MultiTaskCodecNet`, variant-switched latent routing) plus thin model
classes carrying the reference API:

* SingleTaskCompressor            (model 1, src/models/single_task_compressor.py)
* MultiTaskMixedLatentCompressor  (model 2, src/models/mixed_latent.py)
* MultiTaskDisjointLatentCompressor (model 3, src/models/disjoint_latent.py)
* MultiTaskSharedLatentCompressor (model 4, src/models/shared_latent.py)

Each exposes constructor kwargs (tasks, input_channels, output_channels,
latent_channels, conv_channels, lmbda, learning rates), `forward(batch)` ->
(x_hats, likelihoods), `compress(batch)`, `decompress(strings, shape)`,
`update_bottleneck_values()` and the loss accounting of
multi_task_compressor.py:420-476 — but as pure functions over a params
pytree, with a single jit'd device path and host-side rANS.

Real-coding geometry note: the reference's as-built 256px geometry
over-generates Gaussian indexes 16x and cannot round-trip decompress
(SURVEY.md §2.4). Training/rate-estimate behavior reproduces that legacy
broadcast by default, but the *real* compress/decompress path always crops
scales to y's spatial shape so that encode:decode is bit-exact.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..entropy.gaussian_conditional import GaussianConditional
from ..entropy.tables import CdfTable, build_eb_table, build_gc_table
from ..entropy import rans
from ..data.task_configs import task_parameters
from .backbone import ScaleHyperprior
from .heads import EncoderHead, DecoderHead, UpsampleStack
from . import losses as L


class MultiTaskCodecNet(nn.Module):
    """Variant-switched multi-task codec graph (NHWC)."""
    variant: str                       # "mixed" | "disjoint" | "shared"
    tasks: Tuple[str, ...]
    input_channels: Tuple[int, ...]
    output_channels: Tuple[int, ...]
    latent_channels: int               # already divisibility-adjusted
    conv_channels: int
    channels_per_task: int             # y-slice width (disjoint/shared)
    use_uncertainty_weighting: bool = True
    legacy_broadcast: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        t = len(self.tasks)
        total = self.conv_channels * t
        self.input_heads = [
            EncoderHead(conv_channels=self.conv_channels, dtype=self.dtype)
            for _ in self.tasks]
        self.compressor = ScaleHyperprior(
            in_channels=total, latent_channels=self.latent_channels,
            use_gs=(self.variant == "mixed"),
            legacy_broadcast=self.legacy_broadcast, dtype=self.dtype)
        if self.variant in ("disjoint", "shared"):
            self.upsamples = [
                UpsampleStack(conv_channels=self.conv_channels, n_tasks=t,
                              dtype=self.dtype)
                for _ in self.tasks]
        self.output_heads = [
            DecoderHead(out_channels=oc, dtype=self.dtype)
            for oc in self.output_channels]
        if self.use_uncertainty_weighting:
            self.log_vars = self.param(
                "log_vars", nn.initializers.zeros, (t,), jnp.float32)

    # --- encode side -------------------------------------------------------

    def encode_heads(self, batch) -> jnp.ndarray:
        """{task: (B,H,W,C_t)} -> (B, H/32, W/32, conv_channels * n_tasks)."""
        outs = [head(batch[task].astype(self.dtype))
                for task, head in zip(self.tasks, self.input_heads)]
        return jnp.concatenate(outs, axis=-1)

    def analyze(self, batch):
        stacked = self.encode_heads(batch)
        return self.compressor.analyze(stacked)

    # --- decode side -------------------------------------------------------

    def _task_slice(self, u, i):
        c = self.channels_per_task
        return u[..., i * c:(i + 1) * c]

    def decode_one_head(self, u, i: int) -> jnp.ndarray:
        """Decode task i from the synthesized tensor / raw y_hat."""
        if self.variant == "mixed":
            v = u
        elif self.variant == "disjoint":
            v = self._task_slice(u, i)
        else:  # shared: own slice + the last (shared) block
            c = self.channels_per_task
            v = jnp.concatenate([self._task_slice(u, i), u[..., -c:]],
                                axis=-1)
        if self.variant in ("disjoint", "shared"):
            v = self.upsamples[i](v)
        return self.output_heads[i](v)

    def decode_heads(self, u) -> Dict[str, jnp.ndarray]:
        """Route the synthesized tensor (mixed) or raw y_hat (disjoint/
        shared) into the per-task decoder heads."""
        return {task: self.decode_one_head(u, i)
                for i, task in enumerate(self.tasks)}

    def synthesize_one_task(self, y_hat, i: int):
        return self.decode_one_head(self.compressor.synthesize(y_hat), i)

    def synthesize_from_y(self, y_hat):
        return self.decode_heads(self.compressor.synthesize(y_hat))

    def hyper_synthesize(self, z_hat):
        return self.compressor.hyper_synthesize(z_hat)

    def eb_medians(self):
        return self.compressor.eb_medians()

    def aux_loss(self):
        return self.compressor.aux_loss()

    def get_log_vars(self):
        return self.log_vars if self.use_uncertainty_weighting else None

    # --- full forward ------------------------------------------------------

    def __call__(self, batch, training: bool = True):
        stacked = self.encode_heads(batch)
        out = self.compressor(stacked, training=training)
        x_hats = self.decode_heads(out["x_hat"])
        return x_hats, out["likelihoods"]


@dataclass
class CodecTables:
    """Host-side range-coding state built from trained params
    (the reference's update_bottleneck_values() product, SURVEY.md §5
    checkpoint notes)."""
    eb: CdfTable
    eb_medians: np.ndarray
    gc: CdfTable


class MultiTaskCompressorBase:
    """Shared machinery of the four codecs; functional over a params pytree."""

    variant = "mixed"
    weighting = "uncertainty"  # or "none"

    def __init__(
        self,
        tasks: Tuple[str, ...],
        input_channels: Tuple[int, ...],
        output_channels: Tuple[int, ...],
        latent_channels: int,
        conv_channels: int,
        lmbda: float = 1.0,
        learning_rate_main: float = 1e-5,
        learning_rate_aux: float = 1e-3,
        legacy_broadcast: bool = True,
        dtype: Any = jnp.float32,
        compressor_backbone_class: Optional[type] = None,  # API parity; the
        # backbone is always the native ScaleHyperprior flax module
        **kwargs,
    ):
        tasks = tuple(tasks)
        assert len(tasks) == len(tuple(input_channels))
        self.tasks = tasks
        self.n_tasks = len(tasks)
        self.input_channels = tuple(input_channels)
        self.output_channels = tuple(output_channels)
        self.conv_channels = conv_channels
        self.lmbda = lmbda
        self.learning_rate_main = learning_rate_main
        self.learning_rate_aux = learning_rate_aux
        self.legacy_broadcast = legacy_broadcast

        latent_channels, channels_per_task = self._adjust_latent(latent_channels)
        self.latent_channels = latent_channels
        self.channels_per_task = channels_per_task

        self.loss_types = {t: task_parameters[t]["loss_function"] for t in tasks}

        self.net = MultiTaskCodecNet(
            variant=self.variant,
            tasks=tasks,
            input_channels=self.input_channels,
            output_channels=self.output_channels,
            latent_channels=latent_channels,
            conv_channels=conv_channels,
            channels_per_task=channels_per_task,
            use_uncertainty_weighting=(self.weighting == "uncertainty"),
            legacy_broadcast=legacy_broadcast,
            dtype=dtype,
        )

        # self-describing checkpoints (reference save_hyperparameters(),
        # multi_task_compressor.py:64)
        self.hyper_parameters = dict(
            model_class=type(self).__name__,
            tasks=list(tasks),
            input_channels=list(self.input_channels),
            output_channels=list(self.output_channels),
            latent_channels=int(latent_channels),
            conv_channels=int(conv_channels),
            lmbda=float(lmbda),
            learning_rate_main=float(learning_rate_main),
            learning_rate_aux=float(learning_rate_aux),
            legacy_broadcast=bool(legacy_broadcast),
        )

    # variant hooks -------------------------------------------------------

    def _adjust_latent(self, m: int) -> Tuple[int, int]:
        return m, m  # mixed: no split

    def _compression_loss(self, likelihoods, x_hats):
        return L.compression_loss_mixed(likelihoods, x_hats, self.tasks)

    # core API ------------------------------------------------------------

    def get_model_name(self):
        return type(self).__name__

    def corrected_geometry_twin(self):
        """Same architecture/params with `legacy_broadcast=False`: rate is
        estimated over y's true spatial support instead of the reference's
        16x-overcounting broadcast (SURVEY.md §2.4). The twin shares this
        model's params pytree — only likelihood geometry differs — so it is
        the like-for-like comparator for real bitstream bytes
        (reference print_info, multi_task_compressor.py:520-532)."""
        if not self.legacy_broadcast:
            return self
        # memoized: a fresh instance per call would be a new identity-hashed
        # static jit argument — every caller's batch would retrace/recompile
        twin = getattr(self, "_corrected_twin", None)
        if twin is None:
            twin = type(self)(
                tasks=self.tasks, input_channels=self.input_channels,
                output_channels=self.output_channels,
                latent_channels=self.latent_channels,
                conv_channels=self.conv_channels, lmbda=self.lmbda,
                learning_rate_main=self.learning_rate_main,
                learning_rate_aux=self.learning_rate_aux,
                legacy_broadcast=False, dtype=self.net.dtype)
            self._corrected_twin = twin
        return twin

    def example_batch(self, batch_size=1, image_size=256, rng=None, seed=0):
        """Random batch with valid per-task ranges (host numpy — cheap)."""
        nprng = np.random.default_rng(seed)
        batch = {}
        for task, c in zip(self.tasks, self.input_channels):
            x = nprng.random(
                (batch_size, image_size, image_size, c)).astype(np.float32)
            if task == "semantic":
                x = np.floor(x * 16.99)
            batch[task] = jnp.asarray(x)
        return batch

    def init(self, rng, batch=None, image_size=256):
        """Initialize params. The whole flax init is wrapped in one jit so it
        compiles (and persistently caches) as a single XLA program instead of
        dispatching hundreds of eager ops."""
        if batch is None:
            batch = self.example_batch(image_size=image_size)
        p_rng, n_rng = jax.random.split(jax.random.fold_in(rng, 1))
        init_fn = jax.jit(partial(self.net.init, training=True))
        return init_fn({"params": p_rng, "noise": n_rng}, batch)

    @partial(jax.jit, static_argnums=0)
    def _eval_forward(self, variables, batch):
        return self.net.apply(variables, batch, training=False)

    def forward(self, variables, batch, rng=None, training=False):
        """-> (x_hats, likelihoods); reference forward()
        (multi_task_compressor.py:491-505). Deterministic eval calls go
        through a jitted path (an eager apply costs one dispatch round trip
        per op on the tunneled TPU)."""
        if not training:
            return self._eval_forward(variables, batch)
        rngs = {"noise": rng} if rng is not None else None
        return self.net.apply(variables, batch, training=True, rngs=rngs)

    def loss_and_logs(self, variables, batch, rng=None, training=True):
        """Total loss = lmbda * weighted_rec + rate (reference __step,
        multi_task_compressor.py:420-447)."""
        x_hats, likelihoods = self.forward(variables, batch, rng, training)
        log_vars = None
        if self.weighting == "uncertainty":
            log_vars = variables["params"]["log_vars"]
        rec, rec_logs = L.multitask_reconstruction_loss(
            batch, x_hats, self.tasks, self.loss_types, log_vars)
        comp, comp_logs = self._compression_loss(likelihoods, x_hats)
        loss = self.lmbda * rec + comp
        logs = {"rec_loss": rec, "compression_loss": comp, "loss": loss}
        logs.update(rec_logs)
        logs.update(comp_logs)
        return loss, (logs, x_hats, likelihoods)

    def aux_loss(self, variables):
        return self.net.apply(variables, method=MultiTaskCodecNet.aux_loss)

    def variant_slices(self):
        """[(name, lo, hi)] y-channel ownership per task (None for mixed)."""
        if self.variant == "mixed":
            return None
        c = self.channels_per_task
        slices = [(t, i * c, (i + 1) * c) for i, t in enumerate(self.tasks)]
        if self.variant == "shared":
            slices.append(("shared", self.latent_channels - c,
                           self.latent_channels))
        return slices

    @partial(jax.jit, static_argnums=0)
    def encode_eval(self, variables, batch):
        """Deterministic quantized latents (y_hat, z_hat) for analysis."""
        y, z = self.net.apply(variables, batch,
                              method=MultiTaskCodecNet.analyze)
        medians = self.net.apply(variables,
                                 method=MultiTaskCodecNet.eb_medians)
        med = medians[None, None, None, :]
        z_hat = jnp.round(z - med) + med
        return jnp.round(y), z_hat

    @partial(jax.jit, static_argnums=0)
    def decode_from_latents(self, variables, y_hat, z_hat):
        """Latents -> {task: reconstruction} (analysis/probing path)."""
        del z_hat  # scales only affect rate, not the reconstruction
        return self.net.apply(variables, y_hat,
                              method=MultiTaskCodecNet.synthesize_from_y)

    # real coding ---------------------------------------------------------

    def update_bottleneck_values(self, variables) -> CodecTables:
        eb_params = variables["params"]["compressor"]["entropy_bottleneck"]
        eb_params = jax.device_get(eb_params)
        table, medians = build_eb_table(
            dict(eb_params), np.asarray(eb_params["quantiles"]))
        return CodecTables(eb=table, eb_medians=medians, gc=build_gc_table())

    @partial(jax.jit, static_argnums=0)
    def _compress_device(self, variables, batch):
        y, z = self.net.apply(variables, batch,
                              method=MultiTaskCodecNet.analyze)
        medians = self.net.apply(variables,
                                 method=MultiTaskCodecNet.eb_medians)
        med = medians[None, None, None, :]
        z_sym = jnp.round(z - med)
        z_hat = z_sym + med
        scales = self.net.apply(variables, z_hat,
                                method=MultiTaskCodecNet.hyper_synthesize)
        scales = scales[:, :y.shape[1], :y.shape[2], :]  # coding geometry
        indexes = GaussianConditional.build_indexes(scales)
        y_sym = jnp.round(y).astype(jnp.int32)
        return y_sym, z_sym.astype(jnp.int32), indexes

    @partial(jax.jit, static_argnums=0)
    def _compress_device_lean(self, variables, batch):
        """Transfer-lean compress program for the streaming pipeline
        (models/streaming.py): g_a + h_a + quantize ONLY — no h_s and no
        build_indexes, because the pipeline recomputes y's CDF-row indexes
        from the *decoded* z on device (_decompress_indexes), exactly as the
        real decoder does, so shipping them from the encoder is redundant.
        Symbols cross the slow host link as int16 (half of int32); max_abs
        guards the narrowing — the caller must fall back to
        _compress_device when it reaches 2^15."""
        y, z = self.net.apply(variables, batch,
                              method=MultiTaskCodecNet.analyze)
        medians = self.net.apply(variables,
                                 method=MultiTaskCodecNet.eb_medians)
        z_sym = jnp.round(z - medians[None, None, None, :])
        y_sym = jnp.round(y)
        max_abs = jnp.maximum(jnp.max(jnp.abs(y_sym)),
                              jnp.max(jnp.abs(z_sym))).astype(jnp.int32)
        return (y_sym.astype(jnp.int16), z_sym.astype(jnp.int16), max_abs)

    @partial(jax.jit, static_argnums=0)
    def _compress_device_fused(self, variables, batch):
        """One-dispatch compress program for the v2 streaming pipeline
        (models/streaming.py): g_a + h_a + quantize + h_s + build_indexes.
        Returns (y_sym i16, z_sym i16, dec_idx u8, max_abs).

        Versus _compress_device_lean + _decompress_indexes_u8 this folds
        the decoder's index program into the encoder dispatch, removing one
        device program, one H2D (decoded z) and one D2H sync (indexes) per
        batch from the hot loop. Soundness: the indexes here are computed
        from the encoder's quantized z, and the decoder's would come from
        the DECODED z — but z's rANS coding is lossless, so the two inputs
        are bit-identical; the v2 pipeline asserts z_dec == z_sym on the
        host before using the stream (and falls back to recomputing
        indexes from z_dec if the assert ever failed). Same stream-compat
        caveat as the lean pipeline (module docstring): the index math
        lives in a differently-fused jit program, byte-equality with
        model.compress(packed=True) is asserted in tests/test_streaming.py.
        """
        y, z = self.net.apply(variables, batch,
                              method=MultiTaskCodecNet.analyze)
        medians = self.net.apply(variables,
                                 method=MultiTaskCodecNet.eb_medians)
        med = medians[None, None, None, :]
        z_sym = jnp.round(z - med)
        scales = self.net.apply(variables, z_sym + med,
                                method=MultiTaskCodecNet.hyper_synthesize)
        scales = scales[:, :y.shape[1], :y.shape[2], :]
        indexes = GaussianConditional.build_indexes(scales).astype(jnp.uint8)
        y_sym = jnp.round(y)
        max_abs = jnp.maximum(jnp.max(jnp.abs(y_sym)),
                              jnp.max(jnp.abs(z_sym))).astype(jnp.int32)
        return (y_sym.astype(jnp.int16), z_sym.astype(jnp.int16),
                indexes, max_abs)

    @partial(jax.jit, static_argnums=(0, 3))
    def _decompress_indexes_u8(self, variables, z_sym, y_shape):
        """_decompress_indexes with a uint8 result (the Gaussian scale table
        has 64 rows) — quarters the index D2H on the tunneled host link."""
        return self._decompress_indexes(
            variables, z_sym, y_shape).astype(jnp.uint8)

    @partial(jax.jit, static_argnums=0)
    def _synthesize_from_symbols(self, variables, y_sym):
        """_decompress_synthesize taking int16 y symbols (== y_hat values):
        the f32 cast happens on device so the H2D ships 2 bytes/symbol."""
        return self._decompress_synthesize(
            variables, y_sym.astype(jnp.float32))

    def compress(self, variables, tables: CodecTables, batch,
                 print_info: bool = False, packed: bool = True):
        """-> dict(strings=[y_strings, z_strings], shape, y_shape,
        batch_size), n_bytes (reference compress(),
        multi_task_compressor.py:507-534).

        packed=True (default) codes the whole batch's y (and z) symbols as
        ONE rANS stream each, so the 8-byte state flush amortizes per batch
        instead of per image — the reference's per-image strings cost ~15%
        extra at demo-scale rates and 100%+ near zero rate (check_bpp
        estimate-vs-real semantics, check_bpp.ipynb cells 5-7). packed=False
        reproduces the reference's per-image string layout."""
        y_sym, z_sym, indexes = jax.device_get(
            self._compress_device(variables, batch))
        b, zh, zw, zc = z_sym.shape

        if packed:
            z_idx = np.broadcast_to(
                np.arange(zc, dtype=np.int32), z_sym.shape).ravel()
            y_strings = [rans.encode_with_indexes(
                y_sym.ravel(), indexes.ravel(), tables.gc)]
            z_strings = [rans.encode_with_indexes(
                z_sym.ravel(), z_idx, tables.eb)]
        else:
            z_idx = np.broadcast_to(
                np.arange(zc, dtype=np.int32), z_sym.shape[1:]).ravel()
            y_strings, z_strings = [], []
            for i in range(b):
                y_strings.append(rans.encode_with_indexes(
                    y_sym[i].ravel(), indexes[i].ravel(), tables.gc))
                z_strings.append(rans.encode_with_indexes(
                    z_sym[i].ravel(), z_idx, tables.eb))

        n_bytes = sum(len(s) for s in y_strings) + sum(len(s) for s in z_strings)
        ans = {"strings": [y_strings, z_strings],
               "shape": (zh, zw),
               "y_shape": tuple(y_sym.shape[1:3]),
               "batch_size": b}
        if print_info:
            t0 = self.tasks[0]
            bb, hh, ww, _ = np.asarray(batch[t0]).shape
            bpp = n_bytes * 8 / bb / hh / ww / self.n_tasks
            print(f"Number of actual bytes in a string is: {n_bytes}, "
                  f"which gives a BPP = {bpp:.3f}")
        return ans, n_bytes

    @partial(jax.jit, static_argnums=(0, 3))
    def _decompress_indexes(self, variables, z_sym, y_shape):
        """z symbols -> Gaussian CDF-row indexes for y, fully on device
        (the eager build_indexes loop would cost one tunnel RTT per scale
        table entry)."""
        medians = self.net.apply(variables,
                                 method=MultiTaskCodecNet.eb_medians)
        z_hat = z_sym.astype(jnp.float32) + medians[None, None, None, :]
        scales = self.net.apply(variables, z_hat,
                                method=MultiTaskCodecNet.hyper_synthesize)
        scales = scales[:, :y_shape[0], :y_shape[1], :]
        return GaussianConditional.build_indexes(scales)

    @partial(jax.jit, static_argnums=0)
    def _decompress_synthesize(self, variables, y_hat):
        return self.net.apply(variables, y_hat,
                              method=MultiTaskCodecNet.synthesize_from_y)

    def decompress(self, variables, tables: CodecTables, strings,
                   shape=None, y_shape=None, batch_size=None):
        """strings=[y_strings, z_strings] -> {task: reconstruction}
        (reference decompress(), multi_task_compressor.py:536-549 — without
        the stock [0,1] clamp, like the reference).

        Accepts both stream layouts: per-image strings (reference layout)
        and the packed one-stream-per-batch layout (pass `batch_size` from
        the compress() ans dict; with one string and batch_size > 1 the
        stream is decoded as batch_size items). The whole compress() ans
        dict may be passed as `strings` — shape/y_shape/batch_size are then
        taken from it, which avoids the foot-gun of decoding a packed
        batch-of-N stream as one image by forgetting batch_size."""
        if isinstance(strings, dict):  # a compress() ans dict
            ans = strings
            strings = ans["strings"]
            shape = ans["shape"]
            y_shape = ans.get("y_shape", y_shape)
            batch_size = ans.get("batch_size", batch_size)
        assert shape is not None, "shape required (or pass the ans dict)"
        y_strings, z_strings = strings
        zh, zw = shape
        zc = self.conv_channels * self.n_tasks
        if y_shape is None:
            y_shape = (zh * 4, zw * 4)  # two stride-2 hyper convs
        b = batch_size if batch_size is not None else len(z_strings)
        packed = len(z_strings) == 1 and b > 1

        if packed:
            z_idx = np.broadcast_to(
                np.arange(zc, dtype=np.int32), (b, zh, zw, zc)).ravel()
            z_sym = rans.decode_with_indexes(
                z_strings[0], z_idx, tables.eb).reshape(b, zh, zw, zc)
        else:
            z_idx = np.broadcast_to(
                np.arange(zc, dtype=np.int32), (zh, zw, zc)).ravel()
            z_sym = np.stack([
                rans.decode_with_indexes(s, z_idx, tables.eb
                                         ).reshape(zh, zw, zc)
                for s in z_strings])

        indexes = jax.device_get(self._decompress_indexes(
            variables, jnp.asarray(z_sym), tuple(y_shape)))

        m = self.latent_channels
        if packed:
            y_sym = rans.decode_with_indexes(
                y_strings[0], indexes.ravel(), tables.gc
            ).reshape(b, y_shape[0], y_shape[1], m)
        else:
            y_sym = np.stack([
                rans.decode_with_indexes(
                    y_strings[i], indexes[i].ravel(), tables.gc
                ).reshape(y_shape[0], y_shape[1], m)
                for i in range(b)])
        y_hat = jnp.asarray(y_sym, jnp.float32)
        return self._decompress_synthesize(variables, y_hat)


    # --- per-task partial coding (disjoint/shared only) -------------------
    # The separable-latent designs exist so a SUBSET of tasks can be decoded
    # from a subset of the code (reference rationale,
    # src/models/disjoint_latent.py docstring) — but the reference encodes
    # y as one stream and never implements partial decode. Here each task
    # slice (plus the shared block and z) is its own rANS stream.

    def compress_partial(self, variables, tables: CodecTables, batch):
        """-> (ans dict with per-slice streams, total_bytes).

        Each slice is one packed stream covering the whole batch (flush
        overhead amortizes per batch); slices stay separate streams so a
        task subset remains independently decodable."""
        slices = self.variant_slices()
        assert slices is not None, "partial coding needs disjoint/shared"
        y_sym, z_sym, indexes = jax.device_get(
            self._compress_device(variables, batch))
        b, zh, zw, zc = z_sym.shape
        z_idx = np.broadcast_to(
            np.arange(zc, dtype=np.int32), z_sym.shape).ravel()

        streams = {}
        total = 0
        for name, lo, hi in slices:
            s = rans.encode_with_indexes(
                np.ascontiguousarray(y_sym[..., lo:hi]).ravel(),
                np.ascontiguousarray(indexes[..., lo:hi]).ravel(), tables.gc)
            streams[name] = [s]
            total += len(s)
        zs = rans.encode_with_indexes(z_sym.ravel(), z_idx, tables.eb)
        z_strings = [zs]
        total += len(zs)
        ans = {"task_streams": streams, "z_strings": z_strings,
               "shape": (zh, zw), "y_shape": tuple(y_sym.shape[1:3]),
               "batch_size": b}
        return ans, total

    @partial(jax.jit, static_argnums=(0, 3))
    def _synthesize_task(self, variables, y_hat, task_index):
        return self.net.apply(
            variables, y_hat, task_index,
            method=MultiTaskCodecNet.synthesize_one_task)

    def decompress_tasks(self, variables, tables: CodecTables, ans,
                         tasks) -> Dict[str, jnp.ndarray]:
        """Decode only `tasks` using only their slice streams (+ shared/z)."""
        slices = {name: (lo, hi) for name, lo, hi in self.variant_slices()}
        needed = list(tasks)
        slice_names = list(needed)
        if self.variant == "shared":
            slice_names.append("shared")

        zh, zw = ans["shape"]
        y_shape = ans["y_shape"]
        zc = self.conv_channels * self.n_tasks
        b = ans.get("batch_size", len(ans["z_strings"]))
        z_packed = len(ans["z_strings"]) == 1 and b > 1

        if z_packed:
            z_idx = np.broadcast_to(
                np.arange(zc, dtype=np.int32), (b, zh, zw, zc)).ravel()
            z_sym = rans.decode_with_indexes(
                ans["z_strings"][0], z_idx, tables.eb).reshape(b, zh, zw, zc)
        else:
            z_idx = np.broadcast_to(
                np.arange(zc, dtype=np.int32), (zh, zw, zc)).ravel()
            z_sym = np.stack([
                rans.decode_with_indexes(s, z_idx, tables.eb
                                         ).reshape(zh, zw, zc)
                for s in ans["z_strings"]])
        indexes = jax.device_get(self._decompress_indexes(
            variables, jnp.asarray(z_sym), tuple(y_shape)))

        y_hat = np.zeros((b, *y_shape, self.latent_channels), np.float32)
        for name in slice_names:
            lo, hi = slices[name]
            streams = ans["task_streams"][name]
            if len(streams) == 1:  # packed slice stream covering the batch
                y_hat[..., lo:hi] = rans.decode_with_indexes(
                    streams[0],
                    np.ascontiguousarray(indexes[..., lo:hi]).ravel(),
                    tables.gc).reshape(b, *y_shape, hi - lo)
            else:
                for i in range(b):
                    y_hat[i, ..., lo:hi] = rans.decode_with_indexes(
                        streams[i], indexes[i, ..., lo:hi].ravel(), tables.gc
                    ).reshape(*y_shape, hi - lo)

        y_hat = jnp.asarray(y_hat)
        out = {}
        for t in needed:
            ti = self.tasks.index(t)
            out[t] = self._synthesize_task(variables, y_hat, ti)
        return out


class MultiTaskMixedLatentCompressor(MultiTaskCompressorBase):
    """Model 2: one mixed latent for all tasks (src/models/mixed_latent.py)."""
    variant = "mixed"
    weighting = "uncertainty"


class SingleTaskCompressor(MultiTaskMixedLatentCompressor):
    """Model 1: per-task baseline (src/models/single_task_compressor.py) —
    mixed machinery with one task and no loss balancing."""
    weighting = "none"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert self.n_tasks == 1, "SingleTaskCompressor takes exactly one task"


class MultiTaskDisjointLatentCompressor(MultiTaskCompressorBase):
    """Model 3: latent partitioned per task; any subset of tasks decodable
    from its channel slice (src/models/disjoint_latent.py)."""
    variant = "disjoint"
    weighting = "uncertainty"

    def _adjust_latent(self, m):
        per_task = m // self.n_tasks
        adjusted = per_task * self.n_tasks
        if adjusted != m:
            print(f"!! latent_channels {m} is not a multiple of n_tasks "
                  f"{self.n_tasks}; auto-adjusted to {adjusted}")
        return adjusted, per_task

    def _compression_loss(self, likelihoods, x_hats):
        return L.compression_loss_disjoint(
            likelihoods, x_hats, self.tasks, self.channels_per_task)


class MultiTaskSharedLatentCompressor(MultiTaskDisjointLatentCompressor):
    """Model 4: per-task slices plus one shared slice stored once
    (src/models/shared_latent.py)."""
    variant = "shared"

    def _adjust_latent(self, m):
        blocks = self.n_tasks + 1
        per_task = m // blocks
        adjusted = per_task * blocks
        if adjusted != m:
            print(f"!! latent_channels {m} adjusted to {adjusted} so each "
                  f"task and the shared part get equal channel blocks")
        return adjusted, per_task

    def _compression_loss(self, likelihoods, x_hats):
        return L.compression_loss_shared(
            likelihoods, x_hats, self.tasks, self.channels_per_task)


MODEL_NUMBER = {
    1: SingleTaskCompressor,
    2: MultiTaskMixedLatentCompressor,
    3: MultiTaskDisjointLatentCompressor,
    4: MultiTaskSharedLatentCompressor,
}

MODEL_NAME = {cls.__name__: cls for cls in MODEL_NUMBER.values()}


def build_model(model, tasks, latent_channels, conv_channels, **kwargs):
    """Construct a codec from the task registry (reference train.py:236-253)."""
    cls = MODEL_NUMBER[model] if isinstance(model, int) else MODEL_NAME[model]
    input_channels = tuple(task_parameters[t]["in_channels"] for t in tasks)
    output_channels = tuple(task_parameters[t]["out_channels"] for t in tasks)
    return cls(tasks=tuple(tasks), input_channels=input_channels,
               output_channels=output_channels,
               latent_channels=latent_channels, conv_channels=conv_channels,
               **kwargs)
