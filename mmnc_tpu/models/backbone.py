"""ScaleHyperprior backbone (Balle et al. 2018) as a flax module.

From-scratch JAX re-design of the reference's injected backbone
(compressai.models.google.ScaleHyperprior, SURVEY.md X1; instantiated and
surgically re-headed by the reference at
src/models/multi_task_compressor.py:179-193):

* g_a (analysis):  4x [conv5x5 s2 + GDN], in_ch -> N -> N -> N -> M
* g_s (synthesis): 4x [deconv5x5 s2 + IGDN-except-last], M -> N -> N -> N -> out_ch
* h_a (hyper-analysis, over |y|): conv3x3 s1 -> ReLU -> conv5x5 s2 -> ReLU
  -> conv5x5 s2, M -> N -> N -> N
* h_s (hyper-synthesis): deconv s2 -> ReLU -> deconv s2 -> ReLU
  -> conv3x3 s1 -> ReLU, N -> N -> N -> M

The reference patches g_a[0]/g_s[-1] to width `conv_channels * n_tasks`
because CompressAI hardcodes 3 image channels; here the constructor takes
`in_channels` natively (same math, honest API). `use_gs=False` amputates
the synthesis transform as the disjoint/shared variants do
(src/models/disjoint_latent.py:179, g_s = DummyModule).

Geometry: `legacy_broadcast=True` (default) reproduces the as-built
reference behavior where h_s's output spatial dims can exceed y's and the
Gaussian likelihood broadcasts (SURVEY.md §2.4 "critical geometry quirk").
`False` corner-crops scales (top-left `[:, :Hy, :Wy, :]`) to y's spatial
shape — the corrected layout. NOTE: it is a CORNER crop, not a center
crop, and `_compress_device` uses the SAME corner crop, so encode and
decode agree and streams stay bit-exact; do not "fix" one side to a
center crop without the other (codecs.py:363, _scales_for below).
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.layers import Conv, Deconv, GDN
from ..entropy.entropy_bottleneck import EntropyBottleneck
from ..entropy.gaussian_conditional import GaussianConditional


class AnalysisTransform(nn.Module):
    n: int
    m: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for feat in (self.n, self.n, self.n):
            x = Conv(features=feat, dtype=self.dtype)(x)
            x = GDN(dtype=self.dtype)(x)
        return Conv(features=self.m, dtype=self.dtype)(x)


class SynthesisTransform(nn.Module):
    n: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for feat in (self.n, self.n, self.n):
            x = Deconv(features=feat, dtype=self.dtype)(x)
            x = GDN(inverse=True, dtype=self.dtype)(x)
        return Deconv(features=self.out, dtype=self.dtype)(x)


class HyperAnalysis(nn.Module):
    n: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y):
        x = Conv(features=self.n, kernel_size=3, stride=1, dtype=self.dtype)(jnp.abs(y))
        x = nn.relu(x)
        x = Conv(features=self.n, dtype=self.dtype)(x)
        x = nn.relu(x)
        return Conv(features=self.n, dtype=self.dtype)(x)


class HyperSynthesis(nn.Module):
    n: int
    m: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z_hat):
        x = Deconv(features=self.n, dtype=self.dtype)(z_hat)
        x = nn.relu(x)
        x = Deconv(features=self.n, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv(features=self.m, kernel_size=3, stride=1, dtype=self.dtype)(x)
        return nn.relu(x)


class ScaleHyperprior(nn.Module):
    """in_channels -> latent y (M channels) with a hyperprior over scales."""
    in_channels: int    # N: conv width AND input width (reference surgery)
    latent_channels: int  # M
    use_gs: bool = True
    legacy_broadcast: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        n, m = self.in_channels, self.latent_channels
        self.g_a = AnalysisTransform(n=n, m=m, dtype=self.dtype)
        if self.use_gs:
            self.g_s = SynthesisTransform(n=n, out=n, dtype=self.dtype)
        self.h_a = HyperAnalysis(n=n, dtype=self.dtype)
        self.h_s = HyperSynthesis(n=n, m=m, dtype=self.dtype)
        self.entropy_bottleneck = EntropyBottleneck(channels=n)

    def _scales_for(self, scales, y):
        if self.legacy_broadcast:
            return scales
        return scales[:, :y.shape[1], :y.shape[2], :]

    def __call__(self, x, training: bool = True):
        """x: (B,H,W,in_ch) -> dict(x_hat, likelihoods={y,z}, y_hat, z_hat).

        In training mode needs an rng collection {"noise": key}.
        """
        y = self.g_a(x)
        z = self.h_a(y)
        if training:
            rng_z, rng_y = jax.random.split(self.make_rng("noise"))
        else:
            rng_z = rng_y = None
        z_hat, z_lik = self.entropy_bottleneck(z, rng=rng_z, training=training)
        scales = self._scales_for(self.h_s(z_hat), y)
        y_hat = GaussianConditional.quantize(y, rng=rng_y, training=training)
        y_lik = GaussianConditional.likelihood(y_hat, scales)
        x_hat = self.g_s(y_hat) if self.use_gs else y_hat
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
            "y_hat": y_hat,
            "z_hat": z_hat,
        }

    def analyze(self, x):
        """Deterministic encode path for real compression: x -> (y, z)."""
        y = self.g_a(x)
        z = self.h_a(y)
        return y, z

    def hyper_synthesize(self, z_hat):
        return self.h_s(z_hat)

    def synthesize(self, y_hat):
        return self.g_s(y_hat) if self.use_gs else y_hat

    def eb_medians(self):
        return self.entropy_bottleneck.medians()

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()
