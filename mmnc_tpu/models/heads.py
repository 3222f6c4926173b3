"""Task-specific encoder/decoder heads.

Mirrors the reference's head construction
(src/models/multi_task_compressor.py:109-177 `_build_heads` and the
disjoint variant's extra upsample stack, src/models/disjoint_latent.py:117-164)
as flax modules:

* EncoderHead: conv3x3 s1 (in -> c/2) + GDN, then 5x [conv5x5 s2 + GDN] at
  width c — downsamples 32x.
* DecoderHead: deconv(in -> in/2)+IGDN, conv3x3 s1+IGDN, deconv+IGDN,
  conv3x3 s1+IGDN, deconv(-> out)+IGDN, deconv(out -> out)+IGDN, conv3x3 s1
  — 4 deconvs, upsamples 16x.
* UpsampleStack (disjoint/shared only): 4 extra deconvs replacing the
  amputated g_s — deconv(in -> cc)+IGDN x3 then deconv(cc -> conv_channels),
  cc = conv_channels // n_tasks — another 16x.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..ops.layers import Conv, Deconv, GDN


class EncoderHead(nn.Module):
    conv_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.conv_channels
        x = Conv(features=c // 2, kernel_size=3, stride=1, dtype=self.dtype)(x)
        x = GDN(dtype=self.dtype)(x)
        for _ in range(5):
            x = Conv(features=c, dtype=self.dtype)(x)
            x = GDN(dtype=self.dtype)(x)
        return x


class DecoderHead(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1] // 2
        out = self.out_channels
        x = Deconv(features=mid, dtype=self.dtype)(x)
        x = GDN(inverse=True, dtype=self.dtype)(x)
        x = Conv(features=mid, kernel_size=3, stride=1, dtype=self.dtype)(x)
        x = GDN(inverse=True, dtype=self.dtype)(x)
        x = Deconv(features=mid, dtype=self.dtype)(x)
        x = GDN(inverse=True, dtype=self.dtype)(x)
        x = Conv(features=mid, kernel_size=3, stride=1, dtype=self.dtype)(x)
        x = GDN(inverse=True, dtype=self.dtype)(x)
        x = Deconv(features=out, dtype=self.dtype)(x)
        x = GDN(inverse=True, dtype=self.dtype)(x)
        x = Deconv(features=out, dtype=self.dtype)(x)
        x = GDN(inverse=True, dtype=self.dtype)(x)
        return Conv(features=out, kernel_size=3, stride=1, dtype=self.dtype)(x)


class UpsampleStack(nn.Module):
    """g_s replacement prepended to disjoint/shared decoder heads."""
    conv_channels: int
    n_tasks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cc = self.conv_channels // self.n_tasks
        assert cc >= 1, (
            f"conv_channels ({self.conv_channels}) must be >= n_tasks "
            f"({self.n_tasks}) for the disjoint upsample stack")
        for _ in range(3):
            x = Deconv(features=cc, dtype=self.dtype)(x)
            x = GDN(inverse=True, dtype=self.dtype)(x)
        return Deconv(features=self.conv_channels, dtype=self.dtype)(x)
