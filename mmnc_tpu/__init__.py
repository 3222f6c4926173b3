"""mmnc_tpu — TPU-native multi-modal multi-task neural compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
narekvslife/multi-modal-neural-compression (reference: /root/reference/src)
plus the CompressAI codec core it depends on (ScaleHyperprior backbone,
EntropyBottleneck / GaussianConditional entropy models, GDN layers, and the
C++ rANS range coder).

Layout
------
ops/       conv/deconv/GDN primitives, lower-bound op, quantizers, metrics
entropy/   factorized + conditional-Gaussian entropy models, rANS bridge
models/    ScaleHyperprior backbone + the four multi-task codec variants
train/     jit'd train step, two-optimizer partition, train loop
data/      task registry, synthetic/CLEVR/MNIST pipelines
parallel/  device mesh + sharding rules (batch DP over ICI)
cli/       train / compress entry points mirroring the reference flags
"""

__version__ = "0.1.0"
