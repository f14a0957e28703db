"""spalign_tpu — TPU-native free-space segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
pfnet-research/superpixel-align ("Minimizing Supervision for Free-Space
Segmentation", CVPR 2018 Workshops):

- Zero-annotation road-mask generation for Cityscapes-style imagery:
  dilated-ResNet features + superpixels + superpixel-align pooling +
  prior-seeded weighted k-means, compiled as a single on-device program.
- Self-trained SegNet students on the generated pseudo-labels, trained
  data-parallel over a TPU mesh with jit-global (synchronized) batch norm.

Layout:
  ops/       pure-jnp ops: prior, align, k-means, metrics, pooling, LRN
  kernels/   Pallas TPU kernels for the hot ops
  models/    flax models: DRN-C/D family, SegNetBasic, SegNet
  convert/   torch .pth -> JAX pytree conversion + numeric parity oracle
  data/      Cityscapes readers (dir/zip), synthetic data, prefetch loader
  parallel/  mesh / sharding helpers (data parallelism over ICI)
  pipeline/  label-generation programs (spalign / direct / overlaps modes)
  train/     data-parallel SegNet trainer (optax + orbax)
  selftrain/ multi-round self-training driver (in-process)
  eval/      JSONL results, aggregation, tables
  native/    host-side C++ (felzenszwalb superpixels) with ctypes bindings
  cli/       command-line entry points
"""

__version__ = "0.1.0"
