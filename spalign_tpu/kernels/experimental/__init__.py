"""EXPERIMENTAL device kernels — correct, tested, and off the default
path because the production alternative measured faster on TPU v5e:

- ``slic_pallas``: Pallas SLIC assignment kernel.  XLA fuses the
  masked-distance + argmin pattern into ~2 ms/img; the Pallas variant
  pays per-block overheads (~13 ms/img).  Kept as the starting point
  for a future fully-fused (all-iterations-in-kernel) SLIC.
- ``ccl``: connected-component labeling on device.  ~25 ms/img vs
  ~1 ms/img for the native C++ union-find (native/felzenszwalb.cpp),
  and the host pass overlaps device compute in the pipeline anyway.

Nothing here is imported by production code; see README "experimental
kernels" for the demotion rationale and numbers.
"""
