"""segs_slam_tpu — a TPU-native structure-enhanced 3D Gaussian Splatting SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SEGS-SLAM
(ICCV 2025, arXiv:2501.05242): an anchor-based (Scaffold-GS-style) neural
Gaussian mapper with pose-conditioned appearance embedding and
frequency-domain regularization, fed online by a SLAM frontend.

Architecture (TPU-first, not a port):
  - All per-iteration state lives in fixed-capacity padded pytrees with
    active-count masks so that a single jitted train step covers the whole
    online mapping loop (no re-tracing as the map grows).
  - The tile rasterizer is XLA binning (sort + searchsorted) plus a Pallas
    blend kernel; the backward pass is a custom VJP that accumulates
    per-instance gradients and segment-sums them (no atomics).
  - The SLAM boundary is an explicit MappingOperation protocol consumed by an
    async host-side queue around a non-blocking jitted step.
"""

__version__ = "0.1.0"
