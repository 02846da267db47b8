"""PDFNet-TPU: a TPU-native JAX framework for two-hand RGB-D mesh reconstruction.

Re-implements the capabilities of PDFNet ("Pyramid Deep Fusion Network for
Two-Hand Reconstruction from RGB-D Images", T-CSVT 2024) as an idiomatic
JAX/XLA/Pallas framework:

- ``pdfnet_tpu.mano``    — differentiable MANO hand model (pure jittable fns)
- ``pdfnet_tpu.ops``     — kernel layer (kNN/ball-query grouping, Chebyshev
                            graph conv, heatmap decode, depth lifting, ...)
- ``pdfnet_tpu.models``  — flax modules: ResNet50-FPN encoder, PointNet++
                            depth branch, dual-hand GCN mesh decoder
- ``pdfnet_tpu.data``    — H2O/RHD dataset pipeline + synthetic data
- ``pdfnet_tpu.train``   — loss, pjit train/eval steps, checkpointing
- ``pdfnet_tpu.parallel``— device-mesh / sharding utilities
- ``pdfnet_tpu.render``  — JAX rasterizer + SH lighting (pytorch3d equivalent)
"""

__version__ = "0.1.0"

from pdfnet_tpu.config import Config  # noqa: F401
