"""coastline — TPU-native coastal-water segmentation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
UofgCoastline/EUSIPCO-2026-Robust-Unet (the EUSIPCO 2026 "Robust U-Net"
coastal-water segmentation benchmark suite). Nothing here is a port: the
reference is a flat PyTorch/CPU research codebase; this package is designed
for TPU from the start — NHWC layouts, bfloat16 compute on the MXU,
fully-jitted train/eval steps with on-device metrics, GSPMD data parallelism
over a `jax.sharding.Mesh`, and Pallas kernels for the ops XLA does not fuse
well on its own.

Layer map (mirrors SURVEY.md §7):
  data/      Labelme rasterization, GeoTIFF band combos + water enhancement,
             scene tiling, host->device input pipeline, synthetic datasets
  ops/       torch-parity conv/pool/resize primitives and the shared neural
             blocks (CBAM, attention gates, residual/dilated blocks, ASPP,
             pyramid pooling, depthwise-separable convs, ENet bottlenecks,
             SegFormer attention/FFN)
  models/    the 12-architecture zoo + registry
  train/     jitted train/eval steps, losses, fused on-device metrics,
             plateau LR control, production trainer, Orbax checkpointing
  parallel/  device mesh + NamedSharding helpers (data/spatial/multi-slice/
             tensor-parallel axes over ICI+DCN via GSPMD)
  infer/     predict -> mask -> device-side dilation -> host contour tracing
  report/    training-curve / comparison / error-map / CoastSat-style figures
  cli/       entry points replacing the reference's interactive scripts
  pallas/    hand-written TPU kernels for the hot paths
"""

__version__ = "0.1.0"
