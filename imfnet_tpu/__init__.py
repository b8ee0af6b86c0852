"""imfnet_tpu — a TPU-native (JAX/XLA/Pallas) framework for multimodal point-cloud
registration with the capabilities of IMFNet (reference: XiaoshuiHuang/IMFNet).

Subsystems
----------
- ``imfnet_tpu.sparse``   sparse-voxel engine: coordinate maps, kernel maps,
  gather-GEMM sparse convolutions (replaces MinkowskiEngine).
- ``imfnet_tpu.geom``     voxel quantization, rigid transforms, PLY/image I/O.
- ``imfnet_tpu.models``   model zoo: ResUNet (IMFNet backbone), image encoder,
  attention fusion, SimpleNet ablations; ``load_model`` registry.
- ``imfnet_tpu.match``    on-device matching & registration: blocked NN,
  batched RANSAC, IRLS pose solver, ICP, metric stack.
- ``imfnet_tpu.data``     host-side dataset pipeline with padded device batches.
- ``imfnet_tpu.train``    losses, trainer, checkpointing.
- ``imfnet_tpu.parallel`` device meshes, data-parallel train/eval steps.
- ``imfnet_tpu.dam``      descriptor activation mapping (interpretability).
- ``imfnet_tpu.eval``     descriptor generation + 3DMatch/3DLoMatch/KITTI evaluators.
"""

__version__ = "0.1.0"

from imfnet_tpu.config import Config, threedmatch_config, kitti_config  # noqa: F401
