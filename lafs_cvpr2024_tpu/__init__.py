"""LAFS-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for landmark-based
facial self-supervised learning and face recognition.

Re-designed from scratch with the capabilities of the reference PyTorch
implementation of *LAFS: Landmark-based Facial Self-supervised Learning for
Face Recognition* (CVPR 2024). The compute path is pure JAX (single jitted
train step over an explicit device mesh, bf16 on the MXU, Pallas kernels for
the landmark patch-gather hot op); the data plane is a host-side RecordIO +
JPEG pipeline with device prefetch.

Subpackages
-----------
- ``ops``       : patch gather (grid-sample semantics), patchify, schedules, mixup
- ``models``    : Part-fViT, MobileNetV3 landmark stem, DINO ViT/head, iResNet, margin heads
- ``parallel``  : mesh construction, sharding rules, class-sharded CosFace-CE
- ``data``      : indexed RecordIO reader/writer, face RandAugment, LAFS multi-crop, prefetch
- ``train``     : SSL (DINO) and supervised trainers, optimizers, checkpointing
- ``eval``      : bin-pair verification (10-fold ROC), IJB-B/C template protocol
- ``utils``     : metric logging, profiling, visualization
"""

__version__ = "0.1.0"
