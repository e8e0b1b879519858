"""vit_fpga_tpu — a TPU-native rebuild of LimpBunion22/VIT-FPGA.

The reference's host-side C++ OpenCL dispatch layer (``net_abstract`` /
``net_fpga``) becomes a JAX/XLA driver with Pallas device kernels; see
SURVEY.md for the structural analysis and layer map.

Public surface:
  * defines    — data model (NetData / NetSets / ImageSet) + constants
  * abstract   — the 9-method NetAbstract backend contract
  * backends   — NetCPU (NumPy oracle) and NetTPU (JAX/XLA/Pallas engine)
  * ops        — Pallas TPU kernels (patch embed, attention, MLP, quant, ...)
  * models     — MLP (reference parity), ViT family, CLIP image encoder
  * parallel   — mesh / sharding / pjit multi-chip layer
  * train      — optax-based training (the reference stubs training)
  * runtime    — engine (compile+param caches), streaming pipeline, perf
  * utils      — options parser, timing, checkpoint I/O
"""

from .defines import (ACT_GELU, ACT_IDENTITY, ACT_RELU2, ACT_SIGMOID,
                      ACT_TANH, DATA_TYPE, IMAGE_HEIGHT, IMAGE_WIDTH,
                      MAX_RANGE, MIN_RANGE, RING_DEPTH, ImageSet, NetData,
                      NetSets, flatten_net, random_net, unflatten_net)
from .abstract import NetAbstract

__version__ = "0.1.0"

__all__ = [
    "ACT_GELU", "ACT_IDENTITY", "ACT_RELU2", "ACT_SIGMOID", "ACT_TANH",
    "DATA_TYPE", "IMAGE_HEIGHT", "IMAGE_WIDTH", "MAX_RANGE", "MIN_RANGE",
    "RING_DEPTH", "ImageSet", "NetAbstract", "NetData", "NetSets",
    "flatten_net", "random_net", "unflatten_net", "__version__",
]
