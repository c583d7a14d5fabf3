"""Frequency-wised All-in-One Image Restoration — TPU-native framework.

A ground-up JAX/Flax/pjit/Pallas re-design of the capabilities of
``stcodeer/Frequency-wised_All-in-One_Image_Restoration_Model`` (a PyTorch/CUDA
research codebase). Nothing here is a translation: the compute path is built
for XLA on TPU (static shapes, batched FFT band decomposition, fused window
attention, mesh-sharded training), and the reference is cited throughout as
``file:line`` for behavioral parity only.

Subpackages
-----------
config        flag-compatible CLI (reference option.py) backed by a frozen dataclass
ops           pure-function op library (frequency decomposition, windows, attention,
              LeFF, SFT, deformable conv, metrics) + Pallas TPU kernels
models        Flax modules: ResNet/ViT/Uformer encoders, DGRN/Uformer decoders,
              functional MoCo, AirNet composition
data          degradation dataset indexing + deterministic batched augmentation
training      two-phase jitted train step, losses, LR schedules, checkpointing
evaluation    tiled inference, on-device PSNR/SSIM, per-task eval runner
parallel      device mesh + sharding rules (dp/task axes), sweep dispatch
utils         log-format-parity logging, image I/O, visualization
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
