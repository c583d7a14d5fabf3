"""Flax model zoo: encoders (ResNet/ViT/Uformer), decoders (DGRN/Uformer),
functional MoCo, and the AirNet composition."""

from .encoder_resnet import ResNetEncoder  # noqa: F401
from .decoder_dgrn import DGRN  # noqa: F401
