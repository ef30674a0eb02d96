from xtagclip_tpu.losses.clip_loss import ClipLoss, clip_loss, gather_features
from xtagclip_tpu.losses.siglip import SigLipLoss, siglip_loss
from xtagclip_tpu.losses.asl import AsymmetricLoss, asymmetric_loss
from xtagclip_tpu.losses.dqncos import DQNCOSLoss, dqncos_loss
from xtagclip_tpu.losses.distill import DistillClipLoss

__all__ = [
    "ClipLoss", "clip_loss", "gather_features",
    "SigLipLoss", "siglip_loss",
    "AsymmetricLoss", "asymmetric_loss",
    "DQNCOSLoss", "dqncos_loss",
    "DistillClipLoss",
]
