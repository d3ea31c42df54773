from .cswin_unet import CSWinUNet, CSWinBlock, MergeBlock, CarafeUpsample, Mlp
from .wrapper import CSwinUnet, build_model

__all__ = [
    "CSWinUNet",
    "CSWinBlock",
    "MergeBlock",
    "CarafeUpsample",
    "Mlp",
    "CSwinUnet",
    "build_model",
]
