from .inference import VolumeInferencer, inference, test_single_volume

__all__ = ["VolumeInferencer", "inference", "test_single_volume"]
