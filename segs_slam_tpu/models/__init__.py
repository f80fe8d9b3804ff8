from segs_slam_tpu.models.config import ModelConfig
from segs_slam_tpu.models.decoders import init_decoders, DecoderApply
from segs_slam_tpu.models.anchors import AnchorState

__all__ = ["ModelConfig", "init_decoders", "DecoderApply", "AnchorState"]
