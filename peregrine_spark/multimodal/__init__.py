from peregrine_spark.multimodal.assets import (
    attach_payload,
    extract_features,
    frame_sample_plan,
    register_decoder,
)

__all__ = ["attach_payload", "extract_features", "frame_sample_plan", "register_decoder"]
