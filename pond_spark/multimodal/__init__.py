from pond_spark.multimodal.binaryops import (
    MEDIA_SCHEMA,
    decode_media_batch,
    extract_media_meta,
    frame_sample,
    resize_image_batch,
)

__all__ = [
    "MEDIA_SCHEMA",
    "extract_media_meta",
    "decode_media_batch",
    "frame_sample",
    "resize_image_batch",
]
