from .binary_ops import (
    MEDIA_SCHEMA,
    decode_images,
    extract_image_features,
    frame_sample_video,
    make_media_table,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_images",
    "extract_image_features",
    "frame_sample_video",
    "make_media_table",
]
