"""Host-side video IO: decode/encode, metadata, prefetching device feed."""

from .video import (  # noqa: F401
    VideoMetadata,
    VideoReader,
    VideoWriter,
    get_video_metadata,
    read_video,
    sample_frames,
    write_video,
)
from .demo import write_demo_video  # noqa: F401
from .pipeline import FramePipeline  # noqa: F401
