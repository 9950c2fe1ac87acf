"""Pallas kernels + XLA primitives (the framework's "native" compute layer)."""

from .blend import overlap_add_blend, tile_weights  # noqa: F401
from .conv import (  # noqa: F401
    conv2d,
    conv3d,
    conv_transpose3d,
    depthwise_conv1d,
    depthwise_conv2d,
)
from .pixel_shuffle import pixel_shuffle, pixel_unshuffle  # noqa: F401
from .resize import interp_matrix, resize, resize_video  # noqa: F401
from .scan import (  # noqa: F401
    chunked_selective_scan,
    selective_scan,
    selective_scan_assoc,
    selective_scan_pallas,
    selective_scan_ref,
)
from .warp import flow_warp, grid_sample  # noqa: F401
