from . import (  # noqa: F401
    box_coder,
    losses,
    matcher,
    nms,
    nms_pallas,
    paste,
    pooler,
    python_nms,
    roi_align,
    roi_align_windowed,
    roi_pool,
    sampler,
)
