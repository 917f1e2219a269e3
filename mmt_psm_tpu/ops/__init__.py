from . import box_coder, losses, matcher, nms, roi_align, sampler  # noqa: F401
