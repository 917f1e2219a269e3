from . import catalog, cell, coco, loader, pap, samplers, synthetic, transforms  # noqa: F401
