import numpy as np
import jax
import pytest

from mmt_psm_tpu.engine.predictor import CellDemo
from mmt_psm_tpu.models import MaskRCNN

from test_detector import TINY, _batch


@pytest.mark.slow
def test_cell_demo_runs(model_and_params=None):
    model = MaskRCNN(config=TINY)
    images, sizes, gt = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        images, sizes, gt, train=True,
    )
    demo = CellDemo(model, params, canvas=128, min_size=128, confidence_threshold=0.0)

    rng = np.random.default_rng(0)
    # square image takes the resize fast path to exactly (128, 128)
    img = rng.integers(0, 255, (100, 100, 3)).astype(np.uint8)
    pred = demo.compute_prediction(img)
    assert pred["boxes"].shape[1] == 4
    assert len(pred["label_names"]) == len(pred["boxes"])
    if len(pred["boxes"]):
        # boxes mapped back to original-image coordinates
        assert pred["boxes"][:, 2].max() <= 100 + 1
    overlay = demo.run_on_image(img)
    assert overlay.shape == img.shape and overlay.dtype == np.uint8
