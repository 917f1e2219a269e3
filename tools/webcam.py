"""Webcam demo: live camera frames through the CellDemo predictor.

Parity with the reference demo loop (reference: demo/webcam.py:1-82 —
cv2 capture -> COCODemo.run_on_opencv_image -> imshow). Frames are BGR
from OpenCV; CellDemo works in RGB, so we convert both ways.

Usage:
  python tools/webcam.py --config-file configs/pap/mmt_psm_r50_fpn.yaml \
      --ckpt runs/mt/model_final [--camera 0] [--min-image-size 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description="TPU webcam demo")
    parser.add_argument("--config-file", default="", type=str)
    parser.add_argument("--ckpt", required=True, type=str, help="orbax checkpoint dir")
    parser.add_argument("--camera", default=0, type=int)
    parser.add_argument("--min-image-size", default=256, type=int)
    parser.add_argument("--confidence-threshold", default=0.5, type=float)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import cv2

    from mmt_psm_tpu.config import get_cfg
    from mmt_psm_tpu.engine.predictor import CellDemo
    from mmt_psm_tpu.models import MaskRCNN, ModelConfig
    from mmt_psm_tpu.utils.checkpoint import Checkpointer

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    model = MaskRCNN(config=ModelConfig.from_cfg(cfg, train=False))
    restored = Checkpointer(os.path.dirname(args.ckpt) or ".").load(os.path.basename(args.ckpt))
    demo = CellDemo(
        model,
        {"params": restored["params"]},
        min_size=args.min_image_size,
        confidence_threshold=args.confidence_threshold,
    )

    cam = cv2.VideoCapture(args.camera)
    if not cam.isOpened():
        raise SystemExit(f"cannot open camera {args.camera}")
    try:
        while True:
            start = time.time()
            ret, frame_bgr = cam.read()
            if not ret:
                break
            overlay_rgb = demo.run_on_image(frame_bgr[..., ::-1])
            print(f"{time.time() - start:.3f} s/frame")
            cv2.imshow("mmt_psm_tpu", overlay_rgb[..., ::-1])
            if cv2.waitKey(1) == 27:  # ESC
                break
    finally:
        cam.release()
        cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
