#!/usr/bin/env bash
# Checkpoint sweep on the test split (reference: scripts/test.sh).
# Usage: scripts/test.sh --ckpt-dir runs/mt [--synthetic]
python tools/test_net.py \
  --config-file configs/pap/mmt_psm_r50_fpn.yaml \
  "$@" \
  DATASETS.MODE_IN_TEST test MODEL.RELATION_NMS.REG_IOU True \
  MODEL.RELATION_NMS.D_LOSS 0. TEST.TTA False
