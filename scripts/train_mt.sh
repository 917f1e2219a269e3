#!/usr/bin/env bash
# Flagship MMT-PSM training run (reference: scripts/train_mt.sh — same
# hyperparameters; pass --synthetic for the self-contained dataset or
# set DATASETS.TRAIN/GEN to catalog names for real data).
python tools/train_mean_teacher.py \
  --config-file configs/pap/mmt_psm_r50_fpn.yaml \
  "$@" \
  MODEL.RELATION_NMS.WEIGHT 1. MODEL.RELATION_NMS.ALPHA 0. MODEL.RELATION_NMS.LOSS 1. MODEL.RELATION_NMS.D_LOSS 0. \
  MODEL.RELATION_NMS.GAMMA 1. MODEL.RELATION_NMS.REG_IOU True MODEL.RELATION_NMS.REG_IOU_MSK False \
  MT.ALPHA 0.99 MT.LAMBDA 5. MT.RAMPUP_STEP 250 MT.RAMPDOWN_STEP 250 \
  MODEL.RELATION_NMS.USE_RELATION_NMS True MT.TEMP 0.5 MT.SHARPEN True \
  MT.START_MT 1000 MT.AUG_S 1 \
  MT.CLS_LOSS_TYPE bce SOLVER.IMS_PER_BATCH 4 \
  MT.CLS_LOSS 0.2 MT.FLIP True \
  MODEL.ROI_BOX_HEAD.DO 0.5 MODEL.RELATION_NMS.DO 0.5 \
  SOLVER.CHECKPOINT_PERIOD 50 \
  MT.HARD_NEG True MT.CLS_BALANCE_WEIGHT 1.5 MT.RANK_FILTER 0.2 \
  MT.FG_HINT 1. \
  DATASETS.NO_LABEL True \
  SOLVER.BASE_LR 0.005
