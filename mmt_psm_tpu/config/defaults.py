"""Default configuration tree.

Mirrors the reference's yacs key space (reference:
maskrcnn_benchmark/config/defaults.py:21-411) so that reference YAML
configs (configs/pap/*.yaml) and ``KEY VALUE`` CLI overrides load
unchanged, and adds a ``TPU`` block for the fixed-shape / mesh / dtype
knobs a static XLA program needs (padded image size, padded proposal
counts, device-mesh axes).
"""

from .node import ConfigNode


def _default_config() -> ConfigNode:
    C = ConfigNode()

    # ------------------------------------------------------------- MODEL
    C.MODEL = ConfigNode()
    C.MODEL.RPN_ONLY = False
    C.MODEL.MASK_ON = False
    C.MODEL.DEVICE = "tpu"
    C.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    C.MODEL.WEIGHT = ""

    # ------------------------------------------------------------- INPUT
    C.INPUT = ConfigNode()
    C.INPUT.MIN_SIZE_TRAIN = 800
    C.INPUT.MAX_SIZE_TRAIN = 1333
    C.INPUT.MIN_SIZE_TEST = 800
    C.INPUT.MAX_SIZE_TEST = 1333
    # BGR 0-255 pixel normalization (reference: config/defaults.py:48-52)
    C.INPUT.PIXEL_MEAN = [102.9801, 115.9465, 122.7717]
    C.INPUT.PIXEL_STD = [1.0, 1.0, 1.0]
    C.INPUT.TO_BGR255 = True

    # ---------------------------------------------------------- DATASETS
    C.DATASETS = ConfigNode()
    C.DATASETS.TRAIN = ()
    C.DATASETS.TEST = ()
    C.DATASETS.VAL = ("papnuclei_val",)
    C.DATASETS.GEN = ("papnuclei_no_label",)
    C.DATASETS.MODE_IN_TEST = "val"
    C.DATASETS.TRAIN_FOLD = ()
    C.DATASETS.TEST_FOLD = ()
    C.DATASETS.GEN_FAKE = 0
    C.DATASETS.GEN_TRUE = 0
    C.DATASETS.TUNE_SOURCE = False
    C.DATASETS.NO_LABEL = True
    C.DATASETS.SYN = False
    C.DATASETS.NO_LABEL_SOURCE = False

    # -------------------------------------------------------- DATALOADER
    C.DATALOADER = ConfigNode()
    C.DATALOADER.NUM_WORKERS = 4
    C.DATALOADER.SIZE_DIVISIBILITY = 0
    C.DATALOADER.ASPECT_RATIO_GROUPING = False
    # batches assembled ahead in a background thread (data/loader.py
    # Prefetcher — the TPU-host analog of NUM_WORKERS); 0 = synchronous,
    # -1 = auto (2 with a spare core, 0 on 1-core hosts where the
    # thread contends instead of overlapping — measured, RESULTS.md)
    C.DATALOADER.PREFETCH_DEPTH = -1

    # ---------------------------------------------------------- BACKBONE
    C.MODEL.BACKBONE = ConfigNode()
    C.MODEL.BACKBONE.CONV_BODY = "R-50-C4"
    C.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2
    C.MODEL.BACKBONE.OUT_CHANNELS = 256 * 4

    # --------------------------------------------------------------- RPN
    C.MODEL.RPN = ConfigNode()
    C.MODEL.RPN.USE_FPN = False
    C.MODEL.RPN.ANCHOR_SIZES = (32, 64, 128, 256, 512)
    C.MODEL.RPN.ANCHOR_STRIDE = (16,)
    C.MODEL.RPN.ASPECT_RATIOS = (0.5, 1.0, 2.0)
    C.MODEL.RPN.STRADDLE_THRESH = 0
    C.MODEL.RPN.FG_IOU_THRESHOLD = 0.7
    C.MODEL.RPN.BG_IOU_THRESHOLD = 0.3
    C.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 256
    C.MODEL.RPN.POSITIVE_FRACTION = 0.5
    C.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 12000
    C.MODEL.RPN.PRE_NMS_TOP_N_TEST = 6000
    C.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 2000
    C.MODEL.RPN.POST_NMS_TOP_N_TEST = 1000
    C.MODEL.RPN.NMS_THRESH = 0.7
    C.MODEL.RPN.MIN_SIZE = 0
    C.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 2000
    C.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 2000
    C.MODEL.RPN.RPN_HEAD = "SingleConvRPNHead"

    # --------------------------------------------------------- ROI_HEADS
    C.MODEL.ROI_HEADS = ConfigNode()
    C.MODEL.ROI_HEADS.USE_FPN = False
    C.MODEL.ROI_HEADS.FG_IOU_THRESHOLD = 0.5
    C.MODEL.ROI_HEADS.BG_IOU_THRESHOLD = 0.5
    C.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
    C.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512
    C.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
    C.MODEL.ROI_HEADS.SCORE_THRESH = 0.05
    C.MODEL.ROI_HEADS.NMS = 0.5
    C.MODEL.ROI_HEADS.NMS_TYPE = "basic"
    C.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 200

    C.MODEL.ROI_BOX_HEAD = ConfigNode()
    C.MODEL.ROI_BOX_HEAD.DO = 0.0
    C.MODEL.ROI_BOX_HEAD.K_HEAD = 1.0
    C.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "ResNet50Conv5ROIFeatureExtractor"
    C.MODEL.ROI_BOX_HEAD.PREDICTOR = "FastRCNNPredictor"
    C.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    C.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 0
    C.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (1.0 / 16,)
    C.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 3
    C.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 1024

    C.MODEL.ROI_MASK_HEAD = ConfigNode()
    C.MODEL.ROI_MASK_HEAD.FEATURE_EXTRACTOR = "ResNet50Conv5ROIFeatureExtractor"
    C.MODEL.ROI_MASK_HEAD.PREDICTOR = "MaskRCNNC4Predictor"
    C.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    C.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO = 0
    C.MODEL.ROI_MASK_HEAD.POOLER_SCALES = (1.0 / 16,)
    C.MODEL.ROI_MASK_HEAD.MLP_HEAD_DIM = 1024
    C.MODEL.ROI_MASK_HEAD.CONV_LAYERS = (256, 256, 256, 256)
    C.MODEL.ROI_MASK_HEAD.RESOLUTION = 14
    C.MODEL.ROI_MASK_HEAD.SHARE_BOX_FEATURE_EXTRACTOR = True
    C.MODEL.ROI_MASK_HEAD.POSTPROCESS_MASKS = False
    C.MODEL.ROI_MASK_HEAD.POSTPROCESS_MASKS_THRESHOLD = 0.5

    # ------------------------------------------------------------ RESNETS
    C.MODEL.RESNETS = ConfigNode()
    C.MODEL.RESNETS.NUM_GROUPS = 1
    C.MODEL.RESNETS.WIDTH_PER_GROUP = 64
    C.MODEL.RESNETS.STRIDE_IN_1X1 = True
    C.MODEL.RESNETS.TRANS_FUNC = "BottleneckWithFixedBatchNorm"
    C.MODEL.RESNETS.STEM_FUNC = "StemWithFixedBatchNorm"
    C.MODEL.RESNETS.RES5_DILATION = 1
    C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64

    # ------------------------------------------------------- RELATION_NMS
    C.MODEL.RELATION_NMS = ConfigNode()
    C.MODEL.RELATION_NMS.FIRST_N = 100
    C.MODEL.RELATION_NMS.THREAD = (0.5, 0.6, 0.7, 0.8, 0.9)
    C.MODEL.RELATION_NMS.ROI_FEAT_DIM = 1024
    C.MODEL.RELATION_NMS.APPEARANCE_FEAT_DIM = 128
    C.MODEL.RELATION_NMS.GEO_FEAT_DIM = 64
    C.MODEL.RELATION_NMS.FC_DIM = (64, 16)
    C.MODEL.RELATION_NMS.GROUP = 16
    C.MODEL.RELATION_NMS.HID_DIM = (1024, 1024, 1024)
    C.MODEL.RELATION_NMS.CLASS_AGNOSTIC = True
    C.MODEL.RELATION_NMS.USE_RELATION_NMS = False
    C.MODEL.RELATION_NMS.MERGE_METHOD = 0
    C.MODEL.RELATION_NMS.FG_THREAD = 0.05
    C.MODEL.RELATION_NMS.POS_NMS = -1.0
    C.MODEL.RELATION_NMS.CLS_WISE_RELATION = False
    C.MODEL.RELATION_NMS.MUTRELATION = False
    C.MODEL.RELATION_NMS.TAG = "_"
    C.MODEL.RELATION_NMS.CONCAT = True
    C.MODEL.RELATION_NMS.TOPK = 90
    C.MODEL.RELATION_NMS.APPEARANCE_INTER = False
    C.MODEL.RELATION_NMS.USE_IOU = False
    C.MODEL.RELATION_NMS.IOU_METHOD = "b"
    C.MODEL.RELATION_NMS.WEIGHT = 1.0
    C.MODEL.RELATION_NMS.ALPHA = 0.2
    C.MODEL.RELATION_NMS.GAMMA = 1.0
    C.MODEL.RELATION_NMS.REG_IOU = False
    C.MODEL.RELATION_NMS.REG_IOU_MSK = True
    C.MODEL.RELATION_NMS.LOSS = 1.0
    C.MODEL.RELATION_NMS.D_LOSS = 0.0
    C.MODEL.RELATION_NMS.DO = 0.0

    # ------------------------------------------------------ RELATION_MASK
    C.MODEL.RELATION_MASK = ConfigNode()
    C.MODEL.RELATION_MASK.BINARY = False
    C.MODEL.RELATION_MASK.USE_PRE_FEATURE = False
    C.MODEL.RELATION_MASK.PRE_NORM = False
    C.MODEL.RELATION_MASK.NORM = 1
    C.MODEL.RELATION_MASK.TYPE = "CAM"
    C.MODEL.RELATION_MASK.SAME_PREDICTOR = False
    C.MODEL.RELATION_MASK.DEEP_SUPER = True
    C.MODEL.RELATION_MASK.CAM = False
    C.MODEL.RELATION_MASK.CIAM = False
    C.MODEL.RELATION_MASK.TRAIN_CENTER_ONLY = False
    C.MODEL.RELATION_MASK.USE_RELATION = False
    C.MODEL.RELATION_MASK.PROTO = False
    C.MODEL.RELATION_MASK.ALPHA = 0.5
    C.MODEL.RELATION_MASK.CENTER_TOPK = 20
    C.MODEL.RELATION_MASK.CENTER_PER_CLASS = 8
    C.MODEL.RELATION_MASK.APPEARANCE_FEAT_DIM = 128
    C.MODEL.RELATION_MASK.GEO_FEAT_DIM = 64
    C.MODEL.RELATION_MASK.FC_DIM = (64, 16)
    C.MODEL.RELATION_MASK.GROUP = 16
    C.MODEL.RELATION_MASK.HID_DIM = (1024, 1024)
    C.MODEL.RELATION_MASK.TOPK = 90
    C.MODEL.RELATION_MASK.EXTRACTOR_CHANNEL = 1
    C.MODEL.RELATION_MASK.FEATURE_EXTRACTOR = "RoiAlignMaskFeatureExtractor"
    C.MODEL.RELATION_MASK.RANK = False
    C.MODEL.RELATION_MASK.CLSWIZE = False
    C.MODEL.RELATION_MASK.XY_COOR = True
    C.MODEL.RELATION_MASK.IOU_COOR = False

    C.MODEL.IOU_HEAD = ConfigNode()
    C.MODEL.IOU_HEAD.USE_IOU_MASK = False

    # ------------------------------------------------------ MEAN TEACHER
    C.MT = ConfigNode()
    C.MT.ALPHA_RAMPUP = 0.99
    C.MT.ALPHA = 0.999
    C.MT.LAMBDA = 1.0
    C.MT.RAMPUP_STEP = 5000
    C.MT.RAMPDOWN_STEP = 2000
    C.MT.SEG_LOSS = 1.0
    C.MT.NMS_LOSS = 1.0
    C.MT.OBJ_LOSS = 1.0
    C.MT.RPN_REG_LOSS = 1.0
    C.MT.CLS_LOSS = 1.0
    C.MT.BOX_REG_LOSS = 1.0
    C.MT.NMS_LOSS_TYPE = "weighted_bce"
    C.MT.CLS_LOSS_TYPE = "bce"
    C.MT.REG_LOSS_TYPE = "smooth_l1"
    C.MT.SEG_LOSS_TYPE = "bce"
    C.MT.RPN_BOOST_ALPHA = 0.5
    C.MT.TEMP = 0.5
    C.MT.HINT = 0.0
    C.MT.FLIP = False
    C.MT.START = 5000
    C.MT.CONSIST_ONLY_NO_LABEL = False
    C.MT.ADV = False
    C.MT.G_LOSS = 1.0
    C.MT.CONFIDENCE = 0.0
    C.MT.CONF_PAIR = False
    C.MT.SHARPEN = False
    C.MT.CONSIST_TEACHER = False
    C.MT.RANK_FILTER = 0.0
    C.MT.IG_LOSS = 0.0
    C.MT.MEAN_TARGET = True
    C.MT.CLS_NEG = True
    C.MT.AUG = False
    C.MT.ANNEAL = 0.0
    C.MT.TSG_LOSS = 0.0
    C.MT.SAME_DIR = False
    C.MT.HARD_NEG = False
    C.MT.START_MT = 1000
    C.MT.FG_HINT = 0.0
    C.MT.T_ADAPT = False
    C.MT.CLS_BALANCE_WEIGHT = 1.0
    C.MT.AUG_K = 2
    C.MT.AUG_S = 1
    C.MT.N_STEP_UNLABEL = 1
    C.MT.ODKD = False
    C.MT.FFI = False
    C.MT.PLTRAIN = False

    C.SYN = ConfigNode()
    C.SYN.MT_LOSS = 0.0
    C.SYN.SUP_LOSS = 1.0
    C.SYN.WEIGHT_SCALE = 1.0
    C.SYN.GAN_IMG = False

    # -------------------------------------------------------------- SOLVER
    C.SOLVER = ConfigNode()
    C.SOLVER.MAX_ITER = 40000
    C.SOLVER.BASE_LR = 0.001
    C.SOLVER.BIAS_LR_FACTOR = 2
    C.SOLVER.MOMENTUM = 0.9
    C.SOLVER.WEIGHT_DECAY = 0.0005
    C.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    C.SOLVER.GAMMA = 0.1
    C.SOLVER.STEPS = (30000,)
    C.SOLVER.WARMUP_FACTOR = 1.0 / 3
    C.SOLVER.WARMUP_ITERS = 500
    C.SOLVER.WARMUP_METHOD = "linear"
    C.SOLVER.CHECKPOINT_PERIOD = 500
    # 0 disables; >0 clips global grad norm (new: the reference always
    # starts from pretrained weights and never needs it; from-scratch
    # runs with the relation heads do)
    C.SOLVER.CLIP_GRAD_NORM = 0.0
    C.SOLVER.IMS_PER_BATCH = 4

    # ---------------------------------------------------------------- TEST
    C.TEST = ConfigNode()
    C.TEST.EXPECTED_RESULTS = []
    C.TEST.EXPECTED_RESULTS_SIGMA_TOL = 4
    C.TEST.IMS_PER_BATCH = 1
    C.TEST.GEN = False
    C.TEST.TTA = False
    C.TEST.VISUAL_NUM = 0
    # host-eval process-pool size (TPU addition): parallelizes the
    # per-image paste+Papeval stage (engine/_eval_worker.py); 0 = serial
    C.TEST.EVAL_WORKERS = -1  # -1 = auto (workers only when spare cores exist)

    # ----------------------------------------------------------------- TPU
    # New (no reference equivalent): static-shape + mesh knobs for XLA.
    C.TPU = ConfigNode()
    # Every image is padded to this square canvas so the program compiles once
    # (the reference pads only to SIZE_DIVISIBILITY — image_list.py:62-68).
    C.TPU.IMAGE_SIZE = 1024
    # Padded ground-truth instances per image (extra rows carry valid=False).
    C.TPU.MAX_GT = 64
    # Padded detections per image at inference time.
    C.TPU.MAX_DETECTIONS = 200
    # Compute dtype for conv/matmul heavy paths ("bfloat16" or "float32").
    C.TPU.COMPUTE_DTYPE = "bfloat16"
    # Device mesh axis names and sizes; -1 means "all remaining devices".
    C.TPU.MESH_AXES = ("data",)
    C.TPU.MESH_SHAPE = (-1,)
    # ROIAlign implementation: "gather" (exact full-map contraction; best
    # measured end-to-end — XLA overlaps the single big contraction well),
    # "banded" (sorted row-band variant: wins standalone at 1000 RoIs but
    # loses fused, see RESULTS.md), or "windowed" (crop+einsum).
    C.TPU.ROI_ALIGN_IMPL = "pallas"
    # Pallas pooler window-start alignment (ops/roi_align_pallas.py):
    # coarser starts trade slightly larger DMA windows for cross-RoI
    # window dedup; EXACT for any multiple of 8 (parity-tested)
    C.TPU.POOL_ALIGN = 8
    # gradient-checkpoint backbone bottleneck blocks (bytes-for-FLOPs
    # trade in the HBM-bound train step; measured A/B in RESULTS.md)
    C.TPU.REMAT_BACKBONE = False
    # jax.profiler trace capture: write a trace of iterations
    # [PROFILE_START, PROFILE_START+PROFILE_STEPS) into PROFILE_DIR
    # (empty = off). The reference has only wall-clock meters
    # (MTtrainer.py:198-221); this is the TPU-native tracing subsystem.
    C.TPU.PROFILE_DIR = ""
    C.TPU.PROFILE_START = 5
    C.TPU.PROFILE_STEPS = 3

    C.OUTPUT_DIR = "."
    return C


def get_cfg() -> ConfigNode:
    """Return a fresh, mutable copy of the default config."""
    return _default_config()


# Module-level default, cloned by callers (mirrors the reference's `cfg`).
cfg = _default_config()
