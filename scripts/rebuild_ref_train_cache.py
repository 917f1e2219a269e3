"""Rebuild the cached briefly-trained torch reference state_dict
(tests/ref_train.py) outside pytest, so the slow trained-parity suites
and eval-throughput sweep find it warm. Pure-CPU, ~2.5h on a 1-core
host; run in the background."""
import sys, time, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import ref_stack
import ref_train

YAML = "/root/reference/configs/pap/e2e_mask_rcnn_R_50_FPN_1x.yaml"
OPTS = ["MODEL.RELATION_NMS.REG_IOU", "True", "MODEL.RELATION_NMS.REG_IOU_MSK", "False"]

t0 = time.time()
ref = ref_stack.load_reference()
cfg = ref.make_cfg(YAML, OPTS)
def log(msg):
    print(f"[+{time.time()-t0:7.1f}s] {msg}", flush=True)
ref_train.trained_reference_sd(ref, cfg, log=log)
log(f"done -> {ref_train.DEFAULT_CACHE_DIR}")
