"""mmt_psm_tpu: TPU-native semi-supervised instance segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of MMT-PSM
(Mask-guided Mean Teacher with Proposal Soft Matching, MICCAI 2020):
Mask R-CNN R-50-FPN, IR-Net relation-NMS / mask-relation heads, and the
mean-teacher PSM+MGD semi-supervised loop — designed fixed-shape-first
for the TPU compilation model (reference: /root/reference, a
maskrcnn-benchmark fork; see SURVEY.md).
"""

__version__ = "0.1.0"
