"""Instance label-map export to .mat (ISBI-style).

Equivalent of the reference's utils/get_mat_output.py (used by
tools/test_net.py:109-121 for the ISBI2015 path): converts per-class
instance masks into a connected instance-id map and writes MATLAB
files with scipy.io.
"""

from __future__ import annotations

import os

import numpy as np

from .visual import instances_to_label_map


def save_mat_output(inst_by_cat: dict, h: int, w: int, path: str, var_name: str = "predmap"):
    import scipy.io as sio

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    label_map = instances_to_label_map(inst_by_cat, h, w)
    sio.savemat(path, {var_name: label_map})
    return label_map
