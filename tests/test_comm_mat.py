import numpy as np

from mmt_psm_tpu.parallel import comm
from mmt_psm_tpu.utils.mat_output import save_mat_output
from mmt_psm_tpu.evaluation.instmask import InstSeg


def test_comm_single_process():
    assert comm.get_world_size() >= 1
    assert comm.is_main_process() in (True, False)
    comm.synchronize()  # no-op single process
    out = comm.all_gather({"a": 1})
    assert out[comm.get_rank()] == {"a": 1}
    red = comm.reduce_loss_dict({"x": 2.0})
    assert red["x"] == 2.0


def test_save_mat_output(tmp_path):
    import scipy.io as sio

    m = np.ones((5, 5), bool)
    inst = InstSeg(boxes=np.array([[2, 2, 6, 6]]), masks=[m], scores=np.array([0.9]))
    path = str(tmp_path / "out.mat")
    lm = save_mat_output({1: inst}, 20, 20, path)
    loaded = sio.loadmat(path)["predmap"]
    np.testing.assert_array_equal(loaded, lm)
    assert lm.max() == 1 and lm[3, 3] == 1 and lm[0, 0] == 0
