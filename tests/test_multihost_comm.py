"""Multi-host comm at world>1: 2-process jax.distributed CPU test.

VERDICT r2 weak item 3 / next item 8: ``parallel/comm.py`` (synchronize
barrier, pickle all_gather with unequal payloads, reduce_loss_dict) and
the sharded-eval merge path had only ever executed at
``process_count()==1``. This spawns two real processes wired through
``jax.distributed.initialize`` on the CPU backend (the TPU analog of a
2-host pod; SURVEY §4's "multi-chip without a cluster") and asserts the
cross-process results.
"""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys, json
    rank = int(sys.argv[1]); port = sys.argv[2]
    import jax
    # the axon sitecustomize may have imported jax already with the TPU
    # platform pinned; config.update still wins before backend init
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=rank
    )
    sys.path.insert(0, %(repo)r)
    from mmt_psm_tpu.parallel import comm

    assert comm.get_world_size() == 2
    assert comm.get_rank() == rank
    assert comm.is_main_process() == (rank == 0)

    comm.synchronize()  # barrier must not deadlock

    # unequal payload sizes across ranks (the reference's tmpdir
    # scatter_gather pads nothing; ours pads to the max pickle length)
    payload = {"rank": rank, "data": list(range(10 * (rank + 1)))}
    gathered = comm.all_gather(payload)
    assert len(gathered) == 2
    assert gathered[0]["rank"] == 0 and gathered[1]["rank"] == 1
    assert len(gathered[1]["data"]) == 20

    reduced = comm.reduce_loss_dict({"loss": 1.0 + rank, "acc": 0.5})
    assert abs(reduced["loss"] - 1.5) < 1e-9
    assert abs(reduced["acc"] - 0.5) < 1e-9

    # sharded-eval merge: each rank scores its own images, rows merge
    # across hosts exactly like run_inference's world>1 finalize
    import numpy as np
    from mmt_psm_tpu.evaluation.instmask import InstSeg
    from mmt_psm_tpu.evaluation.pap_eval import PapEvaluator

    def make(seed):
        r = np.random.default_rng(seed)
        masks = np.zeros((3, 64, 64), bool)
        for i in range(3):
            y, x = r.integers(8, 48, 2)
            masks[i, y : y + 12, x : x + 12] = True
        dt = InstSeg.from_full_masks(masks, scores=r.uniform(0.2, 1, 3))
        gt = InstSeg.from_full_masks(masks[::-1].copy())
        return {1: dt}, {1: gt}

    local = PapEvaluator(categories=(1,))
    for seed in (rank * 2, rank * 2 + 1):
        local.add_image(*make(seed))
    gathered_rows = comm.all_gather(local.results)
    merged = PapEvaluator(categories=(1,))
    merged.results = [row for rows in gathered_rows for row in rows]

    ref = PapEvaluator(categories=(1,))
    for seed in (0, 1, 2, 3):
        ref.add_image(*make(seed))
    for key in ("AJI", "F1", "mAP"):
        assert abs(merged.summarize()[key][1] - ref.summarize()[key][1]) < 1e-12

    comm.synchronize()
    print(json.dumps({"rank": rank, "ok": True}))
    """
)


@pytest.mark.slow
def test_two_process_comm(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": repo})
    port = "29517"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # keep the axon TPU sitecustomize (PYTHONPATH /root/.axon_site) from
    # claiming the tunnel TPU in each worker
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PYTHONPATH", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), port],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process comm test deadlocked")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert '"ok": true' in out.lower()
