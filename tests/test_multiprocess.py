"""Multi-process collective helpers actually exercised (>1 process):
spawns two coordinated JAX CPU processes (jax.distributed) and runs the
commu_utils host-side collectives that single-process runs skip."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
rank = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=rank)
sys.path.insert(0, %r)
import numpy as np
from q3d_tpu.parallel import commu_utils

out = {
    "world": commu_utils.get_world_size(),
    "rank": commu_utils.get_rank(),
    "avg": commu_utils.average_reduce_value(float(rank)),
    "red": commu_utils.reduce_dict({"loss": rank + 1.0}),
    "red_sum": commu_utils.reduce_dict({"loss": rank + 1.0},
                                        average=False),
    "gathered": [np.asarray(a).tolist()
                 for a in commu_utils.all_gather([np.array([rank, rank])])],
}
print("RESULT" + str(rank) + json.dumps(out), flush=True)
""" % str(ROOT)


@pytest.mark.e2e
def test_two_process_collectives(tmp_path):
    import socket
    s = socket.socket()
    s.bind(("localhost", 0))
    port = str(s.getsockname()[1])
    s.close()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(r), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for r in range(2)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p in procs:
        assert p.returncode == 0, outs
    results = {}
    for so, se in outs:
        for line in so.splitlines():
            if line.startswith("RESULT"):
                results[int(line[6])] = json.loads(line[7:])
    assert set(results) == {0, 1}, outs
    for r, res in results.items():
        assert res["world"] == 2
        assert res["rank"] == r
        assert abs(res["avg"] - 0.5) < 1e-6          # mean(0, 1)
        assert abs(res["red"]["loss"] - 1.5) < 1e-6  # mean(1, 2)
        assert abs(res["red_sum"]["loss"] - 3.0) < 1e-6
        flat = np.asarray(res["gathered"]).ravel()
        assert sorted(flat.tolist()) == [0, 0, 1, 1]
