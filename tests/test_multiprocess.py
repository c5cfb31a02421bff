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


EVAL_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
rank = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=rank)
sys.path.insert(0, %r)
import numpy as np
from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device
from q3d_tpu.parallel import make_eval_step, merge_results_dist

cfg = cfg_from_yaml_file(%r, EDict())
dataset, loader, _ = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                                      batch_size=1, training=False)
model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                      dataset=dataset)
raws = []
it = iter(loader)
for _ in range(4):
    raws.append(next(it))
variables = model.init(jax.random.PRNGKey(0),
                       load_data_to_device(raws[0]), train=False)
step = make_eval_step(model)

# rank-strided shard, the reference eval DistributedSampler's order
part = []
for i in range(rank, 4, 2):
    batch = load_data_to_device(raws[i])
    out = step(variables, batch)
    host = {k: np.asarray(v, np.float32) if v.dtype != bool
            else np.asarray(v) for k, v in out.items()}
    part += dataset.generate_prediction_dicts(raws[i], host,
                                              cfg.CLASS_NAMES)
merged = merge_results_dist(part, size=4)
_, metrics = dataset.evaluation(merged, cfg.CLASS_NAMES,
                                eval_metric="synthetic")
sig = [round(float(np.asarray(a["boxes_lidar"]).sum()), 3) for a in merged]
print("EVALRESULT" + str(rank)
      + json.dumps({"metrics": {k: float(v) for k, v in metrics.items()},
                    "sig": sig}), flush=True)
""" % (str(ROOT), str(ROOT / "tools/cfgs/synthetic_models/pointpillar_tiny.yaml"))


@pytest.mark.e2e
def test_two_process_eval_matches_single(tmp_path):
    """VERDICT r3 #7: full sharded eval over jax.distributed with ordered
    merge_results_dist — metrics AND per-frame order must equal a
    single-process eval of the same 4 frames."""
    import socket
    s = socket.socket()
    s.bind(("localhost", 0))
    port = str(s.getsockname()[1])
    s.close()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", EVAL_WORKER, str(r), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for r in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p in procs:
        assert p.returncode == 0, outs
    results = {}
    for so, se in outs:
        for line in so.splitlines():
            if line.startswith("EVALRESULT"):
                results[int(line[10])] = json.loads(line[11:])
    assert set(results) == {0, 1}, outs
    # every process got the SAME ordered merge
    assert results[0] == results[1]

    # single-process reference over the same 4 frames
    import jax
    from q3d_tpu.config import cfg_from_yaml_file, EDict
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.models import build_network, load_data_to_device
    from q3d_tpu.parallel import make_eval_step

    cfg = cfg_from_yaml_file(
        str(ROOT / "tools/cfgs/synthetic_models/pointpillar_tiny.yaml"),
        EDict())
    dataset, loader, _ = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                                          batch_size=1, training=False)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    raws = []
    it = iter(loader)
    for _ in range(4):
        raws.append(next(it))
    variables = model.init(jax.random.PRNGKey(0),
                           load_data_to_device(raws[0]), train=False)
    step = make_eval_step(model)
    annos = []
    for raw in raws:
        out = step(variables, load_data_to_device(raw))
        host = {k: np.asarray(v, np.float32) if v.dtype != bool
                else np.asarray(v) for k, v in out.items()}
        annos += dataset.generate_prediction_dicts(raw, host,
                                                   cfg.CLASS_NAMES)
    _, metrics = dataset.evaluation(annos, cfg.CLASS_NAMES,
                                    eval_metric="synthetic")
    want_sig = [round(float(np.asarray(a["boxes_lidar"]).sum()), 3)
                for a in annos]
    assert results[0]["sig"] == want_sig          # ordered identically
    for k, v in metrics.items():
        assert abs(results[0]["metrics"][k] - float(v)) < 1e-6, (k, v)
