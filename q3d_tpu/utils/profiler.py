"""Profiling / tracing utilities — per-stage latency, memory, FLOPs.

Parity with the reference's experiment workbench
(``quant/count_time_n_memory.py``: per-module wall-time hooks :235-261,
``MemoryUsageMonitor`` :263-291; ``quant/collect_gpu_stats.py`` allocator
snapshots; ``--infer_time`` latency meters).  TPU-native equivalents:

  * ``time_fn``       — trustworthy chained-execution timing (the axon
                        tunnel's block_until_ready does not synchronize);
  * ``StageProfiler`` — per-stage (vfe / backbone_3d / map_to_bev /
                        backbone_2d / dense_head) latency breakdown by
                        jitting stage prefixes and differencing;
  * ``device_memory_stats`` — HBM usage from the XLA allocator;
  * ``compiled_cost``  — XLA cost analysis (FLOPs / bytes) per jitted fn;
  * ``trace``          — context manager around jax.profiler for offline
                        tensorboard traces.
"""

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, iters=10, warmup=2, chain_on=None):
    """Robust wall-clock of a jitted fn returning a pytree.

    ``chain_on``: callable mapping (output, iteration args) -> new args with a
    data dependency; default perturbs the first float array argument by a
    zero-valued function of the previous output, forcing serialization.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync + warm fetch path

    def run_chain(k):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(k):
            o = fn(*args)
            leaf = jax.tree_util.tree_leaves(o)[0]
            acc = acc + leaf.reshape(-1)[0].astype(jnp.float32) * 0 + acc * 0
            # accumulate a scalar read so the final fetch covers all iters
            acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
        float(np.asarray(acc))
        return time.perf_counter() - t0

    t_short = run_chain(1)
    t_long = run_chain(1 + iters)
    return max(t_long - t_short, 1e-9) / iters


def device_memory_stats(device=None):
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                  "bytes_limit") if k in stats}


def compiled_cost(fn, *args):
    """FLOPs / bytes-accessed estimate from XLA's cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return {"flops": ca.get("flops", -1.0),
            "bytes_accessed": ca.get("bytes accessed", -1.0)}


@contextlib.contextmanager
def trace(logdir="/tmp/q3d_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


_STAGES = ["vfe", "backbone_3d", "map_to_bev_module", "backbone_2d",
           "dense_head"]


class StageProfiler:
    """Per-stage latency breakdown of a detector.

    Runs jitted prefixes of the module pipeline (stage 1, stages 1-2, ...)
    and differences their times — the fusion-respecting analogue of the
    reference's per-module forward hooks (count_time_n_memory.py:235).
    """

    def __init__(self, model, variables, batch, rules=None):
        self.model = model
        self.variables = variables
        self.batch = batch
        self.rules = rules
        cfg = model.model_cfg
        slot_of = {"vfe": "VFE", "backbone_3d": "BACKBONE_3D",
                   "map_to_bev_module": "MAP_TO_BEV",
                   "backbone_2d": "BACKBONE_2D", "dense_head": "DENSE_HEAD"}
        self.stages = [s for s in _STAGES
                       if cfg.get(slot_of[s], None) is not None]

    def _prefix_fn(self, upto):
        from ..quant.rules import quant_rules_scope
        stages = self.stages[:upto]

        def fn(variables, batch):
            with quant_rules_scope(self.rules):
                def run(m, b):
                    for s in stages:
                        b = getattr(m, s)(b, False)
                    # reduce whatever is available to a scalar-bearing leaf
                    for key in ("final_scores", "spatial_features_2d",
                                "spatial_features", "pillar_features",
                                "voxel_features"):
                        if key in b:
                            v = b[key]
                            v = v.features if hasattr(v, "features") else v
                            return jnp.sum(v)
                    return jnp.zeros(())
                return self.model.apply(variables, batch, method=run)
        return jax.jit(fn)

    def breakdown(self, iters=5):
        results = {}
        prev = 0.0
        for i in range(1, len(self.stages) + 1):
            fn = self._prefix_fn(i)
            t = time_fn(fn, self.variables, self.batch, iters=iters)
            results[self.stages[i - 1]] = max(t - prev, 0.0)
            prev = t
        results["total"] = prev
        return results
