"""Latency attribution inside the CenterHead: convs / decode / NMS.

Times cumulative prefixes as device-loop programs (companion of
tools/profile_backbone.py).
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="bench")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as benchmod
    from q3d_tpu.models import load_data_to_device

    cfg_name = ("centerpoint_bench.yaml" if args.size == "bench"
                else "centerpoint_tiny.yaml")
    cfg, model, raw = benchmod.build(cfg_name, 1)
    batch16 = load_data_to_device(raw, compute_dtype=jnp.bfloat16)
    batch16 = {k: v for k, v in batch16.items()
               if k in ("voxels", "voxel_coords", "voxel_num_points",
                        "batch_size")}
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False))(jax.random.PRNGKey(0),
                                                    batch16)
    jax.block_until_ready(variables)

    def upto_2d(m, bb):
        bb = m.vfe(dict(bb), False)
        bb = m.backbone_3d(bb, False)
        bb = m.map_to_bev_module(bb, False)
        bb = m.backbone_2d(bb, False)
        return bb["spatial_features_2d"]

    feed = {"spatial_features_2d":
            jax.jit(lambda v, b: model.apply(v, b, method=upto_2d))(
                variables, batch16),
            "batch_size": 1}
    log("feed ready")

    from q3d_tpu.models.model_utils import centernet_utils  # noqa
    from flax.core import unfreeze

    def convs_only(m, bb):
        import jax.numpy as jnp
        from q3d_tpu.models.dense_heads.center_head import relu
        h = m.dense_head
        x = relu(h.shared_norm(h.shared_conv(bb["spatial_features_2d"]),
                               False))
        preds = [head(x, False) for head in h.heads_list]
        return sum(jnp.sum(p[k].astype(jnp.float32))
                   for p in preds for k in p)

    def convs_decode(m, bb):
        import jax.numpy as jnp
        from q3d_tpu.models.dense_heads.center_head import relu
        h = m.dense_head
        x = relu(h.shared_norm(h.shared_conv(bb["spatial_features_2d"]),
                               False))
        preds = [head(x, False) for head in h.heads_list]
        sb, ss, sl, sv = h._decode(preds)
        return ss.sum().astype(jnp.float32)

    def full_head(m, bb):
        out = m.dense_head(dict(bb), False)
        return out["final_scores"].sum().astype(jnp.float32)

    def run_stage(stage_fn):
        def fn(variables, feed, k):
            def body(i, s):
                f = dict(feed)
                f["spatial_features_2d"] = f["spatial_features_2d"] + \
                    (s * 1e-30).astype(f["spatial_features_2d"].dtype)
                return model.apply(variables, f, method=stage_fn).astype(
                    jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        jfn = jax.jit(fn)

        def t(k):
            t0 = time.perf_counter()
            _ = float(np.asarray(jfn(variables, feed, k)))
            return time.perf_counter() - t0
        _ = t(1)
        t1 = min(t(1), t(1))
        return max(t(1 + args.iters) - t1, 1e-9) / args.iters

    r = {}
    r["convs"] = run_stage(convs_only)
    log(f"convs: {r['convs']*1e3:.2f} ms")
    r["convs_decode"] = run_stage(convs_decode)
    log(f"convs+decode: {r['convs_decode']*1e3:.2f} ms")
    r["full"] = run_stage(full_head)
    log(f"full head: {r['full']*1e3:.2f} ms "
        f"(decode+nms = {(r['full']-r['convs'])*1e3:.2f} ms)")
    print(json.dumps({k: round(v * 1e3, 3) for k, v in r.items()}))


if __name__ == "__main__":
    main()
