"""Measure per-stage active voxel counts for a sparse backbone envelope.

Sets OUT_CAPACITY_FACTORS honestly: generates frames from a synthetic bench
config, builds the strided-conv rulebooks on the host (C++), and reports the
max active output count per downsample stage across frames, plus the factor
(active / input_capacity) with 10% headroom rounded up.

Measured results (max over 8 frames):
  centerpoint_bench.yaml (0.1 m / 40k cap):  see cfg comments
  centerpoint_ref.yaml   (0.075 m / 160k cap): recorded in the cfg after run

Usage: JAX_PLATFORMS=cpu python tools/probe_capacity.py --cfg_file <yaml>
"""

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    from q3d_tpu.config import cfg_from_yaml_file, EDict
    from q3d_tpu.datasets import build_dataloader
    from q3d_tpu.runtime import native

    assert native.available(), "native runtime required"
    cfg = cfg_from_yaml_file(args.cfg_file, EDict())
    dataset, loader, _ = build_dataloader(cfg.DATA_CONFIG, cfg.CLASS_NAMES,
                                          batch_size=1, training=False)
    nx, ny, nz = (int(v) for v in dataset.grid_size)
    sparse_shape = (nz + 1, ny, nx)

    # (kernel, stride, padding) per downsample stage of VoxelResBackBone8x /
    # VoxelBackBone8x (spconv_backbone.py stages)
    stages = [
        ("x_conv2", 3, 2, (1, 1, 1)),
        ("x_conv3", 3, 2, (1, 1, 1)),
        ("x_conv4", 3, 2, (0, 1, 1)),
        ("out", (3, 1, 1), (2, 1, 1), (0, 0, 0)),
    ]
    maxima = {k: 0 for k, *_ in stages}
    n_in_max = 0
    it = iter(loader)
    cap = None
    for f in range(args.frames):
        try:
            raw = next(it)
        except StopIteration:
            break
        vc = np.asarray(raw["voxel_coords"][0], np.int32)      # (V, 3) zyx
        cap = vc.shape[0]
        valid = vc[:, 0] >= 0
        n_in = int(valid.sum())
        n_in_max = max(n_in_max, n_in)
        coords = np.concatenate(
            [np.where(valid, 0, -1)[:, None].astype(np.int32), vc], axis=1)
        spatial = sparse_shape
        for key, k, s, p in stages:
            out_coords, _, out_sp = native.downsample_rulebook(
                coords, spatial, k, s, p, out_capacity=2 * cap)
            n_out = int((out_coords[:, 0] >= 0).sum())
            maxima[key] = max(maxima[key], n_out)
            coords, spatial = out_coords, out_sp
        print(f"frame {f}: in={n_in} " +
              " ".join(f"{k}={maxima[k]}" for k, *_ in stages),
              file=sys.stderr)

    print(f"input capacity: {cap}, max active in: {n_in_max} "
          f"({n_in_max / cap:.3f})")
    fac = {}
    for key, *_ in stages:
        f = maxima[key] / cap
        fac[key] = round(f * 1.10 + 0.005, 2)   # may exceed 1.0: k3/s2
        # downsample DILATES the active set when occupancy is ring-like
        print(f"{key}: max_active={maxima[key]} frac={f:.3f} "
              f"-> factor {fac[key]}")
    print("OUT_CAPACITY_FACTORS: {" +
          ", ".join(f"{k}: {v}" for k, v in fac.items()) + "}")


if __name__ == "__main__":
    main()
