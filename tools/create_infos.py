"""Offline dataset preparation CLI: info pickles + GT databases.

Parity with the reference's per-dataset ``create_*_infos`` entry points
(``pcdet/datasets/kitti/kitti_dataset.py:431``,
``nuscenes/nuscenes_dataset.py:358``) and
``tools/process_tools/create_integrated_database.py``.

Usage:
    python tools/create_infos.py kitti --cfg_file cfgs/dataset_configs/kitti_dataset.yaml \
        --data_path ../data/kitti
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset",
                        choices=["kitti", "nuscenes", "waymo", "once",
                                 "lyft", "argo2", "pandaset", "custom",
                                 "integrated"])
    parser.add_argument("--cfg_file", default=None)
    parser.add_argument("--src_db_info", default=None,
                        help="integrated only: source db-info pickle")
    parser.add_argument("--new_db_name", default="gt_database_global",
                        help="integrated only: output .npy stem")
    parser.add_argument("--num_point_features", type=int, default=4,
                        help="integrated only: channels per point")
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--save_path", default=None)
    parser.add_argument("--with_gt_database", action="store_true")
    parser.add_argument("--version", default="v1.0-trainval",
                        help="nuscenes only")
    parser.add_argument("--max_sweeps", type=int, default=None,
                        help="nuscenes only (default: cfg MAX_SWEEPS)")
    args = parser.parse_args()

    if args.dataset == "integrated":
        assert args.src_db_info, "--src_db_info required"
        create_integrated_database(args.src_db_info, args.new_db_name,
                                   args.num_point_features)
        return

    assert args.cfg_file, "--cfg_file required"
    from q3d_tpu.config import cfg_from_yaml_file, EDict
    cfg = cfg_from_yaml_file(args.cfg_file, EDict())
    save_path = args.save_path or args.data_path

    if args.dataset == "kitti":
        from q3d_tpu.datasets.kitti.kitti_dataset import (KittiDataset,
                                                          create_kitti_infos)
        class_names = ["Car", "Pedestrian", "Cyclist"]
        create_kitti_infos(cfg, class_names, args.data_path, save_path)
        if args.with_gt_database:
            ds = KittiDataset(dataset_cfg=cfg, class_names=class_names,
                              root_path=args.data_path, training=False)
            out = ds.create_groundtruth_database(
                Path(save_path) / "kitti_infos_train.pkl",
                used_classes=class_names, split="train")
            print(f"gt database -> {out}")
    elif args.dataset == "nuscenes":
        # gated on the nuscenes devkit like the reference
        # (nuscenes_dataset.py:358 imports it inside the function)
        from q3d_tpu.datasets.nuscenes.nuscenes_dataset import NuScenesDataset
        from q3d_tpu.datasets.nuscenes.nuscenes_infos import (
            create_nuscenes_info, create_groundtruth_database)
        max_sweeps = args.max_sweeps or int(cfg.get("MAX_SWEEPS", 10))
        outs = create_nuscenes_info(args.version, args.data_path, save_path,
                                    max_sweeps=max_sweeps)
        print("info pickles:", ", ".join(str(o) for o in outs))
        if args.with_gt_database and args.version != "v1.0-test":
            cfg.VERSION = args.version
            ds = NuScenesDataset(dataset_cfg=cfg, class_names=None,
                                 root_path=Path(save_path) / args.version,
                                 training=True)
            out = create_groundtruth_database(ds, max_sweeps=max_sweeps)
            print(f"gt database -> {out}")
    elif args.dataset == "waymo":
        # gated on waymo_open_dataset + tensorflow like the reference
        from q3d_tpu.datasets.waymo.waymo_dataset import WaymoDataset
        from q3d_tpu.datasets.waymo.waymo_infos import (
            create_waymo_infos, create_groundtruth_database)
        tag = cfg.get("PROCESSED_DATA_TAG", "waymo_processed_data")
        outs = create_waymo_infos(
            args.data_path, Path(save_path) / tag,
            sampled_interval=int(cfg.get("SAMPLED_INTERVAL",
                                         {}).get("train", 1)))
        print("info pickles:", ", ".join(str(o) for o in outs))
        if args.with_gt_database:
            ds = WaymoDataset(dataset_cfg=cfg, class_names=None,
                              root_path=args.data_path, training=True)
            out = create_groundtruth_database(ds)
            print(f"gt database -> {out}")
    elif args.dataset == "once":
        from q3d_tpu.datasets.once.once_dataset import create_once_infos
        create_once_infos(cfg, cfg.get("CLASS_NAMES", None), args.data_path,
                          save_path)
    elif args.dataset == "lyft":
        # gated on the lyft SDK like the reference (lyft_dataset.py:207)
        from q3d_tpu.datasets.lyft.lyft_dataset import (LyftDataset,
                                                        create_lyft_infos)
        create_lyft_infos(args.version if args.version != "v1.0-trainval"
                          else "trainval", args.data_path, save_path,
                          max_sweeps=args.max_sweeps or 10)
        if args.with_gt_database:
            ds = LyftDataset(dataset_cfg=cfg, class_names=None,
                             root_path=args.data_path, training=True)
            out = ds.create_groundtruth_database(
                max_sweeps=args.max_sweeps or 10)
            print(f"gt database -> {out}")
    elif args.dataset == "argo2":
        from q3d_tpu.datasets.argo2.argo2_dataset import create_argo2_infos
        create_argo2_infos(args.data_path, save_path)
    elif args.dataset == "pandaset":
        from q3d_tpu.datasets.pandaset.pandaset_dataset import (
            create_pandaset_infos)
        create_pandaset_infos(cfg, cfg.get("CLASS_NAMES", None),
                              args.data_path, save_path)
    else:
        print("custom dataset: point/label files are consumed directly; "
              "no info generation required")


def create_integrated_database(src_db_info, new_db_name,
                               num_point_features=4):
    """Merge a per-object GT database into ONE global .npy + offset-annotated
    info pickle (reference
    ``tools/process_tools/create_integrated_database.py:1-86``): each
    object's points are concatenated in info order, every info gains
    ``global_data_offset = (start, end)`` rows into the global array, and
    the info pickle is rewritten in place (the reference overwrites
    ``src_db_info`` too).  ``DataBaseSampler`` consumes the result via
    ``DB_DATA_PATH`` with an mmap (the TPU-host equivalent of the
    reference's SharedArray cache)."""
    import pickle

    import numpy as np

    src = Path(src_db_info)
    root = src.parent
    with open(src, "rb") as f:
        db_infos = pickle.load(f)
    global_path = root / (new_db_name + ".npy")

    start = 0
    chunks = []
    for category, class_infos in db_infos.items():
        print(f">>> processing {category} ({len(class_infos)} objects)")
        for info in class_infos:
            p = root / info["path"]
            if not p.exists():
                p = Path(info["path"])
            if str(p).endswith(".npy"):
                pts = np.load(p).astype(np.float32)
            else:
                pts = np.fromfile(str(p), np.float32).reshape(
                    -1, num_point_features)
                if "num_points_in_gt" in info                         and pts.shape[0] != info["num_points_in_gt"]:
                    # reference fallback: some exports were float64
                    pts = np.fromfile(str(p), np.float64).reshape(
                        -1, num_point_features).astype(np.float32)
            n = pts.shape[0]
            if "num_points_in_gt" in info:
                assert n == info["num_points_in_gt"], (p, n)
            info["global_data_offset"] = (start, start + n)
            start += n
            chunks.append(pts)

    global_db = np.concatenate(chunks) if chunks         else np.zeros((0, num_point_features), np.float32)
    with open(global_path, "wb") as f:
        np.save(f, global_db)
    with open(src, "wb") as f:
        pickle.dump(db_infos, f)

    # reference `verify`: the first object round-trips through the offsets
    for class_infos in db_infos.values():
        if class_infos:
            info = class_infos[0]
            s0, e0 = info["global_data_offset"]
            assert np.isfinite(global_db[s0:e0]).all()
            break
    print(f"integrated database -> {global_path} "
          f"({global_db.shape[0]} points)")
    print(f"offset-annotated infos -> {src}")
    return global_path


if __name__ == "__main__":
    main()
