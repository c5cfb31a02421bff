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
                                 "lyft", "argo2", "pandaset", "custom"])
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--save_path", default=None)
    parser.add_argument("--with_gt_database", action="store_true")
    parser.add_argument("--version", default="v1.0-trainval",
                        help="nuscenes only")
    parser.add_argument("--max_sweeps", type=int, default=None,
                        help="nuscenes only (default: cfg MAX_SWEEPS)")
    args = parser.parse_args()

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


if __name__ == "__main__":
    main()
