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
    parser.add_argument("dataset", choices=["kitti", "custom"])
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--save_path", default=None)
    parser.add_argument("--with_gt_database", action="store_true")
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
    else:
        print("custom dataset: point/label files are consumed directly; "
              "no info generation required")


if __name__ == "__main__":
    main()
