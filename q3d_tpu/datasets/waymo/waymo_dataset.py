"""Waymo Open Dataset: info-driven sequence loading.

Parity with reference ``pcdet/datasets/waymo/waymo_dataset.py`` (827 LoC):
processed-sequence info loading with sampled intervals, per-frame npy point
loading, train-frame sampling, prediction formatting, and evaluation —
KITTI-style AP via our evaluator by default; the official Waymo OD metric
needs the external ``waymo_open_dataset`` pip package (gated import, like the
reference's :410-447).  The TFRecord -> npy extraction CLI requires that same
package and is gated equivalently.
"""

import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.data_path = self.root_path / \
            self.dataset_cfg.get("PROCESSED_DATA_TAG", "waymo_processed_data")
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode]
        split_file = self.root_path / "ImageSets" / f"{self.split}.txt"
        self.sample_sequence_list = [x.strip() for x in open(split_file)] \
            if split_file.exists() else []
        self.infos = []
        self.include_waymo_data(self.mode)

    def include_waymo_data(self, mode):
        infos = []
        for seq_name in self.sample_sequence_list:
            seq_stem = Path(seq_name).stem
            info_path = self.data_path / seq_stem / f"{seq_stem}.pkl"
            if not info_path.exists():
                continue
            with open(info_path, "rb") as f:
                infos.extend(pickle.load(f))
        interval = self.dataset_cfg.get("SAMPLED_INTERVAL", {}).get(self.mode, 1)
        self.infos = infos[::interval]
        if self.logger:
            self.logger.info(f"Waymo samples ({self.mode}): {len(self.infos)}")

    def get_lidar(self, sequence_name, sample_idx):
        f = self.data_path / sequence_name / f"{sample_idx:04d}.npy"
        points = np.load(f)                       # (N, 6): xyzi + elong + NLZ
        points_all, nlz = points[:, :5], points[:, 5]
        points_all = points_all[nlz == -1]
        points_all[:, 3] = np.tanh(points_all[:, 3])
        return points_all[:, :4]

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = self.infos[index]
        pc_info = info["point_cloud"]
        points = self.get_lidar(pc_info["lidar_sequence"],
                                pc_info["sample_idx"])
        input_dict = {"points": points,
                      "frame_id": f"{pc_info['lidar_sequence']}_"
                                  f"{pc_info['sample_idx']}"}
        if "annos" in info:
            annos = info["annos"]
            mask = annos["name"] != "unknown"
            gt_boxes = annos["gt_boxes_lidar"][mask]
            input_dict.update({"gt_boxes": gt_boxes[:, :7],
                               "gt_names": annos["name"][mask]})
        return self.prepare_data(data_dict=input_dict)

    def generate_prediction_dicts(self, batch_dict, pred_arrays, class_names,
                                  output_path=None):
        annos = []
        for b in range(pred_arrays["final_boxes"].shape[0]):
            valid = pred_arrays["final_valid"][b].astype(bool)
            labels = pred_arrays["final_labels"][b][valid].astype(int)
            annos.append({
                "frame_id": batch_dict["frame_id"][b],
                "boxes_lidar": pred_arrays["final_boxes"][b][valid],
                "score": pred_arrays["final_scores"][b][valid],
                "name": np.asarray([class_names[i - 1] for i in labels]),
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """Waymo AP/APH at LEVEL_1/LEVEL_2 (reference waymo_eval.py).  The
        official OD-API metric ops are used when importable; otherwise the
        built-in numpy protocol evaluator runs the same breakdown."""
        from .waymo_eval import (waymo_evaluation, waymo_evaluation_official)
        gt_infos = []
        for info in self.infos:
            fid = (f"{info['point_cloud']['lidar_sequence']}_"
                   f"{info['point_cloud']['sample_idx']}")
            annos = info.get("annos", {})
            names = np.asarray(annos.get("name", []), dtype=object)
            mask = names != "unknown"
            gt_infos.append({
                "frame_id": fid,
                "gt_boxes_lidar": np.asarray(
                    annos.get("gt_boxes_lidar",
                              np.zeros((0, 7))))[mask][:, :7],
                "name": names[mask],
                "difficulty": (np.asarray(annos["difficulty"])[mask]
                               if "difficulty" in annos
                               else np.zeros(int(mask.sum()))),
                "num_points_in_gt": (
                    np.asarray(annos["num_points_in_gt"])[mask]
                    if "num_points_in_gt" in annos
                    else np.full(int(mask.sum()), 100)),
            })
        by_fid = {g["frame_id"]: g for g in gt_infos}
        gts = [by_fid.get(d["frame_id"],
                          {"frame_id": d["frame_id"],
                           "gt_boxes_lidar": np.zeros((0, 7)),
                           "name": np.zeros(0, dtype=object)})
               for d in det_annos]
        try:
            import waymo_open_dataset  # noqa: F401
            return waymo_evaluation_official(det_annos, gts, class_names)
        except ImportError:
            return waymo_evaluation(det_annos, gts, class_names)
