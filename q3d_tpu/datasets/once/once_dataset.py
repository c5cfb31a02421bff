"""ONCE dataset (parity with reference ``pcdet/datasets/once/``): info-driven
loading + distance-bucketed AP evaluation (the ONCE protocol evaluates
overall/0-30m/30-50m/50m+ ranges)."""

import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class ONCEDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode]
        self.infos = []
        for info_path in self.dataset_cfg.INFO_PATH[self.mode]:
            p = self.root_path / info_path
            if p.exists():
                with open(p, "rb") as f:
                    self.infos.extend(pickle.load(f))
        if self.logger:
            self.logger.info(f"ONCE samples: {len(self.infos)}")

    def get_lidar(self, seq_id, frame_id):
        f = self.root_path / "data" / seq_id / "lidar_roof" / f"{frame_id}.bin"
        return np.fromfile(str(f), np.float32).reshape(-1, 4)

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        info = self.infos[index]
        points = self.get_lidar(info["sequence_id"], info["frame_id"])
        input_dict = {"points": points, "frame_id": info["frame_id"]}
        if "annos" in info:
            input_dict.update({
                "gt_boxes": np.asarray(info["annos"]["boxes_3d"], np.float32),
                "gt_names": np.asarray(info["annos"]["name"])})
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
                "boxes_3d": pred_arrays["final_boxes"][b][valid],
                "score": pred_arrays["final_scores"][b][valid],
                "name": np.asarray([class_names[i - 1] for i in labels]),
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """Official ONCE protocol (reference once_eval/evaluation.py):
        superclass AP@50 over overall + distance buckets."""
        from .once_eval import get_evaluation_results
        gt_by_frame = {info["frame_id"]: {
            "boxes_3d": np.asarray(info.get("annos", {}).get(
                "boxes_3d", np.zeros((0, 7))), np.float64)[:, :7],
            "name": np.asarray(info.get("annos", {}).get("name", []),
                               dtype=object)}
            for info in self.infos}
        empty = {"boxes_3d": np.zeros((0, 7)),
                 "name": np.zeros(0, dtype=object)}
        gt_annos = [gt_by_frame.get(d["frame_id"], empty) for d in det_annos]
        pred_annos = [{"boxes_3d": np.asarray(d["boxes_lidar"],
                                              np.float64)[:, :7],
                       "name": np.asarray(d["name"], dtype=object),
                       "score": np.asarray(d["score"], np.float64)}
                      for d in det_annos]
        return get_evaluation_results(gt_annos, pred_annos, list(class_names))
