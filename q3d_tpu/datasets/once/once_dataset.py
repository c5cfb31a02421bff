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
        from ...utils.simple_eval import simple_map
        gt_by_frame = {info["frame_id"]: {
            "boxes": np.asarray(info.get("annos", {}).get(
                "boxes_3d", np.zeros((0, 7))), np.float32)[:, :7],
            "names": np.asarray(info.get("annos", {}).get("name", []))}
            for info in self.infos}
        results = {}
        # ONCE-style distance buckets
        for lo, hi, tag in [(0, 1e9, "overall"), (0, 30, "0-30m"),
                            (30, 50, "30-50m"), (50, 1e9, "50m+")]:
            dets, gts = [], []
            for det in det_annos:
                gt = gt_by_frame.get(det["frame_id"],
                                     {"boxes": np.zeros((0, 7)),
                                      "names": np.zeros(0)})

                def range_mask(boxes):
                    if len(boxes) == 0:
                        return np.zeros(0, bool)
                    d = np.linalg.norm(boxes[:, :2], axis=1)
                    return (d >= lo) & (d < hi)

                dm = range_mask(det["boxes_lidar"])
                gm = range_mask(gt["boxes"])
                dets.append({"boxes_lidar": det["boxes_lidar"][dm][:, :7],
                             "name": det["name"][dm],
                             "score": det["score"][dm]})
                gts.append({"boxes": gt["boxes"][gm], "names": gt["names"][gm]})
            ap = simple_map(dets, gts, class_names)
            for k, v in ap.items():
                results[f"{tag}/{k}"] = v
        return "\n".join(f"{k}: {v:.4f}" for k, v in results.items()), results
