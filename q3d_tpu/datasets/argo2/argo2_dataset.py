"""Argoverse 2 dataset (parity with reference ``pcdet/datasets/argo2/``):
info-driven loading of pre-extracted feather/npy frames + center-distance AP
evaluation (the official av2 evaluator requires the external av2 package,
gated like the reference)."""

import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class Argo2Dataset(DatasetTemplate):
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
        if self.logger:
            self.logger.info(f"Argo2 samples: {len(self.infos)}")

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        info = self.infos[index]
        lidar_path = self.root_path / info["lidar_path"]
        if str(lidar_path).endswith(".npy"):
            points = np.load(lidar_path).astype(np.float32)
        else:
            points = np.fromfile(str(lidar_path), np.float32).reshape(-1, 4)
        input_dict = {"points": points,
                      "frame_id": Path(info["lidar_path"]).stem}
        if "gt_boxes" in info:
            input_dict.update({"gt_boxes": np.asarray(info["gt_boxes"],
                                                      np.float32)[:, :7],
                               "gt_names": np.asarray(info["gt_names"])})
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
        from ...utils.simple_eval import simple_map
        gt_by_frame = {Path(i["lidar_path"]).stem: {
            "boxes": np.asarray(i.get("gt_boxes", np.zeros((0, 7))),
                                np.float32)[:, :7],
            "names": np.asarray(i.get("gt_names", []))} for i in self.infos}
        gts = [gt_by_frame.get(d["frame_id"], {"boxes": np.zeros((0, 7)),
                                               "names": np.zeros(0)})
               for d in det_annos]
        ap = simple_map(det_annos, gts, class_names)
        return "\n".join(f"{k}: {v:.4f}" for k, v in ap.items()), ap
