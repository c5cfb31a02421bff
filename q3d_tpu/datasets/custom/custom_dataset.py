"""CustomDataset — user-data template (reference
``pcdet/datasets/custom/custom_dataset.py``, 283 LoC).

Directory layout (same contract as the reference's custom format):
    root/
      ImageSets/{train,val}.txt      one sample id per line
      points/{id}.npy                (N, 3+C) float32
      labels/{id}.txt                'x y z dx dy dz heading class_name' rows
"""

import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class CustomDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode]
        split_file = self.root_path / "ImageSets" / f"{self.split}.txt"
        self.sample_id_list = [x.strip() for x in open(split_file).readlines()] \
            if split_file.exists() else []

    def __len__(self):
        return len(self.sample_id_list)

    def get_lidar(self, idx):
        return np.load(self.root_path / "points" / f"{idx}.npy")

    def get_label(self, idx):
        f = self.root_path / "labels" / f"{idx}.txt"
        if not f.exists():
            return np.zeros((0, 7), np.float32), np.zeros(0, dtype="<U32")
        rows = [line.strip().split(" ") for line in open(f) if line.strip()]
        boxes = np.asarray([[float(v) for v in r[:7]] for r in rows],
                           np.float32).reshape(-1, 7)
        names = np.asarray([r[7] for r in rows])
        return boxes, names

    def __getitem__(self, index):
        sample_id = self.sample_id_list[index]
        points = self.get_lidar(sample_id)
        gt_boxes, gt_names = self.get_label(sample_id)
        input_dict = {"points": points, "frame_id": sample_id,
                      "gt_boxes": gt_boxes, "gt_names": gt_names}
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
        gts = []
        for anno in det_annos:
            boxes, names = self.get_label(anno["frame_id"])
            gts.append({"boxes": boxes, "names": names})
        ap = simple_map(det_annos, gts, class_names)
        return "\n".join(f"{k}: {v:.4f}" for k, v in ap.items()), ap
