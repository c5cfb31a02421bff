"""DatasetTemplate: prepare_data pipeline + static-shape batch collation.

Parity with reference ``pcdet/datasets/dataset.py`` (325 LoC):
``prepare_data:158`` (augmentor -> class filter -> PointFeatureEncoder ->
DataProcessor, with empty-GT resampling) and ``collate_batch:221``.

TPU-first change vs the reference's ragged concat collate: every per-sample
tensor is already capacity-padded by the processor, so collation is a plain
``np.stack`` producing fixed shapes —
    voxels            (B, V, P, C) float32
    voxel_coords      (B, V, 3)    int32   [z, y, x], padding rows -1
    voxel_num_points  (B, V)       int32
    points            (B, N, C+?)  float32 (when kept), with trailing pad NaN-free
    gt_boxes          (B, M, 8)    float32 (7 box + 1 class id), zero-padded
Shapes never depend on scene content, so one XLA program serves every batch.
"""

from collections import defaultdict
from pathlib import Path

import numpy as np

from ..utils import common_utils, box_utils
from .processor.point_feature_encoder import PointFeatureEncoder
from .processor.data_processor import DataProcessor


class DatasetTemplate:
    def __init__(self, dataset_cfg=None, class_names=None, training=True,
                 root_path=None, logger=None):
        self.dataset_cfg = dataset_cfg
        self.training = training
        self.class_names = class_names
        self.logger = logger
        if dataset_cfg is None or class_names is None:
            return
        self.root_path = Path(root_path if root_path is not None
                              else dataset_cfg.DATA_PATH)
        self.point_cloud_range = np.asarray(dataset_cfg.POINT_CLOUD_RANGE, np.float32)
        self.point_feature_encoder = PointFeatureEncoder(
            dataset_cfg.POINT_FEATURE_ENCODING,
            point_cloud_range=self.point_cloud_range)
        if self.training and dataset_cfg.get("DATA_AUGMENTOR", None) is not None:
            from .augmentor.data_augmentor import DataAugmentor
            self.data_augmentor = DataAugmentor(
                self.root_path, dataset_cfg.DATA_AUGMENTOR, self.class_names,
                logger=logger)
        else:
            self.data_augmentor = None
        self.data_processor = DataProcessor(
            dataset_cfg.DATA_PROCESSOR, point_cloud_range=self.point_cloud_range,
            training=self.training,
            num_point_features=self.point_feature_encoder.num_point_features)
        self.grid_size = self.data_processor.grid_size
        self.voxel_size = self.data_processor.voxel_size
        self.max_gt_boxes = int(dataset_cfg.get("MAX_GT_BOXES", 128))
        self.max_raw_points = int(dataset_cfg.get("MAX_RAW_POINTS", 0))
        self.total_epochs = 0
        self._merge_all_iters_to_one_epoch = False

    @property
    def mode(self):
        return "train" if self.training else "test"

    def merge_all_iters_to_one_epoch(self, merge=True, epochs=None):
        self._merge_all_iters_to_one_epoch = merge
        self.total_epochs = epochs

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError

    def prepare_data(self, data_dict):
        """Shared per-frame pipeline (reference dataset.py:158)."""
        if self.training:
            assert "gt_boxes" in data_dict, "gt_boxes required for training"
            if self.data_augmentor is not None:
                gt_boxes_mask = np.array(
                    [n in self.class_names for n in data_dict["gt_names"]], bool)
                data_dict = self.data_augmentor.forward(
                    data_dict={**data_dict, "gt_boxes_mask": gt_boxes_mask})

        if data_dict.get("gt_boxes", None) is not None:
            selected = common_utils.keep_arrays_by_name(
                data_dict["gt_names"], self.class_names)
            data_dict["gt_boxes"] = data_dict["gt_boxes"][selected]
            data_dict["gt_names"] = data_dict["gt_names"][selected]
            gt_classes = np.array(
                [self.class_names.index(n) + 1 for n in data_dict["gt_names"]],
                np.int32)
            data_dict["gt_boxes"] = np.concatenate(
                [data_dict["gt_boxes"].astype(np.float32),
                 gt_classes.reshape(-1, 1).astype(np.float32)], axis=1)

        if data_dict.get("points", None) is not None:
            data_dict = self.point_feature_encoder.forward(data_dict)
        data_dict = self.data_processor.forward(data_dict)

        if self.training and len(data_dict.get("gt_boxes", [])) == 0:
            # empty-GT resample (reference :212-214)
            new_index = np.random.randint(self.__len__())
            return self.__getitem__(new_index)

        data_dict.pop("gt_names", None)
        return data_dict

    # ------------------------------------------------------------------
    def collate_batch(self, batch_list, _unused=False):
        ret = {}
        data = defaultdict(list)
        for cur in batch_list:
            for k, v in cur.items():
                data[k].append(v)
        batch_size = len(batch_list)

        for key, vals in data.items():
            if key in ("voxels", "voxel_num_points") or key.startswith("voxels_") \
                    or key.startswith("voxel_num_points_") or key == "voxel_coords" \
                    or key.startswith("voxel_coords_"):
                ret[key] = np.stack(vals, axis=0)
            elif key == "gt_boxes":
                m = self.max_gt_boxes if self.max_gt_boxes else \
                    max(max(len(v) for v in vals), 1)
                width = vals[0].shape[-1] if len(vals[0]) else 8
                out = np.zeros((batch_size, m, width), np.float32)
                for i, v in enumerate(vals):
                    k = min(len(v), m)
                    if k:
                        out[i, :k] = v[:k]
                ret[key] = out
            elif key == "points":
                cap = self.max_raw_points or max(max(len(v) for v in vals), 1)
                width = vals[0].shape[-1]
                out = np.zeros((batch_size, cap, width), np.float32)
                mask = np.zeros((batch_size, cap), bool)
                for i, v in enumerate(vals):
                    k = min(len(v), cap)
                    out[i, :k] = v[:k]
                    mask[i, :k] = True
                ret["points"] = out
                ret["points_mask"] = mask
            elif key in ("frame_id", "metadata", "calib", "image_shape",
                         "num_voxels", "use_lead_xyz"):
                ret[key] = np.array(vals) if key != "calib" else vals
            else:
                try:
                    ret[key] = np.stack(vals, axis=0)
                except Exception:
                    ret[key] = vals
        ret["batch_size"] = batch_size
        return ret

    def generate_prediction_dicts(self, batch_dict, pred_dicts, class_names,
                                  output_path=None):
        raise NotImplementedError

    def evaluation(self, det_annos, class_names, **kwargs):
        raise NotImplementedError
