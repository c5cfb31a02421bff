"""Config-queued point-cloud processing steps ending in static-shape voxels.

Parity with reference ``pcdet/datasets/processor/data_processor.py`` (298 LoC):
``mask_points_and_boxes_outside_range:79``, ``shuffle_points:95``,
``transform_points_to_voxels`` (spconv ``Point2VoxelCPU3d`` -> our
``q3d_tpu.ops.voxelizer``), ``sample_points:182``, ``double_flip:117`` TTA.
Each step is a partial-bound callable queued from the DATA_PROCESSOR cfg list.

TPU-first change: every output is PADDED TO CAPACITY (max_voxels, max_points,
max_raw_points) so the downstream jitted program sees static shapes; validity
travels as counts/masks instead of ragged lengths.
"""

from functools import partial

import numpy as np

from ...ops.voxelizer import voxelize_np
from ...utils import common_utils, box_utils


class DataProcessor:
    def __init__(self, processor_configs, point_cloud_range, training,
                 num_point_features):
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.mode = "train" if training else "test"
        self.grid_size = self.voxel_size = None
        self.max_voxels = None
        self.data_processor_queue = []
        for cur_cfg in processor_configs:
            cur_processor = getattr(self, cur_cfg.NAME)(config=cur_cfg)
            self.data_processor_queue.append(cur_processor)

    # each method doubles as factory (config=...) and step (data_dict=...)

    def mask_points_and_boxes_outside_range(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.mask_points_and_boxes_outside_range, config=config)
        if data_dict.get("points", None) is not None:
            mask = common_utils.mask_points_by_range(data_dict["points"],
                                                     self.point_cloud_range)
            data_dict["points"] = data_dict["points"][mask]
        if data_dict.get("gt_boxes", None) is not None and config.REMOVE_OUTSIDE_BOXES \
                and self.training and len(data_dict["gt_boxes"]) > 0:
            mask = box_utils.mask_boxes_outside_range_numpy(
                data_dict["gt_boxes"], self.point_cloud_range,
                min_num_corners=config.get("MIN_NUM_CORNERS", 1),
                use_center_to_filter=config.get("USE_CENTER_TO_FILTER", True))
            data_dict["gt_boxes"] = data_dict["gt_boxes"][mask]
            if "gt_names" in data_dict:
                data_dict["gt_names"] = data_dict["gt_names"][mask]
        return data_dict

    def shuffle_points(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.shuffle_points, config=config)
        if config.SHUFFLE_ENABLED[self.mode]:
            pts = data_dict["points"]
            data_dict["points"] = pts[np.random.permutation(pts.shape[0])]
        return data_dict

    def transform_points_to_voxels(self, data_dict=None, config=None):
        if data_dict is None:
            self.voxel_size = np.asarray(config.VOXEL_SIZE, np.float32)
            grid_size = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) \
                / self.voxel_size
            self.grid_size = np.round(grid_size).astype(np.int64)  # [nx, ny, nz]
            self.max_points_per_voxel = config.MAX_POINTS_PER_VOXEL
            self.max_voxels = config.MAX_NUMBER_OF_VOXELS[self.mode]
            return partial(self.transform_points_to_voxels, config=config)
        voxels, coords, num_points, num_voxels = voxelize_np(
            data_dict["points"], self.voxel_size, self.point_cloud_range,
            self.max_points_per_voxel, self.max_voxels)
        if not data_dict.get("use_lead_xyz", True):
            voxels = voxels[..., 3:]
        data_dict["voxels"] = voxels
        data_dict["voxel_coords"] = coords
        data_dict["voxel_num_points"] = num_points
        data_dict["num_voxels"] = num_voxels
        return data_dict

    def sample_points(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.sample_points, config=config)
        num_points = config.NUM_POINTS[self.mode]
        if num_points == -1:
            return data_dict
        points = data_dict["points"]
        if num_points < len(points):
            # keep near points preferentially like the reference (:182)
            depth = np.linalg.norm(points[:, 0:3], axis=1)
            near_mask = depth < 40.0
            far_idx = np.where(~near_mask)[0]
            near_idx = np.where(near_mask)[0]
            if num_points > len(far_idx):
                near_keep = np.random.choice(near_idx, num_points - len(far_idx),
                                             replace=False)
                choice = np.concatenate([near_keep, far_idx])
            else:
                choice = np.random.choice(np.arange(len(points)), num_points,
                                          replace=False)
            np.random.shuffle(choice)
            points = points[choice]
        else:
            extra = np.random.choice(len(points), num_points - len(points),
                                     replace=len(points) < num_points - len(points)) \
                if len(points) > 0 else np.zeros(0, np.int64)
            choice = np.concatenate([np.arange(len(points)), extra])
            np.random.shuffle(choice)
            points = points[choice]
        data_dict["points"] = points
        return data_dict

    def double_flip(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.double_flip, config=config)
        # TTA: produce x/y/xy-flipped voxel sets alongside the original
        pts = data_dict["points"]
        variants = {}
        for name, (fx, fy) in {"flip_x": (1, -1), "flip_y": (-1, 1),
                               "flip_xy": (-1, -1)}.items():
            p = pts.copy()
            p[:, 0] *= fy ** 0  # placeholder keeps layout clear
            p[:, 0] = pts[:, 0] * (1 if fx == 1 else -1)
            p[:, 1] = pts[:, 1] * (1 if fy == 1 else -1)
            v, c, n, _ = voxelize_np(p, self.voxel_size, self.point_cloud_range,
                                     self.max_points_per_voxel, self.max_voxels)
            variants[name] = (v, c, n)
        for name, (v, c, n) in variants.items():
            data_dict[f"voxels_{name}"] = v
            data_dict[f"voxel_coords_{name}"] = c
            data_dict[f"voxel_num_points_{name}"] = n
        return data_dict

    def calculate_grid_size(self, data_dict=None, config=None):
        if data_dict is None:
            self.voxel_size = np.asarray(config.VOXEL_SIZE, np.float32)
            grid_size = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) \
                / self.voxel_size
            self.grid_size = np.round(grid_size).astype(np.int64)
            return partial(self.calculate_grid_size, config=config)
        return data_dict

    def forward(self, data_dict):
        for step in self.data_processor_queue:
            data_dict = step(data_dict=data_dict)
        return data_dict
