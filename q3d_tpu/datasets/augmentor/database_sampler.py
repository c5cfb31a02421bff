"""GT-paste ("copy-paste") augmentation from a pre-built object database.

Parity with reference ``datasets/augmentor/database_sampler.py`` (502 LoC):
class-balanced sample groups ('Car:15'), PREPARE filters
(filter_by_min_points / filter_by_difficulty), BEV collision rejection
against scene + already-placed boxes, removal of scene points inside placed
boxes (enlarged by ``REMOVE_EXTRA_WIDTH``), road-plane lifting
(``USE_ROAD_PLANE``, reference ``put_boxes_on_road_planes`` :150-167), and
point/annotation merging.  The reference's shared-memory cache
(``USE_SHARED_MEMORY`` + SharedArray, :29-94,383-391) maps to a
memory-mapped integrated database here: ``DB_DATA_PATH`` names the global
``.npy`` built by ``tools/create_infos.py integrated`` and infos carrying
``global_data_offset`` slice it via ``np.load(mmap_mode='r')`` — the OS
page cache shares the mapping across dataloader processes exactly like
SharedArray, without the /dev/shm lifecycle management.

Database format (built by ``tools/create_gt_database.py``): a pickle
``{class_name: [ {name, path, box3d_lidar (7,), num_points_in_gt,
difficulty} ]}`` where ``path`` holds (N, C) float32 object points RELATIVE
to the box center.
"""

import pickle
from pathlib import Path

import numpy as np

from ...utils import box_utils


class DataBaseSampler:
    def __init__(self, root_path, sampler_cfg, class_names, logger=None):
        self.root_path = Path(root_path)
        self.sampler_cfg = sampler_cfg
        self.class_names = class_names
        self.logger = logger
        self.db_infos = {c: [] for c in class_names}
        for db_path in sampler_cfg.DB_INFO_PATH:
            p = self.root_path / db_path
            if not p.exists():
                p = Path(db_path)
            if not p.exists():
                if logger:
                    logger.warning(f"gt database {db_path} not found; "
                                   f"gt_sampling becomes a no-op")
                continue
            with open(p, "rb") as f:
                infos = pickle.load(f)
            for c in class_names:
                self.db_infos[c].extend(infos.get(c, []))

        for func_name, val in sampler_cfg.get("PREPARE", {}).items():
            if any(self.db_infos.values()):
                self.db_infos = getattr(self, func_name)(self.db_infos, val)

        self.sample_groups = {}
        for group in sampler_cfg.SAMPLE_GROUPS:
            name, num = group.split(":")
            if name in class_names:
                self.sample_groups[name] = {
                    "num": int(num), "pointer": len(self.db_infos[name]),
                    "indices": np.arange(len(self.db_infos[name]))}
        self.limit_whole_scene = sampler_cfg.get("LIMIT_WHOLE_SCENE", False)

        # integrated (single-file) database: lazily memory-mapped on first
        # sampled object (reference USE_SHARED_MEMORY/DB_DATA_PATH)
        self._global_db = None
        self._global_db_path = None
        db_data = sampler_cfg.get("DB_DATA_PATH", None)
        if db_data:
            p = self.root_path / db_data[0]
            if not p.exists():
                p = Path(db_data[0])
            if p.exists():
                self._global_db_path = p
            elif logger:
                logger.warning(f"integrated db {db_data[0]} not found; "
                               f"falling back to per-object files")

    # ------------------------------ filters -------------------------------

    def filter_by_min_points(self, db_infos, min_gt_points_list):
        for pair in min_gt_points_list:
            name, n = pair.split(":")
            n = int(n)
            if name in db_infos:
                db_infos[name] = [x for x in db_infos[name]
                                  if x.get("num_points_in_gt", n) >= n]
        return db_infos

    def filter_by_difficulty(self, db_infos, removed_difficulty):
        for key in db_infos:
            db_infos[key] = [x for x in db_infos[key]
                             if x.get("difficulty", 0) not in removed_difficulty]
        return db_infos

    # --------------------------- road-plane lift --------------------------

    @staticmethod
    def put_boxes_on_road_planes(gt_boxes, road_plane, calib):
        """Drop each sampled box onto the ground plane (KITTI only).

        The plane [a, b, c, d] lives in the camera (rect) frame: solve the
        plane for the camera-y at each box center, convert back to lidar z,
        and shift the box so its bottom face touches the plane.  Returns the
        lifted boxes and per-box z shift ``mv_height`` (applied to the object
        points too).  Reference: database_sampler.py:150-167.
        """
        gt_boxes = gt_boxes.copy()
        a, b, c, d = road_plane
        center_cam = calib.lidar_to_rect(gt_boxes[:, 0:3])
        cur_height_cam = (-d - a * center_cam[:, 0] - c * center_cam[:, 2]) / b
        center_cam[:, 1] = cur_height_cam
        cur_lidar_height = calib.rect_to_lidar(center_cam)[:, 2]
        mv_height = gt_boxes[:, 2] - gt_boxes[:, 5] / 2 - cur_lidar_height
        gt_boxes[:, 2] -= mv_height
        return gt_boxes, mv_height

    # ------------------------------ sampling ------------------------------

    def _sample_with_fixed_number(self, class_name, num):
        group = self.sample_groups[class_name]
        if group["pointer"] + num >= len(group["indices"]):
            np.random.shuffle(group["indices"])
            group["pointer"] = 0
        picked = group["indices"][group["pointer"]:group["pointer"] + num]
        group["pointer"] += num
        return [self.db_infos[class_name][i] for i in picked]

    def __call__(self, data_dict=None, **kwargs):
        if data_dict is None:
            return self
        if not any(len(v) for v in self.db_infos.values()):
            return data_dict
        gt_boxes = data_dict["gt_boxes"]
        gt_names = data_dict["gt_names"]
        points = data_dict["points"]

        placed_boxes, placed_names, placed_points = [], [], []
        existing = gt_boxes[:, :7] if len(gt_boxes) else np.zeros((0, 7), np.float32)
        for class_name, group in self.sample_groups.items():
            if not len(self.db_infos[class_name]):
                continue
            if self.limit_whole_scene:
                num = group["num"] - int((gt_names == class_name).sum())
            else:
                num = group["num"]
            if num <= 0:
                continue
            samples = self._sample_with_fixed_number(class_name, num)
            cand_boxes = np.stack(
                [np.asarray(s["box3d_lidar"], np.float32) for s in samples])
            if self.sampler_cfg.get("USE_ROAD_PLANE", False) \
                    and "road_plane" in data_dict:
                lifted, _ = self.put_boxes_on_road_planes(
                    cand_boxes[:, :7], data_dict["road_plane"],
                    data_dict["calib"])
                cand_boxes = cand_boxes.copy()
                cand_boxes[:, :7] = lifted
            # collision check vs existing + already placed (BEV IoU > 0)
            occupied = np.concatenate(
                [existing] + [b[None, :7] for b in placed_boxes], axis=0) \
                if (len(existing) or placed_boxes) else np.zeros((0, 7), np.float32)
            for s, box in zip(samples, cand_boxes):
                if len(occupied):
                    iou = np.asarray(box_utils.boxes3d_nearest_bev_iou(
                        box[None, :7], occupied))
                    if iou.max() > 1e-3:
                        continue
                obj_points = self._load_points(s)
                if obj_points is None:
                    continue
                placed_boxes.append(box)
                placed_names.append(class_name)
                pts = obj_points.copy()
                # db points are box-center-relative; the lifted center
                # already carries -mv_height, so adding it places the object
                # on the plane (reference shifts absolute points by -mv_h)
                pts[:, :3] += box[None, :3]
                placed_points.append(pts)
                occupied = np.concatenate([occupied, box[None, :7]], axis=0)

        if not placed_boxes:
            return data_dict
        placed_boxes = np.stack(placed_boxes)
        # drop scene points inside the (enlarged) placed boxes, then merge
        large = box_utils.enlarge_box3d(
            placed_boxes[:, :7],
            extra_width=self.sampler_cfg.get("REMOVE_EXTRA_WIDTH", (0, 0, 0)))
        points = box_utils.remove_points_in_boxes3d(points, large)
        obj_pts = np.concatenate(placed_points, axis=0)
        if obj_pts.shape[1] < points.shape[1]:
            pad = np.zeros((len(obj_pts), points.shape[1] - obj_pts.shape[1]),
                           np.float32)
            obj_pts = np.concatenate([obj_pts, pad], axis=1)
        data_dict["points"] = np.concatenate([obj_pts[:, :points.shape[1]],
                                              points], axis=0)
        width = gt_boxes.shape[1] if len(gt_boxes) else 7
        if placed_boxes.shape[1] < width:
            placed_boxes = np.concatenate(
                [placed_boxes, np.zeros((len(placed_boxes),
                                         width - placed_boxes.shape[1]),
                                        np.float32)], axis=1)
        data_dict["gt_boxes"] = np.concatenate(
            [gt_boxes, placed_boxes[:, :width]], axis=0) if len(gt_boxes) \
            else placed_boxes[:, :width]
        data_dict["gt_names"] = np.concatenate(
            [gt_names, np.asarray(placed_names)])
        if "gt_boxes_mask" in data_dict:
            data_dict["gt_boxes_mask"] = np.concatenate(
                [data_dict["gt_boxes_mask"],
                 np.ones(len(placed_boxes), bool)])
        return data_dict

    def _load_points(self, info):
        if "global_data_offset" in info and self._global_db_path is not None:
            if self._global_db is None:
                self._global_db = np.load(self._global_db_path,
                                          mmap_mode="r")
                # consistency check (ADVICE r4): a stale/rebuilt global
                # .npy paired with old infos silently yields wrong object
                # points — validate once that the array covers every info's
                # offset range before trusting any slice
                max_end = 0
                for cls_infos in self.db_infos.values():
                    for ci in cls_infos:
                        off = ci.get("global_data_offset")
                        if off is not None:
                            max_end = max(max_end, int(off[1]))
                if max_end > self._global_db.shape[0]:
                    raise RuntimeError(
                        f"integrated GT database {self._global_db_path} has "
                        f"{self._global_db.shape[0]} rows but infos "
                        f"reference offsets up to {max_end}; the .npy and "
                        "the info pickles are out of sync — rebuild with "
                        "tools/create_infos.py")
            s, e = info["global_data_offset"]
            return np.array(self._global_db[s:e], np.float32)
        p = self.root_path / info["path"]
        if not p.exists():
            p = Path(info["path"])
        if not p.exists():
            return None
        if str(p).endswith(".npy"):
            return np.load(p).astype(np.float32)
        num_feats = int(info.get("num_features", 4))
        return np.fromfile(p, np.float32).reshape(-1, num_feats)
