"""Pandaset dataset (parity with reference ``pcdet/datasets/pandaset/``,
489 LoC): sequence pkl.gz frames in WORLD coordinates converted to the
normative ego frame (x forward, y left, z up), cuboid annotations with the
negligible-pitch yaw transform, info + GT-database creation, and
prediction conversion back to world frame.

Devkit-free: the reference drives the ``pandaset-devkit`` (``ps.DataSet``,
``ps.geometry.lidar_points_to_ego``); here the pose math (quaternion
world->ego) is implemented directly and frames are read with pandas
(``pd.read_pickle`` on the stock ``.pkl.gz`` layout) so only the files are
needed.  Evaluation: the reference returns an EMPTY result ("no official
one", pandaset_dataset.py:437-443); ours reports the internal
center-distance mAP instead (beyond-reference)."""

import json
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


def _quat_rotmat(w, x, y, z):
    n = max(np.sqrt(w * w + x * x + y * y + z * z), 1e-12)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def pose_dict_to_numpy(pose):
    """{'position': {x,y,z}, 'heading': {w,x,y,z}} -> (7,) numpy
    (reference pandaset_dataset.py:20-33)."""
    return np.array([pose["position"]["x"], pose["position"]["y"],
                     pose["position"]["z"], pose["heading"]["w"],
                     pose["heading"]["x"], pose["heading"]["y"],
                     pose["heading"]["z"]])


def pose_numpy_to_dict(pose):
    """Inverse of ``pose_dict_to_numpy`` (reference :35-50)."""
    return {"position": {"x": pose[0], "y": pose[1], "z": pose[2]},
            "heading": {"w": pose[3], "x": pose[4], "y": pose[5],
                        "z": pose[6]}}


def lidar_points_to_ego(points, pose):
    """World -> pandaset-ego (devkit ``ps.geometry.lidar_points_to_ego``):
    subtract the pose position, rotate by the inverse heading."""
    t = np.array([pose["position"]["x"], pose["position"]["y"],
                  pose["position"]["z"]])
    R = _quat_rotmat(pose["heading"]["w"], pose["heading"]["x"],
                     pose["heading"]["y"], pose["heading"]["z"])
    return (np.asarray(points) - t) @ R     # R^-1 = R^T; (p-t)@R == R.T@(p-t)


def ego_to_lidar_points(points, pose):
    t = np.array([pose["position"]["x"], pose["position"]["y"],
                  pose["position"]["z"]])
    R = _quat_rotmat(pose["heading"]["w"], pose["heading"]["x"],
                     pose["heading"]["y"], pose["heading"]["z"])
    return np.asarray(points) @ R.T + t


def _read_pickle(path):
    """pandas DataFrame pickle (.pkl / .pkl.gz) -> DataFrame (or raw obj)."""
    import pandas as pd
    return pd.read_pickle(path)


class PandasetDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode] \
            if "DATA_SPLIT" in self.dataset_cfg else "val"
        self.sequences = list(self.dataset_cfg.get("SEQUENCES",
                                                   {}).get(self.split, []))
        self.infos = []
        self.include_pandaset_infos(self.mode)

    def include_pandaset_infos(self, mode):
        infos = []
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            p = self.root_path / info_path
            if p.exists():
                with open(p, "rb") as f:
                    infos.extend(pickle.load(f))
        self.infos.extend(infos)
        if self.logger:
            self.logger.info(f"Pandaset samples ({mode}): {len(infos)}")

    def set_split(self, split):
        self.split = split
        self.sequences = list(self.dataset_cfg.get("SEQUENCES",
                                                   {}).get(split, []))

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    # ------------------------------ readers --------------------------------

    def _get_pose(self, info):
        """Per-frame lidar pose from ``dataset/<seq>/lidar/poses.json``
        (the devkit's backing file)."""
        if "pose" in info:
            p = np.asarray(info["pose"], np.float64)
            return pose_numpy_to_dict(p)
        seq_dir = self.root_path / "dataset" / str(info["sequence"])
        with open(seq_dir / "lidar" / "poses.json") as f:
            poses = json.load(f)
        return poses[int(info["frame_idx"])]

    def _get_lidar_points(self, info, pose):
        """World-frame frame pickle -> normative ego points (x fwd, y left,
        z up) with [0,1] intensity (reference :150-186)."""
        frame = _read_pickle(self.root_path / info["lidar_path"]
                             if not Path(info["lidar_path"]).is_absolute()
                             else info["lidar_path"])
        device = int(self.dataset_cfg.get("LIDAR_DEVICE", 0))
        if hasattr(frame, "columns"):
            if device != -1 and "d" in frame.columns:
                frame = frame[frame.d == device]
            world = frame.to_numpy()
        else:
            world = np.asarray(frame)
        loc = world[:, :3]
        inten = world[:, 3] / 255.0
        ego = lidar_points_to_ego(loc, pose)
        ego = ego[:, [1, 0, 2]]                 # pandaset-ego -> normative
        ego[:, 1] = -ego[:, 1]
        return np.concatenate([ego, inten[:, None]], axis=1).astype(
            np.float32)

    def _get_annotations(self, info, pose):
        """Cuboids pickle -> normative-ego boxes + labels +
        zrot_world_to_ego (reference :187-254, incl. the negligible-pitch
        yaw assumption)."""
        cub = _read_pickle(self.root_path / info["cuboids_path"]
                           if not Path(info["cuboids_path"]).is_absolute()
                           else info["cuboids_path"])
        device = int(self.dataset_cfg.get("LIDAR_DEVICE", 0))
        if device != -1 and "cuboids.sensor_id" in getattr(cub, "columns",
                                                           []):
            cub = cub[cub["cuboids.sensor_id"] != 1 - device]
        xs = cub["position.x"].to_numpy()
        ys = cub["position.y"].to_numpy()
        zs = cub["position.z"].to_numpy()
        dxs = cub["dimensions.x"].to_numpy()
        dys = cub["dimensions.y"].to_numpy()
        dzs = cub["dimensions.z"].to_numpy()
        yaws = cub["yaw"].to_numpy()
        labels = cub["label"].to_numpy()
        cat_map = self.dataset_cfg.get("TRAINING_CATEGORIES", {})
        labels = np.array([cat_map.get(lab, lab) for lab in labels])

        centers = np.vstack([xs, ys, zs]).T
        ego_centers = lidar_points_to_ego(centers, pose)
        # yaw offset of the ego frame vs world (pitch assumed negligible)
        yaxis = lidar_points_to_ego(np.array([[0., 0., 0.], [0., 1., 0.]]),
                                    pose)
        yaxis = yaxis[1] - yaxis[0]
        if abs(yaxis[-1]) >= 0.1 and self.logger is not None:
            self.logger.warning("pandaset: car pitch not negligible "
                                f"(sin(pitch)={yaxis[-1]:.3f})")
        zrot_world_to_ego = np.arctan2(-yaxis[0], yaxis[1])
        ego_yaws = yaws + zrot_world_to_ego
        boxes = np.vstack([ego_centers[:, 1], -ego_centers[:, 0],
                           ego_centers[:, 2], dys, dxs, dzs, ego_yaws]).T
        return boxes.astype(np.float32), labels, float(zrot_world_to_ego)

    # ------------------------------ loading --------------------------------

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = self.infos[index]
        if "lidar_path" in info and "cuboids_path" not in info:
            # slim pre-extracted schema: {lidar_path, gt_boxes, gt_names}
            with open(self.root_path / info["lidar_path"], "rb") as f:
                frame = pickle.load(f)
            points = np.asarray(frame["points"] if isinstance(frame, dict)
                                else frame, np.float32)
            input_dict = {"points": points,
                          "frame_id": Path(info["lidar_path"]).stem}
            if "gt_boxes" in info:
                input_dict.update({
                    "gt_boxes": np.asarray(info["gt_boxes"],
                                           np.float32)[:, :7],
                    "gt_names": np.asarray(info["gt_names"])})
            return self.prepare_data(data_dict=input_dict)
        pose = self._get_pose(info)
        points = self._get_lidar_points(info, pose)
        boxes, labels, zrot = self._get_annotations(info, pose)
        input_dict = {
            "points": points, "gt_boxes": boxes, "gt_names": labels,
            "sequence": int(info["sequence"]),
            "frame_id": f"{info['sequence']}_{info['frame_idx']}",
            "frame_idx": info["frame_idx"],
            "zrot_world_to_ego": zrot,
            "pose": pose_dict_to_numpy(pose),
        }
        return self.prepare_data(data_dict=input_dict)

    # -------------------------- offline tooling ----------------------------

    def get_infos(self):
        """Per-frame info dicts for the current split's sequences
        (reference :358-384: sequence, frame_idx, lidar/cuboids paths)."""
        infos = []
        for seq in self.sequences:
            lidar_dir = self.root_path / "dataset" / str(seq) / "lidar"
            frames = sorted(lidar_dir.glob("*.pkl*"))
            frames = [f for f in frames if f.name[0].isdigit()]
            if len(frames) > 100:
                raise ValueError(f"sequence {seq} has {len(frames)} > 100 "
                                 "frames (reference assumption)")
            for f in frames:
                ii = int(f.name.split(".")[0])
                infos.append({
                    "sequence": seq, "frame_idx": ii,
                    "lidar_path": str(f.relative_to(self.root_path)),
                    "cuboids_path": str((self.root_path / "dataset" /
                                         str(seq) / "annotations" /
                                         "cuboids" / f.name)
                                        .relative_to(self.root_path)),
                })
        return infos

    def create_groundtruth_database(self, info_path, used_classes=None,
                                    split="train"):
        """Reference :386-435 — per-object crops + dbinfos pickle."""
        from ...ops.roiaware_pool3d import points_in_boxes_cpu
        db_dir = self.root_path / ("gt_database" if split == "train"
                                   else f"gt_database_{split}")
        db_dir.mkdir(parents=True, exist_ok=True)
        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        all_db_infos = {}
        for info in infos:
            pose = self._get_pose(info)
            points = self._get_lidar_points(info, pose)
            gt_boxes, names, _ = self._get_annotations(info, pose)
            flags = points_in_boxes_cpu(points[:, :3], gt_boxes[:, :7])
            for i in range(len(gt_boxes)):
                if used_classes is not None and names[i] not in used_classes:
                    continue
                clean = str(names[i]).replace("/", "").replace(" ", "")
                filename = f"{info['frame_idx']}_{clean}_{i}.bin"
                gt_points = points[flags[i] > 0].copy()
                gt_points[:, :3] -= gt_boxes[i, :3]
                gt_points.astype(np.float32).tofile(str(db_dir / filename))
                all_db_infos.setdefault(names[i], []).append({
                    "name": names[i],
                    "path": str((db_dir / filename)
                                .relative_to(self.root_path)),
                    "gt_idx": i, "box3d_lidar": gt_boxes[i],
                    "num_points_in_gt": gt_points.shape[0],
                    "difficulty": -1})
        out = self.root_path / f"pandaset_dbinfos_{split}.pkl"
        with open(out, "wb") as f:
            pickle.dump(all_db_infos, f)
        return out

    # ----------------------------- prediction ------------------------------

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
        """Reference returns an empty result ('no official evaluation for
        Pandaset', :437-443); we report the internal center-distance mAP so
        runs are still comparable across checkpoints."""
        from ...utils.simple_eval import simple_map
        gt_by_frame = {}
        for i in self.infos:
            if "cuboids_path" in i:
                fid = f"{i['sequence']}_{i['frame_idx']}"
                pose = self._get_pose(i)
                boxes, names, _ = self._get_annotations(i, pose)
            else:
                fid = Path(i["lidar_path"]).stem
                boxes = np.asarray(i.get("gt_boxes", np.zeros((0, 7))),
                                   np.float32)[:, :7]
                names = np.asarray(i.get("gt_names", []))
            gt_by_frame[fid] = {"boxes": boxes, "names": names}
        empty = {"boxes": np.zeros((0, 7)), "names": np.zeros(0)}
        gts = [gt_by_frame.get(d["frame_id"], empty) for d in det_annos]
        ap = simple_map(det_annos, gts, class_names)
        return "\n".join(f"{k}: {v:.4f}" for k, v in ap.items()), ap


def create_pandaset_infos(dataset_cfg, class_names, data_path, save_path):
    """Reference :446-469 — info pickles per split + train GT database."""
    save_path = Path(save_path)
    dataset = PandasetDataset(dataset_cfg=dataset_cfg,
                              class_names=class_names,
                              root_path=Path(data_path), training=False)
    for split in ("train", "val", "test"):
        dataset.set_split(split)
        infos = dataset.get_infos()
        out = save_path / f"pandaset_infos_{split}.pkl"
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        print(f"pandaset info {split}: {len(infos)} -> {out}")
    dataset.set_split("train")
    train_info = save_path / "pandaset_infos_train.pkl"
    if train_info.exists():
        dataset.create_groundtruth_database(train_info, split="train")
