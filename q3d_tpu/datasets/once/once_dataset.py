"""ONCE dataset (parity with reference ``pcdet/datasets/once/``):
split-driven sequence loading (the reference's ``Octopus`` toolkit collapsed
into the dataset: lidar/image/calib readers, lidar->image projection),
info-pkl creation from the per-sequence JSON schema
(``once_dataset.py:155-292``), GT-database creation for sampling
augmentation (``:294-345``), optional semantic point painting
(``:82-118``, numpy grid-sample), and the official distance-bucketed
superclass AP@50 evaluation (``once_eval/evaluation.py``)."""

import copy
import json
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


def _grid_sample_bilinear(feats_hwc, uv):
    """feats (H, W, C); uv (N, 2) in [-1, 1] (x, y) -> (N, C) bilinear
    samples with zero padding (numpy twin of F.grid_sample)."""
    H, W, C = feats_hwc.shape
    x = (uv[:, 0] + 1) * (W - 1) / 2
    y = (uv[:, 1] + 1) * (H - 1) / 2
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    out = np.zeros((len(uv), C), feats_hwc.dtype)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi, yi = x0 + dx, y0 + dy
        w = (1 - np.abs(x - xi)) * (1 - np.abs(y - yi))
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (w > 0)
        out[ok] += w[ok, None] * feats_hwc[yi[ok], xi[ok]]
    return out


class ONCEDataset(DatasetTemplate):
    CAM_NAMES = ["cam01", "cam03", "cam05", "cam06", "cam07", "cam08",
                 "cam09"]

    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode]
        self.cam_names = list(self.dataset_cfg.get("CAM_NAMES",
                                                   self.CAM_NAMES))
        self.set_split(self.split)
        self.infos = []
        self.include_once_data(self.mode)

    def set_split(self, split):
        self.split = split
        split_file = self.root_path / "ImageSets" / f"{split}.txt"
        self.sample_seq_list = [x.strip() for x in open(split_file)] \
            if split_file.exists() else None

    def include_once_data(self, mode):
        infos = []
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            p = self.root_path / info_path
            if p.exists():
                with open(p, "rb") as f:
                    infos.extend(pickle.load(f))
        # training splits keep only annotated frames (reference
        # include_once_data check_annos, once_dataset.py:53-60)
        if mode == "train" and not self.split.startswith("raw"):
            infos = [i for i in infos if "annos" in i]
        self.infos = infos
        if self.logger:
            self.logger.info(f"ONCE samples ({self.split}): {len(infos)}")

    # -------------------------- raw-data readers --------------------------

    def get_lidar(self, seq_id, frame_id):
        f = self.root_path / "data" / seq_id / "lidar_roof" / f"{frame_id}.bin"
        return np.fromfile(str(f), np.float32).reshape(-1, 4)

    def get_image(self, seq_id, frame_id, cam_name):
        from PIL import Image
        f = self.root_path / "data" / seq_id / cam_name / f"{frame_id}.jpg"
        return np.asarray(Image.open(f))

    def project_lidar_to_image(self, points, calib_info):
        """points (N, >=3) lidar -> (uv (N, 2) pixels, depth (N,), front
        mask) for one camera's calib dict {cam_to_velo, cam_intrinsic}."""
        cam_2_velo = np.asarray(calib_info["cam_to_velo"], np.float64)
        K = np.asarray(calib_info["cam_intrinsic"], np.float64)
        homo = np.hstack([points[:, :3],
                          np.ones((len(points), 1), points.dtype)])
        pts_cam = homo @ np.linalg.inv(cam_2_velo).T
        front = pts_cam[:, 2] > 0
        img = pts_cam[:, :3] @ K.T
        uv = img[:, :2] / np.clip(img[:, 2:3], 1e-6, None)
        return uv, pts_cam[:, 2], front

    def point_painting(self, points, info):
        """Append per-point semantic one-hot scores sampled from per-camera
        segmentation maps (reference once_dataset.py:82-118; torch
        grid_sample -> numpy bilinear).  Seg maps are looked up under
        ``SEMSEG_DIR/<seq>/<cam>/<frame>_label.png``."""
        from PIL import Image
        semseg_dir = Path(self.dataset_cfg.get("SEMSEG_DIR", "./"))
        used_classes = list(self.dataset_cfg.get("PAINTING_CLASSES",
                                                 range(6)))
        C = len(used_classes)
        painted = np.zeros((points.shape[0], C), np.float32)
        for cam_name in self.cam_names:
            img_path = semseg_dir / str(info["sequence_id"]) / cam_name / \
                f"{info['frame_id']}_label.png"
            if not img_path.exists():
                continue
            seg_map = np.asarray(Image.open(img_path))
            H, W = seg_map.shape[:2]
            onehot = np.zeros((H, W, C), np.float32)
            for ci, cls_i in enumerate(used_classes):
                onehot[..., ci] = (seg_map == cls_i)
            uv, _, front = self.project_lidar_to_image(
                points, info["calib"][cam_name])
            uvn = np.stack([(uv[:, 0] - W / 2) / (W / 2),
                            (uv[:, 1] - H / 2) / (H / 2)], axis=1)
            painted[front] = _grid_sample_bilinear(onehot, uvn[front])
        return np.concatenate([points, painted], axis=1)

    # ------------------------------ loading -------------------------------

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        points = self.get_lidar(info["sequence_id"], info["frame_id"])
        if self.dataset_cfg.get("POINT_PAINTING", False):
            points = self.point_painting(points, info)
        input_dict = {"points": points, "frame_id": info["frame_id"]}
        if "annos" in info:
            input_dict.update({
                "gt_boxes": np.asarray(info["annos"]["boxes_3d"], np.float32),
                "gt_names": np.asarray(info["annos"]["name"])})
        return self.prepare_data(data_dict=input_dict)

    # -------------------------- offline tooling ---------------------------

    def get_infos(self, sample_seq_list=None):
        """Parse the per-sequence ``data/<seq>/<seq>.json`` (dataset-json
        schema in the reference docstring, once_dataset.py:160-217) into
        info dicts: sequence/frame ids, prev/next links, pose, per-camera
        paths + calib, annos with num_points_in_gt."""
        from ...ops.roiaware_pool3d import points_in_boxes_cpu

        seq_list = sample_seq_list if sample_seq_list is not None \
            else (self.sample_seq_list or [])
        all_infos = []
        for seq_idx in seq_list:
            seq_path = self.root_path / "data" / seq_idx
            with open(seq_path / f"{seq_idx}.json") as f:
                seq_json = json.load(f)
            meta_info = seq_json.get("meta_info")
            calib = seq_json["calib"]
            frames = seq_json["frames"]
            for f_idx, frame in enumerate(frames):
                frame_id = frame["frame_id"]
                info = {
                    "sequence_id": seq_idx,
                    "frame_id": frame_id,
                    "timestamp": int(frame_id),
                    "prev_id": frames[f_idx - 1]["frame_id"] if f_idx else None,
                    "next_id": (frames[f_idx + 1]["frame_id"]
                                if f_idx + 1 < len(frames) else None),
                    "meta_info": meta_info,
                    "lidar": str(seq_path / "lidar_roof" / f"{frame_id}.bin"),
                    "pose": np.asarray(frame["pose"]),
                }
                calib_dict = {}
                for cam in self.cam_names:
                    if cam not in calib:
                        continue
                    info[cam] = str(seq_path / cam / f"{frame_id}.jpg")
                    calib_dict[cam] = {
                        "cam_to_velo": np.asarray(calib[cam]["cam_to_velo"]),
                        "cam_intrinsic": np.asarray(
                            calib[cam]["cam_intrinsic"]),
                        "distortion": np.asarray(calib[cam]["distortion"]),
                    }
                info["calib"] = calib_dict
                if "annos" in frame:
                    annos = frame["annos"]
                    boxes_3d = np.asarray(annos["boxes_3d"], np.float32)
                    if boxes_3d.shape[0] == 0:
                        continue
                    annos_dict = {
                        "name": np.asarray(annos["names"]),
                        "boxes_3d": boxes_3d,
                        "boxes_2d": {c: np.asarray(annos["boxes_2d"][c])
                                     for c in annos.get("boxes_2d", {})},
                    }
                    points = self.get_lidar(seq_idx, frame_id)
                    flags = points_in_boxes_cpu(points[:, :3],
                                                boxes_3d[:, :7])
                    annos_dict["num_points_in_gt"] = \
                        flags.sum(axis=1).astype(np.int32)
                    info["annos"] = annos_dict
                all_infos.append(info)
        return all_infos

    def create_groundtruth_database(self, info_path, used_classes=None,
                                    split="train"):
        """Crop per-object point clouds into ``gt_database/`` +
        ``once_dbinfos_<split>.pkl`` (reference once_dataset.py:294-345)."""
        from ...ops.roiaware_pool3d import points_in_boxes_cpu

        db_dir = self.root_path / ("gt_database" if split == "train"
                                   else f"gt_database_{split}")
        db_dir.mkdir(parents=True, exist_ok=True)
        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        all_db_infos = {}
        for info in infos:
            if "annos" not in info:
                continue
            frame_id, seq_id = info["frame_id"], info["sequence_id"]
            points = self.get_lidar(seq_id, frame_id)
            names = info["annos"]["name"]
            gt_boxes = np.asarray(info["annos"]["boxes_3d"], np.float32)
            flags = points_in_boxes_cpu(points[:, :3], gt_boxes[:, :7])
            for i in range(len(gt_boxes)):
                if used_classes is not None and names[i] not in used_classes:
                    continue
                filename = f"{frame_id}_{names[i]}_{i}.bin"
                gt_points = points[flags[i] > 0].copy()   # flags: (M, N)
                gt_points[:, :3] -= gt_boxes[i, :3]
                gt_points.astype(np.float32).tofile(str(db_dir / filename))
                db_info = {"name": names[i],
                           "path": str((db_dir / filename)
                                       .relative_to(self.root_path)),
                           "gt_idx": i, "box3d_lidar": gt_boxes[i],
                           "num_points_in_gt": gt_points.shape[0]}
                all_db_infos.setdefault(names[i], []).append(db_info)
        out = self.root_path / f"once_dbinfos_{split}.pkl"
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


def create_once_infos(dataset_cfg, class_names, data_path, save_path,
                      splits=("train", "val")):
    """Offline verb (reference once_dataset.py:388): write
    ``once_infos_<split>.pkl`` per split + the train GT database."""
    save_path = Path(save_path)
    dataset = ONCEDataset(dataset_cfg=dataset_cfg, class_names=class_names,
                          root_path=Path(data_path), training=False)
    for split in splits:
        dataset.set_split(split)
        infos = dataset.get_infos()
        out = save_path / f"once_infos_{split}.pkl"
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        print(f"ONCE info {split}: {len(infos)} frames -> {out}")
    dataset.set_split("train")
    train_info = save_path / "once_infos_train.pkl"
    if train_info.exists():
        dataset.create_groundtruth_database(train_info, split="train")
