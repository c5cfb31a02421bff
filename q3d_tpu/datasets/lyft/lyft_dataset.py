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
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    @staticmethod
    def remove_ego_points(points, center_radius=1.0):
        """Drop returns off the ego vehicle (reference lyft_dataset.py:38)."""
        mask = ~((np.abs(points[:, 0]) < center_radius * 1.5)
                 & (np.abs(points[:, 1]) < center_radius))
        return points[mask]

    def _read_bin(self, rel_path):
        pts = np.fromfile(str(self.root_path / rel_path), np.float32)
        if pts.shape[0] % 5 != 0:                 # truncated tail guard
            pts = pts[: pts.shape[0] - (pts.shape[0] % 5)]
        return pts.reshape(-1, 5)[:, :4]

    def get_sweep(self, sweep_info):
        """One past sweep: ego-filtered, transformed into the keyframe's
        lidar frame, with its time lag column (reference :42-56)."""
        pts = self.remove_ego_points(self._read_bin(sweep_info["lidar_path"]))
        tm = sweep_info.get("transform_matrix")
        if tm is not None:
            tm = np.asarray(tm, np.float32)
            homo = np.hstack([pts[:, :3], np.ones((len(pts), 1), np.float32)])
            pts = np.concatenate([(homo @ tm.T)[:, :3], pts[:, 3:]], axis=1)
        times = np.full((len(pts), 1), float(sweep_info.get("time_lag", 0.0)),
                        np.float32)
        return pts, times

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        """Keyframe + up to (max_sweeps-1) randomly chosen past sweeps,
        concatenated with a timestamp feature column (reference :58-79)."""
        info = self.infos[index]
        points = self._read_bin(info["lidar_path"])
        sweep_points = [points]
        sweep_times = [np.zeros((len(points), 1), np.float32)]
        sweeps = info.get("sweeps", [])
        k = min(max(max_sweeps - 1, 0), len(sweeps))
        if k:
            for si in np.random.choice(len(sweeps), k, replace=False):
                p, t = self.get_sweep(sweeps[si])
                sweep_points.append(p)
                sweep_times.append(t)
        points = np.concatenate(sweep_points, axis=0)
        times = np.concatenate(sweep_times, axis=0).astype(points.dtype)
        return np.concatenate([points, times], axis=1)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = self.infos[index]
        points = self.get_lidar_with_sweeps(index, max_sweeps=self.max_sweeps)
        input_dict = {"points": points,
                      "frame_id": Path(info["lidar_path"]).stem,
                      "metadata": {"token": info.get("token")}}
        if "gt_boxes" in info:
            input_dict.update({"gt_boxes": info["gt_boxes"][:, :7],
                               "gt_names": info["gt_names"]})
        return self.prepare_data(data_dict=input_dict)

    def create_groundtruth_database(self, used_classes=None, max_sweeps=10):
        """Per-object point crops + ``lyft_dbinfos_train.pkl`` (reference
        lyft_dataset.py:162-205)."""
        import pickle as pkl
        from ...ops.roiaware_pool3d import points_in_boxes_cpu
        db_dir = self.root_path / f"gt_database_{max_sweeps}sweeps_withvelo"
        db_dir.mkdir(parents=True, exist_ok=True)
        all_db_infos = {}
        for idx in range(len(self.infos)):
            info = self.infos[idx]
            if "gt_boxes" not in info:
                continue
            points = self.get_lidar_with_sweeps(idx, max_sweeps=max_sweeps)
            gt_boxes = np.asarray(info["gt_boxes"], np.float32)
            names = info["gt_names"]
            flags = points_in_boxes_cpu(points[:, :3], gt_boxes[:, :7])
            sample_idx = Path(info["lidar_path"]).stem
            for i in range(len(gt_boxes)):
                if used_classes is not None and names[i] not in used_classes:
                    continue
                filename = f"{sample_idx}_{names[i]}_{i}.bin"
                gt_points = points[flags[i] > 0].copy()
                gt_points[:, :3] -= gt_boxes[i, :3]
                gt_points.astype(np.float32).tofile(str(db_dir / filename))
                all_db_infos.setdefault(names[i], []).append({
                    "name": names[i],
                    "path": str((db_dir / filename)
                                .relative_to(self.root_path)),
                    "image_idx": sample_idx, "gt_idx": i,
                    "box3d_lidar": gt_boxes[i],
                    "num_points_in_gt": gt_points.shape[0]})
        out = self.root_path / "lyft_dbinfos_train.pkl"
        with open(out, "wb") as f:
            pkl.dump(all_db_infos, f)
        return out

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


def create_lyft_infos(version, data_path, save_path, max_sweeps=10):
    """Offline info creation (reference lyft_dataset.py:207 + lyft_utils
    fill_trainval_infos) — gated on the lyft SDK like the reference.

    Emits lyft_infos_{train,val}.pkl (or _test) with the sweep schema the
    loader consumes: lidar_path, token, timestamp, sweeps[{lidar_path,
    transform_matrix, time_lag}], gt_boxes (9: xyz dxdydz yaw vxy),
    gt_names.
    """
    import pickle as pkl
    from functools import reduce
    from lyft_dataset_sdk.lyftdataset import LyftDataset as Lyft
    from pyquaternion import Quaternion

    def tmat(translation, rotation, inverse=False):
        tm = np.eye(4)
        if inverse:
            rot = Quaternion(rotation).rotation_matrix.T
            tm[:3, :3] = rot
            tm[:3, 3] = rot @ (-np.asarray(translation))
        else:
            tm[:3, :3] = Quaternion(rotation).rotation_matrix
            tm[:3, 3] = np.asarray(translation)
        return tm

    data_path, save_path = Path(data_path), Path(save_path)
    split_dir = data_path / "ImageSets"
    splits = {"train": split_dir / "train.txt", "val": split_dir / "val.txt"} \
        if version != "test" else {"test": split_dir / "test.txt"}
    scene_lists = {k: ({x.strip() for x in open(v)} if v.exists() else set())
                   for k, v in splits.items()}

    lyft = Lyft(json_path=str(data_path / version / "data"),
                data_path=str(data_path / version), verbose=True)
    scene_name = {s["token"]: s["name"] for s in lyft.scene}
    infos = {k: [] for k in splits}
    for sample in lyft.sample:
        sd_token = sample["data"]["LIDAR_TOP"]
        sd = lyft.get("sample_data", sd_token)
        cs = lyft.get("calibrated_sensor", sd["calibrated_sensor_token"])
        pose = lyft.get("ego_pose", sd["ego_pose_token"])
        ref_from_car = tmat(cs["translation"], cs["rotation"], inverse=True)
        car_from_global = tmat(pose["translation"], pose["rotation"],
                               inverse=True)
        ref_time = 1e-6 * sd["timestamp"]
        lidar_path = Path(lyft.get_sample_data_path(sd_token))
        info = {"lidar_path": str(lidar_path.relative_to(data_path)),
                "token": sample["token"], "timestamp": ref_time, "sweeps": []}
        # past sweeps with global-frame chained transforms
        cur = sd
        while len(info["sweeps"]) < max_sweeps - 1 and cur["prev"]:
            cur = lyft.get("sample_data", cur["prev"])
            p = lyft.get("ego_pose", cur["ego_pose_token"])
            c = lyft.get("calibrated_sensor", cur["calibrated_sensor_token"])
            tm = reduce(np.dot, [
                ref_from_car, car_from_global,
                tmat(p["translation"], p["rotation"]),
                tmat(c["translation"], c["rotation"])])
            info["sweeps"].append({
                "lidar_path": str(Path(lyft.get_sample_data_path(
                    cur["token"])).relative_to(data_path)),
                "transform_matrix": tm,
                "time_lag": ref_time - 1e-6 * cur["timestamp"]})
        # annotations in the reference's lidar frame
        boxes, names = [], []
        for ann_token in sample["anns"]:
            ann = lyft.get("sample_annotation", ann_token)
            box = lyft.get_box(ann_token)
            box.translate(-np.asarray(pose["translation"]))
            box.rotate(Quaternion(pose["rotation"]).inverse)
            box.translate(-np.asarray(cs["translation"]))
            box.rotate(Quaternion(cs["rotation"]).inverse)
            yaw = box.orientation.yaw_pitch_roll[0]
            boxes.append([*box.center, box.wlh[1], box.wlh[0], box.wlh[2],
                          yaw, 0.0, 0.0])
            names.append(ann["category_name"])
        if boxes:
            info["gt_boxes"] = np.asarray(boxes, np.float32)
            info["gt_names"] = np.asarray(names)
        scene = scene_name[sample["scene_token"]]
        for split, scenes in scene_lists.items():
            if not scenes or scene in scenes:
                infos[split].append(info)
                break
    outs = []
    for split, lst in infos.items():
        out = save_path / f"lyft_infos_{split}.pkl"
        with open(out, "wb") as f:
            pkl.dump(lst, f)
        print(f"lyft info {split}: {len(lst)} -> {out}")
        outs.append(out)
    return outs
