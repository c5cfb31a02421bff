"""Argoverse 2 dataset (parity with reference ``pcdet/datasets/argo2/``).

The reference converts av2 sensor feathers into kitti-style infos offline
(``argo2_dataset.py:19-167`` prepare/create_argo2_infos, av2-SDK-gated) and
loads ``{point_cloud: {velodyne_path}, annos: {name, location, dimensions,
rotation_y, gt_boxes_lidar}}`` infos at train time (``:304-339``).  This
loader consumes the same schema (plus our simpler ``{lidar_path, gt_boxes,
gt_names}`` form), and evaluation prefers the official av2 SDK evaluator
(``:416-486``) with a self-contained protocol twin
(``argo2_eval.argo2_eval``: center-distance AP / ATE / ASE / AOE / CDS)
when the SDK is absent.
"""

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class Argo2Dataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode] \
            if "DATA_SPLIT" in self.dataset_cfg else "val"
        self.root_split_path = self.root_path / (
            "training" if self.split != "test" else "testing")
        split_file = self.root_path / "ImageSets" / f"{self.split}.txt"
        self.sample_id_list = [x.strip() for x in open(split_file)] \
            if split_file.exists() else None
        self.evaluate_range = float(self.dataset_cfg.get("EVALUATE_RANGE",
                                                         200.0))
        self.infos = []
        self.include_argo2_data(self.mode)

    def include_argo2_data(self, mode):
        infos = []
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            p = self.root_path / info_path
            if p.exists():
                with open(p, "rb") as f:
                    infos.extend(pickle.load(f))
        self.infos.extend(infos)
        if self.logger:
            self.logger.info(f"Argo2 samples: {len(infos)}")

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def get_lidar(self, idx):
        f = self.root_split_path / "velodyne" / f"{idx}.bin"
        return np.fromfile(str(f), np.float32).reshape(-1, 4)

    @staticmethod
    def _info_boxes(info):
        """Reference kitti-style annos OR our flat schema -> (boxes, names).
        The converter stores lidar-frame boxes directly (argo2 has no
        camera-frame detour): gt = [loc, dims, rotation_y]."""
        if "annos" in info:
            annos = info["annos"]
            if "gt_boxes_lidar" in annos:
                boxes = np.asarray(annos["gt_boxes_lidar"], np.float32)
            else:
                loc = np.asarray(annos["location"], np.float32)
                dims = np.asarray(annos["dimensions"], np.float32)
                rots = np.asarray(annos["rotation_y"], np.float32)
                boxes = np.concatenate([loc, dims, rots[:, None]], axis=1)
            return boxes, np.asarray(annos["name"])
        if "gt_boxes" in info:
            return (np.asarray(info["gt_boxes"], np.float32),
                    np.asarray(info["gt_names"]))
        return None, None

    def _frame_id(self, info):
        if "point_cloud" in info:
            return Path(info["point_cloud"]["velodyne_path"]).stem
        return Path(info["lidar_path"]).stem

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        frame_id = self._frame_id(info)
        if "point_cloud" in info:
            points = self.get_lidar(frame_id)
        else:
            lidar_path = self.root_path / info["lidar_path"]
            points = np.load(lidar_path).astype(np.float32) \
                if str(lidar_path).endswith(".npy") \
                else np.fromfile(str(lidar_path), np.float32).reshape(-1, 4)
        input_dict = {"points": points, "frame_id": frame_id}
        boxes, names = self._info_boxes(info)
        if boxes is not None:
            input_dict.update({"gt_boxes": boxes[:, :7], "gt_names": names})
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
        gt_by_frame = {}
        for i in self.infos:
            boxes, names = self._info_boxes(i)
            gt_by_frame[self._frame_id(i)] = {
                "boxes": boxes if boxes is not None else np.zeros((0, 7)),
                "names": names if names is not None else np.zeros(0)}
        empty = {"boxes": np.zeros((0, 7)), "names": np.zeros(0)}
        gts = [gt_by_frame.get(d["frame_id"], empty) for d in det_annos]
        try:
            # official evaluator when the av2 SDK is importable (the
            # reference's only path, argo2_dataset.py:449-452)
            import av2.evaluation.detection.eval  # noqa: F401
            return self._av2_official_eval(det_annos, class_names)
        except ImportError:
            from .argo2_eval import argo2_eval
            return argo2_eval(det_annos, gts, class_names,
                              max_range=self.evaluate_range)

    def _av2_official_eval(self, det_annos, class_names):
        """Format + score through the av2 SDK (reference :340-486)."""
        import pandas as pd
        from av2.evaluation.detection.utils import DetectionCfg
        from av2.evaluation.detection.eval import evaluate
        from av2.utils.io import read_feather

        rows = []
        for d in det_annos:
            for i in range(len(d["boxes_lidar"])):
                b = d["boxes_lidar"][i]
                q = _yaw_to_quat(float(b[6]))
                rows.append({
                    "log_id": d.get("log_id", d["frame_id"]),
                    "timestamp_ns": int(d.get("timestamp_ns", 0)),
                    "tx_m": b[0], "ty_m": b[1], "tz_m": b[2],
                    "length_m": b[3], "width_m": b[4], "height_m": b[5],
                    "qw": q[0], "qx": q[1], "qy": q[2], "qz": q[3],
                    "score": d["score"][i], "category": d["name"][i]})
        dts = pd.DataFrame(rows).set_index(["log_id", "timestamp_ns"])
        gts = read_feather(Path(self.root_path) / "val_anno.feather")
        gts = gts.set_index(["log_id", "timestamp_ns"]).sort_values(
            "category")
        cfg = DetectionCfg(
            dataset_dir=Path(self.root_path) / "sensor" / "val",
            categories=tuple(sorted(set(gts["category"].unique()))),
            max_range_m=self.evaluate_range, eval_only_roi_instances=True)
        _, _, metrics = evaluate(dts.reset_index(), gts.reset_index(), cfg)
        return str(metrics), {i: r.to_json()
                              for i, r in metrics.iterrows()}


def _yaw_to_quat(yaw):
    return (np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2))


def create_argo2_infos(data_path, save_path, splits=("train", "val"),
                       save_bin=True):
    """Convert raw av2 sensor segments into kitti-style infos + velodyne
    bins (reference argo2_dataset.py:19-167 prepare/create_argo2_infos),
    gated on pyarrow feather reading.

    data_path/sensor/<split>/<log_id>/sensors/lidar/<ts>.feather
    -> save_path/{training,testing}/velodyne/<sample_idx>.bin
       + argo2_infos_<split>.pkl
    """
    import pyarrow.feather as feather

    data_path, save_path = Path(data_path), Path(save_path)
    split_prefix = {"train": "0", "val": "1", "test": "2"}
    prefix2dir = {"0": "training", "1": "training", "2": "testing"}

    def quat_to_yaw(qw, qx, qy, qz):
        return np.arctan2(2 * (qw * qz + qx * qy),
                          1 - 2 * (qy * qy + qz * qz))

    for split in splits:
        seg_root = data_path / "sensor" / split
        if not seg_root.exists():
            print(f"argo2: no {seg_root}, skipping {split}")
            continue
        infos = []
        counter = 0
        for seg_path in sorted(seg_root.iterdir()):
            lidar_dir = seg_path / "sensors" / "lidar"
            if not lidar_dir.exists():
                continue
            anno_path = seg_path / "annotations.feather"
            seg_anno = feather.read_feather(anno_path) \
                if anno_path.exists() else None
            for frame in sorted(lidar_dir.glob("*.feather")):
                ts = int(frame.stem)
                sample_idx = f"{split_prefix[split]}{counter:06d}"
                counter += 1
                rel_bin = str(Path(prefix2dir[split_prefix[split]])
                              / "velodyne" / f"{sample_idx}.bin")
                info = {"uuid": f"{seg_path.name}/{ts}",
                        "sample_idx": sample_idx,
                        "point_cloud": {"num_features": 4,
                                        "velodyne_path": rel_bin},
                        "image": {}, "calib": {}, "pose": {}, "sweeps": []}
                if seg_anno is not None:
                    fa = seg_anno[seg_anno["timestamp_ns"] == ts]
                    fa = fa[fa["num_interior_pts"] > 0]
                    if len(fa):
                        yaw = quat_to_yaw(fa["qw"].to_numpy(),
                                          fa["qx"].to_numpy(),
                                          fa["qy"].to_numpy(),
                                          fa["qz"].to_numpy())
                        names = np.array([c.lower().capitalize()
                                          for c in fa["category"]])
                        n = len(fa)
                        info["annos"] = {
                            "name": names,
                            "truncated": np.zeros(n),
                            "occluded": np.zeros(n, np.int64),
                            "alpha": -10 * np.ones(n),
                            "dimensions": np.stack(
                                [fa["length_m"].to_numpy(),
                                 fa["width_m"].to_numpy(),
                                 fa["height_m"].to_numpy()], 1),
                            "location": np.stack(
                                [fa["tx_m"].to_numpy(),
                                 fa["ty_m"].to_numpy(),
                                 fa["tz_m"].to_numpy()], 1),
                            "rotation_y": yaw,
                            "index": np.arange(n, dtype=np.int32),
                            "num_points_in_gt":
                                fa["num_interior_pts"].to_numpy()
                                .astype(np.int32)}
                if save_bin:
                    pc = feather.read_feather(frame)
                    pts = np.stack([pc["x"].to_numpy(), pc["y"].to_numpy(),
                                    pc["z"].to_numpy(),
                                    np.tanh(pc["intensity"].to_numpy())],
                                   axis=1).astype(np.float32)
                    out_bin = save_path / rel_bin
                    out_bin.parent.mkdir(parents=True, exist_ok=True)
                    pts.tofile(str(out_bin))
                infos.append(info)
        out = save_path / f"argo2_infos_{split}.pkl"
        with open(out, "wb") as f:
            pickle.dump(infos, f)
        print(f"argo2 info {split}: {len(infos)} -> {out}")
