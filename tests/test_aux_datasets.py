"""Aux-dataset loaders + tooling (VERDICT r2 #6): ONCE info/GT-db creation
on a synthesized mini tree, Lyft sweep transforms, Argo2 reference-schema
loading + av2-protocol evaluator, Pandaset pose math + world->ego loading.
"""

import json
import pickle

import numpy as np
import pytest

from q3d_tpu.config import EDict


def _mini_cfg(data_path, extra=None):
    cfg = EDict({
        "DATA_PATH": str(data_path),
        "POINT_CLOUD_RANGE": [-40.0, -40.0, -3.0, 40.0, 40.0, 3.0],
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "INFO_PATH": {"train": ["infos_train.pkl"],
                      "test": ["infos_val.pkl"]},
        "MAX_GT_BOXES": 16,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"]},
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "transform_points_to_voxels",
             "VOXEL_SIZE": [0.4, 0.4, 6.0],
             "MAX_POINTS_PER_VOXEL": 8,
             "MAX_NUMBER_OF_VOXELS": {"train": 2000, "test": 2000}}],
    })
    if extra:
        cfg.update(extra)
    return cfg


# ------------------------------- ONCE ------------------------------------


def _make_once_tree(root):
    """data/<seq>/<seq>.json + lidar_roof bins, 2 frames, 1 camera."""
    seq = "000027"
    seq_dir = root / "data" / seq
    (seq_dir / "lidar_roof").mkdir(parents=True)
    (root / "ImageSets").mkdir()
    (root / "ImageSets" / "train.txt").write_text(seq + "\n")
    rng = np.random.RandomState(0)
    frames = []
    for fi, frame_id in enumerate(["1616100000100", "1616100000200"]):
        box = [5.0 + fi, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3]
        inside = rng.uniform(-0.4, 0.4, (40, 3)) * np.asarray(box[3:6])
        c, s = np.cos(0.3), np.sin(0.3)
        pts = np.zeros((100, 4), np.float32)
        pts[:40, 0] = inside[:, 0] * c - inside[:, 1] * s + box[0]
        pts[:40, 1] = inside[:, 0] * s + inside[:, 1] * c + box[1]
        pts[:40, 2] = inside[:, 2]
        pts[40:, :3] = rng.uniform(10, 35, (60, 3)).astype(np.float32)
        pts[:, 3] = rng.uniform(0, 1, 100)
        pts.tofile(str(seq_dir / "lidar_roof" / f"{frame_id}.bin"))
        frames.append({
            "frame_id": frame_id,
            "pose": [1.0, 0, 0, 0, 0.0, 0.0, 0.0],
            "annos": {"names": ["Car"], "boxes_3d": [box],
                      "boxes_2d": {"cam01": [[0, 0, 10, 10]]}},
        })
    seq_json = {
        "meta_info": {"weather": "sunny"},
        "calib": {"cam01": {
            "cam_to_velo": np.eye(4).tolist(),
            "cam_intrinsic": [[500, 0, 320], [0, 500, 240], [0, 0, 1]],
            "distortion": [0] * 5}},
        "frames": frames,
    }
    with open(seq_dir / f"{seq}.json", "w") as f:
        json.dump(seq_json, f)
    return seq


def test_once_infos_gtdb_and_loading(tmp_path):
    from q3d_tpu.datasets.once.once_dataset import ONCEDataset

    seq = _make_once_tree(tmp_path)
    cfg = _mini_cfg(tmp_path, {"INFO_PATH": {
        "train": ["once_infos_train.pkl"], "test": ["once_infos_train.pkl"]}})
    ds = ONCEDataset(dataset_cfg=cfg, class_names=["Car"],
                     root_path=tmp_path, training=False)
    ds.set_split("train")
    infos = ds.get_infos()
    assert len(infos) == 2
    assert infos[0]["sequence_id"] == seq
    assert infos[0]["prev_id"] is None and infos[1]["prev_id"] is not None
    assert infos[0]["calib"]["cam01"]["cam_intrinsic"].shape == (3, 3)
    # num_points_in_gt counted the 40 in-box points
    assert infos[0]["annos"]["num_points_in_gt"][0] == 40

    info_path = tmp_path / "once_infos_train.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)

    # GT database crops exactly the in-box points, centered
    out = ds.create_groundtruth_database(info_path, split="train")
    with open(out, "rb") as f:
        db = pickle.load(f)
    assert "Car" in db and len(db["Car"]) == 2
    assert db["Car"][0]["num_points_in_gt"] == 40
    crop = np.fromfile(str(tmp_path / db["Car"][0]["path"]),
                       np.float32).reshape(-1, 4)
    assert np.abs(crop[:, :2]).max() < 3.0       # centered on the box

    # loader consumes the created infos end-to-end
    ds2 = ONCEDataset(dataset_cfg=cfg, class_names=["Car"],
                      root_path=tmp_path, training=False)
    assert len(ds2) == 2
    item = ds2[0]
    assert item["voxels"].shape[0] == 2000
    assert (item["gt_boxes"][:, :7] != 0).any()


def test_once_projection_and_painting(tmp_path):
    from q3d_tpu.datasets.once.once_dataset import (ONCEDataset,
                                                    _grid_sample_bilinear)

    # identity extrinsic, simple pinhole: a point at z=10 on the axis maps
    # to the principal point
    calib = {"cam_to_velo": np.eye(4),
             "cam_intrinsic": np.asarray([[500., 0, 320], [0, 500., 240],
                                          [0, 0, 1]])}
    ds = ONCEDataset.__new__(ONCEDataset)     # projection needs no state
    pts = np.asarray([[0.0, 0.0, 10.0], [1.0, 0.0, 10.0],
                      [0.0, 0.0, -5.0]], np.float64)
    uv, depth, front = ds.project_lidar_to_image(pts, calib)
    np.testing.assert_allclose(uv[0], [320, 240], atol=1e-6)
    np.testing.assert_allclose(uv[1], [370, 240], atol=1e-6)  # 500*1/10
    assert front.tolist() == [True, True, False]

    # bilinear sampler: constant map samples to the constant inside, 0 out
    feats = np.ones((8, 8, 2), np.float32)
    uv_n = np.asarray([[0.0, 0.0], [5.0, 5.0]])       # center, far outside
    out = _grid_sample_bilinear(feats, uv_n)
    np.testing.assert_allclose(out[0], [1, 1], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0], atol=1e-6)


# ------------------------------- Lyft ------------------------------------


def test_lyft_sweep_transform_and_time_lag(tmp_path):
    from q3d_tpu.datasets.lyft.lyft_dataset import LyftDataset

    key = np.zeros((10, 5), np.float32)
    key[:, 0] = np.linspace(5, 20, 10)
    key[:, 1] = 3.0
    key.tofile(str(tmp_path / "key.bin"))
    sweep = np.zeros((8, 5), np.float32)
    sweep[:, 0] = np.linspace(6, 18, 8)
    sweep[:, 1] = -2.0
    sweep.tofile(str(tmp_path / "sweep.bin"))
    tm = np.eye(4, dtype=np.float32)
    tm[0, 3] = 100.0                                  # +100 m x shift

    infos = [{"lidar_path": "key.bin", "token": "t0",
              "sweeps": [{"lidar_path": "sweep.bin",
                          "transform_matrix": tm, "time_lag": 0.45}]}]
    with open(tmp_path / "infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = _mini_cfg(tmp_path, {
        "MAX_SWEEPS": 2,
        "POINT_CLOUD_RANGE": [-200.0, -40.0, -3.0, 200.0, 40.0, 3.0],
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "timestamp"],
            "src_feature_list": ["x", "y", "z", "intensity", "timestamp"]}})
    ds = LyftDataset(dataset_cfg=cfg, class_names=["car"],
                     root_path=tmp_path, training=False)
    pts = ds.get_lidar_with_sweeps(0, max_sweeps=2)
    assert pts.shape == (18, 5)
    np.testing.assert_allclose(pts[:10, 4], 0.0)       # keyframe time lag
    np.testing.assert_allclose(pts[10:, 4], 0.45)
    assert pts[10:, 0].min() > 100                     # transform applied


# ------------------------------- Argo2 -----------------------------------


def test_argo2_reference_schema_loading(tmp_path):
    from q3d_tpu.datasets.argo2.argo2_dataset import Argo2Dataset

    (tmp_path / "training" / "velodyne").mkdir(parents=True)
    pts = np.random.RandomState(0).uniform(-30, 30, (200, 4)) \
        .astype(np.float32)
    pts.tofile(str(tmp_path / "training" / "velodyne" / "0000001.bin"))
    infos = [{
        "sample_idx": "0000001",
        "point_cloud": {"num_features": 4,
                        "velodyne_path": "training/velodyne/0000001.bin"},
        "annos": {"name": np.asarray(["Regular_vehicle"]),
                  "location": np.asarray([[5.0, 2.0, 0.0]]),
                  "dimensions": np.asarray([[4.0, 2.0, 1.5]]),
                  "rotation_y": np.asarray([0.3])},
    }]
    with open(tmp_path / "infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = _mini_cfg(tmp_path)
    ds = Argo2Dataset(dataset_cfg=cfg, class_names=["Regular_vehicle"],
                      root_path=tmp_path, training=False)
    item = ds[0]
    gt = item["gt_boxes"]
    row = gt[(gt[:, :6] != 0).any(axis=1)]
    np.testing.assert_allclose(row[0, :7],
                               [5, 2, 0, 4, 2, 1.5, 0.3], atol=1e-5)


def test_argo2_eval_perfect_and_degraded():
    from q3d_tpu.datasets.argo2.argo2_eval import argo2_eval

    rng = np.random.RandomState(0)
    gts, perfect, shifted, rotated = [], [], [], []
    for f in range(8):
        boxes = np.asarray([[5.0 + f, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3],
                            [-10.0, 8.0 + f, 0.5, 4.5, 2.0, 1.6, -1.0]])
        names = np.asarray(["Regular_vehicle"] * 2)
        gts.append({"boxes": boxes, "names": names})
        sc = rng.uniform(0.5, 1.0, 2)
        perfect.append({"boxes_lidar": boxes, "name": names, "score": sc})
        sh = boxes.copy()
        sh[:, 0] += 3.0                                 # 3 m off
        shifted.append({"boxes_lidar": sh, "name": names, "score": sc})
        rot = boxes.copy()
        rot[:, 6] += np.pi                              # flipped heading
        rotated.append({"boxes_lidar": rot, "name": names, "score": sc})

    _, perfect_res = argo2_eval(perfect, gts, ["Regular_vehicle"])
    assert perfect_res["mean/AP"] > 0.95
    assert perfect_res["mean/ATE"] < 1e-6
    assert perfect_res["mean/CDS"] > 0.95

    _, shifted_res = argo2_eval(shifted, gts, ["Regular_vehicle"])
    # 3 m error: matched only at the 4 m threshold -> AP ~ 1/4
    assert 0.15 < shifted_res["mean/AP"] < 0.35

    _, rot_res = argo2_eval(rotated, gts, ["Regular_vehicle"])
    assert rot_res["mean/AP"] > 0.95                   # matching unaffected
    assert rot_res["mean/AOE"] > 3.0                   # ~pi orientation err
    assert rot_res["mean/CDS"] < 0.75                  # CDS punished


# ------------------------------ Pandaset ----------------------------------


def test_pandaset_pose_math_roundtrip():
    from q3d_tpu.datasets.pandaset.pandaset_dataset import (
        lidar_points_to_ego, ego_to_lidar_points, pose_dict_to_numpy,
        pose_numpy_to_dict)

    pose = {"position": {"x": 10.0, "y": -5.0, "z": 1.0},
            "heading": {"w": np.cos(0.4), "x": 0.0, "y": 0.0,
                        "z": np.sin(0.4)}}
    rng = np.random.RandomState(0)
    pts = rng.uniform(-20, 20, (50, 3))
    back = ego_to_lidar_points(lidar_points_to_ego(pts, pose), pose)
    np.testing.assert_allclose(back, pts, atol=1e-9)
    p2 = pose_numpy_to_dict(pose_dict_to_numpy(pose))
    assert p2["position"]["x"] == 10.0 and p2["heading"]["w"] == pose[
        "heading"]["w"]


def test_pandaset_sequence_loading(tmp_path):
    pd = pytest.importorskip("pandas")
    from q3d_tpu.datasets.pandaset.pandaset_dataset import PandasetDataset

    seq = "001"
    seq_dir = tmp_path / "dataset" / seq
    (seq_dir / "lidar").mkdir(parents=True)
    (seq_dir / "annotations" / "cuboids").mkdir(parents=True)
    # ego at world (100, 50), yawed 90 deg: world x -> pandaset-ego -y
    yaw = np.pi / 2
    pose = {"position": {"x": 100.0, "y": 50.0, "z": 0.0},
            "heading": {"w": np.cos(yaw / 2), "x": 0.0, "y": 0.0,
                        "z": np.sin(yaw / 2)}}
    with open(seq_dir / "lidar" / "poses.json", "w") as f:
        json.dump([pose], f)
    rng = np.random.RandomState(0)
    world = rng.uniform(-10, 10, (120, 3)) + np.asarray([100.0, 50.0, 0.0])
    df = pd.DataFrame({"x": world[:, 0], "y": world[:, 1], "z": world[:, 2],
                       "i": rng.uniform(0, 255, 120), "t": 0.0,
                       "d": np.zeros(120, int)})
    df.columns = ["x", "y", "z", "i", "t", "d"]
    df.to_pickle(seq_dir / "lidar" / "00.pkl.gz")
    cub = pd.DataFrame({
        "position.x": [105.0], "position.y": [50.0], "position.z": [0.5],
        "dimensions.x": [2.0], "dimensions.y": [4.0], "dimensions.z": [1.5],
        "yaw": [0.0], "label": ["Car"],
        "cuboids.sensor_id": [0]})
    cub.to_pickle(seq_dir / "annotations" / "cuboids" / "00.pkl.gz")

    cfg = _mini_cfg(tmp_path, {
        "SEQUENCES": {"train": [seq], "val": [seq], "test": []},
        "INFO_PATH": {"train": ["pandaset_infos_train.pkl"],
                      "test": ["pandaset_infos_train.pkl"]}})
    ds = PandasetDataset(dataset_cfg=cfg, class_names=["Car"],
                         root_path=tmp_path, training=False)
    ds.set_split("train")
    infos = ds.get_infos()
    assert len(infos) == 1
    with open(tmp_path / "pandaset_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)

    pose_d = ds._get_pose(infos[0])
    pts = ds._get_lidar_points(infos[0], pose_d)
    # world (105, 50, .5) with ego at (100, 50) yaw 90deg:
    # pandaset-ego = R^T(p-t) = (0, -5, .5); normative = (y, -x, z)
    boxes, names, zrot = ds._get_annotations(infos[0], pose_d)
    np.testing.assert_allclose(boxes[0, :3], [-5.0, 0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(boxes[0, 3:6], [4.0, 2.0, 1.5], atol=1e-6)
    assert names[0] == "Car"
    assert pts.shape[1] == 4 and pts[:, 3].max() <= 1.0

    ds2 = PandasetDataset(dataset_cfg=cfg, class_names=["Car"],
                          root_path=tmp_path, training=False)
    item = ds2[0]
    assert item["voxels"].shape[0] == 2000


def test_integrated_database_roundtrip(tmp_path):
    """tools/create_infos.py integrated (reference
    process_tools/create_integrated_database.py:1-86): per-object .bin
    files merge into one global .npy with per-info global_data_offset, and
    DataBaseSampler serves identical points from the mmap as from files."""
    import pickle
    import sys
    from pathlib import Path

    sys.path.insert(0, str((Path(__file__).parent.parent / "tools")))
    from create_infos import create_integrated_database
    from q3d_tpu.config import EDict
    from q3d_tpu.datasets.augmentor.database_sampler import DataBaseSampler

    rng = np.random.RandomState(3)
    db = {"Car": [], "Pedestrian": []}
    for c, n_obj in (("Car", 3), ("Pedestrian", 2)):
        for i in range(n_obj):
            pts = rng.randn(10 + i, 4).astype(np.float32)
            rel = f"gt_db/{c}_{i}.bin"
            (tmp_path / "gt_db").mkdir(exist_ok=True)
            pts.tofile(tmp_path / rel)
            db[c].append({
                "name": c, "path": rel, "num_points_in_gt": pts.shape[0],
                "difficulty": 0,
                "box3d_lidar": np.array([i, 0, 0, 4, 2, 1.5, 0],
                                        np.float32)})
    info_p = tmp_path / "dbinfos_train.pkl"
    with open(info_p, "wb") as f:
        pickle.dump(db, f)

    out = create_integrated_database(str(info_p), "db_global",
                                     num_point_features=4)
    assert out.exists()
    with open(info_p, "rb") as f:
        db2 = pickle.load(f)
    # offsets are contiguous in iteration order and slice back exactly
    glob = np.load(out)
    for c in ("Car", "Pedestrian"):
        for i, info in enumerate(db2[c]):
            s0, e0 = info["global_data_offset"]
            want = np.fromfile(tmp_path / info["path"],
                               np.float32).reshape(-1, 4)
            np.testing.assert_array_equal(glob[s0:e0], want)

    cfg = EDict({"DB_INFO_PATH": ["dbinfos_train.pkl"],
                 "DB_DATA_PATH": ["db_global.npy"],
                 "SAMPLE_GROUPS": ["Car:2", "Pedestrian:1"],
                 "NUM_POINT_FEATURES": 4})
    sampler = DataBaseSampler(tmp_path, cfg, ["Car", "Pedestrian"])
    assert sampler._global_db_path is not None
    for info in db2["Car"]:
        got = sampler._load_points(info)
        want = np.fromfile(tmp_path / info["path"],
                           np.float32).reshape(-1, 4)
        np.testing.assert_array_equal(got, want)
