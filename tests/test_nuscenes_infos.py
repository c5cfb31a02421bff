"""nuScenes info/GT-database creation tooling (reference
nuscenes_dataset.py:313-435): quaternion geometry + database crop."""

import numpy as np
import pytest

from q3d_tpu.datasets.nuscenes import nuscenes_infos as NI


def test_quat_identity_and_yaw():
    np.testing.assert_allclose(NI.quat_to_rotmat([1, 0, 0, 0]), np.eye(3),
                               atol=1e-12)
    # yaw rotation of 0.7 rad about z
    half = 0.35
    q = [np.cos(half), 0, 0, np.sin(half)]
    R = NI.quat_to_rotmat(q)
    c, s = np.cos(0.7), np.sin(0.7)
    np.testing.assert_allclose(R, [[c, -s, 0], [s, c, 0], [0, 0, 1]],
                               atol=1e-12)
    np.testing.assert_allclose(NI.quaternion_yaw(q), 0.7, atol=1e-12)


def test_transform_matrix_inverse_roundtrip():
    rng = np.random.RandomState(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    T = NI.transform_matrix(t, q, inverse=False)
    Ti = NI.transform_matrix(t, q, inverse=True)
    np.testing.assert_allclose(T @ Ti, np.eye(4), atol=1e-10)
    p = rng.normal(size=(5, 3))
    hom = np.hstack([p, np.ones((5, 1))])
    back = (Ti @ (T @ hom.T)).T[:, :3]
    np.testing.assert_allclose(back, p, atol=1e-10)


class _FakeNuScenesDataset:
    """Duck-typed stand-in exposing infos + get_lidar_with_sweeps."""

    def __init__(self, root, infos, points):
        self.root_path = root
        self.infos = infos
        self._points = points

    def get_lidar_with_sweeps(self, idx, max_sweeps=10):
        return self._points[idx]


def test_create_groundtruth_database(tmp_path):
    rng = np.random.RandomState(1)
    box = np.array([[5, 3, 0, 4, 2, 2, 0.3, 0.0, 0.0]], np.float64)
    # 30 points inside the box + 100 noise points far away
    local = rng.uniform(-0.4, 0.4, (30, 3)) * box[0, 3:6]
    c, s = np.cos(0.3), np.sin(0.3)
    inside = np.zeros((30, 5), np.float32)
    inside[:, 0] = local[:, 0] * c - local[:, 1] * s + 5
    inside[:, 1] = local[:, 0] * s + local[:, 1] * c + 3
    inside[:, 2] = local[:, 2]
    noise = rng.uniform(20, 50, (100, 5)).astype(np.float32)
    pts = np.concatenate([inside, noise])

    infos = [{"gt_boxes": box, "gt_names": np.array(["car"])}]
    ds = _FakeNuScenesDataset(tmp_path, infos, [pts])
    out = NI.create_groundtruth_database(ds, max_sweeps=10)
    assert out.exists()
    import pickle
    with open(out, "rb") as f:
        db = pickle.load(f)
    assert "car" in db and len(db["car"]) == 1
    entry = db["car"][0]
    assert entry["num_points_in_gt"] == 30
    crop = np.fromfile(str(tmp_path / entry["path"]),
                       np.float32).reshape(-1, 5)
    assert len(crop) == 30
    # points stored center-relative: all within half-dims
    assert np.all(np.abs(crop[:, 2]) <= 1.0 + 1e-5)


def test_detection_name_mapping():
    assert NI.MAP_NAME_TO_DETECTION["vehicle.car"] == "car"
    assert NI.MAP_NAME_TO_DETECTION["human.pedestrian.adult"] == "pedestrian"
    assert NI.MAP_NAME_TO_DETECTION["movable_object.barrier"] == "barrier"
