"""Training-loop integration: optimizer builders, loss decreases, checkpoint
save/resume round trip, data augmentor."""

from pathlib import Path

import jax
import numpy as np
import optax
import pytest

from q3d_tpu.config import cfg_from_yaml_file, EDict
from q3d_tpu.datasets import build_dataloader
from q3d_tpu.models import build_network, load_data_to_device
from q3d_tpu.optimization import build_optimizer
from q3d_tpu.parallel import make_train_step

CFG_PATH = Path(__file__).resolve().parent.parent / \
    "tools/cfgs/synthetic_models/pointpillar_tiny.yaml"


def test_optimizer_builders():
    cfg = EDict({"OPTIMIZER": "adam_onecycle", "LR": 0.003,
                 "WEIGHT_DECAY": 0.01, "PCT_START": 0.4, "DIV_FACTOR": 10,
                 "GRAD_NORM_CLIP": 10})
    tx, sched = build_optimizer(cfg, total_steps=100)
    assert callable(sched)
    lrs = [float(sched(i)) for i in (0, 40, 99)]
    assert lrs[1] == pytest.approx(0.003, rel=0.05)   # peak at PCT_START
    assert lrs[0] < lrs[1] and lrs[2] < lrs[1]

    cfg2 = EDict({"OPTIMIZER": "adam", "LR": 0.01, "WEIGHT_DECAY": 0.0,
                  "DECAY_STEP_LIST": [10, 20], "LR_DECAY": 0.1})
    tx2, sched2 = build_optimizer(cfg2, total_steps=30)
    assert float(sched2(5)) == pytest.approx(0.01)
    assert float(sched2(15)) == pytest.approx(0.001)
    assert float(sched2(25)) == pytest.approx(0.0001)


def test_train_step_reduces_loss():
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    batch = {k: v for k, v in batch.items()
             if k in ("voxels", "voxel_coords", "voxel_num_points",
                      "gt_boxes", "batch_size")}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = optax.adam(3e-3)
    opt_state = tx.init(variables["params"])
    step = make_train_step(model, tx)

    losses = []
    for i in range(8):
        variables, opt_state, loss, _ = step(variables, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # overfitting one batch must reduce the loss substantially
    assert losses[-1] < losses[0] * 0.9, losses


def test_checkpoint_roundtrip(tmp_path):
    from q3d_tpu.utils.checkpoint import (save_checkpoint, load_checkpoint,
                                          find_latest_checkpoint)
    variables = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    p = save_checkpoint(tmp_path / "checkpoint_epoch_1.pkl", variables,
                        epoch=1, it=10)
    loaded, _, epoch, it = load_checkpoint(p, variables)
    np.testing.assert_array_equal(np.asarray(loaded["params"]["w"]),
                                  variables["params"]["w"])
    assert (epoch, it) == (1, 10)
    assert find_latest_checkpoint(tmp_path) == p


def test_augmentor_consistency():
    """World transforms must keep points inside their boxes."""
    from q3d_tpu.datasets.augmentor import augmentor_utils
    from q3d_tpu.ops.roiaware_pool3d import points_in_boxes_cpu
    rng = np.random.RandomState(0)
    box = np.array([[5, 3, 0, 4, 2, 2, 0.7]], np.float32)
    # points strictly inside the box
    local = rng.uniform(-0.45, 0.45, (50, 3)) * box[0, 3:6]
    c, s = np.cos(0.7), np.sin(0.7)
    pts = np.zeros((50, 4), np.float32)
    pts[:, 0] = local[:, 0] * c - local[:, 1] * s + 5
    pts[:, 1] = local[:, 0] * s + local[:, 1] * c + 3
    pts[:, 2] = local[:, 2]

    for fn in [lambda b, p: augmentor_utils.random_flip_along_x(b, p, force=True)[:2],
               lambda b, p: augmentor_utils.random_flip_along_y(b, p, force=True)[:2],
               lambda b, p: augmentor_utils.global_rotation(b, p, [0.3, 0.3])[:2],
               lambda b, p: augmentor_utils.global_scaling(b, p, [1.1, 1.1])[:2]]:
        b2, p2 = fn(box.copy(), pts.copy())
        flags = points_in_boxes_cpu(p2[:, :3], b2[:, :7])
        assert flags.sum() == 50, "augmentation broke point-box consistency"


def test_gt_sampler_road_plane_lift(tmp_path):
    """USE_ROAD_PLANE drops sampled boxes onto the camera-frame ground plane
    (reference database_sampler.py:150-167): box bottom ends on the plane
    and points move with the box."""
    import pickle
    from q3d_tpu.datasets.augmentor.database_sampler import DataBaseSampler
    from q3d_tpu.config import EDict

    # identity-ish calib: rect frame = (x=-y_l, y=-z_l, z=x_l)
    class FakeCalib:
        def lidar_to_rect(self, pts):
            return np.stack([-pts[:, 1], -pts[:, 2], pts[:, 0]], axis=1)

        def rect_to_lidar(self, pts):
            return np.stack([pts[:, 2], -pts[:, 0], -pts[:, 1]], axis=1)

    obj = np.zeros((20, 4), np.float32)
    obj[:, 2] = np.linspace(-1, 1, 20)  # center-relative z spread
    np.save(tmp_path / "car0.npy", obj)
    db = {"Car": [{"name": "Car", "path": "car0.npy",
                   "box3d_lidar": np.array([10, 0, 5.0, 4, 2, 2, 0],
                                           np.float32),
                   "num_points_in_gt": 20, "difficulty": 0}]}
    with open(tmp_path / "db.pkl", "wb") as f:
        pickle.dump(db, f)

    cfg = EDict(DB_INFO_PATH=["db.pkl"], SAMPLE_GROUPS=["Car:1"],
                USE_ROAD_PLANE=True, PREPARE=EDict())
    sampler = DataBaseSampler(tmp_path, cfg, ["Car"])
    # camera-frame plane y = -1  <=>  lidar z = 1 (b=1: -d - 0 - 0 = -1)
    data = {"gt_boxes": np.zeros((0, 7), np.float32),
            "gt_names": np.array([], dtype="<U10"),
            "points": np.zeros((1, 4), np.float32) + 50,
            "road_plane": np.array([0.0, 1.0, 0.0, 1.0]),
            "calib": FakeCalib()}
    out = sampler(data)
    assert len(out["gt_boxes"]) == 1
    box = out["gt_boxes"][0]
    # bottom face (z - dz/2) must rest on lidar z = 1
    assert abs((box[2] - box[5] / 2) - 1.0) < 1e-5
    # points moved with the box: centered on the lifted z
    zs = out["points"][:-1, 2]
    assert abs(zs.mean() - box[2]) < 1e-5


def test_qat_train_step_reduces_loss():
    """Training under fake-quant rules (QAT) must also learn (STE works)."""
    from q3d_tpu.quant.api import pointpillar_recipe
    from q3d_tpu.quant.rules import quant_rules_scope
    cfg = cfg_from_yaml_file(str(CFG_PATH), EDict())
    dataset, loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size=2, training=True)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)
    batch = load_data_to_device(next(iter(loader)))
    batch = {k: v for k, v in batch.items()
             if k in ("voxels", "voxel_coords", "voxel_num_points",
                      "gt_boxes", "batch_size")}
    rules = pointpillar_recipe()
    with quant_rules_scope(rules):
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = optax.adam(3e-3)
    opt_state = tx.init(variables["params"])
    step = make_train_step(model, tx, rules=rules)
    losses = []
    for _ in range(6):
        variables, opt_state, loss, _ = step(variables, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def _box_with_points(rng, center=(5, 3, 0), dims=(4, 2, 2), yaw=0.7, n=50):
    box = np.array([[*center, *dims, yaw]], np.float32)
    local = rng.uniform(-0.45, 0.45, (n, 3)) * box[0, 3:6]
    c, s = np.cos(yaw), np.sin(yaw)
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = local[:, 0] * c - local[:, 1] * s + center[0]
    pts[:, 1] = local[:, 0] * s + local[:, 1] * c + center[1]
    pts[:, 2] = local[:, 2] + center[2]
    pts[:, 3] = rng.uniform(0, 1, n)
    return box, pts


def test_local_augmentations_keep_points_in_boxes():
    """Local translation / rotation / scaling move each object's points WITH
    the box (reference augmentor_utils.py:153-367)."""
    from q3d_tpu.datasets.augmentor import augmentor_utils
    from q3d_tpu.ops.roiaware_pool3d import points_in_boxes_cpu
    rng = np.random.RandomState(0)
    box, pts = _box_with_points(rng)

    for fn in [
        lambda b, p: augmentor_utils.random_local_translation_along_x(
            b, p, [1.0, 1.0]),
        lambda b, p: augmentor_utils.random_local_translation_along_y(
            b, p, [-0.8, -0.8]),
        lambda b, p: augmentor_utils.random_local_translation_along_z(
            b, p, [0.5, 0.5]),
        lambda b, p: augmentor_utils.local_rotation(b, p, [0.4, 0.4]),
        lambda b, p: augmentor_utils.local_scaling(b, p, [1.15, 1.25]),
    ]:
        np.random.seed(3)
        b2, p2 = fn(box.copy(), pts.copy())
        flags = points_in_boxes_cpu(p2[:, :3], b2[:, :7])
        assert flags.sum() == len(pts), "local aug broke point-box pairing"
        assert not np.allclose(p2[:, :3], pts[:, :3]), "aug was a no-op"


def test_local_translation_moves_box_and_points_together():
    from q3d_tpu.datasets.augmentor import augmentor_utils
    rng = np.random.RandomState(1)
    box, pts = _box_with_points(rng)
    np.random.seed(0)
    b2, p2 = augmentor_utils.random_local_translation_along_x(
        box.copy(), pts.copy(), [2.0, 2.0])
    np.testing.assert_allclose(b2[0, 0] - box[0, 0], 2.0, atol=1e-6)
    np.testing.assert_allclose(p2[:, 0] - pts[:, 0], 2.0, atol=1e-6)
    # outside points untouched
    far = np.array([[50.0, 50, 0, 0.5]], np.float32)
    np.random.seed(0)
    _, p3 = augmentor_utils.random_local_translation_along_x(
        box.copy(), far.copy(), [2.0, 2.0])
    np.testing.assert_allclose(p3, far)


def test_global_frustum_dropout_directions():
    from q3d_tpu.datasets.augmentor import augmentor_utils
    rng = np.random.RandomState(2)
    pts = rng.uniform(-10, 10, (500, 4)).astype(np.float32)
    boxes = np.array([[0, 9.5, 0, 2, 2, 2, 0.0],
                      [0, -9.5, 0, 2, 2, 2, 0.0]], np.float32)
    np.random.seed(0)
    b2, p2 = augmentor_utils.global_frustum_dropout_left(
        boxes.copy(), pts.copy(), [0.3, 0.3])
    # top 30% of the y extent dropped -> high-y box and points gone
    assert p2[:, 1].max() < pts[:, 1].max() - 3
    assert len(b2) == 1 and b2[0, 1] == -9.5
    np.random.seed(0)
    b3, p3 = augmentor_utils.global_frustum_dropout_top(
        boxes.copy(), pts.copy(), [0.3, 0.3])
    assert p3[:, 2].max() < pts[:, 2].max() - 3
    assert len(p3) < len(pts)


def test_local_frustum_dropout_only_hits_box_points():
    from q3d_tpu.datasets.augmentor import augmentor_utils
    rng = np.random.RandomState(3)
    box, inside = _box_with_points(rng)
    outside = np.array([[30.0, 30, 0.9, 0.1]], np.float32)
    pts = np.concatenate([inside, outside])
    np.random.seed(0)
    _, p2 = augmentor_utils.local_frustum_dropout_top(
        box.copy(), pts.copy(), [1.0, 1.0])   # full-extent slab: drop all
    # all in-box points dropped, outside point kept
    assert len(p2) == 1 and p2[0, 0] == 30.0


def test_pyramid_aug_runs_and_preserves_schema():
    from q3d_tpu.datasets.augmentor import augmentor_utils
    rng = np.random.RandomState(4)
    b1, p1 = _box_with_points(rng, center=(5, 3, 0))
    b2, p2 = _box_with_points(rng, center=(-6, -2, 0), yaw=-0.3)
    boxes = np.concatenate([b1, b2])
    pts = np.concatenate([p1, p2])
    np.random.seed(1)
    gb, gp, pyr = augmentor_utils.local_pyramid_dropout(
        boxes.copy(), pts.copy(), dropout_prob=1.0)
    assert gp.shape[1] == pts.shape[1]
    assert len(gp) < len(pts), "dropout_prob=1 must remove points"
    assert pyr.shape[0] == 0, "all boxes consumed by dropout"
    # swap with prob 1: points stay inside their (unchanged) boxes
    np.random.seed(2)
    sb, sp = augmentor_utils.local_pyramid_swap(
        boxes.copy(), pts.copy(), prob=1.0, max_num_pts=1)
    assert sp.shape[1] == pts.shape[1]
    np.testing.assert_allclose(sb, boxes)


def test_data_augmentor_registers_all_reference_names():
    """Every AUG name used by reference kitti/nuscenes cfgs resolves."""
    from q3d_tpu.datasets.augmentor.data_augmentor import DataAugmentor
    for name in ["gt_sampling", "random_world_flip", "random_world_rotation",
                 "random_world_scaling", "random_world_translation",
                 "random_local_translation", "random_local_rotation",
                 "random_local_scaling", "random_world_frustum_dropout",
                 "random_local_frustum_dropout", "random_local_pyramid_aug",
                 "random_image_flip"]:
        assert callable(getattr(DataAugmentor, name, None)), name


def test_data_augmentor_queue_local_steps():
    """Queue the new steps through the config path and run a forward."""
    from q3d_tpu.config import EDict
    from q3d_tpu.datasets.augmentor.data_augmentor import DataAugmentor
    rng = np.random.RandomState(5)
    box, pts = _box_with_points(rng)
    cfgs = EDict({"AUG_CONFIG_LIST": [
        {"NAME": "random_local_translation",
         "LOCAL_TRANSLATION_RANGE": [-0.2, 0.2],
         "ALONG_AXIS_LIST": ["x", "y"]},
        {"NAME": "random_local_rotation", "LOCAL_ROT_ANGLE": 0.15},
        {"NAME": "random_local_scaling",
         "LOCAL_SCALE_RANGE": [0.95, 1.05]},
        {"NAME": "random_world_frustum_dropout",
         "INTENSITY_RANGE": [0.05, 0.1], "DIRECTION": ["top"]},
        {"NAME": "random_local_frustum_dropout",
         "INTENSITY_RANGE": [0.0, 0.1], "DIRECTION": ["bottom"]},
        {"NAME": "random_local_pyramid_aug", "DROP_PROB": 0.2,
         "SPARSIFY_PROB": 0.2, "SPARSIFY_MAX_NUM": 10,
         "SWAP_PROB": 0.2, "SWAP_MAX_NUM": 10},
    ]})
    aug = DataAugmentor(None, cfgs, ["Car"])
    out = aug.forward({"gt_boxes": box.copy(), "points": pts.copy(),
                       "gt_names": np.array(["Car"])})
    assert out["points"].shape[1] == 4
    assert out["gt_boxes"].shape[1] == 7
