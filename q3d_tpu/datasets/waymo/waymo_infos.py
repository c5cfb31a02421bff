"""Waymo TFRecord -> processed-sequence extraction + GT database.

Parity with reference ``pcdet/datasets/waymo/waymo_utils.py`` (268 LoC,
``process_single_sequence``/``generate_labels``/``save_lidar_points``) and
the driver side of ``waymo_dataset.py`` (create_waymo_infos /
create_groundtruth_database).  Gated on the ``waymo_open_dataset`` package +
TensorFlow exactly like the reference.

Output layout consumed by ``WaymoDataset``:
  <save_path>/<sequence_name>/<sequence_name>.pkl   per-frame infos
  <save_path>/<sequence_name>/NNNN.npy              (N, 6) xyz+i+elong+NLZ

Redesign note: the point extraction uses the OD API's
``convert_range_image_to_point_cloud(keep_polar_features=True)`` instead of
re-deriving the pixel-pose transform chain by hand; the NLZ column comes
from the raw range-image channel 3 like the reference.
"""

import pickle
from pathlib import Path

import numpy as np

WAYMO_CLASSES = ["unknown", "Vehicle", "Pedestrian", "Sign", "Cyclist"]


def generate_labels(frame, pose):
    """Per-frame annotations in the unified lidar frame (reference
    waymo_utils.py:23): boxes (N, 9) with ego-frame speed columns."""
    names, difficulty, dims, locs, headings = [], [], [], [], []
    track_difficulty, speeds, obj_ids, num_pts = [], [], [], []
    for lab in frame.laser_labels:
        box = lab.box
        names.append(WAYMO_CLASSES[lab.type])
        difficulty.append(lab.detection_difficulty_level)
        track_difficulty.append(lab.tracking_difficulty_level)
        dims.append([box.length, box.width, box.height])
        locs.append([box.center_x, box.center_y, box.center_z])
        headings.append(box.heading)
        obj_ids.append(lab.id)
        num_pts.append(lab.num_lidar_points_in_box)
        speeds.append([lab.metadata.speed_x, lab.metadata.speed_y])
    annos = {
        "name": np.array(names),
        "difficulty": np.array(difficulty),
        "dimensions": np.array(dims).reshape(-1, 3),
        "location": np.array(locs).reshape(-1, 3),
        "heading_angles": np.array(headings),
        "obj_ids": np.array(obj_ids),
        "tracking_difficulty": np.array(track_difficulty),
        "num_points_in_gt": np.array(num_pts),
        "speed_global": np.array(speeds).reshape(-1, 2),
    }
    keep = annos["name"] != "unknown"
    annos = {k: v[keep] for k, v in annos.items()}
    if len(annos["name"]):
        speed3 = np.pad(annos["speed_global"], ((0, 0), (0, 1)))
        speed = (speed3 @ np.linalg.inv(pose[:3, :3].T))[:, :2]
        annos["gt_boxes_lidar"] = np.concatenate([
            annos["location"], annos["dimensions"],
            annos["heading_angles"][:, None], speed], axis=1)
    else:
        annos["gt_boxes_lidar"] = np.zeros((0, 9))
    return annos


def save_lidar_points(frame, save_path, use_two_returns=True):
    """Extract (N, 6) [x y z intensity elongation NLZ] from the range
    images (reference waymo_utils.py:73-194)."""
    from waymo_open_dataset.utils import frame_utils

    parsed = frame_utils.parse_range_image_and_camera_projection(frame)
    range_images, camera_projections = parsed[0], parsed[1]
    range_image_top_pose = parsed[-1]

    ri_indices = (0, 1) if use_two_returns else (0,)
    all_pts, counts = [], []
    for ri_index in ri_indices:
        points, _ = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose,
            ri_index=ri_index, keep_polar_features=True)
        # keep_polar_features rows: (range, intensity, elongation, x, y, z)
        for c_id, p in zip(sorted([c.name for c in frame.context
                                   .laser_calibrations]), points):
            ri = range_images[c_id][ri_index]
            vals = np.array(ri.data).reshape(ri.shape.dims)
            mask = vals[..., 0] > 0
            nlz = vals[..., 3][mask].reshape(-1, 1)
            xyz = p[:, 3:6]
            inten = p[:, 1:2]
            elong = p[:, 2:3]
            all_pts.append(np.concatenate(
                [xyz, inten, elong, nlz], axis=1).astype(np.float32))
            if ri_index == 0:
                counts.append(xyz.shape[0])
    out = np.concatenate(all_pts, axis=0)
    np.save(str(save_path), out)
    return counts


def process_single_sequence(sequence_file, save_path, sampled_interval,
                            has_label=True, use_two_returns=True):
    """One TFRecord -> per-frame npy + sequence info pkl (reference
    waymo_utils.py:197)."""
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2

    sequence_file = Path(sequence_file)
    sequence_name = sequence_file.stem
    if not sequence_file.exists():
        return []
    cur_save_dir = Path(save_path) / sequence_name
    cur_save_dir.mkdir(parents=True, exist_ok=True)
    pkl_file = cur_save_dir / f"{sequence_name}.pkl"
    if pkl_file.exists():
        with open(pkl_file, "rb") as f:
            return pickle.load(f)

    dataset = tf.data.TFRecordDataset(str(sequence_file),
                                      compression_type="")
    infos = []
    for cnt, data in enumerate(dataset):
        if cnt % sampled_interval != 0:
            continue
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        pose = np.array(frame.pose.transform, np.float32).reshape(4, 4)
        info = {
            "point_cloud": {"num_features": 5,
                            "lidar_sequence": sequence_name,
                            "sample_idx": cnt},
            "frame_id": f"{sequence_name}_{cnt:03d}",
            "metadata": {"context_name": frame.context.name,
                         "timestamp_micros": frame.timestamp_micros},
            "pose": pose,
        }
        if has_label:
            info["annos"] = generate_labels(frame, pose)
        info["num_points_of_each_lidar"] = save_lidar_points(
            frame, cur_save_dir / f"{cnt:04d}.npy",
            use_two_returns=use_two_returns)
        infos.append(info)
    with open(pkl_file, "wb") as f:
        pickle.dump(infos, f)
    return infos


def create_waymo_infos(raw_data_path, save_path, splits=("train", "val"),
                       sampled_interval=1, logger=None):
    """All sequences of each split -> waymo_infos_<split>.pkl (reference
    waymo_dataset.py create_waymo_infos).  Expects
    <raw_data_path>/ImageSets/<split>.txt listing tfrecord names and
    <raw_data_path>/raw_data/*.tfrecord."""
    raw_data_path = Path(raw_data_path)
    save_path = Path(save_path)
    outs = []
    for split in splits:
        split_file = raw_data_path / "ImageSets" / f"{split}.txt"
        seqs = [x.strip() for x in open(split_file)] \
            if split_file.exists() else []
        all_infos = []
        for seq in seqs:
            all_infos.extend(process_single_sequence(
                raw_data_path / "raw_data" / seq, save_path,
                sampled_interval, has_label=(split != "test")))
        out = save_path / f"waymo_infos_{split}.pkl"
        with open(out, "wb") as f:
            pickle.dump(all_infos, f)
        if logger:
            logger.info(f"waymo {split}: {len(all_infos)} frames -> {out}")
        outs.append(out)
    return outs


def create_groundtruth_database(dataset, used_classes=None):
    """Crop per-object points into the gt database (reference
    waymo_dataset.py create_groundtruth_database)."""
    from ...ops.roiaware_pool3d import points_in_boxes_cpu

    root = Path(dataset.root_path)
    db_dir = root / "gt_database"
    db_info_path = root / "waymo_dbinfos_train.pkl"
    db_dir.mkdir(parents=True, exist_ok=True)
    all_db_infos = {}
    for idx in range(len(dataset.infos)):
        info = dataset.infos[idx]
        pc = info["point_cloud"]
        points = dataset.get_lidar(pc["lidar_sequence"], pc["sample_idx"])
        annos = info.get("annos", {})
        names = np.asarray(annos.get("name", []))
        boxes = np.asarray(annos.get("gt_boxes_lidar", np.zeros((0, 9))))
        if len(boxes) == 0:
            continue
        flags = np.asarray(points_in_boxes_cpu(
            points[:, :3].astype(np.float32),
            boxes[:, :7].astype(np.float32)))
        for i in range(len(boxes)):
            if used_classes is not None and names[i] not in used_classes:
                continue
            fn = f"{pc['lidar_sequence']}_{pc['sample_idx']}_{names[i]}_{i}.bin"
            gt_points = points[flags[i].astype(bool)]
            gt_points[:, :3] -= boxes[i, :3]
            gt_points.astype(np.float32).tofile(str(db_dir / fn))
            all_db_infos.setdefault(names[i], []).append({
                "name": names[i], "path": str((db_dir / fn).relative_to(root)),
                "sequence_name": pc["lidar_sequence"],
                "sample_idx": pc["sample_idx"], "gt_idx": i,
                "box3d_lidar": boxes[i],
                "num_points_in_gt": gt_points.shape[0],
                "difficulty": annos.get("difficulty", np.zeros(len(boxes)))[i],
            })
    with open(db_info_path, "wb") as f:
        pickle.dump(all_db_infos, f)
    return db_info_path
