"""Single-frame inference demo (reference ``tools/demo.py``): run a detector
over raw ``.bin``/``.npy`` point-cloud files (or generated synthetic frames)
and print/save detections.

Usage:
    python tools/demo.py --cfg_file cfgs/synthetic_models/centerpoint_tiny.yaml \
        [--data_path dir_or_file] [--ckpt ckpt.pkl]
"""

import argparse
import glob
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class DemoDataset:
    """Raw-file dataset (reference demo.py:22-59) on our DatasetTemplate."""

    def __init__(self, dataset_cfg, class_names, data_path=None, ext=".bin"):
        from q3d_tpu.datasets.dataset import DatasetTemplate

        class _D(DatasetTemplate):
            def __len__(self2):
                return len(self2.sample_file_list)

            def __getitem__(self2, index):
                f = self2.sample_file_list[index]
                if f is None:
                    from q3d_tpu.datasets.synthetic_dataset import make_scene
                    rng = np.random.RandomState(42 + index)
                    points, _, _ = make_scene(rng, self2.point_cloud_range)
                elif str(f).endswith(".bin"):
                    points = np.fromfile(f, np.float32).reshape(-1, 4)
                else:
                    points = np.load(f)
                return self2.prepare_data({"points": points, "frame_id": index})

        self.dataset = _D(dataset_cfg=dataset_cfg, class_names=class_names,
                          training=False, root_path=".")
        if data_path is None:
            self.dataset.sample_file_list = [None] * 4   # synthetic frames
        else:
            p = Path(data_path)
            files = sorted(glob.glob(str(p / f"*{ext}"))) if p.is_dir() else [p]
            self.dataset.sample_file_list = files


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", required=True)
    parser.add_argument("--data_path", default=None)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--ext", default=".bin")
    args = parser.parse_args()

    import jax
    from q3d_tpu.config import cfg, cfg_from_yaml_file
    from q3d_tpu.models import build_network, load_data_to_device
    from q3d_tpu.utils import common_utils
    from q3d_tpu.utils.checkpoint import (load_checkpoint, load_pth_file,
                                          import_torch_state_dict)

    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = common_utils.create_logger()
    demo = DemoDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.data_path,
                       args.ext)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=demo.dataset)

    batch = load_data_to_device(
        demo.dataset.collate_batch([demo.dataset[0]]))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    if args.ckpt:
        if args.ckpt.endswith(".pth"):
            variables = import_torch_state_dict(load_pth_file(args.ckpt),
                                                variables, logger=logger)
        else:
            variables, _, _, _ = load_checkpoint(args.ckpt, variables)

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    for idx in range(len(demo.dataset)):
        batch = load_data_to_device(
            demo.dataset.collate_batch([demo.dataset[idx]]))
        out = fwd(variables, batch)
        valid = np.asarray(out["final_valid"][0])
        boxes = np.asarray(out["final_boxes"][0])[valid]
        scores = np.asarray(out["final_scores"][0])[valid]
        labels = np.asarray(out["final_labels"][0])[valid]
        logger.info(f"frame {idx}: {len(boxes)} detections")
        for b, s, l in zip(boxes[:10], scores[:10], labels[:10]):
            name = cfg.CLASS_NAMES[int(l) - 1]
            logger.info(f"  {name:12s} score={s:.3f} "
                        f"xyz=({b[0]:.1f},{b[1]:.1f},{b[2]:.1f}) "
                        f"lwh=({b[3]:.1f},{b[4]:.1f},{b[5]:.1f}) r={b[6]:.2f}")
    logger.info("demo done")


if __name__ == "__main__":
    main()
