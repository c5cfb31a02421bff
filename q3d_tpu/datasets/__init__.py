"""Dataset registry + loader construction.

Parity with reference ``pcdet/datasets/__init__.py:54`` (``build_dataloader``)
minus torch DataLoader: batching is a plain python iterator with our
static-shape ``collate_batch`` (point-cloud decode + voxelize are cheap host
work; heavy lifting happens on-device).  Multi-host sharding of the sample
stream lives in ``q3d_tpu.parallel.input_pipeline``.
"""

import numpy as np

from .dataset import DatasetTemplate


def _registry():
    reg = {"DatasetTemplate": DatasetTemplate}
    try:
        from .kitti.kitti_dataset import KittiDataset
        reg["KittiDataset"] = KittiDataset
    except ImportError:
        pass
    try:
        from .nuscenes.nuscenes_dataset import NuScenesDataset
        reg["NuScenesDataset"] = NuScenesDataset
    except ImportError:
        pass
    try:
        from .synthetic_dataset import SyntheticDataset
        reg["SyntheticDataset"] = SyntheticDataset
    except ImportError:
        pass
    for name, mod, cls in [
            ("WaymoDataset", ".waymo.waymo_dataset", "WaymoDataset"),
            ("ONCEDataset", ".once.once_dataset", "ONCEDataset"),
            ("CustomDataset", ".custom.custom_dataset", "CustomDataset"),
            ("LyftDataset", ".lyft.lyft_dataset", "LyftDataset"),
            ("Argo2Dataset", ".argo2.argo2_dataset", "Argo2Dataset"),
            ("PandasetDataset", ".pandaset.pandaset_dataset", "PandasetDataset")]:
        try:
            import importlib
            m = importlib.import_module(mod, package=__name__)
            reg[name] = getattr(m, cls)
        except ImportError:
            pass
    return reg


class SimpleLoader:
    """Minimal epoch iterator with batching + collate (replaces
    torch.utils.data.DataLoader for our host-side pipeline)."""

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False,
                 seed=0, rank=0, world_size=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.rank = rank
        self.world_size = world_size

    def set_epoch(self, e):
        self.epoch = e

    def __len__(self):
        n = len(self.dataset) // self.world_size
        return n // self.batch_size if self.drop_last \
            else (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # contiguous per-rank shard (order-preserving for eval merge)
        idx = idx[self.rank::self.world_size]
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            samples = [self.dataset[j] for j in chunk]
            yield self.dataset.collate_batch(samples)


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     root_path=None, workers=0, logger=None, training=True,
                     seed=None, rank=0, world_size=1, **kwargs):
    dataset_cls = _registry()[dataset_cfg.DATASET]
    dataset = dataset_cls(dataset_cfg=dataset_cfg, class_names=class_names,
                          root_path=root_path, training=training, logger=logger)
    loader = SimpleLoader(dataset, batch_size, shuffle=training,
                          drop_last=training, seed=seed or 0,
                          rank=rank, world_size=world_size)
    return dataset, loader, None
