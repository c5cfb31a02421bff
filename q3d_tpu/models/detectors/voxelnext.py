"""VoxelNeXt detector (reference ``detectors/voxelnext.py``): MeanVFE ->
VoxelResBackBone8xVoxelNeXt -> VoxelNeXtHead — fully sparse, no dense BEV.

Double-flip TTA (reference ``datasets/processor/data_processor.py:117`` +
``dense_heads/voxelnext_head.py:333``): the reference's dataloader emits 4
voxelizations (orig / y / x / xy flip) per frame.  Here the detector expands
the batch on-device instead — voxel point features and grid coords are
mirrored analytically (identical result to re-voxelizing mirrored points on
a symmetric grid), so the TTA costs zero host work and stays inside one jit.
The head un-flips + averages coincident voxels before decoding."""

import jax.numpy as jnp

from .detector3d_template import Detector3DTemplate


class VoxelNeXt(Detector3DTemplate):

    def setup(self):
        modules, _ = self.build_networks()
        self.vfe = modules["vfe"]
        self.backbone_3d = modules["backbone_3d"]
        self.dense_head = modules["dense_head"]

    def _expand_double_flip(self, batch_dict):
        """(B, ...) -> (4B, ...) with sub-batch order [orig, y, x, xy] per
        sample (reference merge indexing: bs_idx * 4 + i)."""
        nx, ny, _ = (int(g) for g in self.dataset.grid_size)
        vox = batch_dict["voxels"]                   # (B, V, P, C) x,y,z,...
        coords = batch_dict["voxel_coords"]          # (B, V, 3) [z, y, x]
        npts = batch_dict["voxel_num_points"]
        pad = coords[..., 0] < 0                     # (B, V)

        def variant(fx, fy):
            v = vox
            c = coords
            if fx:
                v = v.at[..., 0].multiply(-1)
                c = c.at[..., 2].set(jnp.where(pad, -1, nx - 1 - c[..., 2]))
            if fy:
                v = v.at[..., 1].multiply(-1)
                c = c.at[..., 1].set(jnp.where(pad, -1, ny - 1 - c[..., 1]))
            return v, c

        vs, cs = zip(*[variant(fx, fy) for fx, fy in
                       ((False, False), (False, True),
                        (True, False), (True, True))])
        B, V = coords.shape[:2]
        batch_dict["voxels"] = jnp.stack(vs, 1).reshape(4 * B, V,
                                                        *vox.shape[2:])
        batch_dict["voxel_coords"] = jnp.stack(cs, 1).reshape(4 * B, V, 3)
        batch_dict["voxel_num_points"] = jnp.repeat(npts, 4, axis=0)
        batch_dict["batch_size"] = 4 * B
        return batch_dict

    def __call__(self, batch_dict, train: bool = False):
        if not train and self.model_cfg.DENSE_HEAD.get("DOUBLE_FLIP", False):
            batch_dict = self._expand_double_flip(dict(batch_dict))
        batch_dict = self.vfe(batch_dict, train)
        batch_dict = self.backbone_3d(batch_dict, train)
        batch_dict = self.dense_head(batch_dict, train)
        return batch_dict
