"""Box encoders/decoders (pure JAX, jittable; numpy-compatible).

Capability parity with reference ``pcdet/utils/box_coder_utils.py``:
``ResidualCoder:5`` (anchor deltas normalized by the anchor BEV diagonal,
log-size residuals, optional sin/cos heading) and ``PointResidualCoder:144``.
"""

import jax.numpy as jnp
import numpy as np


class ResidualCoder:
    def __init__(self, code_size=7, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        """boxes/anchors: (..., 7 + C) -> (..., code_size) residuals."""
        xp = jnp if isinstance(boxes, jnp.ndarray) else np
        anchors = xp.concatenate([anchors[..., 0:3],
                                  xp.clip(anchors[..., 3:6], 1e-5, None),
                                  anchors[..., 6:]], axis=-1)
        boxes = xp.concatenate([boxes[..., 0:3],
                                xp.clip(boxes[..., 3:6], 1e-5, None),
                                boxes[..., 6:]], axis=-1)
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xg, yg, zg, dxg, dyg, dzg, rg = [boxes[..., i] for i in range(7)]
        diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = xp.log(dxg / dxa)
        dyt = xp.log(dyg / dya)
        dzt = xp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [xp.cos(rg) - xp.cos(ra), xp.sin(rg) - xp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [boxes[..., 7 + i] - anchors[..., 7 + i]
               for i in range(boxes.shape[-1] - 7)]
        return xp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, box_encodings, anchors):
        """box_encodings: (..., code_size); anchors: (..., 7 + C) -> (..., 7 + C)."""
        xp = jnp if isinstance(box_encodings, jnp.ndarray) else np
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xt, yt, zt, dxt, dyt, dzt = [box_encodings[..., i] for i in range(6)]
        diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = xp.exp(dxt) * dxa
        dyg = xp.exp(dyt) * dya
        dzg = xp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = xp.arctan2(box_encodings[..., 7] + xp.sin(ra),
                            box_encodings[..., 6] + xp.cos(ra))
            n_extra = box_encodings.shape[-1] - 8
            extra0 = 8
        else:
            rg = box_encodings[..., 6] + ra
            n_extra = box_encodings.shape[-1] - 7
            extra0 = 7
        cgs = [box_encodings[..., extra0 + i] + anchors[..., 7 + i]
               for i in range(n_extra)]
        return xp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)


class PointResidualCoder:
    """Point-based coder: residuals w.r.t. a point + class mean size
    (reference ``box_coder_utils.py:144``; used by PointRCNN-style heads)."""

    def __init__(self, code_size=8, use_mean_size=True, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = np.asarray(kwargs["mean_size"], dtype=np.float32)
            assert self.mean_size.min() > 0

    def encode(self, gt_boxes, points, gt_classes=None):
        xp = jnp if isinstance(gt_boxes, jnp.ndarray) else np
        gt_sizes = xp.clip(gt_boxes[..., 3:6], 1e-5, None)
        xg, yg, zg = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
        dxg, dyg, dzg = gt_sizes[..., 0], gt_sizes[..., 1], gt_sizes[..., 2]
        rg = gt_boxes[..., 6]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            mean = xp.asarray(self.mean_size)[gt_classes - 1]
            dxa, dya, dza = mean[..., 0], mean[..., 1], mean[..., 2]
            diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
            xt, yt = (xg - xa) / diagonal, (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt, dyt, dzt = xp.log(dxg / dxa), xp.log(dyg / dya), xp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = xp.log(dxg), xp.log(dyg), xp.log(dzg)
        extras = [gt_boxes[..., 7 + i] for i in range(gt_boxes.shape[-1] - 7)]
        return xp.stack([xt, yt, zt, dxt, dyt, dzt,
                         xp.cos(rg), xp.sin(rg), *extras], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xp = jnp if isinstance(box_encodings, jnp.ndarray) else np
        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        dxt, dyt, dzt = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]
        cost, sint = box_encodings[..., 6], box_encodings[..., 7]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            mean = xp.asarray(self.mean_size)[pred_classes - 1]
            dxa, dya, dza = mean[..., 0], mean[..., 1], mean[..., 2]
            diagonal = xp.sqrt(dxa ** 2 + dya ** 2)
            xg, yg = xt * diagonal + xa, yt * diagonal + ya
            zg = zt * dza + za
            dxg, dyg, dzg = xp.exp(dxt) * dxa, xp.exp(dyt) * dya, xp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = xp.exp(dxt), xp.exp(dyt), xp.exp(dzt)
        rg = xp.arctan2(sint, cost)
        extras = [box_encodings[..., 8 + i] for i in range(box_encodings.shape[-1] - 8)]
        return xp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)
