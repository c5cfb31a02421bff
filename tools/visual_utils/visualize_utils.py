"""Scene visualization (parity with reference ``tools/visual_utils/``:
open3d/mayavi drawing; here a matplotlib BEV renderer that works headless,
with open3d 3D view gated on availability)."""

import numpy as np


def draw_scenes_bev(points, gt_boxes=None, ref_boxes=None, ref_scores=None,
                    save_path=None, xlim=(-60, 60), ylim=(-60, 60)):
    """Bird's-eye-view plot: points + GT (green) + predictions (red)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c=points[:, 2],
               cmap="viridis", alpha=0.6)

    def draw_boxes(boxes, color, scores=None):
        if boxes is None or len(boxes) == 0:
            return
        from q3d_tpu.utils.box_utils import boxes_to_corners_bev
        corners = np.asarray(boxes_to_corners_bev(np.asarray(boxes, np.float32)))
        for i, c in enumerate(corners):
            poly = np.vstack([c, c[:1]])
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=1.2)
            # heading tick from center to front-edge midpoint
            center = boxes[i, :2]
            front = (c[0] + c[3]) / 2
            ax.plot([center[0], front[0]], [center[1], front[1]],
                    color=color, linewidth=0.8)
            if scores is not None:
                ax.text(c[0, 0], c[0, 1], f"{scores[i]:.2f}", color=color,
                        fontsize=6)

    draw_boxes(gt_boxes, "limegreen")
    draw_boxes(ref_boxes, "red", ref_scores)
    ax.set_xlim(xlim)
    ax.set_ylim(ylim)
    ax.set_aspect("equal")
    ax.set_title("BEV (green = GT, red = predictions)")
    if save_path:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig


def draw_scenes_open3d(points, gt_boxes=None, ref_boxes=None):
    """Interactive 3D view; requires the optional open3d package."""
    try:
        import open3d as o3d
    except ImportError as e:
        raise ImportError("open3d not installed; use draw_scenes_bev") from e
    from q3d_tpu.utils.box_utils import boxes_to_corners_3d

    geoms = []
    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(points[:, :3])
    geoms.append(pc)
    lines = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for boxes, color in [(gt_boxes, (0, 1, 0)), (ref_boxes, (1, 0, 0))]:
        if boxes is None:
            continue
        corners = np.asarray(boxes_to_corners_3d(np.asarray(boxes, np.float32)))
        for c in corners:
            ls = o3d.geometry.LineSet(
                o3d.utility.Vector3dVector(c),
                o3d.utility.Vector2iVector(lines))
            ls.paint_uniform_color(color)
            geoms.append(ls)
    o3d.visualization.draw_geometries(geoms)
