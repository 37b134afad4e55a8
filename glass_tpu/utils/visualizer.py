"""Qualitative visualization of spotting predictions.

Equivalent of reference ``glass/utils/visualizer.py`` (plotly is not in this
image, so rendering uses matplotlib): polygon outlines + transcriptions
rotated along each word box, with scores.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..postprocess.np_geometry import boxes_to_polygons_np


def visualize(
    image_rgb: np.ndarray,
    preds,
    texts: Sequence[str] = (),
    scores: Sequence[float] = (),
    save_path: Optional[str] = None,
    show_order: bool = False,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(14, 14 * image_rgb.shape[0] / image_rgb.shape[1]))
    ax.imshow(image_rgb.astype(np.uint8))
    ax.axis("off")

    if len(preds):
        if preds.has("pred_polygons"):
            polys = np.asarray(preds.pred_polygons)
        else:
            polys = boxes_to_polygons_np(np.asarray(preds.pred_boxes))
        det_scores = np.asarray(preds.scores)
        for i, poly in enumerate(polys):
            closed = np.vstack([poly, poly[:1]])
            ax.plot(closed[:, 0], closed[:, 1], "-", color="lime", linewidth=1.5)
            label = texts[i] if i < len(texts) else ""
            if show_order:
                label = f"{i}:{label}"
            if label:
                top = poly[np.argmin(poly[:, 1])]
                edge = poly[1] - poly[0]
                angle = -np.degrees(np.arctan2(edge[1], edge[0]))
                ax.text(
                    top[0], top[1] - 2, label,
                    color="yellow", fontsize=8, rotation=angle,
                    rotation_mode="anchor",
                    bbox=dict(facecolor="black", alpha=0.4, pad=0.5, edgecolor="none"),
                )
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return None
    return fig
