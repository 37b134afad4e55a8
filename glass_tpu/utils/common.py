"""Shared small utilities (reference glass/utils/common_utils.py)."""

from __future__ import annotations

import numpy as np


def rgb2grey(image: np.ndarray, three_channels: bool = False) -> np.ndarray:
    """Rec.709 luma grayscale, optionally replicated to 3 channels."""
    grey = (
        0.2126 * image[..., 0] + 0.7152 * image[..., 1] + 0.0722 * image[..., 2]
    ).astype(image.dtype)
    if three_channels:
        return np.stack([grey, grey, grey], axis=-1)
    return grey[..., None]


def flatten_dict(d: dict, parent_key: str = "", sep: str = ".") -> dict:
    items = {}
    for k, v in d.items():
        key = f"{parent_key}{sep}{k}" if parent_key else k
        if isinstance(v, dict):
            items.update(flatten_dict(v, key, sep))
        else:
            items[key] = v
    return items


def unflatten_dict(d: dict, sep: str = ".") -> dict:
    out: dict = {}
    for k, v in d.items():
        parts = k.split(sep)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out
