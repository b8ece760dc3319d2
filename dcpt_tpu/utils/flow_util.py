"""Optical-flow .flo I/O + quantization (reference: basicsr/utils/flow_util.py).

Video-SR legacy in the reference, carried for API completeness: Middlebury
``PIEH`` .flo read/write, plus uint8 quantize/dequantize for jpeg-compact flow
storage.
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def flowread(flow_path, quantize: bool = False, concat_axis: int = 0, *args, **kwargs) -> np.ndarray:
    """Read a (h, w, 2) flow map from .flo or a quantized image (flow_util.py:8-47)."""
    if quantize:
        assert concat_axis in [0, 1]
        cat_flow = cv2.imread(flow_path, cv2.IMREAD_UNCHANGED)
        if cat_flow.ndim != 2:
            raise IOError(f"{flow_path} is not a valid quantized flow file, its dimension is {cat_flow.ndim}.")
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        flow = dequantize_flow(dx, dy, *args, **kwargs)
    else:
        with open(flow_path, "rb") as f:
            try:
                header = f.read(4).decode("utf-8")
            except Exception as e:
                raise IOError(f"Invalid flow file: {flow_path}") from e
            if header != "PIEH":
                raise IOError(f"Invalid flow file: {flow_path}, header does not contain PIEH")
            w = np.fromfile(f, np.int32, 1).squeeze()
            h = np.fromfile(f, np.int32, 1).squeeze()
            flow = np.fromfile(f, np.float32, int(w) * int(h) * 2).reshape((int(h), int(w), 2))
    return flow.astype(np.float32)


def flowwrite(flow: np.ndarray, filename: str, quantize: bool = False, concat_axis: int = 0, *args, **kwargs) -> None:
    """Write flow losslessly (.flo) or quantized to an image (flow_util.py:50-78)."""
    if not quantize:
        with open(filename, "wb") as f:
            f.write("PIEH".encode("utf-8"))
            np.array([flow.shape[1], flow.shape[0]], dtype=np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
            f.flush()
    else:
        assert concat_axis in [0, 1]
        dx, dy = quantize_flow(flow, *args, **kwargs)
        dxdy = np.concatenate((dx, dy), axis=concat_axis)
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        cv2.imwrite(filename, dxdy)


def quantize_flow(flow: np.ndarray, max_val: float = 0.02, norm: bool = True):
    """Flow → two uint8 planes (flow_util.py:81-105)."""
    h, w, _ = flow.shape
    dx = flow[..., 0]
    dy = flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    return tuple(quantize(d, -max_val, max_val, 255, np.uint8) for d in [dx, dy])


def dequantize_flow(dx: np.ndarray, dy: np.ndarray, max_val: float = 0.02, denorm: bool = True) -> np.ndarray:
    """Inverse of :func:`quantize_flow` (flow_util.py:107-129)."""
    assert dx.shape == dy.shape
    assert dx.ndim == 2 or (dx.ndim == 3 and dx.shape[-1] == 1)
    dx, dy = (dequantize(d, -max_val, max_val, 255) for d in [dx, dy])
    if denorm:
        dx *= dx.shape[1]
        dy *= dx.shape[0]
    return np.dstack((dx, dy))


def quantize(arr, min_val, max_val, levels: int, dtype=np.int64):
    """Clip + quantize to [0, levels-1] (flow_util.py:131-156)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer, but got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be smaller than max_val ({max_val})")
    arr = np.clip(arr, min_val, max_val) - min_val
    return np.minimum(np.floor(levels * arr / (max_val - min_val)).astype(dtype), levels - 1)


def dequantize(arr, min_val, max_val, levels: int, dtype=np.float64):
    """Bin-centred dequantization (flow_util.py:159-186)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer, but got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be smaller than max_val ({max_val})")
    return (arr + 0.5).astype(dtype) * (max_val - min_val) / levels + min_val
