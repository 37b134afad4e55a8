"""Compile-and-load for the native polygon library."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "polyclip.cpp")
_SO = os.path.join(_HERE, "_polyclip.so")
_lock = threading.Lock()
_lib = None


class PolyClip:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        d = ctypes.POINTER(ctypes.c_double)
        i = ctypes.POINTER(ctypes.c_int32)
        lib.polyclip_intersection_area.restype = ctypes.c_double
        lib.polyclip_intersection_area.argtypes = [d, ctypes.c_int, d, ctypes.c_int]
        lib.polyclip_area.restype = ctypes.c_double
        lib.polyclip_area.argtypes = [d, ctypes.c_int]
        lib.polyclip_pairwise_iou.restype = None
        lib.polyclip_pairwise_iou.argtypes = [d, i, ctypes.c_int32, d, i, ctypes.c_int32, d]
        lib.polyclip_pairwise_ioa_first.restype = None
        lib.polyclip_pairwise_ioa_first.argtypes = [d, i, ctypes.c_int32, d, i, ctypes.c_int32, d]

    @staticmethod
    def _flatten(polys):
        offsets = np.zeros(len(polys) + 1, np.int32)
        for k, p in enumerate(polys):
            offsets[k + 1] = offsets[k] + len(p)
        coords = (
            np.concatenate([np.asarray(p, np.float64).reshape(-1, 2) for p in polys])
            if polys
            else np.zeros((0, 2))
        )
        return np.ascontiguousarray(coords, np.float64), offsets

    def intersection_area(self, p: np.ndarray, q: np.ndarray) -> float:
        p = np.ascontiguousarray(np.asarray(p, np.float64).reshape(-1, 2))
        q = np.ascontiguousarray(np.asarray(q, np.float64).reshape(-1, 2))
        return self._lib.polyclip_intersection_area(
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(p),
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(q),
        )

    def area(self, p: np.ndarray) -> float:
        p = np.ascontiguousarray(np.asarray(p, np.float64).reshape(-1, 2))
        return self._lib.polyclip_area(
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(p)
        )

    def pairwise_iou(self, polys_p, polys_q) -> np.ndarray:
        cp, op = self._flatten(polys_p)
        cq, oq = self._flatten(polys_q)
        out = np.zeros((len(polys_p), len(polys_q)), np.float64)
        if out.size:
            self._lib.polyclip_pairwise_iou(
                cp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                op.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(polys_p),
                cq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                oq.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(polys_q),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
        return out

    def pairwise_ioa_first(self, polys_p, polys_q) -> np.ndarray:
        """intersection / area(p_i) — detection coverage by don't-cares."""
        cp, op = self._flatten(polys_p)
        cq, oq = self._flatten(polys_q)
        out = np.zeros((len(polys_p), len(polys_q)), np.float64)
        if out.size:
            self._lib.polyclip_pairwise_ioa_first(
                cp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                op.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(polys_p),
                cq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                oq.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(polys_q),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
        return out


def load_polyclip():
    """Build (if needed) and load the native library; None on failure."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
                logger.info("built native polyclip: %s", _SO)
            _lib = PolyClip(ctypes.CDLL(_SO))
        except Exception as e:  # pragma: no cover - toolchain-dependent
            logger.warning("native polyclip unavailable (%s); using python path", e)
            _lib = None
        return _lib
