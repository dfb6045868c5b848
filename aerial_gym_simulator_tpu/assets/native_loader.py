"""ctypes binding for the native C++ scene compiler (native/scene_compiler.cpp).

The shared library is built on first use with the bundled Makefile and
cached next to the sources. Everything degrades gracefully to the pure
Python parser (assets/urdf.py) when a compiler is unavailable — the two
implementations share one contract and are cross-checked in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

from ..utils.logging import CustomLogger
from . import urdf as pyurdf

logger = CustomLogger("native_loader")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libscene_compiler.so")
_MAX_PRIMS = 256

_lib = None
_lib_failed = False


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.agtpu_compile_urdf.restype = ctypes.c_int
        lib.agtpu_compile_urdf_string.restype = ctypes.c_int
        lib.agtpu_compile_urdf_batch.restype = ctypes.c_int
        lib.agtpu_version.restype = ctypes.c_char_p
        _lib = lib
        logger.debug(f"native scene compiler: "
                     f"{lib.agtpu_version().decode()}")
    except Exception as e:
        logger.warning(f"native scene compiler unavailable, using the "
                       f"Python parser: {e}")
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _ensure_lib() is not None


_KIND_NAMES = {0: "box", 1: "cylinder", 2: "sphere"}


def _to_model(path, n, kind, size, pos, rot, sem, mass, com, inertia,
              bound_radius) -> pyurdf.UrdfModel:
    prims = []
    for i in range(n):
        prims.append(pyurdf.Primitive(
            kind=_KIND_NAMES[int(kind[i])],
            size=np.array(size[i], dtype=np.float64),
            xyz=np.array(pos[i], dtype=np.float64),
            rot=np.array(rot[i], dtype=np.float64).reshape(3, 3),
            link="",
            semantic_id=int(sem[i]),
        ))
    return pyurdf.UrdfModel(
        path=path, mass=float(mass), com=np.asarray(com, np.float64),
        inertia=np.asarray(inertia, np.float64).reshape(3, 3),
        links=[], primitives=prims, bound_radius=float(bound_radius))


def _compile_one(fn, first_arg, name, semantic_id, per_link_semantic):
    M = _MAX_PRIMS
    n = ctypes.c_int(0)
    kind = np.zeros((M,), np.int32)
    size = np.zeros((M, 3), np.float32)
    pos = np.zeros((M, 3), np.float32)
    rot = np.zeros((M, 9), np.float32)
    sem = np.zeros((M,), np.int32)
    mass = ctypes.c_float(0)
    com = np.zeros((3,), np.float32)
    inertia = np.zeros((9,), np.float32)
    radius = ctypes.c_float(0)
    rc = fn(
        first_arg, semantic_id, int(per_link_semantic), M,
        ctypes.byref(n),
        kind.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        size.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sem.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.byref(mass),
        com.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inertia.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(radius))
    if rc != 0:
        return None
    return _to_model(name, n.value, kind, size, pos, rot, sem, mass.value,
                     com, inertia, radius.value)


def load_urdf_native(path: str, semantic_id: int = 0,
                     per_link_semantic: bool = False) -> Optional[pyurdf.UrdfModel]:
    """Native single-file parse; None when the library is unavailable or the
    file fails to parse (caller falls back to Python)."""
    lib = _ensure_lib()
    if lib is None:
        return None
    return _compile_one(lib.agtpu_compile_urdf, path.encode(), path,
                        semantic_id, per_link_semantic)


def load_urdf_string_native(text: str, name: str = "<string>",
                            semantic_id: int = 0,
                            per_link_semantic: bool = False
                            ) -> Optional[pyurdf.UrdfModel]:
    """Native parse of in-memory URDF XML (the procedural-asset path)."""
    lib = _ensure_lib()
    if lib is None:
        return None
    return _compile_one(lib.agtpu_compile_urdf_string, text.encode(), name,
                        semantic_id, per_link_semantic)


def load_urdf_batch(paths: List[str], semantic_id: int = 0,
                    per_link_semantic: bool = False,
                    num_threads: int = 0) -> Optional[List[pyurdf.UrdfModel]]:
    """Threaded batch parse of many URDFs (the startup data-loader path).
    Returns None if the native library is unavailable."""
    lib = _ensure_lib()
    if lib is None or not paths:
        return None
    F, M = len(paths), _MAX_PRIMS
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    n = np.zeros((F,), np.int32)
    kind = np.zeros((F, M), np.int32)
    size = np.zeros((F, M, 3), np.float32)
    pos = np.zeros((F, M, 3), np.float32)
    rot = np.zeros((F, M, 9), np.float32)
    sem = np.zeros((F, M), np.int32)
    mass = np.zeros((F,), np.float32)
    com = np.zeros((F, 3), np.float32)
    inertia = np.zeros((F, 9), np.float32)
    radius = np.zeros((F,), np.float32)
    fails = lib.agtpu_compile_urdf_batch(
        blob, F, semantic_id, int(per_link_semantic), M,
        n.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        kind.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        size.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sem.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        mass.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        com.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inertia.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        radius.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads)
    if fails:
        logger.warning(f"native batch parse: {fails}/{F} files failed")
        return None
    return [_to_model(paths[i], int(n[i]), kind[i], size[i], pos[i], rot[i],
                      sem[i], float(mass[i]), com[i], inertia[i],
                      float(radius[i])) for i in range(F)]
