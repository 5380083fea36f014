"""Native (C++) Criteo npy loader: mmap + background batch assembly.

Role parity with the reference's input pipeline (torchrec
datasets/criteo.py InMemoryBinaryCriteoIterDataPipe:715 running under a
multi-worker torch DataLoader). TPU-host redesign: the C++ sidecar
(`cpp/data/criteo_loader.cc`) mmaps the day files (the OS page cache does
the memory tiering — no up-front materialization), assembles
feature-major batches on a background thread off the GIL into a bounded
prefetch ring, and this wrapper only wraps ready buffers into the same
``Batch`` pytree the python pipe yields. Batch-for-batch equivalent to
``InMemoryBinaryCriteoIterDataPipe`` in unshuffled mode (tested).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.datasets.criteo import CAT_FEATURE_COUNT, DEFAULT_CAT_NAMES, INT_FEATURE_COUNT
from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.training import Batch

__all__ = ["NativeCriteoIterDataPipe"]

_LIB = None


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    d = os.path.join(root, "cpp", "data")
    src = os.path.join(d, "criteo_loader.cc")
    so = os.path.join(d, "libcriteo.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", so, src],
            check=True,
        )
    lib = ctypes.CDLL(so)
    i64 = ctypes.c_int64
    pchar = ctypes.POINTER(ctypes.c_char_p)
    lib.cl_create.restype = ctypes.c_void_p
    lib.cl_create.argtypes = [
        pchar, pchar, pchar, i64, i64, i64, i64, ctypes.c_int,
        ctypes.POINTER(i64), i64, i64,
    ]
    lib.cl_destroy.argtypes = [ctypes.c_void_p]
    lib.cl_num_batches.restype = i64
    lib.cl_num_batches.argtypes = [ctypes.c_void_p]
    lib.cl_next.restype = i64
    lib.cl_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.cl_reset.argtypes = [ctypes.c_void_p, i64]
    _LIB = lib
    return lib


def _char_pp(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))(*[os.fsencode(p) for p in paths])
    return arr


class NativeCriteoIterDataPipe:
    """Drop-in for :class:`InMemoryBinaryCriteoIterDataPipe` backed by the
    C++ loader. Same constructor contract (day-file npys, per-rank row
    ranges, optional per-feature hash mod, dense log transform, row-level
    shuffle); ``prefetch_depth`` bounds the ready-batch ring."""

    def __init__(
        self,
        dense_paths: Sequence[str],
        sparse_paths: Sequence[str],
        labels_paths: Sequence[str],
        batch_size: int,
        rank: int = 0,
        world_size: int = 1,
        shuffle_batches: bool = False,
        hashes: Optional[Sequence[int]] = None,
        transform_dense: bool = True,
        seed: int = 0,
        prefetch_depth: int = 4,
    ):
        if not (len(dense_paths) == len(sparse_paths) == len(labels_paths)):
            raise ValueError("path lists must be the same length")
        self.batch_size = batch_size
        lib = _lib()
        h = None
        if hashes is not None:
            if len(hashes) != CAT_FEATURE_COUNT:
                raise ValueError(f"hashes must have {CAT_FEATURE_COUNT} entries")
            h = (ctypes.c_int64 * CAT_FEATURE_COUNT)(*[int(x) for x in hashes])
        self._keepalive = (
            _char_pp(dense_paths), _char_pp(sparse_paths),
            _char_pp(labels_paths), h,
        )
        self._h = lib.cl_create(
            self._keepalive[0], self._keepalive[1], self._keepalive[2],
            len(dense_paths), batch_size, rank, world_size,
            1 if transform_dense else 0, h,
            seed if shuffle_batches else -1, prefetch_depth,
        )
        if not self._h:
            raise ValueError(
                "cl_create failed: unreadable npy, wrong column counts, or "
                "unsupported dtype/layout"
            )
        self._epoch = 0

    def __len__(self) -> int:
        return _lib().cl_num_batches(self._h)

    def __iter__(self) -> Iterator[Batch]:
        lib = _lib()
        if self._epoch > 0:
            lib.cl_reset(self._h, self._epoch)
        self._epoch += 1
        b = self.batch_size
        while True:
            dense = np.empty((b, INT_FEATURE_COUNT), np.float32)
            sparse = np.empty((CAT_FEATURE_COUNT * b,), np.int32)
            labels = np.empty((b,), np.float32)
            n = lib.cl_next(
                self._h,
                dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                sparse.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if n == 0:
                return
            lengths = np.ones((CAT_FEATURE_COUNT, b), np.int32)
            kjt = KeyedJaggedTensor(
                keys=DEFAULT_CAT_NAMES,
                values=jnp.asarray(sparse),
                lengths=jnp.asarray(lengths),
            )
            yield Batch(
                dense_features=jnp.asarray(dense),
                sparse_features=kjt,
                labels=jnp.asarray(labels),
            )

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            try:
                _lib().cl_destroy(h)
            except Exception:
                pass
            self._h = None
