"""Dynamic embedding: unbounded global ids -> bounded device table slots,
backed by a C++ id-transformer + host parameter server.

Capability parity with the reference's C++ sidecar
(torchrec/csrc/dynamic_embedding/: IDTransformer id_transformer.h:28,
parameter server ps.h:26, python wrappers
contrib/dynamic_embedding/src/torchrec_dynamic_embedding/ — IDTransformerGroup,
dataloader.py background transform).

TPU-first: the transformer runs HOST-SIDE in the input pipeline (ids are
remapped before the batch is device_put), so the device program only ever
sees bounded int32 slots — the same pre-batch transform the reference's
dataloader.py applies. Eviction pushes displaced rows to the parameter
server and returns the slots so the caller can pull fresh rows into the
device table (the KVZCH/SSD-tier analog).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "IDTransformer",
    "ParameterServer",
    "IDTransformerCollection",
    "register_io_plugin",
]

_LIB = None


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    d = os.path.join(root, "cpp", "dynamic_embedding")
    srcs = [os.path.join(d, "id_transformer.cc"), os.path.join(d, "io_registry.cc")]
    hdrs = [os.path.join(d, "tde_io.h")]
    so = os.path.join(d, "libtde.so")
    newest = max(os.path.getmtime(p) for p in srcs + hdrs)
    if not os.path.exists(so) or os.path.getmtime(so) < newest:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", so,
             *srcs, "-ldl"],
            check=True,
        )
    lib = ctypes.CDLL(so)
    i64 = ctypes.c_int64
    p64 = ctypes.POINTER(ctypes.c_int64)
    pf = ctypes.POINTER(ctypes.c_float)
    lib.idt_create.restype = ctypes.c_void_p
    lib.idt_create.argtypes = [i64]
    lib.idt_destroy.argtypes = [ctypes.c_void_p]
    lib.idt_transform.restype = i64
    lib.idt_transform.argtypes = [ctypes.c_void_p, p64, p64, i64, p64]
    lib.idt_evict.restype = i64
    lib.idt_evict.argtypes = [ctypes.c_void_p, i64, p64, p64]
    lib.idt_transform2.restype = i64
    lib.idt_transform2.argtypes = [
        ctypes.c_void_p, p64, p64, i64, p64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.idt_remove.restype = i64
    lib.idt_remove.argtypes = [ctypes.c_void_p, p64, i64, p64, p64]
    lib.idt_export.restype = i64
    lib.idt_export.argtypes = [ctypes.c_void_p, p64, p64, i64]
    lib.idt_restore.restype = i64
    lib.idt_restore.argtypes = [ctypes.c_void_p, p64, p64, i64]
    lib.idt_size.restype = i64
    lib.idt_size.argtypes = [ctypes.c_void_p]
    lib.idt_capacity.restype = i64
    lib.idt_capacity.argtypes = [ctypes.c_void_p]
    lib.ps_create.restype = ctypes.c_void_p
    lib.ps_create.argtypes = [i64]
    lib.ps_create2.restype = ctypes.c_void_p
    lib.ps_create2.argtypes = [i64, ctypes.c_char_p, ctypes.c_char_p]
    lib.ps_destroy.argtypes = [ctypes.c_void_p]
    lib.ps_push.argtypes = [ctypes.c_void_p, p64, pf, i64]
    lib.ps_pull.restype = i64
    lib.ps_pull.argtypes = [ctypes.c_void_p, p64, pf, i64]
    lib.ps_scan.restype = i64
    lib.ps_scan.argtypes = [ctypes.c_void_p, p64, pf, i64]
    lib.ps_size.restype = i64
    lib.ps_size.argtypes = [ctypes.c_void_p]
    lib.tde_io_register_plugin.restype = ctypes.c_int
    lib.tde_io_register_plugin.argtypes = [ctypes.c_char_p]
    _LIB = lib
    return lib


def _as_i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class IDTransformer:
    """ctypes wrapper over the C++ transformer (reference
    naive_id_transformer.h + mixed_lfu_lru_strategy.h roles)."""

    def __init__(self, capacity: int):
        self._lib = _lib()
        self._h = self._lib.idt_create(capacity)
        self.capacity = capacity

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.idt_destroy(self._h)
            self._h = None

    def transform(
        self, global_ids: np.ndarray, auto_evict: bool = True
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Map global ids -> cache slots.

        Returns (cache_ids [n], evicted_gids, evicted_slots). When the map
        fills and ``auto_evict``, the coldest ~10% of slots are evicted and
        the transform retried — the reference's transform->evict loop
        (contrib .../id_transformer_group.cpp)."""
        cids, eg, es, _ = self.transform_with_fresh(global_ids, auto_evict)
        return cids, eg, es

    def transform_with_fresh(
        self, global_ids: np.ndarray, auto_evict: bool = True
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """``transform`` plus a per-id bool mask of ids newly mapped this
        call — recycled slots whose new id is fresh must be re-initialized
        by the caller (they hold the previous tenant's row)."""
        gids = np.ascontiguousarray(global_ids, np.int64)
        n = gids.shape[0]
        cids = np.empty(n, np.int64)
        fresh_flags = np.zeros(n, np.uint8)
        fresh = ctypes.c_int64(0)

        def _call():
            return self._lib.idt_transform2(
                self._h, _as_i64(gids), _as_i64(cids), n, ctypes.byref(fresh),
                fresh_flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )

        ok = _call()
        evicted_g = np.empty(0, np.int64)
        evicted_s = np.empty(0, np.int64)
        all_fresh = fresh_flags.astype(bool)
        retries = 0
        while ok < n and auto_evict:
            # another thread may refill between evict and retry: keep
            # evicting until this batch fits (or the batch itself has more
            # distinct ids than the whole map can hold)
            if len(np.unique(gids)) > self.capacity:
                raise RuntimeError(
                    f"transformer capacity {self.capacity} exhausted: batch "
                    f"has more distinct ids than capacity"
                )
            if retries >= 8:
                raise RuntimeError(
                    f"transformer full after {retries} evict/retry rounds "
                    f"(capacity {self.capacity}, concurrent writers?)"
                )
            n_evict = max(self.capacity // 10, int(n - ok), 1)
            eg, es = self.evict(n_evict)
            evicted_g = np.concatenate([evicted_g, eg])
            evicted_s = np.concatenate([evicted_s, es])
            ok = _call()
            all_fresh |= fresh_flags.astype(bool)
            retries += 1
        if ok < n:
            raise RuntimeError(
                f"transformer full: {n - ok} ids of {n} unmapped "
                f"(capacity {self.capacity}); call evict() or enable auto_evict"
            )
        return cids, evicted_g, evicted_s, all_fresh

    def evict(self, n: int) -> Tuple[np.ndarray, np.ndarray]:
        gids = np.empty(n, np.int64)
        slots = np.empty(n, np.int64)
        k = self._lib.idt_evict(self._h, n, _as_i64(gids), _as_i64(slots))
        return gids[:k], slots[:k]

    def remove(self, slots: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Targeted removal by slot index (policy-driven virtual-table
        eviction). Returns the (gids, slots) actually removed — unknown or
        already-empty slots are skipped."""
        s = np.ascontiguousarray(slots, np.int64)
        n = len(s)
        rg = np.empty(n, np.int64)
        rs = np.empty(n, np.int64)
        k = self._lib.idt_remove(self._h, _as_i64(s), n, _as_i64(rg), _as_i64(rs))
        return rg[:k], rs[:k]

    def export_state(self) -> Tuple[np.ndarray, np.ndarray]:
        n = self.capacity
        gids = np.empty(n, np.int64)
        slots = np.empty(n, np.int64)
        k = self._lib.idt_export(self._h, _as_i64(gids), _as_i64(slots), n)
        return gids[:k], slots[:k]

    def restore_state(self, gids: np.ndarray, slots: np.ndarray) -> None:
        g = np.ascontiguousarray(gids, np.int64)
        s = np.ascontiguousarray(slots, np.int64)
        k = self._lib.idt_restore(self._h, _as_i64(g), _as_i64(s), len(g))
        if k != len(g):
            raise ValueError(f"restore failed at row {k}")

    def __len__(self) -> int:
        return int(self._lib.idt_size(self._h))


def register_io_plugin(so_path: str) -> None:
    """Load an external storage-provider plugin .so (must export
    ``tde_io_provider``; reference io_registry.cpp register_plugin). Its
    provider name becomes usable as ``ParameterServer(provider=...)``."""
    rc = _lib().tde_io_register_plugin(os.fsencode(so_path))
    if rc == 4:
        raise RuntimeError(
            f"plugin provider name already registered (duplicate names are "
            f"rejected — live ParameterServers hold the existing provider): "
            f"{so_path}"
        )
    if rc != 0:
        raise RuntimeError(f"plugin load failed (rc={rc}): {so_path}")


class ParameterServer:
    """Host row store for evicted/fetched embedding rows (reference ps.h:26
    LocalShard) over a pluggable storage provider (reference io_registry.cpp
    + redis/redis_io.cpp): ``memory`` (default), ``file`` (durable
    append-log, cfg = path — the Redis stand-in), or any plugin registered
    with :func:`register_io_plugin`."""

    def __init__(self, dim: int, provider: str = "memory", config: str = ""):
        self._lib = _lib()
        self._h = self._lib.ps_create2(
            dim, provider.encode(), config.encode()
        )
        if not self._h:
            raise ValueError(
                f"parameter-server provider {provider!r} failed to "
                f"initialize (config={config!r})"
            )
        self.dim = dim
        self.provider = provider

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ps_destroy(self._h)
            self._h = None

    def push(self, global_ids: np.ndarray, rows: np.ndarray) -> None:
        g = np.ascontiguousarray(global_ids, np.int64)
        r = np.ascontiguousarray(rows, np.float32)
        assert r.shape == (len(g), self.dim)
        self._lib.ps_push(
            self._h, _as_i64(g), r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(g),
        )

    def pull(self, global_ids: np.ndarray) -> Tuple[np.ndarray, int]:
        g = np.ascontiguousarray(global_ids, np.int64)
        out = np.zeros((len(g), self.dim), np.float32)
        hits = self._lib.ps_pull(
            self._h, _as_i64(g), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(g),
        )
        return out, int(hits)

    def scan(self) -> Tuple[np.ndarray, np.ndarray]:
        """Dump all stored (gids, rows) — the checkpoint walk."""
        n = len(self)
        gids = np.empty(n, np.int64)
        rows = np.empty((n, self.dim), np.float32)
        k = self._lib.ps_scan(
            self._h, _as_i64(gids),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        )
        return gids[:k], rows[:k]

    def __len__(self) -> int:
        return int(self._lib.ps_size(self._h))


class IDTransformerCollection:
    """Per-table transformers applied to a KJT host-side before device_put
    (reference IDTransformerGroup + dataloader.py transform)."""

    def __init__(
        self,
        capacities: Dict[str, int],
        feature_to_table: Dict[str, str],
        dims: Optional[Dict[str, int]] = None,
    ):
        self._transformers = {t: IDTransformer(c) for t, c in capacities.items()}
        self._feature_to_table = dict(feature_to_table)
        self._ps = (
            {t: ParameterServer(dims[t]) for t in capacities} if dims else None
        )

    def transformer(self, table: str) -> IDTransformer:
        return self._transformers[table]

    def parameter_server(self, table: str) -> Optional[ParameterServer]:
        return self._ps[table] if self._ps else None

    def transform_numpy(
        self,
        keys: Sequence[str],
        values: np.ndarray,
        lengths: np.ndarray,
    ) -> Tuple[np.ndarray, Dict[str, Tuple[np.ndarray, np.ndarray]]]:
        """Feature-major value stream -> transformed stream.

        Returns (new_values, {table: (evicted_gids, evicted_slots)}).
        """
        out = values.astype(np.int64).copy()
        evictions: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        per_key = lengths.sum(axis=1)
        off = 0
        # group contiguous per-key ranges by table
        ranges: Dict[str, List[Tuple[int, int]]] = {}
        for fi, key in enumerate(keys):
            t = self._feature_to_table.get(key)
            n = int(per_key[fi])
            if t is not None and n:
                ranges.setdefault(t, []).append((off, off + n))
            off += n
        for t, rs in ranges.items():
            gids = np.concatenate([values[a:b] for a, b in rs]).astype(np.int64)
            cids, eg, es = self._transformers[t].transform(gids)
            pos = 0
            for a, b in rs:
                out[a:b] = cids[pos : pos + (b - a)]
                pos += b - a
            if len(eg):
                prev = evictions.get(t)
                evictions[t] = (
                    (np.concatenate([prev[0], eg]), np.concatenate([prev[1], es]))
                    if prev
                    else (eg, es)
                )
        # features WITHOUT a dynamic table pass through untransformed
        # (static-table features carry bounded slots already) — but they
        # must actually fit the int32 device stream; silently truncating a
        # 64-bit global id here would alias embedding rows with no signal
        if len(out) and (
            out.max(initial=0) > np.iinfo(np.int32).max
            or out.min(initial=0) < np.iinfo(np.int32).min
        ):
            bad = [
                k for fi, k in enumerate(keys)
                if self._feature_to_table.get(k) is None and per_key[fi]
            ]
            raise ValueError(
                f"untransformed ids overflow int32; features without a "
                f"dynamic-table mapping: {bad} (map them in "
                f"feature_to_table or pre-hash them)"
            )
        return out.astype(np.int32), evictions
