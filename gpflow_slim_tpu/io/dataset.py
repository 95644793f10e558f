"""Disk-backed minibatch datasets with a native prefetching loader.

The reference feeds minibatches from in-memory numpy through feed_dict
(SURVEY §3.3); at production scale (BASELINE config #3, N=100k+) the data
lives on disk and the host must overlap I/O with device compute. The hot
path here is C (``native/loader.c``): pread row gather + a background
prefetch thread, compiled on first use (``cc -O2 -shared``) and loaded via
ctypes. A pure-numpy memmap fallback keeps everything working without a
compiler.

Usage::

    path = io.write_gfsb("train.gfsb", np.hstack([X, Y]))
    ds = io.BinaryDataset(path)
    for xb_yb in ds.minibatches(key, batch_size=1024, num_batches=100):
        ...   # each batch was prefetched while the previous step computed
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["write_gfsb", "BinaryDataset"]

_MAGIC = b"GFSB"


def write_gfsb(path: str, array) -> str:
    """Write a rank-2 float32 array in the GFSB format."""
    a = np.ascontiguousarray(np.asarray(array, dtype=np.float32))
    if a.ndim != 2:
        raise ValueError("GFSB stores rank-2 arrays")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(np.asarray(a.shape, dtype=np.int64).tobytes())
        f.write(a.tobytes())
    return path


_LIB = None
_LIB_TRIED = False


def _load_native():
    """Compile (once) and load the native loader; None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.join(os.path.dirname(__file__), "native", "loader.c")
    so = os.path.join(os.path.dirname(__file__), "native", "_loader.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O2", "-shared", "-fPIC", "-o", so, src,
                         "-lpthread"],
                        check=True, capture_output=True, timeout=120,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
            else:
                return None
        lib = ctypes.CDLL(so)
        lib.gfs_open.restype = ctypes.c_void_p
        lib.gfs_open.argtypes = [ctypes.c_char_p]
        lib.gfs_rows.restype = ctypes.c_long
        lib.gfs_rows.argtypes = [ctypes.c_void_p]
        lib.gfs_cols.restype = ctypes.c_long
        lib.gfs_cols.argtypes = [ctypes.c_void_p]
        lib.gfs_gather.restype = ctypes.c_int
        lib.gfs_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gfs_prefetch_submit.restype = ctypes.c_int
        lib.gfs_prefetch_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ]
        lib.gfs_prefetch_wait.restype = ctypes.c_int
        lib.gfs_prefetch_wait.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.gfs_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


class BinaryDataset:
    """Random-access GFSB reader with double-buffered minibatching."""

    def __init__(self, path: str, use_native: bool = True):
        self.path = path
        self._lib = _load_native() if use_native else None
        self._h = None
        if self._lib is not None:
            self._h = self._lib.gfs_open(path.encode())
            if not self._h:
                self._lib = None
        if self._lib is not None:
            self.rows = int(self._lib.gfs_rows(self._h))
            self.cols = int(self._lib.gfs_cols(self._h))
            self.native = True
        else:
            with open(path, "rb") as f:
                if f.read(4) != _MAGIC:
                    raise ValueError(f"{path}: not a GFSB file")
                dims = np.frombuffer(f.read(16), dtype=np.int64)
            self.rows, self.cols = int(dims[0]), int(dims[1])
            self._mm = np.memmap(path, dtype=np.float32, mode="r",
                                 offset=20, shape=(self.rows, self.cols))
            self.native = False

    # -- random-access gather ----------------------------------------------
    def gather(self, indices) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        if not self.native:
            return np.array(self._mm[idx])
        out = np.empty((len(idx), self.cols), dtype=np.float32)
        rc = self._lib.gfs_gather(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(idx), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"native gather failed (rc={rc})")
        return out

    # -- double-buffered minibatch stream -----------------------------------
    def minibatches(self, key, batch_size: int, num_batches: int):
        """Yield prefetched random minibatches (numpy, (B, cols)).

        While the caller computes on batch t, the native thread reads batch
        t+1 from disk. ``key`` is a jax PRNGKey (host-side index sampling).
        """
        import jax

        def sample_idx(k):
            return np.asarray(
                jax.random.randint(k, (batch_size,), 0, self.rows),
                dtype=np.int64,
            )

        keys = jax.random.split(key, num_batches)
        if not self.native:
            for t in range(num_batches):
                yield self.gather(sample_idx(keys[t]))
            return

        idx = sample_idx(keys[0])
        self._submit(idx)
        for t in range(num_batches):
            out = self._wait(batch_size)
            if t + 1 < num_batches:
                self._submit(sample_idx(keys[t + 1]))
            yield out

    def _submit(self, idx):
        rc = self._lib.gfs_prefetch_submit(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(idx),
        )
        if rc != 0:
            raise IOError(f"prefetch submit failed (rc={rc})")

    def _wait(self, n) -> np.ndarray:
        out = np.empty((n, self.cols), dtype=np.float32)
        rc = self._lib.gfs_prefetch_wait(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        if rc != 0:
            raise IOError(f"prefetch wait failed (rc={rc})")
        return out

    def close(self):
        if self.native and self._h:
            self._lib.gfs_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
