"""Native (C++) host runtime: mmap'd scene banks with threaded batch gather.

The compute path is JAX/XLA/Pallas on device; the host runtime around it —
dataset storage, batch assembly, prefetch — is C++ (``scene_bank.cc``),
replacing the reference's per-reset shapely pickle loads
(``env/parking_map_dlp.py:31-36``).  The shared library builds on demand with
g++ (cached next to the source); everything degrades gracefully to a numpy
fallback when no toolchain is available (``HOPE_TPU_NO_NATIVE=1`` forces it).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "scene_bank.cc")
_SO = os.path.join(_DIR, "libscene_bank.so")
_MAGIC = 0x3142505448  # "HTPB1"

_lib = None
_lib_lock = threading.Lock()


def _build() -> str | None:
    if os.environ.get("HOPE_TPU_NO_NATIVE"):
        return None
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-pthread", "-o", _SO, _SRC],
            check=True, capture_output=True, cwd=_DIR,
        )
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def load_library():
    """Build (if needed) and load the native library; None when unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.htpb_open.restype = ctypes.c_void_p
        lib.htpb_open.argtypes = [ctypes.c_char_p]
        lib.htpb_close.argtypes = [ctypes.c_void_p]
        for f in ("htpb_n_cases", "htpb_max_edges", "htpb_max_starts"):
            fn = getattr(lib, f)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        pf = ctypes.POINTER(ctypes.c_float)
        pu8 = ctypes.POINTER(ctypes.c_uint8)
        pi32 = ctypes.POINTER(ctypes.c_int32)
        pi64 = ctypes.POINTER(ctypes.c_int64)
        lib.htpb_gather.argtypes = [
            ctypes.c_void_p, pi64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, pf, pu8, pi32, pi32, pf, pf, pi32, pi32,
            ctypes.c_int,
        ]
        lib.htpb_prefetch.restype = ctypes.c_int
        lib.htpb_prefetch.argtypes = [
            ctypes.c_void_p, pi64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int,
        ]
        lib.htpb_wait.restype = ctypes.c_int
        lib.htpb_wait.argtypes = [ctypes.c_void_p, pf, pu8, pi32, pi32, pf,
                                  pf, pi32, pi32]
        _lib = lib
        return _lib


def convert_npz_to_bank(npz_path: str, bank_path: str) -> None:
    """Write a case bank npz (tools/export_dlp.py layout) as a flat HTPB1 file."""
    d = np.load(npz_path)
    C, E = d["edges"].shape[:2]
    S = d["starts"].shape[1]
    levels = d["levels"] if "levels" in d.files else np.zeros((C, S), np.int32)
    with open(bank_path, "wb") as f:
        np.asarray([_MAGIC, C, E, S], np.int64).tofile(f)
        np.ascontiguousarray(d["edges"], np.float32).tofile(f)
        np.ascontiguousarray(d["edge_mask"], np.uint8).tofile(f)
        np.ascontiguousarray(d["edge_poly"], np.int32).tofile(f)
        np.ascontiguousarray(d["n_polys"], np.int32).tofile(f)
        np.ascontiguousarray(d["dest"], np.float32).tofile(f)
        np.ascontiguousarray(d["starts"], np.float32).tofile(f)
        np.ascontiguousarray(d["n_starts"], np.int32).tofile(f)
        np.ascontiguousarray(levels, np.int32).tofile(f)


class SceneBank:
    """Batch gather + async prefetch over an HTPB1 bank.

    Uses the native library when available; otherwise a numpy mmap fallback
    with identical semantics (ids wrap modulo n_cases; edges/starts truncated
    to the requested runtime budget — live entries are packed front-first).
    """

    def __init__(self, path: str, nthreads: int = 4):
        self.path = path
        self.nthreads = nthreads
        self._lib = load_library()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.htpb_open(path.encode())
            if not self._handle:
                raise OSError(f"not an HTPB1 bank: {path}")
            self.n_cases = self._lib.htpb_n_cases(self._handle)
            self.max_edges = self._lib.htpb_max_edges(self._handle)
            self.max_starts = self._lib.htpb_max_starts(self._handle)
        else:
            hdr = np.fromfile(path, np.int64, 4)
            if hdr[0] != _MAGIC:
                raise OSError(f"not an HTPB1 bank: {path}")
            _, self.n_cases, self.max_edges, self.max_starts = (int(x) for x in hdr)
            self._np = self._np_views()
        self._pending = None

    def _np_views(self):
        C, E, S = self.n_cases, self.max_edges, self.max_starts
        off = 32
        out = {}
        for name, dt, shape in (
            ("edges", np.float32, (C, E, 4)),
            ("edge_mask", np.uint8, (C, E)),
            ("edge_poly", np.int32, (C, E)),
            ("n_polys", np.int32, (C,)),
            ("dest", np.float32, (C, 3)),
            ("starts", np.float32, (C, S, 3)),
            ("n_starts", np.int32, (C,)),
            ("levels", np.int32, (C, S)),
        ):
            out[name] = np.memmap(self.path, dt, "r", offset=off, shape=shape)
            off += int(np.prod(shape)) * np.dtype(dt).itemsize
        return out

    def _alloc(self, n, E, S):
        return {
            "edges": np.empty((n, E, 4), np.float32),
            "edge_mask": np.empty((n, E), np.uint8),
            "edge_poly": np.empty((n, E), np.int32),
            "n_polys": np.empty((n,), np.int32),
            "dest": np.empty((n, 3), np.float32),
            "starts": np.empty((n, S, 3), np.float32),
            "n_starts": np.empty((n,), np.int32),
            "levels": np.empty((n, S), np.int32),
        }

    def _out_ptrs(self, o):
        c = np.ctypeslib.as_ctypes
        return (c(o["edges"].reshape(-1)), c(o["edge_mask"].reshape(-1)),
                c(o["edge_poly"].reshape(-1)), c(o["n_polys"]),
                c(o["dest"].reshape(-1)), c(o["starts"].reshape(-1)),
                c(o["n_starts"]), c(o["levels"].reshape(-1)))

    def gather(self, ids, max_edges: int | None = None,
               max_starts: int | None = None) -> dict:
        """Assemble a padded batch for case ids; returns dict of numpy arrays."""
        ids = np.ascontiguousarray(np.asarray(ids, np.int64))
        E = min(max_edges or self.max_edges, self.max_edges)
        S = min(max_starts or self.max_starts, self.max_starts)
        n = len(ids)
        if self._handle is not None:
            o = self._alloc(n, E, S)
            self._lib.htpb_gather(
                self._handle, np.ctypeslib.as_ctypes(ids), n, E, S,
                *self._out_ptrs(o), self.nthreads)
            o["edge_mask"] = o["edge_mask"].astype(bool)
            return o
        v = self._np
        w = ids % self.n_cases
        ns = np.minimum(v["n_starts"][w], S).astype(np.int32)
        return {
            "edges": np.asarray(v["edges"][w, :E]),
            "edge_mask": np.asarray(v["edge_mask"][w, :E]).astype(bool),
            "edge_poly": np.asarray(v["edge_poly"][w, :E]),
            "n_polys": np.asarray(v["n_polys"][w]),
            "dest": np.asarray(v["dest"][w]),
            "starts": np.asarray(v["starts"][w, :S]),
            "n_starts": ns,
            "levels": np.asarray(v["levels"][w, :S]),
        }

    def prefetch(self, ids, max_edges: int | None = None,
                 max_starts: int | None = None) -> None:
        """Start assembling the next batch on a background thread."""
        ids = np.ascontiguousarray(np.asarray(ids, np.int64))
        E = min(max_edges or self.max_edges, self.max_edges)
        S = min(max_starts or self.max_starts, self.max_starts)
        if self._handle is not None:
            rc = self._lib.htpb_prefetch(
                self._handle, np.ctypeslib.as_ctypes(ids), len(ids), E, S,
                self.nthreads)
            if rc != 0:
                raise RuntimeError("a prefetch is already in flight")
            self._pending = (len(ids), E, S)
        else:
            if self._pending is not None:
                raise RuntimeError("a prefetch is already in flight")
            result = {}
            t = threading.Thread(
                target=lambda: result.update(self.gather(ids, E, S)))
            t.start()
            self._pending = (t, result)

    def take(self) -> dict:
        """Block for the in-flight prefetch and return its batch."""
        if self._pending is None:
            raise RuntimeError("no prefetch in flight")
        if self._handle is not None:
            n, E, S = self._pending
            o = self._alloc(n, E, S)
            rc = self._lib.htpb_wait(self._handle, *self._out_ptrs(o))
            if rc != 0:
                raise RuntimeError("prefetch wait failed")
            o["edge_mask"] = o["edge_mask"].astype(bool)
            self._pending = None
            return o
        t, result = self._pending
        t.join()
        self._pending = None
        return result

    def close(self):
        if self._handle is not None:
            self._lib.htpb_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


__all__ = ["SceneBank", "convert_npz_to_bank", "load_library"]
