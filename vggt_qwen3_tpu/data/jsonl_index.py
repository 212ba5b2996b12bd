"""Lazy JSONL access backed by the native C++ indexer (csrc/jsonl_index.cpp).

Loads ``csrc/libjsonl_index.so`` via ctypes (building it with ``make -C csrc``
on first use when a toolchain is present); falls back to a pure-Python offset
index with identical semantics otherwise. Either way, records parse lazily —
the dataset no longer materializes every sample dict at open the way the
reference does (``dataset_builder.py:39-55``).
"""

from __future__ import annotations

import ctypes
import json
import subprocess
from pathlib import Path
from typing import Optional

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libjsonl_index.so"
_lib: Optional[ctypes.CDLL] = None
_lib_attempted = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_attempted
    if _lib is not None or _lib_attempted:
        return _lib
    _lib_attempted = True
    if not _LIB_PATH.exists() and (_CSRC / "Makefile").exists():
        try:
            subprocess.run(
                ["make", "-C", str(_CSRC)], capture_output=True, check=True, timeout=120
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.jsonl_open.restype = ctypes.c_void_p
        lib.jsonl_open.argtypes = [ctypes.c_char_p]
        lib.jsonl_count.restype = ctypes.c_long
        lib.jsonl_count.argtypes = [ctypes.c_void_p]
        lib.jsonl_get.restype = ctypes.c_void_p  # raw ptr; sliced via string_at
        lib.jsonl_get.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long)]
        lib.jsonl_close.restype = None
        lib.jsonl_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


class JsonlIndex:
    """O(1) random access to JSONL records; records parse on demand."""

    def __init__(self, path: str | Path) -> None:
        self.path = Path(path)
        self._handle = None
        self._offsets = None
        lib = _load_lib()
        if lib is not None:
            handle = lib.jsonl_open(str(self.path).encode())
            if handle:
                self._handle = ctypes.c_void_p(handle)
                self._lib = lib
                self._n = int(lib.jsonl_count(self._handle))
                self.backend = "native"
                return
        # pure-Python fallback: newline offset scan, lazy parse
        data = self.path.read_bytes()
        self._data = data
        offsets = []
        pos = 0
        while pos < len(data):
            end = data.find(b"\n", pos)
            if end == -1:
                end = len(data)
            line = data[pos:end].rstrip(b"\r")
            if line.strip():
                offsets.append((pos, len(line)))
            pos = end + 1
        self._offsets = offsets
        self._n = len(offsets)
        self.backend = "python"

    def __len__(self) -> int:
        return self._n

    def raw(self, i: int) -> bytes:
        if not 0 <= i < self._n:
            raise IndexError(i)
        if self._handle is not None:
            length = ctypes.c_long()
            ptr = self._lib.jsonl_get(self._handle, i, ctypes.byref(length))
            return ctypes.string_at(ptr, length.value)
        start, length = self._offsets[i]
        return self._data[start : start + length]

    def __getitem__(self, i: int) -> dict:
        return json.loads(self.raw(i))

    def close(self) -> None:
        if self._handle is not None:
            self._lib.jsonl_close(self._handle)
            self._handle = None

    def __del__(self) -> None:  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
