"""ctypes bindings for the native (C++) request scheduler.

Builds libscheduler.so with g++ on first use (cached beside the source);
`maybe_scheduler` degrades to None when no toolchain is available so the
engine still works Python-only.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "scheduler.cpp")
_SO = os.path.join(_HERE, "libscheduler.so")
_lib = None


def _build() -> str:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True)
    return _SO


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    lib.sched_create.restype = ctypes.c_void_p
    lib.sched_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.sched_destroy.argtypes = [ctypes.c_void_p]
    lib.sched_enqueue.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_int, ctypes.c_int]
    lib.sched_admit.restype = ctypes.c_int
    lib.sched_admit.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.sched_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.sched_free_slots.restype = ctypes.c_int
    lib.sched_free_slots.argtypes = [ctypes.c_void_p]
    lib.sched_pages_free.restype = ctypes.c_int64
    lib.sched_pages_free.argtypes = [ctypes.c_void_p]
    lib.sched_queue_len.restype = ctypes.c_int
    lib.sched_queue_len.argtypes = [ctypes.c_void_p]
    lib.sched_slot_of.restype = ctypes.c_int
    lib.sched_slot_of.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    _lib = lib
    return lib


class NativeScheduler:
    """Thin OO wrapper over the C ABI."""

    def __init__(self, num_slots: int, max_seq: int, page_size: int = 256):
        self._lib = _load()
        self._h = self._lib.sched_create(num_slots, max_seq, page_size)

    def __del__(self):
        try:
            self._lib.sched_destroy(self._h)
        except Exception:
            pass

    def enqueue(self, uid: int, prompt_len: int, max_new_tokens: int):
        self._lib.sched_enqueue(self._h, uid, prompt_len, max_new_tokens)

    def admit(self, uid: int, slot: int) -> bool:
        return bool(self._lib.sched_admit(self._h, uid, slot))

    def release(self, uid: int):
        self._lib.sched_release(self._h, uid)

    @property
    def free_slots(self) -> int:
        return self._lib.sched_free_slots(self._h)

    @property
    def pages_free(self) -> int:
        return self._lib.sched_pages_free(self._h)

    @property
    def queue_len(self) -> int:
        return self._lib.sched_queue_len(self._h)

    def slot_of(self, uid: int) -> int:
        return self._lib.sched_slot_of(self._h, uid)


def maybe_scheduler(num_slots: int, max_seq: int,
                    page_size: int = 256) -> NativeScheduler | None:
    try:
        return NativeScheduler(num_slots, max_seq, page_size)
    except Exception as e:  # no g++ / build failure
        logger.warning("native scheduler unavailable (%s); "
                       "running Python-only", e)
        return None
