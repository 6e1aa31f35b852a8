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
    lib.pa_create.restype = ctypes.c_void_p
    lib.pa_create.argtypes = [ctypes.c_int]
    lib.pa_destroy.argtypes = [ctypes.c_void_p]
    lib.pa_alloc.restype = ctypes.c_int
    lib.pa_alloc.argtypes = [ctypes.c_void_p, ctypes.c_int,
                             ctypes.POINTER(ctypes.c_int32)]
    lib.pa_incref.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.pa_decref.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.pa_prefix_insert.restype = ctypes.c_int32
    lib.pa_prefix_insert.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                     ctypes.c_int32]
    lib.pa_prefix_lookup.restype = ctypes.c_int32
    lib.pa_prefix_lookup.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pa_free_count.restype = ctypes.c_int64
    lib.pa_free_count.argtypes = [ctypes.c_void_p]
    lib.pa_cached_count.restype = ctypes.c_int64
    lib.pa_cached_count.argtypes = [ctypes.c_void_p]
    lib.pa_stats.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_int64)]
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


class NativePageAllocator:
    """Refcounted page allocator + prefix cache (C++, vLLM-style).

    Falls back to a pure-Python twin (`PyPageAllocator`) when no native
    toolchain is available; both expose the same surface."""

    def __init__(self, num_pages: int):
        self._lib = _load()
        self._h = self._lib.pa_create(num_pages)

    def __del__(self):
        try:
            self._lib.pa_destroy(self._h)
        except Exception:
            pass

    def alloc(self, n: int) -> list[int] | None:
        out = (ctypes.c_int32 * max(n, 1))()
        if not self._lib.pa_alloc(self._h, n, out):
            return None
        return [int(out[i]) for i in range(n)]

    def incref(self, page_id: int):
        self._lib.pa_incref(self._h, page_id)

    def decref(self, page_id: int):
        self._lib.pa_decref(self._h, page_id)

    def prefix_insert(self, h: int, page_id: int) -> int:
        return int(self._lib.pa_prefix_insert(
            self._h, ctypes.c_uint64(h & (2**64 - 1)), page_id))

    def prefix_lookup(self, h: int) -> int:
        return int(self._lib.pa_prefix_lookup(
            self._h, ctypes.c_uint64(h & (2**64 - 1))))

    @property
    def free_count(self) -> int:
        return int(self._lib.pa_free_count(self._h))

    @property
    def cached_count(self) -> int:
        return int(self._lib.pa_cached_count(self._h))

    @property
    def stats(self) -> dict:
        out = (ctypes.c_int64 * 3)()
        self._lib.pa_stats(self._h, out)
        return {"hits": int(out[0]), "misses": int(out[1]),
                "evictions": int(out[2])}


class PyPageAllocator:
    """Pure-Python twin of NativePageAllocator (same semantics; used when
    g++ is unavailable and as the test oracle for the C++ one)."""

    def __init__(self, num_pages: int):
        self._refs = [0] * num_pages
        self._hash = [None] * num_pages
        self._free = list(range(num_pages - 1, -1, -1))
        self._cache: dict[int, int] = {}
        self._lru: list[int] = []  # evictable, oldest first
        self._stats = {"hits": 0, "misses": 0, "evictions": 0}

    def _evict_one(self) -> bool:
        if not self._lru:
            return False
        pid = self._lru.pop(0)
        del self._cache[self._hash[pid]]
        self._hash[pid] = None
        self._free.append(pid)
        self._stats["evictions"] += 1
        return True

    def alloc(self, n: int) -> list[int] | None:
        while len(self._free) < n:
            if not self._evict_one():
                return None
        out = []
        for _ in range(n):
            pid = self._free.pop()
            self._refs[pid] = 1
            self._hash[pid] = None
            out.append(pid)
        return out

    def incref(self, pid: int):
        if self._refs[pid] == 0 and pid in self._lru:
            self._lru.remove(pid)
        self._refs[pid] += 1

    def decref(self, pid: int):
        if self._refs[pid] <= 0:
            return
        self._refs[pid] -= 1
        if self._refs[pid] == 0:
            if self._hash[pid] is not None:
                self._lru.append(pid)
            else:
                self._free.append(pid)

    def prefix_insert(self, h: int, pid: int) -> int:
        if h in self._cache:
            return self._cache[h]
        self._hash[pid] = h
        self._cache[h] = pid
        return pid

    def prefix_lookup(self, h: int) -> int:
        pid = self._cache.get(h, -1)
        if pid < 0:
            self._stats["misses"] += 1
            return -1
        self.incref(pid)
        self._stats["hits"] += 1
        return pid

    @property
    def free_count(self) -> int:
        return len(self._free)

    @property
    def cached_count(self) -> int:
        return len(self._cache)

    @property
    def stats(self) -> dict:
        return dict(self._stats)


def make_page_allocator(num_pages: int):
    try:
        return NativePageAllocator(num_pages)
    except Exception as e:
        logger.warning("native page allocator unavailable (%s); "
                       "using Python twin", e)
        return PyPageAllocator(num_pages)
