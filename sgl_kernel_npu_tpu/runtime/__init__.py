"""Native runtime bindings: paged-KV page pool, radix prefix cache,
continuous-batching scheduler.

The C++ core (csrc/runtime.cpp) is built on first import (one g++ invocation,
cached). A pure-Python twin (`PyScheduler`) provides identical semantics for
environments without a toolchain and serves as the golden in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "csrc", "runtime.cpp")
_SO = os.path.join(_HERE, "_native_runtime.so")

_lib = None


def _build_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        src = os.path.realpath(_SRC)
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(src):
            subprocess.check_call(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO],
                stderr=subprocess.DEVNULL,
            )
        lib = ctypes.CDLL(_SO)
        lib.skt_scheduler_create.restype = ctypes.c_void_p
        lib.skt_scheduler_create.argtypes = [ctypes.c_int32] * 4
        lib.skt_scheduler_destroy.argtypes = [ctypes.c_void_p]
        lib.skt_free_pages.restype = ctypes.c_int32
        lib.skt_free_pages.argtypes = [ctypes.c_void_p]
        lib.skt_add_request.restype = ctypes.c_int64
        lib.skt_add_request.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32]
        lib.skt_match_prefix.restype = ctypes.c_int32
        lib.skt_match_prefix.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.skt_insert_prefix.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.skt_alloc_pages.restype = ctypes.c_int32
        lib.skt_alloc_pages.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        lib.skt_release_pages.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.skt_evict_lru.restype = ctypes.c_int32
        lib.skt_evict_lru.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.skt_retain_pages.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.skt_schedule_step.restype = ctypes.c_int32
        lib.skt_schedule_step.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.skt_commit_progress.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
        lib.skt_finish_request.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.skt_activate_request.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.skt_num_requests.restype = ctypes.c_int32
        lib.skt_num_requests.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _arr(values):
    return (ctypes.c_int32 * len(values))(*values)


class NativeScheduler:
    """ctypes facade over the C++ scheduler."""

    def __init__(self, num_pages: int, page_size: int, max_batch: int = 256,
                 token_budget: int = 4096):
        lib = _build_native()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.skt_scheduler_create(
            num_pages, page_size, max_batch, token_budget))
        self.page_size = page_size

    def __del__(self):
        try:
            self._lib.skt_scheduler_destroy(self._h)
        except Exception:
            pass

    def free_pages(self) -> int:
        return self._lib.skt_free_pages(self._h)

    def add_request(self, tokens: List[int], max_new_tokens: int) -> int:
        return self._lib.skt_add_request(self._h, _arr(tokens), len(tokens),
                                         max_new_tokens)

    def match_prefix(self, tokens: List[int]) -> Tuple[int, List[int]]:
        out = (ctypes.c_int32 * 1024)()
        n = self._lib.skt_match_prefix(self._h, _arr(tokens), len(tokens), out, 1024)
        return n, list(out[: n // self.page_size])

    def insert_prefix(self, tokens: List[int], pages: List[int]):
        self._lib.skt_insert_prefix(self._h, _arr(tokens), len(tokens),
                                    _arr(pages), len(pages))

    def alloc_pages(self, count: int) -> List[int]:
        out = (ctypes.c_int32 * count)()
        n = self._lib.skt_alloc_pages(self._h, count, out)
        return list(out[:n])

    def release_pages(self, pages: List[int]):
        self._lib.skt_release_pages(self._h, _arr(pages), len(pages))

    def retain_pages(self, pages: List[int]):
        self._lib.skt_retain_pages(self._h, _arr(pages), len(pages))

    def evict_lru(self, need: int) -> int:
        """Evict up to `need` LRU cache-only pages; alloc_pages also evicts
        automatically on exhaustion."""
        return self._lib.skt_evict_lru(self._h, need)

    def schedule_step(self, max_entries: int = 256):
        out = (ctypes.c_int32 * (max_entries * 5))()
        n = self._lib.skt_schedule_step(self._h, out, max_entries)
        entries = []
        for i in range(n):
            rid = out[i * 5] | (out[i * 5 + 1] << 32)
            entries.append({
                "req_id": rid,
                "kind": "prefill" if out[i * 5 + 2] == 0 else "decode",
                "start": out[i * 5 + 3],
                "len": out[i * 5 + 4],
            })
        return entries

    def commit_progress(self, req_id: int, kind: str, count: int):
        self._lib.skt_commit_progress(self._h, req_id,
                                      0 if kind == "prefill" else 1, count)

    def finish_request(self, req_id: int):
        self._lib.skt_finish_request(self._h, req_id)

    def activate_request(self, req_id: int):
        """Admit without prefill admission (resume of a preempted request)."""
        self._lib.skt_activate_request(self._h, req_id)

    def num_requests(self) -> int:
        return self._lib.skt_num_requests(self._h)


class PyScheduler:
    """Pure-Python twin with identical semantics (golden for the native one)."""

    def __init__(self, num_pages: int, page_size: int, max_batch: int = 256,
                 token_budget: int = 4096):
        self.page_size = page_size
        self.max_batch = max_batch
        self.token_budget = token_budget
        self._free = list(range(num_pages - 1, -1, -1))
        self._ref = [0] * num_pages
        self._reqs = {}
        self._next = 1
        self._cache = {}  # tuple(chunk path) -> page
        self._atime = {}  # tuple(chunk path) -> last access clock
        self._clock = 0

    def free_pages(self):
        return len(self._free)

    def add_request(self, tokens, max_new_tokens):
        rid = self._next
        self._next += 1
        self._reqs[rid] = {
            "tokens": list(tokens), "prefilled": 0, "decoded": 0,
            "max_new": max_new_tokens, "pages": [], "active": False,
        }
        return rid

    def match_prefix(self, tokens):
        ps = self.page_size
        matched, pages, path = 0, [], ()
        self._clock += 1
        for off in range(0, len(tokens) - ps + 1, ps):
            path = path + (tuple(tokens[off:off + ps]),)
            if path not in self._cache:
                break
            pages.append(self._cache[path])
            self._atime[path] = self._clock
            matched += ps
        return matched, pages

    def insert_prefix(self, tokens, pages):
        ps = self.page_size
        path = ()
        for i, off in enumerate(range(0, len(tokens) - ps + 1, ps)):
            if i >= len(pages):
                break
            path = path + (tuple(tokens[off:off + ps]),)
            if path not in self._cache:
                self._cache[path] = pages[i]
                self._ref[pages[i]] += 1
            self._clock += 1
            self._atime[path] = self._clock

    def evict_lru(self, need):
        freed = 0
        while freed < need:
            leaves = [p for p in self._cache
                      if not any(q[: len(p)] == p and len(q) > len(p)
                                 for q in self._cache)
                      and self._ref[self._cache[p]] == 1]
            if not leaves:
                break
            victim = min(leaves, key=lambda p: self._atime.get(p, 0))
            page = self._cache.pop(victim)
            self._atime.pop(victim, None)
            self._ref[page] -= 1
            if self._ref[page] == 0:
                self._free.append(page)
            freed += 1
        return freed

    def alloc_pages(self, count):
        out = []
        while len(out) < count:
            if not self._free and self.evict_lru(count - len(out)) == 0:
                break
            if not self._free:
                break
            p = self._free.pop()
            self._ref[p] = 1
            out.append(p)
        return out

    def release_pages(self, pages):
        for p in pages:
            self._ref[p] -= 1
            if self._ref[p] == 0:
                self._free.append(p)

    def retain_pages(self, pages):
        for p in pages:
            self._ref[p] += 1

    def schedule_step(self, max_entries: int = 256):
        entries = []
        budget = self.token_budget
        for rid in sorted(self._reqs):
            r = self._reqs[rid]
            if len(entries) >= min(max_entries, self.max_batch):
                break
            if not r["active"] or r["prefilled"] < len(r["tokens"]):
                continue
            if r["decoded"] >= r["max_new"]:
                continue
            entries.append({"req_id": rid, "kind": "decode",
                            "start": len(r["tokens"]) + r["decoded"], "len": 1})
            budget -= 1
        for rid in sorted(self._reqs):
            r = self._reqs[rid]
            if len(entries) >= min(max_entries, self.max_batch) or budget <= 0:
                break
            rem = len(r["tokens"]) - r["prefilled"]
            if rem <= 0:
                continue
            if not r["active"]:
                if len(self._free) < 1:
                    continue
                r["active"] = True
            chunk = min(rem, budget)
            entries.append({"req_id": rid, "kind": "prefill",
                            "start": r["prefilled"], "len": chunk})
            budget -= chunk
        return entries

    def commit_progress(self, rid, kind, count):
        r = self._reqs.get(rid)
        if not r:
            return
        r["prefilled" if kind == "prefill" else "decoded"] += count

    def activate_request(self, rid):
        if rid in self._reqs:
            self._reqs[rid]["active"] = True

    def finish_request(self, rid):
        r = self._reqs.pop(rid, None)
        if r:
            self.release_pages(r["pages"])

    def num_requests(self):
        return len(self._reqs)


def make_scheduler(num_pages, page_size, max_batch=256, token_budget=4096,
                   prefer_native=True):
    if prefer_native:
        try:
            return NativeScheduler(num_pages, page_size, max_batch, token_budget)
        except Exception:
            pass
    return PyScheduler(num_pages, page_size, max_batch, token_budget)
