"""ctypes bindings for the native C++ planner and page pool (csrc/).

Reference parity: the FFI surface of csrc/batch_prefill_jit_binding.cu:44-46
(`plan` export) — but bound with ctypes instead of TVM-FFI since the host
component is plain C++ and the device side is Pallas.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Sequence, Tuple

import numpy as np

from flashinfer_tpu.jit.core import get_native_runtime

__all__ = ["native_plan_available", "native_plan_attention", "PagePool"]


class _FiPlanSizes(ctypes.Structure):
    _fields_ = [
        ("tile_q", ctypes.c_int64),
        ("kv_chunk_size", ctypes.c_int64),
        ("num_work_items", ctypes.c_int64),
        ("total_rows", ctypes.c_int64),
        ("num_valid_items", ctypes.c_int64),
        ("batch_size", ctypes.c_int64),
        ("page_size", ctypes.c_int64),
        ("gqa_group", ctypes.c_int64),
    ]


_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_configured = False


def _lib():
    global _configured
    lib = get_native_runtime()
    if lib is None:
        return None
    if not _configured:
        lib.fi_plan_create.restype = ctypes.c_void_p
        lib.fi_plan_create.argtypes = [
            _i64p, ctypes.c_int64, _i64p, _i64p, ctypes.c_int64, _i64p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.fi_plan_sizes.argtypes = [ctypes.c_void_p, ctypes.POINTER(_FiPlanSizes)]
        lib.fi_plan_export.argtypes = [ctypes.c_void_p] + [_i32p] * 11
        lib.fi_plan_destroy.argtypes = [ctypes.c_void_p]
        lib.fi_page_pool_create.restype = ctypes.c_void_p
        lib.fi_page_pool_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.fi_page_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.fi_page_pool_free_pages.restype = ctypes.c_int64
        lib.fi_page_pool_free_pages.argtypes = [ctypes.c_void_p]
        lib.fi_seq_create.restype = ctypes.c_int64
        lib.fi_seq_create.argtypes = [ctypes.c_void_p]
        lib.fi_seq_extend.restype = ctypes.c_int32
        lib.fi_seq_extend.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        lib.fi_seq_truncate.restype = ctypes.c_int32
        lib.fi_seq_truncate.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        lib.fi_seq_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fi_seq_len.restype = ctypes.c_int64
        lib.fi_seq_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fi_seq_num_pages.restype = ctypes.c_int64
        lib.fi_seq_num_pages.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fi_seq_pages.argtypes = [ctypes.c_void_p, ctypes.c_int64, _i32p]
        lib.fi_batch_export.argtypes = [
            ctypes.c_void_p, _i64p, ctypes.c_int64, _i32p, _i32p, _i32p,
        ]
        _configured = True
    return lib


def native_plan_available() -> bool:
    return _lib() is not None


def _as_i64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.int64))


def _ptr64(a: Optional[np.ndarray]):
    return a.ctypes.data_as(_i64p) if a is not None else None


def native_plan_attention(
    qo_indptr,
    kv_lens,
    *,
    qo_token_lens=None,
    gqa_group: int = 1,
    kv_indptr=None,
    page_size: int = 1,
    tile_q: int = 128,
    kv_chunk_size: Optional[int] = None,
    max_kv_chunk_size: int = 4096,
    min_kv_chunk_size: int = 256,
    target_num_items: Optional[int] = None,
    work_capacity: Optional[int] = None,
    causal: bool = False,
):
    """Native-planner twin of plan.plan_attention; returns the same
    AttentionPlan (or raises RuntimeError if the native runtime is absent)."""
    from flashinfer_tpu.scheduler.plan import AttentionPlan  # no cycle at call

    lib = _lib()
    if lib is None:
        raise RuntimeError("native planner unavailable")

    qo_indptr = _as_i64(qo_indptr)
    kv_lens = _as_i64(kv_lens)
    batch = len(kv_lens)
    tok = _as_i64(qo_token_lens) if qo_token_lens is not None else None
    kvp = _as_i64(kv_indptr) if kv_indptr is not None else None

    handle = lib.fi_plan_create(
        _ptr64(qo_indptr), batch, _ptr64(kv_lens), _ptr64(tok), gqa_group,
        _ptr64(kvp), page_size, tile_q,
        kv_chunk_size or 0, max_kv_chunk_size, min_kv_chunk_size,
        target_num_items or 0, work_capacity or 0, int(causal),
    )
    if not handle:
        raise ValueError("fi_plan_create failed (bad args or capacity overflow)")
    try:
        sizes = _FiPlanSizes()
        lib.fi_plan_sizes(handle, ctypes.byref(sizes))
        T = sizes.num_work_items
        arrays = [np.empty(T, np.int32) for _ in range(10)]
        merge_out_row = np.empty(T * sizes.tile_q, np.int32)
        lib.fi_plan_export(
            handle, *[a.ctypes.data_as(_i32p) for a in arrays],
            merge_out_row.ctypes.data_as(_i32p),
        )
    finally:
        lib.fi_plan_destroy(handle)

    return AttentionPlan(
        tile_q=int(sizes.tile_q),
        kv_chunk_size=int(sizes.kv_chunk_size),
        num_work_items=int(T),
        total_rows=int(sizes.total_rows),
        batch_size=batch,
        page_size=page_size,
        request_indices=arrays[0],
        qo_tile_indices=arrays[1],
        kv_tile_indices=arrays[2],
        qo_start_row=arrays[3],
        qo_tile_len=arrays[4],
        kv_start=arrays[5],
        kv_end=arrays[6],
        kv_page_start=arrays[7],
        num_kv_splits=arrays[8],
        q_pos_base=arrays[9],
        gqa_group=gqa_group,
        merge_out_row=merge_out_row,
        num_valid_items=int(sizes.num_valid_items),
    )


class PagePool:
    """Paged-KV block allocator over the native runtime (csrc/page_pool.cc),
    with a pure-Python fallback.  Produces (kv_indptr, kv_indices,
    kv_last_page_len) batches for the attention planner."""

    def __init__(self, num_pages: int, page_size: int):
        self.num_pages = num_pages
        self.page_size = page_size
        self._lib = _lib()
        if self._lib is not None:
            self._pool = self._lib.fi_page_pool_create(num_pages, page_size)
            if not self._pool:
                raise ValueError("fi_page_pool_create failed")
        else:  # python fallback
            self._free = list(range(num_pages - 1, -1, -1))
            self._seqs: dict[int, Tuple[int, list]] = {}
            self._next = 0

    def __del__(self):
        lib = getattr(self, "_lib", None)
        pool = getattr(self, "_pool", None)
        if lib is not None and pool:
            lib.fi_page_pool_destroy(pool)
            self._pool = None

    @property
    def free_pages(self) -> int:
        if self._lib is not None:
            return self._lib.fi_page_pool_free_pages(self._pool)
        return len(self._free)

    def create(self) -> int:
        if self._lib is not None:
            return self._lib.fi_seq_create(self._pool)
        sid = self._next
        self._next += 1
        self._seqs[sid] = (0, [])
        return sid

    def extend(self, seq: int, new_len: int) -> bool:
        """Grow sequence to new_len tokens; False on OOM (state unchanged)."""
        if self._lib is not None:
            return self._lib.fi_seq_extend(self._pool, seq, new_len) == 0
        length, pages = self._seqs[seq]
        if new_len < length:
            return False
        need = -(-new_len // self.page_size) - len(pages)
        if need > len(self._free):
            return False
        for _ in range(need):
            pages.append(self._free.pop())
        self._seqs[seq] = (new_len, pages)
        return True

    def truncate(self, seq: int, new_len: int) -> None:
        """Shrink a sequence (spec-decode rollback); frees tail pages."""
        if self._lib is not None:
            rc = self._lib.fi_seq_truncate(self._pool, seq, new_len)
            assert rc == 0, (seq, new_len)
            return
        length, pages = self._seqs[seq]
        assert 0 <= new_len <= length, (new_len, length)
        need = -(-new_len // self.page_size)
        while len(pages) > need:
            self._free.append(pages.pop())
        self._seqs[seq] = (new_len, pages)

    def release(self, seq: int) -> None:
        if self._lib is not None:
            self._lib.fi_seq_release(self._pool, seq)
            return
        length, pages = self._seqs.pop(seq)
        self._free.extend(reversed(pages))

    def seq_len(self, seq: int) -> int:
        if self._lib is not None:
            return self._lib.fi_seq_len(self._pool, seq)
        return self._seqs[seq][0]

    def pages(self, seq: int) -> np.ndarray:
        if self._lib is not None:
            n = self._lib.fi_seq_num_pages(self._pool, seq)
            out = np.empty(n, np.int32)
            if n:
                self._lib.fi_seq_pages(self._pool, seq, out.ctypes.data_as(_i32p))
            return out
        return np.asarray(self._seqs[seq][1], np.int32)

    def batch_export(
        self, seqs: Sequence[int]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(kv_indptr, kv_indices, kv_last_page_len) for the given sequences."""
        seqs_arr = _as_i64(list(seqs))
        n = len(seqs_arr)
        if self._lib is not None:
            total = sum(
                self._lib.fi_seq_num_pages(self._pool, int(s)) for s in seqs_arr
            )
            indptr = np.empty(n + 1, np.int32)
            indices = np.empty(max(total, 1), np.int32)
            last = np.empty(max(n, 1), np.int32)
            self._lib.fi_batch_export(
                self._pool, _ptr64(seqs_arr), n,
                indptr.ctypes.data_as(_i32p), indices.ctypes.data_as(_i32p),
                last.ctypes.data_as(_i32p),
            )
            return indptr, indices[:total], last[:n]
        indptr = [0]
        indices: list = []
        last = []
        for s in seqs:
            length, pages = self._seqs[s]
            indices.extend(pages)
            indptr.append(len(indices))
            rem = length % self.page_size
            last.append(0 if length == 0 else (self.page_size if rem == 0 else rem))
        return (
            np.asarray(indptr, np.int32),
            np.asarray(indices, np.int32),
            np.asarray(last, np.int32),
        )
