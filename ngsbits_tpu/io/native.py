"""ctypes bindings for the native host decoder (native/ngshost.cpp).

Builds the shared library on first use (g++ + zlib, no external deps).
Falls back gracefully: callers check ``available()`` and use the pure-Python
paths if the toolchain is missing.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libngshost.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        res = subprocess.run(["make", "-C", str(_NATIVE_DIR)], capture_output=True, text=True)
        if res.returncode != 0:
            import sys
            print(f"ngshost build failed:\n{res.stderr}", file=sys.stderr)
            return False
        return True
    except OSError:
        return False


def get_lib():
    global _lib, _tried
    if os.environ.get("NGSHOST_DISABLE"):
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_mtime = max(s.stat().st_mtime
                        for s in (_NATIVE_DIR / "ngshost.cpp",
                                  _NATIVE_DIR / "seqpurge.cpp"))
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src_mtime:
            if not _build():
                return None
        try:
            lib = ct.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.ngs_bam_open.restype = ct.c_void_p
        lib.ngs_bam_open.argtypes = [ct.c_char_p, ct.c_int]
        lib.ngs_bam_error.restype = ct.c_char_p
        lib.ngs_bam_error.argtypes = [ct.c_void_p]
        lib.ngs_bam_ok.argtypes = [ct.c_void_p]
        lib.ngs_bam_close.argtypes = [ct.c_void_p]
        lib.ngs_bam_header_text_len.restype = ct.c_int64
        lib.ngs_bam_header_text_len.argtypes = [ct.c_void_p]
        lib.ngs_bam_header_text.argtypes = [ct.c_void_p, ct.c_char_p]
        lib.ngs_bam_n_refs.restype = ct.c_int32
        lib.ngs_bam_n_refs.argtypes = [ct.c_void_p]
        lib.ngs_bam_ref_name.restype = ct.c_int32
        lib.ngs_bam_ref_name.argtypes = [ct.c_void_p, ct.c_int32, ct.c_char_p, ct.c_int32]
        lib.ngs_bam_ref_len.restype = ct.c_int64
        lib.ngs_bam_ref_len.argtypes = [ct.c_void_p, ct.c_int32]
        lib.ngs_bam_voffset.restype = ct.c_int64
        lib.ngs_bam_voffset.argtypes = [ct.c_void_p]
        lib.ngs_bam_seek.restype = ct.c_int
        lib.ngs_bam_seek.argtypes = [ct.c_void_p, ct.c_int64]
        f = lib.ngs_bam_read_batch
        f.restype = ct.c_int64
        p = np.ctypeslib.ndpointer
        f.argtypes = [
            ct.c_void_p, ct.c_int64, ct.c_int64,
            p(np.int32, flags="C"), p(np.int32, flags="C"),
            p(np.uint16, flags="C"), p(np.uint8, flags="C"),
            p(np.int32, flags="C"), p(np.int32, flags="C"), p(np.int32, flags="C"),
            p(np.int32, flags="C"), p(np.int32, flags="C"),
            p(np.int32, flags="C"), p(np.int32, flags="C"),
            p(np.uint32, flags="C"), ct.c_int64,
            p(np.uint8, flags="C"), p(np.uint8, flags="C"),
            ct.c_char_p, ct.c_int64,
            p(np.uint8, flags="C"), ct.c_int64,
        ]
        for name in ["ngs_gz_open"]:
            getattr(lib, name).restype = ct.c_void_p
            getattr(lib, name).argtypes = [ct.c_char_p, ct.c_int]
        lib.ngs_gz_ok.argtypes = [ct.c_void_p]
        lib.ngs_gz_read.restype = ct.c_int64
        lib.ngs_gz_read.argtypes = [ct.c_void_p, p(np.uint8, flags="C"), ct.c_int64]
        lib.ngs_gz_close.argtypes = [ct.c_void_p]
        lib.ngs_gzw_open.restype = ct.c_void_p
        lib.ngs_gzw_open.argtypes = [ct.c_char_p, ct.c_int]
        lib.ngs_gzw_ok.argtypes = [ct.c_void_p]
        lib.ngs_gzw_write.restype = ct.c_int64
        lib.ngs_gzw_write.argtypes = [ct.c_void_p, ct.c_char_p, ct.c_int64]
        lib.ngs_gzw_close.argtypes = [ct.c_void_p]
        lib.ngs_fastq_open.restype = ct.c_void_p
        lib.ngs_fastq_open.argtypes = [ct.c_char_p, ct.c_int]
        lib.ngs_fastq_ok.argtypes = [ct.c_void_p]
        lib.ngs_fastq_error.restype = ct.c_char_p
        lib.ngs_fastq_error.argtypes = [ct.c_void_p]
        lib.ngs_fastq_close.argtypes = [ct.c_void_p]
        f = lib.ngs_fastq_read_batch
        f.restype = ct.c_int64
        f.argtypes = [
            ct.c_void_p, ct.c_int64,
            p(np.uint8, flags="C"), p(np.uint8, flags="C"), ct.c_int64,
            p(np.uint8, flags="C"), p(np.uint8, flags="C"), ct.c_int64,
            p(np.int32, flags="C"), p(np.int32, flags="C"),
            p(np.int32, flags="C"), p(np.int32, flags="C"),
        ]
        # zero-copy whole-buffer FASTQ scan (plain-gz whole-member mode)
        lib.ngs_fastq_whole_ready.restype = ct.c_int32
        lib.ngs_fastq_whole_ready.argtypes = [ct.c_void_p]
        lib.ngs_fastq_buf_ptr.restype = ct.c_void_p
        lib.ngs_fastq_buf_ptr.argtypes = [ct.c_void_p]
        lib.ngs_fastq_buf_size.restype = ct.c_int64
        lib.ngs_fastq_buf_size.argtypes = [ct.c_void_p]
        f = lib.ngs_fastq_scan_batch
        f.restype = ct.c_int64
        f.argtypes = [
            ct.c_void_p, ct.c_int64,
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),
            p(np.int32, flags="C_CONTIGUOUS,WRITEABLE"),
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),
            p(np.int32, flags="C_CONTIGUOUS,WRITEABLE"),
            ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p,
        ]
        lib.ngs_pad_gather.restype = ct.c_int32
        lib.ngs_pad_gather.argtypes = [
            ct.c_void_p, p(np.int64, flags="C"), p(np.int32, flags="C"),
            ct.c_int64, ct.c_int64,
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE"),
            ct.c_int32, ct.c_int32,
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE")]
        lib.ngs_pack_batch.restype = None
        lib.ngs_pack_batch.argtypes = [
            p(np.uint8, flags="C"), p(np.uint8, flags="C"),
            ct.c_int64, ct.c_int64,
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE"),
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE"),
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE")]
        lib.ngs_validate_rows.restype = ct.c_int32
        lib.ngs_validate_rows.argtypes = [
            ct.c_void_p, p(np.int64, flags="C"), p(np.int32, flags="C"),
            ct.c_int64, ct.c_int32, ct.c_int32,
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE")]
        lib.ngs_bgzf_block.restype = ct.c_int64
        lib.ngs_bgzf_block.argtypes = [
            p(np.uint8, flags="C"), ct.c_int64, ct.c_int32,
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE"), ct.c_int64]
        lib.ngs_gzip_member.restype = ct.c_int64
        lib.ngs_gzip_member.argtypes = [
            p(np.uint8, flags="C"), ct.c_int64, ct.c_int32,
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE"), ct.c_int64]
        lib.ngs_readqc_batch.restype = None
        lib.ngs_readqc_batch.argtypes = [
            p(np.uint8, flags="C"), p(np.uint8, flags="C"),
            p(np.int32, flags="C"), ct.c_int64, ct.c_int64,
            p(np.int32, flags="C_CONTIGUOUS,WRITEABLE"),
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),
            p(np.int32, flags="C_CONTIGUOUS,WRITEABLE")]
        lib.ngs_pad_flat.restype = None
        lib.ngs_pad_flat.argtypes = [
            p(np.uint8, flags="C"), p(np.int32, flags="C"),
            ct.c_int64, ct.c_int64, p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE")]
        lib.ngs_validate_batch.restype = ct.c_int32
        lib.ngs_validate_batch.argtypes = [
            p(np.uint8, flags="C"), p(np.uint8, flags="C"),
            p(np.int32, flags="C"), p(np.int32, flags="C"),
            ct.c_int64, ct.c_int64, ct.c_int32,
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE")]
        lib.ngs_headers_match.restype = ct.c_int64
        lib.ngs_headers_match.argtypes = [
            p(np.uint8, flags="C"), p(np.int64, flags="C"), p(np.int32, flags="C"),
            p(np.uint8, flags="C"), p(np.int64, flags="C"), p(np.int32, flags="C"),
            ct.c_int64]
        lib.ngs_fastq_format.restype = ct.c_int64
        lib.ngs_fastq_format.argtypes = [
            p(np.uint8, flags="C"), p(np.uint8, flags="C"),
            ct.c_int64, ct.c_int64,
            p(np.int32, flags="C"), p(np.int32, flags="C"),
            p(np.uint8, flags="C"), p(np.int64, flags="C"), p(np.int32, flags="C"),
            p(np.uint8, flags="C"), p(np.int64, flags="C"), p(np.int32, flags="C"),
            ct.c_void_p,
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE"), ct.c_int64]
        f = lib.ngs_seqpurge_analyze
        f.restype = ct.c_int32
        f.argtypes = [
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE"),  # bases1
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE"),  # quals1
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE"),  # bases2
            p(np.uint8, flags="C_CONTIGUOUS,WRITEABLE"),  # quals2
            p(np.int32, flags="C"), p(np.int32, flags="C"),  # len1, len2
            ct.c_int64, ct.c_int64,                          # B, L
            p(np.float64, flags="C"), ct.c_int64,            # table, tstride
            p(np.uint8, flags="C"), p(np.uint8, flags="C"),  # a1, a2
            ct.c_int32, ct.c_int32,                          # overlap, a_size
            ct.c_double, ct.c_double,                        # match_perc, mep
            ct.c_int32, ct.c_int32, ct.c_int32, ct.c_int32,  # qcut qwin qoff ncut
            ct.c_int32, ct.c_int32,                          # ec, n_threads
            p(np.int32, flags="C_CONTIGUOUS,WRITEABLE"),     # best_offset
            p(np.int32, flags="C_CONTIGUOUS,WRITEABLE"),     # out_len1
            p(np.int32, flags="C_CONTIGUOUS,WRITEABLE"),     # out_len2
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),     # counters[4]
            p(np.float64, flags="C_CONTIGUOUS,WRITEABLE"),   # perc_trim_sum[1]
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),     # bases_remaining
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),     # acons1
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),     # acons2
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),     # mismatch_r1
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),     # mismatch_r2
            p(np.int64, flags="C_CONTIGUOUS,WRITEABLE"),     # errors_per_read
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None
