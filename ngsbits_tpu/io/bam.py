"""BAM reader producing columnar record batches.

Behavioral reference: ngs-bits ``BamReader``/``BamAlignment``
(cppNGS/BamReader.h: flags, CIGAR, bases as 4-bit ints A=1,C=2,G=4,T=8,N=15,
region iteration, genome-build detection by chr1 length). Decoding is done by
the native library (native/ngshost.cpp) when available, else a pure-Python
BGZF+record parser (identical output, used as cross-check in tests).

TPU-first design: no per-record objects on the hot path — a ``BamBatch``
holds numpy columns (fixed fields) plus flat variable buffers with offset
vectors, which feed vectorized host logic and device kernels directly.
"""

from __future__ import annotations

import ctypes as ct
import gzip
import struct
import zlib
from dataclasses import dataclass

import numpy as np

from . import native

# BAM flags (SAM spec)
FLAG_PAIRED = 0x1
FLAG_PROPER_PAIR = 0x2
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_REVERSE = 0x10
FLAG_MATE_REVERSE = 0x20
FLAG_READ1 = 0x40
FLAG_READ2 = 0x80
FLAG_SECONDARY = 0x100
FLAG_QC_FAIL = 0x200
FLAG_DUPLICATE = 0x400
FLAG_SUPPLEMENTARY = 0x800

# CIGAR ops
CIGAR_M, CIGAR_I, CIGAR_D, CIGAR_N, CIGAR_S, CIGAR_H, CIGAR_P, CIGAR_EQ, CIGAR_X = range(9)
CIGAR_CHARS = "MIDNSHP=X"

# 4-bit base code -> ASCII (16 entries, SAM nibble encoding)
SEQ_NIBBLE_ASCII = np.frombuffer(b"=ACMGRSVTWYHKDBN", dtype=np.uint8)
# consumes-query / consumes-reference per CIGAR op
CIGAR_CONSUMES_QUERY = np.array([1, 1, 0, 0, 1, 0, 0, 1, 1], dtype=np.int64)
CIGAR_CONSUMES_REF = np.array([1, 0, 1, 1, 0, 0, 0, 1, 1], dtype=np.int64)


@dataclass
class BamBatch:
    ref_id: np.ndarray      # int32 [N]
    pos: np.ndarray         # int32 [N] 0-based leftmost
    flag: np.ndarray        # uint16 [N]
    mapq: np.ndarray        # uint8 [N]
    l_seq: np.ndarray       # int32 [N]
    n_cigar: np.ndarray     # int32 [N]
    tlen: np.ndarray        # int32 [N] template length (insert size)
    mate_ref_id: np.ndarray # int32 [N]
    mate_pos: np.ndarray    # int32 [N]
    cigar: np.ndarray       # uint32 flat (len<<4|op)
    cigar_off: np.ndarray   # int64 [N+1]
    seq: np.ndarray         # uint8 flat, 4-bit codes (1/byte)
    qual: np.ndarray        # uint8 flat (same offsets as seq)
    seq_off: np.ndarray     # int64 [N+1]
    names: bytes            # flat name bytes
    name_off: np.ndarray    # int64 [N+1]
    tags: np.ndarray        # uint8 flat raw tag bytes
    tags_off: np.ndarray    # int64 [N+1]

    def __len__(self):
        return len(self.ref_id)

    def name(self, i: int) -> bytes:
        return self.names[self.name_off[i]:self.name_off[i + 1]]

    def cigar_of(self, i: int) -> np.ndarray:
        return self.cigar[self.cigar_off[i]:self.cigar_off[i + 1]]

    def seq_of(self, i: int) -> np.ndarray:
        return self.seq[self.seq_off[i]:self.seq_off[i + 1]]

    def qual_of(self, i: int) -> np.ndarray:
        return self.qual[self.seq_off[i]:self.seq_off[i + 1]]

    def end_positions(self) -> np.ndarray:
        """0-based exclusive end position on the reference for each record
        (pos + sum of ref-consuming CIGAR lengths)."""
        lens = (self.cigar >> 4).astype(np.int64)
        ops = (self.cigar & 0xF).astype(np.int64)
        ref_consume = lens * CIGAR_CONSUMES_REF[ops]
        cs = np.concatenate(([0], np.cumsum(ref_consume)))
        per_read = cs[self.cigar_off[1:]] - cs[self.cigar_off[:-1]]
        return self.pos.astype(np.int64) + per_read

    def subset(self, sel) -> "BamBatch":
        """New batch with the selected records (mask or index array)."""
        idx = np.flatnonzero(sel) if np.asarray(sel).dtype == bool else np.asarray(sel)

        def gather_of(off):
            lens = off[idx + 1] - off[idx]
            new_off = np.zeros(len(idx) + 1, dtype=np.int64)
            np.cumsum(lens, out=new_off[1:])
            total = int(new_off[-1])
            gather = np.repeat(off[idx], lens) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(new_off[:-1], lens))
            return gather, new_off

        cg, cigar_off = gather_of(self.cigar_off)
        cigar = self.cigar[cg]
        sg, seq_off = gather_of(self.seq_off)   # shared by seq and qual
        seq = self.seq[sg]
        qual = self.qual[sg]
        ng, name_off = gather_of(self.name_off)
        names = np.frombuffer(self.names, dtype=np.uint8)[ng]
        tg, tags_off = gather_of(self.tags_off)
        tags = self.tags[tg]
        return BamBatch(
            ref_id=self.ref_id[idx], pos=self.pos[idx], flag=self.flag[idx],
            mapq=self.mapq[idx], l_seq=self.l_seq[idx],
            n_cigar=self.n_cigar[idx], tlen=self.tlen[idx],
            mate_ref_id=self.mate_ref_id[idx], mate_pos=self.mate_pos[idx],
            cigar=cigar.astype(np.uint32), cigar_off=cigar_off,
            seq=seq, qual=qual, seq_off=seq_off,
            names=names.tobytes(), name_off=name_off,
            tags=tags, tags_off=tags_off)


class BamReader:
    def __new__(cls, filename: str, n_threads: int = 4,
                batch_records: int = 1 << 16, ref: str | None = None):
        # CRAM files are handled by the CRAM 3.0 decoder (io/cram.py), which
        # exposes the same batch interface (BamReader.h handles both formats
        # transparently through htslib in the reference); remote CRAM
        # fetches here, before the dispatch (__init__ handles remote BAM)
        name = str(filename)
        if name.split("?", 1)[0].endswith(".cram"):
            from .cram import CramReader
            from .versatile import is_remote, local_path
            if is_remote(name):
                name = local_path(name)
            if ref is None:
                from ..core import settings
                ref = settings.reference_genome() or None
            return CramReader(name, ref=ref, batch_records=batch_records)
        return super().__new__(cls)

    def __init__(self, filename: str, n_threads: int = 4,
                 batch_records: int = 1 << 16, ref: str | None = None):
        from .versatile import is_remote, local_path
        if is_remote(str(filename)):
            # VersatileFile parity: remote BAM/CRAM inputs fetch once and
            # open locally (BAI sibling too, so random access works)
            filename = local_path(filename)
        self.filename = filename
        self.batch_records = batch_records
        self._lib = native.get_lib()
        self._native = None
        self._py = None
        if self._lib is not None:
            h = self._lib.ngs_bam_open(filename.encode(), n_threads)
            if not self._lib.ngs_bam_ok(h):
                err = self._lib.ngs_bam_error(h).decode()
                self._lib.ngs_bam_close(h)
                raise IOError(f"Could not open BAM file '{filename}': {err}")
            self._native = h
            n = self._lib.ngs_bam_n_refs(h)
            self.ref_names = []
            buf = ct.create_string_buffer(4096)
            for i in range(n):
                ln = self._lib.ngs_bam_ref_name(h, i, buf, 4096)
                self.ref_names.append(buf.raw[:ln].decode())
            self.ref_lengths = [self._lib.ngs_bam_ref_len(h, i) for i in range(n)]
            tl = self._lib.ngs_bam_header_text_len(h)
            tbuf = ct.create_string_buffer(tl)
            self._lib.ngs_bam_header_text(h, tbuf)
            self.header_text = tbuf.raw[:tl].decode(errors="replace")
        else:
            self._py = _PyBam(filename)
            self.ref_names = self._py.ref_names
            self.ref_lengths = self._py.ref_lengths
            self.header_text = self._py.header_text

    def close(self):
        if self._native is not None:
            self._lib.ngs_bam_close(self._native)
            self._native = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def seek_voffset(self, voffset: int):
        if self._native is not None:
            if not self._lib.ngs_bam_seek(self._native, voffset):
                raise IOError(f"BAM seek failed: {self._lib.ngs_bam_error(self._native).decode()}")
        else:
            self._py.seek_voffset(voffset)

    def read_batch(self, max_records: int | None = None) -> BamBatch | None:
        """Read the next batch of records; None at EOF."""
        max_records = max_records or self.batch_records
        if self._native is not None:
            return self._read_batch_native(max_records)
        return self._py.read_batch(max_records)

    def __iter__(self):
        while True:
            b = self.read_batch()
            if b is None:
                return
            yield b

    def region_batches(self, chr_, start: int, end: int):
        """Yield (batch, overlap_mask) for records overlapping
        chr:start-end (1-based inclusive) — the BamReader::setRegion +
        getNextAlignment analogue (BamReader.h:383-398). Seeks via the BAI
        when one exists next to the file, else scans from the current
        position; the BAM must be coordinate-sorted (the scan stops once
        records start past the region end)."""
        from ..core.chromosome import Chromosome
        from .bai import BaiIndex, find_index

        want = chr_ if isinstance(chr_, Chromosome) else Chromosome(chr_)
        rid = -1
        for i, nm in enumerate(self.ref_names):
            if Chromosome(nm) == want:
                rid = i
                break
        if rid < 0:
            return
        beg0 = max(0, start - 1)
        end0 = end - 1
        bai = getattr(self, "_bai_cache", None)
        if bai is None:
            idx_path = find_index(self.filename)
            if idx_path is not None:
                import struct as _struct
                try:
                    bai = BaiIndex(idx_path)
                except (OSError, ValueError, _struct.error, IndexError):
                    bai = False   # unreadable index
            else:
                bai = False
            self._bai_cache = bai
        source = self
        if bai:
            voff = bai.min_voffset(rid, beg0, end)
            if voff is None:
                return
            self.seek_voffset(voff)
        else:
            # no usable index: full filtered scan on a fresh cursor (the
            # caller's reader position is unknown and BAM order may differ
            # from chromosome-number order)
            source = BamReader(self.filename,
                               batch_records=self.batch_records)
        try:
            while True:
                batch = source.read_batch()
                if batch is None:
                    return
                pos0 = batch.pos.astype(np.int64)
                ends0x = batch.end_positions()
                on = (batch.ref_id == rid) & (pos0 <= end0) & (ends0x > beg0)
                if on.any():
                    yield batch, on
                # early stop: sorted records are past the region (valid for
                # the seeked cursor and for the fresh full scan — ref_id is
                # nondecreasing in a coordinate-sorted BAM)
                if ((batch.ref_id > rid)
                        | ((batch.ref_id == rid) & (pos0 > end0))).any():
                    return
        finally:
            if source is not self:
                source.close()

    def _read_batch_native(self, max_records: int) -> BamBatch | None:
        lib = self._lib
        h = self._native
        var_cap = max_records * 512
        cigar_cap = max_records * 64
        name_cap = max_records * 64
        tags_cap = max_records * 512
        ref_id = np.empty(max_records, np.int32)
        pos = np.empty(max_records, np.int32)
        flag = np.empty(max_records, np.uint16)
        mapq = np.empty(max_records, np.uint8)
        l_seq = np.empty(max_records, np.int32)
        n_cigar = np.empty(max_records, np.int32)
        tlen = np.empty(max_records, np.int32)
        mate_ref = np.empty(max_records, np.int32)
        mate_pos = np.empty(max_records, np.int32)
        name_len = np.empty(max_records, np.int32)
        tags_len = np.empty(max_records, np.int32)
        cigar_buf = np.empty(cigar_cap, np.uint32)
        seq_buf = np.empty(var_cap, np.uint8)
        qual_buf = np.empty(var_cap, np.uint8)
        name_buf = ct.create_string_buffer(name_cap)
        tags_buf = np.empty(tags_cap, np.uint8)
        n = lib.ngs_bam_read_batch(
            h, max_records, var_cap,
            ref_id, pos, flag, mapq, l_seq, n_cigar, tlen, mate_ref, mate_pos,
            name_len, tags_len,
            cigar_buf, cigar_cap, seq_buf, qual_buf,
            name_buf, name_cap, tags_buf, tags_cap)
        if n < 0:
            raise IOError(f"BAM read failed: {lib.ngs_bam_error(h).decode()}")
        if n == 0:
            return None
        n = int(n)
        cig_off = np.concatenate(([0], np.cumsum(n_cigar[:n], dtype=np.int64)))
        seq_off = np.concatenate(([0], np.cumsum(l_seq[:n], dtype=np.int64)))
        name_off = np.concatenate(([0], np.cumsum(name_len[:n], dtype=np.int64)))
        tags_off = np.concatenate(([0], np.cumsum(tags_len[:n], dtype=np.int64)))
        return BamBatch(
            ref_id=ref_id[:n].copy(), pos=pos[:n].copy(), flag=flag[:n].copy(),
            mapq=mapq[:n].copy(), l_seq=l_seq[:n].copy(), n_cigar=n_cigar[:n].copy(),
            tlen=tlen[:n].copy(), mate_ref_id=mate_ref[:n].copy(), mate_pos=mate_pos[:n].copy(),
            cigar=cigar_buf[:cig_off[-1]].copy(), cigar_off=cig_off,
            seq=seq_buf[:seq_off[-1]].copy(), qual=qual_buf[:seq_off[-1]].copy(),
            seq_off=seq_off,
            names=name_buf.raw[:name_off[-1]], name_off=name_off,
            tags=tags_buf[:tags_off[-1]].copy(), tags_off=tags_off)

    # ---- convenience ----
    def build_from_chr1(self) -> str:
        """Genome build detection like BamReader.h:378 (by chr1 length)."""
        for name, length in zip(self.ref_names, self.ref_lengths):
            if name in ("chr1", "1"):
                if length == 249250621:
                    return "hg19"
                if length == 248956422:
                    return "hg38"
        return "n/a"


class _PyBam:
    """Pure-Python BGZF+BAM fallback (and cross-check) implementation."""

    def __init__(self, filename: str):
        self.filename = filename
        self.fh = open(filename, "rb")
        self._buf = b""
        self._buf_pos = 0
        self._spans = []  # (ustart, coffset)
        self._eof = False
        magic = self._read(4)
        if magic != b"BAM\x01":
            raise IOError(f"Could not open BAM file '{filename}': not a BAM file")
        l_text = struct.unpack("<i", self._read(4))[0]
        self.header_text = self._read(l_text).decode(errors="replace")
        n_ref = struct.unpack("<i", self._read(4))[0]
        self.ref_names = []
        self.ref_lengths = []
        for _ in range(n_ref):
            l_name = struct.unpack("<i", self._read(4))[0]
            self.ref_names.append(self._read(l_name)[:-1].decode())
            self.ref_lengths.append(struct.unpack("<i", self._read(4))[0])

    def _read_block(self):
        coff = self.fh.tell()
        hdr = self.fh.read(12)
        if len(hdr) < 12:
            self._eof = True
            return
        xlen = struct.unpack("<H", hdr[10:12])[0]
        extra = self.fh.read(xlen)
        bsize = None
        p = 0
        while p + 4 <= len(extra):
            si1, si2, slen = extra[p], extra[p + 1], struct.unpack("<H", extra[p + 2:p + 4])[0]
            if si1 == ord("B") and si2 == ord("C") and slen == 2:
                bsize = struct.unpack("<H", extra[p + 4:p + 6])[0] + 1
            p += 4 + slen
        cdata = self.fh.read(bsize - 12 - xlen - 8)
        self.fh.read(8)
        data = zlib.decompress(cdata, -15)
        if data:
            keep = self._buf[self._buf_pos:]
            self._spans = [(us - self._buf_pos, co) for us, co in self._spans if us >= self._buf_pos]
            self._spans.append((len(keep), coff))
            self._buf = keep + data
            self._buf_pos = 0

    def _read(self, n: int) -> bytes:
        while len(self._buf) - self._buf_pos < n and not self._eof:
            self._read_block()
        data = self._buf[self._buf_pos:self._buf_pos + n]
        self._buf_pos += n
        return data

    def _available(self) -> int:
        return len(self._buf) - self._buf_pos

    def seek_voffset(self, voffset: int):
        coff = voffset >> 16
        uoff = voffset & 0xFFFF
        self.fh.seek(coff)
        self._buf = b""
        self._buf_pos = 0
        self._spans = []
        self._eof = False
        self._read_block()
        self._buf_pos = uoff

    def read_batch(self, max_records: int) -> BamBatch | None:
        recs = []
        while len(recs) < max_records:
            while self._available() < 4 and not self._eof:
                self._read_block()
            if self._available() < 4:
                break
            block_size = struct.unpack("<I", self._read(4))[0]
            data = self._read(block_size)
            recs.append(data)
        if not recs:
            return None
        n = len(recs)
        ref_id = np.empty(n, np.int32); pos = np.empty(n, np.int32)
        flag = np.empty(n, np.uint16); mapq = np.empty(n, np.uint8)
        l_seq = np.empty(n, np.int32); n_cigar = np.empty(n, np.int32)
        tlen = np.empty(n, np.int32); mate_ref = np.empty(n, np.int32)
        mate_pos = np.empty(n, np.int32)
        cig_parts, seq_parts, qual_parts, name_parts, tag_parts = [], [], [], [], []
        for i, d in enumerate(recs):
            (rid, rpos, lrn, mq, _bin, ncig, flg, lseq, mrid, mpos, tl) = struct.unpack("<iiBBHHHIiii", d[:32])
            ref_id[i] = rid; pos[i] = rpos; flag[i] = flg; mapq[i] = mq
            l_seq[i] = lseq; n_cigar[i] = ncig; tlen[i] = tl
            mate_ref[i] = mrid; mate_pos[i] = mpos
            off = 32
            name_parts.append(d[off:off + lrn - 1]); off += lrn
            cig_parts.append(np.frombuffer(d[off:off + 4 * ncig], dtype=np.uint32)); off += 4 * ncig
            packed = np.frombuffer(d[off:off + (lseq + 1) // 2], dtype=np.uint8)
            off += (lseq + 1) // 2
            un = np.empty(2 * len(packed), np.uint8)
            un[0::2] = packed >> 4
            un[1::2] = packed & 0xF
            seq_parts.append(un[:lseq])
            qual_parts.append(np.frombuffer(d[off:off + lseq], dtype=np.uint8)); off += lseq
            tag_parts.append(np.frombuffer(d[off:], dtype=np.uint8))
        cig_off = np.concatenate(([0], np.cumsum(n_cigar, dtype=np.int64)))
        seq_off = np.concatenate(([0], np.cumsum(l_seq, dtype=np.int64)))
        name_off = np.concatenate(([0], np.cumsum([len(x) for x in name_parts], dtype=np.int64)))
        tags_off = np.concatenate(([0], np.cumsum([len(x) for x in tag_parts], dtype=np.int64)))
        return BamBatch(
            ref_id=ref_id, pos=pos, flag=flag, mapq=mapq, l_seq=l_seq,
            n_cigar=n_cigar, tlen=tlen, mate_ref_id=mate_ref, mate_pos=mate_pos,
            cigar=np.concatenate(cig_parts) if cig_parts else np.empty(0, np.uint32),
            cigar_off=cig_off,
            seq=np.concatenate(seq_parts) if seq_parts else np.empty(0, np.uint8),
            qual=np.concatenate(qual_parts) if qual_parts else np.empty(0, np.uint8),
            seq_off=seq_off,
            names=b"".join(name_parts), name_off=name_off,
            tags=np.concatenate(tag_parts) if tag_parts else np.empty(0, np.uint8),
            tags_off=tags_off)


def _reg2bin(beg: int, end: int) -> int:
    """SAM spec reg2bin (0-based, end exclusive)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


_SEQ_PACK = {c: i for i, c in enumerate(b"=ACMGRSVTWYHKDBN")}


class BamWriter:
    """BAM writer (BGZF blocks, records re-encoded from BamBatch columns).
    Writes CRAM instead when the file name ends '.cram' (BamWriter.h:13)."""

    def __new__(cls, filename: str, reader: "BamReader"):
        if str(filename).endswith(".cram"):
            from .cram_write import CramWriter
            return CramWriter(str(filename), reader)
        return super().__new__(cls)

    def __init__(self, filename: str, reader: "BamReader"):
        from .bgzf import _one_block, _EOF_BLOCK
        self._one_block = _one_block
        self._eof = _EOF_BLOCK
        self._fh = open(filename, "wb")
        self._buf = bytearray()
        # header
        text = reader.header_text.encode()
        parts = [b"BAM\x01", struct.pack("<i", len(text)), text,
                 struct.pack("<i", len(reader.ref_names))]
        for name, length in zip(reader.ref_names, reader.ref_lengths):
            nb = name.encode() + b"\x00"
            parts.append(struct.pack("<i", len(nb)))
            parts.append(nb)
            parts.append(struct.pack("<i", int(length)))
        self._write(b"".join(parts))

    def _write(self, data: bytes):
        self._buf += data
        while len(self._buf) >= 0xFF00:
            self._fh.write(self._one_block(bytes(self._buf[:0xFF00]), 6))
            del self._buf[:0xFF00]

    def write_records(self, batch: BamBatch, keep=None):
        idx = range(len(batch)) if keep is None else np.flatnonzero(keep)
        ends = batch.end_positions()
        out = []
        for i in idx:
            i = int(i)
            name = batch.name(i) + b"\x00"
            cig = batch.cigar[batch.cigar_off[i]:batch.cigar_off[i + 1]]
            seq_codes = batch.seq[batch.seq_off[i]:batch.seq_off[i + 1]]
            qual = batch.qual[batch.seq_off[i]:batch.seq_off[i + 1]]
            tags = batch.tags[batch.tags_off[i]:batch.tags_off[i + 1]]
            lseq = len(seq_codes)
            packed = np.zeros((lseq + 1) // 2, dtype=np.uint8)
            if lseq:
                packed[:] = seq_codes[0::2] << 4
                if lseq > 1:
                    packed[:len(seq_codes[1::2])] |= seq_codes[1::2]
            pos = int(batch.pos[i])
            if (batch.flag[i] & FLAG_UNMAPPED) == 0 and pos >= 0:
                bin_ = _reg2bin(pos, int(ends[i]))
            else:
                bin_ = _reg2bin(pos, pos + 1) if pos >= 0 else 4680
            rec = struct.pack("<iiBBHHHIiii", int(batch.ref_id[i]), pos,
                              len(name), int(batch.mapq[i]), bin_,
                              int(batch.n_cigar[i]), int(batch.flag[i]), lseq,
                              int(batch.mate_ref_id[i]), int(batch.mate_pos[i]),
                              int(batch.tlen[i]))
            body = rec + name + cig.tobytes() + packed.tobytes() + qual.tobytes() + tags.tobytes()
            out.append(struct.pack("<I", len(body)))
            out.append(body)
        self._write(b"".join(out))

    def close(self):
        if self._buf:
            self._fh.write(self._one_block(bytes(self._buf), 6))
            self._buf = bytearray()
        self._fh.write(self._eof)
        self._fh.close()


def batch_to_sam_text(batch: BamBatch, ref_names) -> list:
    """SAM-like text lines for semantic BAM comparison (BAM_TO_TEXT analogue)."""
    out = []
    for i in range(len(batch)):
        cig = batch.cigar_of(i)
        cigar_str = "".join(f"{int(c) >> 4}{CIGAR_CHARS[c & 0xF]}" for c in cig) or "*"
        seq = bytes(SEQ_NIBBLE_ASCII[c] for c in batch.seq_of(i).tolist()).decode() or "*"
        qual = bytes((q + 33) if q != 0xFF else ord("*") for q in batch.qual_of(i).tolist()).decode() or "*"
        rid = batch.ref_id[i]
        mrid = batch.mate_ref_id[i]
        out.append("\t".join([
            batch.name(i).decode(),
            str(int(batch.flag[i])),
            ref_names[rid] if rid >= 0 else "*",
            str(int(batch.pos[i]) + 1),
            str(int(batch.mapq[i])),
            cigar_str,
            ref_names[mrid] if mrid >= 0 else "*",
            str(int(batch.mate_pos[i]) + 1),
            str(int(batch.tlen[i])),
            seq, qual]))
    return out


class BamRecord:
    """Mutable single-record view for read-modify-write tools
    (BamClipOverlap etc.). Fields mirror the BAM record layout; seq is
    stored as 4-bit codes like BamBatch."""

    __slots__ = ("ref_id", "pos", "mapq", "flag", "mate_ref_id", "mate_pos",
                 "tlen", "name", "cigar", "seq", "qual", "tags")

    @staticmethod
    def from_batch(batch: BamBatch, i: int) -> "BamRecord":
        r = BamRecord()
        r.ref_id = int(batch.ref_id[i])
        r.pos = int(batch.pos[i])
        r.mapq = int(batch.mapq[i])
        r.flag = int(batch.flag[i])
        r.mate_ref_id = int(batch.mate_ref_id[i])
        r.mate_pos = int(batch.mate_pos[i])
        r.tlen = int(batch.tlen[i])
        r.name = batch.name(i)
        r.cigar = batch.cigar[batch.cigar_off[i]:batch.cigar_off[i + 1]].copy()
        r.seq = batch.seq[batch.seq_off[i]:batch.seq_off[i + 1]].copy()
        r.qual = batch.qual[batch.seq_off[i]:batch.seq_off[i + 1]].copy()
        r.tags = bytes(batch.tags[batch.tags_off[i]:batch.tags_off[i + 1]])
        return r

    # 1-based start (BamAlignment::start)
    def start(self) -> int:
        return self.pos + 1

    def end(self) -> int:
        """1-based inclusive end (sum of ref-consuming CIGAR ops)."""
        ops = self.cigar & 0xF
        lens = self.cigar >> 4
        span = int((lens * CIGAR_CONSUMES_REF[ops]).sum())
        return self.pos + span

    def length(self) -> int:
        return len(self.seq)

    def cigar_string(self, expanded: bool = False) -> bytes:
        parts = []
        for c in self.cigar:
            n = int(c) >> 4
            ch = CIGAR_CHARS[int(c) & 0xF].encode()
            parts.append(ch * n if expanded else str(n).encode() + ch)
        return b"".join(parts)

    def bases(self) -> bytes:
        return SEQ_NIBBLE_ASCII[self.seq].tobytes()

    def qualities_ascii(self) -> bytes:
        return bytes((int(q) + 33) for q in self.qual)

    def is_only_insertion(self) -> bool:
        ops = self.cigar & 0xF
        return len(ops) > 0 and bool((CIGAR_CONSUMES_REF[ops] == 0).all())

    def add_tag(self, tag: bytes, type_char: bytes, value: bytes):
        self.tags = self.tags + tag + type_char + value + b"\x00"


def write_record(writer: "BamWriter", r: BamRecord):
    """Append one BamRecord through a BamWriter (or CramWriter)."""
    if hasattr(writer, "write_bam_record"):
        writer.write_bam_record(r)
        return
    name = r.name + b"\x00"
    lseq = len(r.seq)
    packed = np.zeros((lseq + 1) // 2, dtype=np.uint8)
    if lseq:
        packed[:] = r.seq[0::2] << 4
        if lseq > 1:
            packed[:len(r.seq[1::2])] |= r.seq[1::2]
    if (r.flag & FLAG_UNMAPPED) == 0 and r.pos >= 0:
        bin_ = _reg2bin(r.pos, r.end())
    else:
        bin_ = _reg2bin(r.pos, r.pos + 1) if r.pos >= 0 else 4680
    rec = struct.pack("<iiBBHHHIiii", r.ref_id, r.pos, len(name), r.mapq, bin_,
                      len(r.cigar), r.flag, lseq, r.mate_ref_id, r.mate_pos,
                      r.tlen)
    body = (rec + name + r.cigar.astype("<u4").tobytes() + packed.tobytes()
            + r.qual.tobytes() + r.tags)
    writer._write(struct.pack("<I", len(body)) + body)
