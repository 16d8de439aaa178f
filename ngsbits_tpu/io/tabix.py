"""Tabix-indexed random access into bgzipped text files (BED.GZ, VCF.GZ).

Behavioral reference: ngs-bits cppNGS/TabixIndexedFile.{h,cpp} (htslib tbx
wrapper; getMatchingLines(chr, start, end, ignore_missing_chr) returns lines
overlapping a 1-based region). This is a from-scratch reader of the TBI
index format (SAM spec §5.1.3/tabix paper) — no htslib.
"""

from __future__ import annotations

import struct
import zlib

from ..core.chromosome import Chromosome


class TabixError(Exception):
    pass


def _bgzf_block_at(fh, coffset: int):
    """Decompress the BGZF block starting at compressed offset; returns
    (data, next_coffset)."""
    fh.seek(coffset)
    header = fh.read(18)
    if len(header) < 18:
        return b"", coffset
    if header[:2] != b"\x1f\x8b":
        raise TabixError("not a BGZF block")
    xlen = struct.unpack("<H", header[10:12])[0]
    extra = header[12:18] + fh.read(xlen - 6)
    bsize = None
    off = 0
    while off + 4 <= len(extra):
        si1, si2, slen = extra[off], extra[off + 1], struct.unpack("<H", extra[off + 2:off + 4])[0]
        if si1 == 66 and si2 == 67:
            bsize = struct.unpack("<H", extra[off + 4:off + 6])[0] + 1
            break
        off += 4 + slen
    if bsize is None:
        raise TabixError("BGZF BC subfield missing")
    cdata = fh.read(bsize - 12 - xlen)  # rest of block incl. crc/isize
    data = zlib.decompress(cdata[:-8], -15)
    return data, coffset + bsize


def _reg2bins(beg: int, end: int) -> list:
    """TBI binning scheme (min_shift=14, depth=5)."""
    bins = [0]
    end -= 1
    for shift, offset in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(offset + (beg >> shift), offset + (end >> shift) + 1))
    return bins


class TabixIndexedFile:
    """Random access via a .tbi (or .csi) index; 1-based overlap queries.

    The data file handle is per-(process, thread): seek-based chunk scans
    would race on a shared fd across worker threads or forked chunk
    workers (VcfAnnotateFromVcf -threads), so each gets its own."""

    def __init__(self, filename: str | None = None):
        self._local = None
        self._chr2id = {}
        if filename:
            self.load(filename)

    @property
    def _fh(self):
        import os as _os
        import threading as _threading
        if self._local is None or self._local_pid != _os.getpid():
            self._local = _threading.local()
            self._local_pid = _os.getpid()
        fh = getattr(self._local, "fh", None)
        if fh is None:
            fh = open(self.filename, "rb")
            self._local.fh = fh
        return fh

    def load(self, filename: str):
        display = str(filename)
        from .versatile import is_remote, local_path
        if is_remote(display):
            # VersatileFile parity: remote tabix sources fetch once (the
            # .tbi/.csi sibling comes along for the index)
            filename = local_path(filename)
        self.filename = str(filename)
        import os
        idx = self.filename + ".csi"
        if not os.path.exists(idx):
            idx = self.filename + ".tbi"
        if not os.path.exists(idx):
            raise TabixError(f"Could not determine tabix index of file {display}")
        self.filename_index = idx
        with open(idx, "rb") as fh:
            raw = b""
            coff = 0
            while True:
                block, coff = _bgzf_block_at(fh, coff)
                if not block:
                    break
                raw += block
        if raw[:4] == b"TBI\x01":
            self._parse_tbi(raw)
        elif raw[:4] == b"CSI\x01":
            self._parse_csi(raw)
        else:
            raise TabixError(f"Not a TBI/CSI index: {idx}")
        # chromosome normalization map like TabixIndexedFile.cpp:37-46
        for i, name in enumerate(self._names):
            self._chr2id[Chromosome(name).num] = i

    # ---- index parsing ----
    def _parse_tbi(self, raw: bytes):
        (n_ref, fmt, col_seq, col_beg, col_end, meta, skip, l_nm) = struct.unpack(
            "<8i", raw[4:36])
        self.format_id = fmt
        self.col_beg = col_beg
        self.col_end = col_end
        self.meta_char = chr(meta) if meta else "#"
        pos = 36
        names = raw[pos:pos + l_nm].split(b"\x00")[:n_ref]
        self._names = [n.decode() for n in names]
        pos += l_nm
        self._bins = []     # per ref: dict bin -> list[(cbeg, cend)]
        self._linear = []   # per ref: list of u64 voffsets
        for _ in range(n_ref):
            (n_bin,) = struct.unpack("<i", raw[pos:pos + 4]); pos += 4
            bins = {}
            for _ in range(n_bin):
                bin_, n_chunk = struct.unpack("<Ii", raw[pos:pos + 8]); pos += 8
                chunks = list(struct.iter_unpack("<QQ", raw[pos:pos + 16 * n_chunk]))
                pos += 16 * n_chunk
                bins[bin_] = chunks
            (n_intv,) = struct.unpack("<i", raw[pos:pos + 4]); pos += 4
            linear = [v[0] for v in struct.iter_unpack("<Q", raw[pos:pos + 8 * n_intv])]
            pos += 8 * n_intv
            self._bins.append(bins)
            self._linear.append(linear)
        self.index_format = "TBI"
        self.min_shift = 14
        self.depth = 5

    def _parse_csi(self, raw: bytes):
        min_shift, depth, l_aux = struct.unpack("<3i", raw[4:16])
        pos = 16
        aux = raw[pos:pos + l_aux]
        pos += l_aux
        # tabix aux block: format, col_seq, col_beg, col_end, meta, skip, l_nm, names
        (fmt, col_seq, col_beg, col_end, meta, skip, l_nm) = struct.unpack("<7i", aux[:28])
        self.format_id = fmt
        self.col_beg = col_beg
        self.col_end = col_end
        self.meta_char = chr(meta) if meta else "#"
        names = aux[28:28 + l_nm].split(b"\x00")[:-1]
        self._names = [n.decode() for n in names]
        (n_ref,) = struct.unpack("<i", raw[pos:pos + 4]); pos += 4
        self._bins = []
        self._loffs = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack("<i", raw[pos:pos + 4]); pos += 4
            bins = {}
            loffs = {}
            for _ in range(n_bin):
                bin_, loff, n_chunk = struct.unpack("<IQi", raw[pos:pos + 16]); pos += 16
                chunks = list(struct.iter_unpack("<QQ", raw[pos:pos + 16 * n_chunk]))
                pos += 16 * n_chunk
                bins[bin_] = chunks
                loffs[bin_] = loff
            self._bins.append(bins)
            self._loffs.append(loffs)
        self._linear = None
        self.index_format = "CSI"
        self.min_shift = min_shift
        self.depth = depth

    def _reg2bins(self, beg: int, end: int) -> list:
        if self.index_format == "TBI":
            return _reg2bins(beg, end)
        bins = []
        end -= 1
        l, t, s = 0, 0, self.min_shift + self.depth * 3
        while l <= self.depth:
            bins.extend(range(t + (beg >> s), t + (end >> s) + 1))
            s -= 3
            t += 1 << (l * 3)
            l += 1
        return bins

    # ---- queries ----
    def get_matching_lines(self, chr_, start: int, end: int,
                           ignore_missing_chr: bool = False) -> list[bytes]:
        """Lines overlapping [start, end] (1-based); TabixIndexedFile.cpp:98+."""
        if not isinstance(chr_, Chromosome):
            chr_ = Chromosome(chr_)
        rid = self._chr2id.get(chr_.num, -1)
        if rid == -1:
            if ignore_missing_chr:
                return []
            raise TabixError(f"Chromosome '{chr_.str}' not found in tabix index of {self.filename}")
        beg0 = start - 1
        bins = self._bins[rid]
        chunks = []
        min_off = 0
        if self.index_format == "TBI":
            linear = self._linear[rid]
            if linear:
                i = min(beg0 >> 14, len(linear) - 1)
                min_off = linear[i]
        for b in self._reg2bins(beg0, end):
            if b in bins:
                chunks.extend(c for c in bins[b] if c[1] > min_off)
        if not chunks:
            return []
        chunks.sort()
        out = []
        # merged chunks are disjoint virtual-offset ranges, so no line can be
        # returned twice (identical duplicate lines in the file must be kept!)
        for cbeg, cend in self._merge_chunks(chunks):
            out.extend(self._scan_chunk(cbeg, cend, beg0, end))
        return out

    @staticmethod
    def _merge_chunks(chunks):
        merged = [list(chunks[0])]
        for cbeg, cend in chunks[1:]:
            if cbeg <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], cend)
            else:
                merged.append([cbeg, cend])
        return merged

    def _scan_chunk(self, vbeg: int, vend: int, qbeg0: int, qend: int) -> list[bytes]:
        coff, uoff = vbeg >> 16, vbeg & 0xFFFF
        data, next_coff = _bgzf_block_at(self._fh, coff)
        buf = data[uoff:]
        end_coff = vend >> 16
        end_uoff = vend & 0xFFFF
        # read forward until past the chunk end
        limit = None
        if coff == end_coff:
            limit = end_uoff - uoff
        out = []
        consumed_blocks = [(coff, uoff, len(data))]
        while True:
            # ensure buffer covers the chunk or EOF
            if next_coff > end_coff or (limit is not None and len(buf) >= limit):
                break
            data, nc = _bgzf_block_at(self._fh, next_coff)
            if not data:
                break
            if next_coff == end_coff:
                limit = len(buf) + end_uoff
            buf += data
            next_coff = nc
        if limit is not None:
            # extend to finish the last (possibly partial) line
            while limit < len(buf) and buf[limit - 1:limit] != b"\n":
                nl = buf.find(b"\n", limit)
                if nl != -1:
                    limit = nl + 1
                    break
                data, next_coff = _bgzf_block_at(self._fh, next_coff)
                if not data:
                    limit = len(buf)
                    break
                buf += data
            buf = buf[:limit]
        for line in buf.split(b"\n"):
            if not line or line.startswith(self.meta_char.encode()):
                continue
            ov = self._overlaps(line, qbeg0, qend)
            if ov is None:
                continue
            if ov:
                out.append(line)
        return out

    def _overlaps(self, line: bytes, qbeg0: int, qend: int):
        """Overlap test against the query; None if the line is malformed."""
        fields = line.split(b"\t")
        try:
            if self.format_id & 0x10000:   # UCSC/BED: 0-based half-open
                b = int(fields[self.col_beg - 1])
                e = int(fields[self.col_end - 1]) if self.col_end else b + 1
            elif (self.format_id & 0xFFFF) == 2:   # VCF
                b = int(fields[1]) - 1
                e = b + max(1, len(fields[3]))
            else:                           # generic 1-based
                b = int(fields[self.col_beg - 1]) - 1
                e = int(fields[self.col_end - 1]) if self.col_end and self.col_end != self.col_beg else b + 1
        except (ValueError, IndexError):
            return None
        return b < qend and e > qbeg0
