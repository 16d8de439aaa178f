"""CRAM 3.0 writer.

Behavioral reference: ngs-bits BamWriter writes CRAM when the output name
ends in '.cram' (cppNGS/BamWriter.h:13, via htslib). This is a from-scratch
encoder built as the inverse of the in-repo decoder (io/cram.py):

- every record is written reference-free ('b'/'I'/'S'... features carry the
  read bases explicitly, so decoding needs no genome) and mate-detached
  (mate fields stored verbatim — no NF linkage),
- all data series use EXTERNAL / BYTE_ARRAY_STOP / BYTE_ARRAY_LEN encodings
  (no core bit codecs), one gzip-compressed external block per series,
- multi-reference slices (slice ref_id -2 + RI series), absolute positions
  (AP preservation bit 0).

Limitations (documented): records with SEQ '*' but a non-empty CIGAR lose
the CIGAR (feature encoding carries bases; htslib needs the reference for
this case too); '=' and 'X' CIGAR ops are written as 'M' (base-identical).
"""

from __future__ import annotations

import gzip as _gzip
import struct
import zlib

import numpy as np

from .bam import SEQ_NIBBLE_ASCII

# block/content constants (io/cram.py:26-33)
BLOCK_RAW, BLOCK_GZIP = 0, 1
CT_FILE_HEADER, CT_COMPRESSION_HEADER, CT_SLICE_HEADER = 0, 1, 2
CT_EXTERNAL, CT_CORE = 4, 5
CF_QUAL_SCORES = 0x1
CF_DETACHED = 0x2
E_EXTERNAL, E_HUFFMAN, E_BYTE_ARRAY_LEN, E_BYTE_ARRAY_STOP = 1, 3, 4, 5

# canonical CRAM v3 EOF container (38 bytes, SAM spec / htslib cram_io.c)
CRAM_EOF = bytes([
    0x0f, 0x00, 0x00, 0x00, 0xff, 0xff, 0xff, 0xff, 0x0f, 0xe0, 0x45, 0x4f,
    0x46, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x05, 0xbd, 0xd9, 0x4f, 0x00,
    0x01, 0x00, 0x06, 0x06, 0x01, 0x00, 0x01, 0x00, 0x01, 0x00, 0xee, 0x63,
    0x01, 0x4b])


def itf8(v: int) -> bytes:
    """Inverse of ByteReader.itf8 (signed 32-bit)."""
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF,
                      v & 0xFF])
    return bytes([0xF0 | ((v >> 28) & 0x0F), (v >> 20) & 0xFF,
                  (v >> 12) & 0xFF, (v >> 4) & 0xFF, v & 0x0F])


def ltf8(v: int) -> bytes:
    """Inverse of ByteReader.ltf8 (signed 64-bit)."""
    v &= 0xFFFFFFFFFFFFFFFF
    if v < 0x80:
        return bytes([v])
    # smallest n_extra such that value fits in (7-n_extra)+8*n_extra bits
    for n_extra in range(1, 9):
        bits = (7 - n_extra if n_extra < 8 else 0) + 8 * n_extra
        if v < (1 << bits):
            prefix_mask = (0xFF << (8 - n_extra)) & 0xFF
            if n_extra == 8:
                head = 0xFF
                body = v.to_bytes(8, "big")
            else:
                head = prefix_mask | (v >> (8 * n_extra))
                body = (v & ((1 << (8 * n_extra)) - 1)).to_bytes(n_extra, "big")
            return bytes([head]) + body
    raise ValueError("ltf8 overflow")


def _enc_external(cid: int) -> bytes:
    params = itf8(cid)
    return itf8(E_EXTERNAL) + itf8(len(params)) + params


def _enc_byte_array_stop(stop: int, cid: int) -> bytes:
    params = bytes([stop]) + itf8(cid)
    return itf8(E_BYTE_ARRAY_STOP) + itf8(len(params)) + params


def _enc_byte_array_len(len_cid: int, val_cid: int) -> bytes:
    params = _enc_external(len_cid) + _enc_external(val_cid)
    return itf8(E_BYTE_ARRAY_LEN) + itf8(len(params)) + params


def _block(content_type: int, content_id: int, data: bytes,
           compress: bool = True, use_rans_nx16: bool = False) -> bytes:
    if compress and len(data) > 64:
        if use_rans_nx16:
            from .rans_nx16 import encode as rans_nx16_encode
            payload = rans_nx16_encode(data, order=0)
            method = 5  # CRAM 3.1 rANS Nx16
        else:
            payload = _gzip.compress(data, 4)
            method = BLOCK_GZIP
        if len(payload) >= len(data):
            payload, method = data, BLOCK_RAW
    else:
        payload, method = data, BLOCK_RAW
    head = (bytes([method, content_type]) + itf8(content_id)
            + itf8(len(payload)) + itf8(len(data)))
    crc = zlib.crc32(head + payload) & 0xFFFFFFFF
    return head + payload + struct.pack("<I", crc)


# fixed BAM tag value sizes by type char
_TAG_FIXED = {ord("A"): 1, ord("c"): 1, ord("C"): 1, ord("s"): 2,
              ord("S"): 2, ord("i"): 4, ord("I"): 4, ord("f"): 4}
_B_ELEM = {ord("c"): 1, ord("C"): 1, ord("s"): 2, ord("S"): 2,
           ord("i"): 4, ord("I"): 4, ord("f"): 4}


def split_tags(blob: bytes) -> list:
    """Split a BAM tag blob into (tag3, value_bytes) pairs; value bytes are
    the raw BAM encoding (incl. NUL for Z/H, header for B)."""
    out = []
    p = 0
    n = len(blob)
    while p + 3 <= n:
        tag3 = blob[p:p + 3]
        t = blob[p + 2]
        q = p + 3
        if t in _TAG_FIXED:
            vlen = _TAG_FIXED[t]
        elif t in (ord("Z"), ord("H")):
            vlen = blob.index(0, q) - q + 1
        elif t == ord("B"):
            sub = blob[q]
            cnt = struct.unpack_from("<I", blob, q + 1)[0]
            vlen = 1 + 4 + cnt * _B_ELEM[sub]
        else:
            raise ValueError(f"Unknown BAM tag type {chr(t)!r}")
        out.append((tag3, blob[q:q + vlen]))
        p = q + vlen
    return out


# data series -> (kind, content id). kind: i=int, y=byte, s=stop-bytes
_SERIES = {
    "BF": ("i", 1), "CF": ("i", 2), "RI": ("i", 3), "RL": ("i", 4),
    "AP": ("i", 5), "RG": ("i", 6), "RN": ("s", 7), "MF": ("i", 8),
    "NS": ("i", 9), "NP": ("i", 10), "TS": ("i", 11), "TL": ("i", 12),
    "FN": ("i", 13), "FC": ("y", 14), "FP": ("i", 15), "BB": ("s", 16),
    "IN": ("s", 17), "SC": ("s", 18), "DL": ("i", 19), "RS": ("i", 20),
    "PD": ("i", 21), "HC": ("i", 22), "MQ": ("i", 23), "QS": ("y", 24),
    "BA": ("y", 25),
}
# tag len-stream cids live at base+key; base sits above any 3-byte tag key
# (max 0x7A7A7A) so len cids can never collide with another tag's value cid
_TAG_LEN_BASE = 0x1000000


class _Streams:
    def __init__(self):
        self.by_cid: dict[int, bytearray] = {}

    def buf(self, cid: int) -> bytearray:
        b = self.by_cid.get(cid)
        if b is None:
            b = self.by_cid[cid] = bytearray()
        return b

    def put_int(self, series: str, v: int):
        self.buf(_SERIES[series][1]).extend(itf8(v))

    def put_byte(self, series: str, v: int):
        self.buf(_SERIES[series][1]).append(v & 0xFF)

    def put_bytes(self, series: str, data: bytes):
        kind, cid = _SERIES[series]
        b = self.buf(cid)
        b += data
        if kind == "s":
            b.append(0)    # stop byte


class CramWriter:
    """BamWriter-compatible CRAM writer (filename ends with .cram)."""

    RECORDS_PER_CONTAINER = 10000

    def __init__(self, filename: str, reader, version: str | None = None):
        import os
        if version is None:
            version = os.environ.get("NGSBITS_CRAM_VERSION", "3.0")
        if version not in ("3.0", "3.1"):
            raise ValueError(f"Unsupported CRAM write version '{version}'")
        # 3.1 containers compress external blocks with rANS Nx16 (codec 5)
        self._use_nx16 = version == "3.1"
        self._fh = open(filename, "wb")
        self._fh.write(b"CRAM\x03" + (b"\x01" if self._use_nx16 else b"\x00"))
        fid = (filename.encode()[-20:] if filename else b"")
        self._fh.write(fid.ljust(20, b"\x00"))
        self._record_counter = 0
        self._pending: list = []
        self._cigar_drop_warned = False
        # SAM header container (CT_FILE_HEADER block)
        text = reader.header_text.encode() if isinstance(reader.header_text, str) \
            else reader.header_text
        blk = _block(CT_FILE_HEADER, 0,
                     struct.pack("<i", len(text)) + text, compress=False)
        self._write_container(blk, ref_id=0, n_records=0, n_bases=0,
                              n_blocks=1, landmarks=[0])

    def _write_container(self, data: bytes, ref_id: int, n_records: int,
                         n_bases: int, n_blocks: int, landmarks: list):
        head = (itf8(ref_id) + itf8(0) + itf8(0) + itf8(n_records)
                + ltf8(self._record_counter) + ltf8(n_bases)
                + itf8(n_blocks) + itf8(len(landmarks))
                + b"".join(itf8(x) for x in landmarks))
        head = struct.pack("<i", len(data)) + head
        crc = zlib.crc32(head) & 0xFFFFFFFF
        self._fh.write(head + struct.pack("<I", crc) + data)

    def _warn_cigar_dropped(self, name: bytes):
        if self._cigar_drop_warned:
            return
        self._cigar_drop_warned = True
        import sys
        print("Warning: CRAM output drops the CIGAR of mapped records "
              "without sequence (first: %s); the reference-free feature "
              "encoding needs the bases to carry alignment ops."
              % name.decode("ascii", "replace"), file=sys.stderr)

    # ---- record accumulation (BamWriter interface) ----
    def write_records(self, batch, keep=None):
        idx = range(len(batch)) if keep is None else np.flatnonzero(keep)
        for i in idx:
            self._pending.append(self._snapshot(batch, int(i)))
            if len(self._pending) >= self.RECORDS_PER_CONTAINER:
                self._flush()

    def write_bam_record(self, r):
        """Append one BamRecord (the write_record() path used by
        read-modify-write tools like BamClipOverlap)."""
        seq_ascii = SEQ_NIBBLE_ASCII[np.asarray(r.seq, dtype=np.uint8)].tobytes()
        qual = np.asarray(r.qual, dtype=np.uint8).tobytes()
        tags = bytes(r.tags)
        self._pending.append((int(r.flag), int(r.ref_id), int(r.pos),
                              int(r.mapq), np.asarray(r.cigar, dtype=np.uint32),
                              seq_ascii, qual, bytes(r.name),
                              int(r.mate_ref_id), int(r.mate_pos),
                              int(r.tlen), tags))
        if len(self._pending) >= self.RECORDS_PER_CONTAINER:
            self._flush()

    @staticmethod
    def _snapshot(batch, i: int):
        seq_ascii = SEQ_NIBBLE_ASCII[batch.seq_of(i)].tobytes()
        return (int(batch.flag[i]), int(batch.ref_id[i]), int(batch.pos[i]),
                int(batch.mapq[i]), batch.cigar_of(i).copy(), seq_ascii,
                batch.qual_of(i).tobytes(), batch.name(i),
                int(batch.mate_ref_id[i]), int(batch.mate_pos[i]),
                int(batch.tlen[i]),
                batch.tags[batch.tags_off[i]:batch.tags_off[i + 1]].tobytes())

    # ---- container encoding ----
    def _flush(self):
        if not self._pending:
            return
        records = self._pending
        self._pending = []

        # tag dictionary
        td_lines: list[bytes] = [b""]
        td_index = {b"": 0}
        rec_tags = []
        for r in records:
            tags = split_tags(r[11])
            line = b"".join(t3 for t3, _ in tags)
            tl = td_index.get(line)
            if tl is None:
                tl = td_index[line] = len(td_lines)
                td_lines.append(line)
            rec_tags.append((tl, tags))

        s = _Streams()
        n_bases = 0
        tag_keys = {}
        for r, (tl, tags) in zip(records, rec_tags):
            (flag, ref_id, pos, mapq, cigar, seq, qual, name,
             mate_ref, mate_pos, tlen, _blob) = r
            rl = len(seq)
            if rl == 0 and len(cigar) > 0 and not (flag & 0x4):
                self._warn_cigar_dropped(name)
            n_bases += rl
            has_qual = bool(qual) and qual != b"\xff" * rl
            cf = CF_DETACHED | (CF_QUAL_SCORES if has_qual else 0)
            mf = (1 if flag & 0x20 else 0) | (2 if flag & 0x8 else 0)
            s.put_int("BF", flag)
            s.put_int("CF", cf)
            s.put_int("RI", ref_id)
            s.put_int("RL", rl)
            s.put_int("AP", pos + 1)
            s.put_int("RG", -1)
            s.put_bytes("RN", name)
            s.put_int("MF", mf)
            s.put_int("NS", mate_ref)
            s.put_int("NP", mate_pos + 1)
            s.put_int("TS", tlen)
            s.put_int("TL", tl)
            for t3, val in tags:
                key = (t3[0] << 16) | (t3[1] << 8) | t3[2]
                tag_keys[key] = True
                s.buf(_TAG_LEN_BASE + key).extend(itf8(len(val)))
                s.buf(key).extend(val)
            if flag & 0x4:
                # unmapped: verbatim bases
                s.buf(_SERIES["BA"][1]).extend(seq)
                if has_qual:
                    s.buf(_SERIES["QS"][1]).extend(qual)
            else:
                self._encode_features(s, cigar, seq)
                s.put_int("MQ", mapq)
                if has_qual:
                    s.buf(_SERIES["QS"][1]).extend(qual)

        # compression header
        comp = self._compression_header(td_lines, tag_keys)
        comp_blk = _block(CT_COMPRESSION_HEADER, 0, comp,
                          use_rans_nx16=self._use_nx16)

        # slice: header + core + externals
        ext_blocks = []
        content_ids = []
        for cid in sorted(s.by_cid):
            content_ids.append(cid)
            ext_blocks.append(_block(CT_EXTERNAL, cid, bytes(s.by_cid[cid]),
                                     use_rans_nx16=self._use_nx16))
        core_blk = _block(CT_CORE, 0, b"", compress=False)
        slice_hdr = (itf8(-2) + itf8(0) + itf8(0) + itf8(len(records))
                     + ltf8(self._record_counter) + itf8(1 + len(ext_blocks))
                     + itf8(len(content_ids))
                     + b"".join(itf8(c) for c in content_ids)
                     + itf8(-1) + b"\x00" * 16)
        slice_blk = _block(CT_SLICE_HEADER, 0, slice_hdr, compress=False)

        data = comp_blk + slice_blk + core_blk + b"".join(ext_blocks)
        self._write_container(
            data, ref_id=-2, n_records=len(records), n_bases=n_bases,
            n_blocks=3 + len(ext_blocks), landmarks=[len(comp_blk)])
        self._record_counter += len(records)

    @staticmethod
    def _encode_features(s: _Streams, cigar: np.ndarray, seq: bytes):
        """CIGAR+SEQ -> reference-free feature list (inverse of
        build_cigar_and_bases with no implicit reference copies)."""
        feats = []          # (code_char, fpos, payload)
        read_pos = 1
        for cg in cigar:
            op = int(cg) & 0xF
            ln = int(cg) >> 4
            if op in (0, 7, 8):          # M / = / X -> explicit bases
                feats.append(("b", read_pos, seq[read_pos - 1:read_pos - 1 + ln]))
                read_pos += ln
            elif op == 1:                # I
                feats.append(("I", read_pos, seq[read_pos - 1:read_pos - 1 + ln]))
                read_pos += ln
            elif op == 4:                # S
                feats.append(("S", read_pos, seq[read_pos - 1:read_pos - 1 + ln]))
                read_pos += ln
            elif op == 2:                # D
                feats.append(("D", read_pos, ln))
            elif op == 3:                # N
                feats.append(("N", read_pos, ln))
            elif op == 5:                # H
                feats.append(("H", read_pos, ln))
            elif op == 6:                # P
                feats.append(("P", read_pos, ln))
        s.put_int("FN", len(feats))
        prev = 0
        for code, fpos, payload in feats:
            s.put_byte("FC", ord(code))
            s.put_int("FP", fpos - prev)
            prev = fpos
            if code == "b":
                s.put_bytes("BB", payload)
            elif code == "I":
                s.put_bytes("IN", payload)
            elif code == "S":
                s.put_bytes("SC", payload)
            elif code == "D":
                s.put_int("DL", payload)
            elif code == "N":
                s.put_int("RS", payload)
            elif code == "H":
                s.put_int("HC", payload)
            elif code == "P":
                s.put_int("PD", payload)

    @staticmethod
    def _compression_header(td_lines: list, tag_keys: dict) -> bytes:
        # preservation map: RN=1, AP=0 (absolute), RR=1, TD
        td_blob = b"".join(line + b"\x00" for line in td_lines)
        pmap = (b"RN\x01" + b"AP\x00" + b"RR\x01"
                + b"TD" + itf8(len(td_blob)) + td_blob)
        pmap = itf8(4) + pmap          # entry count
        part1 = itf8(len(pmap)) + pmap

        entries = bytearray()
        for key, (kind, cid) in _SERIES.items():
            entries += key.encode()
            if kind == "s":
                entries += _enc_byte_array_stop(0, cid)
            else:
                entries += _enc_external(cid)
        emap = itf8(len(_SERIES)) + bytes(entries)
        part2 = itf8(len(emap)) + emap

        tentries = bytearray()
        for key in sorted(tag_keys):
            tentries += itf8(key)
            tentries += _enc_byte_array_len(_TAG_LEN_BASE + key, key)
        tmap = itf8(len(tag_keys)) + bytes(tentries)
        part3 = itf8(len(tmap)) + tmap
        return part1 + part2 + part3

    def close(self):
        self._flush()
        self._fh.write(CRAM_EOF)
        self._fh.close()
