"""CRAM 3.0 reader producing BamBatch record batches.

Behavioral reference: ngs-bits reads CRAM through htslib
(cppNGS/BamReader.h:11 — BamReader transparently handles BAM/CRAM; CRAM
field skipping BamReader.h:363-373). This is a from-scratch CRAM 3.0
decoder (containers/slices/blocks, ITF8/LTF8, gzip + rANS 4x8 order-0/1
codecs, record model with feature-based CIGAR/sequence reconstruction per
the CRAM 3.0 specification).

Reference bases: sequences in CRAM are stored as diffs against the genome.
Bases are reconstructed when a reference FASTA is supplied (or the slice
embeds its reference); without one, ref-derived spans decode as 'N' while
name/flags/positions/CIGAR/qualities/tags are exact — mirroring htslib's
behavior with a missing reference only in that no error is raised until
bases are needed.
"""

from __future__ import annotations

import gzip as _gzip
import struct
import zlib

import numpy as np

BLOCK_RAW, BLOCK_GZIP, BLOCK_BZIP2, BLOCK_LZMA, BLOCK_RANS = range(5)
CT_FILE_HEADER, CT_COMPRESSION_HEADER, CT_SLICE_HEADER = 0, 1, 2
CT_EXTERNAL, CT_CORE = 4, 5

# CRAM record flags (CF)
CF_QUAL_SCORES = 0x1
CF_DETACHED = 0x2
CF_MATE_DOWNSTREAM = 0x4
CF_NO_SEQ = 0x8

_BASES = b"ACGTN"


class CramError(ValueError):
    pass


# ---------------------------------------------------------------------------
# primitive readers
# ---------------------------------------------------------------------------

class ByteReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def u8(self) -> int:
        v = self.data[self.pos]
        self.pos += 1
        return v

    def bytes(self, n: int) -> bytes:
        v = self.data[self.pos:self.pos + n]
        self.pos += n
        return v

    def itf8(self) -> int:
        d = self.data
        p = self.pos
        b0 = d[p]
        if b0 < 0x80:
            self.pos = p + 1
            v = b0
        elif b0 < 0xC0:
            self.pos = p + 2
            v = ((b0 & 0x7F) << 8) | d[p + 1]
        elif b0 < 0xE0:
            self.pos = p + 3
            v = ((b0 & 0x3F) << 16) | (d[p + 1] << 8) | d[p + 2]
        elif b0 < 0xF0:
            self.pos = p + 4
            v = ((b0 & 0x1F) << 24) | (d[p + 1] << 16) | (d[p + 2] << 8) | d[p + 3]
        else:
            self.pos = p + 5
            v = (((b0 & 0x0F) << 28) | (d[p + 1] << 20) | (d[p + 2] << 12)
                 | (d[p + 3] << 4) | (d[p + 4] & 0x0F))
        # ITF8 is a signed 32-bit value
        return v - (1 << 32) if v >= (1 << 31) else v

    def ltf8(self) -> int:
        d = self.data
        p = self.pos
        b0 = d[p]
        n_extra = 0
        mask = b0
        while n_extra < 8 and (mask & 0x80):
            n_extra += 1
            mask = (mask << 1) & 0xFF
        if n_extra == 0:
            self.pos = p + 1
            return b0
        v = b0 & (0xFF >> n_extra) if n_extra < 8 else 0
        for i in range(n_extra):
            v = (v << 8) | d[p + 1 + i]
        self.pos = p + 1 + n_extra
        return v - (1 << 64) if v >= (1 << 63) else v

    def itf8_array(self) -> list:
        return [self.itf8() for _ in range(self.itf8())]

    def eof(self) -> bool:
        return self.pos >= len(self.data)


class BitReader:
    """MSB-first bit reader over the CORE block."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            byte = self.data[self.pos]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


# ---------------------------------------------------------------------------
# rANS 4x8 (CRAM spec section 13; mirrors htslib rANS_static.c)
# ---------------------------------------------------------------------------

TF_SHIFT = 12
RANS_LOW = 1 << 23


def _read_freqs0(br: ByteReader):
    freqs = [0] * 256
    rle = 0
    j = br.u8()
    while True:
        f = br.u8()
        if f >= 128:
            f = ((f & 127) << 8) | br.u8()
        freqs[j] = f
        if rle > 0:
            rle -= 1
            j += 1
        else:
            nxt = br.u8()
            if nxt == j + 1:
                j = nxt
                rle = br.u8()
            else:
                j = nxt
        if j == 0:
            break
    return freqs


def _build_tables(freqs):
    cum = [0] * 257
    for s in range(256):
        cum[s + 1] = cum[s] + freqs[s]
    lookup = np.zeros(1 << TF_SHIFT, dtype=np.uint8)
    for s in range(256):
        if freqs[s]:
            lookup[cum[s]:cum[s + 1]] = s
    return np.array(freqs, dtype=np.uint32), np.array(cum[:256], dtype=np.uint32), lookup


def _rans_decode_0(br: ByteReader, out_size: int) -> bytes:
    freqs, cum, lookup = _build_tables(_read_freqs0(br))
    data = br.data
    p = br.pos
    states = list(struct.unpack_from("<4I", data, p))
    p += 16
    out = bytearray(out_size)
    for i in range(out_size):
        j = i & 3
        x = states[j]
        m = x & 0xFFF
        s = lookup[m]
        out[i] = s
        x = freqs[s] * (x >> TF_SHIFT) + m - cum[s]
        while x < RANS_LOW and p < len(data):
            x = (x << 8) | data[p]
            p += 1
        states[j] = x
    br.pos = p
    return bytes(out)


def _rans_decode_1(br: ByteReader, out_size: int) -> bytes:
    tables = {}
    rle_i = 0
    i = br.u8()
    while True:
        tables[i] = _build_tables(_read_freqs0(br))
        if rle_i > 0:
            rle_i -= 1
            i += 1
        else:
            nxt = br.u8()
            if nxt == i + 1:
                i = nxt
                rle_i = br.u8()
            else:
                i = nxt
        if i == 0:
            break
    data = br.data
    p = br.pos
    states = list(struct.unpack_from("<4I", data, p))
    p += 16
    out = bytearray(out_size)
    quarter = out_size >> 2
    offsets = [0, quarter, 2 * quarter, 3 * quarter]
    ctx = [0, 0, 0, 0]
    for _ in range(quarter):
        for j in range(4):
            x = states[j]
            m = x & 0xFFF
            freqs, cum, lookup = tables.get(ctx[j]) or _build_tables([0] * 256)
            s = lookup[m]
            out[offsets[j]] = s
            x = freqs[s] * (x >> TF_SHIFT) + m - cum[s]
            while x < RANS_LOW and p < len(data):
                x = (x << 8) | data[p]
                p += 1
            states[j] = x
            ctx[j] = s
            offsets[j] += 1
    # remainder handled by the 4th state
    x = states[3]
    for i in range(offsets[3], out_size):
        m = x & 0xFFF
        freqs, cum, lookup = tables.get(ctx[3]) or _build_tables([0] * 256)
        s = lookup[m]
        out[i] = s
        x = freqs[s] * (x >> TF_SHIFT) + m - cum[s]
        while x < RANS_LOW and p < len(data):
            x = (x << 8) | data[p]
            p += 1
        ctx[3] = s
    br.pos = p
    return bytes(out)


def rans_uncompress(data: bytes, raw_size: int) -> bytes:
    br = ByteReader(data)
    order = br.u8()
    br.bytes(8)  # compressed size + uncompressed size (informational)
    if order == 0:
        return _rans_decode_0(br, raw_size)
    if order == 1:
        return _rans_decode_1(br, raw_size)
    raise CramError(f"Unsupported rANS order {order}")


# ---------------------------------------------------------------------------
# blocks / containers
# ---------------------------------------------------------------------------

class Block:
    __slots__ = ("method", "content_type", "content_id", "data")

    def __init__(self, method, content_type, content_id, data):
        self.method = method
        self.content_type = content_type
        self.content_id = content_id
        self.data = data


def read_block(br: ByteReader) -> Block:
    method = br.u8()
    content_type = br.u8()
    content_id = br.itf8()
    comp_size = br.itf8()
    raw_size = br.itf8()
    payload = br.bytes(comp_size)
    br.bytes(4)  # CRC32
    if method == BLOCK_RAW:
        data = payload
    elif method == BLOCK_GZIP:
        data = _gzip.decompress(payload)
    elif method == BLOCK_BZIP2:
        import bz2
        data = bz2.decompress(payload)
    elif method == BLOCK_LZMA:
        import lzma
        data = lzma.decompress(payload)
    elif method == BLOCK_RANS:
        data = rans_uncompress(payload, raw_size)
    elif method == 5:  # CRAM 3.1: rANS Nx16
        from .rans_nx16 import decode as rans_nx16_decode
        data = rans_nx16_decode(payload, raw_size)
    elif method in (6, 7, 8):
        names = {6: "adaptive arithmetic", 7: "fqzcomp", 8: "name tokenizer"}
        raise CramError(f"CRAM 3.1 codec '{names[method]}' (method {method}) "
                        "is not implemented — only rANS-Nx16/gzip/bzip2/lzma/"
                        "rANS-4x8 blocks are supported")
    else:
        raise CramError(f"Unsupported block compression method {method}")
    if len(data) != raw_size:
        raise CramError(f"Block raw size mismatch: {len(data)} != {raw_size}")
    return Block(method, content_type, content_id, data)


class ContainerHeader:
    __slots__ = ("length", "ref_id", "start", "span", "n_records",
                 "record_counter", "n_bases", "n_blocks", "landmarks",
                 "data_start")


def read_container_header(br: ByteReader) -> ContainerHeader:
    h = ContainerHeader()
    h.length = struct.unpack_from("<i", br.data, br.pos)[0]
    br.pos += 4
    h.ref_id = br.itf8()
    h.start = br.itf8()
    h.span = br.itf8()
    h.n_records = br.itf8()
    h.record_counter = br.ltf8()
    h.n_bases = br.ltf8()
    h.n_blocks = br.itf8()
    h.landmarks = br.itf8_array()
    br.bytes(4)  # CRC32
    h.data_start = br.pos
    return h


# ---------------------------------------------------------------------------
# encodings
# ---------------------------------------------------------------------------

E_NULL, E_EXTERNAL, E_GOLOMB, E_HUFFMAN, E_BYTE_ARRAY_LEN, E_BYTE_ARRAY_STOP, \
    E_BETA, E_SUBEXP, E_GOLOMB_RICE, E_GAMMA = range(10)


class Encoding:
    __slots__ = ("codec", "params")

    def __init__(self, br: ByteReader):
        self.codec = br.itf8()
        n = br.itf8()
        self.params = ByteReader(br.bytes(n))


class Decoder:
    """Decodes one data series according to its Encoding."""

    def __init__(self, enc: Encoding, slice_ctx: "SliceContext"):
        self.codec = enc.codec
        self.ctx = slice_ctx
        p = ByteReader(enc.params.data)
        if self.codec == E_EXTERNAL:
            self.content_id = p.itf8()
        elif self.codec == E_HUFFMAN:
            n = p.itf8()
            self.alphabet = [p.itf8() for _ in range(n)]
            m = p.itf8()
            self.bit_lengths = [p.itf8() for _ in range(m)]
            self._build_huffman()
        elif self.codec == E_BYTE_ARRAY_LEN:
            self.len_dec = Decoder(Encoding(p), slice_ctx)
            self.val_dec = Decoder(Encoding(p), slice_ctx)
        elif self.codec == E_BYTE_ARRAY_STOP:
            self.stop_byte = p.u8()
            self.content_id = p.itf8()
        elif self.codec == E_BETA:
            self.offset = p.itf8()
            self.nbits = p.itf8()
        elif self.codec == E_GAMMA:
            self.offset = p.itf8()
        elif self.codec == E_SUBEXP:
            self.offset = p.itf8()
            self.k = p.itf8()
        elif self.codec == E_NULL:
            pass
        else:
            raise CramError(f"Unsupported encoding codec {self.codec}")

    def _build_huffman(self):
        # canonical huffman codes from (symbol, bit length) pairs
        pairs = sorted(zip(self.bit_lengths, self.alphabet))
        self.codes = {}
        code = 0
        prev_len = 0
        for length, sym in pairs:
            code <<= (length - prev_len)
            self.codes.setdefault(length, {})[code] = sym
            code += 1
            prev_len = length
        self.zero_bit = (len(pairs) == 1 and pairs[0][0] == 0)
        if self.zero_bit:
            self.const = pairs[0][1]

    # ---- int ----
    def read_int(self) -> int:
        if self.codec == E_EXTERNAL:
            return self.ctx.external(self.content_id).itf8()
        if self.codec == E_HUFFMAN:
            if self.zero_bit:
                return self.const
            core = self.ctx.core
            length = 0
            code = 0
            while True:
                code = (code << 1) | core.read(1)
                length += 1
                table = self.codes.get(length)
                if table and code in table:
                    return table[code]
                if length > 31:
                    raise CramError("Invalid huffman code")
        if self.codec == E_BETA:
            return self.ctx.core.read(self.nbits) - self.offset
        if self.codec == E_GAMMA:
            n = 0
            while self.ctx.core.read(1) == 0:
                n += 1
            v = 1
            for _ in range(n):
                v = (v << 1) | self.ctx.core.read(1)
            return v - self.offset
        if self.codec == E_SUBEXP:
            i = 0
            while self.ctx.core.read(1) == 1:
                i += 1
            if i == 0:
                v = self.ctx.core.read(self.k)
            else:
                b = i + self.k - 1
                v = (1 << b) | self.ctx.core.read(b)
            return v - self.offset
        raise CramError(f"Codec {self.codec} cannot decode ints")

    # ---- single byte ----
    def read_byte(self) -> int:
        if self.codec == E_EXTERNAL:
            return self.ctx.external(self.content_id).u8()
        return self.read_int()

    # ---- byte arrays ----
    def read_bytes(self, length: int | None = None) -> bytes:
        if self.codec == E_BYTE_ARRAY_LEN:
            n = self.len_dec.read_int()
            return self.val_dec.read_bytes(n)
        if self.codec == E_BYTE_ARRAY_STOP:
            ext = self.ctx.external(self.content_id)
            end = ext.data.index(self.stop_byte, ext.pos)
            v = ext.data[ext.pos:end]
            ext.pos = end + 1
            return v
        if self.codec == E_EXTERNAL:
            ext = self.ctx.external(self.content_id)
            return ext.bytes(length)
        # core codecs byte-by-byte
        return bytes(self.read_int() for _ in range(length))


# ---------------------------------------------------------------------------
# compression header
# ---------------------------------------------------------------------------

class CompressionHeader:
    def __init__(self, data: bytes):
        br = ByteReader(data)
        # preservation map
        self.rn = True
        self.ap_delta = True
        self.rr = True
        self.sub_matrix = None
        self.td = [[]]
        br.itf8()  # size in bytes
        for _ in range(br.itf8()):
            key = br.bytes(2)
            if key == b"RN":
                self.rn = bool(br.u8())
            elif key == b"AP":
                self.ap_delta = bool(br.u8())
            elif key == b"RR":
                self.rr = bool(br.u8())
            elif key == b"SM":
                self.sub_matrix = br.bytes(5)
            elif key == b"TD":
                n = br.itf8()
                blob = br.bytes(n)
                self.td = []
                for line in blob.split(b"\x00")[:-1]:
                    tags = [line[i:i + 3] for i in range(0, len(line), 3)]
                    self.td.append(tags)
                if not self.td:
                    self.td = [[]]
            else:
                raise CramError(f"Unknown preservation key {key!r}")
        # data series encodings
        self.encodings = {}
        br.itf8()
        for _ in range(br.itf8()):
            key = br.bytes(2).decode()
            self.encodings[key] = Encoding(br)
        # tag encodings
        self.tag_encodings = {}
        br.itf8()
        for _ in range(br.itf8()):
            key = br.itf8()
            self.tag_encodings[key] = Encoding(br)

        # substitution matrix decode: for each ref base (ACGTN) a byte whose
        # 2-bit fields assign codes to the other 4 bases in ACGTN order
        self.sub_lookup = {}
        if self.sub_matrix:
            for r_i, r_base in enumerate(_BASES):
                byte = self.sub_matrix[r_i]
                others = [b for i, b in enumerate(_BASES) if i != r_i]
                for j, alt_base in enumerate(others):
                    code = (byte >> (6 - 2 * j)) & 0x3
                    self.sub_lookup[(r_base, code)] = alt_base


class SliceHeader:
    __slots__ = ("ref_id", "start", "span", "n_records", "record_counter",
                 "n_blocks", "content_ids", "embedded_ref_id", "md5", "tags")


def read_slice_header(data: bytes) -> SliceHeader:
    br = ByteReader(data)
    h = SliceHeader()
    h.ref_id = br.itf8()
    h.start = br.itf8()
    h.span = br.itf8()
    h.n_records = br.itf8()
    h.record_counter = br.ltf8()
    h.n_blocks = br.itf8()
    h.content_ids = br.itf8_array()
    h.embedded_ref_id = br.itf8()
    h.md5 = br.bytes(16)
    return h


class SliceContext:
    """External byte streams + core bit stream of one slice."""

    def __init__(self, core_data: bytes, externals: dict):
        self.core = BitReader(core_data)
        self._externals = {cid: ByteReader(d) for cid, d in externals.items()}

    def external(self, content_id: int) -> ByteReader:
        try:
            return self._externals[content_id]
        except KeyError:
            raise CramError(f"Missing external block {content_id}")


# ---------------------------------------------------------------------------
# record decoding
# ---------------------------------------------------------------------------

class CramRecord:
    __slots__ = ("flags", "cf", "ref_id", "read_length", "pos", "read_group",
                 "name", "mate_flags", "mate_ref_id", "mate_pos", "tlen",
                 "next_frag", "tags", "features", "mapq", "quals", "bases_raw")

    def __init__(self):
        self.name = b""
        self.tags = b""
        self.features = []
        self.mate_ref_id = -1
        self.mate_pos = -1
        self.tlen = 0
        self.next_frag = -1
        self.mate_flags = 0
        self.quals = b""
        self.bases_raw = b""


class SliceDecoder:
    def __init__(self, comp: CompressionHeader, slice_hdr: SliceHeader,
                 ctx: SliceContext, ref_names):
        self.comp = comp
        self.hdr = slice_hdr
        self.ctx = ctx
        self._dec = {}
        self._tag_dec = {}
        self.ref_names = ref_names

    def dec(self, key: str) -> Decoder:
        d = self._dec.get(key)
        if d is None:
            enc = self.comp.encodings.get(key)
            if enc is None:
                raise CramError(f"No encoding for data series {key}")
            d = self._dec[key] = Decoder(enc, self.ctx)
        return d

    def tag_dec(self, key: int) -> Decoder:
        d = self._tag_dec.get(key)
        if d is None:
            d = self._tag_dec[key] = Decoder(self.comp.tag_encodings[key], self.ctx)
        return d

    def decode_records(self):
        comp = self.comp
        hdr = self.hdr
        records = []
        last_pos = hdr.start if comp.ap_delta else 0
        for _ in range(hdr.n_records):
            r = CramRecord()
            r.flags = self.dec("BF").read_int()
            r.cf = self.dec("CF").read_int()
            if hdr.ref_id == -2:
                r.ref_id = self.dec("RI").read_int()
            else:
                r.ref_id = hdr.ref_id
            r.read_length = self.dec("RL").read_int()
            if comp.ap_delta:
                last_pos += self.dec("AP").read_int()
                r.pos = last_pos
            else:
                r.pos = self.dec("AP").read_int()
            r.read_group = self.dec("RG").read_int()
            if comp.rn:
                r.name = self.dec("RN").read_bytes()
            if r.cf & CF_DETACHED:
                r.mate_flags = self.dec("MF").read_int()
                if not comp.rn:
                    r.name = self.dec("RN").read_bytes()
                r.mate_ref_id = self.dec("NS").read_int()
                # NP is 1-based (0 = unset) — store 0-based like BamBatch.pos
                r.mate_pos = self.dec("NP").read_int() - 1
                r.tlen = self.dec("TS").read_int()
                if r.mate_flags & 0x1:
                    r.flags |= 0x20   # mate reverse strand
                if r.mate_flags & 0x2:
                    r.flags |= 0x8    # mate unmapped
            elif r.cf & CF_MATE_DOWNSTREAM:
                r.next_frag = self.dec("NF").read_int()
            tl = self.dec("TL").read_int()
            r.tags = self._decode_tags(tl)
            if not (r.flags & 0x4):
                self._decode_mapped(r)
            else:
                self._decode_unmapped(r)
            records.append(r)
        self._resolve_mates(records)
        return records

    def _decode_tags(self, tl: int) -> bytes:
        out = bytearray()
        for tag3 in self.comp.td[tl]:
            key = (tag3[0] << 16) | (tag3[1] << 8) | tag3[2]
            value = self.tag_dec(key).read_bytes()
            out += tag3  # two tag chars + type char, BAM-compatible
            out += value
        return bytes(out)

    def _decode_mapped(self, r: CramRecord):
        fn = self.dec("FN").read_int()
        prev = 0
        for _ in range(fn):
            code = self.dec("FC").read_byte()
            prev += self.dec("FP").read_int()
            fpos = prev
            c = chr(code)
            if c == "B":
                data = (self.dec("BA").read_byte(), self.dec("QS").read_byte())
            elif c == "X":
                data = self.dec("BS").read_byte()
            elif c == "I":
                data = self.dec("IN").read_bytes()
            elif c == "S":
                data = self.dec("SC").read_bytes()
            elif c == "D":
                data = self.dec("DL").read_int()
            elif c == "N":
                data = self.dec("RS").read_int()
            elif c == "P":
                data = self.dec("PD").read_int()
            elif c == "H":
                data = self.dec("HC").read_int()
            elif c == "i":
                data = self.dec("BA").read_byte()
            elif c == "b":
                data = self.dec("BB").read_bytes()
            elif c == "q":
                data = self.dec("QQ").read_bytes()
            elif c == "Q":
                data = self.dec("QS").read_byte()
            else:
                raise CramError(f"Unknown feature code '{c}'")
            r.features.append((c, fpos, data))
        r.mapq = self.dec("MQ").read_int()
        if r.cf & CF_QUAL_SCORES:
            r.quals = self.dec("QS").read_bytes(r.read_length)
        else:
            r.quals = b"\xff" * r.read_length

    def _decode_unmapped(self, r: CramRecord):
        r.mapq = 0
        ba = self.dec("BA")
        r.bases_raw = ba.read_bytes(r.read_length)
        if r.cf & CF_QUAL_SCORES:
            r.quals = self.dec("QS").read_bytes(r.read_length)
        else:
            r.quals = b"\xff" * r.read_length

    def _resolve_mates(self, records):
        """NF-linked mates within the slice: set mate pos/ref/flags/tlen
        (htslib cram_decode.c mate resolution)."""
        for i, r in enumerate(records):
            if r.next_frag >= 0:
                j = i + r.next_frag + 1
                if j < len(records):
                    m = records[j]
                    r.mate_ref_id = m.ref_id
                    r.mate_pos = m.pos - 1
                    m.mate_ref_id = r.ref_id
                    m.mate_pos = r.pos - 1
                    if m.flags & 0x10:
                        r.flags |= 0x20
                    if m.flags & 0x4:
                        r.flags |= 0x8
                    if r.flags & 0x10:
                        m.flags |= 0x20
                    if r.flags & 0x4:
                        m.flags |= 0x8
                    if not m.name:
                        m.name = r.name
                    # template span (leftmost start to rightmost end)
                    lo = min(r.pos, m.pos)
                    hi = max(r.pos + _ref_span(r) - 1, m.pos + _ref_span(m) - 1)
                    tlen = hi - lo + 1
                    if r.pos <= m.pos:
                        r.tlen, m.tlen = tlen, -tlen
                    else:
                        r.tlen, m.tlen = -tlen, tlen


def _ref_span(r: CramRecord) -> int:
    """Reference bases consumed by a record (read length adjusted by features)."""
    span = r.read_length
    for c, _, data in r.features:
        if c == "D" or c == "N":
            span += data
        elif c == "I":
            span -= len(data)
        elif c == "S":
            span -= len(data)
        elif c == "i":
            span -= 1
    return span


def build_cigar_and_bases(r: CramRecord, ref_getter, sub_lookup):
    """Reconstruct CIGAR ops and bases from features.

    ref_getter(ref_id, pos0, length) -> bytes of reference (may return b'' →
    'N' filler). Returns (cigar list[(op_char, length)], bases bytes).
    """
    cigar = []
    bases = bytearray()

    def emit(op, length):
        if length <= 0:
            return
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + length)
        else:
            cigar.append((op, length))

    read_pos = 1   # 1-based position within the read
    ref_pos = r.pos  # 1-based reference position

    def copy_ref(n):
        nonlocal ref_pos
        if n <= 0:
            return
        seg = ref_getter(r.ref_id, ref_pos - 1, n)
        if len(seg) < n:
            seg = seg + b"N" * (n - len(seg))
        bases.extend(seg.upper())
        ref_pos += n

    for c, fpos, data in r.features:
        gap = fpos - read_pos
        if gap > 0:
            emit("M", gap)
            copy_ref(gap)
            read_pos = fpos
        if c == "S":
            emit("S", len(data))
            bases.extend(data)
            read_pos += len(data)
        elif c == "X":
            emit("M", 1)
            ref_base = ref_getter(r.ref_id, ref_pos - 1, 1).upper()
            if ref_base and (ref_base[0], data) in sub_lookup:
                bases.append(sub_lookup[(ref_base[0], data)])
            else:
                bases.append(ord("N"))
            ref_pos += 1
            read_pos += 1
        elif c == "I":
            emit("I", len(data))
            bases.extend(data)
            read_pos += len(data)
        elif c == "i":
            emit("I", 1)
            bases.append(data)
            read_pos += 1
        elif c == "D":
            emit("D", data)
            ref_pos += data
        elif c == "N":
            emit("N", data)
            ref_pos += data
        elif c == "P":
            emit("P", data)
        elif c == "H":
            emit("H", data)
        elif c == "B":
            emit("M", 1)
            bases.append(data[0])
            r.quals = (r.quals[:fpos - 1] + bytes([data[1]])
                       + r.quals[fpos:]) if r.quals else r.quals
            ref_pos += 1
            read_pos += 1
        elif c == "b":
            emit("M", len(data))
            bases.extend(data)
            ref_pos += len(data)
            read_pos += len(data)
        elif c == "Q":
            if r.quals:
                r.quals = (r.quals[:fpos - 1] + bytes([data]) + r.quals[fpos:])
        elif c == "q":
            if r.quals:
                r.quals = (r.quals[:fpos - 1] + data + r.quals[fpos - 1 + len(data):])
    tail = r.read_length - read_pos + 1
    if tail > 0:
        emit("M", tail)
        copy_ref(tail)
    return cigar, bytes(bases)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

# ASCII base -> BAM 4-bit nibble code
_ASCII_TO_NIBBLE = np.zeros(256, dtype=np.uint8)
for _i, _b in enumerate(b"=ACMGRSVTWYHKDBN"):
    _ASCII_TO_NIBBLE[_b] = _i
    _ASCII_TO_NIBBLE[_b | 0x20] = _i  # lowercase

_CIGAR_OP_NUM = {c: i for i, c in enumerate("MIDNSHP=X")}


class CramReader:
    """Sequential CRAM 3.0 reader with the BamReader batch interface."""

    def __init__(self, filename: str, ref: str | None = None,
                 batch_records: int = 1 << 16):
        self.filename = filename
        self.batch_records = batch_records
        self._fh = open(filename, "rb")
        magic = self._fh.read(4)
        if magic != b"CRAM":
            raise CramError(f"Not a CRAM file: {filename}")
        major, minor = self._fh.read(1)[0], self._fh.read(1)[0]
        if major != 3 or minor not in (0, 1):
            raise CramError(
                f"Unsupported CRAM version {major}.{minor}: only CRAM 3.0 "
                "and 3.1 are supported")
        self.version = f"CRAM {major}.{minor}"
        self._fh.read(20)  # file id
        self._pending: list = []
        self._eof = False

        # SAM header container
        hdr_container = self._read_container_bytes()
        br = ByteReader(hdr_container)
        read_container_header(br)
        block = read_block(br)
        if block.content_type != CT_FILE_HEADER:
            raise CramError("First container does not hold the SAM header")
        text_len = struct.unpack_from("<i", block.data, 0)[0]
        self.header_text = block.data[4:4 + text_len].decode(errors="replace")
        self.ref_names = []
        self.ref_lengths = []
        for line in self.header_text.splitlines():
            if line.startswith("@SQ"):
                name = ln = None
                for fieldv in line.split("\t")[1:]:
                    if fieldv.startswith("SN:"):
                        name = fieldv[3:]
                    elif fieldv.startswith("LN:"):
                        ln = int(fieldv[3:])
                if name is not None:
                    self.ref_names.append(name)
                    self.ref_lengths.append(ln or 0)

        self._ref_index = None
        if ref:
            from .fasta import FastaFileIndex
            self._ref_index = FastaFileIndex(ref)

    # ---- reference access ----
    def _ref_getter(self, embedded: bytes | None, slice_start: int):
        def get(ref_id, pos0, length):
            if embedded is not None:
                off = pos0 - (slice_start - 1)
                if off < 0:
                    return b""
                return embedded[off:off + length]
            if self._ref_index is not None and 0 <= ref_id < len(self.ref_names):
                try:
                    return self._ref_index.seq(self.ref_names[ref_id],
                                               pos0 + 1, length)
                except Exception:
                    return b""
            return b""
        return get

    # ---- container IO ----
    def _read_container_bytes(self) -> bytes | None:
        head = self._fh.read(4)
        if len(head) < 4:
            return None
        length = struct.unpack("<i", head)[0]
        rest = bytearray(head)
        # read the remainder of the container header field-by-field is
        # complex from a stream; read generously and parse: header fields are
        # at most ~ 23 + 5*n_landmarks bytes. Read 1KB, parse, then read the
        # declared payload relative to the parsed header size.
        probe = self._fh.read(1024)
        rest += probe
        br = ByteReader(bytes(rest))
        h = read_container_header(br)
        needed = h.data_start + h.length
        if len(rest) < needed:
            rest += self._fh.read(needed - len(rest))
        else:
            # rewind overshoot
            self._fh.seek(needed - len(rest), 1)
            rest = rest[:needed]
        return bytes(rest)

    def _decode_next_container(self) -> list:
        raw = self._read_container_bytes()
        if raw is None:
            self._eof = True
            return []
        br = ByteReader(raw)
        h = read_container_header(br)
        if h.n_records == 0:
            # empty container (legal mid-file, e.g. at reference-sequence
            # boundaries) or the EOF container — skip it; real EOF is
            # detected at the end of the file. htslib likewise skips empty
            # containers rather than treating them as EOF.
            return []
        comp_block = read_block(br)
        if comp_block.content_type != CT_COMPRESSION_HEADER:
            raise CramError("Expected compression header block")
        comp = CompressionHeader(comp_block.data)
        records = []
        while br.pos < len(raw) - 1 and not br.eof():
            slice_hdr_block = read_block(br)
            if slice_hdr_block.content_type != CT_SLICE_HEADER:
                break
            shdr = read_slice_header(slice_hdr_block.data)
            core = b""
            externals = {}
            embedded_ref = None
            for _ in range(shdr.n_blocks):
                blk = read_block(br)
                if blk.content_type == CT_CORE:
                    core = blk.data
                elif blk.content_type == CT_EXTERNAL:
                    externals[blk.content_id] = blk.data
                    if blk.content_id == shdr.embedded_ref_id:
                        embedded_ref = blk.data
            ctx = SliceContext(core, externals)
            decoder = SliceDecoder(comp, shdr, ctx, self.ref_names)
            recs = decoder.decode_records()
            ref_get = self._ref_getter(embedded_ref, shdr.start)
            for r in recs:
                records.append(self._to_bam_fields(r, comp, ref_get))
        return records

    def _to_bam_fields(self, r: CramRecord, comp: CompressionHeader, ref_get):
        if r.flags & 0x4:
            cigar_ops = []
            bases = r.bases_raw
        else:
            cigar_ops, bases = build_cigar_and_bases(r, ref_get, comp.sub_lookup)
        cigar = np.array([(length << 4) | _CIGAR_OP_NUM[op]
                          for op, length in cigar_ops], dtype=np.uint32)
        return (r, cigar, bases)

    # ---- batch API (mirrors BamReader) ----
    def read_batch(self, max_records: int | None = None):
        from .bam import BamBatch
        max_records = max_records or self.batch_records
        while len(self._pending) < max_records and not self._eof:
            self._pending.extend(self._decode_next_container())
        if not self._pending:
            return None
        chunk = self._pending[:max_records]
        del self._pending[:max_records]

        n = len(chunk)
        ref_id = np.empty(n, np.int32)
        pos = np.empty(n, np.int32)
        flag = np.empty(n, np.uint16)
        mapq = np.empty(n, np.uint8)
        l_seq = np.empty(n, np.int32)
        n_cigar = np.empty(n, np.int32)
        tlen = np.empty(n, np.int32)
        mate_ref = np.empty(n, np.int32)
        mate_pos = np.empty(n, np.int32)
        cigar_parts = []
        cigar_off = np.zeros(n + 1, np.int64)
        seq_parts = []
        qual_parts = []
        seq_off = np.zeros(n + 1, np.int64)
        names = bytearray()
        name_off = np.zeros(n + 1, np.int64)
        tag_parts = []
        tags_off = np.zeros(n + 1, np.int64)
        for i, (r, cigar, bases) in enumerate(chunk):
            ref_id[i] = r.ref_id
            pos[i] = r.pos - 1
            flag[i] = r.flags & 0xFFFF
            mapq[i] = max(r.mapq, 0)
            l_seq[i] = r.read_length
            n_cigar[i] = len(cigar)
            tlen[i] = r.tlen
            mate_ref[i] = r.mate_ref_id
            mate_pos[i] = r.mate_pos
            cigar_parts.append(cigar)
            cigar_off[i + 1] = cigar_off[i] + len(cigar)
            nib = _ASCII_TO_NIBBLE[np.frombuffer(bases, dtype=np.uint8)] \
                if bases else np.empty(0, np.uint8)
            seq_parts.append(nib)
            qual_parts.append(np.frombuffer(r.quals, dtype=np.uint8)
                              if r.quals else np.empty(0, np.uint8))
            seq_off[i + 1] = seq_off[i] + len(nib)
            names += r.name
            name_off[i + 1] = len(names)
            tags = np.frombuffer(r.tags, dtype=np.uint8)
            tag_parts.append(tags)
            tags_off[i + 1] = tags_off[i] + len(tags)
        return BamBatch(
            ref_id=ref_id, pos=pos, flag=flag, mapq=mapq, l_seq=l_seq,
            n_cigar=n_cigar, tlen=tlen, mate_ref_id=mate_ref, mate_pos=mate_pos,
            cigar=(np.concatenate(cigar_parts) if cigar_parts else np.empty(0, np.uint32)).astype(np.uint32),
            cigar_off=cigar_off,
            seq=np.concatenate(seq_parts) if seq_parts else np.empty(0, np.uint8),
            qual=np.concatenate(qual_parts) if qual_parts else np.empty(0, np.uint8),
            seq_off=seq_off,
            names=bytes(names), name_off=name_off,
            tags=np.concatenate(tag_parts) if tag_parts else np.empty(0, np.uint8),
            tags_off=tags_off,
        )

    def __iter__(self):
        while True:
            b = self.read_batch()
            if b is None:
                return
            yield b

    def build_from_chr1(self) -> str:
        """Genome build detection like BamReader.h:378 (by chr1 length)."""
        for name, length in zip(self.ref_names, self.ref_lengths):
            if name in ("chr1", "1"):
                if length == 249250621:
                    return "hg19"
                if length == 248956422:
                    return "hg38"
        return "n/a"

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
