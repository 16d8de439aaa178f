"""CRAM 3.1 support: rANS-Nx16 codec round-trips and full-stack container
write/read (no 3.1 fixtures or htslib exist in this environment, so
interoperability is validated by the encoder<->decoder pair plus the
CramWriter(version=3.1) -> CramReader loop against BAM ground truth)."""

from __future__ import annotations

import random

import numpy as np
import pytest

DIN = "/root/reference/src/cppNGS-TEST/data_in"


def _cases():
    random.seed(42)
    return [
        b"",
        b"A",
        b"AAAAAAAAAAAAAAAA",
        bytes(range(256)) * 4,
        b"ACGTACGTTTTGGGCCAA" * 500,
        bytes(random.getrandbits(8) for _ in range(10000)),
        bytes(random.choices(b"ACGT", weights=[10, 1, 1, 5], k=50000)),
        bytes(random.choices(b"!#$%&'()*+,-./01", k=3333)),
        bytes([0]) * 5000 + bytes([255]) * 5000,
    ]


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("n_ways", [4, 32])
def test_rans_nx16_round_trip(order, n_ways):
    from ngsbits_tpu.io.rans_nx16 import decode, encode

    for data in _cases():
        enc = encode(data, order=order, n_ways=n_ways)
        assert decode(enc) == data, (order, n_ways, len(data))


def test_rans_nx16_compresses():
    from ngsbits_tpu.io.rans_nx16 import decode, encode

    data = bytes(random.Random(7).choices(b"ACGT", weights=[10, 1, 1, 5],
                                          k=50000))
    for order in (0, 1):
        enc = encode(data, order=order)
        assert len(enc) < len(data) // 3
        assert decode(enc) == data


def test_rans_nx16_uint7_and_alphabet():
    from ngsbits_tpu.io.rans_nx16 import (_get_uint7, _put_uint7,
                                          _read_alphabet, _write_alphabet)

    for v in (0, 1, 127, 128, 300, 16383, 16384, 1 << 20, (1 << 32) - 1):
        buf = _put_uint7(v)
        got, pos = _get_uint7(buf, 0)
        assert got == v and pos == len(buf), v

    for syms in ([65], [65, 67, 71, 84], list(range(32, 64)),
                 [0, 1, 2, 3], [5, 9, 10, 11, 12, 200]):
        freqs = {s: 1 for s in syms}
        buf = _write_alphabet(freqs)
        got, pos = _read_alphabet(buf, 0)
        assert got == syms, syms
        assert pos == len(buf)


def test_cram31_full_stack_round_trip(tmp_path):
    """BAM -> CRAM 3.1 (rANS-Nx16 blocks) -> read back: names, flags,
    positions, mapq, CIGARs, bases and qualities identical."""
    from ngsbits_tpu.io.bam import BamReader, BamRecord
    from ngsbits_tpu.io.cram import CramReader
    from ngsbits_tpu.io.cram_write import CramWriter

    src = f"{DIN}/BamReader_insert_only.bam"
    out = str(tmp_path / "t31.cram")
    reader = BamReader(src)
    writer = CramWriter(out, reader, version="3.1")
    for batch in reader:
        writer.write_records(batch)
    writer.close()
    reader.close()

    with open(out, "rb") as fh:
        assert fh.read(6) == b"CRAM\x03\x01"

    def collect(r):
        names, flags, pos, mapq, cigars, seqs, quals = [], [], [], [], [], [], []
        for batch in r:
            for i in range(len(batch)):
                rec = BamRecord.from_batch(batch, i)
                names.append(rec.name)
                cigars.append(rec.cigar_string())
                seqs.append(rec.bases())
                quals.append(rec.qualities_ascii())
            flags.extend(batch.flag.tolist())
            pos.extend(batch.pos.tolist())
            mapq.extend(batch.mapq.tolist())
        return names, flags, pos, mapq, cigars, seqs, quals

    cr = CramReader(out)
    assert cr.version == "CRAM 3.1"
    got = collect(cr)
    want = collect(BamReader(src))
    for g, w, label in zip(got, want, ("names", "flags", "pos", "mapq",
                                       "cigars", "seqs", "quals")):
        assert g == w, label


def test_cram31_unsupported_codecs_error():
    """Methods 6-8 (arith/fqzcomp/tok3) fail with an explicit message."""
    from ngsbits_tpu.io.cram import ByteReader, CramError, read_block

    # method=6, content_type=4, content_id=1, sizes 1/1, payload, CRC
    blob = bytes([6, 4, 1, 1, 1, 0]) + b"\x00\x00\x00\x00"
    with pytest.raises(CramError, match="adaptive arithmetic"):
        read_block(ByteReader(blob))
