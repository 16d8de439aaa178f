"""CRAM 3.0 writer (io/cram_write.py): round-trip through the in-repo
decoder must preserve every BAM field (reference-free feature encoding)."""

import numpy as np
import pytest

from ngsbits_tpu.io.bam import BamReader, BamWriter
from ngsbits_tpu.io.cram_write import itf8, ltf8, split_tags


def test_itf8_ltf8_roundtrip():
    from ngsbits_tpu.io.cram import ByteReader

    for v in [0, 1, 127, 128, 300, 0x3FFF, 0x4000, 0x1FFFFF, 0x200000,
              0xFFFFFFF, 0x10000000, 2**31 - 1, -1, -2]:
        assert ByteReader(itf8(v)).itf8() == v, v
    for v in [0, 127, 128, 1 << 20, 1 << 40, 1 << 62, (1 << 63) - 1]:
        assert ByteReader(ltf8(v)).ltf8() == v, v


def test_split_tags():
    import struct
    blob = (b"NMi" + struct.pack("<i", 5)
            + b"XZZ" + b"hello\x00"
            + b"XBB" + b"c" + struct.pack("<I", 3) + b"\x01\x02\x03"
            + b"ASA" + b"x")
    tags = split_tags(blob)
    assert [t[0] for t in tags] == [b"NMi", b"XZZ", b"XBB", b"ASA"]
    assert tags[1][1] == b"hello\x00"
    assert tags[2][1] == b"c" + struct.pack("<I", 3) + b"\x01\x02\x03"


def _roundtrip_fields(bam_path, tmp_path):
    cram_path = str(tmp_path / "rt.cram")
    reader = BamReader(bam_path)
    writer = BamWriter(cram_path, reader)
    from ngsbits_tpu.io.cram_write import CramWriter
    assert isinstance(writer, CramWriter)
    orig = []
    for batch in reader:
        writer.write_records(batch)
        for i in range(len(batch)):
            orig.append((
                batch.name(i), int(batch.flag[i]), int(batch.ref_id[i]),
                int(batch.pos[i]), int(batch.mapq[i]),
                batch.cigar_of(i).tobytes(), batch.seq_of(i).tobytes(),
                batch.qual_of(i).tobytes(),
                int(batch.mate_ref_id[i]), int(batch.mate_pos[i]),
                int(batch.tlen[i]),
                batch.tags[batch.tags_off[i]:batch.tags_off[i + 1]].tobytes()))
    reader.close()
    writer.close()

    rt = []
    cr = BamReader(cram_path)   # dispatches to CramReader
    assert cr.ref_names == BamReader(bam_path).ref_names
    for batch in cr:
        for i in range(len(batch)):
            rt.append((
                batch.name(i), int(batch.flag[i]), int(batch.ref_id[i]),
                int(batch.pos[i]), int(batch.mapq[i]),
                batch.cigar_of(i).tobytes(), batch.seq_of(i).tobytes(),
                batch.qual_of(i).tobytes(),
                int(batch.mate_ref_id[i]), int(batch.mate_pos[i]),
                int(batch.tlen[i]),
                batch.tags[batch.tags_off[i]:batch.tags_off[i + 1]].tobytes()))
    cr.close()
    return orig, rt


@pytest.mark.parametrize("fixture", [
    "BamClipOverlap_in1.bam",
    "BamToFastq_in1.bam",
])
def test_roundtrip_reference_fixture(ref_data_in, tmp_path, fixture):
    import os
    path = ref_data_in / fixture
    if not os.path.exists(path):
        pytest.skip(f"fixture {fixture} not in mount")
    orig, rt = _roundtrip_fields(str(path), tmp_path)
    assert len(orig) == len(rt) and len(orig) > 0
    n_diff = 0
    for a, b in zip(orig, rt):
        if a != b:
            n_diff += 1
            if n_diff <= 3:
                print("orig:", a)
                print("rt:  ", b)
    assert n_diff == 0


def test_write_record_path_to_cram(ref_data_in, tmp_path):
    """The per-record write path (BamClipOverlap etc.) must work for .cram
    outputs (CramWriter.write_bam_record)."""
    from helpers import execute

    out = tmp_path / "clip.cram"
    assert execute("BamClipOverlap",
                   ["-in", ref_data_in / "BamClipOverlap_in1.bam",
                    "-out", out]) == 0
    from ngsbits_tpu.io.cram import CramReader
    r = CramReader(str(out))
    n = sum(len(b) for b in r)
    r.close()
    assert n > 0
