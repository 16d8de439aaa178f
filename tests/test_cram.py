"""CRAM 3.0 decoder vs values pinned by the reference's own tests.

cppNGS-TEST/BamReader_Test.cpp:400-470 (CramSupport_referenceAsParameter)
pins the first mapped read of cramTest.cram: name, qualities, CIGAR and the
MC tag — all decodable without the reference genome. Base reconstruction
needs the genome FASTA (absent in this environment); ref-derived spans
decode as 'N' while inserted/soft-clipped bases are exact.
"""

import numpy as np
import pytest

from ngsbits_tpu.io.bam import BamReader, BamRecord, FLAG_UNMAPPED
from ngsbits_tpu.io.cram import CramReader

CRAM = "/root/reference/src/cppNGS-TEST/data_in/cramTest.cram"

PINNED_NAME = b"PC0226:121:000000000-AB2J9:1:2101:19474:26718"
PINNED_QUALS = (b"3>AABF@FFFFFGGGGGGGGGFHHHFGGGCGGGGEEGGGGHCGHHHHHHHHGHHHGHGFG"
                b"HHHHGGGGGGHHHHHHHHGFGGGGGHHFEHFHGHHHHHHHGHGGGHHGGFGGGHHHFHHH"
                b"HHHHHGGFGG")


def _first_mapped(batch):
    for i in range(len(batch)):
        if not (batch.flag[i] & FLAG_UNMAPPED):
            return BamRecord.from_batch(batch, i)
    raise AssertionError("no mapped read in batch")


def test_header_and_refs():
    r = CramReader(CRAM)
    assert r.version == "CRAM 3.0"
    assert r.ref_names[0] == "chr1"
    assert r.ref_lengths[0] == 248956422  # hg38 chr1
    assert "@HD" in r.header_text and "@SQ" in r.header_text
    r.close()


def test_first_mapped_read_pinned_values():
    r = CramReader(CRAM, batch_records=512)
    rec = _first_mapped(r.read_batch())
    assert rec.name == PINNED_NAME
    assert rec.cigar_string() == b"130M"
    assert rec.cigar_string(expanded=True) == b"M" * 130
    assert rec.qualities_ascii() == PINNED_QUALS
    assert len(rec.bases()) == 130
    # MC tag (BamReader_Test.cpp:459)
    assert b"MCZ130M\x00" in bytes(rec.tags)
    r.close()


def test_bamreader_dispatches_cram():
    r = BamReader(CRAM)
    assert isinstance(r, CramReader)
    batch = r.read_batch(100)
    assert len(batch) == 100
    r.close()


def test_full_decode_consistency():
    # record count equals the sum of container record counts; flags sane
    r = CramReader(CRAM, batch_records=1 << 16)
    total = 0
    mapped = 0
    pos_ok = True
    for batch in r:
        total += len(batch)
        mapped += int((batch.flag & FLAG_UNMAPPED == 0).sum())
        sel = (batch.flag & FLAG_UNMAPPED) == 0
        if sel.any():
            pos_ok &= bool((batch.pos[sel] >= 0).all())
    # container headers of cramTest.cram declare 10000*3+4466+787+156+788
    assert total == 36197
    assert 0 < mapped <= total
    assert pos_ok
    r.close()


@pytest.mark.parametrize("path", [
    "/root/reference/src/tools-TEST/data_in/SampleIdentity_in_wes.cram",
    "/root/reference/src/tools-TEST/data_in/VcfMerge.cram",
])
def test_other_cram_fixtures_decode(path):
    r = CramReader(path, batch_records=4096)
    batch = r.read_batch()
    assert batch is not None and len(batch) > 0
    # names look like read names, lengths consistent
    assert batch.name_off[-1] > 0
    assert (batch.l_seq[:50] > 0).all()
    rec = BamRecord.from_batch(batch, 0)
    assert len(rec.qual) == rec.length()
    r.close()


def test_mate_pos_consistent_across_containers():
    # detached mates (NP series) must be 0-based like BamBatch.pos
    # (regression: they were stored 1-based, off by one vs NF-linked mates)
    r = CramReader(CRAM, batch_records=1 << 16)
    pos_by_name = {}
    entries = []
    for batch in r:
        for i in range(len(batch)):
            fl = int(batch.flag[i])
            if fl & (0x100 | 0x800 | 0x4):
                continue
            name = batch.name(i)
            pos_by_name.setdefault(name, {})[fl & 0xC0] = int(batch.pos[i])
            entries.append((name, fl & 0xC0, int(batch.mate_pos[i])))
    r.close()
    checked = 0
    mismatched = 0
    for name, which, mate_pos in entries:
        other = pos_by_name.get(name, {}).get(0xC0 ^ which)
        if other is None or mate_pos < 0:
            continue
        checked += 1
        if mate_pos != other:
            mismatched += 1
    assert checked > 1000
    assert mismatched == 0


def test_cram_version_gate(tmp_path):
    """3.0/3.1 are accepted (3.1 via the rANS-Nx16 codec, test_cram31.py);
    other versions are rejected with a clear message at open time."""
    import pytest

    from ngsbits_tpu.io.cram import CramError, CramReader

    p = tmp_path / "v40.cram"
    p.write_bytes(b"CRAM\x04\x00" + bytes(20) + b"\x00" * 64)
    with pytest.raises(CramError, match="Unsupported CRAM version 4.0"):
        CramReader(str(p))
