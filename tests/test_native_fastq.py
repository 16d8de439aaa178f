"""Native (C++) FASTQ batch decoder vs the pure-Python splitter."""

import gzip
import os

import numpy as np
import pytest

from ngsbits_tpu.io import native
from ngsbits_tpu.io.fastq import FastqReader

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")

FIXTURES = [
    "ReadQC_in1.fastq.gz", "ReadQC_in3.fastq.gz",  # plain + long-read-ish
    "SeqPurge_in1.fastq.gz", "FastqConcat_in4.fastq.gz",
]


def _read_both(path, **kw):
    nb = list(FastqReader(path, **kw))
    os.environ["NGSHOST_DISABLE"] = "1"
    try:
        pb = list(FastqReader(path, **kw)._iter_python())
    finally:
        del os.environ["NGSHOST_DISABLE"]
    return nb, pb


def _assert_equal(nb, pb):
    assert len(nb) == len(pb)
    for a, b in zip(nb, pb):
        np.testing.assert_array_equal(a.bases, b.bases)
        np.testing.assert_array_equal(a.quals, b.quals)
        np.testing.assert_array_equal(a.lengths, b.lengths)
        assert a.headers == b.headers
        assert a.headers2 == b.headers2


@pytest.mark.parametrize("fixture", FIXTURES)
def test_fixture_parity(ref_data_in, fixture):
    path = str(ref_data_in / fixture)
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    nb, pb = _read_both(path, batch_reads=97, keep_headers=True, validate=False)
    _assert_equal(nb, pb)


def test_no_trailing_newline_and_empty_quals(tmp_path):
    # final record without trailing newline; zero-length read
    raw = b"@r1\nACGT\n+\nIIII\n@empty\n\n+\n\n@r3\nGG\n+\nII"
    path = tmp_path / "odd.fastq.gz"
    path.write_bytes(gzip.compress(raw))
    nb, pb = _read_both(str(path), batch_reads=2, keep_headers=True,
                        validate=False)
    _assert_equal(nb, pb)
    assert sum(len(b) for b in nb) == 3
    assert list(np.concatenate([b.lengths for b in nb])) == [4, 0, 2]


def test_plain_uncompressed(tmp_path):
    raw = b"@a\nAC\n+\n!!\n@b\nGGG\n+\n!!!\n"
    path = tmp_path / "plain.fastq"
    path.write_bytes(raw)
    nb, pb = _read_both(str(path), batch_reads=10, keep_headers=True,
                        validate=False)
    _assert_equal(nb, pb)


def test_bad_line_count(tmp_path):
    path = tmp_path / "bad.fastq.gz"
    path.write_bytes(gzip.compress(b"@a\nAC\n+\n!!\n@b\nGG\n"))
    with pytest.raises(ValueError, match="multiple of 4"):
        list(FastqReader(str(path), validate=False))


def test_crosses_batch_boundaries(tmp_path):
    # many records with varying lengths; batch smaller than total
    rng = np.random.default_rng(7)
    recs = []
    for i in range(333):
        L = int(rng.integers(0, 40))
        seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), L))
        recs.append(b"@r%d desc\n%s\n+\n%s\n" % (i, seq, b"I" * L))
    path = tmp_path / "many.fastq.gz"
    path.write_bytes(gzip.compress(b"".join(recs)))
    nb, pb = _read_both(str(path), batch_reads=50, keep_headers=True,
                        validate=False)
    _assert_equal(nb, pb)
    assert sum(len(b) for b in nb) == 333


def test_capacity_break_before_padded_final_record(tmp_path):
    # last record has a quality line without trailing newline AND the flat
    # buffer fills just before it: the EOF pad must not be consumed by the
    # rejected attempt (regression: stale final_pad_done -> spurious error)
    n, L = 105, 10000
    recs = []
    for i in range(n):
        recs.append(b"@r%d\n" % i + b"A" * L + b"\n+\n" + b"I" * L + b"\n")
    raw = b"".join(recs)[:-1]  # strip the very last newline
    path = tmp_path / "cap.fastq.gz"
    path.write_bytes(gzip.compress(raw))
    nb, pb = _read_both(str(path), batch_reads=1024, keep_headers=True,
                        validate=False)
    _assert_equal(nb, pb)
    assert sum(len(b) for b in nb) == n


def test_flat_headers_empty_header_line_raises(tmp_path):
    """An empty header line must raise the FASTQ validation error, not
    IndexError, on the flat-header path (its start offset can equal the
    flat buffer length when it is the last record)."""
    import gzip
    import pytest
    from ngsbits_tpu.io.fastq import FastqReader

    p = tmp_path / "bad.fastq.gz"
    with gzip.open(p, "wb") as fh:
        fh.write(b"@r1\nACGT\n+\nIIII\n\nACGT\n+\nIIII\n")
    r = FastqReader(str(p), keep_headers=True, flat_headers=True)
    with pytest.raises(ValueError, match="First header line"):
        list(r)


def test_bgzf_fastq_routing(tmp_path):
    """bgzip-compressed FASTQ decodes through the parallel BGZF path with
    identical batches to the plain-gzip stream."""
    import gzip
    import numpy as np
    from ngsbits_tpu.io.bgzf import bgzf_compress
    from ngsbits_tpu.io.fastq import FastqReader

    recs = []
    rng = np.random.default_rng(3)
    for i in range(5000):
        L = int(rng.integers(40, 150))
        bases = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), L))
        quals = bytes(rng.integers(33, 74, L, dtype=np.uint8))
        recs.append(b"@r%d some comment\n%s\n+\n%s\n" % (i, bases, quals))
    raw = b"".join(recs)
    p_gz = tmp_path / "a.fastq.gz"
    p_bgzf = tmp_path / "b.fastq.gz"
    with gzip.open(p_gz, "wb") as fh:
        fh.write(raw)
    p_bgzf.write_bytes(bgzf_compress(raw, level=4))

    def read_all(path):
        out = []
        for b in FastqReader(str(path), keep_headers=True, batch_reads=777):
            b.materialize_headers()
            for i in range(len(b)):
                out.append((b.headers[i], b.bases[i, :b.lengths[i]].tobytes(),
                            b.quals[i, :b.lengths[i]].tobytes()))
        return out

    a = read_all(p_gz)
    c = read_all(p_bgzf)
    assert len(a) == len(c) == 5000
    assert a == c


def test_whole_gz_skips_empty_members(tmp_path):
    """Concatenated gzip with an EMPTY member in the middle: every record
    after it must still be read (zlib's gzread semantics)."""
    import gzip as _gz
    rec_a = b"@r1\nACGT\n+\nIIII\n"
    rec_b = b"@r2\nTTTT\n+\nIIII\n"
    p = tmp_path / "multi.fastq.gz"
    p.write_bytes(_gz.compress(rec_a) + _gz.compress(b"") + _gz.compress(rec_b))
    from ngsbits_tpu.io.fastq import FastqReader
    batches = list(FastqReader(str(p), keep_headers=True))
    n = sum(len(b) for b in batches)
    assert n == 2, f"read {n} records, expected 2 (empty member dropped the tail?)"


def test_whole_gz_corrupt_second_member_errors(tmp_path):
    """Corruption inside a later member must ERROR, not truncate silently."""
    import gzip as _gz
    rec = b"@r1\nACGT\n+\nIIII\n"
    m1 = _gz.compress(rec)
    m2 = bytearray(_gz.compress(b"@r2\nGGGG\n+\nIIII\n"))
    m2[len(m2) // 2] ^= 0xFF  # flip a payload bit
    p = tmp_path / "corrupt.fastq.gz"
    p.write_bytes(m1 + bytes(m2))
    from ngsbits_tpu.io.fastq import FastqReader
    with pytest.raises(Exception):
        list(FastqReader(str(p)))


def test_whole_gz_trailing_garbage_is_eof(tmp_path):
    """Non-gzip trailing bytes after the last member: clean EOF."""
    import gzip as _gz
    p = tmp_path / "trail.fastq.gz"
    p.write_bytes(_gz.compress(b"@r1\nACGT\n+\nIIII\n") + b"JUNKJUNKJUNKJUNK\x00\x01\x02")
    from ngsbits_tpu.io.fastq import FastqReader
    batches = list(FastqReader(str(p)))
    assert sum(len(b) for b in batches) == 1
