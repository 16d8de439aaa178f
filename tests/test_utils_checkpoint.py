"""utils (log/trace) and QC checkpoint/resume."""

import io
import time

import numpy as np
import pytest

from ngsbits_tpu.io.fastq import FastqReader
from ngsbits_tpu.qc.checkpoint import load_readstats, save_readstats
from ngsbits_tpu.qc.read_stats import ReadStatistics, FORWARD, REVERSE
from ngsbits_tpu.utils import log, trace


def test_stage_timer():
    stream = io.StringIO()
    with trace.StageTimer(enabled=True, stream=stream) as t:
        with t.stage("step one"):
            pass
    assert "step one took: " in stream.getvalue()
    assert t.report()[0][0] == "step one"
    # disabled: collects but prints nothing
    stream2 = io.StringIO()
    t2 = trace.StageTimer(enabled=False, stream=stream2)
    with t2.stage("quiet"):
        pass
    assert stream2.getvalue() == "" and len(t2.report()) == 1


def test_progress_reporter():
    stream = io.StringIO()
    p = trace.ProgressReporter(1, stream=stream)  # 1ms interval
    p.update(processed_reads=100)
    time.sleep(0.01)
    p.update(processed_reads=200)
    out = stream.getvalue()
    assert "progress - processed_reads:100" in out
    assert "processed_reads:200" in out
    # disabled
    stream2 = io.StringIO()
    trace.ProgressReporter(-1, stream=stream2).update(x=1)
    assert stream2.getvalue() == ""


def test_log(tmp_path, capsys):
    logfile = tmp_path / "test.log"
    log.set_file_name(str(logfile))
    log.info("hello info")
    log.warn("hello warn")
    log.error("hello error")
    captured = capsys.readouterr()
    assert "INFO\thello info" in captured.out
    assert "ERROR\thello error" in captured.err
    content = logfile.read_text()
    assert content.count("hello") == 3
    log.set_file_name(None)


def test_readstats_checkpoint_resume(tmp_path, ref_data_in):
    f1 = str(ref_data_in / "ReadQC_in1.fastq.gz")
    f2 = str(ref_data_in / "ReadQC_in2.fastq.gz")

    # direct: both files in one accumulator
    direct = ReadStatistics()
    for fn, d in ((f1, FORWARD), (f2, REVERSE)):
        for batch in FastqReader(fn):
            direct.update_batch(batch, d)

    # checkpointed: first file, snapshot, restore, second file
    part = ReadStatistics()
    for batch in FastqReader(f1):
        part.update_batch(batch, FORWARD)
    ckpt = tmp_path / "readqc.ckpt.npz"
    save_readstats(part, str(ckpt), shards_done=1)
    resumed, meta = load_readstats(str(ckpt))
    assert meta["shards_done"] == 1
    for batch in FastqReader(f2):
        resumed.update_batch(batch, REVERSE)

    a = direct.get_result().to_string_list()
    b = resumed.get_result().to_string_list()
    assert a == b


def test_checkpoint_roundtrip_empty(tmp_path):
    stats = ReadStatistics(single_end=True)
    path = tmp_path / "empty.npz"
    save_readstats(stats, str(path))
    restored, meta = load_readstats(str(path))
    assert restored.single_end
    assert restored.c_forward == 0
    np.testing.assert_array_equal(restored.pileups, stats.pileups)
