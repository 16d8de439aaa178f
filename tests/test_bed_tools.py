"""BED tool golden parity vs reference tools-TEST (Bed*_Test.cpp)."""

import pytest

from helpers import compare_files, execute

CPPNGS_DATA = "/root/reference/src/cppNGS-TEST/data_in"


def run_and_compare(tool, args, out, golden, ref_data_out):
    assert execute(tool, args + ["-out", out]) == 0
    compare_files(out, ref_data_out / golden)


def test_bed_merge(ref_data_in, ref_data_out, tmp_path):
    for i, infile in [(1, "exome.bed"), (2, "BedMerge_in1.bed")]:
        out = tmp_path / f"m{i}.bed"
        run_and_compare("BedMerge", ["-in", ref_data_in / infile], out,
                        f"BedMerge_test{i:02d}_out.bed", ref_data_out)


def test_bed_sort(ref_data_in, ref_data_out, tmp_path):
    run_and_compare("BedSort", ["-in", ref_data_in / "exome.bed"],
                    tmp_path / "s1.bed", "BedSort_test01_out.bed", ref_data_out)
    run_and_compare("BedSort", ["-in", ref_data_in / "BedSort_in2.bed", "-uniq"],
                    tmp_path / "s2.bed", "BedSort_test02_out.bed", ref_data_out)
    run_and_compare("BedSort", ["-in", ref_data_in / "BedSort_in1.bed", "-with_name"],
                    tmp_path / "s3.bed", "BedSort_test03_out.bed", ref_data_out)


def test_bed_add(ref_data_in, ref_data_out, tmp_path):
    run_and_compare("BedAdd", ["-in", ref_data_in / "BedAdd_in1.bed", ref_data_in / "BedAdd_in2.bed"],
                    tmp_path / "a1.bed", "BedAdd_out1.bed", ref_data_out)


def test_bed_extend(ref_data_in, ref_data_out, tmp_path):
    run_and_compare("BedExtend", ["-in", ref_data_in / "BedExtend_in1.bed", "-n", "100"],
                    tmp_path / "e1.bed", "BedExtend_test01_out.bed", ref_data_out)
    run_and_compare("BedExtend", ["-in", ref_data_in / "BedExtend_in2.bed",
                                  "-fai", ref_data_in / "hg19.fa.fai", "-n", "100"],
                    tmp_path / "e2.bed", "BedExtend_test02_out.bed", ref_data_out)


def test_bed_shrink(ref_data_in, ref_data_out, tmp_path):
    run_and_compare("BedShrink", ["-in", ref_data_in / "BedShrink_in1.bed", "-n", "25"],
                    tmp_path / "sh1.bed", "BedShrink_test01_out.bed", ref_data_out)


def test_bed_subtract(ref_data_in, ref_data_out, tmp_path):
    run_and_compare("BedSubtract", ["-in", ref_data_in / "BedSubtract_in1.bed",
                                    "-in2", ref_data_in / "BedSubtract_in2.bed"],
                    tmp_path / "su1.bed", "BedSubtract_test01_out.bed", ref_data_out)
    run_and_compare("BedSubtract", ["-in", ref_data_in / "BedSubtract_in2.bed",
                                    "-in2", ref_data_in / "BedSubtract_in1.bed"],
                    tmp_path / "su2.bed", "BedSubtract_test02_out.bed", ref_data_out)


def test_bed_intersect(ref_data_in, ref_data_out, tmp_path):
    run_and_compare("BedIntersect", ["-in", ref_data_in / "exome.bed",
                                     "-in2", f"{CPPNGS_DATA}/panel.bed"],
                    tmp_path / "i1.bed", "BedIntersect_test01_out.bed", ref_data_out)
    run_and_compare("BedIntersect", ["-in", ref_data_in / "BedIntersect_in1.bed",
                                     "-in2", ref_data_in / "BedIntersect_in2.bed",
                                     "-annotation", "in"],
                    tmp_path / "i4.bed", "BedIntersect_test04_out.bed", ref_data_out)
    run_and_compare("BedIntersect", ["-in", ref_data_in / "BedIntersect_in2.bed",
                                     "-in2", ref_data_in / "BedIntersect_in1.bed",
                                     "-annotation", "in2"],
                    tmp_path / "i5.bed", "BedIntersect_test04_out.bed", ref_data_out)
    run_and_compare("BedIntersect", ["-in", ref_data_in / "exome.bed",
                                     "-in2", f"{CPPNGS_DATA}/panel.bed", "-mode", "in"],
                    tmp_path / "i2.bed", "BedIntersect_test02_out.bed", ref_data_out)
    run_and_compare("BedIntersect", ["-in", ref_data_in / "exome.bed",
                                     "-in2", f"{CPPNGS_DATA}/panel.bed", "-mode", "in2"],
                    tmp_path / "i3.bed", "BedIntersect_test03_out.bed", ref_data_out)


def test_bed_chunk(ref_data_in, ref_data_out, tmp_path):
    run_and_compare("BedChunk", ["-in", ref_data_in / "BedChunk_in1.bed", "-n", "100"],
                    tmp_path / "c1.bed", "BedChunk_out1.bed", ref_data_out)


def test_bed_info(ref_data_in, ref_data_out, tmp_path):
    run_and_compare("BedInfo", ["-in", ref_data_in / "exome.bed"],
                    tmp_path / "bi1.txt", "BedInfo_test01_out.txt", ref_data_out)
    run_and_compare("BedInfo", ["-in", ref_data_in / "BedInfo_in2.bed", "-nomerge",
                                "-fai", ref_data_in / "hg19.fa.fai"],
                    tmp_path / "bi2.txt", "BedInfo_test02_out.txt", ref_data_out)
    run_and_compare("BedInfo", ["-in", ref_data_in / "BedInfo_in2.bed", "-filename"],
                    tmp_path / "bi3.txt", "BedInfo_test03_out.txt", ref_data_out)
