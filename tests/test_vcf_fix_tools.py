"""Golden parity: VcfSplit, VcfReplaceSamples, SnifflesVcfFix, MantaVcfFix,
VariantFilterRegions, TsvAnnotate (reference: src/tools-TEST/*_Test.cpp)."""

import pytest

from helpers import execute, compare_files


def test_vcf_split(ref_data_in, ref_data_out, tmp_path):
    base = str(tmp_path / "VcfSplit_out")
    execute("VcfSplit", ["-in", ref_data_in / "VcfSplit_in1.vcf",
                         "-lines", "100", "-out", base])
    compare_files(base + "0001.vcf", ref_data_out / "VcfSplit_out0001.vcf")
    compare_files(base + "0002.vcf", ref_data_out / "VcfSplit_out0002.vcf")


@pytest.mark.parametrize("inf,ids,golden", [
    ("VcfReplaceSamples_in1.vcf", "NA12878_58=REP1", "VcfReplaceSamples_out1.vcf"),
    ("VcfReplaceSamples_in2.vcf.gz", "NA12878x3_73=REP1,NA12877_49=REP2",
     "VcfReplaceSamples_out2.vcf"),
])
def test_vcf_replace_samples(ref_data_in, ref_data_out, tmp_path, inf, ids, golden):
    out = tmp_path / "r.vcf"
    assert execute("VcfReplaceSamples", ["-in", ref_data_in / inf,
                                         "-out", out, "-ids", ids]) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("n", ["1", "2"])
def test_sniffles_vcf_fix(ref_data_in, ref_data_out, tmp_path, n):
    out = tmp_path / "s.vcf"
    assert execute("SnifflesVcfFix", ["-in", ref_data_in / f"SnifflesVcfFix_in{n}.vcf",
                                      "-out", out]) == 0
    compare_files(out, ref_data_out / f"SnifflesVcfFix_out{n}.vcf")


@pytest.mark.parametrize("inf,golden", [
    ("MantaVcfFix_in1.vcf.gz", "MantaVcfFix_out1.vcf"),
    ("MantaVcfFix_in2.vcf", "MantaVcfFix_out2.vcf"),
])
def test_manta_vcf_fix(ref_data_in, ref_data_out, tmp_path, inf, golden):
    out = tmp_path / "m.vcf"
    assert execute("MantaVcfFix", ["-in", ref_data_in / inf, "-out", out]) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("args,golden", [
    (["-in", "VariantFilterRegions_in.tsv", "-reg", "VariantFilterRegions_in.bed",
      "-mode", "gsvar"], "VariantFilterRegions_out1.tsv"),
    (["-in", "VariantFilterRegions_in2.vcf", "-reg", "VariantFilterRegions_in.bed"],
     "VariantFilterRegions_out2.vcf"),
    (["-in", "VariantFilterRegions_in.tsv", "-reg", "VariantFilterRegions_in.bed",
      "-inv", "-mode", "gsvar"], "VariantFilterRegions_out3.tsv"),
    (["-in", "VariantFilterRegions_in.tsv", "-r", "chr2:70,000,000-120,000,000",
      "-mode", "gsvar"], "VariantFilterRegions_out4.tsv"),
    (["-in", "VariantFilterRegions_in.tsv", "-reg", "VariantFilterRegions_in.bed",
      "-mark", "off-target", "-mode", "gsvar"], "VariantFilterRegions_out5.tsv"),
    (["-in", "VariantFilterRegions_in4.vcf", "-reg", "VariantFilterRegions_in2.bed",
      "-mark", "off-target"], "VariantFilterRegions_out9.vcf"),
    (["-in", "VariantFilterRegions_in.tsv", "-reg", "VariantFilterRegions_in.bed",
      "-mark", "off-target", "-inv", "-mode", "gsvar"], "VariantFilterRegions_out7.tsv"),
    (["-in", "VariantFilterRegions_in3.vcf", "-r", "chr1:156341000-156351795"],
     "VariantFilterRegions_out8.vcf"),
])
def test_variant_filter_regions(ref_data_in, ref_data_out, tmp_path, args, golden):
    out = tmp_path / ("o" + golden[-4:])
    full = []
    it = iter(args)
    for a in it:
        full.append(a)
        if a in ("-in", "-reg"):
            full.append(ref_data_in / next(it))
        elif a in ("-r", "-mark", "-mode"):
            full.append(next(it))
    assert execute("VariantFilterRegions", full + ["-out", out]) == 0
    compare_files(out, ref_data_out / golden)


def test_tsv_annotate(ref_data_in, ref_data_out, tmp_path):
    out1 = tmp_path / "a1.tsv"
    assert execute("TsvAnnotate", ["-in1", ref_data_in / "TsvAnnotate_in1.tsv",
                                   "-c1", "ps", "-in2", ref_data_in / "TsvAnnotate_in2.tsv",
                                   "-c2", "ps2", "-anno", "score2,score3",
                                   "-mv", "XXX", "-out", out1]) == 0
    compare_files(out1, ref_data_out / "TsvAnnotate_out1.tsv")
    out2 = tmp_path / "a2.tsv"
    assert execute("TsvAnnotate", ["-in1", ref_data_in / "TsvAnnotate_in1.tsv",
                                   "-c1", "ps", "-in2", ref_data_in / "TsvAnnotate_in1.tsv",
                                   "-anno", "score", "-out", out2]) == 0
    compare_files(out2, ref_data_out / "TsvAnnotate_out2.tsv")
