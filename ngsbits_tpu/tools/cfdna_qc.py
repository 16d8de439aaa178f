"""CfDnaQC — QC metrics for cfDNA samples.

Behavioral reference: ngs-bits src/CfDnaQC/main.cpp (panel split by
'SNP_for_sample_identification:' annotation, avgCoverage with 3 decimals,
250x depth threshold, SampleSimilarity on the 60bp-extended panel,
umiVar error-rate parsing with precision-8 output).
"""

from __future__ import annotations

import math
import os
import sys

from ..core.intervals import BedFile, BedLine
from ..core.qcml import QCCollection, QCValue
from ..qc import coverage as cov
from ..qc import sample_similarity as ss
from .toolbase import ToolBase, ToolError


def _basename_no_ext(path: str) -> str:
    # QFileInfo::baseName(): file name up to (excluding) the first '.'
    return os.path.basename(path).split(".")[0]


class CfDnaQCTool(ToolBase):
    name = "CfDnaQC"
    description = "Calculates QC metrics for cfDNA samples."

    def setup(self):
        self.add_infile("bam", "Input BAM/CRAM file.")
        self.add_infile("cfdna_panel", "Input BED file containing the (personalized) cfDNA panel.")
        self.add_outfile("out", "Output qcML file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("tumor_bam", "Input tumor BAM/CRAM file for sample similarity.", optional=True)
        self.add_infile_list("related_bams", "BAM files of related cfDNA samples to compute sample similarity.", optional=True)
        self.add_infile("error_rates", "Input TSV containing umiVar error rates.", optional=True)
        self.add_enum("build", "Genome build used to generate the input.", optional=True,
                      valid=("hg19", "hg38"), default="hg38")
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_int("min_mapq", "Set minimal mapping quality.", optional=True, default=0)
        self.add_flag("txt", "Writes TXT format instead of qcML.")
        self.add_int("threads", "The number of threads used for coverage calculation.", optional=True, default=1)

    def main(self):
        bam = self.get("bam")
        cfdna_panel_path = self.get("cfdna_panel")
        out = self.get("out")
        tumor_bam = self.get("tumor_bam") or ""
        related_bams = self.get_infile_list("related_bams")
        umivar_error_rate_file = self.get("error_rates") or ""
        min_mapq = self.get_int("min_mapq")
        build = self.get_enum("build")
        ref = self.get_ref()
        if not ref:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        threads = self.get_int("threads")

        required_depth = 250

        # split panel in ID and monitoring SNPs (gene/hotspot regions)
        cfdna_panel = BedFile.from_file(cfdna_panel_path)
        id_snps = BedFile()
        monitoring_snps = BedFile()
        for line in cfdna_panel.lines:
            dup = BedLine(line.chr, line.start, line.end, list(line.annotations))
            if line.annotations and line.annotations[0].startswith(b"SNP_for_sample_identification:"):
                id_snps.append(dup)
            else:
                monitoring_snps.append(dup)
        id_snps.clear_annotations()
        monitoring_snps.clear_annotations()

        # average depth over monitoring SNPs (annotation parsed back like the
        # reference, so the 3-decimal rounding feeds the 250x threshold)
        cov.avg_coverage(monitoring_snps, bam, min_mapq, threads, 3)
        monitoring_avg_depth = 0.0
        covered_monitoring_snps = 0
        for l in monitoring_snps.lines:
            pos_depth = float(l.annotations[0])
            monitoring_avg_depth += pos_depth * (l.end - l.start + 1)
            if pos_depth >= required_depth:
                covered_monitoring_snps += 1
        monitoring_avg_depth /= len(monitoring_snps)

        cov.avg_coverage(id_snps, bam, min_mapq, threads, 3)
        id_avg_depth = 0.0
        covered_id_snps = 0
        for l in id_snps.lines:
            pos_depth = float(l.annotations[0])
            id_avg_depth += pos_depth * (l.end - l.start + 1)
            if pos_depth >= required_depth:
                covered_id_snps += 1
        if len(id_snps):
            id_avg_depth /= len(id_snps)

        # sample similarity on the 60bp-extended panel
        cfdna_panel.extend(60)
        cfdna_geno = ss.genotypes_from_bam(build, bam, 30, 2000, False, roi=cfdna_panel)

        tumor_correlation = 0.0
        if tumor_bam:
            tumor_geno = ss.genotypes_from_bam(build, tumor_bam, 30, 2000, False, roi=cfdna_panel)
            tumor_correlation = ss.calculate_similarity(cfdna_geno, tumor_geno).sample_correlation

        related_correlation = []
        for related_bam in related_bams:
            geno = ss.genotypes_from_bam(build, related_bam, 30, 2000, False, roi=cfdna_panel)
            corr = ss.calculate_similarity(cfdna_geno, geno).sample_correlation
            related_correlation.append(f"{_basename_no_ext(related_bam)}:{corr:.2f}")

        # parse umiVar error rates (col 0 = rate or NA, col 4 = duplication level)
        umivar_error_rates: dict[str, float] = {}
        if umivar_error_rate_file:
            with open(umivar_error_rate_file, "rb") as fh:
                for raw in fh:
                    line = raw.strip().decode()
                    if line.startswith("ER"):
                        continue
                    if not line:
                        continue
                    columns = line.split("\t")
                    rate = math.nan
                    if columns[0].strip() != "NA":
                        rate = float(columns[0])
                    umivar_error_rates[columns[4].strip()] = rate

        # metadata
        metadata = [QCValue.from_string("source file", os.path.basename(bam), "", "QC:1000005")]
        precision_overwrite: dict[str, int] = {}
        if tumor_bam:
            metadata.append(QCValue.from_string("source file", os.path.basename(tumor_bam) + " (tumor)", "", "QC:1000005"))
        for related_bam in related_bams:
            metadata.append(QCValue.from_string("source file", os.path.basename(related_bam) + " (related cfDNA)", "", "QC:1000005"))
        metadata.append(QCValue.from_string("linked file", os.path.basename(cfdna_panel_path), "", "QC:1000006"))
        if umivar_error_rate_file:
            metadata.append(QCValue.from_string("linked file", os.path.basename(umivar_error_rate_file), "", "QC:1000006"))

        metrics = QCCollection()
        metrics.insert(QCValue.from_double("monitoring variant read depth", monitoring_avg_depth, "", "QC:2000077"))
        metrics.insert(QCValue.from_int("monitoring variant count", len(monitoring_snps), "", "QC:2000079"))
        metrics.insert(QCValue.from_double("250x coverage monitoring variant percentage",
                                           100.0 * covered_monitoring_snps / len(monitoring_snps), "", "QC:2000080"))
        metrics.insert(QCValue.from_int("ID variant count", len(id_snps), "", "QC:2000081"))
        if len(id_snps) > 0:
            metrics.insert(QCValue.from_double("ID variant read depth", id_avg_depth, "", "QC:2000078"))
            metrics.insert(QCValue.from_double("250x coverage ID variant percentage",
                                               100.0 * covered_id_snps / len(id_snps), "", "QC:2000082"))
        if tumor_bam:
            metrics.insert(QCValue.from_double("cfDNA-tumor correlation", tumor_correlation, "", "QC:2000083"))
        if related_correlation:
            metrics.insert(QCValue.from_string("cfDNA-cfDNA correlation", ", ".join(related_correlation), "", "QC:2000084"))
        if umivar_error_rate_file:
            names = {"1x": ("umiVar error rate 1-fold duplication", "QC:2000085"),
                     "2x": ("umiVar error rate 2-fold duplication", "QC:2000086"),
                     "3x": ("umiVar error rate 3-fold duplication", "QC:2000087"),
                     "4x": ("umiVar error rate 4-fold duplication", "QC:2000088")}
            for key in sorted(umivar_error_rates):  # QMap lexicographic key order
                if key in names:
                    name, acc = names[key]
                    metrics.insert(QCValue.from_double(name, umivar_error_rates[key], "", acc))
            for name, _ in names.values():
                precision_overwrite[name] = 8

        parameters = ""
        if tumor_bam:
            parameters += " -tumor_bam " + tumor_bam
        if related_bams:
            parameters += " -related_bams"
            for related_bam in related_bams:
                parameters += " " + os.path.basename(related_bam)
        if umivar_error_rate_file:
            parameters += " -error_rates " + umivar_error_rate_file

        if self.get_flag("txt"):
            text = "".join(l + "\n" for l in metrics.to_string_list())
            if out:
                with open(out, "w") as fh:
                    fh.write(text)
            else:
                sys.stdout.write(text)
        else:
            metrics.store_to_qcml(out or None, [], parameters, precision_overwrite, metadata)


TOOLS = {"CfDnaQC": CfDnaQCTool}
