"""SomaticQC — QC metrics based on tumor-normal pairs.

Behavioral reference: ngs-bits src/SomaticQC/main.cpp.
"""

from __future__ import annotations

import os
import sys

from ..core.intervals import BedFile
from ..core.qcml import QCValue
from ..qc import somatic as somatic_mod
from .toolbase import ToolBase, ToolError


class SomaticQCTool(ToolBase):
    name = "SomaticQC"
    description = "Calculates QC metrics based on tumor-normal pairs."
    extended_description = [
        "SomaticQC integrates the output of the other QC tools and adds several metrics specific for tumor-normal pairs.",
        "All tools produce qcML, a generic XML format for QC of -omics experiments, which we adapted for NGS.",
    ]

    def setup(self):
        self.add_infile("tumor_bam", "Input tumor BAM/CRAM file.")
        self.add_infile("normal_bam", "Input normal BAM/CRAM file.")
        self.add_infile("somatic_vcf", "Input somatic VCF file.")
        self.add_outfile("out", "Output qcML file. If unset, writes to STDOUT.", optional=True)
        self.add_infile_list("links", "Files that appear in the link part of the qcML file.", optional=True)
        self.add_infile("target_bed", "Target file used for tumor and normal experiment.", optional=True)
        self.add_infile("target_exons", "BED file containing target exons, neccessary for TMB calculation. Please provide a file that contains the coordinates of all exons in the reference genome.", optional=True)
        self.add_infile("blacklist", "BED file containing regions which are ignored in TMB calculation.", optional=True)
        self.add_infile("tsg_bed", "BED file containing regions of tumor suppressor genes for TMB calculation.", optional=True)
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_flag("skip_plots", "Skip plots (intended to increase speed of automated tests).")
        self.add_enum("build", "Genome build used to generate the input.", optional=True,
                      valid=("hg19", "hg38"), default="hg38")

    def main(self):
        out = self.get("out")
        tumor_bam = self.get("tumor_bam")
        normal_bam = self.get("normal_bam")
        somatic_vcf = self.get("somatic_vcf")
        target_bed = self.get("target_bed") or ""
        target_exons = self.get("target_exons") or ""
        blacklist = self.get("blacklist") or ""
        tsg_bed = self.get("tsg_bed") or ""
        ref = self.get_ref()
        if not ref:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        links = self.get_infile_list("links")
        skip_plots = self.get_flag("skip_plots")
        build = self.get_enum("build")

        # metadata
        metadata = [
            QCValue.from_string("source file", os.path.basename(tumor_bam) + " (tumor)", "", "QC:1000005"),
            QCValue.from_string("source file", os.path.basename(normal_bam) + " (normal)", "", "QC:1000005"),
            QCValue.from_string("source file", os.path.basename(somatic_vcf), "", "QC:1000005"),
        ]

        # linked files as paths relative to the output directory
        out_dir = os.path.dirname(os.path.abspath(out)) if out else os.getcwd()
        for link in links:
            if not os.path.isfile(link):
                sys.stderr.write(f"Could not find file {link}. Skipping.\n")
                continue
            rel = os.path.relpath(os.path.dirname(os.path.abspath(link)), out_dir)
            rel = "" if rel == "." else rel
            if rel:
                rel += "/"
            metadata.append(QCValue.from_string("linked file", rel + os.path.basename(link), "", "QC:1000006"))

        target_bed_file = BedFile()
        if target_bed:
            target_bed_file = BedFile.from_file(target_bed)

        metrics = somatic_mod.somatic(build, tumor_bam, normal_bam, somatic_vcf,
                                      ref, target_bed_file, skip_plots)
        metrics.insert(somatic_mod.mutation_burden_normalized(
            somatic_vcf, target_exons, target_bed, tsg_bed, blacklist))
        metrics.insert(somatic_mod.mutation_burden(somatic_vcf, target_bed, blacklist))

        parameters = ""
        if target_bed:
            parameters += " -target_bed " + target_bed
        if blacklist:
            parameters += " -blacklist " + blacklist
        if tsg_bed:
            parameters += " -tsg_bed " + tsg_bed
        if target_exons:
            parameters += " -target_exons " + target_exons
        metrics.store_to_qcml(out or None, [], parameters, metadata=metadata)


TOOLS = {"SomaticQC": SomaticQCTool}
