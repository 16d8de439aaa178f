"""RnaQC — QC metrics for RNA samples.

Behavioral reference: ngs-bits src/RnaQC/main.cpp + Statistics::
mapping_housekeeping (cppNGS/Statistics.cpp:1361-1380).
"""

from __future__ import annotations

import os
import sys

from ..core.intervals import BedFile
from ..core.qcml import QCCollection, QCValue
from ..io.tsv import TsvFile
from ..qc import mapping_stats
from ..qc.variant_stats import add_qc_value
from .toolbase import ToolBase, ToolError


class RnaQCTool(ToolBase):
    name = "RnaQC"
    description = "Calculates QC metrics for RNA samples."

    def setup(self):
        self.add_infile("bam", "Input BAM/CRAM file.")
        self.add_infile("housekeeping_genes", "BED file containing the exon region of housekeeping genes.", optional=True)
        self.add_infile("roi", "BED file containing the target region of the analysis.", optional=True)
        self.add_outfile("out", "Output qcML file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("splicing", "TSV file containing spliced reads by gene.", optional=True)
        self.add_infile("expression", "TSV file containing RNA expression.", optional=True)
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_int("min_mapq", "Set minimal mapping quality.", optional=True, default=1)
        self.add_flag("txt", "Writes TXT format instead of qcML.")

    def main(self):
        bam = self.get("bam")
        hk = self.get("housekeeping_genes") or ""
        roi = self.get("roi") or ""
        splicing = self.get("splicing") or ""
        expression = self.get("expression") or ""
        ref = self.get_ref()
        if not ref:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")

        rna_qc = QCCollection()
        if hk.strip():
            hk_bed = BedFile.from_file(hk)
            if roi.strip():
                roi_bed = BedFile.from_file(roi)
                hk_bed.intersect(roi_bed)
                hk_bed.sort()
                hk_bed.merge()
            if hk_bed.base_count() > 0:
                mqc = mapping_stats.mapping_roi(hk_bed, bam, ref, self.get_int("min_mapq"))
                add_qc_value(rna_qc, "QC:2000100", "housekeeping genes read percentage",
                             mqc.value("QC:2000021", True).as_double())
                add_qc_value(rna_qc, "QC:2000101", "housekeeping genes read depth",
                             mqc.value("QC:2000025", True).as_double())
                steps = [10, 20, 30, 50, 100, 200, 500]
                src = ["QC:2000026", "QC:2000027", "QC:2000028", "QC:2000029",
                       "QC:2000030", "QC:2000031", "QC:2000032"]
                for i, (step, s) in enumerate(zip(steps, src)):
                    add_qc_value(rna_qc, f"QC:200010{2 + i}",
                                 f"housekeeping genes {step}x percentage",
                                 mqc.value(s, True).as_double())

        if splicing.strip():
            t = TsvFile.from_file(splicing)
            i_frac = t.column_index(b"aberrant_frac")
            n_aberrant = sum(1 for r in t.rows if float(r[i_frac]) >= 0.05)
            rna_qc.insert(QCValue.from_int("aberrant spliced gene count", n_aberrant,
                                           "Number of aberrant spliced genes (>= 5%)", "QC:2000110"))

        if expression.strip():
            t = TsvFile.from_file(expression)
            i_z = t.column_index(b"zscore")
            i_tpm = t.column_index(b"tpm")
            n_outlier = n_covered = 0
            for r in t.rows:
                z = r[i_z]
                if z != b"n/a" and z.strip():
                    if abs(float(z)) >= 3.0:
                        n_outlier += 1
                if float(r[i_tpm]) >= 1.0:
                    n_covered += 1
            rna_qc.insert(QCValue.from_int("outlier gene count", n_outlier,
                                           "Number of outlier genes (zscore >= 3.0)", "QC:2000111"))
            rna_qc.insert(QCValue.from_int("covered gene count", n_covered,
                                           "Number of covered genes (TPM >= 1.0)", "QC:2000109"))

        metadata = [QCValue.from_string("source file", os.path.basename(bam), "", "QC:1000005")]
        parameters = " -bam " + bam
        if splicing.strip():
            metadata.append(QCValue.from_string("source file", os.path.basename(splicing), " (splicing)", "QC:1000005"))
            parameters += " -splicing " + splicing
        if expression.strip():
            metadata.append(QCValue.from_string("source file", os.path.basename(expression), " (expression)", "QC:1000005"))
            parameters += " -expression " + expression
        if hk.strip():
            metadata.append(QCValue.from_string("linked file", os.path.basename(hk), " (housekeeping genes)", "QC:1000006"))
            parameters += " -housekeeping_genes " + hk
        if roi.strip():
            metadata.append(QCValue.from_string("linked file", os.path.basename(roi), " (roi)", "QC:1000006"))
            parameters += " -roi " + roi

        out = self.get("out")
        if self.get_flag("txt"):
            text = "".join(l + "\n" for l in rna_qc.to_string_list())
            if out:
                with open(out, "w") as fh:
                    fh.write(text)
            else:
                sys.stdout.write(text)
        else:
            rna_qc.store_to_qcml(out or None, [], parameters, metadata=metadata)


TOOLS = {"RnaQC": RnaQCTool}
