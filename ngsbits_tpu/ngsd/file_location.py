"""File-location model for analysis folders.

Behavioral reference: ngs-bits cppNGSD/FileLocation.h +
FileLocationProviderLocal.cpp — derives the standard sibling file paths
(BAM/VCF/SV/CNV/BAF/...) of a GSvar analysis from its folder layout and
sample header.  Used by the GSvarServer ``file_location`` endpoint.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass


# PathType enum order (FileLocation.h:11-70); names double as the
# typeToString() representation
PATH_TYPES = [
    "SAMPLE_FOLDER", "FUSIONS_PIC_DIR", "BAM", "VIRAL_BAM", "CRAM",
    "VCF", "GSVAR", "COPY_NUMBER_CALLS", "COPY_NUMBER_CALLS_MOSAIC",
    "STRUCTURAL_VARIANTS", "REPEAT_EXPANSIONS", "UPD",
    "LOWCOV_BED", "MSI", "BAF", "ROH", "PRS", "MANTA_EVIDENCE",
    "COPY_NUMBER_RAW_DATA", "CNV_RAW_DATA_CALL_REGIONS", "CIRCOS_PLOT",
    "REPEAT_EXPANSION_IMAGE", "REPEAT_EXPANSION_HISTOGRAM", "FUSIONS",
    "FUSIONS_BAM", "MANTA_FUSIONS", "COUNTS", "EXPRESSION",
    "EXPRESSION_COHORT", "EXPRESSION_STATS", "EXPRESSION_CORR",
    "EXPRESSION_EXON", "SPLICING_BED", "SPLICING_ANN", "VIRAL",
    "VCF_CF_DNA", "MRD_CF_DNA", "CFDNA_CANDIDATES", "QC",
    "IGV_SCREENSHOT", "HLA_GENOTYPER", "SIGNATURE_SBS", "SIGNATURE_ID",
    "SIGNATURE_DBS", "SIGNATURE_CNV", "METHYLATION", "METHYLATION_IMAGE",
    "METHYLATION_COHORT_IMAGE", "PARAPHASE_EVIDENCE", "OTHER",
]

# FileLocation::typeToHumanReadableString (FileLocation.h:318-424)
PATH_TYPE_HUMAN_READABLE = {
    "SAMPLE_FOLDER": "sample/analysis folder",
    "BAM": "BAM file",
    "CRAM": "compressed version of a BAM file",
    "VIRAL_BAM": "viral BAM file",
    "VCF": "small variant calls",
    "GSVAR": "GSvar file",
    "BAF": "b-allele frequency file",
    "COPY_NUMBER_CALLS": "copy-number calls",
    "COPY_NUMBER_CALLS_MOSAIC": "copy-number calls (mosaic)",
    "COPY_NUMBER_RAW_DATA": "copy-number raw data",
    "CNV_RAW_DATA_CALL_REGIONS": "copy-number raw data for call regions",
    "MANTA_EVIDENCE": "evidence BAM file for structural variants",
    "REPEAT_EXPANSIONS": "repeat expansions",
    "LOWCOV_BED": "low coverage regions",
    "MSI": "MSI files",
    "ROH": "runs of homozygosity",
    "PRS": "polygenic risk scores",
    "CIRCOS_PLOT": "circos plot",
    "STRUCTURAL_VARIANTS": "structural variant calls",
    "UPD": "uniparental disomy regions",
    "REPEAT_EXPANSION_IMAGE": "repeat expansion visualization",
    "REPEAT_EXPANSION_HISTOGRAM":
        "repeat expansion length distribution visualization",
    "FUSIONS": "gene fusions",
    "FUSIONS_PIC_DIR": "arriba fusions pictures directory",
    "FUSIONS_BAM": "gene fusions evidence alignments",
    "SPLICING_BED": "splicing junctions",
    "SPLICING_ANN": "annotated splicing junctions",
    "MANTA_FUSIONS": "gene fusions called by Manta",
    "COUNTS": "RNA counts",
    "VIRAL": "viral DNA",
    "OTHER": "other files",
    "VCF_CF_DNA": "cfDNA small variant calls",
    "QC": "variant list QC (qcML) files",
    "EXPRESSION": "RNA relative expression",
    "EXPRESSION_COHORT": "RNA relative expression of cohort",
    "EXPRESSION_STATS": "RNA expression cohort statistics",
    "EXPRESSION_CORR": "RNA epxression correlation to cohort",
    "EXPRESSION_EXON": "RNA relative exon expression",
    "MRD_CF_DNA": "measurable residual disease value (umiVar 2)",
    "CFDNA_CANDIDATES": "pre-selected variants for cfDNA panel design.",
    "IGV_SCREENSHOT": "IGV screenshot",
    "HLA_GENOTYPER": "HLA called by hla genotyper",
    "SIGNATURE_SBS": "SBS signature",
    "SIGNATURE_ID": "ID signature",
    "SIGNATURE_DBS": "DBS signature",
    "SIGNATURE_CNV": "CNV signature",
    "METHYLATION": "methylation calls",
    "METHYLATION_IMAGE": "image of a given methylation locus",
    "METHYLATION_COHORT_IMAGE": "cohort plot of a given methylation locus",
    "PARAPHASE_EVIDENCE": "Mapping of pseudo gene regions (Paraphase)",
}


def type_to_string(path_type: str) -> str:
    """FileLocation::typeToString (FileLocation.h:152-259)."""
    if path_type not in PATH_TYPES:
        raise ValueError(f"Unhandled path type '{path_type}' in typeToString()!")
    return path_type


def string_to_type(text: str) -> str:
    """FileLocation::stringToType (FileLocation.h:261-316)."""
    upper = text.upper().strip()
    if upper not in PATH_TYPES:
        raise ValueError(f"Unhandled path type string '{upper}' in "
                         "stringToType()!")
    return upper


def type_to_human_readable_string(path_type: str) -> str:
    """FileLocation::typeToHumanReadableString (FileLocation.h:318-424)."""
    if path_type not in PATH_TYPE_HUMAN_READABLE:
        raise ValueError(f"Unhandled path type '{path_type}' in "
                         "typeToHumanReadableString()!")
    return PATH_TYPE_HUMAN_READABLE[path_type]


@dataclass
class FileLocation:
    """cppNGSD/FileLocation.h — id + type + path + existence."""
    id: str
    type: str
    filename: str
    exists: bool

    def to_json_obj(self) -> dict:
        return {"id": self.id, "type": self.type,
                "filename": self.filename, "exists": self.exists}


def _gsvar_header_info(gsvar_file: str):
    """(analysis_type, [(sample_name, properties)]) from the GSvar header
    (VariantList::loadHeaderOnly analogue)."""
    analysis_type = "GERMLINE_SINGLESAMPLE"
    samples = []
    opener = open
    with opener(gsvar_file, "rb") as fh:
        for raw in fh:
            line = raw.strip()
            if not line.startswith(b"##"):
                break
            if line.startswith(b"##ANALYSISTYPE="):
                analysis_type = line[15:].decode()
            elif line.startswith(b"##SAMPLE=<"):
                parts = line[10:-1].split(b",")
                i = 1
                while i < len(parts):
                    if b"=" not in parts[i]:
                        parts[i - 1] += b"," + parts[i]
                        del parts[i]
                    else:
                        i += 1
                name, props = "", {}
                for part in parts:
                    sep = part.find(b"=")
                    k, v = part[:sep].decode(), part[sep + 1:].decode()
                    if k == "ID":
                        name = v
                    else:
                        props[k] = v
                samples.append((name, props))
    return analysis_type, samples


class FileLocationProviderLocal:
    """FileLocationProviderLocal.cpp — path derivation for a local GSvar
    analysis folder."""

    def __init__(self, gsvar_file: str, ngsd=None):
        self.ps = os.path.basename(gsvar_file)
        self.ps = self.ps[:-6] if self.ps.endswith(".GSvar") else os.path.splitext(self.ps)[0]
        self.ps_folder = os.path.dirname(os.path.abspath(gsvar_file)) + "/"
        self.analysis_type, self.samples = _gsvar_header_info(gsvar_file)
        self.ngsd = ngsd
        if not self.ps:
            raise ValueError(f"Could not determine processed sample name from "
                             f"GSvar file '{gsvar_file}'!")
        if not self.samples:
            # single-sample fallback: the base name is the sample
            self.samples = [(self.ps, {})]

    # ---- helpers ----
    def _project_path(self) -> str:
        return os.path.dirname(self.ps_folder.rstrip("/"))

    def _base_locations(self) -> list[tuple[str, str]]:
        """(sample id, path prefix) per sample (getBaseLocations)."""
        if self.analysis_type in ("GERMLINE_SINGLESAMPLE", "CFDNA"):
            sid = self.samples[0][0]
            return [(sid, self.ps_folder + sid)]
        out = []
        project_folder = self._project_path()
        for name, _props in self.samples:
            if self.ngsd is not None:
                try:
                    ps_id = self.ngsd.processed_sample_id(name, False)
                    sample_path = self.ngsd.processed_sample_path(ps_id, "SAMPLE_FOLDER")
                    out.append((name, sample_path + name))
                    continue
                except Exception:
                    pass
            out.append((name, f"{project_folder}/Sample_{name}/{name}"))
        return out

    @staticmethod
    def _loc(sid, type_, path) -> FileLocation:
        return FileLocation(sid, type_, path, os.path.exists(path))

    def _per_sample(self, type_, suffix, return_if_missing=True) -> list[FileLocation]:
        out = []
        for sid, prefix in self._base_locations():
            loc = self._loc(sid, type_, prefix + suffix)
            if loc.exists or return_if_missing:
                out.append(loc)
        return out

    # ---- single analysis-level files ----
    def analysis_vcf(self) -> FileLocation:
        return self._loc(self.ps, "VCF", self.ps_folder + self.ps + "_var_annotated.vcf.gz")

    def analysis_sv_file(self) -> FileLocation:
        f = self.ps_folder + self.ps + "_var_structural_variants.bedpe"
        if not os.path.exists(f):  # old manta file name fallback
            f = self.ps_folder + self.ps + "_manta_var_structural.bedpe"
        return self._loc(self.ps, "STRUCTURAL_VARIANTS", f)

    def analysis_cnv_file(self) -> FileLocation:
        if self.analysis_type in ("SOMATIC_SINGLESAMPLE", "SOMATIC_PAIR"):
            f = self.ps_folder + self.ps + "_clincnv.tsv"
        else:
            f = self.ps_folder + self.ps + "_cnvs_clincnv.tsv"
        return self._loc(self.ps, "COPY_NUMBER_CALLS", f)

    def somatic_msi_file(self) -> FileLocation:
        """FileLocationProviderLocal::getSomaticMsiFile (:410-417)."""
        if self.analysis_type not in ("SOMATIC_SINGLESAMPLE", "SOMATIC_PAIR"):
            raise ValueError("Invalid call of somatic_msi_file() on variant list type "
                             f"{self.analysis_type}!")
        return self._loc(self.ps, "MSI", self.ps_folder + self.ps + "_msi.tsv")

    def analysis_mosaic_cnv_file(self) -> FileLocation:
        return self._loc(self.ps, "COPY_NUMBER_CALLS_MOSAIC",
                         self.ps_folder + self.ps + "_mosaic_cnvs.tsv")

    def analysis_upd_file(self) -> FileLocation:
        return self._loc(self.ps, "UPD", self.ps_folder + self.ps + "_upd.tsv")

    def repeat_expansion_image(self, locus: str) -> FileLocation:
        f = f"{self.ps_folder}repeat_expansions/{self.ps}_repeats_expansionhunter_{locus}.svg"
        if not os.path.exists(f):
            f = f"{self.ps_folder}repeat_expansions/{self.ps}_repeats_{locus}.svg"
        return self._loc(self.ps, "REPEAT_EXPANSION_IMAGE", f)

    def repeat_expansion_histogram(self, locus: str) -> FileLocation:
        f = f"{self.ps_folder}repeat_expansions/{self.ps}_repeats_{locus}_hist.svg"
        return self._loc(self.ps, "REPEAT_EXPANSION_HISTOGRAM", f)

    def qc_files(self) -> list[FileLocation]:
        return [FileLocation(self.ps, "QC", f, True)
                for f in sorted(glob.glob(self.ps_folder + "*.qcML"))]

    # ---- per-sample lists ----
    def bam_files(self, return_if_missing=True) -> list[FileLocation]:
        out = []
        for sid, prefix in self._base_locations():
            path = prefix + ".bam"
            if os.path.exists(prefix + ".cram"):
                path = prefix + ".cram"
            loc = self._loc(sid, "BAM", path)
            if loc.exists or return_if_missing:
                out.append(loc)
        return out

    def viral_bam_files(self, rim=True):
        return self._per_sample("VIRAL_BAM", "_viral.bam", rim)

    def vcf_files(self, rim=True):
        return self._per_sample("VCF", "_var_annotated.vcf.gz", rim)

    def cnv_coverage_files(self, rim=True):
        return self._per_sample("COPY_NUMBER_RAW_DATA", "_cnvs_clincnv.seg", rim)

    def copy_number_call_files(self, rim=True):
        return self._per_sample("COPY_NUMBER_CALLS", "_cnvs_clincnv.tsv", rim)

    def baf_files(self, rim=True):
        out = self._per_sample("BAF", "_bafs.igv", rim)
        if self.analysis_type == "SOMATIC_PAIR":
            f = self.ps_folder + self.ps + "_bafs.igv"
            loc = FileLocation(self.ps + " (somatic)", "BAF", f, os.path.exists(f))
            if loc.exists or rim:
                out.append(loc)
        return out

    def manta_evidence_files(self, rim=True):
        out = []
        for sid, prefix in self._base_locations():
            folder = prefix[: len(prefix) - len(sid)]
            loc = self._loc(sid, "MANTA_EVIDENCE",
                            f"{folder}manta_evid/{sid}_manta_evidence.bam")
            if loc.exists or rim:
                out.append(loc)
        return out

    def circos_plot_files(self, rim=True):
        return self._per_sample("CIRCOS_PLOT", "_circos.png", rim)

    def expression_files(self, rim=True):
        return self._per_sample("EXPRESSION", "_expr.tsv", rim)

    def repeat_expansion_files(self, rim=True):
        out = []
        for sid, prefix in self._base_locations():
            f = prefix + "_repeats_expansionhunter.vcf"
            if not os.path.exists(f):
                f = prefix + "_repeats.vcf"
            loc = self._loc(sid, "REPEAT_EXPANSIONS", f)
            if loc.exists or rim:
                out.append(loc)
        return out

    def prs_files(self, rim=True):
        return self._per_sample("PRS", "_prs.tsv", rim)

    def roh_files(self, rim=True):
        return self._per_sample("ROH", "_rohs.tsv", rim)

    def low_coverage_files(self, rim=True):
        out = []
        for sid, prefix in self._base_locations():
            folder = prefix[: len(prefix) - len(sid)]
            for bed in sorted(glob.glob(folder + "*_lowcov.bed")):
                out.append(FileLocation(sid, "LOWCOV_BED", bed, True))
        return out

    def somatic_cnv_coverage_file(self) -> FileLocation:
        suffix = ("_clincnv.seg" if self.analysis_type == "SOMATIC_SINGLESAMPLE"
                  else "_cov.seg")
        return FileLocation(self.ps + " (coverage)", "COPY_NUMBER_RAW_DATA",
                            self.ps_folder + self.ps + suffix,
                            os.path.exists(self.ps_folder + self.ps + suffix))

    # ---- dispatch for the file_location endpoint ----
    def locate(self, type_: str, multiple_files: bool = True,
               return_if_missing: bool = True, locus: str = "") -> list[FileLocation]:
        t = type_.upper().strip()
        if t == "VCF":
            if multiple_files:
                return self.vcf_files(return_if_missing)
            return [self.analysis_vcf()]
        if t == "STRUCTURAL_VARIANTS":
            return [self.analysis_sv_file()]
        if t == "COPY_NUMBER_CALLS":
            if multiple_files:
                return self.copy_number_call_files(return_if_missing)
            return [self.analysis_cnv_file()]
        if t == "COPY_NUMBER_CALLS_MOSAIC":
            return [self.analysis_mosaic_cnv_file()]
        if t == "UPD":
            return [self.analysis_upd_file()]
        if t in ("BAM", "CRAM"):
            return self.bam_files(return_if_missing)
        if t == "VIRAL_BAM":
            return self.viral_bam_files(return_if_missing)
        if t == "COPY_NUMBER_RAW_DATA":
            if multiple_files:
                return self.cnv_coverage_files(return_if_missing)
            return [self.somatic_cnv_coverage_file()]
        if t == "BAF":
            return self.baf_files(return_if_missing)
        if t == "MANTA_EVIDENCE":
            return self.manta_evidence_files(return_if_missing)
        if t == "CIRCOS_PLOT":
            return self.circos_plot_files(return_if_missing)
        if t == "REPEAT_EXPANSIONS":
            return self.repeat_expansion_files(return_if_missing)
        if t == "REPEAT_EXPANSION_IMAGE":
            if not locus:
                raise ValueError("Locus value has not been provided")
            return [self.repeat_expansion_image(locus)]
        if t == "REPEAT_EXPANSION_HISTOGRAM":
            if not locus:
                raise ValueError("Locus value has not been provided")
            return [self.repeat_expansion_histogram(locus)]
        if t == "PRS":
            return self.prs_files(return_if_missing)
        if t == "ROH":
            return self.roh_files(return_if_missing)
        if t == "LOWCOV_BED":
            return self.low_coverage_files(return_if_missing)
        if t == "EXPRESSION":
            return self.expression_files(return_if_missing)
        if t == "QC":
            return self.qc_files()
        raise ValueError(f"Unhandled file location type '{type_}'")
