"""ExportcBioportal — export a cBioPortal study from NGSD somatic data.

Behavioral reference: ngs-bits src/ExportcBioportal/main.cpp +
cppNGSD/ExportCBioPortalStudy.{h,cpp} + cppNGSD/FileLocationProviderLocal.cpp
(path conventions). The reference genome comes from the environment variable
NGSBITS_REFERENCE_GENOME (settings.ini 'reference_genome' in the reference).
"""

from __future__ import annotations

import math
import os
import re
import sys

from ..core.chromosome import Chromosome
from ..core.geneset import GeneSet
from ..io.bedpe import BedpeFile
from ..io.cnv import CnvList
from ..io.gsvar import GSvarFile
from ..ngsd import NGSD
from ..ngsd.somatic_report import (SomaticReportSettings, filter_cnvs, filter_variants,
                                   somatic_report_config)
from .toolbase import ToolBase, ToolError

ATTRIBUTES = ["SAMPLE_ID", "PATIENT_ID", "GENLAB_PAT_ID", "MSI_STATUS", "PLOIDY",
              "PURITY_HIST", "PURITY_CNVS", "PROCESSING_SYSTEM", "COMMENT", "HRD_SCORE",
              "TMB", "ICD10", "HPO_TERMS", "CLINICAL_PHENOTYPE", "MTB_CASE_ID"]


def determine_attribute(db_name: str) -> str:
    """SampleAttribute::determineAttribute (ExportCBioPortalStudy.h:97-160)."""
    if db_name not in ATTRIBUTES:
        raise ToolError("Unknown attribute DB name: " + db_name)
    return db_name


class MetaFile:
    """ExportCBioPortalStudy MetaFile — key-sorted (QMap) 'key: value' lines."""

    def __init__(self):
        self.values: dict[str, str] = {}

    def add_value(self, key: str, value: str):
        self.values[key] = value

    def store(self, out: str):
        with open(out, "w") as fh:
            for key in sorted(self.values):
                fh.write(f"{key}: {self.values[key]}\n")


def _qt_num(value: float, decimals: int = 2) -> str:
    """QString::number(x, 'f', 2) — 'nan' for NaN."""
    if isinstance(value, float) and math.isnan(value):
        return "nan"
    return f"{value:.{decimals}f}"


def _to_double(s) -> float:
    try:
        return float(s)
    except (TypeError, ValueError):
        return 0.0


def _to_int(s) -> int:
    try:
        return int(str(s))
    except (TypeError, ValueError):
        return 0


class CBioPortalExportSettings:
    """cppNGSD CBioPortalExportSettings (ExportCBioPortalStudy.cpp:47-280)."""

    def __init__(self, study: dict, db: NGSD):
        self.study = study          # name, cancer_type, identifier, description, reference_genome
        self.cancer = {}            # description, color, parent
        self.sample_attributes: list[dict] = []
        self.sample_list: list[str] = []
        self.report_settings: list[SomaticReportSettings] = []
        self.sample_files: list[dict] = []
        self.ps_ids: list[str] = []
        self.ps_data: list[dict] = []
        self.s_data: list[dict] = []
        self.s_mtb_data: list[dict] = []
        self.db = db

    def add_sample(self, settings: SomaticReportSettings, files: dict, mtb_data: dict):
        name = settings.tumor_ps
        if name in self.sample_list:
            raise ToolError(f"Given sample: '{name}' was already added to the sample list of the export.")
        self.sample_list.append(name)
        self.sample_files.append(files)
        self.report_settings.append(settings)
        ps_id = self.db.processed_sample_id(name)
        self.ps_ids.append(ps_id)
        self.ps_data.append(self.db.get_processed_sample_data(ps_id))
        self.s_data.append(self.db.get_sample_data(self.db.sample_id(name)))
        self.s_mtb_data.append(mtb_data)

    # === getters (ExportCBioPortalStudy.cpp:88-233) ===

    def get_msi_status(self, idx: int) -> float:
        qc = self.db.get_qc_data(self.ps_ids[idx])
        return float(qc["QC:2000141"]) if "QC:2000141" in qc else float("nan")

    def get_ploidy(self, idx: int) -> float:
        path = self.sample_files[idx]["clincnv_file"]
        if os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if line.startswith("##ploidy:"):
                        return float(line.split(":")[1])
                    if not line.startswith("##"):
                        break
        return float("nan")

    def get_purity_hist(self, idx: int) -> float:
        details = self.db.get_sample_disease_info(
            self.db.sample_id(self.sample_list[idx]), "tumor fraction")
        if len(details) > 1:
            raise ToolError(f"Sample '{self.sample_list[idx]}' has more than one entry for tumor "
                            "fraction in the disease details.")
        if not details:
            return float("nan")
        return _to_double(details[0][1]) / 100.0

    def get_purity_cnvs(self, idx: int) -> float:
        """Maximum tumor_clonality (SomaticReportHelper::getCnvMaxTumorClonality,
        SomaticReportHelper.cpp:544-563)."""
        path = self.sample_files[idx]["clincnv_file"]
        if not os.path.exists(path):
            return float("nan")
        cnvs = CnvList.from_file(path)
        i_clon = cnvs.annotation_index_by_name(b"tumor_clonality", False)
        if i_clon == -1:
            return float("nan")
        best = -1.0
        for cnv in cnvs.variants:
            try:
                tmp = float(cnv.annotations[i_clon])
            except ValueError:
                continue
            if tmp > best:
                best = tmp
        return best if best != -1 else float("nan")

    def get_hrd_score(self, idx: int) -> int:
        qc = self.db.get_qc_data(self.ps_ids[idx])
        return int(float(qc["QC:2000126"])) if "QC:2000126" in qc else -1

    def get_tmb(self, idx: int) -> float:
        qc = self.db.get_qc_data(self.ps_ids[idx])
        return float(qc["QC:2000053"]) if "QC:2000053" in qc else -1

    def get_icd10(self, idx: int) -> list[str]:
        return [info for _t, info in self.db.get_sample_disease_info(
            self.db.sample_id(self.sample_list[idx]), "ICD10 code")]

    def get_hpo_terms(self, idx: int) -> list[str]:
        return [info for _t, info in self.db.get_sample_disease_info(
            self.db.sample_id(self.sample_list[idx]), "HPO term id")]

    def get_clinical_phenotype(self, idx: int) -> str:
        return ", ".join(info for _t, info in self.db.get_sample_disease_info(
            self.db.sample_id(self.sample_list[idx]), "clinical phenotype (free text)"))

    def get_sample_id(self, idx: int) -> str:
        return self.report_settings[idx].tumor_ps

    def get_genome_build(self, idx: int) -> str:
        return str(self.db.get_value(
            "SELECT g.build FROM processing_system sys, genome g, processed_sample ps, sample s "
            "WHERE sys.genome_id=g.id AND ps.processing_system_id=sys.id AND ps.sample_id=s.id "
            "AND CONCAT(s.name,'_',LPAD(ps.process_id,2,'0'))=?", params=(self.sample_list[idx],)))

    def get_formatted_attribute(self, att: str, idx: int) -> str:
        """CBioPortalExportSettings::getFormatedAttribute (ExportCBioPortalStudy.cpp:235-297)."""
        if att == "SAMPLE_ID":
            return self.get_sample_id(idx)
        if att == "PATIENT_ID":
            return str(self.s_mtb_data[idx]["sap_id"])
        if att == "PROCESSING_SYSTEM":
            return self.ps_data[idx]["processing_system"]
        if att == "CLINICAL_PHENOTYPE":
            return self.get_clinical_phenotype(idx).replace("\n", " ").replace("\r", " ")
        if att == "COMMENT":
            return self.ps_data[idx]["comments"].replace("\n", ", ").replace("\t", " ")
        if att == "HPO_TERMS":
            return ", ".join(self.get_hpo_terms(idx))
        if att == "HRD_SCORE":
            hrd = self.get_hrd_score(idx)
            return str(hrd) if hrd != -1 else ""
        if att == "ICD10":
            return ", ".join(self.get_icd10(idx))
        if att == "MSI_STATUS":
            msi = self.get_msi_status(idx)
            if math.isnan(msi):
                return "MSI Status unbekannt"
            return "kein Hinweis auf MSI" if msi <= 10 else "Hinweise auf MSI"
        if att == "PLOIDY":
            return _qt_num(self.get_ploidy(idx))
        if att == "PURITY_CNVS":
            return _qt_num(self.get_purity_cnvs(idx))
        if att == "PURITY_HIST":
            return _qt_num(self.get_purity_hist(idx))
        if att == "TMB":
            tmb = self.get_tmb(idx)
            return _qt_num(tmb) if tmb != -1 else ""
        if att == "GENLAB_PAT_ID":
            return self.s_data[idx]["patient_identifier"] or ""
        if att == "MTB_CASE_ID":
            return self.s_mtb_data[idx]["mtb_case_id"]
        raise ToolError("Unknown Attribute value!")


class ExportCBioPortalStudy:
    """cppNGSD ExportCBioPortalStudy (ExportCBioPortalStudy.cpp:305-1125)."""

    def __init__(self, settings: CBioPortalExportSettings, db: NGSD):
        self.db = db
        self.settings = settings

    def export_study(self, out_folder: str, debug: bool):
        os.makedirs(out_folder, exist_ok=True)
        self.export_study_files(out_folder)
        self.export_cancer_type(out_folder)
        self.export_patient_data(out_folder)
        self.export_sample_data(out_folder)
        self.export_snvs(out_folder, debug)
        self.export_cnvs(out_folder, debug)
        self.export_fusions(out_folder, debug)
        self.export_case_list(out_folder)

    def export_study_files(self, out_folder: str):
        meta = MetaFile()
        meta.add_value("type_of_cancer", self.settings.study["cancer_type"])
        meta.add_value("name", self.settings.study["name"])
        meta.add_value("cancer_study_identifier", self.settings.study["identifier"])
        meta.add_value("description", self.settings.study["description"])
        meta.add_value("add_global_case_list", "true")
        meta.add_value("reference_genome", self.settings.study["reference_genome"])
        meta.store(out_folder + "/meta_study.txt")

    def export_cancer_type(self, out_folder: str):
        meta = MetaFile()
        meta.add_value("genetic_alteration_type", "CANCER_TYPE")
        meta.add_value("datatype", "CANCER_TYPE")
        meta.add_value("data_filename", "data_cancer_type.txt")
        meta.store(out_folder + "/meta_cancer_type.txt")
        with open(out_folder + "/data_cancer_type.txt", "w") as fh:
            fh.write("\t".join([self.settings.study["cancer_type"],
                                self.settings.cancer["description"],
                                self.settings.cancer["color"],
                                self.settings.cancer["parent"]]) + "\n")

    def export_case_list(self, out_folder: str):
        case_list_dir = out_folder + "/case_lists/"
        os.makedirs(case_list_dir, exist_ok=True)
        n = len(self.settings.sample_list)
        ident = self.settings.study["identifier"]

        with open(case_list_dir + "/cases_sequenced.txt", "w") as fh:
            fh.write(f"cancer_study_identifier: {ident}\n")
            fh.write(f"stable_id: {ident}_sequenced\n")
            fh.write("case_list_category: all_cases_with_mutation_data\n")
            fh.write("case_list_name: Sequenced Tumors\n")
            fh.write(f"case_list_description: All sequenced samples ({n} samples)\n")
            fh.write("case_list_ids: ")
            fh.write("\t".join(self.settings.get_sample_id(i) for i in range(n)))
            fh.write("\n")

        with open(case_list_dir + "/cases_cnv.txt", "w") as fh:
            fh.write(f"cancer_study_identifier: {ident}\n")
            fh.write(f"stable_id: {ident}_cna\n")
            fh.write("case_list_category: all_cases_with_cna_data\n")
            fh.write("case_list_name: Tumors with CNVs\n")
            fh.write(f"case_list_description: All samples with CNV data ({n} samples)\n")
            fh.write("case_list_ids: ")
            fh.write("\t".join(self.settings.get_sample_id(i) for i in range(n)
                               if os.path.exists(self.settings.sample_files[i]["clincnv_file"])))
            fh.write("\n")

        with open(case_list_dir + "/cases_sv.txt", "w") as fh:
            fh.write(f"cancer_study_identifier: {ident}\n")
            fh.write(f"stable_id: {ident}_sv\n")
            fh.write("case_list_category: all_cases_with_sv_data\n")
            fh.write("case_list_name: Tumors with SVs\n")
            fh.write(f"case_list_description: All samples with SV data ({n} samples)\n")
            fh.write("case_list_ids: ")
            fh.write("\t".join(self.settings.get_sample_id(i) for i in range(n)
                               if os.path.exists(self.settings.sample_files[i]["sv_file"])))
            fh.write("\n")

    def export_patient_data(self, out_folder: str):
        meta = MetaFile()
        meta.add_value("cancer_study_identifier", self.settings.study["identifier"])
        meta.add_value("genetic_alteration_type", "CLINICAL")
        meta.add_value("datatype", "PATIENT_ATTRIBUTES")
        meta.add_value("data_filename", "data_clinical_patients.txt")
        meta.store(out_folder + "/meta_clinical_patients.txt")

        headers = [
            ["Patient Identifier", "Gender", "Genlab Patient ID", "MTB case ID"],
            ["Patient identifier", "Gender of patient", "Patient identifier of genlab", "ID of the MTB case"],
            ["STRING", "STRING", "STRING", "STRING"],
            ["1", "9", "9", "9"],
            ["PATIENT_ID", "GENDER", "GENLAB_PAT_ID", "MTB_CASE_ID"],
        ]
        with open(out_folder + "/data_clinical_patients.txt", "w") as fh:
            for header in headers[:4]:
                fh.write("#" + "\t".join(header) + "\n")
            fh.write("\t".join(headers[4]) + "\n")
            pat_ids = set()
            for i in range(len(self.settings.sample_list)):
                pat_id = self.settings.get_formatted_attribute("PATIENT_ID", i)
                if pat_id in pat_ids:
                    continue
                pat_ids.add(pat_id)
                fh.write("\t".join([
                    pat_id,
                    self.settings.s_data[i]["gender"],
                    self.settings.get_formatted_attribute("GENLAB_PAT_ID", i),
                    self.settings.get_formatted_attribute("MTB_CASE_ID", i)]) + "\n")

    def export_sample_data(self, out_folder: str):
        meta = MetaFile()
        meta.add_value("cancer_study_identifier", self.settings.study["identifier"])
        meta.add_value("genetic_alteration_type", "CLINICAL")
        meta.add_value("datatype", "SAMPLE_ATTRIBUTES")
        meta.add_value("data_filename", "data_clinical_samples.txt")
        meta.store(out_folder + "/meta_clinical_samples.txt")

        attrs = self.settings.sample_attributes
        with open(out_folder + "/data_clinical_samples.txt", "w") as fh:
            fh.write("#" + "\t".join(a["name"] for a in attrs) + "\n")
            fh.write("#" + "\t".join(a["description"] for a in attrs) + "\n")
            fh.write("#" + "\t".join(a["datatype"] for a in attrs) + "\n")
            fh.write("#" + "\t".join(str(a["priority"]) for a in attrs) + "\n")
            fh.write("\t".join(a["db_name"] for a in attrs) + "\n")
            for idx in range(len(self.settings.sample_list)):
                fh.write("\t".join(self.settings.get_formatted_attribute(a["attribute"], idx)
                                   for a in attrs) + "\n")

    def export_snvs(self, out_folder: str, debug: bool):
        meta = MetaFile()
        meta.add_value("cancer_study_identifier", self.settings.study["identifier"])
        meta.add_value("genetic_alteration_type", "MUTATION_EXTENDED")
        meta.add_value("datatype", "MAF")
        meta.add_value("stable_id", "mutations")
        meta.add_value("show_profile_in_analysis_tab", "true")
        meta.add_value("profile_description", "Mutation data")
        meta.add_value("profile_name", "Mutations")
        meta.add_value("namespaces", "annotation")
        meta.add_value("data_filename", "data_mutations.txt")
        meta.store(out_folder + "/meta_mutations.txt")

        columns = ["Hugo_Symbol", "NCBI_Build", "Chromosome", "Start_Position", "End_Position",
                   "Variant_Classification", "Reference_Allele", "Tumor_Seq_Allele2",
                   "Tumor_Sample_Barcode", "HGVSp_Short", "t_alt_count", "t_ref_count",
                   "n_alt_count", "n_ref_count", "ANNOTATION.VICC"]
        with open(out_folder + "/data_mutations.txt", "w") as fh:
            fh.write("\t".join(columns) + "\n")
            for idx in range(len(self.settings.sample_list)):
                if debug:
                    sys.stdout.write(f"exporting SNVs sample: {self.settings.sample_list[idx]}")
                vl_somatic = GSvarFile.from_file(self.settings.sample_files[idx]["gsvar_somatic"])
                vl_somatic = filter_variants(vl_somatic, self.settings.report_settings[idx],
                                             throw_errors=False)
                if debug:
                    errors = "; ".join(
                        e for errs in self.settings.report_settings[idx].report_config.filters.errors
                        for e in errs)
                    if errors:
                        sys.stdout.write(f" - Errors When filtering: {errors}")
                    sys.stdout.write("\n")
                self._write_snv_variants(fh, vl_somatic, idx)

    def _write_snv_variants(self, fh, filtered_vl: GSvarFile, sample_idx: int):
        """ExportCBioPortalStudy::writeSnvVariants (ExportCBioPortalStudy.cpp:605-705)."""
        from ..core.hgvs import HgvsVariant, VariantHgvsAnnotator
        from ..io.fasta import FastaFileIndex
        from .ngsd_export_annotation import _to_vcf

        build = self.settings.get_genome_build(sample_idx)
        sample_id = self.settings.get_sample_id(sample_idx)

        genome = os.environ.get("NGSBITS_REFERENCE_GENOME", "")
        if not genome:
            raise ToolError("Settings value 'reference_genome' not set — export NGSBITS_REFERENCE_GENOME!")
        genome_idx = FastaFileIndex(genome)
        annotator = VariantHgvsAnnotator(genome_idx)

        idx_gene = filtered_vl.annotation_index("gene")
        idx_co_sp = filtered_vl.annotation_index("coding_and_splicing")
        idx_tumor_dp = filtered_vl.annotation_index("tumor_dp")
        idx_tumor_af = filtered_vl.annotation_index("tumor_af")
        idx_normal_dp = filtered_vl.annotation_index("normal_dp")
        idx_normal_af = filtered_vl.annotation_index("normal_af")

        for var in filtered_vl.variants:
            transcripts = self.db.transcripts_overlapping(var.chr, var.start, var.end, 5000)
            transcripts = sort_by_relevance(transcripts)
            genes = GeneSet.create_from_text(var.annotations[idx_gene], ",")
            transcripts = [t for t in transcripts if genes.contains(t.gene)]

            transcript = None
            consequence = None
            for trans in transcripts:
                if trans.is_preferred:
                    transcript = trans
                    break
            if transcript is None and transcripts:
                transcript = transcripts[0]
            if transcript is None or transcript.gene == "":
                continue
            pos, ref, obs = _to_vcf(genome_idx, var.chr, var.start,
                                    var.ref.decode(), var.obs.decode())
            consequence = annotator.annotate(
                transcript, HgvsVariant(var.chr, pos, ref.encode(), obs.encode()))

            line = [transcript.gene, build, var.chr.str_normalized(True), str(var.start),
                    str(var.end),
                    self._format_variant_classification(transcript, var.annotations[idx_co_sp]),
                    var.ref.decode(), var.obs.decode(), sample_id, consequence.hgvs_p]

            tumor_alt = int(round(_to_double(var.annotations[idx_tumor_dp])
                                  * _to_double(var.annotations[idx_tumor_af])))
            tumor_ref = _to_int(var.annotations[idx_tumor_dp].decode()) - tumor_alt
            line.append(str(tumor_alt))
            line.append(str(tumor_ref))
            normal_alt = int(round(_to_double(var.annotations[idx_normal_dp])
                                   * _to_double(var.annotations[idx_normal_af])))
            # NOTE: normal_ref subtracts the TUMOR alt count — replicated from
            # the reference (ExportCBioPortalStudy.cpp:687)
            normal_ref = _to_int(var.annotations[idx_normal_dp].decode()) - tumor_alt
            line.append(str(normal_alt))
            line.append(str(normal_ref))

            line.append(self._vicc_class(var))
            fh.write("\t".join(line) + "\n")

    def _vicc_class(self, var) -> str:
        from ..ngsd.somatic_vicc import get_somatic_vicc_data, vicc_score_as_string
        var_id = self.db.get_value(
            "SELECT id FROM variant WHERE chr=? AND start=? AND end=? AND ref=? AND obs=?",
            params=(var.chr.str_normalized(True), var.start, var.end,
                    var.ref.decode(), var.obs.decode()))
        if var_id is None:
            return ""
        vicc = get_somatic_vicc_data(self.db, var_id)
        if vicc is None:
            return ""
        return vicc_score_as_string(vicc)

    @staticmethod
    def _format_variant_classification(transcript, coding_splicing: bytes) -> str:
        """ExportCBioPortalStudy::formatVariantClassification (:1105-1125)."""
        annotated = (coding_splicing + b",").split(b",")
        for trans_anno in annotated:
            if not trans_anno:
                continue
            parts = trans_anno.split(b":")
            if parts[1].decode() == transcript.name_with_version():
                return parts[2].decode()
        return annotated[0].split(b":")[2].decode()

    def export_cnvs(self, out_folder: str, debug: bool):
        meta = MetaFile()
        meta.add_value("cancer_study_identifier", self.settings.study["identifier"])
        meta.add_value("genetic_alteration_type", "COPY_NUMBER_ALTERATION")
        meta.add_value("datatype", "DISCRETE")
        meta.add_value("stable_id", "cna")
        meta.add_value("profile_name", "Copy Number Variants")
        meta.add_value("show_profile_in_analysis_tab", "true")
        meta.add_value("namespaces", "annotation")
        meta.add_value("profile_description", "Values: -2 = homozygous deletion; -1 = hemizygous "
                       "deletion; 0 = neutral / no change; 1 = gain; 2 = high level amplification.")
        meta.add_value("data_filename", "data_CNV.txt")
        meta.store(out_folder + "/meta_CNV.txt")

        columns = ["Hugo_Symbol", "Entrez_Gene_Id"]
        data: list[dict] = []
        all_genes = GeneSet()
        for idx in range(len(self.settings.sample_list)):
            if debug:
                sys.stdout.write(f"CNV sample: {self.settings.sample_list[idx]}\n")
            columns.append(self.settings.get_sample_id(idx))
            data.append({})
            path = self.settings.sample_files[idx]["clincnv_file"]
            if not os.path.exists(path):
                sys.stdout.write(f"No clincnv file! skipping... {self.settings.sample_list[idx]}\n")
                continue
            cnvs = CnvList.from_file(path)
            cnvs = filter_cnvs(cnvs, self.settings.report_settings[idx])
            for cnv in cnvs.variants:
                for gene in cnv.genes:
                    all_genes.insert(gene)
                    cn = cnv.copy_number(cnvs.annotation_headers)
                    if cn == 0:
                        data[idx][_gene_key(gene)] = -2
                    elif cn == 1:
                        data[idx][_gene_key(gene)] = -1
                    elif cn == 2:
                        data[idx][_gene_key(gene)] = 0
                    elif cn < 5:
                        data[idx][_gene_key(gene)] = 1
                    else:
                        data[idx][_gene_key(gene)] = 2
            if debug:
                sys.stdout.write(f"{self.settings.get_sample_id(idx)}: found genes with CNVs - "
                                 f"{len(data[idx])}\n")

        with open(out_folder + "/data_CNV.txt", "w") as fh:
            fh.write("\t".join(columns) + "\n")
            for gene in all_genes:
                parts = [gene]
                for idx in range(len(self.settings.sample_list)):
                    parts.append(str(data[idx].get(gene, 0)))
                fh.write("\t".join(parts) + "\n")

    def export_fusions(self, out_folder: str, debug: bool):
        meta = MetaFile()
        meta.add_value("cancer_study_identifier", self.settings.study["identifier"])
        meta.add_value("genetic_alteration_type", "STRUCTURAL_VARIANT")
        meta.add_value("datatype", "SV")
        meta.add_value("stable_id", "structural_variants")
        meta.add_value("profile_name", "Fusions")
        meta.add_value("show_profile_in_analysis_tab", "true")
        meta.add_value("profile_description", "Fusions called in the RNA with arriba.")
        meta.add_value("data_filename", "data_FU.txt")
        meta.store(out_folder + "/meta_FU.txt")

        columns = ["Sample_ID", "NCBI_Build", "SV_Status", "Event_Info", "Site1_Hugo_Symbol",
                   "Site1_Ensembl_Transcript_Id", "Site1_Exon", "Site1_Chromosome",
                   "Site1_Position", "Site2_Hugo_Symbol", "Site2_Ensembl_Transcript_Id",
                   "Site2_Exon", "Site2_Chromosome", "Site2_Position", "Site2_Effect_On_Frame",
                   "Class", "Tumor_Split_Read_Count", "Tumor_Paired_End_Read_Count",
                   "Breakpoint_Type"]
        with open(out_folder + "/data_FU.txt", "w") as fh:
            fh.write("\t".join(columns) + "\n")
            for idx in range(len(self.settings.sample_list)):
                path = self.settings.sample_files[idx]["rna_fusions"]
                if not path or not os.path.exists(path):
                    continue
                from ..io.tsv import TsvFile
                fusions = TsvFile.from_file(path)

                def col(name: str) -> int:
                    return fusions.header.index(name.encode())

                idx_pos1, idx_pos2 = col("breakpoint1"), col("breakpoint2")
                idx_gene1, idx_gene2 = col("gene1"), col("gene2")
                idx_frame = col("reading_frame")
                idx_class = col("type")
                idx_sr1, idx_sr2 = col("split_reads1"), col("split_reads2")
                idx_pairs = col("discordant_mates")

                for row in fusions.rows:
                    chr1, pos1 = row[idx_pos1].split(b":")[:2]
                    chr2, pos2 = row[idx_pos2].split(b":")[:2]
                    frame_effect = row[idx_frame].decode()
                    if "in-frame" in frame_effect:
                        frame = "in-frame"
                    elif "out-of-frame" in frame_effect:
                        frame = "frameshift"
                    else:
                        frame = ""
                    type_str = row[idx_class].decode()
                    sv_class = ""
                    for key, value in (("inversion", "Inversion"), ("deletion", "Deletion"),
                                       ("translocation", "Translocation"),
                                       ("insertion", "Insertion"), ("duplication", "Duplication")):
                        if key in type_str:
                            sv_class = value
                            break
                    line = [self.settings.get_sample_id(idx), "GRCh38", "SOMATIC", "Event info",
                            row[idx_gene1].decode(), "", "", chr1.decode(), pos1.decode(),
                            row[idx_gene2].decode(), "", "", chr2.decode(), pos2.decode(),
                            frame, sv_class,
                            str(_to_int(row[idx_sr1].decode()) + _to_int(row[idx_sr2].decode())),
                            row[idx_pairs].decode(), "PRECISE"]
                    fh.write("\t".join(line) + "\n")


def _gene_key(gene) -> str:
    return (gene.decode() if isinstance(gene, bytes) else gene).strip().upper()


def sort_by_relevance(transcripts: list) -> list:
    """TranscriptList::sortByRelevance (cppNGS/Transcript.cpp:1078-1133).

    Bug-compatible: the 'main transcript' check for b uses a's
    Ensembl-canonical flag (Transcript.cpp:1121).
    """
    import functools

    def cmp(a, b) -> int:
        if a.gene > b.gene:
            return 1
        if a.gene < b.gene:
            return -1
        a_coding = a.coding_regions().base_count()
        b_coding = b.coding_regions().base_count()
        if a_coding != b_coding:
            return -1 if a_coding > b_coding else 1
        a_main = a.is_preferred or a.is_mane_select or a.is_mane_plus_clinical or a.is_ensembl_canonical
        b_main = b.is_preferred or b.is_mane_select or b.is_mane_plus_clinical or a.is_ensembl_canonical
        if a_main and not b_main:
            return -1
        if not a_main and b_main:
            return 1
        a_nc = a.regions.base_count()
        b_nc = b.regions.base_count()
        if a_nc != b_nc:
            return -1 if a_nc > b_nc else 1
        return -1 if a.name > b.name else (1 if a.name < b.name else 0)

    return sorted(transcripts, key=functools.cmp_to_key(cmp))


class ExportcBioportalTool(ToolBase):
    name = "ExportcBioportal"
    # replicated from the reference main.cpp (copy-paste artifact there)
    description = "Converts a FASTQ file to FASTA format."

    def setup(self):
        self.add_infile("samples", "Input TSV file with samples (tumor, normal, rna) to be exported and their clinical data.")
        self.add_infile("study_data", "Input TSV file with Infos about the study that should be created.")
        self.add_infile("attribute_data", "Input TSV file with Infos about the sample attributes that should be contained in the study.")
        self.add_string("out", "Output folder that will contain all files for the cBioPortal study.")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("debug", "Provide additional debug output on stdout.")

    def main(self):
        from ..io.tsv import TsvFile

        study, cancer = self._parse_study_data(self.get_infile("study_data"))
        attributes = self._parse_attribute_data(self.get_infile("attribute_data"))

        db = NGSD(self.get_flag("test"))
        export_settings = CBioPortalExportSettings(study, db)
        export_settings.cancer = cancer
        export_settings.sample_attributes = attributes

        samples = TsvFile.from_file(self.get_infile("samples"))

        def col(name: str) -> int:
            return samples.header.index(name.encode())

        idx_tumor_name = col("tumor_ps_name")
        idx_normal_name = col("normal_ps_name")
        idx_sap_id = col("sap_id")
        idx_mtb_case_id = col("mtb_case_id")
        idx_mtb_registration_date = col("mtb_registration_date")
        idx_mtb_board_date = col("mtb_board_date")
        idx_patient_mpi = col("patient_mpi")
        idx_icd10_code = col("icd10_code")
        idx_icd10_catalog = col("icd10_catalog")
        idx_oncotree_code = col("oncotree_code")

        for row in samples.rows:
            sample_id = db.sample_id(row[idx_tumor_name].decode())
            mtb_data = {
                "mtb_case_id": row[idx_mtb_case_id].decode(),
                "mtb_board_date": row[idx_mtb_board_date].decode(),
                "mtb_registration_date": row[idx_mtb_registration_date].decode(),
                "sap_id": _to_int(row[idx_sap_id].decode()),
                "patient_mpi_id": row[idx_patient_mpi].decode(),
                "icd10_code": row[idx_icd10_code].decode(),
                "icd10_cataloge": row[idx_icd10_catalog].decode(),
                "oncotree_code": row[idx_oncotree_code].decode(),
            }

            processed_samples = db.get_values(
                "SELECT CONCAT(s.name,'_',LPAD(ps.process_id,2,'0')) FROM processed_sample ps "
                "LEFT JOIN sample s ON s.id=ps.sample_id LEFT JOIN project as p "
                "ON ps.project_id=p.id WHERE p.type='diagnostic' AND ps.sample_id=?",
                params=(sample_id,))
            if not processed_samples:
                raise ToolError(f"No processed samples found for: {row[idx_tumor_name].decode()} "
                                f"with sample id: {sample_id}")

            for tumor_ps in processed_samples:
                tumor_id = db.processed_sample_id(tumor_ps)
                normal_ps = db.normal_sample(tumor_id)
                if normal_ps == "":
                    raise ToolError(f"No normal sample set for tumor: {tumor_ps}")
                normal_id = db.processed_sample_id(normal_ps)
                if normal_ps != row[idx_normal_name].decode():
                    raise ToolError("The set normal sample in NGSD is a different one compared to "
                                    f"the given normale sample. Given: {row[idx_normal_name].decode()}, "
                                    f"in NGSD set: {normal_ps}")

                rna_ps = db.rna(tumor_id, False)

                tumor_folder = db.processed_sample_path(tumor_id, "SAMPLE_FOLDER").rstrip("/")
                project_folder = os.path.dirname(os.path.abspath(tumor_folder))
                somatic_prefix = f"{tumor_ps}-{normal_ps}"
                somatic_folder = os.path.join(project_folder, "Somatic_" + somatic_prefix)
                gsvar_file = os.path.join(somatic_folder, somatic_prefix + ".GSvar")

                if not os.path.exists(gsvar_file):
                    continue  # no GSvar -> skip sample (qDebug-only in the reference)

                # FileLocationProviderLocal path conventions (FileLocationProviderLocal.cpp)
                base = os.path.join(somatic_folder, somatic_prefix)
                sv_file = base + "_var_structural_variants.bedpe"
                if not os.path.exists(sv_file):
                    sv_file = base + "_manta_var_structural.bedpe"
                files = {
                    "clincnv_file": base + "_clincnv.tsv",
                    "msi_file": base + "_msi.tsv",
                    "sv_file": sv_file,
                    "gsvar_germline": db.processed_sample_path(normal_id, "GSVAR"),
                    "gsvar_somatic": gsvar_file,
                    "rna_fusions": "",
                }
                if rna_ps != "":
                    rna_id = db.processed_sample_id(rna_ps)
                    files["rna_fusions"] = db.processed_sample_path(rna_id, "FUSIONS")

                somatic_vl = GSvarFile.from_file(files["gsvar_somatic"])
                germline_vl = GSvarFile.from_file(files["gsvar_germline"])
                cnvs = CnvList.from_file(files["clincnv_file"]) \
                    if os.path.exists(files["clincnv_file"]) else CnvList()
                svs = BedpeFile.from_file(files["sv_file"]) \
                    if os.path.exists(files["sv_file"]) else BedpeFile()

                messages: list[str] = []
                report_settings = SomaticReportSettings()
                report_settings.normal_ps = normal_ps
                report_settings.tumor_ps = tumor_ps
                report_settings.msi_file = files["msi_file"]
                report_settings.viral_file = db.processed_sample_path(tumor_id, "VIRAL")
                report_settings.report_config = somatic_report_config(
                    db, tumor_id, normal_id, somatic_vl, cnvs, svs, germline_vl, messages)

                export_settings.add_sample(report_settings, files, mtb_data)

        exporter = ExportCBioPortalStudy(export_settings, db)
        exporter.export_study(self.get_string("out") + "/" + study["identifier"] + "/",
                              self.get_flag("debug"))
        db.close()

    @staticmethod
    def _parse_attribute_data(path: str) -> list[dict]:
        from ..io.tsv import TsvFile
        attr_data = TsvFile.from_file(path)

        def col(name: str) -> int:
            return attr_data.header.index(name.encode())

        idx_name, idx_db_name = col("name"), col("db_name")
        idx_desc, idx_datatype, idx_prio = col("description"), col("datatype"), col("priority")
        attributes = []
        for row in attr_data.rows:
            try:
                prio = int(row[idx_prio])
            except ValueError:
                raise ToolError(f"Could not convert the priority of {row[idx_name].decode()}"
                                f"to integer: '{row[idx_prio].decode()}' to integer")
            attributes.append({
                "name": row[idx_name].decode(),
                "description": row[idx_desc].decode(),
                "db_name": row[idx_db_name].decode(),
                "datatype": row[idx_datatype].decode(),
                "priority": prio,
                "attribute": determine_attribute(row[idx_db_name].decode()),
            })
        return attributes

    @staticmethod
    def _parse_study_data(path: str):
        from ..io.tsv import TsvFile
        study_data = TsvFile.from_file(path)
        keys = [r[0].decode() for r in study_data.rows]
        values = [r[1].decode() if len(r) > 1 else "" for r in study_data.rows]

        def get(key: str) -> str:
            if key not in keys:
                raise ToolError(f"Couldn't find necessary key '{key}' in the study_data file.")
            return values[keys.index(key)]

        study = {"name": get("study_name"), "description": get("study_description"),
                 "identifier": get("study_identifier"), "reference_genome": get("study_reference"),
                 "cancer_type": get("cancer_name")}
        cancer = {"description": get("cancer_description"), "parent": get("cancer_parent"),
                  "color": get("cancer_color")}
        return study, cancer


TOOLS = {
    "ExportcBioportal": ExportcBioportalTool,
}
