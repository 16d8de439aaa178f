"""NGSDExportStudyGHGA — export study metadata as GHGA JSON.

Behavioral reference: ngs-bits src/NGSDExportStudyGHGA/main.cpp
(schema version 2.2.0). JSON is written with sorted keys and 4-space
indent, matching QJsonDocument::toJson().
"""

from __future__ import annotations

import json
import os
import sys

from ..ngsd import NGSD, NgsdError
from .toolbase import ToolBase, ToolError

_EXPERIMENT_DESCRIPTION = {
    "lrGS": "long-read sequencing", "cfDNA": "short-read sequencing",
    "cfDNA (patient-specific)": "short-read sequencing", "WGS": "short-read sequencing",
    "WES": "short-read sequencing", "RNA": "short-read sequencing",
}
_EXPERIMENT_TYPE = {"WGS": "WGS", "WES": "WXS", "RNA": "Total RNA",
                    "cfDNA": "cfDNA", "cfDNA (patient-specific)": "cfDNA"}
_LIBRARY_TYPE = {"WGS": "WGS", "WES": "WXS", "RNA": "TOTAL_RNA",
                 "cfDNA": "OTHER", "cfDNA (patient-specific)": "OTHER"}
_INSTRUMENT = {"NextSeq500": "NEXTSEQ_500", "NovaSeq6000": "ILLUMINA_NOVASEQ_6000",
               "NovaSeqXPlus": "ILLUMINA_NOVASEQ_X", "MGI-2000": "MGISEQ-2000RS"}
_FLOWCELL = {"Illumina NovaSeq S2": "ILLUMINA_NOVA_SEQ_S2",
             "Illumina NovaSeq S4": "ILLUMINA_NOVA_SEQ_S4",
             "Illumina NovaSeqX 10B": "ILLUMINA_NOVA_SEQ_XPLUS_10B",
             "Illumina NovaSeqX 25B": "ILLUMINA_NOVA_SEQ_XPLUS_25B",
             "Illumina NovaSeq S1": "OTHER", "Illumina NovaSeq SP": "OTHER", "n/a": "OTHER"}
_CASE_CONTROL = {"Affected": "CASE", "Unaffected": "CONTROL", "Unclear": "OTHER", "n/a": "UNKNOWN"}
_ANCESTRY = {"AFR": ("African (AFR) reference superpopulation (1KGP)", "HANCESTRO:2000"),
             "EUR": ("European (EUR) reference superpopulation (1KGP)", "HANCESTRO:2003"),
             "SAS": ("South Asian (SAS) reference superpopulation (1KGP)", "HANCESTRO:2004"),
             "EAS": ("East Asian (EAS) reference superpopulation (1KGP)", "HANCESTRO:2002")}
_TISSUE = {"blood": ("blood", "BTO:0000089"), "skin": ("skin", "BTO:0001253"),
           "muscle": ("muscle", "BTO:0000887"), "buccal mucosa": ("buccal mucosa", "BTO:0003833"),
           "fibroblast": ("fibroblast", "BTO:0000452"), "lymphocyte": ("lymphocyte", "BTO:0000775")}


def _cv(table: dict, key: str, what: str) -> str:
    if key not in table:
        raise ToolError(f"Unhandled {what} '{key}' in CV conversion!")
    return table[key]


def _sample_type(sample_type: str, is_ffpe: bool) -> str:
    dna = sample_type in ("DNA", "DNA (amplicon)", "DNA (native)")
    if not is_ffpe:
        if dna:
            return "GENOMIC_DNA"
        if sample_type == "RNA":
            return "TOTAL_RNA"
        if sample_type in ("cfDNA", "cfDNA (patient-specific)"):
            return "CF_DNA"
    else:
        if dna:
            return "FFPE_DNA"
        if sample_type == "RNA":
            return "FFPE_TOTAL_RNA"
    raise ToolError(f"Unhandled sample type '{sample_type}' {'(FFPE)' if is_ffpe else ''} in CV conversion!")


def _sex(gender: str) -> str:
    if gender in ("female", "male"):
        return gender
    if gender == "n/a":
        return "unknown"
    raise ToolError(f"Unhandled gender '{gender}' in CV conversion!")


def _age_at_sampling(s_info: dict) -> str:
    try:
        year_of_birth = int(s_info.get("year_of_birth", "")[:4])
    except ValueError:
        return "UNKNOWN"
    try:
        year_of_sample = int((s_info.get("sampling_date") or "")[-4:])
    except ValueError:
        try:
            year_of_sample = int((s_info.get("order_date") or "")[-4:])
        except ValueError:
            return "UNKNOWN"
    age = year_of_sample - year_of_birth
    if age < 0 or age > 130:
        return "UNKNOWN"
    bins = [(6, "0_TO_5"), (11, "6_TO_10"), (16, "11_TO_15"), (21, "16_TO_20"),
            (26, "21_TO_25"), (31, "26_TO_30"), (36, "31_TO_35"), (41, "36_TO_40"),
            (46, "41_TO_45"), (51, "46_TO_50"), (56, "51_TO_55"), (61, "56_TO_60"),
            (65, "61_TO_65"), (71, "66_TO_70"), (75, "71_TO_75"), (81, "76_TO_80")]
    for limit, label in bins:
        if age < limit:
            return label
    return "81_OR_OLDER"


def _files_from_folder(folder: str, extension: str, allow_multiple=True, substring="") -> list[str]:
    files = sorted(f for f in os.listdir(folder)
                   if f.endswith("." + extension) and os.path.isfile(os.path.join(folder, f)))
    if substring:
        files = [f for f in files if substring in f]
    if not files:
        raise ToolError(f"No matching file in folder '{folder}' found for extension '{extension}'!")
    if not allow_multiple and len(files) > 1:
        raise ToolError(f"Multiple matching file in folder '{folder}' found for extension '{extension}'!")
    return files


class NGSDExportStudyGHGATool(ToolBase):
    name = "NGSDExportStudyGHGA"
    description = "Exports meta data of a study from NGSD to a JSON format for import into GHGA."

    def setup(self):
        self.add_infile("samples", "TSV file of samples. Columns: dataset pseudonym in study, processed sample ID, patient ID (mandatory for group_analyses), sample folder (mandatory for use_sample_folder). If more columns are present they added as attributes to the 'sample' elements.")
        self.add_infile("data", "JSON file with general meta information about the study.")
        self.add_flag("include_bam", "Add BAM files to output.")
        self.add_flag("include_vcf", "Add VCF files to output.")
        self.add_flag("use_sample_folder", "Use file names from sample folder provided in '-samples'.")
        self.add_flag("group_analyses", "Combine all dataset from one patient into a combined analysis (e. g. for tumor-normal).")
        self.add_outfile("out", "Output JSON file.")
        self.add_flag("test", "Test mode: uses the test NGSD")

    def main(self):
        with open(self.get_infile("data")) as fh:
            data_obj = json.load(fh)

        def get_str(key):
            if key not in data_obj:
                raise ToolError(f"JSON input file does not contain key '{key}'!")
            if not isinstance(data_obj[key], str):
                raise ToolError(f"JSON input file does contain key '{key}' with invalid type (not string)!")
            return data_obj[key]

        def get_arr(key):
            if key not in data_obj:
                raise ToolError(f"JSON input file does not contain key '{key}'!")
            if not isinstance(data_obj[key], list):
                raise ToolError(f"JSON input file does contain key '{key}' with invalid type (not array)!")
            return [str(e) for e in data_obj[key]]

        def get_int(key):
            if key not in data_obj:
                raise ToolError(f"JSON input file does not contain key '{key}'!")
            if not isinstance(data_obj[key], (int, float)) or isinstance(data_obj[key], bool):
                raise ToolError(f"JSON input file does contain key '{key}' with invalid type (not integer)!")
            return int(data_obj[key])

        d = {
            "include_vcf": self.get_flag("include_vcf"),
            "include_bam": self.get_flag("include_bam"),
            "use_sample_folder": self.get_flag("use_sample_folder"),
            "group_analyses": self.get_flag("group_analyses"),
            "study_name": get_str("study"),
            "study_description": get_str("study_description"),
            "study_types": get_arr("study_types"),
            "study_affiliations": get_arr("study_affiliations"),
            "analysis_type": get_str("analysis_type"),
            "analysis_description": get_str("analysis_description"),
            "workflow_name": get_str("workflow_name"),
            "workflow_version": get_str("workflow_version"),
            "workflow_doi": get_str("workflow_doi"),
            "dac_email": get_str("data_access_committee_email"),
            "dac_organization": get_str("data_access_committee_organization"),
            "dap_text": get_str("data_access_policy_text"),
            "dap_url": get_str("data_access_policy_url"),
            "dap_term": get_str("data_use_permission_term"),
            "dap_id": get_str("data_use_permission_id"),
            "dap_modifier_terms": get_arr("data_use_modifier_terms"),
            "dap_modifier_ids": get_arr("data_use_modifier_ids"),
            "publication_title": get_str("publication_title"),
            "publication_abstract": get_str("publication_abstract"),
            "publication_author": get_str("publication_author"),
            "publication_year": get_int("publication_year"),
            "publication_journal": get_str("publication_journal"),
            "publication_doi": get_str("publication_doi"),
        }

        db = NGSD(self.get_flag("test"))
        ps_list = []
        headers = []
        for raw in open(self.get_infile("samples")):
            line = raw.rstrip("\r\n")
            if not line or line.startswith("##"):
                continue
            if line.startswith("#"):
                headers = line[1:].split("\t")
                continue
            parts = line.split("\t")
            if len(parts) < 4:
                raise ToolError(f"Invalid sample line (less than 4 columns):{line}")
            if len(parts) != len(headers):
                raise ToolError(f"Invalid sample line (expected {len(headers)} based on header, "
                                f"but found {len(parts)} columns):{line}")
            pseudonym = parts[0].strip()
            ps = parts[1].strip()
            patient_id = parts[2].strip() or pseudonym
            ps_folder = ""
            if d["use_sample_folder"]:
                ps_folder = parts[3].strip()
                if not ps_folder:
                    raise ToolError(f"No sample folder given in line: {line}")
            attributes = {}
            for i in range(4, len(parts)):
                attributes[headers[i].strip()] = parts[i]
            ps_id = db.processed_sample_id(ps)
            s_id = db.sample_id(ps)
            ps_list.append({
                "ps_id": ps_id, "name": ps, "pseudonym": pseudonym,
                "s_info": db.get_sample_data(s_id),
                "ps_info": db.get_processed_sample_data(ps_id),
                "phenotypes": db.sample_phenotypes(s_id),
                "patient_id": patient_id, "ps_folder": ps_folder,
                "research_data_files": [], "processed_data_files": [],
                "attributes": attributes})
        d["ps_list"] = ps_list

        root = {}
        self._add_process_data_files(root, d)
        self._add_research_data_files(root, d)
        self._add_analyses(root, d)
        self._add_analysis_methods(root, d)
        root["analysis_method_supporting_files"] = []
        root["data_access_committees"] = [{"email": d["dac_email"], "institute": d["dac_organization"],
                                           "alias": d["dac_email"]}]
        root["data_access_policies"] = [{
            "name": f"Data access policy for study {d['study_name']}",
            "description": f"Data access policy for study {d['study_name']}",
            "policy_text": d["dap_text"], "policy_url": d["dap_url"],
            "data_use_permission_term": d["dap_term"], "data_use_permission_id": d["dap_id"],
            "data_use_modifier_terms": d["dap_modifier_terms"],
            "data_use_modifier_ids": d["dap_modifier_ids"],
            "data_access_committee": d["dac_email"],
            "alias": f"DAP_{d['study_name']}"}]
        root["datasets"] = [{
            "title": f"Dataset for {d['study_name']}",
            "description": f"Dataset for {d['study_name']}",
            "types": ["Sequencing data"],
            "data_access_policy": f"DAP_{d['study_name']}",
            "study": d["study_name"], "alias": f"DS_{d['study_name']}"}]
        self._add_experiments(root, d)
        self._add_experiment_methods(root, d, db)
        root["experiment_method_supporting_files"] = []
        self._add_individuals(root, d)
        root["individual_supporting_files"] = []
        self._add_publications(root, d)
        self._add_samples(root, d)
        root["studies"] = [{"title": d["study_name"], "description": d["study_description"],
                            "types": d["study_types"], "affiliations": d["study_affiliations"],
                            "alias": d["study_name"]}]

        with open(self.get_outfile("out"), "w") as out:
            out.write(_qt_json(root))
            out.write("\n")
        db.close()

    @staticmethod
    def _add_analyses(root, d):
        array = []
        if d["include_bam"] or d["include_vcf"]:
            if d["group_analyses"]:
                research_files: dict[str, list] = {}
                for ps in d["ps_list"]:
                    research_files.setdefault(ps["patient_id"], []).extend(ps["research_data_files"])
                for patient_id in sorted(research_files):
                    array.append({"analysis_method": f"ANAM_{patient_id}", "title": f"ANA_{patient_id}",
                                  "description": d["analysis_description"], "type": d["analysis_type"],
                                  "research_data_files": research_files[patient_id],
                                  "alias": f"ANA_{patient_id}"})
            else:
                for ps in d["ps_list"]:
                    array.append({"analysis_method": f"ANAM_{ps['pseudonym']}", "title": f"ANA_{ps['pseudonym']}",
                                  "description": d["analysis_description"], "type": d["analysis_type"],
                                  "research_data_files": ps["research_data_files"],
                                  "alias": f"ANA_{ps['pseudonym']}"})
        root["analyses"] = array

    @staticmethod
    def _add_analysis_methods(root, d):
        array = []
        processed_patient_ids = set()
        if d["include_bam"] or d["include_vcf"]:
            for ps in d["ps_list"]:
                method_name = ps["pseudonym"]
                if d["group_analyses"]:
                    method_name = ps["patient_id"]
                    if method_name in processed_patient_ids:
                        continue
                    processed_patient_ids.add(method_name)
                array.append({
                    "name": f"ANAM_{method_name}", "description": d["analysis_description"],
                    "type": d["analysis_type"], "workflow_name": "megSAP",
                    "workflow_version": d["workflow_version"],
                    "workflow_repository": "https://github.com/imgag/megSAP",
                    "workflow_doi": d["workflow_doi"], "reference_name": "hg38",
                    "reference_type": "GENOME", "reference_source": "1000 Genomes project",
                    "reference_version": "GCA_000001405.15_GRCh38_no_alt_plus_hs38d1_analysis_set.fna.gz",
                    "alias": f"ANAM_{method_name}"})
        root["analysis_methods"] = array

    @staticmethod
    def _add_experiments(root, d):
        array = []
        for ps in d["ps_list"]:
            sys_type = ps["ps_info"]["processing_system_type"]
            array.append({
                "experiment_method": f"EXPM_{ps['pseudonym']}", "title": f"EXP_{ps['pseudonym']}",
                "description": _cv(_EXPERIMENT_DESCRIPTION, sys_type, "system type"),
                "type": _cv(_EXPERIMENT_TYPE, sys_type, "system type"),
                "sample": f"SAM_{ps['pseudonym']}", "alias": f"EXP_{ps['pseudonym']}"})
        root["experiments"] = array

    @staticmethod
    def _add_experiment_methods(root, d, db):
        array = []
        for ps in d["ps_list"]:
            run_name = ps["ps_info"]["run_name"]
            device_type = str(db.get_value(
                "SELECT d.type FROM device d, sequencing_run r WHERE r.device_id=d.id AND r.name=?",
                params=(run_name,)) or "")
            fc_id = str(db.get_value("SELECT fcid FROM sequencing_run WHERE name=?", params=(run_name,)) or "")
            fc_type = str(db.get_value("SELECT flowcell_type FROM sequencing_run WHERE name=?", params=(run_name,)) or "")
            array.append({
                "name": f"EXPM_{ps['pseudonym']}", "description": ps["ps_info"]["processing_system"],
                "type": ps["ps_info"]["processing_system"],
                "library_type": _cv(_LIBRARY_TYPE, ps["ps_info"]["processing_system_type"], "system type"),
                "library_selection_methods": ["OTHER"], "library_preparation": "unspecified",
                "instrument_model": _cv(_INSTRUMENT, device_type, "device type"),
                "sequencing_layout": "PE", "flow_cell_id": fc_id,
                "flow_cell_type": _cv(_FLOWCELL, fc_type, "flowcell type"),
                "alias": f"EXPM_{ps['pseudonym']}"})
        root["experiment_methods"] = array

    @staticmethod
    def _add_individuals(root, d):
        array = []
        processed_ids = set()
        for ps in d["ps_list"]:
            if ps["patient_id"] in processed_ids:
                continue
            obj = {}
            hpo_names = [name for _acc, name in ps["phenotypes"]]
            hpo_ids = [acc for acc, _name in ps["phenotypes"]]
            if hpo_names:
                obj["phenotypic_features_terms"] = hpo_names
                obj["phenotypic_features_ids"] = hpo_ids
            obj["sex"] = _sex(ps["s_info"]["gender"]).upper()
            ancestry = ps["ps_info"].get("ancestry", "")
            if ancestry and ancestry != "ADMIXED/UNKNOWN":
                if ancestry not in _ANCESTRY:
                    raise ToolError(f"Unhandled ancestry '{ancestry}' in CV conversion!")
                obj["ancestry_terms"] = [_ANCESTRY[ancestry][0]]
                obj["ancestry_ids"] = [_ANCESTRY[ancestry][1]]
            obj["alias"] = ps["patient_id"]
            array.append(obj)
            processed_ids.add(ps["patient_id"])
        root["individuals"] = array

    def _add_process_data_files(self, root, d):
        array = []
        for ps in d["ps_list"]:
            analysis = "ANA_" + (ps["patient_id"] if d["group_analyses"] else ps["pseudonym"])
            if d["include_bam"]:
                name = (_files_from_folder(ps["ps_folder"], "bam", False)[0]
                        if d["use_sample_folder"] else ps["pseudonym"] + ".bam")
                array.append({"format": "BAM", "analysis": analysis, "name": name,
                              "dataset": f"DS_{d['study_name']}", "included_in_submission": True,
                              "alias": f"BAM_{ps['pseudonym']}"})
                ps["processed_data_files"].append(f"BAM_{ps['pseudonym']}")
            if d["include_vcf"]:
                name = (_files_from_folder(ps["ps_folder"], "vcf", False)[0]
                        if d["use_sample_folder"] else ps["pseudonym"] + ".vcf")
                array.append({"format": "VCF", "analysis": analysis, "name": name,
                              "dataset": f"DS_{d['study_name']}", "included_in_submission": True,
                              "alias": f"VCF_{ps['pseudonym']}"})
                ps["processed_data_files"].append(f"VCF_{ps['pseudonym']}")
        root["process_data_files"] = array

    def _add_research_data_files(self, root, d):
        array = []
        for ps in d["ps_list"]:
            template = {"format": "FASTQ", "technical_replicate": 1,
                        "experiments": [f"EXP_{ps['pseudonym']}"],
                        "dataset": f"DS_{d['study_name']}", "included_in_submission": True}
            if d["use_sample_folder"]:
                for rx, tag in (("R1", "R1"), ("R2", "R2")):
                    files = _files_from_folder(ps["ps_folder"], "fastq.gz", True, rx)
                    for i, f in enumerate(files, start=1):
                        obj = dict(template)
                        obj["name"] = f
                        alias = f"FASTQ_{tag}_{i:03d}_{ps['pseudonym']}"
                        obj["alias"] = alias
                        ps["research_data_files"].append(alias)
                        array.append(obj)
            else:
                for tag in ("R1", "R2"):
                    obj = dict(template)
                    obj["name"] = f"{ps['pseudonym']}_{tag}.fastq.gz"
                    obj["alias"] = f"FASTQ_{tag}_{ps['pseudonym']}"
                    ps["research_data_files"].append(f"FASTQ_{tag}_{ps['pseudonym']}")
                    array.append(obj)
        root["research_data_files"] = array

    @staticmethod
    def _add_publications(root, d):
        if d["publication_title"].strip():
            obj = {"study": d["study_name"], "title": d["publication_title"]}
            if d["publication_abstract"].strip():
                obj["abstract"] = d["publication_abstract"]
            if d["publication_author"].strip():
                obj["author"] = d["publication_author"]
            if d["publication_year"] != -1:
                obj["year"] = d["publication_year"]
            if d["publication_journal"].strip():
                obj["journal"] = d["publication_journal"]
            obj["doi"] = d["publication_doi"]
            obj["alias"] = f"PUB_{d['study_name']}"
            root["publications"] = [obj]
        else:
            root["publications"] = []

    @staticmethod
    def _add_samples(root, d):
        array = []
        for ps in d["ps_list"]:
            obj = {
                "individual": ps["patient_id"],
                "name": f"SAM_{ps['pseudonym']}",
                "type": _sample_type(ps["s_info"]["type"], ps["s_info"]["is_ffpe"]),
                "description": (f"Tumor sample of {ps['patient_id']}" if ps["s_info"]["is_tumor"]
                                else f"Germline sample of {ps['patient_id']}"),
                "case_control_status": _cv(_CASE_CONTROL, ps["s_info"]["disease_status"], "disease status"),
                "biospecimen_age_at_sampling": _age_at_sampling(ps["s_info"]),
            }
            tissue = ps["s_info"].get("tissue") or ""
            if tissue and tissue != "n/a":
                if tissue not in _TISSUE:
                    raise ToolError(f"Unhandled tissue '{tissue}' in CV conversion!")
                obj["biospecimen_tissue_term"] = _TISSUE[tissue][0]
                obj["biospecimen_tissue_id"] = _TISSUE[tissue][1]
            attrs = []
            for key in ps["attributes"]:
                if not key.strip():
                    continue
                attrs.append({"key": key.strip(), "value": ps["attributes"][key]})
            if attrs:
                obj["attributes"] = attrs
            obj["alias"] = f"SAM_{ps['pseudonym']}"
            array.append(obj)
        root["samples"] = array


def _qt_json(value, indent: int = 0) -> str:
    """QJsonDocument::toJson(Indented) formatting — sorted keys, 4-space
    indent, empty containers spread over two lines."""
    pad = " " * indent
    pad_in = " " * (indent + 4)
    if isinstance(value, dict):
        if not value:
            return "{\n" + pad + "}"
        parts = []
        for key in sorted(value):
            parts.append(f'{pad_in}"{_esc(key)}": ' + _qt_json(value[key], indent + 4))
        return "{\n" + ",\n".join(parts) + "\n" + pad + "}"
    if isinstance(value, list):
        if not value:
            return "[\n" + pad + "]"
        parts = [pad_in + _qt_json(v, indent + 4) for v in value]
        return "[\n" + ",\n".join(parts) + "\n" + pad + "]"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return json.dumps(value)
    return '"' + _esc(str(value)) + '"'


def _esc(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


TOOLS = {
    "NGSDExportStudyGHGA": NGSDExportStudyGHGATool,
}
