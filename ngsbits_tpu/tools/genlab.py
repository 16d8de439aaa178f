"""GenlabInfo and NGSDImportGenlab — GenLab LIMS integration tools.

Behavioral reference: ngs-bits src/GenlabInfo/main.cpp and
src/NGSDImportGenlab/main.cpp (+ cppNGSD/GenLabDB.cpp, see ngsd/genlab.py).
GenLab connectivity is provided via a SQLite database holding the GenLab
views, configured through the NGSBITS_GENLAB_SQLITE environment variable.
"""

from __future__ import annotations

import os
import re
import sys

from ..ngsd import NGSD
from ..ngsd import genlab as genlab_mod
from ..ngsd.genlab import GenLabDB
from .toolbase import ToolBase, ToolError


class GenlabInfoTool(ToolBase):
    name = "GenlabInfo"
    description = "Provide sample information from GenLAB."

    def setup(self):
        self.add_string("ps", "Processed sample or TSV file with processed sample ids in the first column")
        self.add_string("info", "Infos that will be collected from Genlab.Comma seperated list of values. Supported: SAPID,PATID",
                        optional=True, default="SAPID")
        self.add_string("out", "TSV file where the Genlab infos will be written to. stdout if emtpy.", optional=True)

    def main(self):
        # init (GenlabInfo/main.cpp:27-30)
        if not genlab_mod.is_available():
            raise ToolError("Genlab database is not available. Can't import data.")
        genlab = GenLabDB()

        ps = self.get_string("ps")
        infos = self.get_string("info").split(",")
        out_path = self.get_string("out")
        out = open(out_path, "w") if out_path else sys.stdout

        out.write("\t".join(["#sample"] + infos) + "\n")

        if not os.path.isfile(ps):
            ps_names = [ps]
        else:
            from ..io.tsv import TsvFile
            tsv = TsvFile.from_file(ps)
            ps_names = [row[0].decode() for row in tsv.rows]

        for ps_name in ps_names:
            out.write(ps_name + "\t" + "\t".join(self._get_infos(ps_name.strip(), genlab, infos)) + "\n")

        if out_path:
            out.close()
        genlab.close()

    @staticmethod
    def _get_infos(ps: str, genlab: GenLabDB, infos: list[str]) -> list[str]:
        """GenlabInfo/main.cpp getInfos (:60-76)."""
        ps_infos = []
        for info in infos:
            if info == "SAPID":
                ps_infos.append(genlab.sap_id(ps))
            elif info == "PATID":
                ps_infos.append(genlab.patient_identifier(ps))
            else:
                raise ToolError(f"Unknown info: '{info}' cannot provide it from GenLab!")
        return ps_infos


class NGSDImportGenlabTool(ToolBase):
    name = "NGSDImportGenlab"
    description = "Import sample information from GenLAB into NGSD."

    def setup(self):
        self.add_string("ps", "Processed sample for which the GenLAB data will be imported.")
        self.add_flag("no_relations", "Do not search and import sample relations from GenLAB.")
        self.add_flag("no_rna_tissue", "Do not import RNA reference tissue from HPO terms.")
        self.add_flag("no_metadata", "Do not search and import metadata from GenLAB (disease group, ICD10, HPO, ...)")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("dry_run", "Run as specified but do NOT change anything in the database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        if not genlab_mod.is_available():
            raise ToolError("Genlab database is not available. Can't import data.")
        genlab = GenLabDB(db)

        ps = self.get_string("ps")
        dry_run = self.get_flag("dry_run")

        if not self.get_flag("no_metadata"):
            self._import_metadata(ps, db, genlab, dry_run)
        if not self.get_flag("no_relations"):
            self._import_sample_relations(ps, db, genlab, dry_run)
        if not self.get_flag("no_rna_tissue"):
            self._import_rna_reference_tissue(ps, db, dry_run)

        genlab.close()
        db.close()

    # === sample relations (NGSDImportGenlab/main.cpp:58-108) ===

    def _import_sample_relations(self, ps_name: str, db: NGSD, genlab: GenLabDB, dry_run: bool):
        samples = genlab.patient_samples(ps_name)
        if not samples:
            return

        ps_id = db.processed_sample_id(ps_name)
        s_id = db.sample_id(ps_name)

        sample_data = db.get_sample_data(s_id)
        ps_data = db.get_processed_sample_data(ps_id)

        related_sample_data = []
        for sample in samples:
            rel_s_id = db.sample_id(sample, False)
            if not rel_s_id:
                continue
            related_sample_data.append(db.get_sample_data(rel_s_id))

        ngsd_relations = db.get_values(
            "SELECT relation FROM sample_relations WHERE sample1_id=? OR sample2_id=?",
            params=(s_id, s_id))
        if "tumor-normal" not in ngsd_relations:
            self._check_tumor_normal(db, sample_data, ps_data, related_sample_data, dry_run)
        if "same sample" not in ngsd_relations and sample_data["type"] == "RNA":
            self._check_dna_rna(db, genlab, sample_data, related_sample_data, dry_run)

        # relatives patient relations (parents, siblings)
        for sample1, relation, sample2 in genlab.relatives(ps_name):
            sample_ids_ngsd = db.related_samples(int(s_id), relation)
            sample2_id = int(db.sample_id(sample1))
            if sample2_id not in sample_ids_ngsd:
                sys.stdout.write(f"Adding relative relation: {sample1} - {relation} - {sample2}\n")
                if not dry_run:
                    db.execute("INSERT INTO sample_relations (sample1_id, relation, sample2_id) "
                               "VALUES (?, ?, ?)",
                               (db.sample_id(sample1), relation, db.sample_id(sample2)))
                    db.commit()

    def _check_tumor_normal(self, db: NGSD, current_sample_data: dict, current_ps_data: dict,
                            related_sample_data: list, dry_run: bool):
        """NGSDImportGenlab/main.cpp checkForTumorNormalRelation (:110-181)."""
        best_candidate: dict = {}
        for data in related_sample_data:
            if not (data["type"] or "").startswith("DNA"):
                continue
            if data["is_tumor"] == current_sample_data["is_tumor"]:
                continue
            for rel_ps_id in db.get_values(
                    "SELECT id FROM processed_sample WHERE sample_id=?",
                    params=(db.sample_id(data["name"]),)):
                ps_data = db.get_processed_sample_data(rel_ps_id)
                if current_ps_data["processing_system"] != ps_data["processing_system"]:
                    continue
                if ps_data["quality"] == "bad":
                    continue
                run_status = str(db.get_value(
                    "SELECT status FROM sequencing_run WHERE name=?",
                    params=(ps_data["run_name"],)) or "")
                if run_status == "run_aborted":
                    continue
                if not best_candidate:
                    best_candidate = ps_data
                elif _is_sample_newer(best_candidate["name"], ps_data["name"]):
                    best_candidate = ps_data
        if not best_candidate:
            return

        if current_sample_data["is_tumor"]:
            tumor_ps_id = db.processed_sample_id(current_ps_data["name"])
            tumor_ps_name = current_ps_data["name"]
            normal_ps_id = db.processed_sample_id(best_candidate["name"])
            normal_ps_name = best_candidate["name"]
        else:
            normal_ps_id = db.processed_sample_id(current_ps_data["name"])
            normal_ps_name = current_ps_data["name"]
            tumor_ps_id = db.processed_sample_id(best_candidate["name"])
            tumor_ps_name = best_candidate["name"]

        sys.stdout.write(f"Adding new tumor normal relation: {tumor_ps_name} tumor-normal {normal_ps_name}\n")
        if not dry_run:
            db.execute("INSERT OR IGNORE INTO sample_relations (sample1_id, relation, sample2_id) "
                       "VALUES (?, 'tumor-normal', ?)",
                       (db.sample_id(tumor_ps_name), db.sample_id(normal_ps_name)))
            db.commit()

        if db.normal_sample(tumor_ps_id) == "":
            sys.stdout.write(f"Updating normal ID for tumor sample: {tumor_ps_name} "
                             f"- normal sample is: {normal_ps_name}\n")
            if not dry_run:
                db.execute("UPDATE `processed_sample` SET normal_id=? WHERE id=?",
                           (normal_ps_id, tumor_ps_id))
                db.commit()

    def _check_dna_rna(self, db: NGSD, genlab: GenLabDB, current_sample_data: dict,
                       related_sample_data: list, dry_run: bool):
        """NGSDImportGenlab/main.cpp checkForDnaRnaRelation (:183-263)."""
        genlab_related_sample: dict = {}
        for rel_sample_name in genlab.dna_samples_of_rna(current_sample_data["name_external"]):
            rel_sample_id = db.sample_id(rel_sample_name, False)
            if rel_sample_id == "":
                continue
            if not (db.get_sample_data(rel_sample_id)["type"] or "").startswith("DNA"):
                continue
            for rel_ps_id in db.get_values(
                    "SELECT id FROM processed_sample WHERE sample_id=?",
                    params=(db.sample_id(rel_sample_name),)):
                data = db.get_processed_sample_data(rel_ps_id)
                if not genlab_related_sample:
                    genlab_related_sample = data
                elif _is_sample_newer(genlab_related_sample["name"], data["name"]):
                    genlab_related_sample = data

        if genlab_related_sample:
            sys.stdout.write("Adding DNA-RNA relation based on GenLab v_ngs_dnarna table: "
                             f"{current_sample_data['name']} same sample {genlab_related_sample['name']}\n")
            if not dry_run:
                db.execute("INSERT INTO sample_relations (sample1_id, relation, sample2_id) "
                           "VALUES (?, 'same sample', ?)",
                           (db.sample_id(current_sample_data["name"]),
                            db.sample_id(genlab_related_sample["name"])))
                db.commit()
            return

        # nothing in the GenLab DnaRna table -> search samples of the same patient
        best_candidate: dict = {}
        for data in related_sample_data:
            if data["is_tumor"] != current_sample_data["is_tumor"]:
                continue
            if not (data["type"] or "").startswith("DNA"):
                continue
            for rel_ps_id in db.get_values(
                    "SELECT id FROM processed_sample WHERE sample_id=?",
                    params=(db.sample_id(data["name"]),)):
                ps_data = db.get_processed_sample_data(rel_ps_id)
                if ps_data["processing_system_type"] not in ("Panel", "WES", "WGS"):
                    continue
                run_status = str(db.get_value(
                    "SELECT status FROM sequencing_run WHERE name=?",
                    params=(ps_data["run_name"],)) or "")
                if run_status not in ("run_started", "demultiplexing_started",
                                      "analysis_started", "analysis_finished"):
                    continue
                if not best_candidate:
                    best_candidate = ps_data
                elif _is_sample_newer(best_candidate["name"], ps_data["name"]):
                    best_candidate = ps_data

        if best_candidate:
            sys.stdout.write("Adding DNA-RNA relation based on NGSD: "
                             f"{current_sample_data['name']} same sample {best_candidate['name']}\n")
            if not dry_run:
                db.execute("INSERT INTO sample_relations (sample1_id, relation, sample2_id) "
                           "VALUES (?, 'same sample', ?)",
                           (db.sample_id(current_sample_data["name"]),
                            db.sample_id(best_candidate["name"])))
                db.commit()

    # === meta data (NGSDImportGenlab/main.cpp:265-363) ===

    def _import_metadata(self, ps_name: str, db: NGSD, genlab: GenLabDB, dry_run: bool):
        ps_id = db.processed_sample_id(ps_name)
        s_id = db.sample_id(ps_name)
        s_data = db.get_sample_data(s_id)

        def update_sample(column: str, value: str):
            if not dry_run:
                db.execute(f"UPDATE sample SET {column}=? WHERE id=?", (value, s_id))
                db.commit()

        gender = genlab.gender(ps_name)
        if gender and s_data["gender"] == "n/a":
            sys.stdout.write(f"Adding gender: {gender}\n")
            update_sample("gender", gender)

        patient_identifier = genlab.patient_identifier(ps_name)
        if patient_identifier and (s_data["patient_identifier"] or "") == "":
            sys.stdout.write(f"Adding patient identifier: {patient_identifier}\n")
            update_sample("patient_identifier", patient_identifier)

        yob = genlab.year_of_birth(ps_name)
        if yob and s_data["year_of_birth"] == "":
            sys.stdout.write(f"Adding year of birth: {yob}\n")
            update_sample("year_of_birth", yob)

        order_date = genlab.order_entry_date(ps_name)
        if order_date and s_data["order_date"] == "":
            sys.stdout.write(f"Adding order date: {order_date}\n")
            update_sample("order_date", order_date)

        sampling_date = genlab.sampling_date(ps_name)
        if sampling_date and s_data["sampling_date"] == "":
            sys.stdout.write(f"Adding sampling date: {sampling_date}\n")
            update_sample("sampling_date", sampling_date)

        tissue = genlab.tissue(ps_name)
        if tissue and s_data["tissue"] == "n/a":
            sys.stdout.write(f"Adding tissue: {tissue}\n")
            update_sample("tissue", tissue)

        disease_group, disease_status = genlab.disease_info(ps_name)
        if disease_group != "n/a" and s_data["disease_group"] == "n/a":
            sys.stdout.write(f"Adding disease group: {disease_group}\n")
            update_sample("disease_group", disease_group)
        if disease_status != "n/a" and s_data["disease_status"] == "n/a":
            sys.stdout.write(f"Adding disease status: {disease_status}\n")
            update_sample("disease_status", disease_status)

        self._import_disease_details(db, s_id, genlab.anamnesis(ps_name),
                                     "clinical phenotype (free text)", dry_run)
        self._import_disease_details(db, s_id, genlab.orphanet(ps_name), "Orpha number", dry_run)
        self._import_disease_details(db, s_id, genlab.diagnosis(ps_name), "ICD10 code", dry_run)
        self._import_disease_details(db, s_id, genlab.tumor_fraction(ps_name), "tumor fraction", dry_run)
        hpo_accessions = [acc for acc, _name in genlab.phenotypes(ps_name)]
        self._import_disease_details(db, s_id, hpo_accessions, "HPO term id", dry_run)

        # studies
        genlab_studies = genlab.studies(ps_name)
        ngsd_studies = db.get_values(
            "SELECT st.name FROM study st, study_sample ss WHERE ss.study_id=st.id "
            "AND ss.processed_sample_id=?", params=(ps_id,))
        for study in genlab_studies:
            if study not in ngsd_studies:
                study_id = db.get_value("SELECT id FROM study WHERE name=?", params=(study,))
                if study_id is None:
                    # INFO(ArgumentException, ...) in the reference: message + exit 0
                    sys.stdout.write(f"GenLab study name '{study}' not found in NGSD! Please add "
                                     "the study to NGSD, or correct the study name in GenLab!\n")
                    return
                sys.stdout.write(f"Adding study: {study}\n")
                if not dry_run:
                    db.execute("INSERT INTO `study_sample`(`study_id`, `processed_sample_id`) "
                               "VALUES (?, ?)", (study_id, ps_id))
                    db.commit()

    @staticmethod
    def _import_disease_details(db: NGSD, s_id, genlab_values: list[str], info_type: str,
                                dry_run: bool):
        """NGSDImportGenlab/main.cpp importDiseaseDetails (:365-385)."""
        ngsd_values = {info for _t, info in db.get_sample_disease_info(s_id, info_type)}
        for genlab_v in genlab_values:
            if genlab_v not in ngsd_values:
                sys.stdout.write(f"Adding disease details: {info_type} - {genlab_v}\n")
                if not dry_run:
                    db.add_sample_disease_info(s_id, genlab_v, info_type, user="genlab_import")

    # === RNA reference tissue (NGSDImportGenlab/main.cpp:387-425) ===

    def _import_rna_reference_tissue(self, ps_name: str, db: NGSD, dry_run: bool):
        s_id = db.sample_id(ps_name)
        s_data = db.get_sample_data(s_id)
        if s_data["type"] != "RNA":
            return

        from ..core.resources import _decompress_to_temp
        hpo2tissue: dict[str, str] = {}
        with open(_decompress_to_temp("HPO_to_RnaReferenceTissue.tsv")) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                parts = line.split("\t")
                if len(parts) < 2:
                    continue
                if parts[0] in hpo2tissue:
                    raise ToolError("HPO-tissue map contains HPO term more than once:" + parts[0])
                hpo2tissue[parts[0]] = parts[1]

        rna_reference_tissue = set()
        for _type, info in db.get_sample_disease_info(s_id, "HPO term id"):
            if info in hpo2tissue:
                rna_reference_tissue.add(hpo2tissue[info])
        if len(rna_reference_tissue) == 1:
            tissue = next(iter(rna_reference_tissue))
            self._import_disease_details(db, s_id, [tissue], "RNA reference tissue", dry_run)
        elif len(rna_reference_tissue) > 1:
            sys.stdout.write(f"WARNING: Cannot determine RNA reference tissue! Sample {ps_name} "
                             "has multiple HPO terms that are mapped to contradicting RNA "
                             "reference tissues.\n")


def _is_sample_newer(current_sample: str, other_sample: str) -> bool:
    """NGSDImportGenlab/main.cpp isSampleNewer (:427-443)."""
    m_cur = re.search(r"\d+", current_sample)
    m_oth = re.search(r"\d+", other_sample)
    current_base = m_cur.group(0) if m_cur else ""
    other_base = m_oth.group(0) if m_oth else ""
    current_ps_id = current_sample.split("_")[1]
    other_ps_id = other_sample.split("_")[1]

    def to_int(s: str) -> int:  # QString::toInt returns 0 on failure
        try:
            return int(s)
        except ValueError:
            return 0

    if current_base == other_base:
        return to_int(current_ps_id) < to_int(other_ps_id)
    return to_int(current_base) < to_int(other_base)


TOOLS = {
    "GenlabInfo": GenlabInfoTool,
    "NGSDImportGenlab": NGSDImportGenlabTool,
}
