"""NGSD sample-level tools: NGSDExportSamples, NGSDSameSample,
NGSDSampleUsers, NGSDImportSampleQC.

Behavioral reference: ngs-bits src/NGSDExportSamples/main.cpp,
src/NGSDSameSample/main.cpp, src/NGSDSampleUsers/main.cpp,
src/NGSDImportSampleQC/main.cpp.
"""

from __future__ import annotations

import datetime
import sys

from ngsbits_tpu.utils.stdio import stdin_binary

from ..ngsd import NGSD, NgsdError
from .toolbase import ToolBase, ToolError


class NGSDExportSamplesTool(ToolBase):
    name = "NGSDExportSamples"
    description = "Lists processed samples from the NGSD."

    def setup(self):
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_string("sample", "Sample name filter (substring match).", optional=True, default="")
        self.add_flag("no_bad_samples", "If set, processed samples with 'bad' quality are excluded.")
        self.add_flag("no_tumor", "If set, tumor samples are excluded.")
        self.add_flag("no_normal", "If set, germline samples are excluded.")
        self.add_flag("no_ffpe", "If set, FFPE samples are excluded.")
        self.add_flag("no_resequencing", "If set, samples that are scheduled for resequencing are excluded.")
        self.add_flag("match_external_names", "If set, also samples for which the external name matches 'sample' are exported.")
        self.add_flag("with_merged", "If set, processed samples that were merged into another sample are included.")
        self.add_flag("only_with_small_variants", "If set, only processed samples that have small variants in NGSD are listed.")
        self.add_string("species", "Species filter.", optional=True, default="")
        self.add_string("tissue", "Tissue filter.", optional=True, default="")
        self.add_string("ancestry", "Ancestry filter.", optional=True, default="")
        self.add_string("disease_group", "Disease group filter", optional=True, default="")
        self.add_string("disease_status", "Disease status filter", optional=True, default="")
        self.add_string("phenotypes", "HPO phenotype identifiers separated by colon, e.g. 'HP:0002066;HP:0004322'", optional=True, default="")
        self.add_string("sender", "Sample sender filter.", optional=True, default="")
        self.add_string("study", "Processed sample study filter.", optional=True, default="")
        self.add_string("project", "Project name filter.", optional=True, default="")
        self.add_string("project_type", "Project type filter", optional=True, default="")
        self.add_flag("no_archived_projects", "If set, samples in archived projects are excluded.")
        self.add_string("system", "Processing system name filter (short name).", optional=True, default="")
        self.add_string("system_type", "Type of processing system filter", optional=True, default="")
        self.add_string("run", "Sequencing run name filter.", optional=True, default="")
        self.add_flag("run_finished", "Only show samples where the analysis of the run is finished.")
        self.add_string("run_device", "Sequencing run device name filter.", optional=True, default="")
        self.add_string("run_before", "Sequencing run before or equal to the given date.", optional=True, default="")
        self.add_string("run_after", "Sequencing run after or equal to the given date.", optional=True, default="")
        self.add_flag("no_bad_runs", "If set, sequencing runs with 'bad' quality are excluded.")
        self.add_string("ps_override", "Processed sample list separated by colon, e.g. 'NA12878_58;NA24385_03', or a file containing one processed sample per line.", optional=True, default="")
        self.add_flag("add_qc", "If set, QC columns are added to output.")
        self.add_flag("add_outcome", "If set, diagnostic outcome columns are added to output.")
        self.add_flag("add_disease_details", "If set, disease details columns are added to the output.")
        self.add_flag("add_report_config", "Adds a column with report configuration information (if it exists and if causal variants exist).")
        self.add_flag("add_comments", "Adds sample and processed sample comments columns.")
        self.add_flag("add_normal_sample", "Adds a column with the normal germline sample associated to a tumor samples.")
        self.add_flag("add_dates", "Adds four columns with year of birth, order date, sampling date and sample receipt date.")
        self.add_flag("add_call_details", "Adds variant caller and version and variant calling date columns for small variants, CNVs and SVs.")
        self.add_flag("add_lab_columns", "Adds columns input, molarity, operator, processing method and batch number.")
        self.add_flag("add_study_column", "Add a column with studies of the sample.")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_enum("preset", "Presets for different common searches. Note: presets are applied after argument parsing and thus override command line argument.",
                      optional=True, valid=("none", "germline"), default="none")

    def main(self):
        import os
        db = NGSD(self.get_flag("test"))
        params = {
            "s_name": self.get_string("sample"),
            "s_name_ext": self.get_flag("match_external_names"),
            "s_species": self.get_string("species"),
            "s_sender": self.get_string("sender"),
            "s_tissue": self.get_string("tissue"),
            "s_ancestry": self.get_string("ancestry"),
            "s_disease_group": self.get_string("disease_group"),
            "s_disease_status": self.get_string("disease_status"),
            "s_study": self.get_string("study"),
            "include_bad_quality_samples": not self.get_flag("no_bad_samples"),
            "include_tumor_samples": not self.get_flag("no_tumor"),
            "include_germline_samples": not self.get_flag("no_normal"),
            "include_ffpe_samples": not self.get_flag("no_ffpe"),
            "include_scheduled_for_resequencing_samples": not self.get_flag("no_resequencing"),
            "include_merged_samples": self.get_flag("with_merged"),
            "only_with_small_variants": self.get_flag("only_with_small_variants"),
            "p_name": self.get_string("project"),
            "p_type": self.get_string("project_type"),
            "include_archived_projects": not self.get_flag("no_archived_projects"),
            "sys_name": self.get_string("system"),
            "sys_type": self.get_string("system_type"),
            "r_name": self.get_string("run"),
            "include_bad_quality_runs": not self.get_flag("no_bad_runs"),
            "run_finished": self.get_flag("run_finished"),
            "r_device_name": self.get_string("run_device"),
            "add_qc": self.get_flag("add_qc"),
            "add_outcome": self.get_flag("add_outcome"),
            "add_disease_details": self.get_flag("add_disease_details"),
            "add_report_config": self.get_flag("add_report_config"),
            "add_normal_sample": self.get_flag("add_normal_sample"),
            "add_comments": self.get_flag("add_comments"),
            "add_dates": self.get_flag("add_dates"),
            "add_call_details": self.get_flag("add_call_details"),
            "add_lab_columns": self.get_flag("add_lab_columns"),
            "add_study_column": self.get_flag("add_study_column"),
        }
        phenos = []
        for hpo_id in self.get_string("phenotypes").split(";"):
            hpo_id = hpo_id.strip()
            if not hpo_id:
                continue
            db.phenotype_id_by_accession(hpo_id)  # validate
            phenos.append(hpo_id)
        params["s_phenotypes"] = phenos
        for key, arg in (("r_before", "run_before"), ("r_after", "run_after")):
            raw = self.get_string(arg).strip()
            if raw:
                try:
                    datetime.date.fromisoformat(raw)
                except ValueError:
                    raise ToolError(f"Invalid date given for '{arg}' parameter.\nThe expected format is a ISO date, e.g. '2012-09-27'.")
                params[key] = raw
        if self.get_enum("preset") == "germline":
            params.update(include_ffpe_samples=False, include_tumor_samples=False,
                          include_merged_samples=False, include_bad_quality_samples=False,
                          include_scheduled_for_resequencing_samples=False,
                          include_archived_projects=False, include_bad_quality_runs=False,
                          run_finished=True)
        ps_override = self.get_string("ps_override").strip()
        if ps_override:
            if os.path.exists(ps_override):
                # Helper::loadTextFile(..., trim, '#', skip_empty): comment
                # lines and empty lines are dropped (NGSDExportSamples
                # main.cpp:186)
                with open(ps_override) as fh:
                    params["ps_override"] = [
                        l.strip() for l in fh
                        if l.strip() and not l.lstrip().startswith("#")]
            else:
                params["ps_override"] = [s.strip() for s in ps_override.split(";") if s.strip()]

        headers, rows = db.processed_sample_search(params)
        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        out.write("#" + "\t".join(headers) + "\n")
        for row in rows:
            # DBTable::write replaces tabs/newlines in values with spaces
            out.write("\t".join(v.replace("\t", " ").replace("\n", " ").replace("\r", " ")
                                for v in row[1:]) + "\n")
        if out_path:
            out.close()
        db.close()


class NGSDSameSampleTool(ToolBase):
    name = "NGSDSameSample"
    description = "Lists all processed samples of the same patient/sample."

    def setup(self):
        self.add_string("ps", "Processed sample name.")
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_string("sample_type", "Comma-separated list of sample types.", optional=True, default="")
        self.add_string("system_type", "Comma-separated list of processing system types.", optional=True, default="")
        self.add_string("system", "Comma-separated list of processing system (short) names.", optional=True, default="")
        self.add_enum("mode", "Type of relation (either only same-sample or same-patient (includes same-sample).",
                      optional=True, valid=("SAME_SAMPLE", "SAME_PATIENT"), default="SAME_PATIENT")
        self.add_flag("include_bad", "Include bad processed samples in the output (will be ignored on default).")
        self.add_flag("include_merged", "Include merged quality processed samples in the output (will be ignored on default).")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        ps_name = self.get_string("ps").strip()
        provided_ps_id = int(db.processed_sample_id(ps_name))
        provided_s_id = int(db.sample_id(ps_name))

        f_sample_types = {s for s in self.get_string("sample_type").split(",") if s}
        f_system_types = {s for s in self.get_string("system_type").split(",") if s}
        f_systems = {s for s in self.get_string("system").split(",") if s}
        valid_sample_types = db.get_enum("sample", "sample_type")
        for t in f_sample_types:
            if t not in valid_sample_types:
                raise ToolError(f"Invalid sample type '{t}' provided!\n Valid sample types are: " + ",".join(valid_sample_types))
        valid_system_types = db.get_enum("processing_system", "type")
        for t in f_system_types:
            if t not in valid_system_types:
                raise ToolError(f"Invalid processing system type '{t}' provided!\n Valid system types are: " + ",".join(valid_system_types))
        valid_system_names = db.get_values("SELECT name_short FROM processing_system")
        for t in f_systems:
            if t not in valid_system_names:
                raise ToolError(f"Invalid processing system (short) name '{t}' provided!")

        same = db.same_samples(provided_s_id, self.get_enum("mode"))
        same.add(provided_s_id)
        lines = []
        for s_id in same:
            s_data = db.get_sample_data(s_id)
            for ps_id in db.get_values("SELECT id FROM processed_sample WHERE sample_id=?", params=(s_id,)):
                if ps_id == provided_ps_id:
                    continue
                if not self.get_flag("include_merged"):
                    n = db.get_value("SELECT COUNT(processed_sample_id) FROM merged_processed_samples WHERE processed_sample_id=?", params=(ps_id,))
                    if n > 0:
                        continue
                ps_data = db.get_processed_sample_data(ps_id)
                if not self.get_flag("include_bad") and ps_data["quality"] == "bad":
                    continue
                if f_sample_types and s_data["type"] not in f_sample_types:
                    continue
                if f_system_types and ps_data["processing_system_type"] not in f_system_types:
                    continue
                sys_short = db.get_value("SELECT name_short FROM processing_system WHERE name_manufacturer=?",
                                         params=(ps_data["processing_system"],)) or ""
                if f_systems and sys_short not in f_systems:
                    continue
                run_date = db.get_value("SELECT start_date FROM sequencing_run WHERE name=?",
                                        params=(ps_data["run_name"],))
                if run_date:
                    d = datetime.date.fromisoformat(str(run_date)[:10])
                    run_date_str = d.strftime("%d.%m.%Y")
                else:
                    run_date_str = ""
                lines.append("\t".join([ps_data["name"], s_data["type"],
                                        ps_data["processing_system_type"], sys_short,
                                        ps_data["processing_system"], ps_data["run_name"],
                                        run_date_str]))
        lines.sort()
        header = "\t".join(["#processed_sample", "sample_type", "processing_system_type",
                            "processing_system_name", "processing_system_name_short",
                            "run_id", "run_date"])
        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        out.write(header + "\n")
        out.write("\n".join(lines))
        if out_path:
            out.close()
        db.close()


class NGSDSampleUsersTool(ToolBase):
    """Behavioral reference: src/NGSDSampleUsers/main.cpp — users that
    created/updated/finalized the report config or set the diag status."""

    name = "NGSDSampleUsers"
    description = "Returns a list of users that evaluated a sample."

    def setup(self):
        self.add_infile("in", "Input TSV file with processed sample names in the first column. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        in_path = self.get_infile("in")
        fh = open(in_path, "rb") if in_path else stdin_binary()
        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        out.write("#ps\treport_config_created\treport_config_last_update\treport_config_finalized\tdiag_status\n")
        for raw in fh:
            line = raw.decode().strip()
            if not line or line.startswith("#"):
                continue
            ps = line.split("\t")[0]
            ps_id = db.processed_sample_id(ps)
            vals = []
            for col in ("created_by", "last_edit_by", "finalized_by"):
                vals.append(db.get_value(
                    f"SELECT u.name FROM report_configuration rc, user u WHERE u.id=rc.{col} "
                    "AND rc.processed_sample_id=?", params=(ps_id,)) or "")
            vals.append(db.get_value(
                "SELECT u.name FROM diag_status ds, user u WHERE u.id=ds.user_id "
                "AND ds.processed_sample_id=?", params=(ps_id,)) or "")
            out.write(ps + "\t" + "\t".join(vals) + "\n")
        if in_path:
            fh.close()
        if out_path:
            out.close()
        db.close()


class NGSDImportSampleQCTool(ToolBase):
    """Behavioral reference: src/NGSDImportSampleQC/main.cpp."""

    name = "NGSDImportSampleQC"
    description = "Imports QC metrics of a sample into NGSD."

    def setup(self):
        self.add_string("ps", "Processed sample name.")
        self.add_infile_list("files", "qcML files to import.")
        self.add_flag("force", "Overwrites already existing QC metrics instead of throwing an error.")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        from ..core.qcml import QCType
        from ..tools.qc_tools import qc_from_qcml
        ps = self.get_string("ps")
        db = NGSD(self.get_flag("test"))
        ps_id = db.processed_sample_id(ps)
        count_old = db.get_value(
            "SELECT count(id) FROM processed_sample_qc WHERE processed_sample_id=?", params=(ps_id,))
        sys.stdout.write(f"Found {count_old} QC metrics of processed sample '{ps}' already in NGSD.\n")
        if count_old != 0:
            if not self.get_flag("force"):
                raise ToolError(f"QC metrics of processed sample '{ps}' are already imported. Use '-force' to overwrite them.")
            db.execute("DELETE FROM processed_sample_qc WHERE processed_sample_id=?", (ps_id,))
            sys.stdout.write(f"Deleted existing QC metrics of '{ps}' because the flag '-force' was used.\n")

        from ..core.ontology import qcml_terms
        terms = qcml_terms()
        accessions_done = set()
        metrics = []
        for path in self.get_infile_list("files"):
            for qv in qc_from_qcml(str(path)):
                if qv.type == QCType.IMAGE:
                    continue
                # QCCollection::fromQCML skips metrics with unknown accession
                # or with values not convertible to the ontology type
                if not terms.contains(qv.accession):
                    sys.stdout.write(f"File {path} contains error: Skipped metric with unknown accession (accession={qv.accession}/{qv.name})\n")
                    continue
                vtype = terms.get(qv.accession).term_type
                if vtype in ("int", "float") and qv.type == QCType.STRING:
                    sys.stdout.write(f"File {path} contains error: Skipped metric with invalid {'integer' if vtype == 'int' else 'float'} value '{qv.value}' (accession={qv.accession}/{qv.name})\n")
                    continue
                if qv.accession in accessions_done:
                    raise ToolError(f"Metric {qv.accession} contained more than once in input files!")
                accessions_done.add(qv.accession)
                metrics.append(qv)
        for qv in metrics:
            term_id = db.get_value("SELECT id FROM qc_terms WHERE qcml_id=?", params=(qv.accession,))
            if term_id is None:
                raise ToolError(f"NGSD single value query returned no value: qc term '{qv.accession}'")
            db.execute("INSERT INTO processed_sample_qc (processed_sample_id, qc_terms_id, value) VALUES (?, ?, ?)",
                       (ps_id, term_id, str(qv.value)))
        db.commit()
        sys.stdout.write(f"Imported {len(metrics)} QC metrics of processed sample '{ps}' into NGSD.\n")
        db.close()


TOOLS = {
    "NGSDExportSamples": NGSDExportSamplesTool,
    "NGSDSameSample": NGSDSameSampleTool,
    "NGSDSampleUsers": NGSDSampleUsersTool,
    "NGSDImportSampleQC": NGSDImportSampleQCTool,
}
