"""NGSDAddVariantsGermline / NGSDAddVariantsSomatic — variant import tools.

Behavioral reference: ngs-bits src/NGSDAddVariantsGermline/main.cpp,
src/NGSDAddVariantsSomatic/main.cpp (+ NGSD::addVariants/addCnv/addSv in
cppNGSD/NGSD.cpp, see ngsd/db.py).
"""

from __future__ import annotations

import json
import sys

from ..io.cnv import CnvList
from ..io.bedpe import BedpeFile
from ..io.gsvar import GSvarFile
from ..ngsd import NGSD, NgsdError
from .toolbase import ToolBase, ToolError


def _gsvar_caller(gs):
    """VariantList::caller/callerVersion/callingDate (VariantList.cpp:1228+)."""
    caller = caller_version = b""
    calling_date = ""
    for line in gs.comments:
        if line.startswith(b"##SOURCE="):
            tmp = line[9:].strip() + b" "
            sep = tmp.index(b" ")
            caller = tmp[:sep].strip()
            caller_version = tmp[sep:].strip()
            break
    for line in gs.comments:
        if line.startswith(b"##CALLING_DATE="):
            calling_date = line[15:].strip().decode()[:10]
            break
    return caller, caller_version, calling_date


def _bedpe_caller(svs: BedpeFile, filename: str):
    """BedpeFile::caller/callerVersion/callingDate (BedpeFile.cpp)."""
    caller = version = None
    date = ""
    for line in svs.headers:
        if line.startswith(b"##source=GenerateSVCandidates"):
            caller = "Manta"
        elif line.startswith(b"##source=Sniffles"):
            caller = "Sniffles"
        elif line.startswith(b"##source=DRAGEN_SV"):
            caller = "DRAGEN"
    for line in svs.headers:
        if line.startswith(b"##source=GenerateSVCandidates "):
            version = line.strip().split(b" ")[1].decode()
        elif line.startswith(b"##source=Sniffles2_"):
            version = line.strip().split(b"_")[1].decode()
        elif line.startswith(b"##DRAGENVersion="):
            i1 = line.index(b"SW:") + 3
            i2 = line.index(b",", i1)
            version = line[i1:i2].strip().decode()
    for line in svs.headers:
        if line.startswith(b"##fileDate="):
            v = line.split(b"=")[1].strip().decode()
            date = f"{v[:4]}-{v[4:6]}-{v[6:8]}"
    if caller is None:
        raise ToolError(f"Could not determine caller from {filename}")
    if version is None:
        raise ToolError(f"Could not determine caller version from {filename}")
    return caller, version, date


def _iso_date(d: str) -> str:
    return d


class NGSDAddVariantsGermlineTool(ToolBase):
    name = "NGSDAddVariantsGermline"
    description = "Imports variants of a processed sample into the NGSD."

    def setup(self):
        self.add_string("ps", "Processed sample name")
        self.add_infile("var", "Small variant list in GSvar format (as produced by megSAP).", optional=True)
        self.add_flag("var_update", "Import missing small variants - doesn't change others.")
        self.add_infile("cnv", "CNV list in TSV format (as produced by megSAP).", optional=True)
        self.add_infile("sv", "SV list in BEDPE format (as produced by megSAP).", optional=True)
        self.add_infile("re", "RE list in VCF format (as produced by megSAP).", optional=True)
        self.add_flag("force", "Force import of small variants (they are skipped, if the same callset is already in NGSD).")
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)
        self.add_float("max_af", "Maximum allele frequency of small variants to import (gnomAD).", optional=True, default=0.05)
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("debug", "Enable verbose debug output.")
        self.add_flag("no_time", "Disable timing output.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        ps_name = self.get_string("ps")
        debug = self.get_flag("debug")
        force = self.get_flag("force")
        var_update = self.get_flag("var_update")

        s_id = db.sample_id(ps_name)
        if db.get_sample_data(s_id)["is_tumor"]:
            raise ToolError(f"Cannot import variant data for sample {ps_name}: the sample is a tumor sample according to NGSD!")

        self._import_small_variants(db, out, ps_name, debug, force, var_update)
        self._import_cnvs(db, out, ps_name, debug)
        self._import_svs(db, out, ps_name, debug)
        self._import_res(db, out, ps_name, debug)
        if out_path:
            out.close()
        db.close()

    def _import_small_variants(self, db, out, ps_name, debug, force, var_update):
        filename = self.get_infile("var")
        if not filename:
            return
        out.write(f"\n### importing small variants for {ps_name} ###\n")
        out.write(f"filename: {filename}\n")
        if force and var_update:
            raise ToolError("Flags -force and -var_update cannot be used at the same time! Use -force to delete old variants and reimport, and -var_update to only import missing variants.")

        ps_id = db.processed_sample_id(ps_name)
        count_old = int(db.get_value(
            "SELECT COUNT(*) FROM detected_variant WHERE processed_sample_id=?", params=(ps_id,)))
        out.write(f"Found {count_old} variants already imported into NGSD!\n")

        gs = GSvarFile.from_file(filename)
        variant_ids, c_add, c_update = db.add_variants(gs, self.get_float("max_af"))
        out.write(f"Imported variants (added:{c_add} updated:{c_update})\n")

        caller, caller_ver, calling_date = _gsvar_caller(gs)
        if caller and caller_ver and calling_date:
            info = db.variant_calling_info(ps_id)["small"]
            if not force and info[0] == caller.decode() and info[1] == caller_ver.decode() and info[2] == calling_date:
                out.write("Skipped import because variants were already imported with the same caller, caller version and calling date!\n")
                return

        if count_old > 0 and not var_update:
            db.delete_detected_variants(ps_id)
            out.write("Deleted previous variants\n")

        if caller and caller_ver:
            db.execute("DELETE FROM small_variants_callset WHERE processed_sample_id=?", (ps_id,))
            db.execute("INSERT INTO small_variants_callset (processed_sample_id, caller, caller_version, call_date) "
                       "VALUES (?, ?, ?, ?)",
                       (ps_id, caller.decode(), caller_ver.decode(), calling_date))
            db.commit()

        if len(gs.variants) == 0:
            out.write("No variants imported (empty GSvar file).\n")
            return

        variants = gs.variants
        if var_update:
            existing = set(db.get_values(
                "SELECT variant_id FROM detected_variant WHERE processed_sample_id=?", params=(ps_id,)))
            new_ids, new_variants = [], []
            for vid, v in zip(variant_ids, variants):
                if vid in existing:
                    continue
                new_ids.append(vid)
                new_variants.append(v)
            out.write(f"Ignored {len(variants) - len(new_variants)} already imported variants\n")
            variant_ids, variants = new_ids, new_variants

        i_geno = gs.annotation_index(ps_name)
        i_filter = gs.annotation_index("filter")
        for vid, v in zip(variant_ids, variants):
            if vid == -1:
                continue
            mosaic = b"mosaic" in v.annotations[i_filter].split(b";")
            db.execute("INSERT INTO detected_variant (processed_sample_id, variant_id, genotype, mosaic) "
                       "VALUES (?, ?, ?, ?)",
                       (ps_id, vid, v.annotations[i_geno].decode(), int(mosaic)))
        db.commit()
        c_skipped = variant_ids.count(-1)
        out.write(f"Imported {len(variant_ids) - c_skipped} detected variants\n")
        if debug:
            out.write(f"DEBUG: Skipped {c_skipped} high-AF variants!\n")

    def _import_cnvs(self, db, out, ps_name, debug):
        filename = self.get_infile("cnv")
        if not filename:
            return
        out.write(f"\n### importing CNVs for {ps_name} ###\n")
        out.write(f"filename: {filename}\n")

        ps_id = db.processed_sample_id(ps_name)
        report_conf_id = db.report_config_id(ps_id)
        if report_conf_id != -1:
            n = db.get_value("SELECT count(*) FROM report_configuration_cnv WHERE report_configuration_id=?",
                             params=(report_conf_id,))
            if int(n) > 0:
                out.write(f"Skipped import of CNVs for sample {ps_name}: a report configuration with CNVs exists for this sample!\n")
                return

        last_callset_id = db.get_value("SELECT id FROM cnv_callset WHERE processed_sample_id=?", params=(ps_id,))
        if last_callset_id is not None:
            db.execute("DELETE FROM cnv WHERE cnv_callset_id=?", (last_callset_id,))
            db.execute("DELETE FROM cnv_callset WHERE id=?", (last_callset_id,))
            db.commit()
            out.write("Deleted previous CNV callset\n")

        cnvs = CnvList.from_file(filename)
        caller_version = ""
        call_date = ""
        quality_metrics = {}
        for line in cnvs.comments:
            if b":" in line:
                parts = line.split(b":")
                key = parts[0].strip()[2:].decode()
                value = b":".join(parts[1:]).strip().decode()
                if key.endswith(" version"):
                    caller_version = value
                elif key.endswith(" finished on"):
                    call_date = value[:10]
                else:
                    quality_metrics[key] = value
        metrics_json = json.dumps(dict(sorted(quality_metrics.items())), separators=(",", ":"))

        caller = "ClinCNV" if cnvs.type != "invalid" else "n/a"
        out.write(f"caller: {caller}\n")
        out.write(f"caller version: {caller_version}\n")
        if debug:
            out.write(f"DEBUG: callset quality: {metrics_json}\n")

        db.execute("INSERT INTO `cnv_callset` (`processed_sample_id`, `caller`, `caller_version`, `call_date`, `quality_metrics`, `quality`) "
                   "VALUES (?, ?, ?, ?, ?, ?)",
                   (ps_id, caller, caller_version, call_date, metrics_json, "n/a"))
        callset_id = db.last_insert_id()

        c_imported = c_skipped = 0
        for cnv in cnvs.variants:
            cnv_id = db.add_cnv(callset_id, cnv, cnvs, 15.0)
            if not cnv_id:
                c_skipped += 1
            else:
                c_imported += 1
                if debug:
                    cn = db.get_value("SELECT cn FROM cnv WHERE id=?", params=(cnv_id,))
                    qm = db.get_value("SELECT quality_metrics FROM cnv WHERE id=?", params=(cnv_id,))
                    out.write(f"DEBUG: {cnv.to_string()} cn:{cn} quality: {qm}\n")
        db.commit()
        out.write(f"Imported cnvs: {c_imported}\n")
        out.write(f"Skipped low-quality cnvs: {c_skipped}\n")

    def _import_svs(self, db, out, ps_name, debug):
        filename = self.get_infile("sv")
        if not filename:
            return
        out.write(f"\n### importing SVs for {ps_name} ###\n")
        out.write(f"filename: {filename}\n")

        ps_id = int(db.processed_sample_id(ps_name))
        if debug:
            out.write(f"Processed sample id: {ps_id}\n")

        report_conf_id = db.report_config_id(ps_id)
        if report_conf_id != -1:
            n = db.get_value("SELECT count(*) FROM report_configuration_sv WHERE report_configuration_id=?",
                             params=(report_conf_id,))
            if int(n) > 0:
                out.write(f"Skipped import of SVs for sample {ps_name}: a report configuration with SVs exists for this sample!\n")
                return

        previous = db.get_value("SELECT id FROM sv_callset WHERE processed_sample_id=?", params=(ps_id,))
        if previous is not None:
            for table in ("sv_deletion", "sv_duplication", "sv_inversion", "sv_insertion", "sv_translocation"):
                db.execute(f"DELETE FROM {table} WHERE sv_callset_id=?", (previous,))
            db.execute("DELETE FROM sv_callset WHERE id=?", (previous,))
            db.commit()
            out.write("Deleted previous SV callset\n")

        svs = BedpeFile.from_file(filename)
        caller, version, date = _bedpe_caller(svs, filename)
        db.execute("INSERT INTO `sv_callset` (`processed_sample_id`, `caller`, `caller_version`, `call_date`) "
                   "VALUES (?, ?, ?, ?)", (ps_id, caller, version, date))
        callset_id = db.last_insert_id()
        if debug:
            out.write(f"Callset id: {callset_id}\n")

        sv_imported = 0
        for i in range(len(svs)):
            sv = svs[i]
            if not sv.chr1.is_non_special() or not sv.chr2.is_non_special():
                continue
            sv_id = db.add_sv(callset_id, sv, svs)
            sv_imported += 1
            if debug:
                table = {b"DEL": "sv_deletion", b"DUP": "sv_duplication", b"INS": "sv_insertion",
                         b"INV": "sv_inversion", b"BND": "sv_translocation"}[sv.type]
                qm = db.get_value(f"SELECT quality_metrics FROM {table} WHERE id=?", params=(sv_id,))
                out.write(f"DEBUG: {sv.position_range()} sv: {sv.type.decode()} quality: {qm}\n")
        db.commit()
        out.write(f"Imported SVs: {sv_imported}\n")
        out.write(f"Skipped SVs: {len(svs) - sv_imported}\n")

    def _import_res(self, db, out, ps_name, debug):
        filename = self.get_infile("re")
        if not filename:
            return
        from ..io.repeat_locus import RepeatLocusList
        out.write(f"\n### importing REs for {ps_name} ###\n")
        out.write(f"filename: {filename}\n")

        ps_id = db.processed_sample_id(ps_name)
        if debug:
            out.write(f"Processed sample id: {ps_id}\n")
            out.write(f"REs in NGSD: {db.get_value('SELECT count(*) FROM repeat_expansion')}\n")

        report_conf_id = db.report_config_id(ps_id)
        if report_conf_id != -1:
            n = db.get_value("SELECT count(*) FROM report_configuration_re WHERE report_configuration_id=?",
                             params=(report_conf_id,))
            if int(n) > 0:
                out.write(f"Skipped import of REs for sample {ps_name}: a report configuration with REs exists for this sample!\n")
                return

        last_callset_id = db.get_value("SELECT id FROM re_callset WHERE processed_sample_id=?", params=(ps_id,))
        if last_callset_id is not None:
            db.execute("DELETE FROM re_callset WHERE processed_sample_id=?", (ps_id,))
            cur = db.execute("DELETE FROM repeat_expansion_genotype WHERE processed_sample_id=?", (ps_id,))
            db.commit()
            out.write(f"Deleted {cur.rowcount} previous repeat expansion calls\n")

        res = RepeatLocusList.load(filename)
        db.execute("INSERT INTO `re_callset` (`processed_sample_id`, `caller`, `caller_version`, `call_date`) "
                   "VALUES (?, ?, ?, ?)",
                   (ps_id, res.caller_as_string(), res.caller_version.decode(), res.call_date))

        re_imported = skipped_not_ngsd = skipped_no_gt = skipped_invalid = 0
        for rl in res.variants:
            repeat_id = db.repeat_expansion_id(rl.region_string(), rl.unit.decode(), False)
            if repeat_id == -1:
                if debug:
                    out.write(f"Skipped repeat '{rl.to_string(True, False)}' because it is not in NGSD!\n")
                skipped_not_ngsd += 1
                continue
            if not rl.allele1:
                if debug:
                    out.write(f"Skipped repeat '{rl.to_string(True, True)}' because genotype could not be determined.\n")
                skipped_no_gt += 1
                continue
            if not rl.is_valid():
                if debug:
                    out.write(f"Skipped repeat '{rl.to_string(True, True)}' because it is not valid!\n")
                skipped_invalid += 1
                continue
            db.execute("INSERT INTO repeat_expansion_genotype (`processed_sample_id`, `repeat_expansion_id`, `allele1`, `allele2`, `filter`) "
                       "VALUES (?, ?, ?, ?, ?)",
                       # allele columns are MySQL INT — values are rounded on insert
                       (ps_id, repeat_id, int(float(rl.allele1) + 0.5),
                        int(float(rl.allele2) + 0.5) if rl.allele2 else None,
                        b",".join(rl.filters).decode() if rl.filters else None))
            re_imported += 1
        db.commit()
        out.write(f"Imported REs: {re_imported}\n")
        out.write(f"Skipped REs not found in NGSD: {skipped_not_ngsd}\n")
        out.write(f"Skipped REs without genotype: {skipped_no_gt}\n")
        out.write(f"Skipped REs not valid: {skipped_invalid} (should not happen)\n")


TOOLS = {
    "NGSDAddVariantsGermline": NGSDAddVariantsGermlineTool,
}


def _gsvar_analysis_type(gs) -> str:
    for line in gs.comments:
        if line.startswith(b"##ANALYSISTYPE="):
            return line.split(b"=", 1)[1].strip().decode()
    return "GERMLINE_SINGLESAMPLE"


class NGSDAddVariantsSomaticTool(ToolBase):
    name = "NGSDAddVariantsSomatic"
    description = "Imports variants of a tumor-normal processed sample into the NGSD."

    def setup(self):
        self.add_string("t_ps", "Tumor processed sample name")
        self.add_string("n_ps", "Normal processed sample name", optional=True, default="")
        self.add_infile("var", "Small variant list in GSvar format (as produced by megSAP).", optional=True)
        self.add_infile("cnv", "CNV list in TSV format (as produced by megSAP).", optional=True)
        self.add_infile("sv", "SV list in BEDPE format (as produced by megSAP).", optional=True)
        self.add_flag("force", "Force import of variants, even if already imported.")
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)
        self.add_float("max_af", "Maximum gnomAD allele frequency of small variants to import for tumor-only.", optional=True, default=0.05)
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("debug", "Enable verbose debug output.")
        self.add_flag("no_time", "Disable timing output.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        t_ps = self.get_string("t_ps")
        n_ps = self.get_string("n_ps")
        debug = self.get_flag("debug")
        force = self.get_flag("force")

        if not db.get_sample_data(db.sample_id(t_ps))["is_tumor"]:
            raise ToolError(f"Cannot import variant data for sample {t_ps}-{n_ps}: the sample is not a somatic sample according to NGSD!")

        self._import_small_variants(db, out, t_ps, n_ps, debug, force)
        self._import_cnvs(db, out, t_ps, n_ps, debug, force, 15.0)
        self._import_svs(db, out, t_ps, n_ps, debug, force)
        if out_path:
            out.close()
        db.close()

    @staticmethod
    def _variant_quality(v, i_qual) -> int:
        for part in v.annotations[i_qual].split(b";"):
            if part.startswith(b"QUAL="):
                return int(part[5:])
        raise ToolError(f"Could not parse quality for variant {v.to_string()}")

    def _import_small_variants(self, db, out, t_ps_name, n_ps_name, debug, force):
        filename = self.get_infile("var")
        if not filename:
            return
        is_tumor_only = not n_ps_name
        analysis_name = t_ps_name + ("" if is_tumor_only else "-" + n_ps_name)
        out.write(f"\n### importing small variants for {analysis_name} ###\n")
        out.write(f"filename: {filename}\n")

        t_ps_id = db.processed_sample_id(t_ps_name)
        n_ps_id = "" if is_tumor_only else db.processed_sample_id(n_ps_name)

        if not is_tumor_only:
            report_conf_id = db.somatic_report_config_id(t_ps_id, n_ps_id)
            if report_conf_id != -1 and int(db.get_value(
                    "SELECT count(*) FROM somatic_report_configuration_variant WHERE somatic_report_configuration_id=?",
                    params=(report_conf_id,))) > 0:
                out.write(f"Skipped import of small variants for analysis {analysis_name}: a somatic report configuration with small variants exists for this sample!\n")
                return

        n_cond = "IS NULL" if is_tumor_only else f"={n_ps_id}"
        count_old = int(db.get_value(
            f"SELECT count(*) FROM detected_somatic_variant WHERE processed_sample_id_tumor={t_ps_id} "
            f"AND processed_sample_id_normal{' ' + n_cond if is_tumor_only else n_cond}"))
        out.write(f"Found {count_old} somatic variants already imported into NGSD!\n")
        if count_old > 0 and not force:
            raise ToolError(f"Small variants were already imported for analysis '{analysis_name}'. Use the flag '-force' to overwrite them.")
        if count_old > 0 and force:
            db.delete_somatic_variants(t_ps_id, n_ps_id, "SNVS_INDELS")
            out.write("Deleted previously imported somatic small variants.\n")

        gs = GSvarFile.from_file(filename)
        caller, caller_ver, calling_date = _gsvar_caller(gs)
        out.write(f"caller: {caller.decode()}\n")
        out.write(f"caller version: {caller_ver.decode()}\n")

        analysis_type = _gsvar_analysis_type(gs)
        if analysis_type not in ("SOMATIC_SINGLESAMPLE", "SOMATIC_PAIR"):
            raise ToolError("Small variants file is not a tumor-normal or a tumor-only analysis. Use NGSDAddVariantsGermline for germline variants!")

        max_af = self.get_float("max_af") if is_tumor_only else 1.0
        variant_ids, c_add, c_update = db.add_variants(gs, max_af)
        out.write(f"Imported variants (added:{c_add} updated:{c_update})\n")

        i_depth = gs.annotation_index("tumor_dp")
        i_frq = gs.annotation_index("tumor_af")
        i_qual = gs.annotation_index("quality")
        for vid, v in zip(variant_ids, gs.variants):
            if vid == -1:
                continue
            db.execute("INSERT INTO detected_somatic_variant (processed_sample_id_tumor, processed_sample_id_normal, "
                       "variant_id, variant_frequency, depth, quality_snp) VALUES (?, ?, ?, ?, ?, ?)",
                       (t_ps_id, None if is_tumor_only else n_ps_id, vid,
                        float(v.annotations[i_frq]), int(v.annotations[i_depth]),
                        self._variant_quality(v, i_qual)))
        db.commit()

        if caller and caller_ver:
            db.execute("INSERT INTO somatic_snv_callset (`processed_sample_id_tumor`, `processed_sample_id_normal`, "
                       "`caller`, `caller_version`, `call_date`) VALUES (?, ?, ?, ?, ?)",
                       (t_ps_id, None if is_tumor_only else n_ps_id,
                        caller.decode(), caller_ver.decode(), calling_date))
            db.commit()
        else:
            out.write(f"Warning: Could not add somatic small variants callset because variant caller ({caller.decode()}) or caller version ({caller_ver.decode()}) are missing in GSvar header.\n")

        c_skipped = variant_ids.count(-1)
        out.write(f"Imported {len(variant_ids) - c_skipped} detected variants\n")
        if debug:
            out.write(f"DEBUG: Skipped {c_skipped} high-AF or too long variants!\n")

    def _import_cnvs(self, db, out, t_ps_name, n_ps_name, debug, force, min_ll):
        filename = self.get_infile("cnv")
        if not filename:
            return
        is_tumor_only = not n_ps_name
        analysis_name = t_ps_name + ("" if is_tumor_only else "-" + n_ps_name)
        out.write(f"\n### importing somatic CNVs for {analysis_name} ###\n")
        out.write(f"filename: {filename}\n")

        t_ps_id = db.processed_sample_id(t_ps_name)
        n_ps_id = "" if is_tumor_only else db.processed_sample_id(n_ps_name)

        if not is_tumor_only:
            report_conf_id = db.somatic_report_config_id(t_ps_id, n_ps_id)
            if report_conf_id != -1 and int(db.get_value(
                    "SELECT count(*) FROM somatic_report_configuration_cnv WHERE somatic_report_configuration_id=?",
                    params=(report_conf_id,))) > 0:
                out.write(f"Skipped import of somatic CNVs for analysis {analysis_name}: a somatic report configuration with CNVs exists for this sample\n")
                return

        n_cond = "IS NULL" if is_tumor_only else f"='{n_ps_id}'"
        last_callset_id = db.get_value(
            f"SELECT id FROM somatic_cnv_callset WHERE ps_tumor_id={t_ps_id} AND ps_normal_id {n_cond}")
        if last_callset_id is not None and not force:
            raise ToolError(f"CNVs were already imported for analysis '{analysis_name}'. Use the flag '-force' to overwrite them.")
        if last_callset_id is not None and force:
            db.delete_somatic_variants(t_ps_id, n_ps_id, "CNVS")
            out.write("Deleted previously imported somatic CNVs\n")

        cnvs = CnvList.from_file(filename)
        caller_version = ""
        call_date = ""
        quality_metrics = {}
        for line in cnvs.comments:
            if b":" in line:
                parts = line.split(b":")
                key = parts[0].strip()[2:].decode()
                value = b":".join(parts[1:]).strip().decode()
                if key.endswith(" version"):
                    caller_version = value
                elif key.endswith(" finished on"):
                    call_date = value[:10]
                else:
                    quality_metrics[key] = value
        metrics_json = json.dumps(dict(sorted(quality_metrics.items())), separators=(",", ":"))
        caller = "ClinCNV" if cnvs.type != "invalid" else "n/a"
        out.write(f"caller: {caller}\n")
        out.write(f"caller version: {caller_version}\n")
        if debug:
            out.write(f"DEBUG: callset quality: {metrics_json}\n")

        if cnvs.type not in ("tumor_normal", "tumor_only"):
            raise ToolError("CNV file is not a tumor-normal or a tumor-only analysis. Use NGSDAddVariantsGermline for germline CNVs!")

        db.execute("INSERT INTO `somatic_cnv_callset` (`ps_tumor_id`, `ps_normal_id`, `caller`, `caller_version`, "
                   "`call_date`, `quality_metrics`, `quality`) VALUES (?, ?, ?, ?, ?, ?, ?)",
                   (t_ps_id, None if is_tumor_only else n_ps_id, caller, caller_version,
                    call_date, metrics_json, "n/a"))
        callset_id = db.last_insert_id()

        c_imported = c_skipped = 0
        for cnv in cnvs.variants:
            cnv_id = db.add_somatic_cnv(callset_id, cnv, cnvs, min_ll)
            if not cnv_id:
                c_skipped += 1
            else:
                c_imported += 1
                if debug:
                    tumor_cn = db.get_value("SELECT tumor_cn FROM somatic_cnv WHERE id=?", params=(cnv_id,))
                    qm = db.get_value("SELECT quality_metrics FROM somatic_cnv WHERE id=?", params=(cnv_id,))
                    out.write(f"DEBUG: {cnv.to_string()} tumor_cn:{tumor_cn} quality{qm}")
        db.commit()
        out.write(f"Imported somatic cnvs: {c_imported}\n")
        out.write(f"Skipped low-quality cnvs: {c_skipped}\n")

    def _import_svs(self, db, out, t_ps_name, n_ps_name, debug, force):
        filename = self.get_infile("sv")
        if not filename:
            return
        is_tumor_only = not n_ps_name
        analysis_name = t_ps_name + ("" if is_tumor_only else "-" + n_ps_name)
        out.write(f"\n### importing SVs for analysis {analysis_name} ###\n")
        out.write(f"filename: {filename}\n")

        t_ps_id = db.processed_sample_id(t_ps_name)
        n_ps_id = "" if is_tumor_only else db.processed_sample_id(n_ps_name)

        if not is_tumor_only:
            report_conf_id = db.somatic_report_config_id(t_ps_id, n_ps_id)
            if report_conf_id != -1 and int(db.get_value(
                    "SELECT count(*) FROM somatic_report_configuration_sv WHERE somatic_report_configuration_id=?",
                    params=(report_conf_id,))) > 0:
                out.write(f"Skipped import of somatic SNVs for analysis {analysis_name}: a somatic report configuration with SVs exists for this sample\n")
                return

        n_cond = "IS NULL" if is_tumor_only else f"='{n_ps_id}'"
        previous = db.get_value(
            f"SELECT id FROM somatic_sv_callset WHERE ps_tumor_id={t_ps_id} AND ps_normal_id {n_cond}")
        if previous is not None and not force:
            out.write(f"NOTE: SVs were already imported for analysis '{analysis_name}' - skipping import\n")
            return
        if previous is not None and force:
            db.delete_somatic_variants(t_ps_id, n_ps_id, "SVS")
            out.write("Deleted previously imported somatic CNVs\n")

        svs = BedpeFile.from_file(filename)
        caller, version, date = _bedpe_caller(svs, filename)
        out.write(f"caller: {caller}\n")
        out.write(f"caller version: {version}\n")

        if svs.format() not in ("somatic_tumor_only", "somatic_tumor_normal"):
            raise ToolError("SV file is not a tumor-normal or a tumor-only analysis. Use NGSDAddVariantsGermline for germline SVs!")

        db.execute("INSERT INTO `somatic_sv_callset` (`ps_tumor_id`, `ps_normal_id`, `caller`, `caller_version`, `call_date`) "
                   "VALUES (?, ?, ?, ?, ?)",
                   (t_ps_id, None if is_tumor_only else n_ps_id, caller, version, date))
        callset_id = db.last_insert_id()
        if debug:
            out.write(f"Callset id: {callset_id}\n")

        sv_imported = 0
        for i in range(len(svs)):
            sv = svs[i]
            if not sv.chr1.is_non_special() or not sv.chr2.is_non_special():
                continue
            sv_id = db.add_somatic_sv(callset_id, sv, svs)
            sv_imported += 1
            if debug:
                table = {b"DEL": "somatic_sv_deletion", b"DUP": "somatic_sv_duplication",
                         b"INS": "somatic_sv_insertion", b"INV": "somatic_sv_inversion",
                         b"BND": "somatic_sv_translocation"}[sv.type]
                qm = db.get_value(f"SELECT quality_metrics FROM {table} WHERE id=?", params=(sv_id,))
                out.write(f"DEBUG: {sv.position_range()} sv: {sv.type.decode()} quality: {qm}\n")
        db.commit()
        out.write(f"Imported SVs: {sv_imported}\n")
        out.write(f"Skipped SVs: {len(svs) - sv_imported}\n")


TOOLS["NGSDAddVariantsSomatic"] = NGSDAddVariantsSomaticTool
