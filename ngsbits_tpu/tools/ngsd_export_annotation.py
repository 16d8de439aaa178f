"""NGSDExportAnnotationData — megSAP annotation source export.

Behavioral reference: ngs-bits src/NGSDExportAnnotationData/{main.cpp,
ExportWorker.cpp,ThreadCoordinator.cpp,Auxilary.h}. The reference
parallelizes per chromosome into temp VCFs and merges; output order equals
the chromosome enum order, so a sequential per-chromosome loop produces
identical files.
"""

from __future__ import annotations

import datetime
import sys

from ..core.intervals import BedFile, BedLine
from ..io.fasta import FastaFileIndex
from ..ngsd import NGSD
from ..ngsd.somatic_vicc import get_somatic_vicc_data, vicc_score_as_string
from .toolbase import ToolBase, ToolError

# VcfFile::INFO_URL_MAPPING (cppNGS/VcfFile.cpp:1557)
_INFO_URL_MAPPING = [("%", "%25"), ("\t", "%09"), ("\n", "%0A"), ("\r", "%0D"),
                     (" ", "%20"), (",", "%2C"), (";", "%3B"), ("=", "%3D")]


def encode_info_value(value: str) -> str:
    for k, v in _INFO_URL_MAPPING:
        value = value.replace(k, v)
    return value


class NGSDExportAnnotationDataTool(ToolBase):
    name = "NGSDExportAnnotationData"
    description = ("Export information aboug germline variants, somatic variants and genes "
                   "form NGSD for use as annotation source, e.g. in megSAP.")

    def setup(self):
        self.add_outfile("germline", "Export germline variants (VCF format).", optional=True)
        self.add_outfile("somatic", "Export somatic variants (VCF format).", optional=True)
        self.add_outfile("genes", "Exports BED file containing genes and gene information.", optional=True)
        self.add_infile("reference", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_float("max_af", "Maximum allel frequency of exported variants (germline).", optional=True, default=0.05)
        self.add_int("gene_offset", "Defines the number of bases by which the regions of genes are extended (genes).", optional=True, default=5000)
        self.add_flag("vicc_config_details", "Includes details about VICC interpretation (somatic).")
        self.add_int("threads", "Number of threads to use.", optional=True, default=5)
        self.add_flag("verbose", "Enables verbose debug output.")
        self.add_int("max_vcf_lines", "Maximum number of VCF lines to write per chromosome - for debugging.", optional=True, default=-1)
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        ref_file = self.get_infile("reference")
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        germline = self.get_outfile("germline")
        somatic = self.get_outfile("somatic")
        genes = self.get_outfile("genes")
        max_af = self.get_float("max_af")
        if max_af < 0:
            raise ToolError("Maximum AF has to be a positive value!")
        max_vcf_lines = self.get_int("max_vcf_lines")
        if self.get_int("threads") < 0:
            raise ToolError("Number of threads has to be a positive value!")
        gene_offset = self.get_int("gene_offset")
        if gene_offset < 0:
            raise ToolError("Gene offset has to be a positive value!")
        if not germline and not somatic and not genes:
            raise ToolError("At least one of the parameters 'germline', 'somatic' or 'genes' needs to be given!")

        db = NGSD(self.get_flag("test"))
        reference = FastaFileIndex(ref_file)
        chrs = db.get_enum("variant", "chr")
        disease_groups = db.get_enum("sample", "disease_group")

        # cache processed sample infos (ThreadCoordinator.cpp:19-30)
        ps_infos = {}
        for ps_id, quality, s_id, status, group in db.get_rows(
                "SELECT ps.id, ps.quality, s.id, s.disease_status, s.disease_group "
                "FROM processed_sample ps, sample s WHERE ps.sample_id=s.id"):
            ps_infos[int(ps_id)] = (quality == "bad", int(s_id), status == "Affected", group)

        # cache classification data
        class_infos = {}
        for variant_id, clas, comment in db.get_rows(
                "SELECT variant_id, class, comment FROM variant_classification"):
            class_infos[int(variant_id)] = ((clas or "").strip().replace("n/a", ""),
                                            encode_info_value(comment or ""))

        # -verbose: per-stage progress to stderr (reference exportingGermline
        # etc. debug output)
        import time as _time

        def stage(name, fn, *args):
            t0 = _time.perf_counter()
            if self.get_flag("verbose"):
                print(f"exporting {name}...", file=sys.stderr)
            fn(*args)
            if self.get_flag("verbose"):
                print(f"exporting {name} done in "
                      f"{(_time.perf_counter() - t0) * 1000:.0f} ms",
                      file=sys.stderr)

        if germline:
            stage("germline", self._export_germline, db, reference, chrs,
                  disease_groups, ps_infos, class_infos, germline, max_af,
                  max_vcf_lines, ref_file)
        if somatic:
            stage("somatic", self._export_somatic, db, reference, chrs,
                  somatic, max_vcf_lines, ref_file)
        if genes:
            stage("genes", self._export_genes, db, genes, gene_offset)
        db.close()

    def _vcf_header(self, out, db, reference, chrs, ref_file):
        out.write("##fileformat=VCFv4.2\n")
        out.write("##fileDate=" + datetime.date.today().strftime("%Y%m%d") + "\n")
        out.write("##source=NGSDExportAnnotationData unknown\n")
        out.write(f"##reference={ref_file}\n")
        for chrom in chrs:
            out.write(f"##contig=<ID={chrom},length={reference.length_of(chrom)}>\n")

    def _export_germline(self, db, reference, chrs, disease_groups, ps_infos, class_infos,
                         path, max_af, max_vcf_lines, ref_file):
        same_cache: dict[int, set] = {}

        def same_samples(s_id):
            if s_id not in same_cache:
                same_cache[s_id] = db.same_samples(s_id, "SAME_PATIENT")
            return same_cache[s_id]

        out = open(path, "w")
        self._vcf_header(out, db, reference, chrs, ref_file)
        out.write('##INFO=<ID=COUNTS,Number=3,Type=Integer,Description="Homozygous/Heterozygous/Mosaic variant counts in NGSD.">\n')
        for i, dg in enumerate(disease_groups):
            out.write(f'##INFO=<ID=GSC{i + 1:02d},Number=2,Type=Integer,Description="Homozygous/Heterozygous variant counts in NGSD for {dg.lower()}.">\n')
        out.write(f'##INFO=<ID=HAF,Number=0,Type=Flag,Description="Indicates a allele frequency above a threshold of {max_af:.2f}.">\n')
        out.write('##INFO=<ID=CLAS,Number=1,Type=String,Description="Classification from the NGSD.">\n')
        out.write('##INFO=<ID=CLAS_COM,Number=1,Type=String,Description="Classification comment from the NGSD.">\n')
        out.write('##INFO=<ID=COM,Number=1,Type=String,Description="Variant comments from the NGSD.">\n')
        out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")

        count_updates = []
        for chrom in chrs:
            chr_len = reference.length_of(chrom)
            lines_written = 0
            for (start, end, ref, obs, gnomad, comment, germline_het, germline_hom,
                 germline_mosaic, variant_id) in db.get_rows(
                    "SELECT start, end, ref, obs, gnomad, comment, germline_het, germline_hom, "
                    "germline_mosaic, id FROM variant WHERE chr=? ORDER BY start ASC, end ASC, id ASC",
                    params=(chrom,)):
                start = int(start)
                if start > chr_len:
                    continue
                pos, vcf_ref, vcf_obs = _to_vcf(reference, chrom, start, ref, obs)
                info = []
                gnomad_val = float(gnomad) if gnomad not in (None, "") else 0.0
                if gnomad_val <= max_af:
                    count_het = count_hom = count_mosaic = 0
                    hom_per_group: dict[str, int] = {}
                    het_per_group: dict[str, int] = {}
                    done_het: set = set()
                    done_hom: set = set()
                    done_mosaic: set = set()
                    for ps_id, genotype, mosaic in db.get_rows(
                            "SELECT processed_sample_id, genotype, mosaic FROM detected_variant "
                            "WHERE variant_id=?", params=(variant_id,)):
                        info_ps = ps_infos.get(int(ps_id))
                        if info_ps is None or info_ps[0]:
                            continue
                        bad, s_id, affected, group = info_ps
                        if genotype == "het":
                            if not mosaic and s_id not in done_het:
                                count_het += 1
                                done_het.add(s_id)
                                done_het |= same_samples(s_id)
                                if affected:
                                    het_per_group[group] = het_per_group.get(group, 0) + 1
                            if mosaic and s_id not in done_mosaic:
                                count_mosaic += 1
                                done_mosaic.add(s_id)
                                done_mosaic |= same_samples(s_id)
                        if genotype == "hom" and s_id not in done_hom:
                            count_hom += 1
                            done_hom.add(s_id)
                            done_hom |= same_samples(s_id)
                            if affected:
                                hom_per_group[group] = hom_per_group.get(group, 0) + 1
                    info.append(f"COUNTS={count_hom},{count_het},{count_mosaic}")
                    for i, dg in enumerate(disease_groups):
                        if het_per_group.get(dg, 0) > 0 or hom_per_group.get(dg, 0) > 0:
                            info.append(f"GSC{i + 1:02d}={hom_per_group.get(dg, 0)},{het_per_group.get(dg, 0)}")
                    if (count_het != int(germline_het or 0) or count_hom != int(germline_hom or 0)
                            or count_mosaic != int(germline_mosaic or 0)):
                        count_updates.append((count_het, count_hom, count_mosaic, variant_id))
                else:
                    info.append("HAF")
                if int(variant_id) in class_infos:
                    clas, clas_comment = class_infos[int(variant_id)]
                    if clas:
                        info.append("CLAS=" + clas)
                    if clas_comment:
                        info.append('CLAS_COM="' + clas_comment + '"')
                if comment:
                    info.append('COM="' + encode_info_value(comment) + '"')
                out.write(f"{chrom}\t{pos}\t{variant_id}\t{vcf_ref}\t{vcf_obs}\t.\t.\t"
                          + (";".join(info) if info else ".") + "\n")
                lines_written += 1
                if 0 < max_vcf_lines <= lines_written:
                    break
        for het, hom, mosaic, vid in count_updates:
            db.execute("UPDATE variant SET germline_het=?, germline_hom=?, germline_mosaic=? WHERE id=?",
                       (het, hom, mosaic, vid))
        db.commit()
        out.close()

    def _export_somatic(self, db, reference, chrs, path, max_vcf_lines, ref_file):
        vicc_details = self.get_flag("vicc_config_details")
        somatic_variant_ids = set(db.get_values("SELECT DISTINCT variant_id FROM detected_somatic_variant"))
        out = open(path, "w")
        self._vcf_header(out, db, reference, chrs, ref_file)
        out.write('##INFO=<ID=SOM_C,Number=1,Type=Integer,Description="Somatic variant count (tumor-normal) in the NGSD.">\n')
        out.write('##INFO=<ID=SOM_P,Number=.,Type=String,Description="Project names containing the somatic variant (tumor-normal) in the NGSD.">\n')
        out.write('##INFO=<ID=SOM_TO_C,Number=1,Type=Integer,Description="Somatic variant count (tumor-only) in the NGSD.">\n')
        out.write('##INFO=<ID=SOM_VICC,Number=1,Type=String,Description="Somatic variant interpretation according VICC standard in the NGSD.">\n')
        out.write('##INFO=<ID=SOM_VICC_COMMENT,Number=1,Type=String,Description="Somatic VICC interpretation comment in the NGSD.">\n')
        if vicc_details:
            from ..ngsd.somatic_vicc import SomaticViccData
            for key in sorted(SomaticViccData().config_as_map()):
                if "comment" in key:
                    continue
                out.write(f'##INFO=<ID=SOM_VICC_{key.upper()},Number=1,Type=String,Description="Somatic VICC value for VICC parameter {key} in the NGSD.">\n')
        out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")

        for chrom in chrs:
            lines_written = 0
            for variant_id, start, end, ref, obs in db.get_rows(
                    "SELECT id, start, end, ref, obs FROM variant WHERE chr=? "
                    "ORDER BY start ASC, end ASC, id ASC", params=(chrom,)):
                if variant_id not in somatic_variant_ids:
                    continue
                start = int(start)
                somatic_count_to = 0
                s_ids_to_done: set = set()
                s_ids_done: set = set()
                project_map: dict[str, int] = {}
                for s_id, _ps_t, project, ps_n in db.get_rows(
                        "SELECT s.id, dsv.processed_sample_id_tumor, p.name, dsv.processed_sample_id_normal "
                        "FROM detected_somatic_variant as dsv, processed_sample ps, sample as s, project as p "
                        "WHERE ps.project_id=p.id AND ps.quality!='bad' AND dsv.processed_sample_id_tumor=ps.id "
                        "AND ps.sample_id=s.id AND s.tumor='1' AND dsv.variant_id=?", params=(variant_id,)):
                    s_id = int(s_id)
                    if ps_n is not None:
                        if s_id in s_ids_done:
                            continue
                        s_ids_done.add(s_id)
                        project_map[project] = project_map.get(project, 0) + 1
                    else:
                        if s_id in s_ids_to_done:
                            continue
                        s_ids_to_done.add(s_id)
                        somatic_count_to += 1
                somatic_count = sum(project_map.values())
                somatic_projects = [encode_info_value(p) for p in sorted(project_map)]

                info = []
                if somatic_count > 0:
                    info.append(f"SOM_C={somatic_count}")
                    info.append("SOM_P=" + (",".join(somatic_projects) if somatic_projects else "."))
                if somatic_count_to > 0:
                    info.append(f"SOM_TO_C={somatic_count_to}")
                vicc = get_somatic_vicc_data(db, variant_id)
                if vicc is not None:
                    info.append("SOM_VICC=" + encode_info_value(vicc_score_as_string(vicc)))
                    info.append("SOM_VICC_COMMENT=" + encode_info_value(vicc.comment))
                    if vicc_details:
                        cfg = vicc.config_as_map()
                        for key in sorted(cfg):
                            info.append("SOM_VICC_" + key.upper() + "=" + encode_info_value(cfg[key]))

                # convert "-" notation to VCF (ExportWorker.cpp:396-441)
                pos, vcf_ref, vcf_obs = start, ref, obs
                if ref == "-" or obs == "-":
                    if start != 1:
                        if obs == "-":
                            pos = start - 1
                        prev = reference.seq(chrom, pos, 1).decode()
                        vcf_ref = (prev + ref).replace("-", "")
                        vcf_obs = (prev + obs).replace("-", "")
                    else:
                        nxt = reference.seq(chrom, pos + 1, 1).decode()
                        vcf_ref = (ref + nxt).replace("-", "")
                        vcf_obs = (obs + nxt).replace("-", "")
                out.write(f"{chrom}\t{pos}\t{variant_id}\t{vcf_ref}\t{vcf_obs}\t.\t.\t"
                          + (";".join(info) if info else ".") + "\n")
                lines_written += 1
                if 0 < max_vcf_lines <= lines_written:
                    break
        out.close()

    def _export_genes(self, db, path, gene_offset):
        output = BedFile()
        for gene in sorted(db.approved_gene_names()):
            gene_info = db.gene_info(gene)
            details = []
            for key, attr in (("inh", "inheritance"), ("oe_syn", "oe_syn"), ("oe_mis", "oe_mis"),
                              ("oe_lof", "oe_lof"), ("pli", "pli")):
                value = (gene_info.get(attr) or "").strip()
                if value and value != "n/a":
                    details.append(f"{key}={value}")
            anno = gene
            if details:
                anno += " (" + " ".join(details) + ")"
            region = db.gene_to_regions(gene, "ensembl", "gene", True)
            if gene_offset > 0:
                region.extend(gene_offset)
            region.merge()
            for l in region.lines:
                output.append(BedLine(l.chr, l.start, l.end, [anno.encode()]))
        output.sort()
        output.store(path)


def _to_vcf(reference, chrom, start, ref, obs):
    """Variant::toVCF (cppNGS/VariantList.cpp) — GSvar to VCF representation."""
    pos = start
    is_snv = len(ref) == 1 and len(obs) == 1 and ref != "-" and obs != "-"
    is_mnp = len(ref) == len(obs) and len(ref) > 1 and "-" not in ref and "-" not in obs
    if is_snv or is_mnp:
        return pos, ref, obs
    prepend = False
    if ref == "-" or ref == "":
        ref = ""
        prepend = True
    elif obs == "-" or obs == "":
        pos -= 1
        obs = ""
        prepend = True
    elif ref[0] != obs[0]:
        pos -= 1
        prepend = True
    if prepend:
        prefix = reference.seq(chrom, pos, 1).decode()
        ref = prefix + ref
        obs = prefix + obs
    return pos, ref, obs


TOOLS = {
    "NGSDExportAnnotationData": NGSDExportAnnotationDataTool,
}
