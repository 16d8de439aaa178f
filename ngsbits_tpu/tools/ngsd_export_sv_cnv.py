"""NGSD track export tools: NGSDExportCnvTrack, NGSDExportSV.

Behavioral reference: ngs-bits src/NGSDExportCnvTrack/main.cpp,
src/NGSDExportSV/main.cpp + NGSD::structuralVariant (cppNGSD/NGSD.cpp).
"""

from __future__ import annotations

import datetime
import os
import sys

from ..core.basicstats import median, q1, q3
from ..ngsd import NGSD, NgsdError
from .toolbase import ToolBase, ToolError


def _qt_num(v: float) -> str:
    return f"{v:.6g}"


class NGSDExportCnvTrackTool(ToolBase):
    """Behavioral reference: src/NGSDExportCnvTrack/main.cpp."""

    name = "NGSDExportCnvTrack"
    description = "Exports a IGV-conform CNV track for a processing system."

    def setup(self):
        self.add_string("system", "Processing system name filter (short name).", optional=True, default="")
        self.add_outfile("out", "Output IGV file.")
        self.add_float("min_dp", "Minimum depth of the processed sample.", optional=True, default=0.0)
        self.add_float("max_cnvs", "Maximum number of CNVs per sample.", optional=True, default=0.0)
        self.add_float("min_af", "Minimum allele frequency of output CNV ranges.", optional=True, default=0.01)
        self.add_string("caller_version", "Restrict output to callsets with this caller version.", optional=True, default="")
        self.add_outfile("stats", "Statistics and logging output. If unset, writes to STDOUT", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        system = self.get_string("system")
        min_dp = self.get_float("min_dp")
        max_cnvs = self.get_float("max_cnvs")
        min_af = self.get_float("min_af")
        if max_cnvs == 0.0:
            max_cnvs = float("inf")
        caller_version = self.get_string("caller_version")

        stats_path = self.get_outfile("stats")
        stats = open(stats_path, "w") if stats_path else sys.stdout

        sys_id = db.processing_system_id(system, False)
        if sys_id == -1:
            valid = db.get_values("SELECT name_short FROM processing_system ORDER BY name_short ASC")
            raise NgsdError(f"Invalid processing system short name '{system}'.\n"
                            "Valid names are: " + ", ".join(valid))

        stats_cnvs: list[float] = []
        stats_depth: list[float] = []
        cs_ids = [str(v) for v in db.get_values(
            "SELECT cs.id FROM cnv_callset cs, processed_sample ps "
            f"WHERE ps.processing_system_id={sys_id} AND ps.id=cs.processed_sample_id "
            "AND ps.quality!='bad' AND cs.quality!='bad'")]
        stats.write(f"Found {len(cs_ids)} high-quality CNV callsets for the processing system.\n")
        skip = [False] * len(cs_ids)
        for i, cs_id in enumerate(cs_ids):
            ps = db.processed_sample_name(db.get_value(
                f"SELECT processed_sample_id FROM cnv_callset WHERE id='{cs_id}'"))
            depth = db.get_value(
                "SELECT qc.value FROM processed_sample_qc qc, qc_terms t, cnv_callset cs "
                "WHERE t.id=qc.qc_terms_id AND t.qcml_id='QC:2000025' "
                f"AND cs.processed_sample_id=qc.processed_sample_id AND cs.id='{cs_id}'")
            if depth is not None:
                try:
                    depth_val = float(depth)
                except (TypeError, ValueError):
                    depth_val = None
                if depth_val is not None:
                    if depth_val < min_dp:
                        stats.write(f"Skipping sample {ps} - depth ({_qt_num(depth_val)}) is below {_qt_num(min_dp)}!\n")
                        skip[i] = True
                        continue
                    stats_depth.append(depth_val)
            cnv_count = int(db.get_value(f"SELECT count(*) FROM cnv WHERE cnv_callset_id={cs_id}"))
            if cnv_count > max_cnvs:
                stats.write(f"Skipping sample {ps} - CNV count ({cnv_count}) is higher than {_qt_num(max_cnvs)}!\n")
                skip[i] = True
                continue
            if caller_version:
                version = db.get_value(f"SELECT caller_version FROM cnv_callset WHERE id={cs_id}")
                if version != caller_version:
                    stats.write(f"Skipping sample {ps} - caller version ({version}) is wrong!\n")
                    skip[i] = True
            stats_cnvs.append(float(cnv_count))
        sample_count = skip.count(False)
        stats.write(f"Using {sample_count} of {len(cs_ids)} callsets\n")

        for title, data in (("number of CNVs", stats_cnvs), ("depth", stats_depth)):
            stats.write(f"Statistics - {title}\n")
            if not data:
                stats.write("  no callsets!\n")
            else:
                data = sorted(data)
                stats.write(f"  min   : {_qt_num(data[0])}\n")
                stats.write(f"  q1    : {_qt_num(q1(data))}\n")
                stats.write(f"  median: {_qt_num(median(data))}\n")
                stats.write(f"  q3    : {_qt_num(q3(data))}\n")
                stats.write(f"  max   : {_qt_num(data[-1])}\n")

        out = open(self.get_outfile("out"), "w")
        out.write("#track graphtype=heatmap viewLimits=0.0:1.0 color=0,0,255 altColor=255,255,255 "
                  "midRange=0.001:0.02 midColor=204,204,255 windowingFunction=maximum\n")
        out.write(f"Chromosome\tStart\tEnd\tCN histogram (0-10)\tAF {system}\n")

        active_ids = [cs_id for cs_id, sk in zip(cs_ids, skip) if not sk]
        for chrom in db.get_enum("cnv", "chr"):
            stats.write(f"Processing chromosome {chrom}...\n")
            cnvs = []
            for cs_id in active_ids:
                for s, e, cn in db.get_rows(
                        "SELECT start, end, cn FROM cnv WHERE cnv_callset_id=? AND chr=?",
                        params=(cs_id, chrom)):
                    # subtract 1 to remove one-base overlaps (main.cpp:203)
                    cnvs.append((int(s), int(e) - 1, int(cn)))
            stats.write(f"  Found {len(cnvs)} CNVs\n")
            cnvs.sort(key=lambda c: c[0])

            # iterate over maximal overlapping ranges
            i_end = -1
            n = len(cnvs)
            while i_end + 1 < n:
                i_start = i_end + 1
                i_end = i_start
                start = cnvs[i_start][0]
                end = cnvs[i_end][1]
                while i_end + 1 < n and _range_overlaps(start, end, cnvs[i_end + 1][0], cnvs[i_end + 1][1]):
                    i_end += 1
                    end = max(end, cnvs[i_end][1])
                positions = sorted({p for i in range(i_start, i_end + 1)
                                    for p in (cnvs[i][0], cnvs[i][1] + 1)})
                for k in range(len(positions) - 1):
                    s = positions[k]
                    e = positions[k + 1] - 1
                    cn_hist = [0] * 10
                    matches = 0
                    for i in range(i_start, i_end + 1):
                        if _range_overlaps(s, e, cnvs[i][0], cnvs[i][1]):
                            matches += 1
                            cn_hist[min(max(cnvs[i][2], 0), 9)] += 1
                    af = matches / sample_count
                    if af >= min_af:
                        hist = ",".join(str(sample_count - matches if i == 2 else cn_hist[i])
                                        for i in range(10))
                        out.write(f"{chrom}\t{s}\t{e + 1}\t{hist}\t{af:.4f}\n")
        out.close()
        if stats_path:
            stats.close()
        db.close()


def _range_overlaps(s1: int, e1: int, s2: int, e2: int) -> bool:
    return s1 <= e2 and s2 <= e1


_GENO_MAP = {"hom": "1/1", "het": "0/1"}

# annotation columns of the exported BEDPE files
_ANNO_HEADERS = ["TYPE", "PROCESSING_SYSTEM", "ID", "FORMAT", "FORMAT_VALUES", "DISEASE_GROUP"]
_IDX_TYPE, _IDX_SYS, _IDX_ID, _IDX_FORMAT, _IDX_FORMAT_VALUES, _IDX_DISEASE_GROUP = range(6)


class NGSDExportSVTool(ToolBase):
    """Behavioral reference: src/NGSDExportSV/main.cpp."""

    name = "NGSDExportSV"
    description = "Exports all SVs from the NGSD into BEDPE files."

    def setup(self):
        self.add_outfile("out_folder", "Output folder for the exported BEDPE files.")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_int("common_sys_threshold", "Minimal number of samples for which a seperate density file is created.",
                     optional=True, default=50)

    def main(self):
        db = NGSD(self.get_flag("test"))
        out_folder = self.get_outfile("out_folder")
        threshold = self.get_int("common_sys_threshold")

        chromosomes = db.get_enum("sv_deletion", "chr")
        disease_groups = db.get_enum("sample", "disease_group")

        # sample counts per processing system (high-quality, unmerged callsets)
        sample_counts: dict[str, int] = {}
        for sys_id, count in db.get_rows(
                "SELECT ps.processing_system_id, COUNT(sc.id) FROM sv_callset sc "
                "INNER JOIN processed_sample ps ON sc.processed_sample_id = ps.id "
                "WHERE ps.quality != 'bad' AND NOT EXISTS "
                "(SELECT 1 FROM merged_processed_samples mps WHERE mps.processed_sample_id = sc.processed_sample_id) "
                "GROUP BY ps.processing_system_id"):
            name_short = db.get_value("SELECT name_short FROM processing_system WHERE id=?",
                                      params=(sys_id,))
            sample_counts[name_short] = int(count)

        sv_density: dict[str, dict[int, int]] = {c: {} for c in chromosomes}
        sv_density_per_sys: dict[str, dict[str, dict[int, int]]] = {}
        for key in sorted(sample_counts):
            if sample_counts[key] >= threshold:
                sv_density_per_sys[key] = {c: {} for c in chromosomes}

        valid_cs_ids = set(db.get_values(
            "SELECT sc.id FROM sv_callset sc INNER JOIN processed_sample ps ON sc.processed_sample_id = ps.id "
            "WHERE ps.quality != 'bad' AND NOT EXISTS "
            "(SELECT 1 FROM merged_processed_samples mps WHERE mps.processed_sample_id = sc.processed_sample_id)"))

        callset_cache: dict[int, str] = {}
        file_date = datetime.date.today().strftime("%Y%m%d")

        for sv_type, table, order in (
                ("DEL", "sv_deletion", "ORDER BY `start_min`, `start_max`, `end_min`, `end_max`, `id`"),
                ("DUP", "sv_duplication", "ORDER BY `start_min`, `start_max`, `end_min`, `end_max`, `id`"),
                ("INS", "sv_insertion", "ORDER BY `pos`, `ci_upper`, `id`"),
                ("INV", "sv_inversion", "ORDER BY `start_min`, `start_max`, `end_min`, `end_max`, `id`"),
                ("BND", "sv_translocation", "ORDER BY `start1`, `end1`, `start2`, `end2`, `id`")):
            # `id` tie-break matches MySQL's scan order for equal positions
            chr_col = "chr1" if sv_type == "BND" else "chr"
            out = open(os.path.join(out_folder, table + ".bedpe"), "w")
            out.write("##fileformat=BEDPE\n")
            out.write(f"##fileDate={file_date}\n")
            for key in sorted(sample_counts):
                out.write(f"##sample_count=({key}, {sample_counts[key]})\n")
            for i, dg in enumerate(disease_groups):
                out.write(f'##INFO=<ID=GSC{i + 1:02d},Number=1,Type=String,Description="Disease group: {dg.lower()}.">\n')
            out.write("#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\t" + "\t".join(_ANNO_HEADERS) + "\n")

            for chrom in chromosomes:
                ids = db.get_values(f"SELECT `id` FROM `{table}` WHERE {chr_col}=? {order}",
                                    params=(chrom,))
                for sv_id in ids:
                    pos, cs_id, genotype, extras = self._structural_variant(db, table, sv_type, sv_id)
                    chr1, start1, end1, chr2, start2, end2 = pos
                    # NGSDExportSV/main.cpp:262 reads the FORMAT column (always
                    # "GT") instead of FORMAT_VALUES, so allele_count is always 1
                    allele_count = 2 if "GT".split(":")[0] == "1/1" else 1
                    if cs_id not in valid_cs_ids:
                        continue
                    if cs_id in callset_cache:
                        processing_system = callset_cache[cs_id]
                    else:
                        processing_system = db.get_value(
                            "SELECT sys.name_short FROM `sv_callset` sc "
                            "INNER JOIN `processed_sample` ps ON sc.processed_sample_id = ps.id "
                            "INNER JOIN `processing_system` sys ON ps.processing_system_id = sys.id "
                            "WHERE sc.id = ?", no_value_is_ok=False, params=(cs_id,))
                        callset_cache[cs_id] = processing_system
                    disease_group = db.get_value(
                        "SELECT s.disease_group FROM `sv_callset` sc "
                        "INNER JOIN `processed_sample` ps ON sc.processed_sample_id = ps.id "
                        "INNER JOIN `sample` s ON ps.sample_id = s.id WHERE sc.id = ?",
                        no_value_is_ok=False, params=(cs_id,))

                    anno = [""] * 6
                    anno[_IDX_TYPE] = sv_type
                    anno[_IDX_SYS] = processing_system
                    anno[_IDX_FORMAT] = "GT"
                    anno[_IDX_FORMAT_VALUES] = genotype
                    anno[_IDX_DISEASE_GROUP] = f"GSC{disease_groups.index(disease_group) + 1:02d}"
                    fields = [chr1, str(start1), str(end1), chr2, str(start2), str(end2)] + anno
                    if sv_type == "BND":
                        anno[_IDX_ID] = str(sv_id)
                        fields = [chr1, str(start1), str(end1), chr2, str(start2), str(end2)] + anno
                        out.write("\t".join(fields) + "\n")
                        fields2 = [chr2, str(start2), str(end2), chr1, str(start1), str(end1)] + anno
                        out.write("\t".join(fields2) + "\n")
                    else:
                        out.write("\t".join(fields) + "\n")

                    # SV breakpoint density
                    for density in [sv_density] + ([sv_density_per_sys[processing_system]]
                                                   if processing_system in sv_density_per_sys else []):
                        d1 = density[chr1]
                        for i in range(start1, end1 + 1):
                            d1[i] = d1.get(i, 0) + allele_count
                        if sv_type != "INS":
                            d2 = density[chr2]
                            for i in range(start2, end2 + 1):
                                d2[i] = d2.get(i, 0) + allele_count
            out.close()

        self._collapse_density(out_folder, sv_density, chromosomes)
        for sys_name in sorted(sv_density_per_sys):
            self._collapse_density(out_folder, sv_density_per_sys[sys_name], chromosomes, sys_name)
        db.close()

    @staticmethod
    def _structural_variant(db, table, sv_type, sv_id):
        """NGSD::structuralVariant (NGSD.cpp) — positions + callset + GT."""
        if sv_type in ("DEL", "DUP", "INV"):
            row = db.get_rows(f"SELECT chr, start_min, start_max, end_min, end_max, genotype, sv_callset_id "
                              f"FROM `{table}` WHERE id=?", params=(sv_id,))[0]
            chrom, s_min, s_max, e_min, e_max, geno, cs_id = row
            pos = (chrom, int(s_min), int(s_max), chrom, int(e_min), int(e_max))
        elif sv_type == "INS":
            row = db.get_rows("SELECT chr, pos, ci_upper, genotype, sv_callset_id "
                              "FROM `sv_insertion` WHERE id=?", params=(sv_id,))[0]
            chrom, p, ci_upper, geno, cs_id = row
            pos = (chrom, int(p), int(p) + int(ci_upper), chrom, int(p), int(p))
        else:  # BND
            row = db.get_rows("SELECT chr1, start1, end1, chr2, start2, end2, genotype, sv_callset_id "
                              "FROM `sv_translocation` WHERE id=?", params=(sv_id,))[0]
            c1, s1, e1, c2, s2, e2, geno, cs_id = row
            pos = (c1, int(s1), int(e1), c2, int(s2), int(e2))
        return pos, int(cs_id), _GENO_MAP.get(geno, "./."), None

    @staticmethod
    def _collapse_density(out_folder, sv_density, chromosomes, sys_name=""):
        name = "sv_breakpoint_density" + (f"_{sys_name}" if sys_name else "") + ".igv"
        suffix = f" ({sys_name})" if sys_name else ""
        with open(os.path.join(out_folder, name), "w") as out:
            out.write("#track graphtype=bar autoScale=on windowingFunction=none coords=0 "
                      f'name="SV break point density{suffix}"\n')
            for chrom in chromosomes:
                current = sv_density[chrom]
                start = -1
                end = -1
                value = 0
                for p in sorted(current):
                    if start < 0:
                        start, end, value = p, p, current[p]
                    elif p == end + 1 and value == current[p]:
                        end = p
                    else:
                        # NOTE main.cpp never flushes the trailing segment of a
                        # chromosome — bug-compatible with collapseSvDensity()
                        out.write(f"{chrom}\t{start}\t{end + 1}\t.\t{value}\n")
                        start, end, value = p, p, current[p]
        sys.stdout.write("Collapsing SV density done\n")


TOOLS = {
    "NGSDExportCnvTrack": NGSDExportCnvTrackTool,
    "NGSDExportSV": NGSDExportSVTool,
}
