"""BedpeAnnotateCounts — annotate BEDPE with NGSD SV count flat files.

Behavioral reference: ngs-bits src/BedpeAnnotateCounts/main.cpp (tabix-indexed
BEDPE flat files produced by NGSDExportSV).
"""

from __future__ import annotations

import gzip
import os
import re
import sys

from ..core.chromosome import Chromosome
from ..io.bedpe import BedpeFile
from ..io.tabix import TabixIndexedFile
from ..ngsd import NGSD
from .toolbase import ToolBase, ToolError


class BedpeAnnotateCountsTool(ToolBase):
    name = "BedpeAnnotateCounts"
    description = "Annotates a BEDPE file with NGSD count information of zipped BEDPE flat files."

    def setup(self):
        self.add_infile("in", "Input BEDPE file.")
        self.add_outfile("out", "Output BEDPE file.")
        self.add_infile("ann_folder", "Input folder containing NGSD count flat files.")
        self.add_string("ps_name", "Processed sample name of the associated input file.", optional=True)
        self.add_string("processing_system", "Processing system short name of the processed sample.", optional=True)
        self.add_string("disease_group", "Disease group of the input sample.", optional=True)
        self.add_flag("test", "Uses NGSD test db instead of the production db.")

    def main(self):
        ann_folder = self.get_infile("ann_folder")
        ps_name = self.get_string("ps_name") or ""
        processing_system = (self.get_string("processing_system") or "").encode()
        disease_group = (self.get_string("disease_group") or "").lower().encode()

        count_indices = {
            t: TabixIndexedFile(os.path.join(ann_folder, f"{f}.bedpe.gz"))
            for t, f in ((b"DEL", "sv_deletion"), (b"DUP", "sv_duplication"),
                         (b"INS", "sv_insertion"), (b"INV", "sv_inversion"),
                         (b"BND", "sv_translocation"))}

        bedpe = BedpeFile.from_file(self.get_infile("in"))
        i_ngsd_hom = bedpe.annotation_index_by_name(b"NGSD_HOM", False)
        i_ngsd_het = bedpe.annotation_index_by_name(b"NGSD_HET", False)
        i_ngsd_af = bedpe.annotation_index_by_name(b"NGSD_AF", False)
        i_disease_group = bedpe.annotation_index_by_name(b"NGSD_group", False)

        trans_path = os.path.join(ann_folder, "sv_translocation.bedpe.gz")
        if ps_name:
            dg_parameter_given = True
            db = NGSD(self.get_flag("test"))
            ps_id = db.processed_sample_id(ps_name)
            if not disease_group or not processing_system:
                if not disease_group:
                    disease_group = str(db.get_value(
                        "SELECT disease_group FROM sample WHERE id = (SELECT sample_id FROM processed_sample WHERE id = ?)",
                        no_value_is_ok=False, params=(ps_id,))).lower().encode()
                    dg_parameter_given = False
                if not processing_system:
                    processing_system = str(db.get_value(
                        "SELECT name_short FROM processing_system WHERE id = (SELECT processing_system_id FROM processed_sample WHERE id = ?)",
                        no_value_is_ok=False, params=(ps_id,))).encode()
            self._parse_head(trans_path, processing_system, disease_group)
            disease_groups = db.get_enum("sample", "disease_group")
            if dg_parameter_given and disease_group.decode() not in disease_groups:
                raise ToolError(f"Given disease_group parameter: `{disease_group.decode()}` is not valid!")
            mapping = {f"GSC{i + 1:02d}": dg.lower() for i, dg in enumerate(disease_groups)}
            if mapping.get(self._disease_group_id, "") != disease_group.decode():
                raise ToolError(f"Disease Group ID mapping incorrect in annotation file: {trans_path}!")
            disease_group = self._disease_group_id.encode()
            db.close()
        else:
            self._parse_head(trans_path, processing_system, disease_group)

        out_buffer = [b"\n".join(bedpe.headers) + b"\n"]
        header = list(bedpe.annotation_headers)
        additional = []
        if i_ngsd_hom < 0:
            i_ngsd_hom = len(header)
            additional.append(b"0")
            header.append(b"NGSD_HOM")
        if i_ngsd_het < 0:
            i_ngsd_het = len(header)
            additional.append(b"0")
            header.append(b"NGSD_HET")
        if i_ngsd_af < 0:
            i_ngsd_af = len(header)
            additional.append(b"")
            header.append(b"NGSD_AF")
        if i_disease_group < 0 and ps_name:
            i_disease_group = len(header)
            additional.append(b"")
            header.append(b"NGSD_group")
        out_buffer.append(b"#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\t" + b"\t".join(header) + b"\n")

        for sv in bedpe.lines:
            anno = list(sv.annotations) + list(additional)
            bnd_ids = set()
            if sv.chr1.is_non_special() and sv.chr2.is_non_special():
                if sv.type == b"BND":
                    region = (sv.chr1, sv.start1, sv.end1 + 1)
                else:
                    region = (sv.chr1, min(sv.start1, sv.start2), max(sv.end1, sv.end2) + 1)
                n_hom = n_het = n_dg_hom = n_dg_het = 0
                matches = count_indices[sv.type].get_matching_lines(region[0], region[1], region[2], True)
                for match in matches:
                    cols = match.split(b"\t")
                    if len(cols) < 6:
                        raise ToolError("Too few columns for SV!")
                    if processing_system != cols[self._idx_sys].strip():
                        continue
                    if sv.type == b"INS":
                        hit = _overlaps(region[0], region[1], region[2],
                                        cols[0], int(cols[1]), int(cols[2]))
                    elif sv.type == b"BND":
                        bnd_id = int(cols[self._idx_sv_id])
                        if bnd_id in bnd_ids:
                            continue
                        hit = (_overlaps(sv.chr1, sv.start1, sv.end1 + 1, cols[0], int(cols[1]), int(cols[2]) + 1)
                               and _overlaps(sv.chr2, sv.start2, sv.end2 + 1, cols[3], int(cols[4]), int(cols[5]) + 1))
                        if hit:
                            bnd_ids.add(bnd_id)
                    else:
                        hit = (_overlaps(sv.chr1, sv.start1, sv.end1, cols[0], int(cols[1]), int(cols[2]))
                               and _overlaps(sv.chr2, sv.start2, sv.end2, cols[3], int(cols[4]), int(cols[5])))
                    if not hit:
                        continue
                    is_hom = cols[self._idx_format + 1].split(b":")[0].strip() == b"1/1"
                    if is_hom:
                        n_hom += 1
                    else:
                        n_het += 1
                    if ps_name and cols[self._idx_disease_group] == disease_group:
                        if is_hom:
                            n_dg_hom += 1
                        else:
                            n_dg_het += 1
                anno[i_ngsd_hom] = str(n_hom).encode()
                anno[i_ngsd_het] = str(n_het).encode()
                if self._sample_count >= 20:
                    af = min(1.0, (2.0 * n_hom + n_het) / (self._sample_count * 2.0))
                    anno[i_ngsd_af] = f"{af:.4f}".encode()
                if ps_name:
                    anno[i_disease_group] = f"{n_dg_hom} / {n_dg_het}".encode()
            sv.annotations = anno
            out_buffer.append(sv.to_tsv() + b"\n")

        with open(self.get_outfile("out"), "wb") as fh:
            for chunk in out_buffer:
                fh.write(chunk)

    def _parse_head(self, path, processing_system, disease_group):
        self._sample_count = 0
        self._idx_sys = -1
        self._idx_sv_id = -1
        self._idx_format = -1
        self._idx_disease_group = -1
        self._disease_group_id = ""
        with gzip.open(path, "rb") as fh:
            for raw in fh:
                line = raw.rstrip(b"\n")
                if not line.startswith(b"#"):
                    break
                if line.startswith(b"##sample_count=(" + processing_system + b","):
                    self._sample_count = int(line.split(b",")[1].split(b")")[0])
                if line.startswith(b"#CHROM_A"):
                    header = line.strip().split(b"\t")
                    for i, h in enumerate(header):
                        if h == b"PROCESSING_SYSTEM":
                            self._idx_sys = i
                        elif h == b"ID":
                            self._idx_sv_id = i
                        elif h == b"FORMAT":
                            self._idx_format = i
                        elif h == b"DISEASE_GROUP":
                            self._idx_disease_group = i
                if disease_group and disease_group in line:
                    m = re.search(rb"ID=(GSC\d+)", line)
                    if m:
                        self._disease_group_id = m.group(1).decode()
        if not self._disease_group_id and disease_group:
            raise ToolError("Annotation file doesn't contain info about disease group ID for given disease group: "
                            f"'{disease_group.decode()}'")
        if self._sample_count == 0:
            sys.stdout.write("WARNING: Annotation file doesn't contain sample count for this processing system! NGSD count annotation will be empty.\n")
        elif self._sample_count < 20:
            sys.stdout.write("WARNING: Annotation file contains less than 20 samples for this processing system! NGSD allele frequency cannot be calculated.\n")
        if self._idx_sys == -1:
            raise ToolError("Annotation file doesn't contain processing system column!")
        if self._idx_sv_id == -1:
            raise ToolError("Annotation file doesn't contain SV id column!")
        if self._idx_format == -1:
            raise ToolError("Annotation file doesn't contain format column!")
        if self._idx_disease_group == -1:
            raise ToolError("Annotation file doesn't contain disease group column!")


def _overlaps(chr1, s1, e1, chr2_raw, s2, e2) -> bool:
    c2 = chr2_raw if isinstance(chr2_raw, Chromosome) else Chromosome(chr2_raw)
    return chr1.num == c2.num and s1 <= e2 and s2 <= e1


TOOLS = {
    "BedpeAnnotateCounts": BedpeAnnotateCountsTool,
}


def _ins_seq_parts(sv, svs):
    alt_a_idx = svs.annotation_index_by_name(b"ALT_A")
    info_a_idx = svs.annotation_index_by_name(b"INFO_A")
    left = right = b""
    for entry in sv.annotations[info_a_idx].split(b";"):
        entry = entry.strip()
        if entry.startswith(b"LEFT_SVINSSEQ="):
            left = entry
        elif entry.startswith(b"RIGHT_SVINSSEQ="):
            right = entry
    return sv.annotations[alt_a_idx], left, right


def _find_match(bedpe: BedpeFile, sv, deep_ins_compare: bool, compare_ci: bool) -> int:
    """BedpeFile::findMatch (BedpeFile.cpp) — exact / CI-fuzzy SV matching."""
    pos_min_q = min(sv.start1, sv.end1, sv.start2, sv.end2)
    pos_max_q = max(sv.start1, sv.end1, sv.start2, sv.end2)
    if deep_ins_compare:
        alt_q, left_q, right_q = _ins_seq_parts(sv, bedpe)
    for i, l in enumerate(bedpe.lines):
        if l.type != sv.type or l.chr1.num != sv.chr1.num or l.chr2.num != sv.chr2.num:
            continue
        pos_min_r = min(l.start1, l.end1, l.start2, l.end2)
        pos_max_r = max(l.start1, l.end1, l.start2, l.end2)
        if sv.type == b"INS" and deep_ins_compare:
            if pos_min_q != pos_min_r or pos_max_q != pos_max_r:
                continue
            alt_r, left_r, right_r = _ins_seq_parts(l, bedpe)
            if alt_r != alt_q or left_r != left_q or right_r != right_q:
                continue
            return i
        elif compare_ci:
            if sv.type == b"INS":
                if not (pos_min_r <= pos_max_q and pos_min_q <= pos_max_r):
                    continue
            else:
                if not (l.start1 <= sv.end1 and sv.start1 <= l.end1):
                    continue
                if not (l.start2 <= sv.end2 and sv.start2 <= l.end2):
                    continue
            return i
        else:
            if (l.start1, l.end1, l.start2, l.end2) != (sv.start1, sv.end1, sv.start2, sv.end2):
                continue
            return i
    return -1


class BedpeTrioAnalysisTool(ToolBase):
    """Behavioral reference: src/BedpeTrioAnalysis/main.cpp."""

    name = "BedpeTrioAnalysis"
    description = "Combines the SVs of a trio (index, father, mother) into a single BEDPE file."

    def setup(self):
        self.add_infile("father", "Input SV file of the father (in BEDPE format).")
        self.add_infile("mother", "Input SV file of the mother (in BEDPE format).")
        self.add_infile("index", "Input SV file of the index (in BEDPE format).")
        self.add_outfile("out", "Output SV file (in BEDPE format).")

    @staticmethod
    def _genotype(sv, annotation_headers) -> bytes:
        gt = sv.format_value(annotation_headers, b"GT", error_on_missing_key=False).strip()
        if gt == b"1/1":
            return b"hom"
        if gt in (b"0/1", b"1/0"):
            return b"het"
        return b"n/a"

    def main(self):
        svs_index = BedpeFile.from_file(self.get_infile("index"))
        svs_father = BedpeFile.from_file(self.get_infile("father"))
        svs_mother = BedpeFile.from_file(self.get_infile("mother"))

        def headers_without_sample(f):
            h = list(f.annotation_headers)
            del h[h.index(b"FORMAT") + 1]
            return h

        if headers_without_sample(svs_index) != headers_without_sample(svs_father):
            raise ToolError(f"The annotations of the BEDPE files '{self.get_infile('father')}' and "
                            f"'{self.get_infile('index')}' do not match. Cannot combine these file! "
                            "Make sure all files were created with the same pipeline verion and contain the same annotations.")
        if headers_without_sample(svs_index) != headers_without_sample(svs_mother):
            raise ToolError(f"The annotations of the BEDPE files '{self.get_infile('mother')}' and "
                            f"'{self.get_infile('index')}' do not match. Cannot combine these file! "
                            "Make sure all files were created with the same pipeline verion and contain the same annotations.")

        for sv_index in svs_index.lines:
            genotypes = [self._genotype(sv_index, svs_index.annotation_headers)]
            i_father = _find_match(svs_father, sv_index, False, True)
            if i_father != -1:
                genotypes.append(self._genotype(svs_father.lines[i_father], svs_father.annotation_headers))
                svs_father.remove_at(i_father)
            else:
                genotypes.append(b"wt")
            i_mother = _find_match(svs_mother, sv_index, False, True)
            if i_mother != -1:
                genotypes.append(self._genotype(svs_mother.lines[i_mother], svs_mother.annotation_headers))
                svs_mother.remove_at(i_mother)
            else:
                genotypes.append(b"wt")
            sv_index.annotations = genotypes + sv_index.annotations

        for sv_father in list(svs_father.lines):
            genotypes = [b"wt", self._genotype(sv_father, svs_father.annotation_headers)]
            i_mother = _find_match(svs_mother, sv_father, False, True)
            if i_mother != -1:
                genotypes.append(self._genotype(svs_mother.lines[i_mother], svs_mother.annotation_headers))
                svs_mother.remove_at(i_mother)
            else:
                genotypes.append(b"wt")
            sv_father.annotations = genotypes + sv_father.annotations
            svs_index.append(sv_father)

        for sv_mother in list(svs_mother.lines):
            genotypes = [b"wt", b"wt", self._genotype(sv_mother, svs_mother.annotation_headers)]
            sv_mother.annotations = genotypes + sv_mother.annotations
            svs_index.append(sv_mother)

        svs_index.annotation_headers = [b"index", b"father", b"mother"] + svs_index.annotation_headers
        svs_index.sort()
        svs_index.store(self.get_outfile("out"))


TOOLS["BedpeTrioAnalysis"] = BedpeTrioAnalysisTool
