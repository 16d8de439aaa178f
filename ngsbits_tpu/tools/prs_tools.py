"""Polygenic risk score tools: VcfCalculatePRS, CalculatePRS.

Behavioral reference: ngs-bits src/VcfCalculatePRS/main.cpp and
src/CalculatePRS/main.cpp.
"""

from __future__ import annotations

import sys

from ..io.fasta import FastaFileIndex
from ..io.tabix import TabixIndexedFile
from ..io.vcf import VcfFile, _qt_num
from ..qc.variant_details import gsvar_from_vcf, variant_details
from .toolbase import ToolBase, ToolError


def _parse_info(raw: bytes) -> dict:
    out = {}
    if raw in (b".", b""):
        return out
    for item in raw.split(b";"):
        if b"=" in item:
            k, v = item.split(b"=", 1)
            out[k] = v
        else:
            out[item] = b"TRUE"
    return out


def _gt_allele_count(line: bytes, context: bytes) -> tuple[int, bytes, bytes]:
    """GT '1'-count plus ref/alt of a raw sample-VCF line."""
    parts = line.split(b"\t")
    fmt = parts[8].split(b":")
    vals = parts[9].split(b":")
    try:
        gi = fmt.index(b"GT")
    except ValueError:
        raise ToolError(f"Genotype information is missing for sample variant: {context.decode()}")
    cnt = vals[gi].count(b"1")
    if cnt > 2:
        raise ToolError(f"Invalid genotype '{vals[gi].strip().decode()}' in sample variant: {context.decode()}")
    return cnt, parts[3].strip(), parts[4].strip()


class VcfCalculatePRSTool(ToolBase):
    name = "VcfCalculatePRS"
    description = "Calculates the Polgenic Risk Score(s) for a sample."

    COLUMN_HEADERS = [b"pgs_id", b"trait", b"score", b"percentile", b"build",
                      b"variants_in_prs", b"variants_low_depth",
                      b"variants_imputed", b"pgp_id", b"citation"]

    def setup(self):
        self.add_infile("in", "Tabix indexed VCF.GZ file of a sample.")
        self.add_infile_list("prs", "List of PRS VCFs.")
        self.add_infile("bam", "BAM file corresponding to the VCF.")
        self.add_outfile("out", "Output TSV file containing Scores and PRS details")
        self.add_outfile("details", "Output TSV containing each variant with weight, allele count and population AF.", optional=True)
        self.add_infile("ref", "Reference genome FASTA file. If unset, 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_int("min_depth", "Depth cutoff below which uncalled SNPs are considered not callable and POP_AF is used instead of genotype.", optional=True, default=10)
        self.add_flag("long_read", "Support long reads (> 1kb).")

    def main(self):
        min_depth = self.get_int("min_depth")
        long_read = self.get_flag("long_read")
        sample_vcf = TabixIndexedFile(self.get_infile("in"))
        ref_file = self.get_infile("ref")
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        fasta = FastaFileIndex(ref_file)
        bam_file = self.get_infile("bam")

        out_lines = [b"#" + b"\t".join(self.COLUMN_HEADERS)]
        detail_path = self.get_outfile("details")
        detail_lines = None
        if detail_path:
            detail_lines = [b"## allele_count: A '.' in the count_effect_allele column means insufficient depth and the tool uses the population_af as fallback allele count",
                            b"#" + b"\t".join([b"chr", b"start", b"end", b"ref_allele", b"effect_allele", b"other_allele", b"patient_allele1", b"patient_allele2",
                                               b"count_effect_allele", b"variant_depth", b"weight", b"population_af", b"pgs_id", b"comment"])]

        for prs_path in self.get_infile_list("prs"):
            prs = VcfFile.from_file(prs_path)
            if len(prs.sample_ids()) > 1:
                raise ToolError(f"PRS VCF file must not contain more than one sample: {prs_path}")

            score = 0.0
            percentiles: list[float] = []
            entries: dict[bytes, bytes] = {}
            # parse "##key=value" comment lines (VcfCalculatePRS/main.cpp:102-128)
            for raw in prs.header.comments:
                if not raw.startswith(b"##") or b"=" not in raw:
                    continue
                key, value = raw[2:].split(b"=", 1)
                for col in self.COLUMN_HEADERS:
                    if key.startswith(col):
                        if col in entries:
                            raise ToolError(f"Comment section of PRS VCF file contains more than one entry for '{col.decode()}': {prs_path}")
                        entries[col] = value.strip()
                        break
                if key.startswith(b"percentiles"):
                    if percentiles:
                        raise ToolError(f"Percentiles in PRS VCF file given twice: {prs_path}")
                    vals = value.strip().split(b",")
                    if len(vals) != 100:
                        raise ToolError(f"Invalid number of percentiles given (required: 100, given: {len(vals)}: {prs_path}")
                    percentiles = [float(v) for v in vals]
            for key in self.COLUMN_HEADERS:
                if key in (b"score", b"percentile", b"variants_in_prs", b"variants_low_depth", b"variants_imputed"):
                    continue
                if key not in entries:
                    raise ToolError(f"Comment section of PRS VCFs does not contain an entry for '{key.decode()}': {prs_path}")

            # batch the BAM depth lookups for all non-imputed variants
            infos = [_parse_info(prs.infos[i]) for i in range(len(prs))]
            need_depth = []
            for i in range(len(prs)):
                if b"," in prs.alts[i]:
                    raise ToolError(f"Multi-allelic variants in PRS VCF files are not supported")
                if b"IMPUTE" not in infos[i]:
                    alt = prs.alts[i] if prs.alts[i] != b"." else prs.refs[i]
                    s, e, r, o = gsvar_from_vcf(int(prs.pos[i]), prs.refs[i], alt)
                    need_depth.append((i, (prs.chr_of(i), s, e, r, o)))
            depth_res = variant_details(bam_file, fasta, [v for _i, v in need_depth],
                                        include_not_properly_paired=long_read)
            depth_by_i = {i: d.depth for (i, _v), d in zip(need_depth, depth_res)}

            c_found = c_low_depth = c_imputed = 0
            for i in range(len(prs)):
                info = infos[i]
                weight = float(info[b"WEIGHT"])
                pop_af = float(info[b"POP_AF"])
                impute = b"IMPUTE" in info
                other_allele = info.get(b"OTHER_ALLELE", b"")
                var_depth = -1
                allele_count = -1
                patient_alleles: list[bytes] = []
                comment: list[bytes] = []
                ref = prs.refs[i]
                alt = prs.alts[i]
                is_wildtype = alt == b"." or alt == ref or b"REF_IS_EFFECT_ALLELE" in info
                if alt == b".":
                    alt = ref
                if b"REF_IS_EFFECT_ALLELE" in info and alt != b"." and alt != ref:
                    other_allele = alt
                start = int(prs.pos[i])
                end = start + len(ref) - 1
                chr_ = prs.chr_of(i)
                context = f"{chr_.str}:{start}".encode()

                if impute:
                    score += 2.0 * weight * pop_af
                    c_imputed += 1
                    comment.append(b"Variant imputed")
                else:
                    var_depth = depth_by_i[i]
                    if var_depth < min_depth:
                        score += 2.0 * weight * pop_af
                        c_low_depth += 1
                        comment.append(b"Variant has insufficient depth")
                    else:
                        matching_lines = sample_vcf.get_matching_lines(chr_, start, end, True)
                        if is_wildtype:
                            if matching_lines:
                                allele_count = 2
                                for line in matching_lines:
                                    cnt, lref, lalt = _gt_allele_count(line, context)
                                    allele_count = max(allele_count - cnt, 0)
                                    if detail_lines is not None:
                                        patient_alleles += [lref + b">" + lalt] * cnt
                                if allele_count > 0:
                                    score += weight * allele_count
                                    c_found += 1
                                    if detail_lines is not None:
                                        patient_alleles += [ref + b">" + ref] * allele_count
                                if len(patient_alleles) > 2:
                                    raise ToolError(f"More than 2 alleles found at position {chr_.str_normalized(True)}:{start}!")
                            else:
                                allele_count = 2
                                score += allele_count * weight
                                c_found += 1
                                if detail_lines is not None:
                                    patient_alleles += [ref + b">" + ref, ref + b">" + ref]
                        else:
                            matching = []
                            for line in matching_lines:
                                parts = line.split(b"\t")
                                if int(parts[1]) == start and parts[3] == ref and parts[4] == alt.split(b",")[0]:
                                    matching.append(line)
                                elif detail_lines is not None:
                                    cnt, lref, lalt = _gt_allele_count(line, context)
                                    patient_alleles += [lref + b">" + lalt] * cnt
                            if len(matching) > 1:
                                raise ToolError("Variant occurs multiple times in sample VCF")
                            if len(matching) == 1:
                                allele_count, _lr, _la = _gt_allele_count(matching[0], context)
                                score += weight * allele_count
                                c_found += 1
                                if detail_lines is not None:
                                    patient_alleles += [ref + b">" + alt] * allele_count
                                    if len(patient_alleles) == 1:
                                        patient_alleles.append(ref + b">" + ref)
                            else:
                                allele_count = 0
                                if detail_lines is not None:
                                    while len(patient_alleles) < 2:
                                        patient_alleles.append(ref + b">" + ref)
                            if len(patient_alleles) > 2:
                                raise ToolError(f"More than 2 alleles found at position {chr_.str_normalized(True)}:{start}!")

                if detail_lines is not None:
                    detail_lines.append(b"\t".join([
                        chr_.str_normalized(True).encode(), str(start).encode(), str(end).encode(),
                        ref, (ref if is_wildtype else alt), other_allele,
                        patient_alleles[0] if patient_alleles else b".",
                        patient_alleles[1] if len(patient_alleles) > 1 else b".",
                        b"." if allele_count < 0 else str(allele_count).encode(),
                        b"." if var_depth < 0 else str(var_depth).encode(),
                        _qt_num(weight), _qt_num(pop_af), entries[b"pgs_id"],
                        b";".join(comment)]))

            percentile_string = b"."
            percentile = -1
            if len(percentiles) == 100:
                for k, p in enumerate(percentiles):
                    if score < p:
                        percentile = k
                        break
                percentile_string = b"100" if percentile == -1 else str(percentile).encode()

            out_lines.append(b"\t".join([
                entries[b"pgs_id"], entries[b"trait"], _qt_num(score), percentile_string,
                entries[b"build"], str(len(prs)).encode(), str(c_low_depth).encode(),
                str(c_imputed).encode(), entries[b"pgp_id"], entries[b"citation"]]))
            sys.stdout.write(f"{entries[b'pgs_id'].decode()}: variants_found={c_found} "
                             f"prs={_qt_num(score).decode()} percentile={percentile_string.decode()} "
                             f"low_depth_variants={c_low_depth} variants_imputed={c_imputed}\n")

        with open(self.get_outfile("out"), "wb") as fh:
            fh.write(b"".join(l + b"\n" for l in out_lines))
        if detail_path:
            with open(detail_path, "wb") as fh:
                fh.write(b"".join(l + b"\n" for l in detail_lines))


class CalculatePRSTool(ToolBase):
    name = "CalculatePRS"
    description = "Calculates the Polgenic Risk Score for a given set of PRS VCFs"

    COLUMN_HEADERS = [b"pgs_id", b"trait", b"score", b"normal_score", b"build",
                      b"n_var", b"pgp_id", b"citation"]

    def setup(self):
        self.add_infile("in", "Tabix indexed VCF.GZ file of the sample.")
        self.add_infile_list("prs", "List of PRS VCFs.")
        self.add_outfile("out", "Output TSV file")

    def main(self):
        sample_vcf = TabixIndexedFile(self.get_infile("in"))
        out_lines = [b"#" + b"\t".join(self.COLUMN_HEADERS)]
        for prs_path in self.get_infile_list("prs"):
            prs = VcfFile.from_file(prs_path)
            entries: dict[bytes, bytes] = {}
            for raw in prs.header.comments:
                if not raw.startswith(b"##") or b"=" not in raw:
                    continue
                for col in self.COLUMN_HEADERS:
                    if raw[2:].startswith(col):
                        if col in entries:
                            raise ToolError(f"Comment section of PRS VCF '{prs_path}' contains more than one entry for '{col.decode()}'!")
                        entries[col] = raw.split(b"=", 1)[1].strip()
            for key in self.COLUMN_HEADERS:
                if key in (b"score", b"normal_score"):
                    continue
                if key not in entries:
                    raise ToolError(f"Comment section of PRS VCF '{prs_path}' misses the entry for '{key.decode()}'!")

            score = 0.0
            for i in range(len(prs)):
                info = _parse_info(prs.infos[i])
                # GSvar-style variant for the ref/obs comparison
                s, e, r, o = gsvar_from_vcf(int(prs.pos[i]), prs.refs[i], prs.alts[i].split(b",")[0])
                matching = []
                for line in sample_vcf.get_matching_lines(prs.chr_of(i), s, e, True):
                    parts = line.split(b"\t")
                    if parts[3] == r and parts[4] == o:
                        matching.append(line)
                if len(matching) > 1:
                    raise ToolError("Variant occures multiple times in sample VCF!")
                if len(matching) == 1:
                    parts = matching[0].split(b"\t")
                    fmt = parts[8].split(b":")
                    vals = parts[9].split(b":")
                    if b"GT" not in fmt:
                        raise ToolError("Genotype information is missing")
                    gt = vals[fmt.index(b"GT")].strip()
                    if gt == b"0/1":
                        allele_count = 1
                    elif gt == b"1/1":
                        allele_count = 2
                    else:
                        raise ToolError(f"Invalid genotype '{gt.decode()}'!")
                    score += float(info[b"WEIGHT"]) * allele_count
            out_lines.append(b"\t".join([
                entries[b"pgs_id"], entries[b"trait"], _qt_num(score), b".",
                entries[b"build"], entries[b"n_var"], entries[b"pgp_id"], entries[b"citation"]]))
            sys.stdout.write(f"{entries[b'pgs_id'].decode()}:\t{_qt_num(score).decode()}\n")
        with open(self.get_outfile("out"), "wb") as fh:
            fh.write(b"".join(l + b"\n" for l in out_lines))


TOOLS = {
    "VcfCalculatePRS": VcfCalculatePRSTool,
    "CalculatePRS": CalculatePRSTool,
}
