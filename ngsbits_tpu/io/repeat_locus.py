"""Repeat expansion locus list loaded from caller VCFs.

Behavioral reference: ngs-bits cppNGS/RepeatLocusList.{h,cpp} — supports
ExpansionHunter and Straglr (V1.5.0/V1.5.1 FORMAT-based; later V1.5.x
INFO/RUC-based) genotype extraction.
"""

from __future__ import annotations

from ..core.chromosome import Chromosome
from .vcf import VcfFile, VcfLineView


def _is_numeric(value: bytes) -> bool:
    try:
        float(value)
        return True
    except (TypeError, ValueError):
        return False


class RepeatLocus:
    def __init__(self):
        self.name = b""
        self.chr = None
        self.start = 0
        self.end = 0
        self.unit = b""
        self.allele1 = b""
        self.allele2 = b""
        self.filters: list[bytes] = []
        self.confidence_intervals = b""
        self.coverage = b""
        self.overlapping_insertions: list[bytes] = []
        self.ref_size = 0

    def region_string(self) -> str:
        return f"{self.chr.str_normalized(True)}:{self.start}-{self.end}"

    def gene_symbol(self) -> bytes:
        """RepeatLocus::geneSymbol (RepeatLocusList.cpp:19-22)."""
        return self.name.split(b"_")[0]

    def alleles(self) -> bytes:
        """RepeatLocus::alleles (RepeatLocusList.cpp:54-59)."""
        out = self.allele1
        if self.allele2:
            out += b"/" + self.allele2
        return out

    def allele1_as_int(self) -> int:
        tmp = self.allele1.strip()
        if b"." in tmp:
            tmp = tmp[:tmp.index(b".")]
        return int(tmp)

    def allele2_as_int(self) -> int:
        tmp = self.allele2.strip()
        if b"." in tmp:
            tmp = tmp[:tmp.index(b".")]
        return int(tmp) if tmp else 0

    def same_region_and_locus(self, rhs: "RepeatLocus") -> bool:
        """RepeatLocus::sameRegionAndLocus."""
        return (self.chr.num == rhs.chr.num and self.start == rhs.start
                and self.end == rhs.end and self.unit == rhs.unit)

    def set_region(self, bed_line):
        self.chr = bed_line.chr
        self.start = bed_line.start
        self.end = bed_line.end

    def is_valid(self) -> bool:
        return (self.chr is not None and self.chr.is_valid() and self.start <= self.end
                and bool(self.unit) and bool(self.allele1))

    def set_allele1(self, value: bytes):
        value = value.strip()
        if value in (b".", b""):
            return
        if not _is_numeric(value):
            raise ValueError(f"Cannot set non-numeric allele 1: '{value.decode()}' for {self.to_string(True, False)}")
        self.allele1 = value

    def set_allele2(self, value: bytes):
        value = value.strip()
        if value in (b".", b""):
            return
        if not _is_numeric(value):
            raise ValueError(f"Cannot set non-numeric allele 2: '{value.decode()}' for {self.to_string(True, False)}")
        self.allele2 = value

    def set_filters(self, filters):
        out = []
        for f in filters:
            f = f.strip()
            if f in (b"", b".", b"PASS"):
                continue
            out.append(f)
        self.filters = out

    def to_string(self, add_region_unit: bool, add_genotypes: bool) -> str:
        out = self.name.decode()
        if add_region_unit:
            out += " - " + self.region_string() + "/" + self.unit.decode().strip()
        if add_genotypes:
            out += " (allele1:" + self.allele1.decode()
            if self.allele2:
                out += " / allele2:" + self.allele2.decode()
            out += ")"
        return out


class RepeatLocusList:
    def __init__(self):
        self.caller = "invalid"
        self.caller_version = b""
        self.call_date = ""  # ISO yyyy-mm-dd
        self.variants: list[RepeatLocus] = []

    def __len__(self):
        return len(self.variants)

    def __getitem__(self, i) -> RepeatLocus:
        return self.variants[i]

    def caller_as_string(self) -> str:
        return {"invalid": "invalid", "expansionhunter": "ExpansionHunter",
                "straglr": "Straglr"}[self.caller]

    def find_match(self, re: RepeatLocus, fuzzy_match: bool = False) -> int:
        """RepeatLocusList::findMatch (RepeatLocusList.cpp:365-386) — exact
        alleles, or >=95% identity on the max allele."""
        for i, v in enumerate(self.variants):
            if not v.same_region_and_locus(re):
                continue
            if v.allele1 == re.allele1 and v.allele2 == re.allele2:
                return i
            if fuzzy_match:
                a = max(v.allele1_as_int(), v.allele2_as_int())
                b = max(re.allele1_as_int(), re.allele2_as_int())
                if min(a / b, b / a) >= 0.95:
                    return i
        return -1

    @staticmethod
    def load(filename: str) -> "RepeatLocusList":
        out = RepeatLocusList()
        f = VcfFile.from_file(filename)
        if len(f.sample_ids()) != 1:
            raise ValueError(f"Repeat expansion VCF file '{filename}' does not contain exactly one sample!")
        for line in f.header.lines:
            if line.startswith(b"##source="):
                value = line.split(b"=", 1)[1]
                if value.startswith(b"StraglrV"):
                    value = value.replace(b"StraglrV", b"Straglr V")
                tmp = value.strip().split(b" ")
                if len(tmp) != 2:
                    raise ValueError(f"Cannot split 'source' header value into caller and caller version: '{value.decode()}'")
                caller = tmp[0].lower().strip().decode()
                if caller not in ("straglr", "expansionhunter"):
                    raise ValueError(f"Unsupported RE caller: '{caller}'")
                out.caller = caller
                out.caller_version = tmp[1]
            elif line.startswith(b"##filedate="):
                value = line.split(b"=", 1)[1].strip().decode()
                out.call_date = value[:10]
            elif line.startswith(b"##fileDate="):
                value = line.split(b"=", 1)[1].strip().decode()
                out.call_date = f"{value[:4]}-{value[4:6]}-{value[6:8]}"

        for i in range(len(f)):
            re = VcfLineView(f, i)
            rl = RepeatLocus()
            if out.caller == "straglr":
                rl.name = re.info("LOCUS").strip()
                rl.chr = re.chr
                rl.start = re.start
                rl.end = int(re.info("END"))
                rl.unit = re.info("REF_MOTIF").strip()
                rl.set_filters(re.filters)
                rl.overlapping_insertions = [
                    x for x in re.info("OVERLAPPING_INS").strip().split(b",") if x]
                ref_size = re.info("REF_SIZE").strip()
                if ref_size:
                    rl.ref_size = int(float(ref_size))
                version = out.caller_version.decode()
                if version in ("V1.5.0", "V1.5.1"):
                    genotypes = re.format_value("AC").strip().split(b"/")
                    rl.set_allele1(genotypes[0])
                    if len(genotypes) == 2:
                        rl.set_allele2(genotypes[1])
                    elif len(genotypes) > 2:
                        raise ValueError(f"Invalid number of genotypes in {rl.name.decode()}")
                    rl.confidence_intervals = re.format_value("ACR").strip()
                elif version.startswith("V1.5."):
                    genotypes = re.info("RUC").strip().split(b",")
                    genotype_ci = re.info("CIRUC").strip().split(b",")
                    genotypes_wt = re.info("RUC_WT").strip().split(b",")
                    if b"." in genotype_ci:
                        rl.set_filters(rl.filters + [b"CallIsLowerBound"])
                    gt = re.format_value("GT")
                    if gt == b"0/0":
                        rl.set_allele1(genotypes_wt[0])
                        rl.set_allele2(genotypes_wt[0])
                    elif gt == b"0":
                        rl.set_allele1(genotypes_wt[0])
                    elif gt == b"0/1":
                        rl.set_allele1(genotypes[0])
                        rl.set_allele2(genotypes_wt[0])
                    elif gt == b"1":
                        rl.set_allele1(genotypes[0])
                    elif gt == b"1/1":
                        rl.set_allele1(genotypes[0])
                        rl.set_allele2(genotypes[0])
                    elif gt == b"1/2":
                        rl.set_allele1(genotypes[0])
                        rl.set_allele2(genotypes[1])
                    else:
                        raise ValueError(f"Invalid genotype entry '{gt.decode()}' in {rl.name.decode()}")
                else:
                    raise ValueError(f"Unsupported straglr version '{version}'!")
                rl.coverage = re.format_value("DP").strip()
            else:  # ExpansionHunter
                rl.name = re.info("REPID").strip()
                rl.chr = re.chr
                rl.start = re.start
                rl.end = int(re.info("END"))
                rl.unit = re.info("RU").strip()
                rl.set_filters(re.filters)
                genotypes = re.format_value("REPCN").strip().split(b"/")
                rl.set_allele1(genotypes[0])
                if len(genotypes) == 2:
                    rl.set_allele2(genotypes[1])
                elif len(genotypes) > 2:
                    raise ValueError(f"Invalid number of genotypes in {rl.name.decode()}")
                rl.coverage = re.format_value("LC").strip()
            out.variants.append(rl)
        return out
