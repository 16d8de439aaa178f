"""Transcript model and Ensembl/RefSeq GFF3 loading.

Behavioral reference: ngs-bits cppNGS/Transcript.{h,cpp} and
cppNGS/GffData.{h,cpp} — transcripts carry gene/HGNC ids, exon regions,
ATG-oriented coding start/end (swapped on '-' strand), biotype display
strings matching the NGSD enum, and GENCODE/MANE flags.
"""

from __future__ import annotations

import gzip
import sys
from dataclasses import dataclass, field

from .chromosome import Chromosome
from .intervals import BedFile, BedLine

# display strings = NGSD gene_transcript.biotype enum (Transcript.cpp:244-295)
BIOTYPE_STRINGS = [
    "IG C gene", "IG C pseudogene", "IG D gene", "IG J gene", "IG J pseudogene",
    "IG V gene", "IG V pseudogene", "IG pseudogene", "Mt rRNA", "Mt tRNA",
    "TEC", "TR C gene", "TR D gene", "TR J gene", "TR J pseudogene",
    "TR V gene", "TR V pseudogene", "lncRNA", "miRNA", "misc RNA",
    "non stop decay", "nonsense mediated decay", "protein coding LoF",
    "processed pseudogene", "processed transcript", "protein coding",
    "pseudogene", "rRNA", "rRNA pseudogene", "retained intron", "ribozyme",
    "sRNA", "scRNA", "scaRNA", "snRNA", "snoRNA",
    "transcribed processed pseudogene", "transcribed unitary pseudogene",
    "transcribed unprocessed pseudogene", "translated processed pseudogene",
    "translated unprocessed pseudogene", "unitary pseudogene",
    "unprocessed pseudogene", "vaultRNA", "artifact",
    "protein coding CDS not defined",
]

_NORM2BIOTYPE = {s.upper().replace(" ", "_"): s for s in BIOTYPE_STRINGS}
# RefSeq/legacy aliases (Transcript.cpp stringToBiotype tail)
_NORM2BIOTYPE.update({
    "VAULT_RNA": "vaultRNA",
    "TRANSCRIBED_PSEUDOGENE": "transcribed unprocessed pseudogene",
    "C_REGION": "IG C gene",
    "D_SEGMENT": "IG D gene",
    "J_SEGMENT": "IG J gene",
    "J_SEGMENT_PSEUDOGENE": "IG J pseudogene",
    "V_SEGMENT": "IG V gene",
    "V_SEGMENT_PSEUDOGENE": "IG V pseudogene",
    "MRNA": "protein coding",
    "NCRNA": "misc RNA",
    "NCRNA_PSEUDOGENE": "pseudogene",
    "RNASE_MRP_RNA": "misc RNA",
    "RNASE_P_RNA": "misc RNA",
    "ANTISENSE_RNA": "misc RNA",
    "TELOMERASE_RNA": "misc RNA",
    "TRNA": "misc RNA",
    "Y_RNA": "misc RNA",
    "PRIMARY_TRANSCRIPT": "miRNA",
    "GUIDE_RNA": "misc RNA",
    "SCRNA_GENE": "scRNA",
})


def string_to_biotype(s: str) -> str:
    key = s.upper().replace(" ", "_")
    if key not in _NORM2BIOTYPE:
        raise ValueError(f"Unhandled transcript biotype '{s}'!")
    return _NORM2BIOTYPE[key]


@dataclass
class Transcript:
    name: str = ""
    version: int = 0
    name_ccds: str = ""
    gene: str = ""            # gene symbol
    gene_id: str = ""         # ENSG
    hgnc_id: str = ""         # "HGNC:123"
    source: str = "ensembl"   # ensembl / ccds / refseq
    chr: Chromosome | None = None
    strand: str = "+"
    biotype: str = ""
    is_gencode_basic: bool = False
    is_gencode_primary: bool = False
    is_ensembl_canonical: bool = False
    is_mane_select: bool = False
    is_mane_plus_clinical: bool = False
    regions: BedFile = field(default_factory=BedFile)
    coding_start: int = 0     # ATG position (> coding_end on '-' strand)
    coding_end: int = 0
    is_preferred: bool = False  # from NGSD preferred_transcripts

    def flags(self, add_square_brackets: bool = False) -> list[str]:
        """Transcript::flags (Transcript.cpp:22-41)."""
        out = []
        if self.is_preferred:
            out.append("NGSD preferred transcript")
        if self.is_gencode_primary:
            out.append("GENCODE primary")
        if self.is_ensembl_canonical:
            out.append("Ensembl canonical")
        if self.is_mane_select:
            out.append("MANE select")
        if self.is_mane_plus_clinical:
            out.append("MANE plus clinical")
        if add_square_brackets:
            out = [f"[{f}]" for f in out]
        return out

    def start(self) -> int:
        return min(l.start for l in self.regions.lines) if len(self.regions) else 0

    def end(self) -> int:
        return max(l.end for l in self.regions.lines) if len(self.regions) else 0

    def is_coding(self) -> bool:
        return self.coding_start != 0 and self.coding_end != 0

    def coding_regions(self) -> BedFile:
        """Exons clipped to the coding range."""
        out = BedFile()
        if not self.is_coding():
            return out
        lo = min(self.coding_start, self.coding_end)
        hi = max(self.coding_start, self.coding_end)
        for l in self.regions.lines:
            s, e = max(l.start, lo), min(l.end, hi)
            if s <= e:
                out.append(BedLine(l.chr, s, e))
        return out

    def name_with_version(self) -> str:
        return f"{self.name}.{self.version}" if self.version else self.name

    def exon_number(self, start: int, end: int) -> int:
        """Transcript::exonNumber (Transcript.cpp) — 1-based exon in
        transcription direction; -1 no overlap, -2 several exons."""
        matches = set()
        n = len(self.regions)
        for i, line in enumerate(self.regions.lines):
            if line.start <= end and line.end >= start:
                matches.add(i + 1 if self.strand == "+" else n - i)
        if not matches:
            return -1
        if len(matches) > 1:
            return -2
        return matches.pop()

    def c_dna_to_genomic(self, coord: int) -> int:
        """Transcript::cDnaToGenomic — coding-region cDNA coordinate to
        genomic position."""
        return _c_dna_to_genomic(self, coord)

    def _utrs(self):
        """UTR regions per Transcript::setRegions (Transcript.cpp:320-400)."""
        utr5, utr3 = BedFile(), BedFile()
        if not self.is_coding():
            return utr5, utr3
        cs, ce = self.coding_start, self.coding_end
        for region in self.regions.lines:
            if self.strand == "+":
                if region.end < cs:
                    utr5.append(region)
                elif region.start > ce:
                    utr3.append(region)
                elif region.start >= cs and region.end <= ce:
                    pass
                else:
                    if region.start < cs:
                        utr5.append(BedLine(region.chr, region.start, cs - 1))
                    if region.end > ce:
                        utr3.append(BedLine(region.chr, ce + 1, region.end))
            else:
                if region.end < ce:
                    utr3.append(region)
                elif region.start > cs:
                    utr5.append(region)
                elif region.start >= ce and region.end <= cs:
                    pass
                else:
                    if region.start < ce:
                        utr3.append(BedLine(region.chr, region.start, ce - 1))
                    if region.end > cs:
                        utr5.append(BedLine(region.chr, cs + 1, region.end))
        return utr5, utr3

    def utr_5prime(self) -> BedFile:
        return self._utrs()[0]

    def utr_3prime(self) -> BedFile:
        return self._utrs()[1]

    def protein_sequence(self, genome_idx, use_three_letter_code: bool = False,
                         end_at_stop: bool = True) -> str:
        """Transcript::proteinSequence (Transcript.cpp:152-167)."""
        dna = b""
        is_mito = False
        for line in self.coding_regions().lines:
            if line.chr.is_m():
                is_mito = True
            dna += genome_idx.seq(line.chr, line.start, line.end - line.start + 1, True)
        if self.strand != "+":
            dna = reverse_complement(dna)
        return translate_sequence(dna, use_three_letter_code, is_mito, end_at_stop)


CODON_TABLE = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L", "CTT": "L", "CTC": "L",
    "CTA": "L", "CTG": "L", "TCT": "S", "TCC": "S", "TCA": "S", "TCG": "S",
    "AGT": "S", "AGC": "S", "TAT": "Y", "TAC": "Y", "TAA": "*", "TAG": "*",
    "TGA": "*", "TGT": "C", "TGC": "C", "TGG": "W", "CCT": "P", "CCC": "P",
    "CCA": "P", "CCG": "P", "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q",
    "CGT": "R", "CGC": "R", "CGA": "R", "CGG": "R", "AGA": "R", "AGG": "R",
    "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M", "ACT": "T", "ACC": "T",
    "ACA": "T", "ACG": "T", "AAT": "N", "AAC": "N", "AAA": "K", "AAG": "K",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V", "GCT": "A", "GCC": "A",
    "GCA": "A", "GCG": "A", "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}

THREE_LETTER = {
    "A": "Ala", "R": "Arg", "N": "Asn", "D": "Asp", "C": "Cys", "E": "Glu",
    "Q": "Gln", "G": "Gly", "H": "His", "I": "Ile", "L": "Leu", "K": "Lys",
    "M": "Met", "F": "Phe", "P": "Pro", "S": "Ser", "T": "Thr", "W": "Trp",
    "Y": "Tyr", "V": "Val", "*": "Ter",
}

from ..io.fasta import reverse_complement  # noqa: E402  (canonical home: io/fasta.py)


def translate_codon(codon: str, use_mito_table: bool = False) -> str:
    """NGSHelper::translateCodon (NGSHelper.cpp:324-352)."""
    if codon not in CODON_TABLE:
        raise ValueError(f"Invalid codon: '{codon}'")
    if use_mito_table:
        if codon in ("AGA", "AGG"):
            return "*"
        if codon == "ATA":
            return "M"
        if codon == "TGA":
            return "W"
    return CODON_TABLE[codon]


def translate_sequence(dna: bytes, use_three_letter_code: bool = False,
                       is_mito: bool = False, end_at_stop: bool = True) -> str:
    """NGSHelper::translateSequence — codon-wise translation."""
    out = []
    seq = dna.decode().upper()
    for i in range(0, len(seq) - 2, 3):
        aa = translate_codon(seq[i:i + 3], is_mito)
        out.append(THREE_LETTER[aa] if use_three_letter_code else aa)
        if aa == "*" and end_at_stop:
            break
    return "".join(out)


class GffData:
    def __init__(self):
        self.transcripts: list[Transcript] = []
        self.enst2ensg: dict[str, str] = {}
        self.ensg2symbol: dict[str, str] = {}

    def gene_count(self) -> int:
        return len({t.gene_id for t in self.transcripts})


def _parse_attributes(raw: str) -> dict[str, str]:
    out = {}
    for part in raw.split(";"):
        i = part.find("=")
        if i == -1:
            continue
        out[part[:i].strip()] = part[i + 1:].strip()
    return out


CHROMOSOME_MAPPING = {
    # NGSHelper::chromosomeMapping — chromosome to RefSeq sequence accession
    "hg38": {
        "chr1": "NC_000001.11", "chr2": "NC_000002.12", "chr3": "NC_000003.12",
        "chr4": "NC_000004.12", "chr5": "NC_000005.10", "chr6": "NC_000006.12",
        "chr7": "NC_000007.14", "chr8": "NC_000008.11", "chr9": "NC_000009.12",
        "chr10": "NC_000010.11", "chr11": "NC_000011.10", "chr12": "NC_000012.12",
        "chr13": "NC_000013.11", "chr14": "NC_000014.9", "chr15": "NC_000015.10",
        "chr16": "NC_000016.10", "chr17": "NC_000017.11", "chr18": "NC_000018.10",
        "chr19": "NC_000019.10", "chr20": "NC_000020.11", "chr21": "NC_000021.9",
        "chr22": "NC_000022.11", "chrX": "NC_000023.11", "chrY": "NC_000024.10",
        "chrMT": "NC_012920.1",
    },
    "hg19": {
        "chr1": "NC_000001.10", "chr2": "NC_000002.11", "chr3": "NC_000003.11",
        "chr4": "NC_000004.11", "chr5": "NC_000005.9", "chr6": "NC_000006.11",
        "chr7": "NC_000007.13", "chr8": "NC_000008.10", "chr9": "NC_000009.11",
        "chr10": "NC_000010.10", "chr11": "NC_000011.9", "chr12": "NC_000012.11",
        "chr13": "NC_000013.10", "chr14": "NC_000014.8", "chr15": "NC_000015.9",
        "chr16": "NC_000016.9", "chr17": "NC_000017.10", "chr18": "NC_000018.9",
        "chr19": "NC_000019.9", "chr20": "NC_000020.10", "chr21": "NC_000021.8",
        "chr22": "NC_000022.10", "chrX": "NC_000023.10", "chrY": "NC_000024.9",
        "chrMT": "NC_012920.1",
    },
}


def load_gff3_refseq(filename: str, include_all: bool = False,
                     skip_not_hgnc: bool = False, print_to_stdout: bool = True) -> GffData:
    """GffData::loadRefseq (GffData.cpp:360-530)."""
    out = GffData()
    id2chr = {v: k for k, v in CHROMOSOME_MAPPING["hg38"].items()}
    geneid_to_data: dict[str, tuple[str, str, str]] = {}
    pending: dict[str, dict] = {}

    opener = gzip.open if str(filename).endswith(".gz") else open
    with opener(filename, "rt") as fh:
        for raw in fh:
            line = raw.rstrip("\r\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            source_col = parts[1]
            if not include_all and "RefSeq" not in source_col:
                continue
            chr_str = parts[0]
            chr_ = Chromosome(id2chr.get(chr_str, chr_str))
            details = parts[8]
            if details.startswith("ID=gene-"):
                attrs = _parse_attributes(details)
                if not chr_.is_non_special():
                    continue
                hgnc_id = ""
                for entry in attrs.get("Dbxref", "").split(","):
                    if entry.startswith("HGNC:"):
                        hgnc_id = entry[5:]
                gene = attrs.get("Name", "")
                if not gene and not hgnc_id:
                    continue
                if skip_not_hgnc and not hgnc_id:
                    continue
                geneid_to_data[attrs.get("ID", "")] = (gene, hgnc_id, attrs.get("gene_biotype", ""))
            elif details.startswith("ID=rna-"):
                attrs = _parse_attributes(details)
                gene_id = attrs.get("Parent", "")
                if gene_id not in geneid_to_data:
                    continue
                name = attrs.get("Name", "")
                version = 0
                if "." in name:
                    name, _, v = name.rpartition(".")
                    version = int(v)
                gene, hgnc, biotype = geneid_to_data[gene_id]
                try:
                    biotype_str = string_to_biotype(biotype) if biotype else ""
                except ValueError:
                    biotype_str = ""
                pending[attrs.get("ID", "")] = {
                    "name": name, "version": version, "name_ccds": "",
                    "gene_symbol": gene, "gene_id": gene_id, "hgnc_id": hgnc,
                    "chr": chr_, "strand": parts[6], "biotype": biotype_str,
                    "gencode_basic": False, "gencode_primary": False,
                    "ensembl_canonical": False, "mane_select": False,
                    "mane_plus_clinical": False,
                    "start_coding": 0, "end_coding": 0, "exons": BedFile(),
                }
            elif parts[2] in ("CDS", "exon", "miRNA"):
                attrs = _parse_attributes(details)
                t_data = pending.get(attrs.get("Parent", ""))
                if t_data is None:
                    continue
                if chr_.num != t_data["chr"].num:
                    raise ValueError("Chromosome mismatch between transcript and exon!")
                start, end = int(parts[3]), int(parts[4])
                if parts[2] == "CDS":
                    t_data["start_coding"] = start if t_data["start_coding"] == 0 else min(start, t_data["start_coding"])
                    t_data["end_coding"] = end if t_data["end_coding"] == 0 else max(end, t_data["end_coding"])
                t_data["exons"].append(BedLine(chr_, start, end))

    for t_data in pending.values():
        t_data["exons"].merge()
        t = Transcript(
            name=t_data["name"], version=t_data["version"],
            gene=t_data["gene_symbol"], gene_id=t_data["gene_id"],
            hgnc_id=t_data["hgnc_id"], source="refseq", chr=t_data["chr"],
            strand=t_data["strand"], biotype=t_data["biotype"],
            regions=t_data["exons"])
        cs, ce = t_data["start_coding"], t_data["end_coding"]
        if t.strand == "-":
            cs, ce = ce, cs
        t.coding_start, t.coding_end = cs, ce
        out.transcripts.append(t)
    if print_to_stdout:
        sys.stdout.write(f"Parsed {out.gene_count()} genes from GFF\n")
        sys.stdout.write(f"Parsed {len(out.transcripts)} transcripts from GFF\n")
    return out


def load_gff3(filename: str, include_all: bool = False, skip_not_hgnc: bool = False,
              print_to_stdout: bool = True, source: str = "ensembl") -> GffData:
    """GffData::load for Ensembl GFF3 (GffData.cpp:200-360)."""
    if source == "refseq":
        return load_gff3_refseq(filename, include_all, skip_not_hgnc, print_to_stdout)
    if source != "ensembl":
        raise ValueError(f"Invalid GFF source '{source}'!")
    out = GffData()
    pending: dict[str, dict] = {}
    ensg2hgnc: dict[str, str] = {}
    c_skipped_special = 0
    special_chrs = []
    c_skipped_no_name_hgnc = 0
    c_skipped_low_evidence = 0
    c_skipped_not_hgnc = 0

    def commit():
        for t_data in pending.values():
            t_data["exons"].merge()
            t = Transcript(
                name=t_data["name"], version=t_data["version"],
                name_ccds=t_data["name_ccds"], gene=t_data["gene_symbol"],
                gene_id=t_data["gene_id"], hgnc_id=t_data["hgnc_id"],
                source="ensembl", chr=t_data["chr"], strand=t_data["strand"],
                biotype=t_data["biotype"],
                is_gencode_basic=t_data["gencode_basic"],
                is_gencode_primary=t_data["gencode_primary"],
                is_ensembl_canonical=t_data["ensembl_canonical"],
                is_mane_select=t_data["mane_select"],
                is_mane_plus_clinical=t_data["mane_plus_clinical"],
                regions=t_data["exons"])
            cs, ce = t_data["start_coding"], t_data["end_coding"]
            if t.strand == "-":
                cs, ce = ce, cs
            t.coding_start, t.coding_end = cs, ce
            out.transcripts.append(t)
        pending.clear()
        ensg2hgnc.clear()

    opener = gzip.open if str(filename).endswith(".gz") else open
    with opener(filename, "rt") as fh:
        for raw in fh:
            line = raw.rstrip("\r\n")
            if not line:
                continue
            if line == "###":
                commit()
                continue
            if line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 9:
                raise ValueError(f"GFF line of '{filename}' does not contain 9 columns:\n{line}")
            attr_raw = parts[8]
            if attr_raw.startswith("ID=gene:"):
                attrs = _parse_attributes(attr_raw)
                gene_id = attrs.get("gene_id", "")
                gene_symbol = attrs.get("Name", "")
                hgnc_id = ""
                desc = attrs.get("description", "")
                i = desc.find("[Source:HGNC Symbol%3BAcc:")
                if i != -1:
                    j = desc.find("]", i + 26)
                    if j != -1:
                        hgnc_id = desc[i + 26:j].strip()
                out.ensg2symbol[gene_id] = gene_symbol
                chr_ = Chromosome(parts[0])
                if not chr_.is_non_special():
                    special_chrs.append(chr_.str)
                    c_skipped_special += 1
                    continue
                if not gene_symbol and not hgnc_id:
                    c_skipped_no_name_hgnc += 1
                    continue
                if skip_not_hgnc and not hgnc_id:
                    c_skipped_not_hgnc += 1
                    continue
                ensg2hgnc[gene_id] = hgnc_id
            elif attr_raw.startswith("ID=transcript:"):
                attrs = _parse_attributes(attr_raw)
                name = attrs.get("transcript_id", "")
                gene_id = attrs.get("Parent", "").split(":")[-1]
                out.enst2ensg[name] = gene_id
                tags = attrs.get("tag", "").split(",")
                gencode_basic = "basic" in tags or "gencode_basic" in tags
                if not include_all and not gencode_basic:
                    c_skipped_low_evidence += 1
                    continue
                if gene_id not in ensg2hgnc:
                    continue
                pending[name] = {
                    "name": name,
                    "version": int(attrs.get("version", "0") or 0),
                    "name_ccds": attrs.get("ccdsid", ""),
                    "gene_symbol": out.ensg2symbol.get(gene_id, ""),
                    "gene_id": gene_id,
                    "hgnc_id": ensg2hgnc[gene_id],
                    "chr": Chromosome(parts[0]),
                    "strand": parts[6],
                    "biotype": string_to_biotype(attrs.get("biotype", "")) if attrs.get("biotype") else "",
                    "gencode_basic": gencode_basic,
                    "gencode_primary": "gencode_primary" in tags,
                    "ensembl_canonical": "Ensembl_canonical" in tags,
                    "mane_select": "MANE_Select" in tags,
                    "mane_plus_clinical": "MANE_Plus_Clinical" in tags,
                    "start_coding": 0,
                    "end_coding": 0,
                    "exons": BedFile(),
                }
            elif parts[2] in ("CDS", "exon", "three_prime_UTR", "five_prime_UTR"):
                i = attr_raw.find("Parent=transcript:")
                if i == -1:
                    continue
                j = attr_raw.find(";", i + 18)
                parent = attr_raw[i + 18:] if j == -1 else attr_raw[i + 18:j]
                t_data = pending.get(parent)
                if t_data is None:
                    continue
                chr_ = Chromosome(parts[0])
                if chr_ != t_data["chr"]:
                    raise ValueError("Chromosome mismatch between transcript and exon!")
                start, end = int(parts[3]), int(parts[4])
                if parts[2] == "CDS":
                    t_data["start_coding"] = start if t_data["start_coding"] == 0 else min(start, t_data["start_coding"])
                    t_data["end_coding"] = end if t_data["end_coding"] == 0 else max(end, t_data["end_coding"])
                t_data["exons"].append(BedLine(chr_, start, end))
    commit()

    if print_to_stdout:
        w = sys.stdout.write
        w(f"Parsed {out.gene_count()} genes from GFF\n")
        w(f"Parsed {len(out.transcripts)} transcripts from GFF\n")
        if c_skipped_special:
            w(f"Notice: {c_skipped_special} genes on special chromosomes skipped: "
              + ", ".join(dict.fromkeys(special_chrs)) + "\n")
        if c_skipped_no_name_hgnc:
            w(f"Notice: {c_skipped_no_name_hgnc} genes without symbol and HGNC identifier skipped.\n")
        if c_skipped_not_hgnc:
            w(f"Notice: {c_skipped_not_hgnc} genes without a HGNC identifier skipped.\n")
        if c_skipped_low_evidence:
            w(f"Notice: {c_skipped_special} transcipts not flagged as 'GENCODE basic' skipped.\n")
    return out


# ---- HGVS.c -> genomic variant (Transcript::hgvsToVariant, Transcript.cpp) ----

def _c_dna_to_genomic(t: Transcript, coord: int) -> int:
    if coord < 1:
        raise ValueError(f"Invalid cDNA coordinate {coord} given for transcript {t.name}!")
    tmp = coord
    regions = t.coding_regions().lines
    if t.strand == "+":
        for line in regions:
            tmp -= line.end - line.start + 1
            if tmp <= 0:
                return line.end + tmp
    else:
        for line in reversed(regions):
            tmp -= line.end - line.start + 1
            if tmp <= 0:
                return line.start - tmp
    raise ValueError(f"Invalid cDNA coordinate {coord} (bigger than coding region) given for transcript {t.name}!")


def _n_dna_to_genomic(t: Transcript, coord: int) -> int:
    if coord < 1:
        raise ValueError(f"Invalid non-coding DNA coordinate {coord} given for transcript {t.name}!")
    tmp = coord
    regions = t.regions.lines
    if t.strand == "+":
        for line in regions:
            tmp -= line.end - line.start + 1
            if tmp <= 0:
                return line.end + tmp
    else:
        for line in reversed(regions):
            tmp -= line.end - line.start + 1
            if tmp <= 0:
                return line.start - tmp
    raise ValueError(f"Invalid non-coding DNA coordinate {coord} (bigger than non-coding region) given for transcript {t.name}!")


def _utr5_end(t: Transcript) -> int:
    utr5 = t.utr_5prime().lines
    if not utr5:
        raise ValueError(f"Cannot determine 5' UTR end for transcript {t.name} without 5' UTR regions!")
    return utr5[-1].end + 1 if t.strand == "+" else utr5[0].start - 1


def _utr3_start(t: Transcript) -> int:
    utr3 = t.utr_3prime().lines
    if not utr3:
        raise ValueError(f"Cannot determine 3' UTR start for transcript {t.name} without 3' UTR regions!")
    return utr3[0].start - 1 if t.strand == "+" else utr3[-1].end + 1


def _correct_5prime_utr_offset(t: Transcript, offset: int) -> int:
    utr5 = t.utr_5prime().lines
    if len(utr5) < 2:
        return offset
    gap_sum = 0
    if t.strand == "+":
        first = True
        size_sum = 0
        index = len(utr5) - 1
        while size_sum > offset and index >= 0:
            size_sum -= utr5[index].end - utr5[index].start + 1
            if first:
                first = False
            else:
                gap_sum += utr5[index + 1].start - utr5[index].end - 1
            index -= 1
    else:
        first = True
        size_sum = 0
        index = 0
        while size_sum > offset and index < len(utr5):
            size_sum -= utr5[index].end - utr5[index].start + 1
            if first:
                first = False
            else:
                gap_sum += utr5[index].start - utr5[index - 1].end - 1
            index += 1
    return offset - gap_sum


def _correct_3prime_utr_offset(t: Transcript, offset: int) -> int:
    utr3 = t.utr_3prime().lines
    if len(utr3) < 2:
        return offset
    gap_sum = 0
    if t.strand == "+":
        first = True
        size_sum = 0
        index = 0
        while size_sum < offset and index < len(utr3):
            size_sum += utr3[index].end - utr3[index].start + 1
            if first:
                first = False
            else:
                gap_sum += utr3[index].start - utr3[index - 1].end - 1
            index += 1
    else:
        first = True
        size_sum = 0
        index = len(utr3) - 1
        while size_sum < offset and index >= 0:
            size_sum += utr3[index].end - utr3[index].start + 1
            if first:
                first = False
            else:
                gap_sum += utr3[index + 1].start - utr3[index].end - 1
            index -= 1
    return offset + gap_sum


def _hgvs_parse_position(t: Transcript, position: str, non_coding: bool) -> tuple[int, int]:
    """Transcript::hgvsParsePosition — returns (genomic pos, offset)."""
    special = [i for i, c in enumerate(position) if not c.isdigit()]
    if not special:
        pos = _n_dna_to_genomic(t, int(position)) if non_coding else _c_dna_to_genomic(t, int(position))
        return pos, 0
    if len(special) == 1:
        s_pos = special[0]
        s_char = position[s_pos]
        if s_char == "+":
            base = int(position[:s_pos])
            pos = _n_dna_to_genomic(t, base) if non_coding else _c_dna_to_genomic(t, base)
            return pos, int(position[s_pos + 1:])
        if s_char == "-" and s_pos == 0:
            pos = _n_dna_to_genomic(t, 1) if non_coding else _utr5_end(t)
            offset = -int(position[1:])
            if not non_coding:
                offset = _correct_5prime_utr_offset(t, offset)
            return pos, offset
        if s_char == "-" and s_pos > 0:
            base = int(position[:s_pos])
            pos = _n_dna_to_genomic(t, base) if non_coding else _c_dna_to_genomic(t, base)
            return pos, -int(position[s_pos + 1:])
        if s_char == "*":
            if non_coding:
                pos = _n_dna_to_genomic(t, sum(l.end - l.start + 1 for l in t.regions.lines))
            else:
                pos = _utr3_start(t)
            offset = int(position[s_pos + 1:])
            offset = _correct_3prime_utr_offset(t, offset)
            return pos, offset
    elif len(special) == 2:
        s_pos1, s_pos2 = special
        s_char1, s_char2 = position[s_pos1], position[s_pos2]
        if s_pos1 == 0 and s_char1 == "-" and s_char2 == "-":
            pos = _n_dna_to_genomic(t, 1) if non_coding else _utr5_end(t)
            offset = -int(position[1:s_pos2])
            if not non_coding:
                offset = _correct_5prime_utr_offset(t, offset)
            return pos, offset - int(position[s_pos2 + 1:])
        if s_pos1 == 0 and s_char1 == "-" and s_char2 == "+":
            pos = _n_dna_to_genomic(t, 1) if non_coding else _utr5_end(t)
            offset = -int(position[1:s_pos2])
            if not non_coding:
                offset = _correct_5prime_utr_offset(t, offset)
            return pos, offset + int(position[s_pos2 + 1:])
        if s_char1 == "*" and s_char2 == "+":
            if non_coding:
                pos = _n_dna_to_genomic(t, sum(l.end - l.start + 1 for l in t.regions.lines))
            else:
                pos = _utr3_start(t)
            offset = _correct_3prime_utr_offset(t, int(position[1:s_pos2]))
            return pos, offset + int(position[s_pos2 + 1:])
        if s_char1 == "*" and s_char2 == "-":
            if non_coding:
                pos = _n_dna_to_genomic(t, sum(l.end - l.start + 1 for l in t.regions.lines))
            else:
                pos = _utr3_start(t)
            offset = _correct_3prime_utr_offset(t, int(position[1:s_pos2]))
            return pos, offset - int(position[s_pos2 + 1:])
    raise ValueError(f"Unsupported HGVS.c position string '{position}'!")


def _parse_range(t: Transcript, position: str, non_coding: bool) -> tuple[int, int]:
    sign = 1 if t.strand == "+" else -1
    i = position.find("_")
    if i != -1:
        start, off1 = _hgvs_parse_position(t, position[:i], non_coding)
        start += sign * off1
        end, off2 = _hgvs_parse_position(t, position[i + 1:], non_coding)
        end += sign * off2
        if start > end:
            start, end = end, start
    else:
        start, off = _hgvs_parse_position(t, position, non_coding)
        start += sign * off
        end = start
    return start, end


def left_align_gsvar(chr_, start: int, ref: bytes, obs: bytes, genome) -> tuple[int, int, bytes, bytes]:
    """Variant::leftAlign (VariantList.cpp) for GSvar-style variants."""
    from ..qc.variant_details import min_block
    ref = ref.upper()
    obs = obs.upper()
    if len(ref) == 1 and len(obs) == 1 and ref != b"-" and obs != b"-":
        return start, start, ref, obs
    if len(ref) > 1 and len(obs) > 1:
        return start, start + len(ref) - 1, ref, obs
    if ref == b"-":
        block = min_block(obs)
        start -= len(block) - 1
        while genome.seq(chr_, start, len(block)) == block:
            start -= len(block)
        start += len(block) - 1
        ref = genome.seq(chr_, start, 1)
        obs = ref + obs
        while ref == obs[-1:]:
            start -= 1
            ref = genome.seq(chr_, start, 1)
            obs = ref + obs[:-1]
        ref = b"-"
        obs = obs[1:]
        return start, start, ref, obs
    if obs == b"-":
        block = min_block(ref)
        while genome.seq(chr_, start, len(block)) == block:
            start -= len(block)
        start += len(block)
        start -= 1
        obs = genome.seq(chr_, start, 1)
        ref = obs + ref
        while ref[-1:] == obs:
            start -= 1
            obs = genome.seq(chr_, start, 1)
            ref = obs + ref[:-1]
        obs = b"-"
        ref = ref[1:]
        start += 1
        return start, start + len(ref) - 1, ref, obs
    return start, start + len(ref) - 1, ref, obs


def hgvs_to_variant(t: Transcript, hgvs_c: str, genome) -> tuple:
    """Transcript::hgvsToVariant — returns (chr, start, end, ref, obs) in
    GSvar representation ('-' for empty side), left-aligned."""
    import re as _re

    if len(t.regions) == 0:
        raise ValueError(f"Transcript '{t.name}' has no regions() defined!")
    chr_ = t.regions.lines[0].chr
    hgvs_c = hgvs_c.strip()
    non_coding = False
    if hgvs_c.startswith("c."):
        hgvs_c = hgvs_c[2:]
    elif hgvs_c.startswith("n."):
        hgvs_c = hgvs_c[2:]
        non_coding = True
    else:
        raise ValueError(f"Invalid HGVS.c prefix '{hgvs_c[:2]}'. Must be 'c.' or 'n.'!")

    hgvs_c = _re.sub(r"dup[ACGTN]+", "dup", hgvs_c)
    hgvs_c = _re.sub(r"del[ACGTN]+", "del", hgvs_c)
    hgvs_c = _re.sub(r"dup[0-9]+", "dup", hgvs_c)
    hgvs_c = _re.sub(r"del[0-9]+", "del", hgvs_c)

    length = len(hgvs_c)
    if length < 4:
        raise ValueError(f"Invalid cDNA change '{hgvs_c}'!")

    minus = t.strand != "+"
    if (hgvs_c[length - 4].isdigit() and hgvs_c[length - 3].isalpha()
            and hgvs_c[length - 2] == ">" and hgvs_c[length - 1].isalpha()):
        # SNV
        pos, offset = _hgvs_parse_position(t, hgvs_c[:length - 3], non_coding)
        start = pos + (offset if not minus else -offset)
        end = start
        ref = hgvs_c[length - 3].upper().encode()
        obs = hgvs_c[length - 1].upper().encode()
        if minus:
            ref = reverse_complement(ref)
            obs = reverse_complement(obs)
    elif hgvs_c.endswith("dup"):
        start, end = _parse_range(t, hgvs_c[:-3], non_coding)
        ref = b"-"
        obs = genome.seq(chr_, start, end - start + 1)
        start = start - 1  # GSvar insertions are to the right of the coordinate
        end = start
    elif hgvs_c.endswith("del"):
        start, end = _parse_range(t, hgvs_c[:-3], non_coding)
        ref = genome.seq(chr_, start, end - start + 1)
        obs = b"-"
    elif "delins" in hgvs_c:
        i = hgvs_c.index("delins")
        start, end = _parse_range(t, hgvs_c[:i], non_coding)
        ref = genome.seq(chr_, start, end - start + 1)
        obs = hgvs_c[i + 6:].encode()
        if minus:
            obs = reverse_complement(obs)
    elif "ins" in hgvs_c and "_" in hgvs_c:
        i = hgvs_c.index("ins")
        if hgvs_c[i + 3:] == "":
            raise ValueError(f"Insertion '{hgvs_c}' does not specify what was inserted!")
        start, end = _parse_range(t, hgvs_c[:i], non_coding)
        if start != end - 1:
            raise ValueError(f"Insertion '{hgvs_c}' has coordinates that are not next to each other: {start}/{end}!")
        end = start
        ref = b"-"
        obs = hgvs_c[i + 3:].encode()
        if minus:
            obs = reverse_complement(obs)
    else:
        raise ValueError(
            f"Unsupported cDNA change '{hgvs_c}'. Please note:\n"
            "- Adjacent SNVs changes e.g. 'c.1234CA>TC' are not supported. Spit them in single base changes or format them as 'delins'.\n"
            "- Duplication must end with 'dup'. Remove everyhing after.\n"
            "- Deletions must end with 'del'. Remove everyhing after.")

    if end - start + 1 != len(ref):
        raise ValueError(f"HGVS.c '{t.name}:{hgvs_c}': reference length of coordinates "
                         f"({end - start + 1}) and sequence ({len(ref)}) do not match!")

    start, end, ref, obs = left_align_gsvar(chr_, start, ref, obs, genome)
    return chr_, start, end, ref, obs
