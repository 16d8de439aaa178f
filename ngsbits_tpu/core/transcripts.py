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

_RC = bytes.maketrans(b"ACGTNacgtn", b"TGCANtgcan")


def reverse_complement(seq: bytes) -> bytes:
    return seq.translate(_RC)[::-1]


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


def load_gff3(filename: str, include_all: bool = False, skip_not_hgnc: bool = False,
              print_to_stdout: bool = True, source: str = "ensembl") -> GffData:
    """GffData::load for Ensembl GFF3 (GffData.cpp:200-360)."""
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
