"""Variant consequence / HGVS nomenclature annotation engine.

Behavioral reference: ngs-bits cppNGS/VariantHgvsAnnotator.{h,cpp} (the
`annotate` pipeline incl. 3'-shifting normalization, region classification,
HGVS c./p. strings, splice-region annotation) and cppNGS/VcfLine.cpp
(VcfLine::normalize).
"""

from __future__ import annotations

from .intervals import BedFile
from .transcripts import THREE_LETTER, Transcript, reverse_complement, translate_codon

# consequence types in priority order (VariantConsequenceType enum order,
# VariantHgvsAnnotator.h:15-42)
CONSEQUENCE_TYPES = [
    "INTERGENIC_VARIANT",
    "DOWNSTREAM_GENE_VARIANT",
    "UPSTREAM_GENE_VARIANT",
    "NMD_TRANSCRIPT_VARIANT",
    "NON_CODING_TRANSCRIPT_VARIANT",
    "INTRON_VARIANT",
    "NON_CODING_TRANSCRIPT_EXON_VARIANT",
    "THREE_PRIME_UTR_VARIANT",
    "FIVE_PRIME_UTR_VARIANT",
    "CODING_SEQUENCE_VARIANT",
    "SYNONYMOUS_VARIANT",
    "STOP_RETAINED_VARIANT",
    "START_RETAINED_VARIANT",
    "INCOMPLETE_TERMINAL_CODON_VARIANT",
    "SPLICE_REGION_VARIANT",
    "PROTEIN_ALTERING_VARIANT",
    "MISSENSE_VARIANT",
    "INFRAME_DELETION",
    "INFRAME_INSERTION",
    "START_LOST",
    "STOP_LOST",
    "STOP_GAINED",
    "FRAMESHIFT_VARIANT",
    "SPLICE_DONOR_VARIANT",
    "SPLICE_ACCEPTOR_VARIANT",
]
_PRIORITY = {name: i for i, name in enumerate(CONSEQUENCE_TYPES)}

TYPE_STRINGS = {
    "SPLICE_ACCEPTOR_VARIANT": "splice_acceptor_variant",
    "SPLICE_DONOR_VARIANT": "splice_donor_variant",
    "STOP_GAINED": "stop_gained",
    "FRAMESHIFT_VARIANT": "frameshift_variant",
    "STOP_LOST": "stop_lost",
    "START_LOST": "start_lost",
    "INFRAME_INSERTION": "inframe_insertion",
    "INFRAME_DELETION": "inframe_deletion",
    "MISSENSE_VARIANT": "missense_variant",
    "PROTEIN_ALTERING_VARIANT": "protein_altering_variant",
    "SPLICE_REGION_VARIANT": "splice_region_variant",
    "INCOMPLETE_TERMINAL_CODON_VARIANT": "incomplete_terminal_codon_variant",
    "START_RETAINED_VARIANT": "start_retained_variant",
    "STOP_RETAINED_VARIANT": "stop_retained_variant",
    "SYNONYMOUS_VARIANT": "synonymous_variant",
    "CODING_SEQUENCE_VARIANT": "coding_sequence_variant",
    "FIVE_PRIME_UTR_VARIANT": "5_prime_UTR_variant",
    "THREE_PRIME_UTR_VARIANT": "3_prime_UTR_variant",
    "NON_CODING_TRANSCRIPT_EXON_VARIANT": "non_coding_transcript_exon_variant",
    "INTRON_VARIANT": "intron_variant",
    "NON_CODING_TRANSCRIPT_VARIANT": "non_coding_transcript_variant",
    "UPSTREAM_GENE_VARIANT": "upstream_gene_variant",
    "DOWNSTREAM_GENE_VARIANT": "downstream_gene_variant",
    "INTERGENIC_VARIANT": "intergenic_variant",
    "NMD_TRANSCRIPT_VARIANT": "NMD_transcript_variant",
}

# impact per consequence type (consequenceTypeToImpact)
_IMPACT_HIGH = {"SPLICE_ACCEPTOR_VARIANT", "SPLICE_DONOR_VARIANT", "STOP_GAINED",
                "FRAMESHIFT_VARIANT", "STOP_LOST", "START_LOST"}
_IMPACT_MODERATE = {"INFRAME_INSERTION", "INFRAME_DELETION", "MISSENSE_VARIANT",
                    "PROTEIN_ALTERING_VARIANT"}
_IMPACT_LOW = {"SPLICE_REGION_VARIANT", "INCOMPLETE_TERMINAL_CODON_VARIANT",
               "START_RETAINED_VARIANT", "STOP_RETAINED_VARIANT", "SYNONYMOUS_VARIANT"}

IMPACT_ORDER = ["MODIFIER", "LOW", "MODERATE", "HIGH"]


def consequence_type_to_impact(ctype: str) -> str:
    if ctype in _IMPACT_HIGH:
        return "HIGH"
    if ctype in _IMPACT_MODERATE:
        return "MODERATE"
    if ctype in _IMPACT_LOW:
        return "LOW"
    return "MODIFIER"


def _tl(codon: bytes, mito: bool = False) -> str:
    """Three-letter translation of one codon."""
    return THREE_LETTER[translate_codon(codon.decode().upper(), mito)]


def _tl1(codon: bytes, mito: bool = False) -> str:
    return translate_codon(codon.decode().upper(), mito)


class VariantConsequence:
    def __init__(self):
        self.types: set[str] = set()
        self.impact = "MODIFIER"
        self.hgvs_c = ""
        self.hgvs_p = ""
        self.exon_number = -1
        self.intron_number = -1
        self.normalized = ""

    def types_to_string(self, sep: str = "&") -> str:
        return sep.join(sorted(TYPE_STRINGS[t] for t in self.types))

    def types_to_string_simplified(self, sep: str = "&") -> str:
        """VariantConsequence::typesToStringSimplified."""
        skip = {"SPLICE_REGION_VARIANT", "SPLICE_ACCEPTOR_VARIANT", "SPLICE_DONOR_VARIANT",
                "NMD_TRANSCRIPT_VARIANT", "NON_CODING_TRANSCRIPT_VARIANT"}
        max_type = "INTERGENIC_VARIANT"
        for t in self.types:
            if t in skip:
                continue
            if _PRIORITY[t] > _PRIORITY[max_type]:
                max_type = t
        out = TYPE_STRINGS[max_type]
        if "SPLICE_REGION_VARIANT" in self.types:
            splice_type = "SPLICE_REGION_VARIANT"
            if "SPLICE_ACCEPTOR_VARIANT" in self.types:
                splice_type = "SPLICE_ACCEPTOR_VARIANT"
            elif "SPLICE_DONOR_VARIANT" in self.types:
                splice_type = "SPLICE_DONOR_VARIANT"
            if _PRIORITY[splice_type] > _PRIORITY[max_type]:
                out = TYPE_STRINGS[splice_type] + sep + out
            else:
                out = out + sep + TYPE_STRINGS[splice_type]
        if "NMD_TRANSCRIPT_VARIANT" in self.types:
            out += sep + TYPE_STRINGS["NMD_TRANSCRIPT_VARIANT"]
        elif ("NON_CODING_TRANSCRIPT_VARIANT" in self.types
              and "NON_CODING_TRANSCRIPT_EXON_VARIANT" not in self.types):
            out += sep + TYPE_STRINGS["NON_CODING_TRANSCRIPT_VARIANT"]
        return out


class HgvsVariant:
    """Single-allele VCF-style variant (mutable, for normalization)."""

    __slots__ = ("chr", "pos", "ref", "alt")

    def __init__(self, chr_, pos: int, ref: bytes, alt: bytes):
        self.chr = chr_
        self.pos = pos
        self.ref = ref.upper()
        self.alt = alt.upper()

    @property
    def end(self) -> int:
        return self.pos + len(self.ref) - 1

    def is_snv(self) -> bool:
        return len(self.ref) == 1 and len(self.alt) == 1

    def is_del(self) -> bool:
        return len(self.alt) == 1 and len(self.ref) > 1

    def is_ins(self) -> bool:
        return len(self.alt) > 1 and len(self.ref) == 1

    def is_indel(self) -> bool:
        return len(self.alt) > 1 and len(self.ref) > 1

    def is_mnp(self) -> bool:
        return self.is_indel() and len(self.alt) == len(self.ref)

    def to_string(self) -> str:
        return f"{self.chr.str_normalized(True)}:{self.pos} {self.ref.decode()}>{self.alt.decode()}"


def _variant_normalize(v: HgvsVariant):
    """Variant::normalize (VariantList.cpp) — trim first base, suffix, prefix."""
    ref, alt, start = v.ref, v.alt, v.pos
    if (len(ref) != 1 or len(alt) != 1) and ref and alt and ref[0] == alt[0]:
        ref, alt, start = ref[1:], alt[1:], start + 1
    while (len(ref) != 1 or len(alt) != 1) and ref and alt and ref[-1:] == alt[-1:]:
        ref, alt = ref[:-1], alt[:-1]
    while (len(ref) != 1 or len(alt) != 1) and ref and alt and ref[0] == alt[0]:
        ref, alt, start = ref[1:], alt[1:], start + 1
    v.ref, v.alt, v.pos = ref, alt, start


def _min_block(seq: bytes) -> bytes:
    """Variant::minBlock — smallest repeating subunit."""
    n = len(seq)
    for size in range(1, n + 1):
        if n % size != 0:
            continue
        if seq[:size] * (n // size) == seq:
            return seq[:size]
    return seq


def normalize_variant(v: HgvsVariant, shift_right: bool, genome) -> None:
    """VcfLine::normalize(shift_dir, reference, add_prefix_base_to_mnps=true)."""
    if v.ref != genome.seq(v.chr, v.pos, len(v.ref)):
        return
    _variant_normalize(v)
    if len(v.ref) == 1 and len(v.alt) == 1:
        return
    if len(v.ref) != 0 and len(v.alt) != 0:
        # complex indel / MNP: re-prepend the prefix base
        v.pos -= 1
        prefix = genome.seq(v.chr, v.pos, 1)
        v.ref = prefix + v.ref
        v.alt = prefix + v.alt
        return
    chr_len = genome.length_of(v.chr)
    if (v.pos == 1 and not shift_right) or (v.pos + len(v.ref) - 1 == chr_len and shift_right):
        return

    if not shift_right:
        if len(v.ref) == 0:  # left-align insertion
            block = _min_block(v.alt)
            v.pos -= len(block)
            while v.pos > 0 and genome.seq(v.chr, v.pos, len(block)) == block:
                v.pos -= len(block)
            v.pos += len(block)
            v.pos -= 1
            v.ref = genome.seq(v.chr, v.pos, 1)
            v.alt = v.ref + v.alt
            while v.ref[0] == v.alt[-1]:
                v.pos -= 1
                v.ref = genome.seq(v.chr, v.pos, 1)
                v.alt = v.ref + v.alt[:-1]
        else:  # left-align deletion
            block = _min_block(v.ref)
            while v.pos >= 1 and genome.seq(v.chr, v.pos, len(block)) == block:
                v.pos -= len(block)
            v.pos += len(block)
            v.pos -= 1
            v.alt = genome.seq(v.chr, v.pos, 1)
            v.ref = v.alt + v.ref
            while v.ref[-1] == v.alt[0]:
                v.pos -= 1
                v.alt = genome.seq(v.chr, v.pos, 1)
                v.ref = v.alt + v.ref[:-1]
    else:
        if len(v.ref) == 0:  # right-align insertion
            block = _min_block(v.alt)
            while v.pos < chr_len - len(block) and genome.seq(v.chr, v.pos, len(block)) == block:
                v.pos += len(block)
            v.pos -= 1
            v.ref = genome.seq(v.chr, v.pos, 1)
            v.alt = v.ref + v.alt
            while genome.seq(v.chr, v.pos + 1, 1)[0] == v.alt[1]:
                v.pos += 1
                v.ref = genome.seq(v.chr, v.pos, 1)
                v.alt = v.ref + v.alt[2:] + genome.seq(v.chr, v.pos, 1)
        else:  # right-align deletion
            block = _min_block(v.ref)
            while v.pos < chr_len - len(block) and genome.seq(v.chr, v.pos, len(block)) == block:
                v.pos += len(block)
            v.pos -= len(v.ref)
            v.pos -= 1
            v.alt = genome.seq(v.chr, v.pos, 1)
            v.ref = v.alt + v.ref
            while v.ref[1] == genome.seq(v.chr, v.pos + len(v.ref), 1)[0]:
                v.pos += 1
                v.alt = genome.seq(v.chr, v.pos, 1)
                v.ref = genome.seq(v.chr, v.pos, len(v.ref))


def _range_overlaps(s1, e1, s2, e2):
    return s1 <= e2 and s2 <= e1


class VariantHgvsAnnotator:
    def __init__(self, genome_idx, max_dist_to_transcript: int = 5000,
                 splice_region_ex: int = 3, splice_region_in_5: int = 20,
                 splice_region_in_3: int = 20):
        self.genome = genome_idx
        self.max_dist_to_transcript = max_dist_to_transcript
        self.splice_region_ex = splice_region_ex
        self.splice_region_in_5 = splice_region_in_5
        self.splice_region_in_3 = splice_region_in_3
        self._coding_sequence_cache: dict[str, bytes] = {}

    # ---- main entry point ----
    def annotate(self, transcript: Transcript, variant_orig: HgvsVariant) -> VariantConsequence:
        if len(transcript.regions) == 0:
            raise ValueError(f"Cannot annotate consequences for transcripts without regions: {transcript.name}")
        variant = HgvsVariant(variant_orig.chr, variant_orig.pos, variant_orig.ref, variant_orig.alt)

        plus_strand = transcript.strand == "+"
        hgvs = VariantConsequence()

        if transcript.biotype == "nonsense mediated decay":
            hgvs.types.add("NMD_TRANSCRIPT_VARIANT")

        normalize_variant(variant, plus_strand, self.genome)
        start = variant.pos
        end = variant.end
        hgvs.normalized = variant.to_string()

        self._annotate_exon_intron_number(hgvs, transcript, variant)

        ref = variant.ref
        obs = variant.alt
        pos_hgvs_c = ""
        pos_hgvs_c_dup = ""

        if transcript.is_coding():
            anno = lambda pos, is_dup=False: self._annotate_regions_coding(transcript, hgvs, pos, is_dup)
        else:
            anno = lambda pos, is_dup=False: self._annotate_regions_non_coding(transcript, hgvs, pos, is_dup)

        if variant.is_snv():
            pos_hgvs_c = anno(start)
        elif variant.is_del():
            pos_hgvs_c = anno(start + 1)
            if end - start > 1 and pos_hgvs_c != "":
                if plus_strand:
                    pos_hgvs_c += "_" + anno(end)
                else:
                    pos_hgvs_c = anno(end) + "_" + pos_hgvs_c
        elif variant.is_ins():
            alt_len = len(variant.alt)
            if plus_strand:
                if self.genome.seq(variant.chr, start - alt_len + 2, alt_len - 1) == variant.alt[1:]:
                    pos_hgvs_c_dup = anno(start - alt_len + 2, True)
                    if alt_len > 2:
                        pos_hgvs_c_dup += "_" + anno(start, True)
                    if pos_hgvs_c_dup.startswith("_") or pos_hgvs_c_dup.endswith("_"):
                        pos_hgvs_c_dup = ""
                pos_hgvs_c = anno(start) + "_" + anno(start + 1)
            else:
                if self.genome.seq(variant.chr, start + 1, alt_len - 1) == variant.alt[1:]:
                    pos_hgvs_c_dup = anno(start + alt_len - 1, True)
                    if alt_len > 2:
                        pos_hgvs_c_dup += "_" + anno(start + 1, True)
                    if pos_hgvs_c_dup.startswith("_") or pos_hgvs_c_dup.endswith("_"):
                        pos_hgvs_c_dup = ""
                pos_hgvs_c = anno(start + 1) + "_" + anno(start)
            if pos_hgvs_c == "_":
                pos_hgvs_c = ""
            if pos_hgvs_c_dup == "_":
                pos_hgvs_c_dup = ""
        elif variant.is_indel():
            pos_hgvs_c = anno(start + 1)
            if end - start > 1 and pos_hgvs_c != "":
                if plus_strand:
                    pos_hgvs_c += "_" + anno(end)
                else:
                    pos_hgvs_c = anno(end) + "_" + pos_hgvs_c
        else:
            raise ValueError(f"Could not determine type of variant {variant.to_string()}")

        if (transcript.is_coding() and pos_hgvs_c != ""
                and "CODING_SEQUENCE_VARIANT" in hgvs.types):
            if not variant.is_ins() and "INTRON_VARIANT" in hgvs.types:
                pass  # deletion/indel spanning exon-intron boundary -> no protein annotation
            else:
                hgvs.hgvs_p = self._hgvs_protein(variant, pos_hgvs_c, transcript)

        # up- or downstream variant: no cDNA description possible
        inside_transcript = start >= transcript.start() and end <= transcript.end()
        if pos_hgvs_c == "" or not inside_transcript:
            hgvs.hgvs_c = ""
            hgvs.hgvs_p = ""
            hgvs.impact = "MODIFIER"
            return hgvs

        # splice region
        start_affected = start
        end_affected = end
        if variant.is_del() or variant.is_indel():
            start_affected += 1
        self._annotate_splice_region(hgvs, transcript, start_affected, end_affected, variant.is_ins())

        hgvs_c_prefix = "c." if transcript.is_coding() else "n."

        if variant.is_snv():
            if "CODING_SEQUENCE_VARIANT" in hgvs.types:
                self._annotate_prot_seq_csq_snv(hgvs)
            if plus_strand:
                hgvs.hgvs_c = hgvs_c_prefix + pos_hgvs_c + ref.decode() + ">" + obs.decode()
            else:
                hgvs.hgvs_c = (hgvs_c_prefix + pos_hgvs_c
                               + reverse_complement(ref).decode() + ">" + reverse_complement(obs).decode())
        elif variant.is_del():
            hgvs.hgvs_c = hgvs_c_prefix + pos_hgvs_c + "del"
        elif variant.is_ins():
            alt = variant.alt[1:]
            if pos_hgvs_c_dup != "":
                hgvs.hgvs_c = hgvs_c_prefix + pos_hgvs_c_dup + "dup"
            else:
                if not plus_strand:
                    alt = reverse_complement(alt)
                hgvs.hgvs_c = hgvs_c_prefix + pos_hgvs_c + "ins" + alt.decode()
        elif variant.is_indel():
            alt = variant.alt[1:]
            if not plus_strand:
                alt = reverse_complement(alt)
            hgvs.hgvs_c = hgvs_c_prefix + pos_hgvs_c + "delins" + alt.decode()

        # consequence types based on protein annotation string
        if not variant.is_snv() and hgvs.hgvs_p != "":
            hgvs.types.add("PROTEIN_ALTERING_VARIANT")
            if "THREE_PRIME_UTR_VARIANT" in hgvs.types and "CODING_SEQUENCE_VARIANT" in hgvs.types:
                hgvs.types.add("STOP_LOST")
            if hgvs.hgvs_p == "p.Met1?":
                hgvs.types.add("START_LOST")
            elif hgvs.hgvs_p == "p.Met1=":
                hgvs.types.add("START_RETAINED_VARIANT")
            elif hgvs.hgvs_p.endswith("Ter"):
                hgvs.types.add("STOP_GAINED")
            elif "Ter" in hgvs.hgvs_p:
                hgvs.types.add("STOP_LOST")
            if "fs" in hgvs.hgvs_p:
                hgvs.types.add("FRAMESHIFT_VARIANT")
            elif variant.is_del() and "START_RETAINED_VARIANT" not in hgvs.types:
                hgvs.types.add("INFRAME_DELETION")
            elif variant.is_ins():
                hgvs.types.add("INFRAME_INSERTION")
            else:
                if "START_RETAINED_VARIANT" not in hgvs.types:
                    if len(variant.ref) == len(variant.alt):
                        hgvs.types.add("MISSENSE_VARIANT")
                    elif len(variant.ref) > len(variant.alt):
                        hgvs.types.add("INFRAME_DELETION")
                    else:
                        hgvs.types.add("INFRAME_INSERTION")

        hgvs.impact = "MODIFIER"
        for t in hgvs.types:
            imp = consequence_type_to_impact(t)
            if IMPACT_ORDER.index(imp) > IMPACT_ORDER.index(hgvs.impact):
                hgvs.impact = imp
        return hgvs

    # ---- region classification ----
    def _annotate_regions_coding(self, transcript, hgvs, gen_pos, is_dup=False):
        plus_strand = transcript.strand == "+"
        coding_start = transcript.coding_start
        coding_end = transcript.coding_end
        pos_hgvs_c = ""

        # upstream of start codon
        if (plus_strand and gen_pos < coding_start) or (not plus_strand and gen_pos > coding_start):
            if (plus_strand and gen_pos >= transcript.start()) or (not plus_strand and gen_pos <= transcript.end()):
                pos_hgvs_c = self._hgvs_position(transcript.utr_5prime(), gen_pos, plus_strand,
                                                 transcript.coding_regions(), True)
                if not is_dup:
                    if "+" in pos_hgvs_c or "-" in pos_hgvs_c:
                        hgvs.types.add("INTRON_VARIANT")
                    else:
                        hgvs.types.add("FIVE_PRIME_UTR_VARIANT")
                if pos_hgvs_c.startswith("+1-"):
                    pos_hgvs_c = pos_hgvs_c[1:]
                elif not pos_hgvs_c.startswith("-1+"):
                    pos_hgvs_c = "-" + pos_hgvs_c
            elif ((plus_strand and transcript.start() - gen_pos <= self.max_dist_to_transcript)
                  or (not plus_strand and gen_pos - transcript.end() <= self.max_dist_to_transcript)):
                if not is_dup:
                    hgvs.types.add("INTERGENIC_VARIANT")
                    hgvs.types.add("UPSTREAM_GENE_VARIANT")
                return ""
            else:
                return ""
        # downstream of stop codon
        elif (plus_strand and gen_pos > coding_end) or (not plus_strand and gen_pos < coding_end):
            if (plus_strand and gen_pos <= transcript.end()) or (not plus_strand and gen_pos >= transcript.start()):
                pos_hgvs_c = self._hgvs_position(transcript.utr_3prime(), gen_pos, plus_strand,
                                                 transcript.coding_regions(), False)
                if pos_hgvs_c.startswith("+"):
                    cds_length = sum(l.end - l.start + 1 for l in transcript.coding_regions().lines)
                    pos_hgvs_c = str(cds_length) + pos_hgvs_c
                else:
                    pos_hgvs_c = "*" + pos_hgvs_c
                if not is_dup:
                    if "+" in pos_hgvs_c or ("-" in pos_hgvs_c):
                        hgvs.types.add("INTRON_VARIANT")
                    else:
                        hgvs.types.add("THREE_PRIME_UTR_VARIANT")
            elif ((plus_strand and gen_pos - transcript.end() <= self.max_dist_to_transcript)
                  or (not plus_strand and transcript.start() - gen_pos <= self.max_dist_to_transcript)):
                if not is_dup:
                    hgvs.types.add("INTERGENIC_VARIANT")
                    hgvs.types.add("DOWNSTREAM_GENE_VARIANT")
                return ""
            else:
                return ""
        # between start and stop codon
        else:
            pos_hgvs_c = self._hgvs_position(transcript.coding_regions(), gen_pos, plus_strand,
                                             transcript.coding_regions(), False)
            if not is_dup:
                if "+" in pos_hgvs_c or "-" in pos_hgvs_c:
                    hgvs.types.add("INTRON_VARIANT")
                else:
                    hgvs.types.add("CODING_SEQUENCE_VARIANT")
        return pos_hgvs_c

    def _annotate_regions_non_coding(self, transcript, hgvs, gen_pos, is_dup=False):
        plus_strand = transcript.strand == "+"
        if transcript.start() <= gen_pos <= transcript.end():
            if not is_dup:
                hgvs.types.add("NON_CODING_TRANSCRIPT_VARIANT")
            pos_hgvs_c = self._hgvs_position(transcript.regions, gen_pos, plus_strand,
                                             transcript.regions, False)
            if not is_dup:
                if "+" in pos_hgvs_c or "-" in pos_hgvs_c:
                    hgvs.types.add("INTRON_VARIANT")
                else:
                    hgvs.types.add("NON_CODING_TRANSCRIPT_EXON_VARIANT")
            return pos_hgvs_c
        elif ((plus_strand and gen_pos - transcript.end() <= self.max_dist_to_transcript and gen_pos > transcript.end())
              or (not plus_strand and transcript.start() - gen_pos <= self.max_dist_to_transcript and gen_pos < transcript.start())):
            if not is_dup:
                hgvs.types.add("INTERGENIC_VARIANT")
                hgvs.types.add("DOWNSTREAM_GENE_VARIANT")
            return ""
        elif ((plus_strand and transcript.start() - gen_pos <= self.max_dist_to_transcript and gen_pos < transcript.start())
              or (not plus_strand and gen_pos - transcript.end() <= self.max_dist_to_transcript and gen_pos > transcript.end())):
            if not is_dup:
                hgvs.types.add("INTERGENIC_VARIANT")
                hgvs.types.add("UPSTREAM_GENE_VARIANT")
            return ""
        return ""

    def _hgvs_position(self, regions: BedFile, gen_pos: int, plus_strand: bool,
                       coding_regions: BedFile, utr_5: bool) -> str:
        in_exon = False
        pos = 0
        if utr_5:
            plus_strand = not plus_strand
        lines = regions.lines
        for i in range(len(lines)):
            if lines[i].start <= gen_pos <= lines[i].end:
                in_exon = True
                if plus_strand:
                    pos += gen_pos - lines[i].start + 1
                    break
                else:
                    pos = lines[i].end - gen_pos + 1
                    continue
            if plus_strand or (not plus_strand and in_exon):
                pos += lines[i].end - lines[i].start + 1
        if in_exon:
            return str(pos)
        return self._position_in_intron(regions, gen_pos, plus_strand, coding_regions, utr_5)

    def _position_in_intron(self, regions: BedFile, genomic_position: int, plus_strand: bool,
                            coding_regions: BedFile, utr_5: bool) -> str:
        pos_in_intron = ""
        closest_exon_pos = 0
        pos_found = False
        lines = regions.lines
        for i in range(len(lines) - 1):
            if plus_strand:
                closest_exon_pos += lines[i].end - lines[i].start + 1
            elif pos_found:
                closest_exon_pos += lines[i + 1].end - lines[i + 1].start + 1
            if lines[i].end < genomic_position < lines[i + 1].start:
                pos_found = True
                dist_below = genomic_position - lines[i].end
                dist_above = lines[i + 1].start - genomic_position
                if plus_strand:
                    if utr_5:
                        pos_in_intron = f"-{dist_below}" if dist_below < dist_above else f"+{dist_above}"
                    else:
                        pos_in_intron = f"+{dist_below}" if dist_below <= dist_above else f"-{dist_above}"
                    break
                else:
                    closest_exon_pos += lines[i + 1].end - lines[i + 1].start + 1
                    if utr_5:
                        pos_in_intron = f"-{dist_above}" if dist_above < dist_below else f"+{dist_below}"
                    else:
                        pos_in_intron = f"+{dist_above}" if dist_above <= dist_below else f"-{dist_below}"

        if not pos_found:
            # intron between UTR and coding exon (UTR and CDS on different exons)
            cr = coding_regions.lines
            if utr_5:
                if plus_strand:  # note: strand was inverted for 5' UTR
                    dist_below = genomic_position - cr[-1].end
                    dist_above = lines[0].start - genomic_position
                    pos_in_intron = f"+1-{dist_below}" if dist_below < dist_above else f"-1+{dist_above}"
                else:
                    dist_below = genomic_position - lines[-1].end
                    dist_above = cr[0].start - genomic_position
                    pos_in_intron = f"-1+{dist_below}" if dist_below <= dist_above else f"+1-{dist_above}"
            else:
                if plus_strand:
                    dist_below = genomic_position - cr[-1].end
                    dist_above = lines[0].start - genomic_position
                    pos_in_intron = f"+{dist_below}" if dist_below <= dist_above else f"1-{dist_above}"
                else:
                    dist_below = genomic_position - lines[-1].end
                    dist_above = cr[0].start - genomic_position
                    pos_in_intron = f"1-{dist_below}" if dist_below < dist_above else f"+{dist_above}"
            return pos_in_intron

        if pos_in_intron.startswith("+"):
            pos_in_intron = str(closest_exon_pos + 1 if utr_5 else closest_exon_pos) + pos_in_intron
        elif pos_in_intron.startswith("-"):
            pos_in_intron = str(closest_exon_pos if utr_5 else closest_exon_pos + 1) + pos_in_intron
        return pos_in_intron

    # ---- protein annotation ----
    def _translate(self, seq: bytes, is_mito: bool = False, end_at_stop: bool = True) -> str:
        if len(seq) % 3 != 0:
            raise ValueError("Coding sequence length must be multiple of three.")
        out = []
        for i in range(0, len(seq), 3):
            out.append(_tl(seq[i:i + 3], is_mito))
            if end_at_stop and out[-1] == "Ter":
                break
        return "".join(out)

    def coding_sequence(self, trans: Transcript, add_utr_3: bool = True) -> bytes:
        """VariantHgvsAnnotator::getCodingSequence."""
        key = trans.name + ("3" if add_utr_3 else "")
        if key in self._coding_sequence_cache:
            return self._coding_sequence_cache[key]
        seq = b""
        if add_utr_3 and trans.strand == "-":
            utr3 = trans.utr_3prime().lines
            for l in utr3:
                seq += self.genome.seq(trans.chr, l.start, l.end - l.start + 1)
            if not utr3:
                seq += self.genome.seq(trans.chr, max(trans.start() - 30, 1), min(30, trans.start() - 1))
        for l in trans.coding_regions().lines:
            seq += self.genome.seq(trans.chr, l.start, l.end - l.start + 1)
        if add_utr_3 and trans.strand == "+":
            utr3 = trans.utr_3prime().lines
            for l in utr3:
                seq += self.genome.seq(trans.chr, l.start, l.end - l.start + 1)
            if not utr3:
                seq += self.genome.seq(trans.chr, trans.end() + 1, 30)
        if trans.strand == "-":
            seq = reverse_complement(seq)
        self._coding_sequence_cache[key] = seq
        return seq

    def _hgvs_protein(self, variant: HgvsVariant, pos_hgvs_c: str, transcript: Transcript) -> str:
        plus_strand = transcript.strand == "+"
        use_mito = variant.chr.is_m()
        hgvs_p = "p."
        start = variant.pos
        end = variant.end
        aa_ref = ""
        aa_obs = ""
        coding_sequence = self.coding_sequence(transcript, True)

        if variant.is_snv():
            pos_trans_start = int(pos_hgvs_c) - 1
            offset = pos_trans_start % 3
            aa_ref = _tl(coding_sequence[pos_trans_start - offset:pos_trans_start - offset + 3], use_mito)
            seq_obs = bytearray(coding_sequence[pos_trans_start - offset:pos_trans_start - offset + 3])
            if plus_strand:
                seq_obs[offset] = variant.alt[0]
            else:
                seq_obs[offset] = reverse_complement(variant.alt)[0]
            seq_obs = bytes(seq_obs)
            aa_obs = _tl(seq_obs, use_mito)
            if aa_obs == aa_ref:
                aa_obs = "="
            elif aa_ref == "Met" and pos_trans_start < 3:
                aa_obs = "?"
            elif aa_ref == "Ter":
                aa_obs += "extTer"
                stop_found = False
                for i in range(pos_trans_start - offset + 3, len(coding_sequence) - 2, 3):
                    if _tl1(coding_sequence[i:i + 3], use_mito) == "*":
                        stop_found = True
                        stop_pos = i - (pos_trans_start - offset)
                        aa_obs += str(stop_pos // 3)
                        break
                if not stop_found:
                    aa_obs += "?"
            aa_ref += str(pos_trans_start // 3 + 1)
        else:
            if variant.is_ins() and pos_hgvs_c == "-1_1":
                return ""
            positions = pos_hgvs_c.split("_")
            pos_trans_start = int(positions[0]) - 1

            if len(positions) == 2 and variant.is_del():
                if _exon_number(transcript, variant.pos + 1, variant.end) == -2:
                    return "p.?"

            # deletion spanning 5' UTR and start of coding region
            if pos_trans_start <= -1:
                pos_trans_end = int(positions[1]) - 1
                if pos_trans_end > 2:
                    return "p.Met1?"
                if plus_strand:
                    if variant.is_del():
                        new_start = self.genome.seq(variant.chr, variant.pos - pos_trans_end, pos_trans_end + 1)
                    else:
                        new_start = variant.alt[-(pos_trans_end + 1):]
                else:
                    if variant.is_del():
                        new_start = self.genome.seq(variant.chr, variant.end + pos_trans_end + 1, pos_trans_end + 1)
                    else:
                        new_start = variant.alt[1:pos_trans_end + 2]
                    new_start = reverse_complement(new_start)
                if new_start == coding_sequence[:pos_trans_end + 1]:
                    return "p.Met1="
                return "p.Met1?"

            offset = pos_trans_start % 3
            frame_diff = (end - start) if variant.is_del() else len(variant.alt) - len(variant.ref)
            pos_shift = 0

            seq_ref = coding_sequence[pos_trans_start - offset:]
            if variant.is_del():
                seq_obs = seq_ref[:offset] + seq_ref[offset + frame_diff:]
            elif variant.is_ins():
                alt = variant.alt[1:]
                if not plus_strand:
                    alt = reverse_complement(alt)
                seq_obs = seq_ref[:offset + 1] + alt + seq_ref[offset + 1:]
            else:  # indel
                alt = variant.alt[1:]
                if not plus_strand:
                    alt = reverse_complement(alt)
                seq_obs = seq_ref[:offset] + alt + seq_ref[offset + len(variant.ref) - 1:]

            if variant.is_del() or (variant.is_ins() and frame_diff % 3 != 0) or variant.is_indel():
                while aa_obs == aa_ref and aa_obs != "Ter" and aa_ref != "Ter":
                    aa_ref = _tl(seq_ref[:3], use_mito)
                    aa_obs = _tl(seq_obs[:3], use_mito)
                    if aa_obs == aa_ref and aa_obs != "Ter":
                        seq_obs = seq_obs[3:]
                        seq_ref = seq_ref[3:]
                        pos_shift += 3
                aa_ref += str((pos_trans_start + pos_shift) // 3 + 1)
            elif variant.is_ins():
                aa_ref_next = ""
                aa_obs_next = ""
                while (aa_obs == aa_ref and aa_obs_next == aa_ref_next
                       and aa_obs != "Ter" and aa_ref != "Ter"):
                    aa_ref = _tl(seq_ref[:3], use_mito)
                    aa_obs = _tl(seq_obs[:3], use_mito)
                    aa_ref_next = _tl(seq_ref[3:6], use_mito)
                    aa_obs_next = _tl(seq_obs[3:6], use_mito)
                    if aa_obs == aa_ref and aa_obs_next == aa_ref_next and aa_obs != "Ter":
                        seq_obs = seq_obs[3:]
                        seq_ref = seq_ref[3:]
                        pos_shift += 3
                diff = 3 if aa_obs == aa_ref else 0
                aa_ref_after = _tl(seq_ref[diff:diff + 3], use_mito)
                aa_obs_after = _tl(seq_obs[diff + frame_diff:diff + frame_diff + 3], use_mito)
                inserted_sequence = self._translate(seq_obs[diff:diff + frame_diff])
                left_sequence = ""
                if pos_trans_start + pos_shift - offset - frame_diff > 0:
                    left_sequence = self._translate(
                        coding_sequence[pos_trans_start + pos_shift - offset - frame_diff + diff:
                                        pos_trans_start + pos_shift - offset + diff])
                if inserted_sequence == left_sequence:
                    aa_ref = left_sequence[:3]
                    aa_ref += str((pos_trans_start + pos_shift - offset - frame_diff + diff) // 3 + 1)
                    if len(left_sequence) > 3:
                        aa_ref += "_" + left_sequence[-3:]
                        aa_ref += str((pos_trans_start + pos_shift - offset + diff) // 3)
                    aa_obs = "dup"
                elif aa_obs == aa_ref and aa_obs_after == aa_ref_after:
                    aa_ref += str((pos_trans_start + pos_shift) // 3 + 1)
                    aa_ref += "_" + _tl(seq_ref[3:6]) + str((pos_trans_start + pos_shift) // 3 + 2)
                    aa_obs = "ins" + inserted_sequence
                elif aa_obs_after == aa_ref and pos_trans_start + pos_shift - offset > 2:
                    aa_ref = (self._translate(coding_sequence[pos_trans_start + pos_shift - offset - 3:
                                                              pos_trans_start + pos_shift - offset])
                              + str((pos_trans_start + pos_shift) // 3)
                              + "_" + aa_ref + str((pos_trans_start + pos_shift) // 3 + 1))
                    aa_obs = "ins" + inserted_sequence
                else:
                    if aa_ref == "Ter":
                        aa_obs += "extTer"
                        stop_found = False
                        for i in range(3, len(seq_obs) - 2, 3):
                            if _tl1(seq_obs[i:i + 3], use_mito) == "*":
                                stop_found = True
                                aa_obs += str(i // 3)
                                break
                        if not stop_found:
                            aa_obs += "?"
                    else:
                        aa_obs = "delins" + self._translate(seq_obs[:3 + frame_diff])
                    aa_ref += str((pos_trans_start + pos_shift) // 3 + 1)
            else:
                aa_ref += str((pos_trans_start + pos_shift) // 3 + 1)

            if frame_diff % 3 != 0:
                # frameshift
                if aa_ref == "Met1":
                    aa_obs = "?"
                elif aa_obs != "Ter":
                    aa_obs = aa_obs + "fsTer"
                    stop_found = False
                    for i in range(3, len(seq_obs) - 2, 3):
                        if _tl1(seq_obs[i:i + 3], use_mito) == "*":
                            stop_found = True
                            aa_obs += str(i // 3 + 1)
                            break
                    if not stop_found:
                        aa_obs += "?"
            elif variant.is_del():
                # inframe deletion
                if frame_diff > 3 or aa_obs != _tl(seq_ref[frame_diff:frame_diff + 3]):
                    deletion_length = frame_diff
                    aa_ref += "_"
                    if aa_obs == _tl(seq_ref[frame_diff:frame_diff + 3]):
                        pos_shift -= 3
                    else:
                        deletion_length += 3
                    deleted_aa_seq = self._translate(seq_ref[:deletion_length], use_mito, True)
                    if deleted_aa_seq.endswith("Ter"):
                        aa_ref += "Ter" + str((pos_trans_start + pos_shift + len(deleted_aa_seq)) // 3 + 1)
                    else:
                        aa_ref += _tl(coding_sequence[pos_trans_start - offset + pos_shift + frame_diff:
                                                      pos_trans_start - offset + pos_shift + frame_diff + 3], use_mito)
                        aa_ref += str((pos_trans_start + pos_shift + frame_diff) // 3 + 1)
                if aa_ref.startswith("Ter"):
                    aa_obs += "extTer"
                    stop_found = False
                    for i in range(3, len(seq_obs) - 2, 3):
                        if _tl1(seq_obs[i:i + 3], use_mito) == "*":
                            stop_found = True
                            aa_obs += str(i // 3 + 1)
                            break
                    if not stop_found:
                        aa_obs += "?"
                elif aa_obs != _tl(seq_ref[frame_diff:frame_diff + 3]):
                    aa_obs = "delins" + aa_obs
                else:
                    aa_obs = "del"
            elif not variant.is_ins() and len(variant.ref) > 4 + pos_shift:
                # inframe deletion-insertion, more than one amino acid deleted
                offset_end = (offset + len(variant.ref) - 1) % 3
                aa_ref += "_"
                if plus_strand:
                    aa_ref += _tl(self.genome.seq(variant.chr, end - offset_end, 3), use_mito)
                else:
                    aa_ref += _tl(reverse_complement(self.genome.seq(variant.chr, start - 2 + offset_end, 3)), use_mito)
                aa_ref += str((pos_trans_start + len(variant.ref) - pos_shift - 1) // 3 + 1)
                if len(variant.alt) > 4 + pos_shift:
                    aa_obs = "delins" + self._translate(seq_obs[:len(variant.alt) - pos_shift])
                else:
                    aa_obs = "delins" + aa_obs
            elif not variant.is_ins() and len(variant.alt) > 4 + pos_shift:
                # inframe deletion-insertion, more than one amino acid inserted
                aa_obs = "delins" + self._translate(seq_obs[:len(variant.alt) - pos_shift])

        return hgvs_p + aa_ref + aa_obs

    @staticmethod
    def _annotate_prot_seq_csq_snv(hgvs: VariantConsequence):
        if hgvs.hgvs_p.endswith("="):
            hgvs.types.add("SYNONYMOUS_VARIANT")
            if "Ter" in hgvs.hgvs_p:
                hgvs.types.add("STOP_RETAINED_VARIANT")
            elif hgvs.hgvs_p == "p.Met1=":
                hgvs.types.add("START_RETAINED_VARIANT")
            return
        hgvs.types.add("PROTEIN_ALTERING_VARIANT")
        if hgvs.hgvs_p == "p.Met1?":
            hgvs.types.add("START_LOST")
        elif hgvs.hgvs_p.endswith("Ter"):
            hgvs.types.add("STOP_GAINED")
        elif "Ter" in hgvs.hgvs_p:
            hgvs.types.add("STOP_LOST")
        else:
            hgvs.types.add("MISSENSE_VARIANT")

    def _annotate_splice_region(self, hgvs, transcript, start, end, insertion):
        plus_strand = transcript.strand == "+"
        lines = transcript.regions.lines
        n = len(lines)
        for i, reg in enumerate(lines):
            # 5' splice region (beginning of exon)
            if (plus_strand and i != 0) or (not plus_strand and i != n - 1):
                if plus_strand:
                    r_start = reg.start - self.splice_region_in_5
                    r_end = reg.start + self.splice_region_ex - 1
                    acc_start, acc_end = reg.start - 2, reg.start - 1
                else:
                    r_start = reg.end - self.splice_region_ex + 1
                    r_end = reg.end + self.splice_region_in_5
                    acc_start, acc_end = reg.end + 1, reg.end + 2
                if not insertion:
                    if _range_overlaps(start, end, r_start, r_end):
                        hgvs.types.add("SPLICE_REGION_VARIANT")
                        if _range_overlaps(start, end, acc_start, acc_end):
                            hgvs.types.add("SPLICE_ACCEPTOR_VARIANT")
                else:
                    if _range_overlaps(start, start + 1, r_start + 1, r_end - 1):
                        hgvs.types.add("SPLICE_REGION_VARIANT")
                        if start == acc_start:
                            hgvs.types.add("SPLICE_ACCEPTOR_VARIANT")
            # 3' splice region (end of exon)
            if (plus_strand and i != n - 1) or (not plus_strand and i != 0):
                if plus_strand:
                    r_start = reg.end - self.splice_region_ex + 1
                    r_end = reg.end + self.splice_region_in_3
                    don_start, don_end = reg.end + 1, reg.end + 2
                else:
                    r_start = reg.start - self.splice_region_in_3
                    r_end = reg.start + self.splice_region_ex - 1
                    don_start, don_end = reg.start - 2, reg.start - 1
                if not insertion:
                    if _range_overlaps(start, end, r_start, r_end):
                        hgvs.types.add("SPLICE_REGION_VARIANT")
                        if _range_overlaps(start, end, don_start, don_end):
                            hgvs.types.add("SPLICE_DONOR_VARIANT")
                else:
                    if _range_overlaps(start, start + 1, r_start + 1, r_end - 1):
                        hgvs.types.add("SPLICE_REGION_VARIANT")
                        if start == don_start:
                            hgvs.types.add("SPLICE_DONOR_VARIANT")
            if transcript.is_coding() and ("SPLICE_DONOR_VARIANT" in hgvs.types
                                           or "SPLICE_ACCEPTOR_VARIANT" in hgvs.types):
                hgvs.hgvs_p = "p.?"

    @staticmethod
    def _annotate_exon_intron_number(hgvs, transcript, variant):
        lines = transcript.regions.lines
        n = len(lines)
        plus_strand = transcript.strand == "+"
        insertion = variant.is_ins()
        start = variant.pos
        end = variant.end
        if variant.is_del() or variant.is_indel():
            start += 1
        # exon number
        if plus_strand:
            for i in range(n):
                if ((not insertion and _range_overlaps(start, end, lines[i].start, lines[i].end))
                        or (insertion and _range_overlaps(start, start + 1, lines[i].start, lines[i].end))):
                    hgvs.exon_number = i + 1
                    break
        else:
            for i in range(n - 1, -1, -1):
                if ((not insertion and _range_overlaps(start, end, lines[i].start, lines[i].end))
                        or (insertion and _range_overlaps(start, start + 1, lines[i].start, lines[i].end))):
                    hgvs.exon_number = n - i
                    break
        # intron number
        if plus_strand:
            for i in range(n - 1):
                if ((not insertion and _range_overlaps(start, end, lines[i].end + 1, lines[i + 1].start - 1))
                        or (insertion and _range_overlaps(start, start + 1, lines[i].end + 2, lines[i + 1].start - 2))):
                    hgvs.intron_number = i + 1
                    break
        else:
            for i in range(n - 2, -1, -1):
                if ((not insertion and _range_overlaps(start, end, lines[i].end + 1, lines[i + 1].start - 1))
                        or (insertion and _range_overlaps(start, start + 1, lines[i].end + 2, lines[i + 1].start - 2))):
                    hgvs.intron_number = n - i - 1
                    break


def _exon_number(transcript: Transcript, start: int, end: int) -> int:
    """Transcript::exonNumber — strand-aware 1-based exon number; -1 none, -2 several."""
    matches = set()
    lines = transcript.regions.lines
    n = len(lines)
    for i in range(n):
        if lines[i].start <= end and start <= lines[i].end:
            matches.add(i + 1 if transcript.strand == "+" else n - i)
    if not matches:
        return -1
    if len(matches) > 1:
        return -2
    return matches.pop()
