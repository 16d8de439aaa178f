"""VcfAnnotateConsequence — transcript-specific consequence prediction (CSQ).

Behavioral reference: ngs-bits src/VcfAnnotateConsequence/{main.cpp,
ChunkProcessor.cpp} + cppNGS/VariantHgvsAnnotator.cpp (see core/hgvs.py).
The reference splits the VCF into chunks for multithreading; output is
order-preserving, so a sequential loop produces identical files.
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdin_binary, stdout_binary

from ..core.chromosome import Chromosome
from ..core.hgvs import HgvsVariant, VariantHgvsAnnotator, consequence_type_to_impact, TYPE_STRINGS
from ..core.intervals import BedFile, BedLine, ChromosomalIndex
from ..core.transcripts import load_gff3
from ..io.fasta import FastaFileIndex
from .toolbase import ToolBase, ToolError

_ACGT = frozenset(b"ACGT")


def _only_acgt(seq: bytes) -> bool:
    return len(seq) > 0 and all(c in _ACGT for c in seq)


def _csq_allele(ref: bytes, alt: bytes) -> bytes:
    """ChunkProcessor::csqAllele."""
    if len(alt) == 1 and len(ref) > 1:
        return b"-"
    if ref[0] == alt[0]:
        return alt[1:]
    return alt


class VcfAnnotateConsequenceTool(ToolBase):
    name = "VcfAnnotateConsequence"
    description = "Adds transcript-specific consequence predictions to a VCF file."

    def setup(self):
        self.add_infile("in", "Input VCF file to annotate.")
        self.add_infile("gff", "Ensembl-style GFF file with transcripts, e.g. from https://ftp.ensembl.org/pub/release-115/gff3/homo_sapiens/Homo_sapiens.GRCh38.115.gff3.gz.")
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_outfile("out", "Output VCF file annotated with predicted consequences for each variant.")
        self.add_int("threads", "The number of threads used to read, process and write files.", optional=True, default=1)
        self.add_int("block_size", "Number of lines processed in one chunk.", optional=True, default=5000)
        self.add_int("prefetch", "Maximum number of blocks that may be pre-fetched into memory.", optional=True, default=64)
        self.add_flag("all", "If set, all transcripts are used for annotation. The default is to skip transcripts not labeled with 'gencode_basic' and not labeled with 'RefSeq'/'BestRefSeq' origin for Refseq.")
        self.add_flag("skip_not_hgnc", "Skip genes that do not have a HGNC identifier.")
        self.add_string("tag", "Tag that is used for the consequence annotation.", optional=True, default="CSQ")
        self.add_int("max_dist_to_trans", "Maximum distance between variant and transcript.", optional=True, default=5000)
        self.add_int("splice_region_ex", "Number of bases at exon boundaries that are considered to be part of the splice region.", optional=True, default=3)
        self.add_int("splice_region_in5", "Number of bases at intron boundaries (5') that are considered to be part of the splice region.", optional=True, default=20)
        self.add_int("splice_region_in3", "Number of bases at intron boundaries (3') that are considered to be part of the splice region.", optional=True, default=20)
        self.add_enum("source", "GFF source.", optional=True, valid=("ensembl", "refseq"), default="ensembl")
        self.add_flag("debug", "Enable debug output")

    def main(self):
        ref_file = self.get_infile("ref")
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        max_dist = self.get_int("max_dist_to_trans")
        sr_ex = self.get_int("splice_region_ex")
        sr_in5 = self.get_int("splice_region_in5")
        sr_in3 = self.get_int("splice_region_in3")
        if max_dist <= 0 or sr_ex <= 0 or sr_in5 <= 0 or sr_in3 <= 0:
            raise ToolError("Distance to transcript and splice region parameters must be >= 1!")
        tag = self.get_string("tag").encode()

        data = load_gff3(self.get_infile("gff"), include_all=self.get_flag("all"),
                         skip_not_hgnc=self.get_flag("skip_not_hgnc"),
                         source=self.get_enum("source"))
        transcripts = sorted(
            data.transcripts,
            key=lambda t: (t.chr.num if t.chr.num is not None else 1 << 30, t.start(), t.end(), t.name))
        spans = BedFile()
        for t in transcripts:
            spans.append(BedLine(t.chr, t.start(), t.end()))
        index = ChromosomalIndex(spans) if len(spans) else None

        genome = FastaFileIndex(ref_file)
        annotator = VariantHgvsAnnotator(genome, max_dist, sr_ex, sr_in5, sr_in3)

        in_path = self.get_infile("in")
        out_path = self.get_outfile("out")
        fh_in = open(in_path, "rb") if in_path else stdin_binary()
        out = open(out_path, "wb") if out_path else stdout_binary()
        body = []
        for raw in fh_in:
            line = raw.strip()
            if not line:
                continue
            if line.startswith(b"#"):
                if line.startswith(b"##INFO=<ID=" + tag + b","):
                    continue
                if line.startswith(b"#CHROM"):
                    out.write(b"##INFO=<ID=" + tag + b",Number=.,Type=String,"
                              b'Description="Consequence annotations from VcfAnnotateConsequence. '
                              b'Format: Allele|Consequence|IMPACT|SYMBOL|HGNC_ID|Feature|Feature_type|EXON|INTRON|HGVSc|HGVSp">\n')
                out.write(line + b"\n")
                continue
            body.append(line)
        # chunk-parallel annotation (the reference's ChunkProcessor pool),
        # ordered — byte-identical to a sequential pass
        from ..utils.chunkpool import process_chunks

        def annotate_chunk(chunk, st):
            ann, trs, idx, tg, md = st
            return [self._annotate_line(l, ann, trs, idx, tg, md) for l in chunk]

        for piece in process_chunks(
                body, annotate_chunk,
                (annotator, transcripts, index, tag, max_dist),
                self.get_int("threads"), self.get_int("block_size")):
            out.write(piece)
        if in_path:
            fh_in.close()
        if out_path:
            out.close()

    def _annotate_line(self, line, annotator, transcripts, index, tag, max_dist):
        parts = line.split(b"\t")
        if len(parts) < 8:
            raise ToolError("VCF line with too few columns: " + line.decode())
        chrom = Chromosome(parts[0])
        pos = int(parts[1])
        ref = parts[3].upper()
        alt = parts[4].upper()

        alts = alt.split(b",")
        valid = (chrom.is_valid() and pos >= 0 and _only_acgt(ref)
                 and all(_only_acgt(a) or a == b"<NON_REF>" for a in alts))
        if not valid:
            return line + b"\n"

        region_start = max(pos - max_dist, 0)
        region_end = pos + len(ref) + max_dist
        indices = index.matching_indices(chrom, region_start, region_end - 1) if index is not None else []

        consequences = []
        if len(indices) == 0:
            for alt_part in alts:
                consequences.append(self._csq_string(_csq_allele(ref, alt_part),
                                                     {"INTERGENIC_VARIANT"}, "MODIFIER",
                                                     None, None))
        for idx in indices:
            t = transcripts[idx]
            for alt_part in alts:
                try:
                    hgvs = annotator.annotate(t, HgvsVariant(chrom, pos, ref, alt_part))
                    consequences.append(self._csq_string(_csq_allele(ref, alt_part),
                                                         None, None, hgvs, t))
                except Exception as e:
                    sys.stdout.write(f"Error processing variant {chrom.str_normalized(True)}:{pos} "
                                     f"{ref.decode()}>{alt_part.decode()} and transcript {t.name_with_version()}:\n")
                    sys.stdout.write(f"  {e}\n")

        info_entries = parts[7].split(b";") if parts[7] not in (b"", b".") else []
        tag_found = False
        for i, entry in enumerate(info_entries):
            if entry.startswith(tag + b"="):
                info_entries[i] = tag + b"=" + b",".join(consequences)
                tag_found = True
                break
        if not tag_found:
            info_entries.append(tag + b"=" + b",".join(consequences))

        new_parts = [parts[0], str(pos).encode(), parts[2], ref, alt, parts[5], parts[6],
                     b";".join(info_entries)] + parts[8:]
        return b"\t".join(new_parts) + b"\n"

    @staticmethod
    def _csq_string(allele: bytes, types, impact, hgvs, t) -> bytes:
        """ChunkProcessor::hgvsNomenclatureToString."""
        out = [allele.decode()]
        if hgvs is not None:
            out.append(hgvs.types_to_string_simplified())
            out.append(hgvs.impact)
        else:
            out.append(TYPE_STRINGS["INTERGENIC_VARIANT"])
            out.append(impact)
        if t is not None:
            out += [t.gene, t.hgnc_id, t.name_with_version(), "Transcript"]
        else:
            out += ["", "", "", ""]
        if hgvs is not None and hgvs.exon_number != -1:
            out.append(f"{hgvs.exon_number}/{len(t.regions)}")
        else:
            out.append("")
        if hgvs is not None and hgvs.intron_number != -1:
            out.append(f"{hgvs.intron_number}/{len(t.regions) - 1}")
        else:
            out.append("")
        out.append(hgvs.hgvs_c if hgvs is not None else "")
        hgvs_p = hgvs.hgvs_p if hgvs is not None else ""
        out.append(hgvs_p.replace("=", "%3D"))
        return "|".join(out).encode()


TOOLS = {
    "VcfAnnotateConsequence": VcfAnnotateConsequenceTool,
}
