"""Methylation tools: BedToEpigen, ExtractMethylationData.

Behavioral reference: ngs-bits src/BedToEpigen/main.cpp and
src/ExtractMethylationData/main.cpp.
"""

from __future__ import annotations

import gzip
import sys

from ngsbits_tpu.utils.stdio import stdin_binary

from ..core.chromosome import Chromosome
from ..core.intervals import BedFile
from ..io.fasta import FastaFileIndex
from ..io.tabix import TabixIndexedFile
from .toolbase import ToolBase, ToolError


def _open_maybe_gz(path: str):
    fh = open(path, "rb")
    if fh.read(2) == b"\x1f\x8b":
        fh.close()
        return gzip.open(path, "rb")
    fh.seek(0)
    return fh


class BedToEpigenTool(ToolBase):
    name = "BedToEpigen"
    description = "Converts a modkit BED file to a Epigen TSV file."

    def setup(self):
        self.add_infile("id_file", "Input CSV file containing Illumina CpG IDs.")
        self.add_string("sample", "Sample name used in output file header.")
        self.add_infile("in", "Input modkit (bgzipped) BED file. If unset, read from STDIN.", optional=True)
        self.add_outfile("out", "Output FASTA file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        # load CpG IDs (BedToEpigen/main.cpp:32-97)
        cpg_ids: dict[bytes, bytes] = {}
        header_items: dict[bytes, int] = {}
        with open(self.get_infile("id_file"), "rb") as fh:
            for raw in fh:
                line = raw.rstrip(b"\r\n")
                if not line.strip():
                    continue
                if not header_items:
                    if line.startswith(b"IlmnID"):
                        for i, name in enumerate(line.split(b",")):
                            header_items[name] = i
                    continue
                parts = line.split(b",")
                cpg_id = parts[header_items[b"Name"]]
                strand = parts[header_items[b"Strand_FR"]]
                chr_ = Chromosome(parts[header_items[b"CHR"]].decode())
                if not chr_.is_valid():
                    continue
                pos = parts[header_items[b"MAPINFO"]]
                if parts[header_items[b"Species"]] != b"Human":
                    continue
                if parts[header_items[b"Genome_Build"]] != b"GRCh38":
                    continue
                # fix mapping info for reverse CpG
                if strand == b"R":
                    pos = str(int(pos) + 1).encode()
                cpg_ids[chr_.str_normalized(True).encode() + b":" + pos + b"_" + strand] = cpg_id

        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        out.write(f"ID_REF\t{self.get_string('sample')}\n")

        in_path = self.get_infile("in")
        fh = _open_maybe_gz(in_path) if in_path else stdin_binary()
        for raw in fh:
            line = raw.rstrip(b"\r\n")
            if not line or line.startswith(b"#"):
                continue
            parts = line.split(b"\t")
            chr_, pos, type_ = parts[0], parts[2], parts[3]
            if type_ != b"m":
                continue  # ignore non-5mC methylation
            strand = b"F" if parts[5] == b"+" else b"R"
            try:
                frac = float(parts[10]) / 100.0
            except ValueError:
                raise ToolError(f"Could not convert 'Methylation fraction' to double: {parts[10]!r}")
            cpg_id = cpg_ids.get(chr_ + b":" + pos + b"_" + strand, b"")
            if not cpg_id:
                continue
            out.write(f"{cpg_id.decode()}\t{frac:.5f}\n")
        if in_path:
            fh.close()
        if out_path:
            out.close()


def _qt_float(v: float) -> str:
    """QByteArray::number(float) — %g with 6 significant digits."""
    s = f"{v:.6g}"
    return s


class ExtractMethylationDataTool(ToolBase):
    name = "ExtractMethylationData"
    description = "Extracts the methylation state for a given set of loci"

    def setup(self):
        self.add_infile("in", "Tabix indexed BED.GZ file that contains the methylation info for each base (modkit).")
        self.add_infile("loci", "BED file containig position and strand of intrest")
        self.add_outfile("out", "Output BED file containing combined methylation info of provided loci. If unset, writes to STDOUT.", optional=True)
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_flag("add_methylation_types", "Also report 5mC (m) and 5hmC (h) entries as separate columns")
        self.add_flag("skip_invalid_sites", "Skip invalid CpG sites instead of aborting.")

    def main(self):
        ref_file = self.get_infile("ref")
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        add_types = self.get_flag("add_methylation_types")
        skip_invalid = self.get_flag("skip_invalid_sites")

        ref_idx = FastaFileIndex(ref_file)
        meth_idx = TabixIndexedFile(self.get_infile("in"))

        loci = BedFile.from_file(self.get_infile("loci"))
        out = BedFile()
        header = loci.headers[-1].rstrip().split(b"\t")
        header += [b"fraction_modified", b"N_valid_cov", b"N_mod"]
        if add_types:
            header += [b"fraction_modified_5mC", b"N_valid_cov_5mC", b"N_mod_5mC",
                       b"fraction_modified_5hmC", b"N_valid_cov_5hmC", b"N_mod_5hmC"]
        out.headers.append(b"\t".join(header))

        import numpy as np
        for bl in loci:
            if bl.length() != 2:
                if skip_invalid:
                    continue
                raise ToolError(f"A CpG site has to be 2 bp long! {bl.to_string(True)}")
            strand = bytes(bl.annotations[0]).strip()
            if strand not in (b"+", b"-"):
                raise ToolError(f"Strand has to be '+' or '-'! {bl.to_string(True)}")
            pos = bl.start if strand == b"+" else bl.end
            mod_base = b"C" if strand == b"+" else b"G"
            try:
                actual = ref_idx.seq(bl.chr, pos, 1, True)
                if actual != mod_base:
                    if skip_invalid:
                        continue
                    raise ToolError(f"Invalid {mod_base.decode()} position (is actually "
                                    f"{actual.decode()} for CpG site)! {bl.to_string(True)}")
            except ToolError:
                raise
            except Exception as e:
                if skip_invalid:
                    sys.stderr.write(str(e))
                    continue
                raise ToolError(str(e))

            matches = meth_idx.get_matching_lines(bl.chr, pos, pos)
            frac = np.float32(0.0)
            n_valid_cov = -1
            n_mod = 0
            entry_count = 0
            frac_m = np.float32(0.0); cov_m = 0; mod_m = 0
            frac_h = np.float32(0.0); cov_h = 0; mod_h = 0
            for match in matches:
                parts = match.split(b"\t")
                if len(parts) != 10:
                    raise ToolError(f"Invalid number of columns at '{match.decode()}'! "
                                    f"Should be 10 is {len(parts)}")
                if strand != parts[5]:
                    continue
                if parts[3] not in (b"h", b"m"):
                    continue
                mod_parts = parts[9].split(b" ")
                if len(mod_parts) != 9:
                    raise ToolError(f"Invalid number of mod entries at '{match.decode()}'! "
                                    f"Should be 9 is {len(mod_parts)}")
                cur_cov = int(mod_parts[0])
                if n_valid_cov == -1:
                    n_valid_cov = cur_cov
                elif n_valid_cov != cur_cov:
                    raise ToolError(f"Mismatch in 'N_valid_cov' count at '{match.decode()}'!")
                cur_frac = np.float32(float(mod_parts[1]))
                frac = np.float32(frac + cur_frac)
                cur_mod = int(mod_parts[2])
                n_mod += cur_mod
                if add_types:
                    if parts[3] == b"m":
                        frac_m, cov_m, mod_m = cur_frac, cur_cov, cur_mod
                    else:
                        frac_h, cov_h, mod_h = cur_frac, cur_cov, cur_mod
                entry_count += 1

            annos = list(bl.annotations)
            if entry_count in (1, 2):
                annos += [_qt_float(float(frac)).encode(),
                          str(n_valid_cov).encode(), str(n_mod).encode()]
            elif entry_count == 0:
                annos += [b"", b"", b""]
            else:
                raise ToolError(f"Invalid entry count {entry_count} (should be 2)!")
            if add_types:
                annos += [_qt_float(float(frac_m)).encode(), str(cov_m).encode(), str(mod_m).encode(),
                          _qt_float(float(frac_h)).encode(), str(cov_h).encode(), str(mod_h).encode()]
            new_line = type(bl)(bl.chr, bl.start, bl.end, annos)
            out.append(new_line)

        out.store(self.get_outfile("out") or None)


TOOLS = {
    "BedToEpigen": BedToEpigenTool,
    "ExtractMethylationData": ExtractMethylationDataTool,
}
