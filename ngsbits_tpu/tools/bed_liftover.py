"""BedLiftOver.

Behavioral reference: ngs-bits src/BedLiftOver/main.cpp — chain-based
lift-over with max_deletion/max_increase cutoffs, unmapped reporting with the
error message, and the LiftOver statistics block on stdout.
"""

from __future__ import annotations

import os
import sys

from ..core.chromosome import Chromosome
from ..io.chain import ChainError, ChainFileReader
from .toolbase import ToolBase, ToolError


class BedLiftOverTool(ToolBase):
    name = "BedLiftOver"
    description = "Lift-over of regions in a BED file to a different genome build."

    def setup(self):
        self.add_infile("in", "Input BED file with the regions to lift.")
        self.add_outfile("out", "The file where the lifted regions will be written to.")
        self.add_outfile("unmapped", "The file where the unmappable regions will be written to.", optional=True)
        self.add_string("chain", "Input Chain file in .chain/.chain.gz format or \"hg19_hg38\" / \"hg38_hg19\" to read from settings file.", optional=True, default="hg19_hg38")
        self.add_int("max_deletion", "Allowed percentage of deleted/unmapped bases in each region.", optional=True, default=5)
        self.add_int("max_increase", "Allowed percentage size increase of a region.", optional=True, default=10)
        self.add_flag("remove_special_chr", "Removes regions that are mapped to special chromosomes.")
        self.add_flag("merged_output", "Output lifted and unlifted regions in the output file, keeping the order of the input regions.")

    def main(self):
        chain = self.get_string("chain")
        max_inc = self.get_int("max_increase")
        max_del = self.get_int("max_deletion")
        remove_special = self.get_flag("remove_special_chr")
        merged_output = self.get_flag("merged_output")
        if not os.path.exists(chain) and "/" not in chain and "\\" not in chain:
            env = os.environ.get("NGSBITS_LIFTOVER_" + chain.upper(), "")
            if not env:
                raise ToolError(f"Chain file for '{chain}' not configured — set NGSBITS_LIFTOVER_{chain.upper()} or pass a chain file path!")
            chain = env
        if max_del < 0 or max_del > 100:
            raise ToolError("Allowed percentage of deleted/unmapped bases can't be smaller than 0 or larger than 100.")
        if max_inc < 0:
            raise ToolError("Allowed maximum size increase of the region can't be negative")

        reader = ChainFileReader(chain, max_del / 100.0)
        lifted = open(self.get_outfile("out"), "w")
        unmapped_path = self.get_outfile("unmapped")
        if merged_output and unmapped_path:
            raise ToolError("Flag 'merged_output' and 'unmapped' outfile cannot be given together. With Flag 'merged_output' all regions are reported in 'out' outfile.")
        unmapped = None
        if unmapped_path:
            unmapped = open(unmapped_path, "w")
        if merged_output:
            unmapped = lifted

        in_count = 0
        in_length = 0
        unlifted_in_length = 0
        lifted_count = 0
        unlifted_count = 0
        lifted_length = 0

        lifted.write(f"#BedLiftOver: Lifted file using '{chain}' \n")
        with open(self.get_infile("in"), "rb") as fh:
            for raw in fh:
                if raw.startswith(b"#") or raw.startswith(b"track ") or raw.startswith(b"browser "):
                    lifted.write(raw.decode())
                    continue
                line = raw.rstrip(b"\r\n")
                if not line:
                    continue
                parts = line.split(b"\t")
                chr_ = Chromosome(parts[0])
                start0 = int(parts[1])
                end = int(parts[2])
                annos = [p.decode() for p in parts[3:]]
                in_count += 1
                length = end - start0
                in_length += length
                try:
                    q_chr, ls, le = reader.lift(chr_, start0 + 1, end)
                    ls -= 1  # back to 0-based
                    if (le - ls) > length + length * (max_inc / 100.0):
                        raise ChainError(f"Region increased in size more than {max_inc}%.")
                    if not q_chr.is_non_special() and remove_special:
                        raise ChainError("Region was mapped to a special chromosome.")
                    row = f"{q_chr.str_normalized(True)}\t{ls}\t{le}"
                    for a in annos:
                        row += "\t" + a
                    lifted.write(row + "\n")
                    lifted_count += 1
                    lifted_length += le - ls
                except ChainError as e:
                    unlifted_count += 1
                    unlifted_in_length += length
                    if unmapped is not None:
                        unmapped.write(f"{chr_.str}:{start0}-{end}\t#Error: {e}\n")

        w = sys.stdout.write
        lifted_in_length = in_length - unlifted_in_length
        w("LiftOver Statistics:\n")
        w(f"Input regions : {in_count}\n")
        w(f"lifted        : {lifted_count} ({100.0 * lifted_count / in_count:.2f}%)\n")
        w(f"unlifted      : {unlifted_count} ({100.0 * unlifted_count / in_count:.2f}%)\n")
        w("\n")
        w(f"Bases input: {in_length}\n")
        w(f"lifted     : {lifted_in_length} ({100.0 * lifted_in_length / in_length:.2f}%)\n")
        w(f"unlifted   : {unlifted_in_length} ({100.0 * unlifted_in_length / in_length:.2f}%)\n")
        w("\n")
        w(f"Bases after lifting: {lifted_length}\n")
        lifted.close()
        if unmapped is not None and unmapped is not lifted:
            unmapped.close()


TOOLS = {
    "BedLiftOver": BedLiftOverTool,
}
