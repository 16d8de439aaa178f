"""NGSDImportClinvarAccessions — import ClinVar accession IDs for published variants.

Behavioral reference: ngs-bits src/NGSDImportClinvarAccessions/main.cpp.
Parses ClinVar XML-upload submission log files, lifts each un-accessioned
NGSD variant_publication variant from hg38 to hg19 (the coordinate system of
the log's SequenceLocation), matches it against the log entries, and stores
'processed;<accession>' + the submission id.

Settings adaptation: the reference reads reference_genome / reference_genome_hg19
and liftover_hg38_hg19 from settings.ini; here they come from the environment
variables NGSBITS_REFERENCE_GENOME, NGSBITS_REFERENCE_GENOME_HG19 and
NGSBITS_LIFTOVER_HG38_HG19.
"""

from __future__ import annotations

import os

from ..core.chromosome import Chromosome
from ..io.chain import ChainFileReader
from ..io.fasta import FastaFileIndex, reverse_complement
from ..ngsd import NGSD
from .ngsd_export_annotation import _to_vcf
from .toolbase import ToolBase, ToolError


def _setting(name: str) -> str:
    value = os.environ.get("NGSBITS_" + name.upper(), "")
    if not value:
        raise ToolError(f"Settings value '{name}' not set — export NGSBITS_{name.upper()}!")
    return value


class NGSDImportClinvarAccessionsTool(ToolBase):
    name = "NGSDImportClinvarAccessions"
    description = "Imports accession IDs for published variants"

    def setup(self):
        self.add_infile_list("in", "Submission log files of the ClinVar XML upload containing the accession ID")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        input_files = self.get_infile_list("in")
        genome_hg19 = FastaFileIndex(_setting("reference_genome_hg19"))
        self._genome_hg38 = FastaFileIndex(_setting("reference_genome"))
        self._chain = None

        accession_ids: dict[str, tuple[str, str]] = {}
        for file_path in input_files:
            submission_id = os.path.basename(file_path).split("_")[0]
            var_idx = -1
            with open(file_path) as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if line.startswith("#"):
                        if line.startswith("#Your_variant_id\t"):
                            header_items = line.split("\t")
                            if "Your_variant_description" in header_items:
                                var_idx = header_items.index("Your_variant_description")
                            elif "Your_variant_description_chromosome_coordinates" in header_items:
                                var_idx = header_items.index("Your_variant_description_chromosome_coordinates")
                            else:
                                raise ToolError("Cannot find info column for variant coordinates! 1 " + submission_id)
                        continue
                    if var_idx < 0:
                        raise ToolError("Cannot find info column for variant coordinates! " + submission_id)
                    parts = line.split("\t")
                    accession_id = parts[4]
                    if "." in accession_id:
                        accession_id = accession_id.split(".")[0]  # remove version

                    variant_parts = parts[var_idx].replace("<", "").replace("/>", "").split(" ")
                    chrom = Chromosome("chr" + variant_parts[2].split("=")[1].replace('"', "").strip())
                    pos = int(variant_parts[5].split("=")[1].replace('"', "").strip())
                    ref = variant_parts[4].split("=")[1].replace('"', "").strip()
                    obs = variant_parts[3].split("=")[1].replace('"', "").strip()

                    key = f"{chrom.str_normalized(True)}:{pos} {ref}>{obs}"
                    accession_ids[key] = (submission_id, accession_id)

        # all published ClinVar variants without accession
        pub_var_ids = db.get_values(
            "SELECT id FROM variant_publication WHERE db='ClinVar' AND result IS NULL")
        n_match_found = 0
        n_no_match = 0
        for pub_var_id in pub_var_ids:
            var_id = db.get_value(
                "SELECT variant_id FROM variant_publication WHERE id=?",
                no_value_is_ok=False, params=(pub_var_id,))
            chrom, start, end, ref, obs = db.get_rows(
                "SELECT chr, start, end, ref, obs FROM variant WHERE id=?", params=(var_id,))[0]
            c2, s2, _e2, ref2, obs2 = self._lift_over_variant(
                Chromosome(chrom), int(start), int(end), ref, obs, genome_hg19)

            vcf_pos, vcf_ref, vcf_obs = _to_vcf(genome_hg19, c2, s2, ref2, obs2)
            vcf_string = f"{c2.str_normalized(True)}:{vcf_pos} {vcf_ref}>{vcf_obs}"

            if vcf_string in accession_ids:
                submission_id, accession_id = accession_ids[vcf_string]
                n_match_found += 1
                db.execute("UPDATE variant_publication SET result=? WHERE id=? AND variant_id=?",
                           ("processed;" + accession_id, pub_var_id, var_id))
                details = str(db.get_value(
                    "SELECT details FROM variant_publication WHERE id=?",
                    no_value_is_ok=False, params=(pub_var_id,)))
                details = f"submission_id={submission_id};{details}"
                db.execute("UPDATE variant_publication SET details=? WHERE id=? AND variant_id=?",
                           (details, pub_var_id, var_id))
                db.commit()
            else:
                n_no_match += 1

        db.close()

    def _lift_over(self, chrom: Chromosome, start: int, end: int):
        """main.cpp liftOver — hg38->hg19 region lift with chrMT passthrough."""
        if chrom.str_normalized(True) == "chrMT":
            return chrom, start, end
        if self._chain is None:
            self._chain = ChainFileReader(_setting("liftover_hg38_hg19"), 0.05)
        return self._chain.lift(chrom, start, end)

    def _lift_over_variant(self, chrom: Chromosome, start: int, end: int, ref: str, obs: str,
                           genome_hg19: FastaFileIndex):
        """main.cpp liftOverVariant (hg19_to_hg38=false path)."""
        c2, s2, e2 = self._lift_over(chrom, start, end)
        if chrom.is_non_special() and not c2.is_non_special():
            raise ToolError("Chromosome changed to special chromosome: "
                            f"{chrom.str_normalized(True)} > {c2.str_normalized(True)}")

        # check sequence context is the same
        context_length = 10 + len(ref)  # '-' counts 1, as in Variant::ref().length()
        context_old = self._genome_hg38.seq(chrom, start - 5, context_length)
        context_new = genome_hg19.seq(c2, s2 - 5, context_length)
        if context_old == context_new:
            return c2, s2, e2, ref, obs
        # check if strand changed, e.g. in NIPA1, GDF2, ANKRD35, TPTE, ...
        if context_old == reverse_complement(context_new):
            ref2 = ref if ref == "-" else reverse_complement(ref.encode()).decode()
            obs2 = obs if obs == "-" else reverse_complement(obs.encode()).decode()
            return c2, s2, e2, ref2, obs2
        raise ToolError(f"Sequence context of variant changed: {context_old.decode()} > "
                        f"{context_new.decode()}")


TOOLS = {
    "NGSDImportClinvarAccessions": NGSDImportClinvarAccessionsTool,
}
