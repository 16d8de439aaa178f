"""Genome + transcript data bundle for visualization.

Behavioral reference: cppVISUAL/GenomeData.{h,cpp} — FastaFileIndex for the
genome, a TranscriptList and a ChromosomalIndex over it for fast
position-based lookup.
"""

from __future__ import annotations

import numpy as np

from ..core.chromosome import Chromosome
from ..io.fasta import FastaFileIndex


class GenomeData:
    """Genome index + transcripts + positional transcript index
    (GenomeData.h:11-41)."""

    def __init__(self, genome_fasta: str):
        self._genome = FastaFileIndex(genome_fasta)
        self.transcripts: list = []
        self._chr_nums = np.empty(0, dtype=np.int64)
        self._starts = np.empty(0, dtype=np.int64)
        self._ends = np.empty(0, dtype=np.int64)

    @property
    def genome(self) -> FastaFileIndex:
        return self._genome

    def set_transcripts(self, transcripts: list):
        """Set transcripts and (re)build the positional index
        (GenomeData::setTranscripts)."""
        self.transcripts = list(transcripts)
        n = len(self.transcripts)
        self._chr_nums = np.fromiter(
            (t.chr.num for t in self.transcripts), dtype=np.int64, count=n)
        self._starts = np.fromiter(
            (t.start() for t in self.transcripts), dtype=np.int64, count=n)
        self._ends = np.fromiter(
            (t.end() for t in self.transcripts), dtype=np.int64, count=n)

    def matching_transcript_indices(self, chr_: Chromosome, start: int,
                                    end: int) -> list[int]:
        """Indices of transcripts overlapping [start, end] on chr, in
        transcript-list order (ChromosomalIndex<TranscriptList> analogue)."""
        if not len(self._starts):
            return []
        mask = ((self._chr_nums == chr_.num)
                & (self._starts <= end) & (self._ends >= start))
        return [int(i) for i in np.flatnonzero(mask)]
