"""CLI tools mirroring the ngs-bits tool surface.

Each tool is a ``ToolBase`` subclass registered in ``REGISTRY`` and invoked as
``python -m ngsbits_tpu <ToolName> [args]`` (or via the ``ngs-bits-tpu``
dispatcher script).
"""

from __future__ import annotations

import importlib

# ToolName -> module path (lazy import keeps CLI startup fast)
TOOL_MODULES = {
    "ReadQC": "ngsbits_tpu.tools.read_qc",
    "MappingQC": "ngsbits_tpu.tools.mapping_qc",
    "VariantQC": "ngsbits_tpu.tools.variant_qc",
    "SeqPurge": "ngsbits_tpu.tools.seq_purge",
    "SampleSimilarity": "ngsbits_tpu.tools.sample_similarity",
    "SampleGender": "ngsbits_tpu.tools.sample_gender",
    "SampleAncestry": "ngsbits_tpu.tools.sample_ancestry",
    "RohHunter": "ngsbits_tpu.tools.roh_hunter",
    "BedCoverage": "ngsbits_tpu.tools.coverage_tools",
    "BedLowCoverage": "ngsbits_tpu.tools.coverage_tools",
    "BedHighCoverage": "ngsbits_tpu.tools.coverage_tools",
    "BedReadCount": "ngsbits_tpu.tools.coverage_tools",
    "BedAdd": "ngsbits_tpu.tools.bed_tools",
    "BedMerge": "ngsbits_tpu.tools.bed_tools",
    "BedSort": "ngsbits_tpu.tools.bed_tools",
    "BedExtend": "ngsbits_tpu.tools.bed_tools",
    "BedShrink": "ngsbits_tpu.tools.bed_tools",
    "BedSubtract": "ngsbits_tpu.tools.bed_tools",
    "BedIntersect": "ngsbits_tpu.tools.bed_tools",
    "BedChunk": "ngsbits_tpu.tools.bed_tools",
    "BedInfo": "ngsbits_tpu.tools.bed_tools",
    "BedAnnotateGC": "ngsbits_tpu.tools.bed_tools",
    "BedToFasta": "ngsbits_tpu.tools.bed_tools",
    "FastqList": "ngsbits_tpu.tools.fastq_tools",
    "FastqExtract": "ngsbits_tpu.tools.fastq_tools",
    "FastqConcat": "ngsbits_tpu.tools.fastq_tools",
    "FastqToFasta": "ngsbits_tpu.tools.fastq_tools",
    "FastqFormat": "ngsbits_tpu.tools.fastq_tools",
    "FastqTrim": "ngsbits_tpu.tools.fastq_tools",
    "FastqConvert": "ngsbits_tpu.tools.fastq_tools",
    "FastqDownsample": "ngsbits_tpu.tools.fastq_tools",
    "FastqExtractBarcode": "ngsbits_tpu.tools.fastq_tools",
    "FastqExtractUMI": "ngsbits_tpu.tools.fastq_tools",
    "FastqAddBarcode": "ngsbits_tpu.tools.fastq_tools",
    "FastqMidParser": "ngsbits_tpu.tools.fastq_tools",
    "FastqCheckUMI": "ngsbits_tpu.tools.fastq_tools",
    "VcfCheck": "ngsbits_tpu.tools.vcf_tools",
    "VcfSort": "ngsbits_tpu.tools.vcf_tools",
    "VcfLeftNormalize": "ngsbits_tpu.tools.vcf_tools",
    "VcfToTsv": "ngsbits_tpu.tools.vcf_tools",
    "VcfToBed": "ngsbits_tpu.tools.vcf_tools",
    "VcfFilter": "ngsbits_tpu.tools.vcf_tools",
    "VcfBreakMulti": "ngsbits_tpu.tools.vcf_tools",
    "VcfStreamSort": "ngsbits_tpu.tools.vcf_tools",
    "VcfExtractSamples": "ngsbits_tpu.tools.vcf_tools",
    "VcfStrip": "ngsbits_tpu.tools.vcf_tools",
    "VcfAdd": "ngsbits_tpu.tools.vcf_tools",
    "VcfSubtract": "ngsbits_tpu.tools.vcf_tools",
    "BamInfo": "ngsbits_tpu.tools.bam_tools",
    "BamDownsample": "ngsbits_tpu.tools.bam_tools",
    "BamFilter": "ngsbits_tpu.tools.bam_tools",
    "BamExtract": "ngsbits_tpu.tools.bam_tools",
    "BamToFastq": "ngsbits_tpu.tools.bam_tools",
    "FastaInfo": "ngsbits_tpu.tools.fasta_tools",
    "FastaMask": "ngsbits_tpu.tools.fasta_tools",
    "FastaFromBam": "ngsbits_tpu.tools.fasta_tools",
    "SomaticQC": "ngsbits_tpu.tools.somatic_qc",
    "RnaQC": "ngsbits_tpu.tools.rna_qc",
    "CfDnaQC": "ngsbits_tpu.tools.cfdna_qc",
    "BedpeSort": "ngsbits_tpu.tools.bedpe_tools",
    "BedpeToBed": "ngsbits_tpu.tools.bedpe_tools",
    "BedpeFilter": "ngsbits_tpu.tools.bedpe_tools",
    "BedpeAnnotateFromBed": "ngsbits_tpu.tools.bedpe_tools",
    "BedpeExtractGenotype": "ngsbits_tpu.tools.bedpe_tools",
    "BedpeExtractInfoField": "ngsbits_tpu.tools.bedpe_tools",
    "BedpeAnnotateCnvOverlap": "ngsbits_tpu.tools.bedpe_tools",
    "VcfSplit": "ngsbits_tpu.tools.vcf_fix_tools",
    "VcfReplaceSamples": "ngsbits_tpu.tools.vcf_fix_tools",
    "SnifflesVcfFix": "ngsbits_tpu.tools.vcf_fix_tools",
    "MantaVcfFix": "ngsbits_tpu.tools.vcf_fix_tools",
    "VariantFilterRegions": "ngsbits_tpu.tools.variant_tools",
    "TsvAnnotate": "ngsbits_tpu.tools.tsv_tools",
    "VcfToBedpe": "ngsbits_tpu.tools.vcf_to_bedpe",
    "VcfMerge": "ngsbits_tpu.tools.vcf_merge",
    "SampleIdentity": "ngsbits_tpu.tools.sample_identity",
    "TrioMendelianErrors": "ngsbits_tpu.tools.trio_tools",
    "TrioMaternalContamination": "ngsbits_tpu.tools.trio_tools",
    "UpdHunter": "ngsbits_tpu.tools.upd_hunter",
    "QcToTsv": "ngsbits_tpu.tools.qc_tools",
    "TsvToQC": "ngsbits_tpu.tools.qc_tools",
    "TsvInfo": "ngsbits_tpu.tools.tsv_tools",
    "TsvSlice": "ngsbits_tpu.tools.tsv_tools",
    "TsvFilter": "ngsbits_tpu.tools.tsv_tools",
    "TsvMerge": "ngsbits_tpu.tools.tsv_tools",
    "NgsBitsInfo": "ngsbits_tpu.tools.info_tool",
}


def get_tool(name: str):
    if name not in TOOL_MODULES:
        raise KeyError(name)
    mod = importlib.import_module(TOOL_MODULES[name])
    return mod.TOOLS[name]
