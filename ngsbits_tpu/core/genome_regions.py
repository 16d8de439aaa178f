"""Genome landmark regions and lookups (NGSHelper analogues).

Behavioral reference: cppNGS/NGSHelper.cpp — cytoBand (:436-455),
cytoBandToRange (:457-508), centromeres (:573-607), telomeres (:610-655),
populationCodeToHumanReadable (:657-668), imprintingGenes (:510-540).
The cyto-band tables ship as ``resources/hg{19,38}_cyto_band.bed.gz``
(reference embedded data, carried over exactly).
"""

from __future__ import annotations

import gzip
from functools import lru_cache

from .chromosome import Chromosome
from .intervals import BedFile, BedLine

_CENTROMERES = {
    "hg19": [
        ("chr1", 121535434, 124535434), ("chr2", 92326171, 95326171),
        ("chr3", 90504854, 93504854), ("chr4", 49660117, 52660117),
        ("chr5", 46405641, 49405641), ("chr6", 58830166, 61830166),
        ("chr7", 58054331, 61054331), ("chr8", 43838887, 46838887),
        ("chr9", 47367679, 50367679), ("chr10", 39254935, 42254935),
        ("chr11", 51644205, 54644205), ("chr12", 34856694, 37856694),
        ("chr13", 16000000, 19000000), ("chr14", 16000000, 19000000),
        ("chr15", 17000000, 20000000), ("chr16", 35335801, 38335801),
        ("chr17", 22263006, 25263006), ("chr18", 15460898, 18460898),
        ("chr19", 24681782, 27681782), ("chr20", 26369569, 29369569),
        ("chr21", 11288129, 14288129), ("chr22", 13000000, 16000000),
        ("chrX", 58632012, 61632012), ("chrY", 10104553, 13104553),
    ],
    "hg38": [
        ("chr1", 121700000, 125100000), ("chr2", 91800000, 96000000),
        ("chr3", 87800000, 94000000), ("chr4", 48200000, 51800000),
        ("chr5", 46100000, 51400000), ("chr6", 58500000, 62600000),
        ("chr7", 58100000, 62100000), ("chr8", 43200000, 47200000),
        ("chr9", 42200000, 45500000), ("chr10", 38000000, 41600000),
        ("chr11", 51000000, 55800000), ("chr12", 33200000, 37800000),
        ("chr13", 16500000, 18900000), ("chr14", 16100000, 18200000),
        ("chr15", 17500000, 20500000), ("chr16", 35300000, 38400000),
        ("chr17", 22700000, 27400000), ("chr18", 15400000, 21500000),
        ("chr19", 24200000, 28100000), ("chr20", 25700000, 30400000),
        ("chr21", 10900000, 13000000), ("chr22", 13700000, 17400000),
        ("chrX", 58100000, 63800000), ("chrY", 10300000, 10600000),
    ],
}

_TELOMERES = {
    "hg19": [
        ("chr1", 1, 10000), ("chr1", 249240621, 249250621),
        ("chr2", 1, 10000), ("chr2", 243189373, 243199373),
        ("chr3", 1, 10000), ("chr3", 198012430, 198022430),
        ("chr4", 1, 10000), ("chr4", 191144276, 191154276),
        ("chr5", 1, 10000), ("chr5", 180905260, 180915260),
        ("chr6", 1, 10000), ("chr6", 171105067, 171115067),
        ("chr7", 1, 10000), ("chr7", 159128663, 159138663),
        ("chr8", 1, 10000), ("chr8", 146354022, 146364022),
        ("chr9", 1, 10000), ("chr9", 141203431, 141213431),
        ("chr10", 1, 10000), ("chr10", 135524747, 135534747),
        ("chr11", 1, 10000), ("chr11", 134996516, 135006516),
        ("chr12", 1, 10000), ("chr12", 133841895, 133851895),
        ("chr13", 1, 10000), ("chr13", 115159878, 115169878),
        ("chr14", 1, 10000), ("chr14", 107339540, 107349540),
        ("chr15", 1, 10000), ("chr15", 102521392, 102531392),
        ("chr16", 1, 10000), ("chr16", 90344753, 90354753),
        # GRCh37 defines no telomeres for chr17
        ("chr18", 1, 10000), ("chr18", 78067248, 78077248),
        ("chr19", 1, 10000), ("chr19", 59118983, 59128983),
        ("chr20", 1, 10000), ("chr20", 63015520, 63025520),
        ("chr21", 1, 10000), ("chr21", 48119895, 48129895),
        ("chr22", 1, 10000), ("chr22", 51294566, 51304566),
        ("chrX", 1, 10000), ("chrX", 155260560, 155270560),
        ("chrY", 1, 10000), ("chrY", 59363566, 59373566),
    ],
    "hg38": [
        ("chr1", 1, 10000), ("chr1", 248946422, 248956422),
        ("chr2", 1, 10000), ("chr2", 242183529, 242193529),
        ("chr3", 1, 10000), ("chr3", 198285559, 198295559),
        ("chr4", 1, 10000), ("chr4", 190204555, 190214555),
        ("chr5", 1, 10000), ("chr5", 181528259, 181538259),
        ("chr6", 1, 10000), ("chr6", 170795979, 170805979),
        ("chr7", 1, 10000), ("chr7", 159335973, 159345973),
        ("chr8", 1, 10000), ("chr8", 145128636, 145138636),
        ("chr9", 1, 10000), ("chr9", 138384717, 138394717),
        ("chr10", 1, 10000), ("chr10", 133787422, 133797422),
        ("chr11", 1, 10000), ("chr11", 135076622, 135086622),
        ("chr12", 1, 10000), ("chr12", 133265309, 133275309),
        ("chr13", 1, 10000), ("chr13", 114354328, 114364328),
        ("chr14", 1, 10000), ("chr14", 107033718, 107043718),
        ("chr15", 1, 10000), ("chr15", 101981189, 101991189),
        ("chr16", 1, 10000), ("chr16", 90328345, 90338345),
        ("chr17", 1, 10000), ("chr17", 83247441, 83257441),
        ("chr18", 1, 10000), ("chr18", 80363285, 80373285),
        ("chr19", 1, 10000), ("chr19", 58607616, 58617616),
        ("chr20", 1, 10000), ("chr20", 64434167, 64444167),
        ("chr21", 1, 10000), ("chr21", 46699983, 46709983),
        ("chr22", 1, 10000), ("chr22", 50808468, 50818468),
        ("chrX", 1, 10000), ("chrX", 156030895, 156040895),
        ("chrY", 1, 10000), ("chrY", 57217415, 57227415),
    ],
}


def _coords_to_bed(coords) -> BedFile:
    out = BedFile()
    for chrom, start, end in coords:
        out.append(BedLine(Chromosome(chrom), start, end))
    return out


def centromeres(build: str) -> BedFile:
    """NGSHelper::centromeres (NGSHelper.cpp:573-607)."""
    return _coords_to_bed(_CENTROMERES[build.lower()])


def telomeres(build: str) -> BedFile:
    """NGSHelper::telomeres (NGSHelper.cpp:610-655)."""
    return _coords_to_bed(_TELOMERES[build.lower()])


@lru_cache(maxsize=2)
def _cyto_bands(build: str) -> BedFile:
    from .resources import RESOURCE_DIR
    out = BedFile()
    with gzip.open(RESOURCE_DIR / f"{build.lower()}_cyto_band.bed.gz", "rb") as fh:
        for raw in fh.read().split(b"\n"):
            line = raw.strip()
            if not line:
                continue
            parts = line.split(b"\t")
            out.append(BedLine(Chromosome(parts[0]), int(parts[1]) + 1, int(parts[2]),
                               list(parts[3:])))
    return out


def cyto_band(build: str, chr_, pos: int) -> bytes:
    """NGSHelper::cytoBand (NGSHelper.cpp:436-455)."""
    chr_ = Chromosome(chr_) if not isinstance(chr_, Chromosome) else chr_
    for line in _cyto_bands(build).lines:
        if line.chr == chr_ and line.start <= pos <= line.end:
            return chr_.str_normalized(False).encode() + line.annotations[0]
    raise ValueError(f"Could not find band for coordinate {chr_.str}:{pos}")


def cyto_band_to_range(build: str, cytoband: bytes | str) -> BedLine:
    """NGSHelper::cytoBandToRange (NGSHelper.cpp:457-508)."""
    if isinstance(cytoband, str):
        cytoband = cytoband.encode()
    if b"-" in cytoband:
        parts = cytoband.split(b"-")
        if len(parts) != 2 or not parts[1]:
            raise ValueError(f"Cytoband range '{cytoband.decode()}' contains more "
                             "than one '-'!")
        r1 = cyto_band_to_range(build, parts[0])
        r2 = cyto_band_to_range(build, parts[1])
        if r1.chr != r2.chr:
            raise ValueError(f"Cytoband '{cytoband.decode()}' contains range with "
                             "non-matching chromosomes!")
        return BedLine(r1.chr, min(r1.start, r2.start), max(r1.end, r2.end))

    sep = cytoband.find(b"p")
    if sep == -1:
        sep = cytoband.find(b"q")
    if sep == -1:
        raise ValueError(f"Cytoband '{cytoband.decode()}' contains no 'p' or 'q'!")
    chr_ = Chromosome(cytoband[:sep])
    if not chr_.is_autosome() and not chr_.is_gonosome():
        raise ValueError(f"Cytoband '{cytoband.decode()}' contains invalid "
                         f"chromosome '{chr_.str}'!")
    band = cytoband[sep:]
    for line in _cyto_bands(build).lines:
        if line.chr == chr_ and line.annotations[0] == band:
            return BedLine(chr_, line.start, line.end)
    raise ValueError(f"Cytoband '{cytoband.decode()}' contains unknown band name "
                     f"'{band.decode()}'!")


_CHR_MAPPING = {
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


def chromosome_mapping(build: str) -> dict[Chromosome, str]:
    """NGSHelper::chromosomeMapping (NGSHelper.cpp:1002-1063) — chromosome to
    RefSeq NC accession."""
    return {Chromosome(k): v for k, v in _CHR_MAPPING[build.lower()].items()}


def population_code_to_human_readable(code: str) -> str:
    """NGSHelper::populationCodeToHumanReadable (NGSHelper.cpp:657-668)."""
    mapping = {"AFR": "African", "EAS": "East asian", "EUR": "European",
               "SAS": "South asian", "ADMIXED/UNKNOWN": "Admixed/Unknown", "": ""}
    if code not in mapping:
        raise ValueError(f"Unknown population code '{code}'!")
    return mapping[code]


@lru_cache(maxsize=1)
def imprinting_genes() -> dict[bytes, tuple[bytes, bytes]]:
    """NGSHelper::imprintingGenes (NGSHelper.cpp:510-540) —
    {gene: (expressed_allele, status)}."""
    from .resources import RESOURCE_DIR
    out: dict[bytes, tuple[bytes, bytes]] = {}
    with gzip.open(RESOURCE_DIR / "imprinting_genes.tsv.gz", "rb") as fh:
        for raw in fh.read().split(b"\n"):
            line = raw.strip()
            if not line or line.startswith(b"#"):
                continue
            parts = line.split(b"\t")
            if len(parts) == 3:
                out[parts[0]] = (parts[1], parts[2])
    return out
