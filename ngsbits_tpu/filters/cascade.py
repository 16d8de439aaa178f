"""Filter cascade engine for GSvar/BEDPE/CNV variant lists.

Behavioral reference: ngs-bits cppNGS/FilterCascade.cpp (FilterBase parameter
infrastructure, FilterResult, FilterCascade::load text format
'name\\tparam1=value\\tparam2=value', FilterFactory registry, and the
individual filter apply() implementations — reference line numbers cited on
each filter class).

Filters that in the reference query the NGSD database operate here — exactly
like there — on the annotation columns the pipeline wrote into the files
(e.g. NGSD_hom/NGSD_het counts, classification), so no database is needed.
"""

from __future__ import annotations

DOUBLE, INT, BOOL, STRING, STRINGLIST = range(5)

_REGISTRY: dict[str, type] = {}


def register(cls):
    _REGISTRY[cls.NAME] = cls
    return cls


def filter_names(subject: str | None = None) -> list[str]:
    names = [n for n, c in _REGISTRY.items()
             if subject is None or c.TYPE == subject]
    return sorted(names)


def create_filter(name: str, parameters: list[str] = ()):
    if name not in _REGISTRY:
        raise ValueError(f"Filter name '{name}' is not valid!")
    f = _REGISTRY[name]()
    for p in parameters:
        p = p.strip()
        if not p:
            continue
        if p == "disabled":  # FilterFactory::create (FilterCascade.cpp:873)
            f.enabled = not f.enabled
            continue
        if "=" not in p:
            raise ValueError(f"Invalid filter parameter '{p}' — missing '='!")
        key, value = p.split("=", 1)
        f.set_param(key, value)
    return f


class FilterResult:
    def __init__(self, n: int):
        self.flags = [True] * n

    def invert(self):
        self.flags = [not f for f in self.flags]

    def count_passing(self) -> int:
        return sum(self.flags)

    def reset(self, initial: bool = True):
        """FilterResult::reset."""
        self.flags = [initial] * len(self.flags)

    def remove_flagged(self, target):
        """FilterResult::removeFlagged (FilterCascade.cpp:90-190) — drop
        non-passing entries from a GSvar/CNV/SV container and reset flags."""
        if self.count_passing() == len(self.flags):
            return
        if hasattr(target, "variants"):       # GSvarFile / CnvList
            target.variants = [v for v, fl in zip(target.variants, self.flags)
                               if fl]
        elif hasattr(target, "lines"):        # BedpeFile
            target.lines = [l for l, fl in zip(target.lines, self.flags) if fl]
        else:
            raise TypeError("Unsupported container in remove_flagged!")
        self.flags = [True] * len(target)

    def tag_non_passing(self, gsvar, tag: str, description: str):
        """FilterResult::tagNonPassing (FilterCascade.cpp:192-213)."""
        index = gsvar.add_annotation_if_missing("filter", "Filter column.")
        if tag not in gsvar.filters:
            gsvar.filters[tag] = description
        tag_b = tag.encode() if isinstance(tag, str) else tag
        for v, fl in zip(gsvar.variants, self.flags):
            if not fl:
                v.add_filter(tag_b, index)


def filter_regions_apply(variants, regions, result: FilterResult):
    """FilterRegions::apply (FilterCascade.cpp:1104-1133) — restrict a GSvar
    variant list to regions (merged/sorted required)."""
    if not regions.is_merged_and_sorted():
        raise ValueError("Cannot filter variant list by regions that are not "
                         "merged/sorted!")
    if len(regions) == 1:
        r = regions.lines[0]
        for i, v in enumerate(variants.variants):
            if result.flags[i]:
                result.flags[i] = v.overlaps_with(r)
        return
    from ..core.intervals import ChromosomalIndex

    idx = ChromosomalIndex(regions)
    for i, v in enumerate(variants.variants):
        if result.flags[i]:
            result.flags[i] = idx.matching_index(v.chr, v.start, v.end) != -1


class FilterBase:
    NAME = ""
    TYPE = "snv"  # snv | sv | cnv
    PARAMS: list[tuple] = []  # (name, type, default)

    def __init__(self):
        self.enabled = True
        self.values = {n: d for n, t, d in self.PARAMS}
        self.types = {n: t for n, t, d in self.PARAMS}

    def set_param(self, key: str, value: str):
        if key not in self.values:
            raise ValueError(f"Filter '{self.NAME}' has no parameter '{key}'!")
        t = self.types[key]
        if t == DOUBLE:
            self.values[key] = float(value)
        elif t == INT:
            self.values[key] = int(value)
        elif t == BOOL:
            self.values[key] = value.strip().lower() in ("true", "1", "yes")
        elif t == STRINGLIST:
            self.values[key] = [v for v in value.split(",") if v != ""]
        else:
            self.values[key] = value

    def get(self, key):
        return self.values[key]

    def apply(self, target, result: FilterResult):
        raise NotImplementedError


class FilterCascade:
    def __init__(self):
        self.filters: list[FilterBase] = []
        self.errors: list[list[str]] = []

    def add(self, f: FilterBase):
        self.filters.append(f)

    @staticmethod
    def from_file(path: str) -> "FilterCascade":
        out = FilterCascade()
        with open(path, "rb") as fh:
            for raw in fh.read().split(b"\n"):
                line = raw.rstrip(b"\r").decode()
                if not line.strip() or line.startswith("#"):
                    continue
                parts = line.split("\t")
                out.add(create_filter(parts[0], parts[1:]))
        return out

    @staticmethod
    def load_from_file(filename: str, filter_name: str) -> "FilterCascade":
        """FilterCascadeFile::load (FilterCascade.cpp:832-852) — extract the
        named '#<filter>' section of a GSvar filter ini and parse it.
        Transparently handles gzipped ini resources."""
        import gzip
        opener = gzip.open if str(filename).endswith(".gz") else open
        with opener(filename, "rt") as fh:
            file_lines = [l.rstrip("\r\n") for l in fh]
        filter_text = []
        in_filter = False
        for line in file_lines:
            if line.startswith("#"):
                in_filter = (line == "#" + filter_name)
            elif in_filter:
                filter_text.append(line)
        return FilterCascade.from_text(filter_text)

    @staticmethod
    def from_text(lines) -> "FilterCascade":
        """FilterCascade::fromText (FilterCascade.cpp:775-790)."""
        out = FilterCascade()
        for line in lines:
            line = line.strip()
            if not line:
                continue
            parts = line.split("\t")
            out.add(create_filter(parts[0], parts[1:]))
        return out

    def to_text(self) -> list[str]:
        """FilterCascade::toText (FilterCascade.cpp:757-773)."""
        lines = []
        for f in self.filters:
            params = []
            for name, t, _d in f.PARAMS:
                v = f.values[name]
                if t == BOOL:
                    s = "yes" if v else "no"
                elif t == STRINGLIST:
                    s = ",".join(v)
                elif t == DOUBLE:
                    s = f"{v:.6g}"
                else:
                    s = str(v)
                params.append(f"{name}={s}")
            if not f.enabled:
                params.append("disabled")
            lines.append(f.NAME + "\t" + "\t".join(params))
        return lines

    def apply(self, target, subject: str, throw_errors: bool = True) -> FilterResult:
        n = len(target.variants) if hasattr(target, "variants") else len(target)
        result = FilterResult(n)
        self.errors = [[] for _ in self.filters]
        for i, f in enumerate(self.filters):
            if f.TYPE != subject:
                kind = {"snv": "small variants", "sv": "structural variants",
                        "cnv": "CNVs"}[subject]
                raise ValueError(f"Filter '{f.NAME}' cannot be applied to {kind}!")
            if not f.enabled:  # 'if (!enabled_) return' in every apply()
                continue
            try:
                f.apply(target, result)
            except Exception as e:  # FilterCascade::apply catches per filter
                if throw_errors:
                    raise
                self.errors[i].append(str(e))
        return result


# ---------------------------------------------------------------- helpers

def _anno_col(gsvar, name: str, error=True) -> int:
    # case-insensitive exact match like FilterBase::annotationColumn ->
    # VariantList::annotationIndexByName (FilterCascade.cpp:559-567)
    try:
        return gsvar.annotation_index(name)
    except KeyError:
        pass
    nl = name.lower()
    for i, c in enumerate(gsvar.columns):
        if c.lower() == nl:
            return i
    if error:
        raise ValueError(f"Could not determine column index of column "
                         f"'{name}' in variant list!")
    return -1


def _to_f(v: bytes) -> float:
    try:
        return float(v)
    except ValueError:
        return 0.0


def _to_i(v: bytes) -> int:
    try:
        return int(v)
    except ValueError:
        return 0


def _same_genotype(variant, geno_indices) -> bytes:
    geno = variant.annotations[geno_indices[0]]
    for idx in geno_indices[1:]:
        if variant.annotations[idx] != geno:
            return b""
    return geno


def _apply_action(items, result, action, match):
    if action == "REMOVE":
        for i, v in enumerate(items):
            if not result.flags[i]:
                continue
            result.flags[i] = not match(v)
    elif action == "FILTER":
        for i, v in enumerate(items):
            if not result.flags[i]:
                continue
            result.flags[i] = match(v)
    else:  # KEEP
        for i, v in enumerate(items):
            if result.flags[i]:
                continue
            result.flags[i] = match(v)


# ---------------------------------------------------------------- SNV filters

@register
class FilterAlleleFrequency(FilterBase):
    """FilterCascade.cpp:999-1044."""
    NAME = "Allele frequency"
    PARAMS = [("max_af", DOUBLE, 1.0)]

    def apply(self, gsvar, result):
        max_af = self.get("max_af") / 100.0
        i_gnomad = _anno_col(gsvar, "gnomAD")
        i_1000g = _anno_col(gsvar, "1000g", False)
        for i, v in enumerate(gsvar.variants):
            ok = _to_f(v.annotations[i_gnomad]) <= max_af
            if i_1000g != -1:
                ok = ok and _to_f(v.annotations[i_1000g]) <= max_af
            result.flags[i] = result.flags[i] and ok


@register
class FilterSubpopulationAlleleFrequency(FilterBase):
    """FilterCascade.cpp (Allele frequency (sub-populations))."""
    NAME = "Allele frequency (sub-populations)"
    PARAMS = [("max_af", DOUBLE, 1.0)]

    def apply(self, gsvar, result):
        max_af = self.get("max_af") / 100.0
        i_gnomad = _anno_col(gsvar, "gnomAD_sub")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            for part in v.annotations[i_gnomad].split(b","):
                if _to_f(part) > max_af:
                    result.flags[i] = False
                    break


@register
class FilterVariantCountNGSD(FilterBase):
    """FilterCascade.cpp (Count NGSD): counts from NGSD_hom/NGSD_het columns."""
    NAME = "Count NGSD"
    PARAMS = [("max_count", INT, 20), ("ignore_genotype", BOOL, False),
              ("mosaic_as_het", BOOL, False)]

    def apply(self, gsvar, result):
        max_count = self.get("max_count")
        i_hom = _anno_col(gsvar, "NGSD_hom")
        i_het = _anno_col(gsvar, "NGSD_het")
        i_mosaic = _anno_col(gsvar, "NGSD_mosaic", False)
        mosaic_as_het = self.get("mosaic_as_het")
        if self.get("ignore_genotype"):
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    continue
                count = _to_i(v.annotations[i_het]) + _to_i(v.annotations[i_hom])
                if mosaic_as_het and i_mosaic != -1:
                    count += _to_i(v.annotations[i_mosaic])
                result.flags[i] = count <= max_count
        else:
            geno_indices = [g for g in gsvar.sample_columns(True) if g != -1]
            if not geno_indices:
                raise ValueError(f"Cannot apply filter '{self.NAME}' to variant "
                                 "list without affected samples!")
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    continue
                var_is_hom = False
                for idx in geno_indices:
                    geno = v.annotations[idx]
                    if geno == b"hom":
                        var_is_hom = True
                        break
                    if geno not in (b"het", b"wt", b"n/a"):
                        raise ValueError(f"Unknown genotype '{geno.decode()}'!")
                count = _to_i(v.annotations[i_hom])
                if not var_is_hom:
                    count += _to_i(v.annotations[i_het])
                    if mosaic_as_het and i_mosaic != -1:
                        count += _to_i(v.annotations[i_mosaic])
                result.flags[i] = count <= max_count


@register
class FilterVariantImpact(FilterBase):
    """FilterCascade.cpp (Impact)."""
    NAME = "Impact"
    PARAMS = [("impact", STRINGLIST, ["HIGH", "MODERATE", "LOW"])]

    def apply(self, gsvar, result):
        i_co_sp = _anno_col(gsvar, "coding_and_splicing")
        impacts = [(":" + s + ":").encode() for s in self.get("impact")]
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            result.flags[i] = any(imp in v.annotations[i_co_sp] for imp in impacts)


@register
class FilterClassificationNGSD(FilterBase):
    """FilterCascade.cpp (Classification NGSD): 'classification' column."""
    NAME = "Classification NGSD"
    PARAMS = [("classes", STRINGLIST, ["4", "5"]), ("action", STRING, "KEEP")]

    def apply(self, gsvar, result):
        classes = [c.encode() for c in self.get("classes")]
        i_class = _anno_col(gsvar, "classification")

        def match(v):
            return v.annotations[i_class].strip() in classes

        _apply_action(gsvar.variants, result, self.get("action"), match)


@register
class FilterFilterColumn(FilterBase):
    """FilterCascade.cpp (Filter columns)."""
    NAME = "Filter columns"
    PARAMS = [("entries", STRINGLIST, []), ("action", STRING, "REMOVE")]

    def apply(self, gsvar, result):
        entries = [e.encode() for e in self.get("entries")]
        i_filter = _anno_col(gsvar, "filter")

        def match(v):
            # Variant ctor drops empty/'.'/PASS/PASSED tags (VariantList.cpp:34-46)
            tags = [t.strip() for t in v.annotations[i_filter].split(b";")]
            tags = [t for t in tags
                    if t not in (b"", b".") and t.upper() not in (b"PASS", b"PASSED")]
            return any(t in entries for t in tags)

        _apply_action(gsvar.variants, result, self.get("action"), match)


@register
class FilterFilterColumnEmpty(FilterBase):
    """FilterCascade.cpp (Filter column empty)."""
    NAME = "Filter column empty"
    PARAMS = []

    def apply(self, gsvar, result):
        i_filter = _anno_col(gsvar, "filter")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            result.flags[i] = v.annotations[i_filter].strip() == b""


@register
class FilterGenotypeControl(FilterBase):
    """FilterCascade.cpp (Genotype control)."""
    NAME = "Genotype control"
    TYPE = "snv"
    PARAMS = [("genotypes", STRINGLIST, []), ("same_genotype", BOOL, False)]

    def apply(self, gsvar, result):
        genotypes = [g.encode() for g in self.get("genotypes")]
        same_genotype = self.get("same_genotype")
        geno_indices = [g for g in gsvar.sample_columns(False) if g != -1]
        if not geno_indices:
            raise ValueError(f"Cannot apply filter '{self.NAME}' to variant "
                             "list without control samples!")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            if same_genotype:
                geno_all = _same_genotype(v, geno_indices)
                if not geno_all or geno_all not in genotypes:
                    result.flags[i] = False
            else:
                for idx in geno_indices:
                    if v.annotations[idx] not in genotypes:
                        result.flags[i] = False
                        break


@register
class FilterGenotypeAffected(FilterBase):
    """FilterCascade.cpp (Genotype affected), incl. comp-het mode."""
    NAME = "Genotype affected"
    PARAMS = [("genotypes", STRINGLIST, []), ("same_genotype", BOOL, False)]

    def apply(self, gsvar, result):
        genotypes = self.get("genotypes")
        geno_b = [g.encode() for g in genotypes]
        comphet_modes = sum(1 for m in ("comp-het", "comp-het (phased)",
                                        "comp-het (unphased)") if m in genotypes)
        if comphet_modes > 1:
            raise ValueError("You can select only one of comp-het, comp-het "
                             "(phased) and comp-het (unphased)!")
        geno_indices = [g for g in gsvar.sample_columns(True) if g != -1]
        if not geno_indices:
            raise ValueError(f"Cannot apply filter '{self.NAME}' to variant "
                             "list without affected samples!")

        if comphet_modes == 0:
            same_genotype = self.get("same_genotype")
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    continue
                if same_genotype:
                    geno_all = _same_genotype(v, geno_indices)
                    if not geno_all or geno_all not in geno_b:
                        result.flags[i] = False
                else:
                    for idx in geno_indices:
                        if v.annotations[idx] not in geno_b:
                            result.flags[i] = False
                            break
            return

        # comp-het handling incl. phased modes (FilterCascade.cpp
        # FilterGenotypeAffected::apply, phased branch)
        i_phasing = _anno_col(gsvar, "genotype_phased", error=False)
        phased_mode = ("comp-het (phased)" in genotypes
                       or "comp-het (unphased)" in genotypes)
        if phased_mode:
            if len(geno_indices) > 1:
                raise ValueError(f"Cannot apply phased filter '{self.NAME}' to "
                                 "variant list with multiple affected samples!")
            if i_phasing < 0:
                raise ValueError(f"Cannot apply phased filter '{self.NAME}' to "
                                 "variant list without phasing information!")

        i_gene = _anno_col(gsvar, "gene")
        gene_to_het: dict[bytes, int] = {}
        gene_to_het_phase1: dict[bytes, int] = {}
        gene_to_het_phase2: dict[bytes, int] = {}
        gene_to_het_unphased: dict[bytes, int] = {}
        gene_to_phasing_block: dict[bytes, set] = {}
        result_other = [True] * len(gsvar.variants)
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                result_other[i] = False
                continue
            geno_all = _same_genotype(v, geno_indices)
            result_other[i] = bool(geno_all) and geno_all in geno_b
            if geno_all == b"het":
                for gene in v.annotations[i_gene].split(b","):
                    gene = gene.strip()
                    if not gene:
                        continue
                    gene_to_het[gene] = gene_to_het.get(gene, 0) + 1
                    if "comp-het" not in genotypes:
                        entry = v.annotations[i_phasing].split(b" ")
                        blocks = gene_to_phasing_block.setdefault(gene, set())
                        if len(entry) < 2:
                            gene_to_het_unphased[gene] = \
                                gene_to_het_unphased.get(gene, 0) + 1
                            blocks.add(-1)
                        else:
                            block = int(entry[1].replace(b"(", b"").replace(b")", b""))
                            if entry[0] == b"1|0":
                                gene_to_het_phase1[gene] = \
                                    gene_to_het_phase1.get(gene, 0) + 1
                            else:
                                gene_to_het_phase2[gene] = \
                                    gene_to_het_phase2.get(gene, 0) + 1
                            blocks.add(block)

        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            if result_other[i]:
                continue
            passing = False
            geno_all = _same_genotype(v, geno_indices)
            if geno_all == b"het":
                for gene in v.annotations[i_gene].split(b","):
                    gene = gene.strip()
                    if "comp-het" in genotypes:
                        if gene_to_het.get(gene, 0) >= 2:
                            passing = True
                            break
                    elif "comp-het (phased)" in genotypes:
                        if (gene_to_het_phase1.get(gene, 0) >= 1
                                and gene_to_het_phase2.get(gene, 0) >= 1
                                and len(gene_to_phasing_block.get(gene, set())) < 2
                                and gene_to_het_unphased.get(gene, 0) == 0):
                            passing = True
                            break
                    elif "comp-het (unphased)" in genotypes:
                        if (len(gene_to_phasing_block.get(gene, set())) > 1
                                or gene_to_het_unphased.get(gene, 0) > 0):
                            if gene_to_het.get(gene, 0) >= 2:
                                passing = True
                                break
            result.flags[i] = passing


@register
class FilterVariantIsSNV(FilterBase):
    """FilterCascade.cpp (SNVs only)."""
    NAME = "SNVs only"
    PARAMS = [("invert", BOOL, False)]

    def apply(self, gsvar, result):
        invert = self.get("invert")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            is_snv = (len(v.ref) == 1 and len(v.obs) == 1
                      and v.ref != b"-" and v.obs != b"-")
            result.flags[i] = is_snv != invert


@register
class FilterVariantTextSearch(FilterBase):
    """FilterCascade.cpp (Text search)."""
    NAME = "Text search"
    PARAMS = [("term", STRING, ""), ("action", STRING, "FILTER")]

    def apply(self, gsvar, result):
        # case-insensitive (FilterAnnotationText::match, FilterCascade.cpp:2266)
        term = self.get("term").strip().lower().encode()

        def match(v):
            return any(term in a.lower() for a in v.annotations)

        _apply_action(gsvar.variants, result, self.get("action"), match)


# ---------------------------------------------------------------- SV filters

@register
class FilterSvRemoveChromosomeType(FilterBase):
    """FilterCascade.cpp (SV remove chr type)."""
    NAME = "SV remove chr type"
    TYPE = "sv"
    PARAMS = [("chromosome type", STRING, "special chromosomes")]

    def apply(self, svs, result):
        remove_special = self.get("chromosome type") == "special chromosomes"
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            std = sv.chr1.is_non_special() and sv.chr2.is_non_special()
            result.flags[i] = std if remove_special else not std


@register
class FilterSvOMIM(FilterBase):
    """FilterCascade.cpp:4422-4467 (SV OMIM genes)."""
    NAME = "SV OMIM genes"
    TYPE = "sv"
    PARAMS = [("action", STRING, "FILTER")]

    def apply(self, svs, result):
        index = svs.annotation_index_by_name(b"OMIM", True)
        action = self.get("action")
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            empty = sv.annotations[index].strip() == b""
            result.flags[i] = (not empty) if action == "FILTER" else empty


@register
class FilterSvType(FilterBase):
    """FilterCascade.cpp (SV type)."""
    NAME = "SV type"
    TYPE = "sv"
    PARAMS = [("Structural variant type", STRINGLIST, [])]

    def apply(self, svs, result):
        types = [t.encode() for t in self.get("Structural variant type")]
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            result.flags[i] = sv.type in types


@register
class FilterSvSize(FilterBase):
    """FilterCascade.cpp (SV size)."""
    NAME = "SV size"
    TYPE = "sv"
    PARAMS = [("min_size", INT, 0), ("max_size", INT, 0)]

    def apply(self, svs, result):
        min_size = self.get("min_size")
        max_size = self.get("max_size")
        for i in range(len(svs.lines)):
            if not result.flags[i]:
                continue
            sv_length = svs.estimated_sv_size(i)
            if sv_length < min_size:
                result.flags[i] = False
            if max_size != 0 and sv_length > max_size:
                result.flags[i] = False


@register
class FilterSvFilterColumn(FilterBase):
    """FilterCascade.cpp (SV filter columns)."""
    NAME = "SV filter columns"
    TYPE = "sv"
    PARAMS = [("entries", STRINGLIST, []), ("action", STRING, "REMOVE")]

    def apply(self, svs, result):
        entries = [e.encode() for e in self.get("entries")]
        index = svs.annotation_index_by_name(b"FILTER", True)

        def match(sv):
            return any(e in sv.annotations[index].split(b";") for e in entries)

        _apply_action(svs.lines, result, self.get("action"), match)


# ---------------------------------------------------------------- CNV filters

@register
class FilterCnvSize(FilterBase):
    """FilterCascade.cpp (CNV size, kilobases)."""
    NAME = "CNV size"
    TYPE = "cnv"
    PARAMS = [("size", DOUBLE, 0.0), ("action", STRING, "FILTER")]

    def apply(self, cnvs, result):
        min_size_bases = self.get("size") * 1000.0
        action = self.get("action")
        if action == "FILTER":
            for i, v in enumerate(cnvs.variants):
                if not result.flags[i]:
                    continue
                if v.end - v.start + 1 < min_size_bases:
                    result.flags[i] = False
        elif action == "KEEP":
            for i, v in enumerate(cnvs.variants):
                if v.end - v.start + 1 >= min_size_bases:
                    result.flags[i] = True
        else:
            raise ValueError(f"Invalid action '{action}'provided!")


@register
class FilterCnvRegions(FilterBase):
    """FilterCascade.cpp (CNV regions)."""
    NAME = "CNV regions"
    TYPE = "cnv"
    PARAMS = [("regions", INT, 3)]

    def apply(self, cnvs, result):
        min_regions = self.get("regions")
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            if v.num_regs < 1:
                raise ValueError("Invalid/unset number of regions!")
            if v.num_regs < min_regions:
                result.flags[i] = False


@register
class FilterCnvLoglikelihood(FilterBase):
    """FilterCascade.cpp (CNV log-likelihood)."""
    NAME = "CNV log-likelihood"
    TYPE = "cnv"
    PARAMS = [("min_ll", DOUBLE, 20.0), ("scale_by_regions", BOOL, False)]

    def apply(self, cnvs, result):
        min_ll = self.get("min_ll")
        scale = self.get("scale_by_regions")
        i_ll = cnvs.annotation_index_by_name(b"loglikelihood", True)
        if cnvs.type in ("germline_single", "tumor_normal", "tumor_only"):
            for i, v in enumerate(cnvs.variants):
                if not result.flags[i]:
                    continue
                ll = _to_f(v.annotations[i_ll])
                if scale:
                    if v.num_regs < 1:
                        raise ValueError("Invalid/unset number of regions!")
                    ll = ll / v.num_regs
                if ll < min_ll:
                    result.flags[i] = False
        else:  # germline multi: each entry must exceed cutoff
            for i, v in enumerate(cnvs.variants):
                if not result.flags[i]:
                    continue
                for part in v.annotations[i_ll].split(b","):
                    ll = _to_f(part)
                    if scale:
                        if v.num_regs < 1:
                            raise ValueError("Invalid/unset number of regions!")
                        ll = ll / v.num_regs
                    if ll < min_ll:
                        result.flags[i] = False
                        break


@register
class FilterCnvQvalue(FilterBase):
    """FilterCascade.cpp (CNV q-value)."""
    NAME = "CNV q-value"
    TYPE = "cnv"
    PARAMS = [("max_q", DOUBLE, 1.0)]

    def apply(self, cnvs, result):
        max_q = self.get("max_q")
        i_q = cnvs.annotation_index_by_name(b"qvalue", True)
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            for part in v.annotations[i_q].split(b","):
                if _to_f(part) > max_q:
                    result.flags[i] = False
                    break


@register
class FilterCnvCopyNumber(FilterBase):
    """FilterCascade.cpp (CNV copy-number)."""
    NAME = "CNV copy-number"
    TYPE = "cnv"
    PARAMS = [("cn", STRINGLIST, [])]

    def apply(self, cnvs, result):
        cn_exp = {c.encode() for c in self.get("cn")}
        cn_5plus = "5+" in self.get("cn")
        i_cn = cnvs.annotation_index_by_name(b"CN_change", True)
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            cn = v.annotations[i_cn]
            result.flags[i] = cn in cn_exp or (cn_5plus and _to_i(cn) >= 5)


@register
class FilterCnvOMIM(FilterBase):
    """FilterCascade.cpp:3269-3315 (CNV OMIM genes)."""
    NAME = "CNV OMIM genes"
    TYPE = "cnv"
    PARAMS = [("action", STRING, "FILTER")]

    def apply(self, cnvs, result):
        index = cnvs.annotation_index_by_name(b"omim", True)
        action = self.get("action")
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            empty = v.annotations[index].strip() == b""
            result.flags[i] = (not empty) if action == "FILTER" else empty


@register
class FilterVariantQC(FilterBase):
    """FilterCascade.cpp:2350-2470 — 'Variant quality' (quality column parts)."""
    NAME = "Variant quality"
    PARAMS = [("apply_to", STRING, "all"), ("qual", INT, 20), ("depth", INT, 0),
              ("min_gq", INT, 0), ("min_af", DOUBLE, 0.0), ("max_af", DOUBLE, 1.0),
              ("remove_special_calls", BOOL, False)]

    def apply(self, gsvar, result):
        index = _anno_col(gsvar, "quality")
        apply_to = self.get("apply_to")
        qual = self.get("qual")
        depth = self.get("depth")
        min_gq = self.get("min_gq")
        min_af = self.get("min_af")
        max_af = self.get("max_af")
        remove_special = self.get("remove_special_calls")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            is_snv = len(v.ref) == 1 and len(v.obs) == 1 and v.ref != b"-" and v.obs != b"-"
            if apply_to == "SNV" and not is_snv:
                continue
            if apply_to == "INDEL" and is_snv:
                continue
            for part in v.annotations[index].split(b";"):
                if qual > 0 and part.startswith(b"QUAL="):
                    qual_str = part[5:].strip()
                    if qual_str == b".":
                        continue
                    if b"." in qual_str:
                        qual_str = qual_str[:qual_str.index(b".")]
                    if _to_i(qual_str) < qual:
                        result.flags[i] = False
                elif depth > 0 and part.startswith(b"DP="):
                    for dp in part[3:].split(b","):
                        if dp != b"." and _to_i(dp) < depth:
                            result.flags[i] = False
                elif min_gq > 0 and part.startswith(b"GQ="):
                    for gq in part[3:].split(b","):
                        if gq != b"." and _to_i(gq) < min_gq:
                            result.flags[i] = False
                elif (min_af > 0 or max_af < 1) and part.startswith(b"AF="):
                    for af in part[3:].split(b","):
                        if af == b".":
                            continue
                        af_num = _to_f(af)
                        if min_af > 0 and af_num < min_af:
                            result.flags[i] = False
                        if max_af < 1 and af_num > max_af:
                            result.flags[i] = False
                elif remove_special and part.startswith(b"CT="):
                    for ct in part[3:].split(b","):
                        if ct != b".":
                            result.flags[i] = False


@register
class FilterAnnotationPathogenic(FilterBase):
    """FilterCascade.cpp — 'Annotated pathogenic' (ClinVar/HGMD)."""
    NAME = "Annotated pathogenic"
    PARAMS = [("sources", STRINGLIST, ["ClinVar", "HGMD"]),
              ("also_likely_pathogenic", BOOL, False),
              ("action", STRING, "KEEP")]

    def apply(self, gsvar, result):
        sources = self.get("sources")
        also_likely = self.get("also_likely_pathogenic")
        i_clinvar = _anno_col(gsvar, "ClinVar") if "ClinVar" in sources else -1
        i_hgmd = _anno_col(gsvar, "HGMD", False) if "HGMD" in sources else -1

        def pathogenic(v):
            if i_clinvar != -1:
                clinvar = v.annotations[i_clinvar]
                if b"[pathogenic" in clinvar:
                    return True
                if also_likely and b"[likely pathogenic" in clinvar:
                    return True
            if i_hgmd != -1:
                hgmd = v.annotations[i_hgmd]
                if b"CLASS=DM" in hgmd:
                    if also_likely:
                        return True
                    if b"CLASS=DM?" not in hgmd:
                        return True
            return False

        if self.get("action") == "FILTER":
            for i, v in enumerate(gsvar.variants):
                if result.flags[i]:
                    result.flags[i] = pathogenic(v)
        else:  # KEEP
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    result.flags[i] = pathogenic(v)


def max_entscan_impact_annotated(score_pairs: list[bytes],
                                 splice_site_only: bool) -> tuple[str, bytes]:
    """NGSHelper::maxEntScanImpact — (impact, score pairs annotated with the
    per-pair impact like '8.5>6.1(HIGH)', ' / '-joined, '-' for empties)."""
    if len(score_pairs) < 1:
        raise ValueError("MaxEntScan annotation contains less than one score pair")
    if len(score_pairs) > 3:
        raise ValueError("MaxEntScan annotation contains more than three score pairs")
    impacts = []
    annotated = []
    for i, score_pair in enumerate(score_pairs):
        parts = score_pair.split(b">")
        if len(parts) != 2:
            annotated.append(b"-" if not score_pair.strip() else score_pair)
            continue
        if splice_site_only and i > 0:
            annotated.append(score_pair)
            continue
        ref = max(0.0, _to_f(parts[0]))
        alt = max(0.0, _to_f(parts[1]))
        diff = ref - alt
        impact = None
        if i == 0:
            if diff > 0 and ref >= 3:
                if alt < 6.2:
                    impact = "HIGH" if diff >= 1.15 else "MODERATE"
                elif alt <= 8.5 and diff > 1.15:
                    impact = "MODERATE"
        else:
            if diff < -1.15 and ref < 3:
                if alt > 8.5:
                    impact = "HIGH"
                elif alt >= 6.2:
                    impact = "MODERATE"
        if impact:
            impacts.append(impact)
            annotated.append(score_pair + b"(" + impact.encode() + b")")
        else:
            annotated.append(score_pair)
    if "HIGH" in impacts:
        level = "HIGH"
    elif "MODERATE" in impacts:
        level = "MODERATE"
    else:
        level = "LOW"
    return level, b" / ".join(annotated)


def max_entscan_impact(score_pairs: list[bytes], splice_site_only: bool) -> str:
    """NGSHelper::maxEntScanImpact — impact level only."""
    return max_entscan_impact_annotated(score_pairs, splice_site_only)[0]


@register
class FilterSpliceEffect(FilterBase):
    """FilterCascade.cpp — 'Splice effect' (MaxEntScan + SpliceAi)."""
    NAME = "Splice effect"
    PARAMS = [("MaxEntScan", STRING, "LOW"), ("SpliceAi", DOUBLE, 0.5),
              ("splice_site_only", BOOL, False), ("action", STRING, "KEEP")]

    def _mes_hit(self, mes_anno: bytes, min_mes: str, splice_site_only: bool) -> bool:
        if mes_anno and min_mes != "LOW":
            for entry in mes_anno.split(b","):
                impact = max_entscan_impact(entry.split(b"/"), splice_site_only)
                if impact == "HIGH":
                    return True
                if impact == "MODERATE" and min_mes == "MODERATE":
                    return True
        return False

    @staticmethod
    def _sai_hit(sai_anno: bytes, min_sai: float, splice_site_only: bool) -> bool:
        if not sai_anno or min_sai <= 0:
            return False
        try:
            return float(sai_anno) >= min_sai
        except ValueError:
            pass
        max_score = 0.0
        for entry in sai_anno.split(b","):
            parts = entry.split(b"|")
            if len(parts) != 9:
                raise ValueError("Invalid SpliceAI annotation - not 9 parts: " + entry.decode())
            indices = [2, 4] if splice_site_only else [2, 4, 1, 3]
            for i in indices:
                try:
                    val = float(parts[i])
                except ValueError:
                    continue
                if 0 <= val <= 1:
                    max_score = max(max_score, val)
        return max_score >= min_sai

    def apply(self, gsvar, result):
        idx_sai = _anno_col(gsvar, "SpliceAi")
        idx_mes = _anno_col(gsvar, "MaxEntScan")
        min_sai = self.get("SpliceAi")
        min_mes = self.get("MaxEntScan")
        splice_site_only = self.get("splice_site_only")
        if min_sai == 0 and min_mes == "LOW":
            return
        if self.get("action") == "FILTER":
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    continue
                sai = v.annotations[idx_sai].strip()
                mes = v.annotations[idx_mes].strip()
                if not sai and not mes:
                    result.flags[i] = False
                    continue
                if self._sai_hit(sai, min_sai, splice_site_only):
                    continue
                if self._mes_hit(mes, min_mes, splice_site_only):
                    continue
                result.flags[i] = False
        else:  # KEEP
            for i, v in enumerate(gsvar.variants):
                if result.flags[i]:
                    continue
                if self._sai_hit(v.annotations[idx_sai].strip(), min_sai, splice_site_only):
                    result.flags[i] = True
                    continue
                if self._mes_hit(v.annotations[idx_mes].strip(), min_mes, splice_site_only):
                    result.flags[i] = True


# ------------------------------------------------- additional SNV filters

def _sample_infos(gsvar):
    """(name, column_index, affected, gender) per ##SAMPLE header
    (SampleHeaderInfo, reference NGSHelper.cpp / VariantList sample headers)."""
    out = []
    for raw in gsvar.comments:
        line = raw.strip()
        if not line.startswith(b"##SAMPLE=<"):
            continue
        parts = line[10:-1].split(b",")
        i = 1
        while i < len(parts):
            if b"=" not in parts[i]:
                parts[i - 1] += b"," + parts[i]
                del parts[i]
            else:
                i += 1
        name, props = "", {}
        for part in parts:
            sep = part.find(b"=")
            k = part[:sep].decode()
            v = part[sep + 1:].decode()
            if k == "ID":
                name = v
            else:
                props[k.lower()] = v.lower()
        affected = (props.get("status") == "affected"
                    or props.get("diseasestatus") == "affected")
        gender = props.get("gender", "n/a")
        try:
            col = gsvar.annotation_index(name)
        except KeyError:
            col = -1
        out.append((name, col, affected, gender))
    return out


def _gene_set(text: bytes) -> set[bytes]:
    """GeneSet::createFromText with ',' separator (uppercased, trimmed)."""
    return {g.strip().upper() for g in text.split(b",") if g.strip()}


def _gene_info_terms(anno: bytes):
    """Yield per-gene 'key=value' term lists from a gene_info annotation,
    e.g. 'PRPF31 (inh=AD pLI=0.97), 34P13.14 (inh=n/a pLI=n/a)'."""
    for gene in anno.split(b","):
        start = gene.find(b"(")
        if start == -1:
            continue
        yield gene[start + 1: len(gene) - 1].split(b" ")


@register
class FilterGenes(FilterBase):
    """FilterCascade.cpp:1047-1101 (Genes) — preserves a gene set; '*'
    entries switch to regexp matching."""
    NAME = "Genes"
    PARAMS = [("genes", STRINGLIST, [])]

    def apply(self, gsvar, result):
        genes = {g.strip().upper().encode() for g in self.get("genes") if g.strip()}
        i_gene = _anno_col(gsvar, "gene")
        joined = b"|".join(sorted(genes))
        if b"*" not in joined:
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    continue
                result.flags[i] = bool(genes & _gene_set(v.annotations[i_gene]))
        else:
            import re as _re
            pattern = joined.decode().replace("-", "\\-").replace("*", "[A-Z0-9-]*")
            rx = _re.compile(pattern)
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    continue
                result.flags[i] = any(rx.search(g.decode())
                                      for g in _gene_set(v.annotations[i_gene]))


@register
class FilterGeneInheritance(FilterBase):
    """FilterCascade.cpp:1548-1603 (Gene inheritance) — gene_info inh= modes."""
    NAME = "Gene inheritance"
    PARAMS = [("modes", STRINGLIST, [])]

    def apply(self, gsvar, result):
        modes_passing = set(self.get("modes"))
        i_geneinfo = _anno_col(gsvar, "gene_info")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            passed = False
            for terms in _gene_info_terms(v.annotations[i_geneinfo]):
                for entry in terms:
                    if entry.startswith(b"inh="):
                        for mode in entry[4:].decode().split("+"):
                            if mode in modes_passing:
                                passed = True
            result.flags[i] = passed


@register
class FilterGeneConstraint(FilterBase):
    """FilterCascade.cpp:1605-1660 (Gene constraint) — gene_info oe_lof=."""
    NAME = "Gene constraint"
    PARAMS = [("max_oe_lof", DOUBLE, 0.35)]

    def apply(self, gsvar, result):
        max_oe_lof = self.get("max_oe_lof")
        i_geneinfo = _anno_col(gsvar, "gene_info")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            passed = False
            for terms in _gene_info_terms(v.annotations[i_geneinfo]):
                for entry in terms:
                    if entry.startswith(b"oe_lof="):
                        try:
                            oe = float(entry[7:])
                        except ValueError:
                            continue  # 'n/a' in SNV context > skip
                        if oe <= max_oe_lof:
                            passed = True
            result.flags[i] = passed


@register
class FilterColumnMatchRegexp(FilterBase):
    """FilterCascade.cpp:1945-2007 (Column match) — regexp on a column."""
    NAME = "Column match"
    PARAMS = [("pattern", STRING, ""), ("column", STRING, ""),
              ("action", STRING, "KEEP")]

    def apply(self, gsvar, result):
        import re as _re
        index = _anno_col(gsvar, self.get("column"))
        rx = _re.compile(self.get("pattern").encode())

        def match(v):
            return rx.search(v.annotations[index].strip()) is not None

        _apply_action(gsvar.variants, result, self.get("action"), match)


@register
class FilterPredictionPathogenic(FilterBase):
    """FilterCascade.cpp:2095-2211 (Predicted pathogenic) — phyloP, CADD,
    REVEL and AlphaMissense votes."""
    NAME = "Predicted pathogenic"
    PARAMS = [("min", INT, 1), ("action", STRING, "FILTER"),
              ("skip_high_impact", BOOL, False),
              ("cutoff_phylop", DOUBLE, 1.6), ("cutoff_cadd", DOUBLE, 22.7),
              ("cutoff_revel", DOUBLE, 0.9),
              ("cutoff_alphamissense", DOUBLE, 0.564)]

    def apply(self, gsvar, result):
        min_count = self.get("min")
        i_phylop = _anno_col(gsvar, "phyloP")
        i_cadd = _anno_col(gsvar, "CADD")
        i_revel = _anno_col(gsvar, "REVEL")
        i_am = _anno_col(gsvar, "AlphaMissense", False)  # optional (old files)
        skip_high = self.get("skip_high_impact")
        i_co_sp = _anno_col(gsvar, "coding_and_splicing")
        c_phylop = self.get("cutoff_phylop")
        c_cadd = self.get("cutoff_cadd")
        c_revel = self.get("cutoff_revel")
        c_am = self.get("cutoff_alphamissense")

        def score_at_least(v, idx, cutoff):
            try:
                return float(v.annotations[idx]) >= cutoff
            except ValueError:
                return False

        def pathogenic(v):
            count = 0
            if c_phylop > -10 and score_at_least(v, i_phylop, c_phylop):
                count += 1
            if c_cadd > 0 and score_at_least(v, i_cadd, c_cadd):
                count += 1
            if c_revel > 0 and score_at_least(v, i_revel, c_revel):
                count += 1
            if i_am >= 0 and c_am > 0 and score_at_least(v, i_am, c_am):
                count += 1
            return count >= min_count

        if self.get("action") == "FILTER":
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    continue
                if skip_high and b":HIGH:" in v.annotations[i_co_sp]:
                    continue
                result.flags[i] = pathogenic(v)
        else:  # KEEP
            for i, v in enumerate(gsvar.variants):
                if result.flags[i]:
                    continue
                if skip_high and b":HIGH:" in v.annotations[i_co_sp]:
                    continue
                result.flags[i] = pathogenic(v)


@register
class FilterVariantTypeSO(FilterBase):
    """FilterCascade.cpp:2279-2348 (Variant type) — sequence-ontology terms
    matched against coding_and_splicing."""
    NAME = "Variant type"
    PARAMS = [("HIGH", STRINGLIST, ["frameshift_variant", "splice_acceptor_variant",
                                    "splice_donor_variant", "start_lost",
                                    "start_retained_variant", "stop_gained", "stop_lost"]),
              ("MODERATE", STRINGLIST, ["inframe_deletion", "inframe_insertion",
                                        "missense_variant"]),
              ("LOW", STRINGLIST, ["splice_region_variant"]),
              ("MODIFIER", STRINGLIST, [])]

    def apply(self, gsvar, result):
        types = [t.strip().encode()
                 for key in ("HIGH", "MODERATE", "LOW", "MODIFIER")
                 for t in self.get(key)]
        index = _anno_col(gsvar, "coding_and_splicing")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            result.flags[i] = any(t in v.annotations[index] for t in types)


@register
class FilterTrio(FilterBase):
    """FilterCascade.cpp:2476-2705 (Trio) — de-novo/recessive/comp-het/LOH/
    x-linked/imprinting with AF-corrected genotypes."""
    NAME = "Trio"
    PARAMS = [("types", STRINGLIST, ["de-novo", "recessive", "comp-het",
                                     "LOH", "x-linked"]),
              ("gender_child", STRING, "n/a"), ("build", STRING, "hg38")]

    def apply(self, gsvar, result):
        from ..core.resources import pseudoautosomal_regions
        from ..ngsd.db import _imprinting_genes

        infos = _sample_infos(gsvar)
        gender_child = self.get("gender_child")
        if gender_child == "n/a":
            for _n, _c, affected, gender in infos:
                if affected:
                    gender_child = gender
                    break
        if gender_child == "n/a":
            raise ValueError("Could not determine gender of child, please set it!")

        i_quality = _anno_col(gsvar, "quality")
        i_gene = _anno_col(gsvar, "gene")
        i_c = next((c for _n, c, a, _g in infos if a), -1)
        i_f = next((c for _n, c, a, g in infos if not a and g == "male"), -1)
        i_m = next((c for _n, c, a, g in infos if not a and g == "female"), -1)
        if -1 in (i_c, i_f, i_m):
            raise ValueError("Trio filter requires child, father and mother samples!")
        order = sorted([i_c, i_f, i_m])
        i_af_c, i_af_f, i_af_m = order.index(i_c), order.index(i_f), order.index(i_m)

        par_region = pseudoautosomal_regions(self.get("build"))

        def corrected_genotypes(v):
            geno_c = v.annotations[i_c]
            geno_f = v.annotations[i_f]
            geno_m = v.annotations[i_m]
            for part in v.annotations[i_quality].split(b";"):
                if part.startswith(b"AF="):
                    afs = part[3:].split(b",")
                    if geno_f == b"wt" and 0.05 <= _to_f(afs[i_af_f]) <= 0.3:
                        geno_f = b"het"
                    if geno_m == b"wt" and 0.05 <= _to_f(afs[i_af_m]) <= 0.3:
                        geno_m = b"het"
                    if geno_c == b"het" and _to_f(afs[i_af_c]) < 0.1:
                        geno_c = b"wt"
            return geno_c, geno_f, geno_m

        def diploid(v):
            return (v.chr.is_autosome()
                    or (v.chr.is_x() and gender_child == "female")
                    or (v.chr.is_x() and par_region.overlaps_with(v.chr, v.start, v.end)))

        types = set(self.get("types"))

        genes_comphet = set()
        if "comp-het" in types:
            het_father, het_mother = set(), set()
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    continue
                if not diploid(v):
                    continue
                geno_c, geno_f, geno_m = corrected_genotypes(v)
                if geno_c == b"het" and geno_f == b"het" and geno_m == b"wt":
                    het_mother |= _gene_set(v.annotations[i_gene])
                if geno_c == b"het" and geno_f == b"wt" and geno_m == b"het":
                    het_father |= _gene_set(v.annotations[i_gene])
            genes_comphet = het_mother & het_father

        imprinting = _imprinting_genes() if "imprinting" in types else {}

        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            geno_c, geno_f, geno_m = corrected_genotypes(v)
            if geno_c == b"wt":
                result.flags[i] = False
                continue
            if b"n/a" in (geno_c, geno_f, geno_m):
                result.flags[i] = False
                continue
            dip = diploid(v)
            match = False
            if "de-novo" in types and geno_f == b"wt" and geno_m == b"wt":
                match = True
            if "recessive" in types and dip and (geno_c, geno_f, geno_m) == (b"hom", b"het", b"het"):
                match = True
            if "LOH" in types and dip and geno_c == b"hom" and (
                    (geno_f, geno_m) in ((b"het", b"wt"), (b"wt", b"het"))):
                match = True
            if "comp-het" in types and dip and geno_c == b"het" and (
                    (geno_f, geno_m) in ((b"het", b"wt"), (b"wt", b"het"))):
                if genes_comphet & _gene_set(v.annotations[i_gene]):
                    match = True
            if "x-linked" in types and v.chr.is_x() and gender_child == "male" \
                    and (geno_c, geno_f, geno_m) == (b"hom", b"wt", b"het"):
                match = True
            if "imprinting" in types:
                if (geno_c, geno_f, geno_m) == (b"het", b"het", b"wt"):
                    for gene in _gene_set(v.annotations[i_gene]):
                        info = imprinting.get(gene.decode())
                        if info and info[0] != "maternal":
                            match = True
                if (geno_c, geno_f, geno_m) == (b"het", b"wt", b"het"):
                    for gene in _gene_set(v.annotations[i_gene]):
                        info = imprinting.get(gene.decode())
                        if info and info[0] != "paternal":
                            match = True
            result.flags[i] = match


@register
class FilterOMIM(FilterBase):
    """FilterCascade.cpp:2707-2752 (OMIM genes) — 'OMIM' column non-empty."""
    NAME = "OMIM genes"
    PARAMS = [("action", STRING, "FILTER")]

    def apply(self, gsvar, result):
        index = _anno_col(gsvar, "OMIM")
        keep_nonempty = self.get("action") == "FILTER"
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            empty = v.annotations[index].strip() == b""
            result.flags[i] = (not empty) if keep_nonempty else empty


@register
class FilterConservedness(FilterBase):
    """FilterCascade.cpp:2754-2786 (Conservedness) — phyloP cutoff."""
    NAME = "Conservedness"
    PARAMS = [("min_score", DOUBLE, 1.6)]

    def apply(self, gsvar, result):
        i_phylop = _anno_col(gsvar, "phyloP")
        min_score = self.get("min_score")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            try:
                ok = float(v.annotations[i_phylop]) >= min_score
            except ValueError:
                ok = False
            result.flags[i] = ok


@register
class FilterRegulatory(FilterBase):
    """FilterCascade.cpp:2788-2836 (Regulatory) — 'regulatory' non-empty."""
    NAME = "Regulatory"
    PARAMS = [("action", STRING, "FILTER")]

    def apply(self, gsvar, result):
        index = _anno_col(gsvar, "regulatory")
        keep_nonempty = self.get("action") == "FILTER"
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            empty = v.annotations[index].strip() == b""
            result.flags[i] = (not empty) if keep_nonempty else empty


@register
class FilterSomaticAlleleFrequency(FilterBase):
    """FilterCascade.cpp:5010-5077 (Somatic allele frequency)."""
    NAME = "Somatic allele frequency"
    PARAMS = [("min_af_tum", DOUBLE, 5.0), ("max_af_nor", DOUBLE, 1.0)]

    def apply(self, gsvar, result):
        min_af_tum = self.get("min_af_tum") / 100.0
        if min_af_tum > 0.0:
            i_af = _anno_col(gsvar, "tumor_af")
            for i, v in enumerate(gsvar.variants):
                if result.flags[i] and _to_f(v.annotations[i_af]) < min_af_tum:
                    result.flags[i] = False
        max_af_nor = self.get("max_af_nor") / 100.0
        if max_af_nor < 1.0:
            i_af = _anno_col(gsvar, "normal_af")
            for i, v in enumerate(gsvar.variants):
                if result.flags[i] and _to_f(v.annotations[i_af]) > max_af_nor:
                    result.flags[i] = False


@register
class FilterTumorOnlyHomHet(FilterBase):
    """FilterCascade.cpp:5079-5147 (Tumor zygosity) — drop germline het/hom."""
    NAME = "Tumor zygosity"
    PARAMS = [("het_af_range", DOUBLE, 0.0), ("hom_af_range", DOUBLE, 0.0)]

    def apply(self, gsvar, result):
        het_range = self.get("het_af_range") / 100.0
        if het_range != 0.0:
            i_af = _anno_col(gsvar, "tumor_af")
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    continue
                af = _to_f(v.annotations[i_af])
                if 0.5 - het_range < af < 0.5 + het_range:
                    result.flags[i] = False
        hom_range = self.get("hom_af_range") / 100.0
        if hom_range != 0.0:
            i_af = _anno_col(gsvar, "tumor_af")
            for i, v in enumerate(gsvar.variants):
                if not result.flags[i]:
                    continue
                if _to_f(v.annotations[i_af]) > 1.0 - hom_range:
                    result.flags[i] = False


@register
class FilterGSvarScoreAndRank(FilterBase):
    """FilterCascade.cpp:5149-5186 (GSvar score/rank) — top-X by GSvar_rank."""
    NAME = "GSvar score/rank"
    PARAMS = [("top", INT, 10)]

    def apply(self, gsvar, result):
        top = self.get("top")
        i_rank = _anno_col(gsvar, "GSvar_rank")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            rank = v.annotations[i_rank]
            if not rank or _to_i(rank) > top:
                result.flags[i] = False


@register
class FilterVariantLrSrOverlap(FilterBase):
    """FilterCascade.cpp:5676-5712 (lr short-read overlap)."""
    NAME = "lr short-read overlap"
    PARAMS = [("invert", BOOL, False)]

    def apply(self, gsvar, result):
        invert = self.get("invert")
        index = _anno_col(gsvar, "in_short-read")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            empty = v.annotations[index].strip() == b""
            result.flags[i] = empty if invert else not empty


# ------------------------------------------------- RNA filters

def _rna_multi_value_min(gsvar, result, column, cutoff, absolute=False):
    """Shared RNA pattern: pass if ANY comma-separated value >= cutoff
    (n/a and empty entries skipped; no valid entry -> fail)."""
    idx = _anno_col(gsvar, column)
    import math as _math
    for i, v in enumerate(gsvar.variants):
        if not result.flags[i]:
            continue
        passed = False
        for part in v.annotations[idx].split(b","):
            if not part or part.startswith(b"n/a"):
                continue
            val = float(part)
            if absolute:
                val = _math.fabs(val)
            if val >= cutoff:
                passed = True
                break
        result.flags[i] = passed


@register
class FilterVariantRNAAseAlleleFrequency(FilterBase):
    """FilterCascade.cpp:5344-5389 (RNA ASE allele frequency)."""
    NAME = "RNA ASE allele frequency"
    PARAMS = [("min_af", DOUBLE, 0.0), ("max_af", DOUBLE, 1.0)]

    def apply(self, gsvar, result):
        min_af, max_af = self.get("min_af"), self.get("max_af")
        idx = _anno_col(gsvar, "ASE_af")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            s = v.annotations[idx].strip()
            if not s or s.startswith(b"n/a"):
                result.flags[i] = False
                continue
            af = float(s)
            result.flags[i] = min_af <= af <= max_af


@register
class FilterVariantRNAAseDepth(FilterBase):
    """FilterCascade.cpp:5390-5422 (RNA ASE depth)."""
    NAME = "RNA ASE depth"
    PARAMS = [("min_depth", INT, 20)]

    def apply(self, gsvar, result):
        min_depth = self.get("min_depth")
        idx = _anno_col(gsvar, "ASE_depth")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            result.flags[i] = int(v.annotations[idx]) >= min_depth


@register
class FilterVariantRNAAseAlt(FilterBase):
    """FilterCascade.cpp:5423-5462 (RNA ASE alternative count)."""
    NAME = "RNA ASE alternative count"
    PARAMS = [("min_ac", INT, 5)]

    def apply(self, gsvar, result):
        min_ac = self.get("min_ac")
        idx = _anno_col(gsvar, "ASE_alt")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            s = v.annotations[idx].strip()
            if not s or s.startswith(b"n/a"):
                result.flags[i] = False
                continue
            result.flags[i] = int(s) >= min_ac


@register
class FilterVariantRNAAsePval(FilterBase):
    """FilterCascade.cpp:5464-5504 (RNA ASE p-value)."""
    NAME = "RNA ASE p-value"
    PARAMS = [("max_pval", DOUBLE, 0.05)]

    def apply(self, gsvar, result):
        max_pval = self.get("max_pval")
        idx = _anno_col(gsvar, "ASE_pval")
        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            s = v.annotations[idx].strip()
            if not s or s.startswith(b"n/a"):
                result.flags[i] = False
                continue
            result.flags[i] = float(s) <= max_pval


@register
class FilterVariantRNAAberrantSplicing(FilterBase):
    """FilterCascade.cpp:5506-5547 (RNA aberrant splicing fraction)."""
    NAME = "RNA aberrant splicing fraction"
    PARAMS = [("min_asf", DOUBLE, 0.01)]

    def apply(self, gsvar, result):
        _rna_multi_value_min(gsvar, result, "aberrant_splicing", self.get("min_asf"))


@register
class FilterVariantRNAGeneExpression(FilterBase):
    """FilterCascade.cpp:5549-5589 (RNA gene expression, TPM)."""
    NAME = "RNA gene expression"
    PARAMS = [("min_tpm", DOUBLE, 5.0)]

    def apply(self, gsvar, result):
        _rna_multi_value_min(gsvar, result, "tpm", self.get("min_tpm"))


@register
class FilterVariantRNAExpressionFC(FilterBase):
    """FilterCascade.cpp:5591-5631 (RNA expression fold-change, abs log2)."""
    NAME = "RNA expression fold-change"
    PARAMS = [("min_fc", DOUBLE, 2.0)]

    def apply(self, gsvar, result):
        _rna_multi_value_min(gsvar, result, "expr_log2fc", self.get("min_fc"),
                             absolute=True)


@register
class FilterVariantRNAExpressionZScore(FilterBase):
    """FilterCascade.cpp:5633-5674 (RNA expression z-score, abs)."""
    NAME = "RNA expression z-score"
    PARAMS = [("min_zscore", DOUBLE, 2.0)]

    def apply(self, gsvar, result):
        _rna_multi_value_min(gsvar, result, "expr_zscore", self.get("min_zscore"),
                             absolute=True)


# ------------------------------------------------- additional CNV filters

@register
class FilterCnvAlleleFrequency(FilterBase):
    """FilterCascade.cpp:2966-3001 (CNV allele frequency) — potential_AF."""
    NAME = "CNV allele frequency"
    TYPE = "cnv"
    PARAMS = [("max_af", DOUBLE, 0.05)]

    def apply(self, cnvs, result):
        max_af = self.get("max_af")
        i_af = cnvs.annotation_index_by_name(b"potential_AF", True)
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            if _to_f(v.annotations[i_af]) > max_af:
                result.flags[i] = False


@register
class FilterCnvMaxLoglikelihood(FilterBase):
    """FilterCascade.cpp:3003-3050 (CNV maximum log-likelihood) —
    tumor-normal pairs only; no-op on other list types."""
    NAME = "CNV maximum log-likelihood"
    TYPE = "cnv"
    PARAMS = [("max_ll", DOUBLE, 200.0), ("scale_by_regions", BOOL, False)]

    def apply(self, cnvs, result):
        if cnvs.type != "tumor_normal":
            return
        max_ll = self.get("max_ll")
        scale = self.get("scale_by_regions")
        i_ll = cnvs.annotation_index_by_name(b"loglikelihood", True)
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            ll = _to_f(v.annotations[i_ll])
            if scale:
                if v.num_regs < 1:
                    raise ValueError("Invalid/unset number of regions!")
                ll = ll / v.num_regs
            if ll > max_ll:
                result.flags[i] = False


@register
class FilterCnvCompHet(FilterBase):
    """FilterCascade.cpp:3198-3267 (CNV compound-heterozygous).

    ``het_hit_genes`` (set of uppercased gene symbols) is injected by the
    caller for mode CNV-SNV/INDEL, like the reference's setHetHitGenes."""
    NAME = "CNV compound-heterozygous"
    TYPE = "cnv"
    PARAMS = [("mode", STRING, "n/a")]

    def __init__(self):
        super().__init__()
        self.het_hit_genes: set[bytes] = set()

    def apply(self, cnvs, result):
        mode = self.get("mode")
        if mode == "n/a":
            return
        gene_count: dict[bytes, int] = {}
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            for gene in v.genes:
                g = gene.strip().upper()
                gene_count[g] = gene_count.get(g, 0) + 1
        if mode == "CNV-CNV":
            comphet_hit = {g for g, n in gene_count.items() if n > 1}
        else:  # CNV-SNV/INDEL
            comphet_hit = {g for g in gene_count if g in self.het_hit_genes}
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            result.flags[i] = any(g.strip().upper() in comphet_hit for g in v.genes)


@register
class FilterCnvCnpOverlap(FilterBase):
    """FilterCascade.cpp:3317-3351 (CNV polymorphism region) — first 5 chars
    of the CNP column parsed as overlap fraction."""
    NAME = "CNV polymorphism region"
    TYPE = "cnv"
    PARAMS = [("column", STRING, "overlap af_genomes_imgag"), ("max_ol", DOUBLE, 0.95)]

    def apply(self, cnvs, result):
        index = cnvs.annotation_index_by_name(self.get("column").encode(), True)
        max_ol = self.get("max_ol")
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            if _to_f(v.annotations[index][:5]) > max_ol:
                result.flags[i] = False


@register
class FilterCnvGeneConstraint(FilterBase):
    """FilterCascade.cpp:3353-3408 (CNV gene constraint) — gene_info oe_lof=,
    unparsable values count as 1.0 (pass-through)."""
    NAME = "CNV gene constraint"
    TYPE = "cnv"
    PARAMS = [("max_oe_lof", DOUBLE, 0.35)]

    def apply(self, cnvs, result):
        i_geneinfo = cnvs.annotation_index_by_name(b"gene_info", True)
        max_oe_lof = self.get("max_oe_lof")
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            passed = False
            for terms in _gene_info_terms(v.annotations[i_geneinfo]):
                for term in terms:
                    if term.startswith(b"oe_lof="):
                        try:
                            oe = float(term[7:])
                        except ValueError:
                            oe = 1.0  # value 'n/a' > pass
                        if oe <= max_oe_lof:
                            passed = True
            result.flags[i] = passed


@register
class FilterCnvTumorCopyNumberChange(FilterBase):
    """FilterCascade.cpp:3410-3442 (CNV tumor CN change)."""
    NAME = "CNV tumor CN change"
    TYPE = "cnv"
    PARAMS = [("min_tumor_cn", INT, 0), ("max_tumor_cn", INT, 10)]

    def apply(self, cnvs, result):
        i_cn = cnvs.annotation_index_by_name(b"tumor_CN_change", True)
        min_cn, max_cn = self.get("min_tumor_cn"), self.get("max_tumor_cn")
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            try:
                cn = float(v.annotations[i_cn].strip())
            except ValueError:
                continue  # unparsable > keep
            result.flags[i] = min_cn <= cn <= max_cn


@register
class FilterCnvClonality(FilterBase):
    """FilterCascade.cpp:3444-3478 (CNV clonality) — strict bounds."""
    NAME = "CNV clonality"
    TYPE = "cnv"
    PARAMS = [("min_clonality", DOUBLE, 0.0), ("max_clonality", DOUBLE, 1.0)]

    def apply(self, cnvs, result):
        i_clon = cnvs.annotation_index_by_name(b"tumor_clonality", True)
        min_c, max_c = self.get("min_clonality"), self.get("max_clonality")
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            try:
                clonality = float(v.annotations[i_clon].strip())
            except ValueError:
                continue  # unparsable > keep
            result.flags[i] = min_c < clonality < max_c


@register
class FilterCnvGeneOverlap(FilterBase):
    """FilterCascade.cpp:3479-3540 (CNV gene overlap) — gene_info region=."""
    NAME = "CNV gene overlap"
    TYPE = "cnv"
    PARAMS = [("complete", BOOL, True), ("exonic/splicing", BOOL, True),
              ("intronic/intergenic", BOOL, False)]

    def _selected(self):
        out = []
        if self.get("complete"):
            out.append(b"complete")
        if self.get("exonic/splicing"):
            out.append(b"exonic/splicing")
        if self.get("intronic/intergenic"):
            out.append(b"intronic/intergenic")
        return out

    def apply(self, cnvs, result):
        i_geneinfo = cnvs.annotation_index_by_name(b"gene_info", True)
        selected = self._selected()
        for i, v in enumerate(cnvs.variants):
            if not result.flags[i]:
                continue
            passed = False
            for terms in _gene_info_terms(v.annotations[i_geneinfo]):
                for term in terms:
                    if term.startswith(b"region=") and term[7:] in selected:
                        passed = True
            result.flags[i] = passed


@register
class FilterCnvPathogenicCnvOverlap(FilterBase):
    """FilterCascade.cpp:3542-3594 (CNV pathogenic CNV overlap)."""
    NAME = "CNV pathogenic CNV overlap"
    TYPE = "cnv"
    PARAMS = [("action", STRING, "FILTER")]

    def apply(self, cnvs, result):
        index = cnvs.annotation_index_by_name(b"ngsd_pathogenic_cnvs", True)
        action = self.get("action")
        if action == "FILTER":
            for i, v in enumerate(cnvs.variants):
                if result.flags[i] and v.annotations[index].strip() == b"":
                    result.flags[i] = False
        elif action == "KEEP":
            for i, v in enumerate(cnvs.variants):
                if v.annotations[index].strip() != b"":
                    result.flags[i] = True
        else:
            raise ValueError(f"Invalid action '{action}'provided!")


# ------------------------------------------------- additional SV filters

def _sv_is_affected(info) -> bool:
    props = {k.lower(): v.lower() for k, v in info.properties.items()}
    return (props.get("status") == "affected"
            or props.get("diseasestatus") == "affected")


def _sv_gender(info) -> str:
    props = {k.lower(): v.lower() for k, v in info.properties.items()}
    return props.get("gender", "n/a")


def _sv_geno_from_gt(gt: bytes, allow_phased: bool) -> bytes:
    """GT string -> GSvar genotype (FilterSvGenotypeControl accepts only
    '0/1'/'1/0'; FilterSvGenotypeAffected additionally accepts phased
    '0|1'/'1|0' — the asymmetry is mirrored from the reference)."""
    gt = gt.strip()
    if gt in (b"0/1", b"1/0") or (allow_phased and gt in (b"0|1", b"1|0")):
        return b"het"
    if gt == b"1/1":
        return b"hom"
    if gt == b"0/0":
        return b"wt"
    return b"n/a"


def _sv_format_data_indices(svs, affected: bool, name: str) -> list[int]:
    """Data-column indices for affected/control samples; single-sample lists
    use FORMAT+1 for affected."""
    fmt = svs.format()
    if affected and fmt not in ("germline_multi", "germline_trio"):
        i_format = svs.annotation_index_by_name(b"FORMAT")
        return [i_format + 1]
    out = [info.column_index for info in svs.sample_header_info
           if _sv_is_affected(info) == affected and info.column_index != -1]
    if not out:
        kind = "affected" if affected else "control"
        raise ValueError(f"Cannot apply filter '{name}' to variant list "
                         f"without {kind} samples!")
    return out


def _sv_gt_index(svs, sv, i_format, name: str) -> int:
    keys = sv.annotations[i_format].split(b":")
    try:
        return keys.index(b"GT")
    except ValueError:
        raise ValueError(f"Cannot apply filter '{name}' to variant list "
                         "because could not find GT field in format column.")


@register
class FilterSvGenotypeControl(FilterBase):
    """FilterCascade.cpp:3669-3743 (SV genotype control)."""
    NAME = "SV genotype control"
    TYPE = "sv"
    PARAMS = [("genotypes", STRINGLIST, []), ("same_genotype", BOOL, False)]

    def apply(self, svs, result):
        data_indices = _sv_format_data_indices(svs, False, self.NAME)
        genotypes = [g.encode() for g in self.get("genotypes")]
        same_genotype = self.get("same_genotype")
        i_format = svs.annotation_index_by_name(b"FORMAT")
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            gt_idx = _sv_gt_index(svs, sv, i_format, self.NAME)
            seen = set()
            for data_idx in data_indices:
                values = sv.annotations[data_idx].split(b":")
                geno = _sv_geno_from_gt(values[gt_idx], allow_phased=False)
                if geno not in genotypes:
                    result.flags[i] = False
                seen.add(geno)
            if same_genotype and len(seen) > 1:
                result.flags[i] = False


@register
class FilterSvGenotypeAffected(FilterBase):
    """FilterCascade.cpp:3745-3825 (SV genotype affected)."""
    NAME = "SV genotype affected"
    TYPE = "sv"
    PARAMS = [("genotypes", STRINGLIST, []), ("same_genotype", BOOL, False)]

    def apply(self, svs, result):
        data_indices = _sv_format_data_indices(svs, True, self.NAME)
        genotypes = [g.encode() for g in self.get("genotypes")]
        same_genotype = self.get("same_genotype")
        i_format = svs.annotation_index_by_name(b"FORMAT")
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            gt_idx = _sv_gt_index(svs, sv, i_format, self.NAME)
            seen = set()
            for data_idx in data_indices:
                values = sv.annotations[data_idx].split(b":")
                geno = _sv_geno_from_gt(values[gt_idx], allow_phased=True)
                if geno not in genotypes:
                    result.flags[i] = False
                seen.add(geno)
            if same_genotype and len(seen) > 1:
                result.flags[i] = False


@register
class FilterSvQuality(FilterBase):
    """FilterCascade.cpp:3827-3866 (SV quality) — QUAL column cutoff."""
    NAME = "SV quality"
    TYPE = "sv"
    PARAMS = [("quality", INT, 0)]

    def apply(self, svs, result):
        if svs.format() == "somatic_tumor_normal":
            raise ValueError(f"Filter '{self.NAME}' cannot be applied to "
                             "somatic tumor normal sample!")
        min_quality = self.get("quality")
        i_qual = svs.annotation_index_by_name(b"QUAL")
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            result.flags[i] = float(sv.annotations[i_qual]) >= min_quality


def _sv_read_af_apply(svs, result, name, key, center, only_affected):
    """Shared PR/SR allele-frequency window check (+/- 10%)."""
    if svs.format() == "somatic_tumor_normal":
        raise ValueError(f"Filter '{name}' cannot be applied to somatic "
                         "tumor normal sample!")
    upper, lower = center + 0.1, center - 0.1
    i_format = svs.annotation_index_by_name(b"FORMAT")
    multi = svs.format() in ("germline_multi", "germline_trio")
    sample_count = len(svs.sample_header_info) if multi else 1
    for i, sv in enumerate(svs.lines):
        if not result.flags[i]:
            continue
        keys = sv.annotations[i_format].split(b":")
        try:
            key_idx = keys.index(key)
        except ValueError:
            if key == b"SR":
                # SVs without split-read info (e.g. DUP) are removed
                result.flags[i] = False
                continue
            raise ValueError(f"Missing {key.decode()} entry in SV {i}!")
        for sample_idx in range(sample_count):
            if multi and only_affected \
                    and not _sv_is_affected(svs.sample_header_info[sample_idx]):
                continue
            values = sv.annotations[i_format + sample_idx + 1].split(b":")
            entry = values[key_idx].split(b",")
            if len(entry) != 2:
                raise ValueError(f"Invalid paired read entry ({key.decode()}) "
                                 f"in sv {i}!")
            ref, alt = int(entry[0]), int(entry[1])
            af = alt / (alt + ref) if alt + ref != 0 else 0.0
            if af > upper or af < lower:
                result.flags[i] = False
                break


@register
class FilterSvPairedReadAF(FilterBase):
    """FilterCascade.cpp:3939-4023 (SV paired read AF)."""
    NAME = "SV paired read AF"
    TYPE = "sv"
    PARAMS = [("Paired Read AF", DOUBLE, 0.0), ("only_affected", BOOL, False)]

    def apply(self, svs, result):
        _sv_read_af_apply(svs, result, self.NAME, b"PR",
                          self.get("Paired Read AF"), self.get("only_affected"))


@register
class FilterSvSplitReadAF(FilterBase):
    """FilterCascade.cpp:4025-4115 (SV split read AF)."""
    NAME = "SV split read AF"
    TYPE = "sv"
    PARAMS = [("Split Read AF", DOUBLE, 0.0), ("only_affected", BOOL, False)]

    def apply(self, svs, result):
        _sv_read_af_apply(svs, result, self.NAME, b"SR",
                          self.get("Split Read AF"), self.get("only_affected"))


@register
class FilterSvPeReadDepth(FilterBase):
    """FilterCascade.cpp:4117-4194 (SV PE read depth) — PR alt count."""
    NAME = "SV PE read depth"
    TYPE = "sv"
    PARAMS = [("PE Read Depth", INT, 0), ("only_affected", BOOL, False)]

    def apply(self, svs, result):
        if svs.format() == "somatic_tumor_normal":
            raise ValueError(f"Filter '{self.NAME}' cannot be applied to "
                             "somatic tumor normal samples!")
        min_depth = self.get("PE Read Depth")
        only_affected = self.get("only_affected")
        i_format = svs.annotation_index_by_name(b"FORMAT")
        multi = svs.format() in ("germline_multi", "germline_trio")
        sample_count = len(svs.sample_header_info) if multi else 1
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            keys = sv.annotations[i_format].split(b":")
            try:
                pr_idx = keys.index(b"PR")
            except ValueError:
                raise ValueError(f"Missing paired read entry (PR) in SV {i}!")
            for sample_idx in range(sample_count):
                if multi and only_affected \
                        and not _sv_is_affected(svs.sample_header_info[sample_idx]):
                    continue
                values = sv.annotations[i_format + sample_idx + 1].split(b":")
                entry = values[pr_idx].split(b",")
                if len(entry) != 2:
                    raise ValueError(f"Invalid paired read entry (PR) in SV {i}!")
                if int(entry[1]) < min_depth:
                    result.flags[i] = False
                    break


@register
class FilterSvSomaticscore(FilterBase):
    """FilterCascade.cpp:4196-4241 (SV SomaticScore)."""
    NAME = "SV SomaticScore"
    TYPE = "sv"
    PARAMS = [("Somaticscore", INT, 0)]

    def apply(self, svs, result):
        if svs.format() != "somatic_tumor_normal":
            raise ValueError(f"Filter '{self.NAME}' can only be applied to "
                             "somatic tumor normal samples!")
        min_score = self.get("Somaticscore")
        i_score = svs.annotation_index_by_name(b"SOMATICSCORE")
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            result.flags[i] = min_score <= float(sv.annotations[i_score])


@register
class FilterSvGeneConstraint(FilterBase):
    """FilterCascade.cpp:4243-4307 (SV gene constraint) — GENE_INFO oe_lof=."""
    NAME = "SV gene constraint"
    TYPE = "sv"
    PARAMS = [("max_oe_lof", DOUBLE, 0.35)]

    def apply(self, svs, result):
        i_gene_info = svs.annotation_index_by_name(b"GENE_INFO", True)
        if i_gene_info == -1:
            raise ValueError("No 'GENE_INFO' column found in BEDPE file! "
                             "Please reannotate structural variant file.")
        max_oe_lof = self.get("max_oe_lof")
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            passed = False
            for terms in _gene_info_terms(sv.annotations[i_gene_info]):
                for term in terms:
                    if term.startswith(b"oe_lof="):
                        try:
                            oe = float(term[7:])
                        except ValueError:
                            oe = 1.0  # value 'n/a' > pass
                        if oe <= max_oe_lof:
                            passed = True
                            break
                if passed:
                    break
            result.flags[i] = passed


@register
class FilterSvGeneOverlap(FilterBase):
    """FilterCascade.cpp:4309-4379 (SV gene overlap) — GENE_INFO region=;
    the 'intronic/near gene' option maps to region value
    'intronic/intergenic' like in the reference."""
    NAME = "SV gene overlap"
    TYPE = "sv"
    PARAMS = [("complete", BOOL, True), ("exonic/splicing", BOOL, True),
              ("intronic/near gene", BOOL, False)]

    def _selected(self):
        out = []
        if self.get("complete"):
            out.append(b"complete")
        if self.get("exonic/splicing"):
            out.append(b"exonic/splicing")
        if self.get("intronic/near gene"):
            out.append(b"intronic/intergenic")
        return out

    def apply(self, svs, result):
        i_gene_info = svs.annotation_index_by_name(b"GENE_INFO", True)
        if i_gene_info == -1:
            raise ValueError("No 'GENE_INFO' column found in BEDPE file! "
                             "Please reannotate structural variant file.")
        selected = self._selected()
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            passed = False
            for terms in _gene_info_terms(sv.annotations[i_gene_info]):
                for term in terms:
                    if term.startswith(b"region=") and term[7:] in selected:
                        passed = True
                        break
                if passed:
                    break
            result.flags[i] = passed


@register
class FilterSvCompHet(FilterBase):
    """FilterCascade.cpp:4470-4544 (SV compound-heterozygous); see
    FilterCnvCompHet for het_hit_genes injection."""
    NAME = "SV compound-heterozygous"
    TYPE = "sv"
    PARAMS = [("mode", STRING, "n/a")]

    def __init__(self):
        super().__init__()
        self.het_hit_genes: set[bytes] = set()

    def apply(self, svs, result):
        mode = self.get("mode")
        if mode == "n/a":
            return
        i_genes = svs.annotation_index_by_name(b"GENES")
        gene_count: dict[bytes, int] = {}
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            for g in _gene_set(sv.annotations[i_genes]):
                gene_count[g] = gene_count.get(g, 0) + 1
        if mode == "SV-SV":
            comphet_hit = {g for g, n in gene_count.items() if n > 1}
        else:  # SV-SNV/INDEL
            comphet_hit = {g for g in gene_count if g in self.het_hit_genes}
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            result.flags[i] = bool(_gene_set(sv.annotations[i_genes]) & comphet_hit)


@register
class FilterSvCountNGSD(FilterBase):
    """FilterCascade.cpp:4546-4661 (SV count NGSD) — NGSD_HOM/NGSD_HET
    annotation counts, with pre-2022 NGSD_COUNT fallback."""
    NAME = "SV count NGSD"
    TYPE = "sv"
    PARAMS = [("max_count", INT, 20), ("ignore_genotype", BOOL, False)]

    def apply(self, svs, result):
        max_count = self.get("max_count")
        idx_old = svs.annotation_index_by_name(b"NGSD_COUNT", False)
        if idx_old != -1 and svs.annotation_index_by_name(b"NGSD_HOM", False) == -1:
            for i, sv in enumerate(svs.lines):
                if not result.flags[i]:
                    continue
                text = sv.annotations[idx_old]
                if b"(" in text:
                    text = text.split(b"(")[0]
                result.flags[i] = int(text) <= max_count
            return
        idx_hom = svs.annotation_index_by_name(b"NGSD_HOM")
        idx_het = svs.annotation_index_by_name(b"NGSD_HET")
        if self.get("ignore_genotype"):
            for i, sv in enumerate(svs.lines):
                if not result.flags[i]:
                    continue
                total = int(sv.annotations[idx_hom]) + int(sv.annotations[idx_het])
                result.flags[i] = total <= max_count
            return
        i_format = svs.annotation_index_by_name(b"FORMAT")
        if i_format < 0:
            raise ValueError(f"Cannot apply filter '{self.NAME}' to structural "
                             "variant list without 'FORMAT' column!")
        data_indices = _sv_format_data_indices(svs, True, self.NAME)
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            gt_idx = _sv_gt_index(svs, sv, i_format, self.NAME)
            count_hom = int(sv.annotations[idx_hom])
            count_het = int(sv.annotations[idx_het])
            for data_idx in data_indices:
                values = sv.annotations[data_idx].split(b":")
                gt = values[gt_idx].strip()
                result.flags[i] = False
                count = count_hom if gt == b"1/1" else count_het
                if count <= max_count:
                    result.flags[i] = True
                    break


@register
class FilterSvAfNGSD(FilterBase):
    """FilterCascade.cpp:4663-4721 (SV allele frequency NGSD)."""
    NAME = "SV allele frequency NGSD"
    TYPE = "sv"
    PARAMS = [("max_af", DOUBLE, 1.0)]

    def apply(self, svs, result):
        max_af = self.get("max_af") / 100.0
        idx_old = svs.annotation_index_by_name(b"NGSD_COUNT", False)
        if idx_old != -1 and svs.annotation_index_by_name(b"NGSD_AF", False) == -1:
            for i, sv in enumerate(svs.lines):
                if not result.flags[i]:
                    continue
                text = sv.annotations[idx_old]
                if b"(" in text:
                    text = text.split(b"(")[0]
                if b")" in text:
                    text = text.split(b")")[0]
                result.flags[i] = float(text) <= max_af
            return
        idx_af = svs.annotation_index_by_name(b"NGSD_AF")
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            raw = sv.annotations[idx_af].strip()
            result.flags[i] = True if raw == b"" else float(raw) <= max_af


@register
class FilterSvBreakpointDensityNGSD(FilterBase):
    """FilterCascade.cpp:4723-4781 (SV break point density NGSD)."""
    NAME = "SV break point density NGSD"
    TYPE = "sv"
    PARAMS = [("max_density", INT, 20), ("remove_strict", BOOL, False),
              ("only_system_specific", BOOL, False)]

    def apply(self, svs, result):
        max_density = self.get("max_density")
        remove_strict = self.get("remove_strict")
        col = (b"NGSD_SV_BREAKPOINT_DENSITY_SYS" if self.get("only_system_specific")
               else b"NGSD_SV_BREAKPOINT_DENSITY")
        idx = svs.annotation_index_by_name(col)
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            density = sv.annotations[idx]
            if density.strip() == b"":
                continue
            parts = density.split(b"/")
            if len(parts) == 1:
                result.flags[i] = int(density) <= max_density
            elif remove_strict:
                result.flags[i] = (int(parts[0]) <= max_density
                                   and int(parts[1]) <= max_density)
            else:
                result.flags[i] = (int(parts[0]) <= max_density
                                   or int(parts[1]) <= max_density)


@register
class FilterSvTrio(FilterBase):
    """FilterCascade.cpp:4783-5008 (SV trio)."""
    NAME = "SV trio"
    TYPE = "sv"
    PARAMS = [("types", STRINGLIST, ["de-novo", "recessive", "comp-het",
                                     "LOH", "x-linked"]),
              ("gender_child", STRING, "n/a"), ("build", STRING, "hg19")]

    @staticmethod
    def _genotype(format_col: bytes, data_col: bytes) -> bytes:
        keys = format_col.split(b":")
        values = data_col.split(b":")
        try:
            gt_idx = keys.index(b"GT")
        except ValueError:
            raise ValueError("No genotype entry found for SV!")
        gt = values[gt_idx]
        if gt in (b"0/1", b"1/0"):
            return b"het"
        if gt == b"1/1":
            return b"hom"
        if gt == b"0/0":
            return b"wt"
        return b"n/a"

    def apply(self, svs, result):
        from ..core.resources import pseudoautosomal_regions
        from ..ngsd.db import _imprinting_genes

        if svs.format() != "germline_trio":
            raise ValueError("Trio filter can only be applied to trio SV samples!")
        gender_child = self.get("gender_child")
        if gender_child == "n/a":
            for info in svs.sample_header_info:
                if _sv_is_affected(info):
                    gender_child = _sv_gender(info)
                    break
        if gender_child == "n/a":
            raise ValueError("Could not determine gender of child, please set it!")

        i_gene = svs.annotation_index_by_name(b"GENES")
        i_c = next((x.column_index for x in svs.sample_header_info
                    if _sv_is_affected(x)), -1)
        i_f = next((x.column_index for x in svs.sample_header_info
                    if not _sv_is_affected(x) and _sv_gender(x) == "male"), -1)
        i_m = next((x.column_index for x in svs.sample_header_info
                    if not _sv_is_affected(x) and _sv_gender(x) == "female"), -1)
        i_format = svs.annotation_index_by_name(b"FORMAT")
        par_region = pseudoautosomal_regions(self.get("build"))
        types = set(self.get("types"))

        def diploid(sv):
            region = sv.affected_region()
            dip = (sv.chr1.is_autosome()
                   or (sv.chr1.is_x() and gender_child == "female")
                   or (sv.chr1.is_x() and par_region.overlaps_with(
                       region[0].chr, region[0].start, region[0].end)))
            if sv.type == b"BND":
                dip = (dip or sv.chr2.is_autosome()
                       or (sv.chr2.is_x() and gender_child == "female")
                       or (sv.chr2.is_x() and par_region.overlaps_with(
                           region[1].chr, region[1].start, region[1].end)))
            return dip

        def genos(sv):
            fmt = sv.annotations[i_format]
            return (self._genotype(fmt, sv.annotations[i_c]),
                    self._genotype(fmt, sv.annotations[i_f]),
                    self._genotype(fmt, sv.annotations[i_m]))

        genes_comphet = set()
        if "comp-het" in types:
            het_father, het_mother = set(), set()
            for i, sv in enumerate(svs.lines):
                if not result.flags[i]:
                    continue
                if not diploid(sv):
                    continue
                geno_c, geno_f, geno_m = genos(sv)
                if (geno_c, geno_f, geno_m) == (b"het", b"het", b"wt"):
                    het_mother |= _gene_set(sv.annotations[i_gene])
                if (geno_c, geno_f, geno_m) == (b"het", b"wt", b"het"):
                    het_father |= _gene_set(sv.annotations[i_gene])
            genes_comphet = het_mother & het_father

        imprinting = _imprinting_genes() if "imprinting" in types else {}

        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            geno_c, geno_f, geno_m = genos(sv)
            if geno_c == b"wt":
                result.flags[i] = False
                continue
            if b"n/a" in (geno_c, geno_f, geno_m):
                result.flags[i] = False
                continue
            dip = diploid(sv)
            match = False
            if "de-novo" in types and geno_f == b"wt" and geno_m == b"wt":
                match = True
            if "recessive" in types and dip \
                    and (geno_c, geno_f, geno_m) == (b"hom", b"het", b"het"):
                match = True
            if "LOH" in types and dip and geno_c == b"hom" \
                    and (geno_f, geno_m) in ((b"het", b"wt"), (b"wt", b"het")):
                match = True
            if "comp-het" in types and dip and geno_c == b"het" \
                    and (geno_f, geno_m) in ((b"het", b"wt"), (b"wt", b"het")):
                if genes_comphet & _gene_set(sv.annotations[i_gene]):
                    match = True
            if "x-linked" in types and sv.chr1.is_x() and sv.chr2.is_x() \
                    and gender_child == "male" \
                    and (geno_c, geno_f, geno_m) == (b"hom", b"wt", b"het"):
                match = True
            if "imprinting" in types:
                if (geno_c, geno_f, geno_m) == (b"het", b"het", b"wt"):
                    for gene in _gene_set(sv.annotations[i_gene]):
                        info = imprinting.get(gene.decode())
                        if info and info[0] != "maternal":
                            match = True
                if (geno_c, geno_f, geno_m) == (b"het", b"wt", b"het"):
                    for gene in _gene_set(sv.annotations[i_gene]):
                        info = imprinting.get(gene.decode())
                        if info and info[0] != "paternal":
                            match = True
            result.flags[i] = match


@register
class FilterSvCnvOverlap(FilterBase):
    """FilterCascade.cpp:5714-5756 (SV CNV overlap)."""
    NAME = "SV CNV overlap"
    TYPE = "sv"
    PARAMS = [("min_ol", DOUBLE, 0.50), ("min_size", INT, 10000)]

    def apply(self, svs, result):
        min_ol = self.get("min_ol")
        min_size = self.get("min_size")
        ol_col = svs.annotation_index_by_name(b"CNV_OVERLAP")
        if ol_col == -1:
            raise ValueError("Missing column CNV_OVERLAP")
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            ol_str = sv.annotations[ol_col].strip()
            if ol_str == b"":
                continue  # not DEL/DUP
            if svs.estimated_sv_size(i) < min_size:
                continue  # too small for CNV calling support
            if _to_f(ol_str) < min_ol:
                result.flags[i] = False


@register
class FilterSvLrAF(FilterBase):
    """FilterCascade.cpp:5758-5817 (SV-lr AF) — long-read AF window."""
    NAME = "SV-lr AF"
    TYPE = "sv"
    PARAMS = [("min_af", DOUBLE, 0.0), ("max_af", DOUBLE, 1.0)]

    def apply(self, svs, result):
        if svs.format() == "somatic_tumor_normal":
            raise ValueError(f"Filter '{self.NAME}' cannot be applied to "
                             "somatic tumor normal sample!")
        if svs.format() in ("germline_multi", "germline_trio"):
            raise ValueError(f"Filter '{self.NAME}' cannot be applied on "
                             "multi-samples!")
        upper = self.get("max_af")
        lower = self.get("min_af")
        col = svs.annotation_index_by_name(b"AF", False)
        if col == -1:
            col = svs.annotation_index_by_name(b"VAF")
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            raw = sv.annotations[col]
            if raw == b"":
                continue  # no AF due to insufficient coverage > keep
            af = float(raw)
            if af > upper or af < lower:
                result.flags[i] = False


@register
class FilterSvLrSupportReads(FilterBase):
    """FilterCascade.cpp:5819-5853 (SV-lr support reads)."""
    NAME = "SV-lr support reads"
    TYPE = "sv"
    PARAMS = [("min_support", INT, 5)]

    def apply(self, svs, result):
        col = svs.annotation_index_by_name(b"SUPPORT")
        min_support = self.get("min_support")
        for i, sv in enumerate(svs.lines):
            if not result.flags[i]:
                continue
            if int(sv.annotations[col]) < min_support:
                result.flags[i] = False


@register
class FilterSvPathogenic(FilterBase):
    """FilterCascade.cpp:5855-5903 (SV annotated pathogenic)."""
    NAME = "SV annotated pathogenic"
    TYPE = "sv"
    PARAMS = [("action", STRING, "FILTER")]

    def apply(self, svs, result):
        index = svs.annotation_index_by_name(b"NGSD_PATHOGENIC_SVS", True)
        action = self.get("action")
        if action == "FILTER":
            for i, sv in enumerate(svs.lines):
                if result.flags[i] and sv.annotations[index].strip() == b"":
                    result.flags[i] = False
        elif action == "KEEP":
            for i, sv in enumerate(svs.lines):
                if sv.annotations[index].strip() != b"":
                    result.flags[i] = True
        else:
            raise ValueError(f"Invalid action '{action}'provided!")
