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

    def apply(self, target, subject: str, throw_errors: bool = True) -> FilterResult:
        n = len(target.variants) if hasattr(target, "variants") else len(target)
        result = FilterResult(n)
        self.errors = [[] for _ in self.filters]
        for i, f in enumerate(self.filters):
            if f.TYPE != subject:
                kind = {"snv": "small variants", "sv": "structural variants",
                        "cnv": "CNVs"}[subject]
                raise ValueError(f"Filter '{f.NAME}' cannot be applied to {kind}!")
            try:
                f.apply(target, result)
            except Exception as e:  # FilterCascade::apply catches per filter
                if throw_errors:
                    raise
                self.errors[i].append(str(e))
        return result


# ---------------------------------------------------------------- helpers

def _anno_col(gsvar, name: str, error=True) -> int:
    try:
        return gsvar.annotation_index(name)
    except KeyError:
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

        # comp-het handling (classic mode; phased modes need genotype_phased)
        i_gene = _anno_col(gsvar, "gene")
        gene_to_het: dict[bytes, int] = {}
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
                    if gene:
                        gene_to_het[gene] = gene_to_het.get(gene, 0) + 1

        for i, v in enumerate(gsvar.variants):
            if not result.flags[i]:
                continue
            if result_other[i]:
                continue
            passing = False
            geno_all = _same_genotype(v, geno_indices)
            if geno_all == b"het" and "comp-het" in genotypes:
                for gene in v.annotations[i_gene].split(b","):
                    if gene_to_het.get(gene.strip(), 0) >= 2:
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
        term = self.get("term").strip().encode()

        def match(v):
            return any(term in a for a in v.annotations)

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


def max_entscan_impact(score_pairs: list[bytes], splice_site_only: bool) -> str:
    """NGSHelper::maxEntScanImpact — impact of a MaxEntScan annotation entry."""
    if len(score_pairs) < 1:
        raise ValueError("MaxEntScan annotation contains less than one score pair")
    if len(score_pairs) > 3:
        raise ValueError("MaxEntScan annotation contains more than three score pairs")
    impacts = []
    for i, score_pair in enumerate(score_pairs):
        parts = score_pair.split(b">")
        if len(parts) != 2:
            continue
        if splice_site_only and i > 0:
            continue
        ref = max(0.0, _to_f(parts[0]))
        alt = max(0.0, _to_f(parts[1]))
        diff = ref - alt
        if i == 0:
            if diff > 0 and ref >= 3:
                if alt < 6.2:
                    impacts.append("HIGH" if diff >= 1.15 else "MODERATE")
                elif alt <= 8.5 and diff > 1.15:
                    impacts.append("MODERATE")
        else:
            if diff < -1.15 and ref < 3:
                if alt > 8.5:
                    impacts.append("HIGH")
                elif alt >= 6.2:
                    impacts.append("MODERATE")
    if "HIGH" in impacts:
        return "HIGH"
    if "MODERATE" in impacts:
        return "MODERATE"
    return "LOW"


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
