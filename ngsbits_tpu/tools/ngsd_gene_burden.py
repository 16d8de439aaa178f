"""NGSDGeneBurdenTest — gene-wise burden test on NGSD variants.

Behavioral reference: ngs-bits src/NGSDGeneBurdenTest/main.cpp +
cppNGSD/GeneBurdenTest.cpp (WorkerGeneBurdenTest with live impact
annotation via VariantHgvsAnnotator).
"""

from __future__ import annotations

import gzip
import json
import os
import sys

from ..core.basicstats import fishers_exact_test
from ..core.geneset import GeneSet
from ..core.hgvs import HgvsVariant, VariantHgvsAnnotator
from ..core.intervals import BedFile, BedLine, ChromosomalIndex
from ..io.fasta import FastaFileIndex
from ..ngsd import NGSD
from .toolbase import ToolBase, ToolError

_RESOURCES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources")

_IMPACTS = ("HIGH", "MODERATE", "LOW", "MODIFIER")


class NGSDGeneBurdenTestTool(ToolBase):
    name = "NGSDGeneBurdenTest"
    description = "Performs gene-wise Burden test on two sets of processed samples based on imported variants in the NGSD."

    def setup(self):
        self.add_infile("cases", "Text file containing case sample (one processed sample per line)")
        self.add_infile("controls", "Text file containing case sample (one processed sample per line)")
        self.add_infile("genes", "Text file containing genes to test (one gene per line)")
        self.add_outfile("out", "Output TSV file containing the result of the Burden test.")
        self.add_int("max_ngsd_count", "Maximum NGSD count of a variant to still be included.", optional=True, default=20)
        self.add_float("max_gnomad_af", "Maximum gnomAD allele frequency (in %) of a variant to still be included.", optional=True, default=0.1)
        self.add_string("impacts", "Comma separated list of impacts which should be included (allowed values: HIGH, MODERATE, LOW, MODIFIER)", optional=True, default="HIGH,MODERATE")
        self.add_string("inheritance", "Inheritance mode to use. (allowed values: dominant, de-novo, recessive)", optional=True, default="dominant")
        self.add_flag("include_mosaic", "Include mosaic variants.")
        self.add_flag("predict_pathogenic", "add variants with moderate/low/modifier impact only if CADD >= 20 or SpliceAI >= 0.5.")
        self.add_flag("include_cnvs", "Include CNVs to test.")
        self.add_flag("ccr_only", "Limit test to constrained coding regions.")
        self.add_int("splice_region_size", "Extend coding region by this amount of bases.", optional=True, default=20)
        self.add_infile("excluded_regions", "BED file containing regions which should be excluded from the test.", optional=True)
        self.add_int("threads", "Number of threads used to perform the test.", optional=True, default=4)
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("debug", "Activate debug output.")
        self.add_flag("skip_errors", "Only report errors, do not fail execution.")
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)

    def main(self):
        impacts = set()
        for impact in self.get_string("impacts").split(","):
            if impact not in _IMPACTS:
                raise ToolError(f"Invalid impact '{impact}' provided!")
            impacts.add(impact)
        inheritance = self.get_string("inheritance")
        if inheritance not in ("dominant", "de-novo", "recessive"):
            raise ToolError(f"Invalid inheritance mode '{inheritance}' provided!")

        ref_file = self.get_infile("ref")
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        genome = FastaFileIndex(ref_file)

        max_ngsd_count = self.get_int("max_ngsd_count")
        max_gnomad_af = self.get_float("max_gnomad_af") / 100.0
        include_mosaic = self.get_flag("include_mosaic")
        predict_pathogenic = self.get_flag("predict_pathogenic")
        include_cnvs = self.get_flag("include_cnvs")
        ccr_only = self.get_flag("ccr_only")
        splice_region_size = self.get_int("splice_region_size")
        debug = self.get_flag("debug")
        skip_errors = self.get_flag("skip_errors")
        excluded_regions = None
        if self.get_infile("excluded_regions"):
            excluded_regions = BedFile.from_file(self.get_infile("excluded_regions"))
            excluded_regions.lines.sort(key=lambda l: l.sort_key())

        def load_lines(path):
            out = []
            for raw in open(path):
                line = raw.strip()
                if not line or line.startswith("#"):
                    continue
                out.append(line)
            return out

        cases = load_lines(self.get_infile("cases"))
        controls = load_lines(self.get_infile("controls"))
        genes = GeneSet.create_from_file(self.get_infile("genes"))

        db = NGSD(self.get_flag("test"))
        ps_ids_cases = {int(db.processed_sample_id(l.split("\t")[0])) for l in cases}
        ps_ids_controls = {int(db.processed_sample_id(l.split("\t")[0])) for l in controls}
        ps_ids_all = ps_ids_cases | ps_ids_controls

        # convert genes to approved symbols
        approved = GeneSet()
        for g in genes:
            ga = db.gene_to_approved(g)
            if ga:
                approved.insert(ga)
        genes = approved

        ccr80_region = {}
        if ccr_only:
            ccr80_path = os.path.join(_RESOURCES, "CCR80_GRCh38.bed.gz")
            if not os.path.exists(ccr80_path):
                raise ToolError("CCR80 region resource not available (CCR80_GRCh38.bed.gz)!")
            with gzip.open(ccr80_path, "rt") as fh:
                for line in fh:
                    parts = line.rstrip("\n").split("\t")
                    gene = parts[4].strip() if len(parts) > 4 else ""
                    if not gene:
                        continue
                    ccr80_region.setdefault(gene, BedFile()).append(
                        BedLine(parts[0], int(parts[1]) + 1, int(parts[2])))

        # CNV callsets per cohort (filtered by reference correlation)
        callset_ids_cases, callset_ids_controls = set(), set()
        cnv_polymorphism = BedFile()
        if include_cnvs:
            def callsets(ps_ids):
                out = set()
                for ps_id in ps_ids:
                    ps_data = db.get_processed_sample_data(ps_id)
                    min_corr = 0.35 if ps_data.get("processing_system_type") == "WGS" else 0.9
                    for cs_id, metrics in db.get_rows(
                            "SELECT id, quality_metrics FROM cnv_callset WHERE processed_sample_id=?",
                            params=(ps_id,)):
                        try:
                            qm = json.loads(metrics or "{}")
                        except ValueError:
                            qm = {}
                        try:
                            corr = float(qm.get("mean correlation to reference samples", 0))
                        except (TypeError, ValueError):
                            corr = 0.0
                        if corr >= min_corr:
                            out.add(int(cs_id))
                return out
            callset_ids_cases = callsets(ps_ids_cases)
            callset_ids_controls = callsets(ps_ids_controls)
            if self.get_flag("test"):
                sys.stderr.write("Running in test mode, using predefined polymorphism region\n")
                with gzip.open(os.path.join(_RESOURCES, "GeneBurdenTest_cnv_af.bed.gz"), "rt") as fh:
                    for line in fh:
                        if line.startswith("#") or not line.strip():
                            continue
                        parts = line.rstrip("\n").split("\t")
                        cnv_polymorphism.append(BedLine(parts[0], int(parts[1]) + 1, int(parts[2])))

        # per-gene parallelism (reference: GeneBurdenTest worker pool,
        # NGSDGeneBurdenTest/main.cpp:98): one SQLite connection per worker
        # thread; sqlite and fasta reads release the GIL in C
        threads = max(1, self.get_int("threads"))

        def run_gene(gene, dbw):
            try:
                return ("ok", self._test_gene(
                    dbw, genome, gene, ps_ids_cases, ps_ids_controls, impacts, inheritance,
                    max_ngsd_count, max_gnomad_af, include_mosaic, predict_pathogenic,
                    include_cnvs, callset_ids_cases, callset_ids_controls, cnv_polymorphism,
                    ccr_only, ccr80_region, splice_region_size, excluded_regions, debug))
            except Exception as e:  # noqa: BLE001 — per-gene error policy below
                return ("err", gene, e)

        if threads > 1 and len(genes) > 1:
            import threading as _threading
            from concurrent.futures import ThreadPoolExecutor
            tl = _threading.local()

            def worker(gene):
                dbw = getattr(tl, "db", None)
                if dbw is None:
                    dbw = tl.db = NGSD(self.get_flag("test"))
                return run_gene(gene, dbw)

            with ThreadPoolExecutor(max_workers=threads) as pool:
                outcomes = list(pool.map(worker, genes))
        else:
            outcomes = [run_gene(g, db) for g in genes]

        results = []
        for outcome in outcomes:
            if outcome[0] == "ok":
                results.append(outcome[1])
            else:
                _, gene, e = outcome
                if skip_errors:
                    sys.stdout.write(f"ERROR in processing gene {gene}:\t{e}\t Removed from output!\n")
                else:
                    raise ToolError(f"ERROR in processing gene {gene}:\t{e}")
        for r in results:
            if r.get("warning"):
                sys.stdout.write(f"WARNING in processing gene {r['gene']}:\t{r['warning']}\n")
        results.sort(key=lambda r: r["p_value"])

        with open(self.get_outfile("out"), "w") as out:
            out.write("##cases=" + ",".join(cases) + "\n")
            out.write("##controls=" + ",".join(controls) + "\n")
            out.write("##genes=" + genes.join(",") + "\n")
            out.write("##max_ngsd_count=" + _qt_num(max_ngsd_count) + "\n")
            out.write("##max_gnomad_af=" + _qt_num(max_gnomad_af) + "\n")
            out.write("##impacts=" + ",".join(sorted(impacts)) + "\n")
            out.write("##inheritance=" + inheritance + "\n")
            out.write("##include_mosaic=" + ("1" if include_mosaic else "0") + "\n")
            out.write("##predict_pathogenic=" + ("1" if predict_pathogenic else "0") + "\n")
            out.write("##include_cnvs=" + ("1" if include_cnvs else "0") + "\n")
            out.write("##ccr_only=" + ("1" if ccr_only else "0") + "\n")
            out.write("##splice_region_size=" + str(splice_region_size) + "\n")
            headers = ["gene", "p-value", "n_hits_cases", "hits_cases", "n_hits_controls", "hits_controls"]
            if include_cnvs:
                headers += ["n_hits_cases_cnvs", "hits_cases_cnvs", "n_hits_controls_cnvs", "hits_controls_cnvs"]
            out.write("#" + "\t".join(headers) + "\n")
            for r in results:
                line = [r["gene"], _qt_num(r["p_value"]),
                        str(len(r["hits_cases"])),
                        "; ".join(sorted(f"{k}: {v}" for k, v in r["hits_cases"].items())),
                        str(len(r["hits_controls"])),
                        "; ".join(sorted(f"{k}: {v}" for k, v in r["hits_controls"].items()))]
                if include_cnvs:
                    line += [str(len(r["hits_cases_cnv"])),
                             "; ".join(sorted(f"{k}: {v}" for k, v in r["hits_cases_cnv"].items())),
                             str(len(r["hits_controls_cnv"])),
                             "; ".join(sorted(f"{k}: {v}" for k, v in r["hits_controls_cnv"].items()))]
                out.write("\t".join(line) + "\n")
        db.close()

    def _test_gene(self, db, genome, gene, ps_ids_cases, ps_ids_controls, impacts, inheritance,
                   max_ngsd_count, max_gnomad_af, include_mosaic, predict_pathogenic,
                   include_cnvs, callset_ids_cases, callset_ids_controls, cnv_polymorphism,
                   ccr_only, ccr80_region, splice_region_size, excluded_regions, debug):
        result = {"gene": gene, "p_value": 1.0, "hits_cases": {}, "hits_controls": {},
                  "hits_cases_cnv": {}, "hits_controls_cnv": {}, "warning": ""}
        if debug:
            sys.stdout.write(f"Processing gene {gene}\n")

        if ccr_only:
            gene_regions = ccr80_region.get(gene, BedFile())
        else:
            gene_regions = db.gene_to_regions(gene, "ensembl", "exon", True)
            if len(gene_regions):
                gene_regions.extend(splice_region_size)
        gene_regions.lines.sort(key=lambda l: l.sort_key())
        gene_regions.merge()
        if len(gene_regions) == 0:
            result["warning"] = f"Gene {gene} skipped cause it has no chromosomal regions!"
            return result

        # get candidate variants in the gene region
        chrom = gene_regions.lines[0].chr
        for l in gene_regions.lines:
            if l.chr.num != chrom.num:
                raise ToolError(f"Exon regions of gene {gene} spann multiple chromosomes!")
        ranges = " OR ".join(f"(end>={l.start} AND start<={l.end})" for l in gene_regions.lines)
        query = ("SELECT id, chr, start, end, ref, obs, cadd, spliceai FROM variant "
                 f"WHERE (germline_het>0 OR germline_hom>0) AND germline_het+germline_hom<={max_ngsd_count} "
                 f"AND (gnomad IS NULL OR gnomad<={_qt_num(max_gnomad_af)}) "
                 f"AND chr='{chrom.str_normalized(True)}' AND ({ranges}) ORDER BY start")
        variants = {int(r[0]): r for r in db.get_rows(query)}

        # filter by live-annotated impact
        relevant = db.relevant_transcripts(db.gene_to_approved_id(gene))
        relevant.sort(key=lambda t: (t.chr.num, t.start(), t.end(), t.name))
        annotator = VariantHgvsAnnotator(genome)
        variant_ids = set()
        for vid, row in variants.items():
            _id, v_chr, v_start, v_end, ref, obs, cadd, spliceai = row
            found_impacts = set()
            matching = [t for t in relevant
                        if t.chr.num == chrom.num and t.start() - 5000 <= v_end and v_start <= t.end() + 5000]
            if not matching:
                found_impacts.add("MODIFIER")  # intergenic
            for t in matching:
                try:
                    pos, vcf_ref, vcf_obs = _to_vcf(genome, chrom, int(v_start), ref, obs)
                    hgvs = annotator.annotate(t, HgvsVariant(chrom, pos, vcf_ref.encode(), vcf_obs.encode()))
                    found_impacts.add(hgvs.impact)
                except Exception as e:
                    result["warning"] = f"Variant {v_chr}:{v_start}-{v_end} {ref}>{obs} could not be annotated! ({e})"
            found_impacts &= impacts
            if not found_impacts:
                continue
            if predict_pathogenic and "HIGH" not in found_impacts:
                cadd_val = float(cadd) if cadd not in (None, "") else 0.0
                spliceai_val = float(spliceai) if spliceai not in (None, "") else 0.0
                if cadd_val < 20.0 and spliceai_val < 0.5:
                    continue
            variant_ids.add(vid)

        detected = {}
        if variant_ids:
            vid_list = ", ".join(str(v) for v in variant_ids)
            ps_list = ", ".join(str(p) for p in (ps_ids_cases | ps_ids_controls))
            mosaic_cond = "" if include_mosaic else " AND mosaic=0"
            for ps_id, vid in db.get_rows(
                    f"SELECT processed_sample_id, variant_id FROM detected_variant "
                    f"WHERE variant_id IN ({vid_list}) AND processed_sample_id IN ({ps_list}){mosaic_cond}"):
                detected.setdefault(int(ps_id), set()).add(int(vid))

        result["hits_cases"] = self._occurrences(db, genome, variant_ids, ps_ids_cases, detected,
                                                 inheritance, excluded_regions)
        result["hits_controls"] = self._occurrences(db, genome, variant_ids, ps_ids_controls, detected,
                                                    inheritance, excluded_regions)

        if include_cnvs:
            if callset_ids_cases:
                result["hits_cases_cnv"] = self._occurrences_cnv(db, callset_ids_cases, gene_regions,
                                                                 cnv_polymorphism, inheritance)
            if callset_ids_controls:
                result["hits_controls_cnv"] = self._occurrences_cnv(db, callset_ids_controls, gene_regions,
                                                                    cnv_polymorphism, inheritance)
            n_cases = len(set(result["hits_cases"]) | set(result["hits_cases_cnv"]))
            n_controls = len(set(result["hits_controls"]) | set(result["hits_controls_cnv"]))
            result["p_value"] = fishers_exact_test(
                n_cases, n_controls, len(ps_ids_cases) - n_cases, len(ps_ids_controls) - n_controls, "greater")
        else:
            result["p_value"] = fishers_exact_test(
                len(result["hits_cases"]), len(result["hits_controls"]),
                len(ps_ids_cases) - len(result["hits_cases"]),
                len(ps_ids_controls) - len(result["hits_controls"]), "greater")
        return result

    @staticmethod
    def _occurrences(db, genome, variant_ids, ps_ids, detected, inheritance, excluded_regions):
        hits = {}
        for ps_id in ps_ids:
            if ps_id not in detected:
                continue
            intersection = variant_ids & detected[ps_id]
            if excluded_regions is not None and len(excluded_regions):
                filtered = set()
                for vid in intersection:
                    chrom, start, end = db.get_rows("SELECT chr, start, end FROM variant WHERE id=?",
                                                    params=(vid,))[0]
                    from ..core.chromosome import Chromosome
                    c = Chromosome(chrom)
                    if not any(l.chr.num == c.num and l.start <= int(end) and int(start) <= l.end
                               for l in excluded_regions.lines):
                        filtered.add(vid)
                intersection = filtered
            if not intersection:
                continue
            if inheritance == "de-novo":
                rc_id = db.report_config_id(ps_id)
                if rc_id < 0:
                    continue
                de_novo = set(db.get_values(
                    "SELECT variant_id FROM report_configuration_variant "
                    "WHERE de_novo=1 AND report_configuration_id=?", params=(rc_id,)))
                intersection &= de_novo
                if not intersection:
                    continue
            elif inheritance == "recessive" and len(intersection) == 1:
                vid = next(iter(intersection))
                genotype = db.get_value(
                    "SELECT genotype FROM detected_variant WHERE processed_sample_id=? AND variant_id=?",
                    params=(ps_id, vid))
                if genotype == "het":
                    gender = db.get_sample_data(db.sample_id(db.processed_sample_name(ps_id)))["gender"]
                    if gender != "male":
                        continue
                    chrom = db.get_value("SELECT chr FROM variant WHERE id=?", params=(vid,))
                    if chrom not in ("chrX",):
                        continue
                    # pseudo-autosomal region check omitted (hg38 PAR constants)
            ps_name = db.processed_sample_name(ps_id)
            per_sample = []
            for vid in intersection:
                chrom, start, end, ref, obs = db.get_rows(
                    "SELECT chr, start, end, ref, obs FROM variant WHERE id=?", params=(vid,))[0]
                from ..core.chromosome import Chromosome
                pos, vcf_ref, vcf_obs = _to_vcf(genome, Chromosome(chrom), int(start), ref, obs)
                per_sample.append(f"{chrom}:{pos} {vcf_ref}>{vcf_obs}")
            hits[ps_name] = ";".join(sorted(per_sample))
        return hits

    @staticmethod
    def _occurrences_cnv(db, callset_ids, gene_regions, cnv_polymorphism, inheritance):
        hits = {}
        cs_list = ", ".join(str(c) for c in callset_ids)
        ranges = " OR ".join(f"(end>={l.start} AND start<={l.end})" for l in gene_regions.lines)
        cnv_ids = db.get_values(f"SELECT id FROM cnv WHERE cnv_callset_id IN ({cs_list}) AND ({ranges})")
        for cnv_id in cnv_ids:
            cn = int(db.get_value("SELECT cn FROM cnv WHERE id=?", params=(cnv_id,)))
            if inheritance == "recessive" and cn != 0:
                continue
            if cn > 1:
                continue
            metrics = db.get_value("SELECT quality_metrics FROM cnv WHERE id=?", params=(cnv_id,))
            try:
                qm = json.loads(metrics or "{}")
            except ValueError:
                qm = {}
            try:
                ll = int(float(qm.get("loglikelihood", 0)))
            except (TypeError, ValueError):
                ll = 0
            n_regions = qm.get("regions", qm.get("no_of_regions", 1))
            try:
                n_regions = int(float(n_regions))
            except (TypeError, ValueError):
                n_regions = 1
            if n_regions and ll / n_regions < 15.0:
                continue
            chrom, start, end = db.get_rows("SELECT chr, start, end FROM cnv WHERE id=?", params=(cnv_id,))[0]
            start, end = int(start), int(end)
            from ..core.chromosome import Chromosome
            c = Chromosome(chrom)
            overlap = BedFile()
            for l in cnv_polymorphism.lines:
                if l.chr.num == c.num and l.start <= end and start <= l.end:
                    overlap.append(BedLine(c, max(start, l.start), min(end, l.end)))
            overlap.lines.sort(key=lambda l: l.sort_key())
            overlap.merge()
            frac = sum(l.end - l.start + 1 for l in overlap.lines) / (end - start + 1)
            if frac > 0.95:
                continue
            ps_id = db.get_value("SELECT cc.processed_sample_id FROM cnv c "
                                 "INNER JOIN cnv_callset cc ON cc.id=c.cnv_callset_id WHERE c.id=?",
                                 no_value_is_ok=False, params=(cnv_id,))
            ps_name = db.processed_sample_name(ps_id)
            entry = f"{chrom}:{start}-{end}"
            if ps_name in hits:
                hits[ps_name] = ";".join(sorted(hits[ps_name].split(";") + [entry]))
            else:
                hits[ps_name] = entry
        return hits


def _qt_num(v) -> str:
    return f"{float(v):.6g}"


def _to_vcf(genome, chrom, start, ref, obs):
    """Variant::toVCF — GSvar to VCF representation (see ngsd_export_annotation)."""
    from .ngsd_export_annotation import _to_vcf as impl
    return impl(genome, chrom, start, ref, obs)


TOOLS = {
    "NGSDGeneBurdenTest": NGSDGeneBurdenTestTool,
}
