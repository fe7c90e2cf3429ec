"""End-to-end 9-table build benchmark — the reference's only published
performance number is the full `create_database.sh` run: "several minutes"
for 13 sequential single-threaded SQLite loads over the 3-species data set
(/root/reference/README.md:47, create_database.sh:16-53). This tool
synthesizes a deterministic input set at comparable real-world scale
(3 species × ~25k genes with exons, GWAS-catalog-sized VCF, GO-sized
ontology, MGI-sized GAF) and times `plans.pipeline.build_database` over it.

The reference's data files are not redistributed, so sizes are matched to
the public sources they were derived from (Ensembl gene counts, UCSC
cytoband tracks, GWAS catalog, GO/MP/DO term counts, MGI GAF) rather than
byte-for-byte. The synthetic content exercises every loader path: gzip
(S1), GFF3 version gate (S3), headered + headerless TSV (S4/S5), VCF INFO
map + multi-ALT explode (S6/X2), OBO closure (A3), GAF taxon filter (F3),
and the upsert/duplicate channels (X5-X7).

Usage: python tools/build_bench.py [--small]
Prints one JSON line: {"metric": "e2e_build_wall_sec", ...}.
"""

from __future__ import annotations

import gzip
import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch", "build_bench")

CHRS = [str(i) for i in range(1, 20)] + ["X", "Y"]


def _write(path: str, lines: list[str]) -> int:
    data = "\n".join(lines) + "\n"
    if path.endswith(".gz"):
        with gzip.open(path, "wt") as f:
            f.write(data)
    else:
        with open(path, "w") as f:
            f.write(data)
    return len(lines)


def gen_genes_gff3(path: str, taxon: int, n_genes: int, rng: random.Random) -> int:
    lines = ["##gff-version 3"]
    for i in range(n_genes):
        chrom = rng.choice(CHRS)
        pre = chrom if rng.random() < 0.5 else f"chr{chrom}"
        start = rng.randrange(1, 150_000_000)
        end = start + rng.randrange(200, 2_000_000)
        strand = "+" if rng.random() < 0.5 else "-"
        gid = f"gene:T{taxon}G{i}"
        attrs = f"ID={gid};Symbol=Sym{taxon}_{i};biotype=protein_coding;Dbxref=MGI:{taxon}{i}"
        if rng.random() < 0.9:  # P7: Name optional on ~10%
            attrs = f"ID={gid};Name=gene {i};" + attrs.split(";", 1)[1]
        lines.append(f"{pre}\tENSEMBL\tgene\t{start}\t{end}\t.\t{strand}\t.\t{attrs}")
        for j in range(rng.randrange(1, 8)):
            es = start + rng.randrange(0, max(end - start - 100, 1))
            ee = min(es + rng.randrange(50, 5000), end)
            lines.append(
                f"{pre}\tENSEMBL\texon\t{es}\t{ee}\t.\t{strand}\t.\t"
                f"ID=exon:T{taxon}G{i}.{j};Parent={gid}"
            )
    return _write(path, lines)


def gen_synteny_tsv(path: str, ref_taxon: int, comp_taxon: int, n: int,
                    rng: random.Random) -> int:
    lines = []
    for i in range(n):
        rc, cc = rng.choice(CHRS), rng.choice(CHRS)
        rs = rng.randrange(1, 140_000_000)
        re_ = rs + rng.randrange(10_000, 3_000_000)
        cs = rng.randrange(1, 140_000_000)
        ce = cs + rng.randrange(10_000, 3_000_000)
        strand = "+" if rng.random() < 0.5 else "-"
        lines.append(
            f"chr{rc}\t{ref_taxon}\t{rs}\t{re_}\tchr{cc}\t{comp_taxon}"
            f"\t{cs}\t{ce}\t{strand}\tID=SynBlock{ref_taxon}_{comp_taxon}_{i:06d}"
        )
    return _write(path, lines)


def gen_cytobands_gff3(path: str, n: int, rng: random.Random) -> int:
    lines = ["##gff-version 3"]
    stains = ["gneg", "gpos25", "gpos50", "gpos75", "gpos100", "acen"]
    per_chr = max(n // len(CHRS), 1)
    for chrom in CHRS:
        pos = 1
        for b in range(per_chr):
            end = pos + rng.randrange(1_000_000, 8_000_000)
            band = f"{'p' if b < per_chr // 2 else 'q'}{b}.{rng.randrange(1, 4)}"
            lines.append(
                f"chr{chrom}\tUCSC\tchromosome_band\t{pos}\t{end}\t.\t.\t.\t"
                f"ID={band};Location={band};Color={rng.choice(stains)}"
            )
            pos = end + 1
    return _write(path, lines)


def gen_features_gff3(path: str, taxon: int, n: int, rng: random.Random) -> int:
    lines = ["##gff-version 3"]
    for i in range(n):
        chrom = rng.choice(CHRS)
        start = rng.randrange(1, 140_000_000)
        end = start + rng.randrange(10_000, 20_000_000)
        score = f"{rng.random() * 10:.2f}" if rng.random() < 0.5 else "."
        strand = rng.choice(["+", "-", "."])
        lines.append(
            f"chr{chrom}\tMGI\tQTL\t{start}\t{end}\t{score}\t{strand}\t.\t"
            f"ID=QTL:T{taxon}_{i};Name=Qtl{taxon}_{i};Dbxref=MGI:{taxon}9{i};"
            f"bioType=QTL;Status=Active"
        )
        if rng.random() < 0.02:  # F2: blacklisted types must be dropped
            lines.append(
                f"chr{chrom}\tMGI\tCDS\t{start}\t{end}\t.\t+\t0\t"
                f"ID=bad{i};Dbxref=MGI:0"
            )
    return _write(path, lines)


def gen_vcf(path: str, n: int, rng: random.Random) -> int:
    lines = ["##fileformat=VCFv4.2", "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    bases = "ACGT"
    for i in range(n):
        chrom = rng.choice(CHRS)
        pre = chrom if rng.random() < 0.5 else f"chr{chrom}"
        ref = rng.choice(bases)
        alts = ",".join(rng.sample([b for b in bases if b != ref],
                                   1 if rng.random() < 0.8 else 2))
        qual = f"{rng.random() * 100:.1f}" if rng.random() < 0.7 else "."
        info = (f"AF={rng.random():.3f};CG=GENE{rng.randrange(n)},"
                f"GENE{rng.randrange(n)};LT=EFO:{i % 5000:07d}")
        lines.append(
            f"{pre}\t{rng.randrange(1, 150_000_000)}\trs{i}\t{ref}\t{alts}"
            f"\t{qual}\tPASS\t{info}"
        )
    return _write(path, lines)


def gen_obo(path: str, prefix: str, n_terms: int, id_offset: int,
            rng: random.Random) -> int:
    """Tree-ish DAG: term i's primary parent is i // 3 (depth ~log3 n, like
    GO's ~12-level hierarchy); ~20% get a second cross edge."""
    lines = ["format-version: 1.2", f"ontology: {prefix}"]
    for i in range(n_terms):
        tid = f"{prefix}:{id_offset + i:07d}"
        lines += ["", "[Term]", f"id: {tid}", f"name: {prefix} term {i}",
                  f"namespace: {prefix}_process",
                  f'def: "synthetic {prefix} {i}" [gen:1]']
        if i > 0:
            parent = f"{prefix}:{id_offset + i // 3:07d}"
            lines.append(f"is_a: {parent} ! p")
            if i > 9 and rng.random() < 0.2:
                alt = f"{prefix}:{id_offset + rng.randrange(i // 9, i // 3):07d}"
                if alt != parent:
                    lines.append(f"is_a: {alt} ! alt")
        if rng.random() < 0.01:
            lines.append("is_obsolete: true")  # F4 path
    return _write(path, lines)


def gen_gaf(path: str, taxon: int, n: int, n_genes: int, onto: list[tuple[str, int, int]],
            rng: random.Random) -> int:
    lines = ["!gaf-version: 2.2"]
    for i in range(n):
        prefix, off, cnt = rng.choice(onto)
        term = f"{prefix}:{off + rng.randrange(cnt):07d}"
        tax = taxon if rng.random() < 0.9 else 99999  # F3: ~10% filtered out
        g = rng.randrange(n_genes)
        lines.append(
            f"MGI\tT{taxon}G{g}\tSym{taxon}_{g}\t\t{term}\tPMID:{i}\tIEA\t\tP\t\t\t"
            f"protein\ttaxon:{tax}\t20240101\tMGI\t\t"
        )
    return _write(path, lines)


def main() -> None:
    small = "--small" in sys.argv
    f = 10 if small else 1
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    rng = random.Random(20260813)
    d = SCRATCH
    t_gen = time.perf_counter()
    n_in = 0
    species = [(9606, 25_000 // f), (10090, 25_000 // f), (10116, 22_000 // f)]
    for taxon, n in species:
        n_in += gen_genes_gff3(f"{d}/genes_{taxon}.gff3", taxon, n, rng)
        n_in += gen_cytobands_gff3(f"{d}/cyto_{taxon}.gff3", 900, rng)
    for rt, ct in [(9606, 10116), (10090, 9606), (10116, 10090)]:
        n_in += gen_synteny_tsv(f"{d}/synteny_{rt}_{ct}.tsv", rt, ct, 10_000 // f, rng)
    n_in += gen_features_gff3(f"{d}/qtl_10090.gff3", 10090, 25_000 // f, rng)
    n_in += gen_features_gff3(f"{d}/qtl_10116.gff3.gz", 10116, 25_000 // f, rng)
    n_in += gen_vcf(f"{d}/gwas.vcf", 250_000 // f, rng)
    onto = [("GO", 1, 40_000 // f), ("MP", 1, 15_000 // f), ("DO", 1, 12_000 // f)]
    for prefix, off, cnt in onto:
        n_in += gen_obo(f"{d}/{prefix.lower()}.obo", prefix, cnt, off, rng)
    for taxon, _ in species:
        n_in += gen_gaf(f"{d}/gaf_{taxon}.gaf", taxon, 150_000 // f,
                        dict(species)[taxon], onto, rng)
    # homologs: headered TSV, 13 cols (S4)
    hl = ["## Type\tTaxonID1\tID1\tSymbol1\tSeqID1\tStart1\tEnd1\tTaxonID2\tID2\tSymbol2\tSeqID2\tStart2\tEnd2"]
    for i in range(50_000 // f):
        t1, t2 = rng.sample([9606, 10090, 10116], 2)
        s1, s2 = rng.randrange(1, 140_000_000), rng.randrange(1, 140_000_000)
        hl.append(
            f"{'ORTHOLOGUE' if rng.random() < 0.9 else 'PARALOGUE'}\t{t1}\tH{i}"
            f"\tHSym{i}\tchr{rng.choice(CHRS)}\t{s1}\t{s1 + rng.randrange(100, 9000)}"
            f"\t{t2}\tM{i}\tMSym{i}\tchr{rng.choice(CHRS)}\t{s2}\t{s2 + rng.randrange(100, 9000)}"
        )
    n_in += _write(f"{d}/homologs.tsv", hl)
    gen_sec = round(time.perf_counter() - t_gen, 1)

    from syntenybrowserv2_etl_spark.session import get_spark
    from syntenybrowserv2_etl_spark.plans import pipeline

    spark = get_spark("build-bench")
    inputs = pipeline.PipelineInputs(
        species=[
            pipeline.SpeciesInputs(
                taxon_id=taxon,
                genes_gff3=f"{d}/genes_{taxon}.gff3",
                cytoband_gff3=f"{d}/cyto_{taxon}.gff3",
                feature_gff3=(f"{d}/qtl_{taxon}.gff3" if taxon == 10090
                              else f"{d}/qtl_{taxon}.gff3.gz" if taxon == 10116
                              else None),
            )
            for taxon, _ in species
        ],
        synteny_tsvs=[f"{d}/synteny_{rt}_{ct}.tsv"
                      for rt, ct in [(9606, 10116), (10090, 9606), (10116, 10090)]],
        homolog_tsvs=[f"{d}/homologs.tsv"],
        vcf_paths=[f"{d}/gwas.vcf"],
        obo_paths=[f"{d}/go.obo", f"{d}/mp.obo", f"{d}/do.obo"],
        gaf_loads=[(f"{d}/gaf_{taxon}.gaf", taxon) for taxon, _ in species],
    )
    out = f"{d}/db"
    t0 = time.perf_counter()
    counts = pipeline.build_database(spark, inputs, out)
    wall = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "metric": "e2e_build_wall_sec", "value": wall, "unit": "sec",
        "input_lines": n_in, "gen_sec": gen_sec, "small": small,
        "tables": dict(sorted(counts.items())),
    }))


if __name__ == "__main__":
    main()
