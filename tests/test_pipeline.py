"""End-to-end pipeline test (SURVEY §5.5): build all nine tables from the
domain fixtures and check counts + sampled semantics."""

from __future__ import annotations

import pytest

from syntenybrowserv2_etl_spark.plans import pipeline


def test_build_database(spark, fixtures_dir, tmp_path):
    inputs = pipeline.PipelineInputs(
        species=[
            pipeline.SpeciesInputs(
                taxon_id=10090,
                genes_gff3=f"{fixtures_dir}/genes.gff3",
                cytoband_gff3=f"{fixtures_dir}/cytobands.gff3",
                feature_gff3=f"{fixtures_dir}/features.gff3",
            )
        ],
        synteny_tsvs=[f"{fixtures_dir}/synteny.tsv"],
        homolog_tsvs=[f"{fixtures_dir}/homologs.tsv"],
        vcf_paths=[f"{fixtures_dir}/gwas.vcf"],
        obo_paths=[f"{fixtures_dir}/onto.obo"],
        gaf_loads=[(f"{fixtures_dir}/annotations.gaf", 10090)],
    )
    out = str(tmp_path / "db")
    counts = pipeline.build_database(spark, inputs, out)
    assert counts == {
        "gene": 3,
        "exon": 4,
        "syntenic_block": 6,
        "cytogenetic_band": 3,
        "feature": 3,
        "snp_variant": 4,
        "homolog": 6,
        "on_terms": 6,
        "on_pairs": 6,
        "gene_ontology_map": 2,
    }
    # written layout is readable and partition-pruned by taxon
    gene = spark.read.parquet(f"{out}/gene")
    assert gene.filter("gene_taxonid = 10090").count() == 3
    on_pairs = spark.read.parquet(f"{out}/on_pairs")
    assert {(r["parent"], r["child"]) for r in on_pairs.collect()} == {
        ("b", "a"), ("q", "a"), ("c", "a"), ("c", "b"), ("c", "d"), ("q", "x"),
    }


def test_cli_loader_roundtrip(spark, fixtures_dir, tmp_path):
    """The create_database.sh argv surface: overwrite (-c) then append."""
    from syntenybrowserv2_etl_spark.plans import pipeline

    out = str(tmp_path / "db")
    w1 = pipeline.main(
        ["genes-exons", out, f"{fixtures_dir}/genes.gff3", "10090", "-c"]
    )
    assert w1 == {"gene": 3, "exon": 4}
    # second species appends (S10), first stays
    pipeline.main(["genes-exons", out, f"{fixtures_dir}/genes.gff3", "10116"])
    gene = spark.read.parquet(f"{out}/gene")
    assert gene.count() == 6
    assert gene.filter("gene_taxonid = 10116").count() == 3
    w3 = pipeline.main(["homologs", out, f"{fixtures_dir}/homologs.tsv", "-c"])
    assert w3 == {"homolog": 6}


def test_build_database_single_computation(spark, fixtures_dir, tmp_path, monkeypatch):
    """Round-2 verdict #3: the pipeline used to write each table and then call
    ``df.count()`` on the UNWRITTEN plan, recomputing every loader DAG a
    second time (a 2x build cost at 100 TB). Row counts now come from an
    ``Observation`` inside the write job itself. Pin it: forbid ``count()``
    entirely during the build and check the reported numbers still match.
    """
    from pyspark.sql import DataFrame

    def _no_count(self):
        raise AssertionError("df.count() called during build — plan recomputed")

    monkeypatch.setattr(DataFrame, "count", _no_count)
    inputs = pipeline.PipelineInputs(
        species=[
            pipeline.SpeciesInputs(
                taxon_id=10090,
                genes_gff3=f"{fixtures_dir}/genes.gff3",
                cytoband_gff3=f"{fixtures_dir}/cytobands.gff3",
            )
        ],
        synteny_tsvs=[f"{fixtures_dir}/synteny.tsv"],
        homolog_tsvs=[],
        vcf_paths=[],
        obo_paths=[],
        gaf_loads=[],
    )
    counts = pipeline.build_database(spark, inputs, str(tmp_path / "db"))
    assert counts == {
        "gene": 3,
        "exon": 4,
        "syntenic_block": 6,
        "cytogenetic_band": 3,
    }


def test_build_bench_small_deterministic(spark, monkeypatch, capsys):
    """The build-benchmark generator + 9-table build is deterministic end
    to end: seeded input synthesis at 1/10 scale (~170k input lines)
    produces byte-stable inputs and exactly these table counts. Guards the
    whole loader surface (gzip, version gate, headered/headerless TSV,
    VCF explode, OBO closure, GAF taxon filter, upsert channels) at a
    scale the unit fixtures don't reach."""
    import json
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    import build_bench

    monkeypatch.setattr(sys, "argv", ["build_bench.py", "--small"])
    build_bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tables"] == {
        "cytogenetic_band": 2646,
        "exon": 28901,
        "feature": 5000,
        "gene": 7200,
        "gene_ontology_map": 40553,
        "homolog": 10000,
        "on_pairs": 63498,
        "on_terms": 6622,
        "snp_variant": 50000,
        "syntenic_block": 6000,
    }
    assert out["input_lines"] == 170248


def test_compact_table_reduces_files_preserves_rows(spark, tmp_path):
    """Small-file compaction: a 40-file table rewrites to the measured
    target count with identical contents; with sort_within_by the files
    carry disjoint key ranges (clustering pass)."""
    from pyspark.sql import functions as F

    from syntenybrowserv2_etl_spark.sources.io import compact_table

    path = str(tmp_path / "frag")
    spark.range(20_000).selectExpr("id", "id % 97 as k").repartition(
        40
    ).write.parquet(path)
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    n_before, n_after = compact_table(spark, path, target_mb=1, sort_within_by=["id"])
    assert n_before == 40 and 1 <= n_after < 40
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before
    # clustering: per-file id ranges are disjoint
    import glob as _glob

    ranges = []
    for f in _glob.glob(path + "/*.parquet"):
        r = spark.read.parquet(f).agg(
            F.min("id").alias("lo"), F.max("id").alias("hi")
        ).collect()[0]
        ranges.append((r["lo"], r["hi"]))
    ranges.sort()
    assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))
    assert not _glob.glob(path + "__*")  # staging/old cleaned up
