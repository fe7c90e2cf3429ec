"""Declared schemas for the engine's nine output tables and raw sources.

The reference declares every schema explicitly in DDL at load time, never
inferring (e.g. /root/reference/src/import_genes_exons.py:44-75,
src/import_ontology.py:151-189). We keep that stance: every DataFrame in the
engine is built against one of these StructTypes — inference is banned so a
malformed source fails loudly at read, not silently downstream.

Type decisions vs the reference (SURVEY §1.2):
- genomic coordinates → LongType (concatenated assemblies can exceed 2^31),
- snp_variant.frequency/quality → DoubleType (reference DDL says INTEGER but
  stores VCF floats — SQLite dynamic typing masked the lie; SURVEY Q5),
- syntenic_block.same_orientation → BooleanType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# The nine output tables (reference DDL citations inline)
# ---------------------------------------------------------------------------

# src/import_genes_exons.py:44-62
GENE = T.StructType(
    [
        T.StructField("gene_id", T.StringType(), False),
        T.StructField("gene_taxonid", T.LongType(), False),
        T.StructField("gene_symbol", T.StringType(), True),
        T.StructField("gene_chr", T.StringType(), False),
        T.StructField("gene_start_pos", T.LongType(), True),
        T.StructField("gene_end_pos", T.LongType(), True),
        # BCBio int strand coding (+1/-1/0), see transforms.strand_to_int
        T.StructField("gene_strand", T.LongType(), True),
        T.StructField("gene_type", T.StringType(), True),
        T.StructField("gene_name", T.StringType(), True),  # nullable: Name optional
    ]
)
GENE_PK = ["gene_id", "gene_taxonid", "gene_chr"]

# src/import_genes_exons.py:64-76
EXON = T.StructType(
    [
        T.StructField("exon_id", T.StringType(), False),
        T.StructField("parent_gene", T.StringType(), False),
        T.StructField("taxonid", T.LongType(), False),
        T.StructField("exon_chr", T.StringType(), False),
        T.StructField("exon_start_pos", T.LongType(), True),
        T.StructField("exon_end_pos", T.LongType(), True),
    ]
)
EXON_PK = ["exon_id", "taxonid", "exon_chr"]

# src/import_synteny_blocks.py:43-59
SYNTENIC_BLOCK = T.StructType(
    [
        T.StructField("ref_taxonid", T.LongType(), False),
        T.StructField("ref_chr", T.StringType(), False),
        T.StructField("ref_start_pos", T.LongType(), False),
        T.StructField("ref_end_pos", T.LongType(), True),
        T.StructField("comp_taxonid", T.LongType(), False),
        T.StructField("comp_chr", T.StringType(), True),
        T.StructField("comp_start_pos", T.LongType(), True),
        T.StructField("comp_end_pos", T.LongType(), True),
        T.StructField("same_orientation", T.BooleanType(), True),
        T.StructField("symbol", T.StringType(), True),
    ]
)
SYNTENIC_BLOCK_PK = ["ref_taxonid", "comp_taxonid", "ref_chr", "ref_start_pos"]

# src/import_cytogenetic_loc.py:45-57
CYTOGENETIC_BAND = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("taxon_id", T.LongType(), False),
        T.StructField("chr", T.StringType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("start", T.LongType(), True),
        T.StructField("end", T.LongType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("color", T.StringType(), True),
    ]
)

# src/import_features.py:39-58
FEATURE = T.StructType(
    [
        T.StructField("taxon_id", T.LongType(), False),
        T.StructField("seq_id", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("start", T.LongType(), True),
        T.StructField("end", T.LongType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("strand", T.StringType(), True),
        T.StructField("phase", T.LongType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("dbxref", T.StringType(), True),
        T.StructField("bio_type", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("parent", T.StringType(), True),
    ]
)
FEATURE_PK = ["source", "taxon_id", "id", "dbxref"]

# src/import_variants.py:45-59 (frequency/quality fixed to DOUBLE — SURVEY Q5)
SNP_VARIANT = T.StructType(
    [
        T.StructField("chr", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("ref_base", T.StringType(), True),
        T.StructField("alt_allele", T.StringType(), True),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("filter", T.StringType(), True),
        T.StructField("frequency", T.DoubleType(), True),
        T.StructField("gene", T.StringType(), True),
        T.StructField("trait_id", T.StringType(), True),
        T.StructField("taxon_id", T.LongType(), False),
    ]
)

# src/import_homologs.py:52-76
HOMOLOG = T.StructType(
    [
        T.StructField("ref_gene_id", T.StringType(), False),
        T.StructField("ref_gene_sym", T.StringType(), True),
        T.StructField("ref_taxon_id", T.LongType(), False),
        T.StructField("ref_seq_id", T.StringType(), True),
        T.StructField("ref_start", T.LongType(), True),
        T.StructField("ref_end", T.LongType(), True),
        T.StructField("comp_gene_id", T.StringType(), False),
        T.StructField("comp_gene_sym", T.StringType(), True),
        T.StructField("comp_taxon_id", T.LongType(), False),
        T.StructField("comp_seq_id", T.StringType(), True),
        T.StructField("comp_start", T.LongType(), True),
        T.StructField("comp_end", T.LongType(), True),
    ]
)
HOMOLOG_PK = ["ref_gene_id", "ref_taxon_id", "comp_gene_id", "comp_taxon_id"]

# src/import_ontology.py:151-163
ON_TERMS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("namespace", T.StringType(), True),
        T.StructField("def", T.StringType(), True),
        T.StructField("count", T.LongType(), True),
    ]
)

# src/import_ontology.py:165-173 — materialized transitive closure
ON_PAIRS = T.StructType(
    [
        T.StructField("parent", T.StringType(), False),
        T.StructField("child", T.StringType(), False),
        T.StructField("relationship", T.StringType(), True),
    ]
)

# src/import_ontology.py:175-183 (PK deliberately omits taxonid — SURVEY Q7)
GENE_ONTOLOGY_MAP = T.StructType(
    [
        T.StructField("gene_id", T.StringType(), False),
        T.StructField("ontology_id", T.StringType(), False),
        T.StructField("taxonid", T.LongType(), True),
    ]
)
GENE_ONTOLOGY_MAP_PK = ["gene_id", "ontology_id"]

# ---------------------------------------------------------------------------
# Raw-source schemas (SURVEY §2.1 S2-S8)
# ---------------------------------------------------------------------------

# GFF3 9 fixed columns (S2/S3). start/end read as long; score/strand/phase kept
# as strings so the '.'-placeholder → NULL normalization (P8) is explicit.
GFF3_RAW = T.StructType(
    [
        T.StructField("seq_id", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("start", T.LongType(), True),
        T.StructField("end", T.LongType(), True),
        T.StructField("score", T.StringType(), True),
        T.StructField("strand", T.StringType(), True),
        T.StructField("phase", T.StringType(), True),
        T.StructField("attributes", T.StringType(), True),
    ]
)

# Headerless synteny TSV, positional 10 columns; chr-before-taxon input order
# per src/import_synteny_blocks.py:100-101 (output swaps — SURVEY P1).
SYNTENY_TSV_RAW = T.StructType(
    [
        T.StructField("ref_chr", T.StringType(), True),
        T.StructField("ref_taxonid", T.LongType(), True),
        T.StructField("ref_start_pos", T.LongType(), True),
        T.StructField("ref_end_pos", T.LongType(), True),
        T.StructField("comp_chr", T.StringType(), True),
        T.StructField("comp_taxonid", T.LongType(), True),
        T.StructField("comp_start_pos", T.LongType(), True),
        T.StructField("comp_end_pos", T.LongType(), True),
        T.StructField("orientation", T.StringType(), True),
        T.StructField("block_id", T.StringType(), True),
    ]
)

# Homolog TSV expected header set, src/import_homologs.py:22-26
HOMOLOG_TSV_COLUMNS = [
    "type",
    "taxonid1",
    "id1",
    "symbol1",
    "seqid1",
    "start1",
    "end1",
    "taxonid2",
    "id2",
    "symbol2",
    "seqid2",
    "start2",
    "end2",
]

# VCF 8 fixed columns (S6); INFO parsed to map downstream.
VCF_RAW = T.StructType(
    [
        T.StructField("chrom", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("ref", T.StringType(), True),
        T.StructField("alt", T.StringType(), True),
        T.StructField("qual", T.StringType(), True),
        T.StructField("filter", T.StringType(), True),
        T.StructField("info", T.StringType(), True),
    ]
)

# GAF 2.x: 17 tab-separated columns; only db_object_id (2), go_id (5) and
# taxon (13) are consumed (src/import_ontology.py:286-300).
GAF_RAW = T.StructType(
    [T.StructField(f"c{i}", T.StringType(), True) for i in range(17)]
)
GAF_GENE_ID_COL = "c1"
GAF_TERM_COL = "c4"
GAF_TAXON_COL = "c12"

TABLES = {
    "gene": GENE,
    "exon": EXON,
    "syntenic_block": SYNTENIC_BLOCK,
    "cytogenetic_band": CYTOGENETIC_BAND,
    "feature": FEATURE,
    "snp_variant": SNP_VARIANT,
    "homolog": HOMOLOG,
    "on_terms": ON_TERMS,
    "on_pairs": ON_PAIRS,
    "gene_ontology_map": GENE_ONTOLOGY_MAP,
}
