"""Benchmark decontamination and content scrubbing.

Two training-data hygiene operators the corpus pipeline needs alongside
dedup (reference scope: the pipeline feeding `fawac.py`'s training loop
— generalized to the LLM-corpus setting per SURVEY §2 Part B):

- **Decontamination**: before training, any document that shares an
  n-gram with the held-out evaluation set must be flagged/dropped,
  otherwise eval scores are inflated. The standard method (13-gram
  overlap in GPT-3/PaLM data work) is n-gram match between corpus and
  benchmark; the fixture's short synthetic docs use 4-grams so overlap
  is non-trivial at test scale.
- **Scrubbing**: regex redaction with hit accounting — the exact shape
  of PII removal (emails/phones/IPs). The fixture corpus contains no
  PII-like strings (synthetic word soup), so the query scrubs a term
  blocklist instead; the mechanics (`regexp_extract_all` count +
  `regexp_replace` rewrite, grouped accounting) are identical.

Scale design (100 TB): the eval split is tiny relative to the corpus by
construction (benchmarks are fixed-size; the corpus grows), so its gram
set broadcasts and the corpus side never shuffles for the overlap join.
Grams hotter than the dedup module's document-frequency cap are dropped
on BOTH sides before joining — a stop-phrase gram is non-discriminative
for contamination and would otherwise fan out quadratically (same
rationale as `dedup.capped_shingles`, reused directly). Scrubbing is a
pure per-row map — no shuffle except the final per-source aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .dedup import MAX_SHINGLE_DF, _shingled_hashed, capped_shingles

# Held-out eval split: md5 bucket of the doc id, same determinism idiom as
# traindata.dataset_hash_split (portable across Spark and DuckDB).
_EVAL_BUCKETS = 10  # bucket 0 of 10 => ~10% eval split
_GRAM_N = 4

_GRAMS_EXPR = (
    f"array_distinct(transform(sequence(0, size(toks) - {_GRAM_N}), "
    f"i -> cast(conv(substr(md5(concat_ws(' ', slice(toks, i + 1, {_GRAM_N}))), 1, 15), 16, 10) as bigint)))"
)

_GRAMS_SQL = (
    f"list_distinct(list_transform(range(1, len(toks) - {_GRAM_N - 2}), "
    f"i -> CAST('0x' || substr(md5(array_to_string(toks[i:i+{_GRAM_N - 1}], ' ')), 1, 15) AS BIGINT)))"
)

_IS_EVAL = f"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % {_EVAL_BUCKETS} = 0"


def _doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, is_eval, gram) — distinct 60-bit 4-gram hashes per doc."""
    d = load_table(spark, sf_dir, "documents")
    is_eval = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % _EVAL_BUCKETS
        == 0
    )
    return (
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= _GRAM_N)
        .select(
            "doc_id",
            is_eval.alias("is_eval"),
            F.explode(F.expr(_GRAMS_EXPR)).alias("shingle"),
        )
    )


@register(
    "benchmark_decontam_flags",
    oracle=f"""
WITH grams AS (
    SELECT doc_id, {_IS_EVAL} AS is_eval, unnest({_GRAMS_SQL}) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE len(string_split(text, ' ')) >= {_GRAM_N})
), capped AS (
    SELECT * FROM grams
    WHERE shingle NOT IN (
        SELECT shingle FROM grams GROUP BY shingle
        HAVING COUNT(*) > {MAX_SHINGLE_DF}
    )
)
SELECT c.doc_id,
       CAST(COUNT(DISTINCT c.shingle) AS BIGINT) AS n_shared_grams,
       CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs_hit
FROM capped c
JOIN capped e ON c.shingle = e.shingle
WHERE NOT c.is_eval AND e.is_eval
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
    tags=("llm", "decontam", "dedup"),
)
def benchmark_decontam_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing a 4-gram with the held-out eval split.

    The eval gram set is small by construction (~10% here; a fixed-size
    benchmark at scale) → broadcast into the overlap join; the corpus
    gram stream stays put. Stop-phrase grams above the dedup DF cap are
    dropped first on both sides (non-discriminative + quadratic risk).
    Output: one row per contaminated training doc with how many distinct
    grams leaked and how many eval docs they hit."""
    grams = capped_shingles(_doc_grams(spark, sf_dir), MAX_SHINGLE_DF)
    train = grams.where(~F.col("is_eval")).select("doc_id", "shingle")
    eval_ = grams.where(F.col("is_eval")).select(
        F.col("doc_id").alias("eval_doc_id"), F.col("shingle").alias("eval_shingle")
    )
    return (
        train.join(
            F.broadcast(eval_), F.col("shingle") == F.col("eval_shingle")
        )
        .groupBy("doc_id")
        .agg(
            F.count_distinct("shingle").alias("n_shared_grams"),
            F.count_distinct("eval_doc_id").alias("n_eval_docs_hit"),
        )
        .orderBy("doc_id")
    )


_BLOCKLIST_PAT = r"\b(spark|customer|vector)\b"
_REDACTED = "[REDACTED]"


@register(
    "blocklist_scrub_stats",
    oracle=f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '{_BLOCKLIST_PAT}'))) AS BIGINT) AS n_redactions,
       CAST(SUM(len(regexp_replace(text, '{_BLOCKLIST_PAT}', '{_REDACTED}', 'g'))) AS BIGINT) AS scrubbed_chars
FROM documents
GROUP BY source
ORDER BY source
""",
    tags=("llm", "scrub", "text"),
)
def blocklist_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex redaction with per-source hit accounting (PII-scrub shape).

    ``regexp_extract_all`` counts hits, ``regexp_replace`` rewrites —
    both JVM built-ins inside codegen, zero Python. The fixture corpus
    has no PII-like strings, so a term blocklist stands in; swapping the
    pattern for email/phone/IP regexes changes nothing structurally.
    Pure map + one small per-source aggregate."""
    d = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace("text", _BLOCKLIST_PAT, _REDACTED)
    hits = F.size(F.regexp_extract_all("text", F.lit(_BLOCKLIST_PAT), F.lit(0)))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(hits).cast("bigint").alias("n_redactions"),
            F.sum(F.length(scrubbed)).cast("bigint").alias("scrubbed_chars"),
        )
        .orderBy("source")
    )
