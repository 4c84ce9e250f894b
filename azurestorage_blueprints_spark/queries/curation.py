"""Corpus-curation operators beyond scoring: repetition detection, PII
redaction, eval-set decontamination, and context-window sequence packing.

These are the remaining steps a training-data pipeline runs between
raw text and a tokenized training mix (the reference has no analogue —
its unit of work is whole-file transfer; SURVEY.md §2.2 extends the
capability table with the north-star LLM operators). Every query is a
single Catalyst plan over ``documents`` with oracle-checked semantics.

Scale notes per operator are inline; the common posture: explode →
equi-join/hash-agg shapes only (posting lists, never |docs|² pairs),
window functions partitioned by a real key (never a global single
partition over the fact table), all string work in codegen'd
``regexp_*`` expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azurestorage_blueprints_spark.functions.text import token_count, tokens, word_shingles
from azurestorage_blueprints_spark.queries import register
from azurestorage_blueprints_spark.tables import table

#: email pattern in the Java-regex ∩ RE2 common subset (no lookahead)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: context-window token budget for sequence packing
_PACK_BUDGET = 2048


@register(
    "q_text_repetition",
    oracle="""
    WITH toked AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bg
      FROM toked WHERE len(toks) >= 2),
    cnt AS (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY 1, 2)
    SELECT doc_id,
           CAST(max(c) AS BIGINT) AS max_rep,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(max(c) AS DOUBLE) / sum(c) AS rep_frac
    FROM cnt GROUP BY doc_id
    """,
    doc="Repetition detection: the fraction of a document's bigrams taken "
    "by its single most-repeated bigram — the standard cheap signal for "
    "degenerate/boilerplate text (a looping scrape repeats one n-gram). "
    "Shape: explode bigrams → two hash-aggs keyed by (doc_id, bigram) then "
    "doc_id — map-side combinable, no joins, linear at any corpus size.",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens(F.col("text")).alias("tk")).filter(F.size("tk") >= 2)
    bi = toked.select("doc_id", F.explode(word_shingles(F.col("tk"), k=2)).alias("bg"))
    cnt = bi.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.max("c").cast("bigint").alias("max_rep"),
        F.sum("c").alias("n_bigrams"),
        (F.max("c").cast("double") / F.sum("c")).alias("rep_frac"),
    )


@register(
    "q_text_redact_pii",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '[0-9]+')) AS n_digit_runs,
           substr(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                 '[0-9]+', '<NUM>', 'g'), 1, 60) AS redacted_head
    FROM documents
    """,
    doc="PII-style redaction pass: count and mask email addresses and digit "
    "runs (the mechanism behind scrubbing emails/phones/SSNs before "
    "training). Pure codegen regexp projections — one scan, zero shuffles; "
    "the regexes live in the Java-regex ∩ RE2 subset so the oracle applies "
    "the identical masking.",
)
def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), "[0-9]+", "<NUM>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0))).alias("n_digit_runs"),
        F.substring(redacted, 1, 60).alias("redacted_head"),
    )


@register(
    "q_decontaminate",
    oracle="""
    WITH toked AS (
      SELECT doc_id, source, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents),
    sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(CASE WHEN len(toks) >= 5
               THEN list_transform(range(1, len(toks) - 3),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
               ELSE [list_aggregate(toks, 'string_agg', ' ')] END)) AS shingle
      FROM toked),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
    contaminated AS (
      SELECT DISTINCT t.doc_id FROM train t JOIN eval_sh e USING (shingle)),
    train_docs AS (SELECT DISTINCT doc_id, source FROM train)
    SELECT d.source,
           count(*) AS n_train,
           CAST(count(c.doc_id) AS BIGINT) AS n_contaminated,
           CAST(count(*) - count(c.doc_id) AS BIGINT) AS n_clean
    FROM train_docs d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    GROUP BY d.source
    """,
    doc="Train/eval decontamination: drop training documents sharing any "
    "5-gram with the (deterministically designated) eval set — the overlap "
    "check every serious training-data pipeline runs. Shape: inverted index "
    "on shingles (explode → distinct → equi-join), contaminated-ID distinct "
    "is two longs per row; at 100 TB the join key becomes xxhash64(shingle) "
    "so the exchange carries 8-byte keys (collision rate 2^-64 per pair is "
    "acceptable for a drop-list; exact strings used here for oracle parity).",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toked = d.select("doc_id", "source", tokens(F.col("text")).alias("tk"))
    sh = toked.select(
        "doc_id", "source",
        F.explode(F.array_distinct(word_shingles(F.col("tk"), k=5))).alias("shingle"),
    )
    eval_sh = sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    train = sh.filter(F.col("doc_id") % 97 != 0)
    contaminated = (
        train.join(eval_sh, "shingle")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    train_docs = train.select("doc_id", "source").distinct()
    return (
        train_docs.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("contaminated").cast("bigint").alias("n_contaminated"),
            (F.count(F.lit(1)) - F.count("contaminated")).cast("bigint").alias("n_clean"),
        )
    )


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
      FROM documents),
    packed AS (
      SELECT doc_id, lang, n_tok,
             CAST(floor((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
                        / {_PACK_BUDGET}.0) AS BIGINT) AS shard
      FROM sized)
    SELECT lang, shard,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM packed GROUP BY lang, shard
    """,
    doc="Context-window sequence packing: assign documents to fixed token-"
    "budget training shards by running token count (shard = floor of the "
    "pre-document cumulative sum / budget) in a deterministic per-language "
    "order — how a tokenized corpus becomes fixed-length training rows. "
    "The window partitions by lang (real parallelism, never one global "
    "partition); at 100 TB the partition key becomes (lang, date-bucket) "
    "so each window stays executor-sized. One window + one hash-agg.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sized = d.select("doc_id", "lang", token_count(F.col("text")).alias("n_tok"))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    shard = F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / float(_PACK_BUDGET)).cast(
        "bigint"
    )
    return (
        sized.withColumn("shard", shard)
        .groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
