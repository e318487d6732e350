"""Multi-format IO connectors: JSONL and CSV alongside the parquet registry.

The reference ingests raw files from disk (indexing_agent.py:104-124) and
persists to its store; a corpus pipeline additionally has to ingest the
interchange formats training data actually arrives in — JSONL (the de facto
LLM-corpus format) and CSV. These wrap Spark's native readers/writers, which
at 100 TB give splittable parallel scans per file, schema enforcement at the
reader (no inference pass over petabytes), and predicate pushdown where the
format supports it.

Fidelity contract: a write->read round trip must preserve values exactly.
Checked by the ``jsonl_roundtrip`` / ``csv_roundtrip`` driver queries, whose
DuckDB oracle aggregates the ORIGINAL parquet directly — if the round trip
bent a value (encoding, quoting, type widening), the checksum aggregation
hash-mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def write_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per line, the LLM-corpus interchange format."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSONL scan with an EXPLICIT schema — never schema inference, which
    would be a second full pass over the data at scale and can widen types
    differently between samples."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    # the CSV WRITER trims leading/trailing whitespace by default — a
    # silent value corruption; disabled for the fidelity contract.
    # '' vs NULL are distinct values and CSV's unquoted-empty token is
    # ambiguous between them, so: empty string is written as a QUOTED
    # empty ("") and NULL as the out-of-band \N sentinel (the standard
    # convention). Precondition (documented, inherent to CSV): a field
    # whose literal value is the two characters \N cannot round-trip.
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", '""')
        .option("nullValue", "\\N")
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    # multiLine: document text with embedded newlines must survive (quoted
    # records spanning lines); quote/escape/nullValue/emptyValue mirror
    # the writer so "" reads back as '' and \N as NULL. multiLine costs
    # file-at-a-time parallelism (a quoted newline prevents line-splitting
    # a file), so corpus-scale CSV should arrive as many files — the
    # connector keeps per-file parallelism either way.
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", "")
        .option("nullValue", "\\N")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )


def _fidelity_rollup(df: DataFrame) -> DataFrame:
    """Per-source aggregation whose value-hash breaks if ANY row value was
    bent by the round trip: counts, sums, and an order-insensitive content
    checksum (sum of md5-prefix ints over the concatenated row)."""
    from pyspark.sql import functions as F

    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", "doc_id", "lang", "n_chars", "text")),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000007
    )
    return df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.sum(h).alias("checksum"),
    )


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> JSONL -> read back -> fidelity rollup (oracle
    aggregates the original parquet: any value bent in transit mismatches)."""
    import os
    import tempfile

    from .tables import load_table

    d = load_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="adk_fmt_"), "docs_jsonl")
    write_jsonl(d, path)
    return _fidelity_rollup(read_jsonl(spark, path, DOCUMENTS_SCHEMA))


def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> CSV (quoted, headered) -> read back -> fidelity rollup."""
    import os
    import tempfile

    from .tables import load_table

    d = load_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="adk_fmt_"), "docs_csv")
    write_csv(d, path)
    return _fidelity_rollup(read_csv(spark, path, DOCUMENTS_SCHEMA))


def write_orc(df: DataFrame, path: str) -> None:
    """ORC with zlib — the Hive-ecosystem columnar interchange format;
    splittable stripes, predicate pushdown, and type fidelity like
    parquet (no text-encoding hazards at all)."""
    df.write.mode("overwrite").option("compression", "zlib").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # self-describing columnar schema; no inference pass needed.
    return spark.read.orc(path)


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> ORC -> read back -> fidelity rollup (same oracle
    contract as the JSONL/CSV trips: the oracle aggregates the ORIGINAL
    parquet, so any value bent in transit hash-mismatches)."""
    import os
    import tempfile

    from .tables import load_table

    d = load_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="adk_fmt_"), "docs_orc")
    write_orc(d, path)
    return _fidelity_rollup(read_orc(spark, path))
