"""Chunking operators — the reference's table-generating (flatMap) stage.

The reference parses one file into many "code element" rows (SURVEY.md
section 2.7): tree-sitter AST walk, markdown heading splitter, and a
fixed-50-line fallback (reference: coding_agent/tools/indexing_agent.py:
150-240, 242-288, 290-312). All three are one-row-to-many-rows.

Spark-first: the line/word chunkers and the markdown sectioner are PURE SQL
(posexplode + window + groupBy) — no Python in the row path, fully
parallel, and the groupBy shuffles on (doc, chunk) which is perfectly
balanced at any scale. The tree-sitter parser (native lib) is the one
genuinely imperative piece and is gated behind availability in
``chunk_tree_sitter`` with the fixed chunker as fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table


def _reassemble(order_col: str, value_col: str) -> Column:
    """Order-correct string reassembly under groupBy: collect (pos, value)
    structs, sort by pos, join. collect_list alone is NOT order-stable."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(order_col, value_col))),
            lambda s: s[value_col],
        ),
        " ",
    )


def chunk_fixed_words(
    spark: SparkSession, sf_dir: str, chunk_size: int = 20
) -> DataFrame:
    """Fixed-size chunks over the documents corpus (word granularity — the
    testdata corpus is single-line, so words stand in for the reference's
    50-line chunks, indexing_agent.py:290-312; names follow its
    ``chunk_<i>`` convention)."""
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )
    chunk_id = F.floor(F.col("pos") / chunk_size).cast("int")
    return (
        tokens.withColumn("chunk_id", chunk_id)
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.min("pos").alias("start_pos"),
            F.max("pos").alias("end_pos"),
            F.count(F.lit(1)).alias("n_words"),
            _reassemble("pos", "word").alias("chunk_text"),
        )
        .withColumn(
            "chunk_name", F.concat(F.lit("chunk_"), F.col("chunk_id").cast("string"))
        )
    )


def chunk_fixed_lines(lines_df: DataFrame, chunk_size: int = 50) -> DataFrame:
    """The reference's exact fallback chunker shape over a (path, content)
    corpus: 50-line blocks, whitespace-only blocks skipped, 1-based line
    spans (indexing_agent.py:290-312).

    Input: DataFrame(path string, content string). Output: one row per
    non-blank chunk with (path, name, element_type, start_line, end_line,
    content).
    """
    lines = lines_df.select(
        "path", F.posexplode(F.split(F.col("content"), "\n")).alias("pos", "line")
    )
    chunked = lines.withColumn(
        "chunk_id", F.floor(F.col("pos") / chunk_size).cast("int")
    )
    joined = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "line"))),
            lambda s: s["line"],
        ),
        "\n",
    )
    return (
        chunked.groupBy("path", "chunk_id")
        .agg(
            (F.min("pos") + 1).alias("start_line"),
            (F.max("pos") + 1).alias("end_line"),
            joined.alias("content"),
        )
        .filter(F.regexp_replace(F.col("content"), r"\s", "") != "")
        .select(
            "path",
            F.concat(F.lit("chunk_"), F.col("chunk_id").cast("string")).alias("name"),
            F.lit("text_chunk").alias("element_type"),
            "start_line",
            "end_line",
            "content",
        )
    )


def chunk_markdown_sections(md_df: DataFrame) -> DataFrame:
    """Markdown heading sectioner as window algebra (indexing_agent.py:242-288).

    The reference's sequential "current heading" loop is the classic running
    ``last(_, ignorenulls=True)`` window; sections are then grouped on the
    running heading-count. Blank sections are dropped, matching the
    reference's skip (indexing_agent.py:266,274).

    Input: DataFrame(path string, content string) of markdown files.
    Output: (path, name, element_type='markdown_section', start_line,
    end_line, content) — content EXCLUDES the heading line itself, matching
    the reference (section_content accumulates only lines after the
    heading).
    """
    lines = md_df.select(
        "path", F.posexplode(F.split(F.col("content"), "\n")).alias("pos", "line")
    )
    is_heading = F.trim(F.col("line")).startswith("#")
    flagged = lines.withColumn("is_heading", is_heading.cast("int")).withColumn(
        "heading_text",
        F.when(
            is_heading, F.trim(F.regexp_replace(F.trim(F.col("line")), "^#+", ""))
        ),
    )
    w = (
        Window.partitionBy("path")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sectioned = flagged.withColumn("section_id", F.sum("is_heading").over(w)).withColumn(
        "section_name",
        F.coalesce(F.last("heading_text", ignorenulls=True).over(w), F.lit("Introduction")),
    )
    body = sectioned.filter(F.col("is_heading") == 0)
    joined = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "line"))),
            lambda s: s["line"],
        ),
        "\n",
    )
    return (
        body.groupBy("path", "section_id", "section_name")
        .agg(
            (F.min("pos") + 1).alias("start_line"),
            (F.max("pos") + 1).alias("end_line"),
            joined.alias("content"),
        )
        .filter(F.regexp_replace(F.col("content"), r"\s", "") != "")
        .select(
            "path",
            F.col("section_name").alias("name"),
            F.lit("markdown_section").alias("element_type"),
            "start_line",
            "end_line",
            "content",
        )
    )


def chunk_tree_sitter(source_df: DataFrame) -> DataFrame:
    """AST-based chunking (indexing_agent.py:150-240) — gated on the native
    tree-sitter wheels being importable on executors; falls back to
    ``chunk_fixed_lines`` otherwise (SURVEY.md section 7 step 8).

    The reference walks the AST emitting function/class/import elements; a
    Spark port runs the parser per-partition inside ``mapInPandas`` with a
    per-executor parser singleton. The container ships no tree-sitter
    grammar wheels, so this is the documented fallback path.
    """
    try:
        import tree_sitter  # noqa: F401
    except ImportError:
        return chunk_fixed_lines(source_df)
    raise NotImplementedError(
        "tree-sitter available but grammar loading not wired yet; "
        "use chunk_fixed_lines"
    )
