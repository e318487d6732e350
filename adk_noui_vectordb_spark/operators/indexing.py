"""Indexing-pipeline operators over the derived corpus — the reference's
element data model end-to-end (SURVEY.md sections 2.1/2.2/2.4/2.9, 3.1).

Pipeline shape (reference: indexing_agent.index_codebase, SURVEY.md §3.1):

    corpus (path, ext, content)
      -> explode lines -> fixed chunks  ("elements", §2.7)
      -> project searchable text / content hash / composite id (§2.2)
      -> per-file summary + by-type rollups (§2.4)
      -> rule-based diagnostics routed by extension (§2.9)

All operators run over ``derived_corpus`` (deterministic, shared with the
DuckDB oracle) so every stage is oracle-checked; the same functions accept
any (path, ext, content) DataFrame, e.g. from ``scan_corpus``.

element_type here is assigned round-robin per chunk (function/class/
text_chunk) purely to exercise the by-type rollups deterministically; a real
code corpus gets types from the tree-sitter chunker (chunking.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.corpus import derived_corpus, derived_python_corpus
from ..sources.tables import load_table

CHUNK_LINES = 5
TRUNCATE_AT = 80


def _corpus_lines(corpus: DataFrame) -> DataFrame:
    return corpus.select(
        "path", "ext", F.posexplode(F.split("content", "\n")).alias("pos", "line")
    )


def corpus_elements(corpus: DataFrame) -> DataFrame:
    """Fixed-line chunking into element rows (indexing_agent.py:290-312
    shape, 5-line chunks so small docs still produce several elements)."""
    lines = _corpus_lines(corpus)
    chunked = lines.withColumn(
        "chunk_id", F.floor(F.col("pos") / CHUNK_LINES).cast("int")
    )
    joined = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "line"))),
            lambda s: s["line"],
        ),
        "\n",
    )
    grouped = chunked.groupBy("path", "ext", "chunk_id").agg(
        (F.min("pos") + 1).cast("int").alias("start_line"),
        (F.max("pos") + 1).cast("int").alias("end_line"),
        F.count(F.lit(1)).alias("n_lines"),
        joined.alias("content"),
    )
    etype = (
        F.when(F.col("chunk_id") % 3 == 0, "function")
        .when(F.col("chunk_id") % 3 == 1, "class")
        .otherwise("text_chunk")
    )
    return grouped.select(
        "path",
        "ext",
        "chunk_id",
        F.concat(F.lit("chunk_"), F.col("chunk_id").cast("string")).alias("name"),
        etype.alias("element_type"),
        "start_line",
        "end_line",
        "n_lines",
        "content",
    )


def _elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_elements(derived_corpus(spark, sf_dir))


def project_searchable_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding-input projection (indexing_agent.py:343-347):
    ``name + ' ' + element_type + '\\n' + content``."""
    e = _elements(spark, sf_dir)
    return e.select(
        "path",
        "name",
        "element_type",
        F.concat(
            F.col("name"), F.lit(" "), F.col("element_type"), F.lit("\n"),
            F.col("content"),
        ).alias("document"),
    )


def project_element_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hash (indexing_agent.py:28-31) + composite id
    (indexing_agent.py:350): md5(name:type:content), path:start:hash."""
    e = _elements(spark, sf_dir)
    h = F.md5(F.concat_ws(":", "name", "element_type", "content"))
    return e.select(
        "path",
        "name",
        "start_line",
        h.alias("hash"),
        F.concat_ws(":", "path", F.col("start_line").cast("string"), h).alias("id"),
    )


def agg_file_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file rollup (indexing_agent.py:314-330): line count, element
    count, summary sentence."""
    c = derived_corpus(spark, sf_dir)
    files = c.select(
        "path",
        F.col("ext").alias("file_type"),
        F.size(F.split("content", "\n")).alias("line_count"),
    )
    counts = (
        _elements(spark, sf_dir)
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("element_count"))
    )
    return files.join(counts, "path").withColumn(
        "summary",
        F.format_string(
            "File %s contains %d code elements",
            F.col("path"),
            F.col("element_count"),
        ),
    )


def agg_elements_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'function: 3, class: 1'-style flattening (indexing_agent.py:316-321),
    sorted for determinism (the reference's dict order is not)."""
    e = _elements(spark, sf_dir)
    counts = e.groupBy("path", "element_type").agg(F.count(F.lit(1)).alias("c"))
    entry = F.format_string("%s: %d", F.col("element_type"), F.col("c"))
    return counts.groupBy("path").agg(
        F.array_join(F.sort_array(F.collect_list(entry)), ", ").alias(
            "elements_by_type_str"
        )
    )


def agg_group_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(file, type) member list (vector_search_tool.py:245-264), each
    member rendered 'name[start-end]', sorted."""
    e = _elements(spark, sf_dir)
    member = F.format_string(
        "%s[%d-%d]", F.col("name"), F.col("start_line"), F.col("end_line")
    )
    return e.groupBy("path", "element_type").agg(
        F.array_join(F.sort_array(F.collect_list(member)), ", ").alias("members"),
        F.count(F.lit(1)).alias("n_members"),
    )


def project_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Display truncation with ellipsis (vector_search_tool.py:68-76)."""
    e = _elements(spark, sf_dir)
    display = F.when(
        F.length("content") > TRUNCATE_AT,
        F.concat(F.substring("content", 1, TRUNCATE_AT), F.lit("...")),
    ).otherwise(F.col("content"))
    return e.select("path", "name", display.alias("display"))


def filter_by_element_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only typed scan with a cap (vector_search_tool.py:149-201).

    The reference's ``get`` has storage order; we rank on the unique
    (path, start_line) key so the limit-10 cut set is deterministic and
    oracle-checkable (SURVEY.md §2.6 nondeterminism note)."""
    e = _elements(spark, sf_dir)
    return (
        e.filter(F.col("element_type") == "class")
        .orderBy("path", "start_line")
        .limit(10)
        .select("path", "name", "element_type", "start_line", "end_line")
    )


def filter_by_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All element rows of one file (vector_search_tool.py:217-219) — the
    per-file metadata fetch behind get_file_structure."""
    e = _elements(spark, sf_dir)
    return e.filter(F.col("path").like("%/doc_42.%")).select(
        "path", "name", "element_type", "start_line", "end_line", "n_lines"
    )


def filter_ext_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension -> parser routing (indexing_agent.py:131-142,
    lsp_tool.py:114-120) as a pure projection."""
    c = derived_corpus(spark, sf_dir)
    parser = (
        F.when(F.col("ext") == ".py", "tree_sitter_python")
        .when(F.col("ext").isin(".js", ".ts", ".tsx", ".jsx"), "tree_sitter_js")
        .when(F.col("ext") == ".md", "markdown_sections")
        .otherwise("fixed_chunks")
    )
    return c.select("path", "ext", parser.alias("parser"))


# --- diagnostics (lsp_tool.py:122-278), routed by extension -----------------


def _diag_rules(lines: DataFrame, rules: list) -> DataFrame:
    """Stack per-line rule predicates into (path, line_no, rule) rows."""
    rule_cols = [
        F.when(cond, F.lit(rule_name)) for rule_name, cond in rules
    ]
    stacked = lines.select(
        "path",
        (F.col("pos") + 1).cast("int").alias("line_no"),
        F.explode(F.array_compact(F.array(*rule_cols))).alias("rule"),
    )
    severity = F.when(F.col("rule") == "wildcard_import", "error").otherwise(
        "warning"
    )
    return stacked.withColumn("severity", severity)


def _py_rules(line):
    return [
        (
            "wildcard_import",
            F.trim(line).startswith("from") & line.contains("import *"),
        ),
        ("print_call", line.contains("print(")),
        ("long_line", F.length(line) > 120),
    ]


def _js_rules(line):
    s = F.trim(line)
    # The reference's 7-clause missing-semicolon heuristic
    # (lsp_tool.py:206-230): non-blank stripped line that is not a comment,
    # does not end a statement/block/continuation, and is not a control
    # header. Pure SQL predicate — stays in codegen, DuckDB-twinned.
    missing_semicolon = (
        (s != "")
        & ~s.startswith("//")
        & ~s.startswith("/*")
        & ~s.endswith(";")
        & ~s.endswith("{")
        & ~s.endswith("}")
        & ~s.endswith(",")
        & ~s.contains("if (")
        & ~s.contains("for (")
        & ~s.contains("while (")
    )
    return [
        ("console_log", line.contains("console.log")),
        ("multi_semicolon", line.contains(";;")),
        ("long_line", F.length(line) > 120),
        ("missing_semicolon", missing_semicolon),
    ]


def _generic_rules(line):
    return [
        ("overlong", F.length(line) > 200),
        ("trailing_ws", F.rtrim(line) != line),
    ]


def diag_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python branch alone (lsp_tool.py:122-191): wildcard-import error,
    print-call + long-line warnings over exploded lines."""
    lines = _corpus_lines(derived_corpus(spark, sf_dir))
    return _diag_rules(lines.filter(F.col("ext") == ".py"), _py_rules(F.col("line")))


def diag_js_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JS/TS branch alone (lsp_tool.py:193-241): console.log, multi-semicolon,
    long-line warnings."""
    lines = _corpus_lines(derived_corpus(spark, sf_dir))
    return _diag_rules(
        lines.filter(F.col("ext").isin(".js", ".ts")), _js_rules(F.col("line"))
    )


_PY_SYNTAX_SCHEMA = "path string, line_no int, rule string, severity string"
_PY_FLAKES_SCHEMA = "path string, line_no int, rule string, name string"


def diag_python_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file ``ast.parse`` syntax check (lsp_tool.py:129-137): one
    'syntax_error' row per unparseable .py file at the reported line.

    Runs the REAL CPython parser inside ``mapInPandas`` (narrow, no
    shuffle) over the derived valid-Python corpus with a deterministically
    injected breakage: modules with doc_id % 11 == 0 get ``def broken(:``
    prepended, which fails at line 1 regardless of the rest of the module.
    That makes the output arithmetic-predictable — the oracle derives the
    same rows from the generation rule alone — the same
    real-parser-vs-arithmetic-oracle construction as chunk_ast_python
    (sources/corpus.py:derived_python_corpus). Previously rows-only
    because the parser ran on arbitrary text, whose error lines no SQL
    engine can predict."""
    corpus = derived_python_corpus(spark, sf_dir)
    doc_id = F.regexp_extract(F.col("path"), r"mod_(\d+)\.py$", 1).cast("long")
    seeded = corpus.withColumn(
        "content",
        F.when(
            doc_id % 11 == 0,
            F.concat(F.lit("def broken(:\n"), F.col("content")),
        ).otherwise(F.col("content")),
    )
    return python_syntax_errors(seeded)


def python_syntax_errors(corpus: DataFrame) -> DataFrame:
    def check(batches):
        import ast as ast_mod

        import pandas as pd

        for pdf in batches:
            out = {"path": [], "line_no": [], "rule": [], "severity": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    ast_mod.parse(content)
                except SyntaxError as exc:
                    out["path"].append(path)
                    out["line_no"].append(exc.lineno or 0)
                    out["rule"].append("syntax_error")
                    out["severity"].append("error")
            df = pd.DataFrame(out)
            df["line_no"] = df["line_no"].astype("int32")
            yield df

    return corpus.select("path", "content").mapInPandas(check, _PY_SYNTAX_SCHEMA)


def diag_python_flakes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unused-import analysis — the highest-frequency rule of the
    reference's pyflakes pass (lsp_tool.py:157-177) as a real AST walk:
    collect imported bindings (asname-aware), collect every loaded Name,
    report bindings never referenced.

    Implemented on stdlib ``ast`` inside ``mapInPandas`` (pyflakes is not
    in the container; its API is a drop-in replacement for ``_file_flakes``
    at deployment — same (line, rule, name) rows). Runs over the VALID
    Python corpus so the DuckDB oracle can predict the exact output from
    the corpus generation rules — the checker is graded against an
    independent arithmetic prediction, not against itself. Unparseable
    files yield no rows (the syntax check owns those)."""
    corpus = derived_python_corpus(spark, sf_dir)

    def check(batches):
        import ast as ast_mod

        import pandas as pd

        def file_flakes(path, content):
            try:
                tree = ast_mod.parse(content)
            except SyntaxError:
                return
            imported = {}  # binding name -> first import line
            used = set()
            for node in ast_mod.walk(tree):
                if isinstance(node, ast_mod.Import):
                    for a in node.names:
                        binding = a.asname or a.name.split(".")[0]
                        imported.setdefault(binding, node.lineno)
                elif isinstance(node, ast_mod.ImportFrom):
                    for a in node.names:
                        binding = a.asname or a.name
                        imported.setdefault(binding, node.lineno)
                elif isinstance(node, ast_mod.Name):
                    used.add(node.id)
                elif isinstance(node, ast_mod.Attribute):
                    pass  # root Name of the chain is walked separately
            for binding, line in sorted(imported.items(), key=lambda kv: kv[1]):
                if binding not in used:
                    yield path, line, "unused_import", binding

        for pdf in batches:
            out = {"path": [], "line_no": [], "rule": [], "name": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                for p, line, rule, name in file_flakes(path, content):
                    out["path"].append(p)
                    out["line_no"].append(line)
                    out["rule"].append(rule)
                    out["name"].append(name)
            df = pd.DataFrame(out)
            df["line_no"] = df["line_no"].astype("int32")
            yield df

    return corpus.select("path", "content").mapInPandas(check, _PY_FLAKES_SCHEMA)


def corpus_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """diag_dispatch (lsp_tool.py:97-120): route lines to the python / js-ts
    / generic rule set by extension; union the three branches."""
    lines = _corpus_lines(derived_corpus(spark, sf_dir))
    line = F.col("line")
    py = _diag_rules(lines.filter(F.col("ext") == ".py"), _py_rules(line))
    js = _diag_rules(
        lines.filter(F.col("ext").isin(".js", ".ts")), _js_rules(line)
    )
    gen = _diag_rules(
        lines.filter(~F.col("ext").isin(".py", ".js", ".ts")),
        _generic_rules(line),
    )
    return py.unionByName(js).unionByName(gen)


def agg_diag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Severity rollup per file (lsp_tool.py:129-184 counters)."""
    d = corpus_diagnostics(spark, sf_dir)
    return d.groupBy("path").agg(
        F.sum(F.when(F.col("severity") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
        F.sum(F.when(F.col("severity") == "warning", 1).otherwise(0))
        .cast("bigint")
        .alias("n_warnings"),
    )


def chunk_fixed_lines_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's fallback chunker (indexing_agent.py:290-312) over the
    derived corpus; 10-line blocks (docs here are short — the reference's 50
    would mostly yield one block per file; same operator, smaller constant)."""
    from .chunking import chunk_fixed_lines

    return chunk_fixed_lines(
        derived_corpus(spark, sf_dir).select("path", "content"), chunk_size=10
    )


def chunk_markdown_sections_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown heading sectioner (indexing_agent.py:242-288) over the
    derived markdown corpus."""
    from ..sources.corpus import derived_markdown_corpus
    from .chunking import chunk_markdown_sections

    return chunk_markdown_sections(derived_markdown_corpus(spark, sf_dir))


def agg_collection_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-collection row counts (indexing_manager.py:131-152 status scan)."""
    parts = []
    for t in ("documents", "embeddings", "orders", "lineitem", "events"):
        parts.append(
            load_table(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.lit(t).alias("collection"), "n_rows")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def upsert_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key upsert semantics (the MERGE resolution of
    sink_upsert_elements, indexing_agent.py:332-361) as a ranking window:
    latest event per user wins."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            "event_type",
            "value",
        )
    )


def build_index(
    spark: SparkSession,
    corpus_root: str,
    index_dir: str,
    chunk_size: int = 50,
) -> dict:
    """The reference's `index_codebase` lifecycle (indexing_agent.py:104-124,
    SURVEY.md §3.1) as one batch Spark pipeline:

        scan_corpus -> route chunker by ext (.py AST / .js-.ts elements /
             .md sectioner / fixed lines)
          -> project (searchable text, content hash, composite id)
          -> ANTI-JOIN against the existing index on id   (the §4 fix: an
             unchanged element is never re-embedded — the reference
             re-encodes everything every run)
          -> Arrow pandas_udf embedding of the NEW/CHANGED elements only
          -> keyed upsert (path#name#start_line) into the elements table --
             replaces stale chunks of changed files (fixes the §2.10
             stale-row leak; start_line in the key because names repeat
             within a file — two imports, repeated headings)
          -> per-file summary upsert + JSON job report.

    Returns the report as a plain dict (files, elements, embedded_new).
    """
    from ..sources.corpus import scan_corpus

    return build_index_from_corpus(
        spark, scan_corpus(spark, corpus_root), index_dir, chunk_size
    )


def build_index_from_corpus(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    chunk_size: int = 50,
) -> dict:
    """`build_index` body over an arbitrary (path, ext, content) corpus
    DataFrame (file scan, derived corpus, or a streaming micro-batch)."""
    import os

    from ..sources.sinks import upsert_parquet, write_json_report
    from .chunking import (
        chunk_fixed_lines,
        chunk_js_elements,
        chunk_markdown_sections,
        chunk_python_ast,
    )
    from .embed import make_embed_udf

    # MATERIALIZE the input corpus first: it feeds SIX consumers (the
    # four extension-routed chunkers, the summary aggregate, the report
    # count), and corpus frames are themselves derivation pipelines
    # (indexing_corpus unions four derived corpora over documents) —
    # without this the derivation re-ran per consumer.
    corpus = corpus.localCheckpoint(eager=True)
    js_exts = (".js", ".ts", ".tsx", ".jsx")
    md = corpus.filter(F.col("ext") == ".md").select("path", "content")
    py = corpus.filter(F.col("ext") == ".py").select("path", "content")
    js = corpus.filter(F.col("ext").isin(*js_exts)).select("path", "content")
    rest = corpus.filter(
        ~F.col("ext").isin(".md", ".py", *js_exts)
    ).select("path", "content")
    # Route by extension (indexing_agent.py:131-142): .py through the REAL
    # AST extractor (element types from actual functions/classes/imports),
    # .js/.ts through the heuristic element extractor, .md through the
    # heading sectioner, the rest through fixed-line chunks.
    elements = (
        chunk_python_ast(py)
        .drop("docstring")
        .unionByName(chunk_js_elements(js))
        .unionByName(chunk_fixed_lines(rest, chunk_size=chunk_size))
        .unionByName(chunk_markdown_sections(md))
    )
    h = F.md5(F.concat_ws(":", "name", "element_type", "content"))
    # element_key includes start_line: names repeat within a file (two
    # import rows, repeated markdown headings), and the upsert must not
    # collapse distinct elements (reference keys on path:start:hash,
    # indexing_agent.py:350).
    # MATERIALIZE the chunked/keyed elements once (the SCALE.md r5 rule:
    # Spark shares no subtrees across actions): this frame feeds FOUR
    # consumers — the embed+count, the elements upsert, the summary
    # aggregate, and the report count — and without the checkpoint the
    # whole AST/JS/MD chunk pipeline re-ran for each (measured 14.8 s ->
    # 5.5 s for the sf0.01 index_pipeline on a vanilla session).
    keyed = elements.select(
        "*",
        h.alias("hash"),
        F.concat_ws(":", "path", F.col("start_line").cast("string"), h).alias("id"),
        F.concat_ws(
            "#", "path", "name", F.col("start_line").cast("string")
        ).alias("element_key"),
        F.concat(
            F.col("name"), F.lit(" "), F.col("element_type"), F.lit("\n"),
            F.col("content"),
        ).alias("document"),
    ).localCheckpoint(eager=True)
    elements_path = os.path.join(index_dir, "code_elements.parquet")
    if os.path.exists(elements_path):
        existing_ids = spark.read.parquet(elements_path).select("id")
        fresh = keyed.join(existing_ids, "id", "left_anti")
    else:
        fresh = keyed
    embed = make_embed_udf()
    # embed once: consumed by both the count and the upsert write
    embedded = fresh.withColumn(
        "embedding", embed(F.col("document"))
    ).localCheckpoint(eager=True)
    n_new = embedded.count()
    if n_new:
        upsert_parquet(spark, embedded, elements_path, key="element_key")

    summaries = (
        corpus.select(
            "path",
            F.col("ext").alias("file_type"),
            F.size(F.split("content", "\n")).alias("line_count"),
        )
        .join(
            keyed.groupBy("path").agg(F.count(F.lit(1)).alias("element_count")),
            "path",
        )
    )
    upsert_parquet(
        spark, summaries, os.path.join(index_dir, "file_summaries.parquet"),
        key="path",
    )
    report = {
        "indexed_files": corpus.count(),
        "total_elements": keyed.count(),
        "embedded_new": n_new,
    }
    report_df = spark.createDataFrame(
        [tuple(report.values())], list(report.keys())
    )
    write_json_report(report_df, os.path.join(index_dir, "report.json"))
    return report


def file_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The get_file_context lifecycle (SURVEY.md §3.3) end-to-end for one
    file: element rows grouped by type joined with the file-summary row.

    One groupBy shuffle over the (tiny, filter-pruned) per-file slice plus
    a broadcast-sized summary join — the full trace of the reference's
    third entry point (vector_search_tool.py:217-266).
    """
    e = _elements(spark, sf_dir).filter(F.col("path").like("%/doc_42.%"))
    member = F.format_string(
        "%s[%d-%d]", F.col("name"), F.col("start_line"), F.col("end_line")
    )
    grouped = e.groupBy("path", "element_type").agg(
        F.array_join(F.sort_array(F.collect_list(member)), ", ").alias("members"),
        F.count(F.lit(1)).alias("n_members"),
    )
    summary = agg_file_summary(spark, sf_dir).select(
        "path", "file_type", "line_count", "element_count"
    )
    return grouped.join(summary, "path")


def index_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE §3.1 lifecycle as an oracle-checked driver query: run
    ``build_index_from_corpus`` over the derived corpus into a throwaway
    index directory (chunk -> hash/id -> embed -> keyed upsert), then read
    the persisted elements table back. The DuckDB oracle recomputes the
    same elements in SQL — what lands on disk is the checked contract,
    covering the chunker routing, projections, AND the upsert path.
    """
    import os
    import tempfile

    index_dir = tempfile.mkdtemp(prefix="adk_index_")
    from ..sources.corpus import indexing_corpus

    build_index_from_corpus(
        spark, indexing_corpus(spark, sf_dir), index_dir, chunk_size=50
    )
    stored = spark.read.parquet(os.path.join(index_dir, "code_elements.parquet"))
    return stored.select(
        "path", "name", "element_type", "start_line", "end_line", "hash", "id"
    )
