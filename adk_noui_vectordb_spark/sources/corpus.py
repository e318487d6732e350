"""Corpus sources: real file scan + deterministic derived corpus.

``scan_corpus`` is the reference's recursive source scan with ignore-dir
pruning (reference: coding_agent/tools/indexing_agent.py:104-114) as a Spark
file source: the glob/regex prune happens at planning time (path pruning),
so ignored trees are never read — the 100 TB analog of partition pruning.

``derived_corpus`` builds a (path, ext, content) corpus DETERMINISTICALLY
from the ``documents`` table with injected rule-triggering lines, and
``DERIVED_CORPUS_SQL`` is its DuckDB twin — every downstream indexing
operator (chunk -> element -> summary -> diagnostics) gets an oracle-checked
query even though the container has no real source tree to index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

IGNORE_DIRS = (".git", "__pycache__", "node_modules", ".venv", "venv", ".adk_index")
SOURCE_EXTS = (".py", ".js", ".ts", ".tsx", ".jsx", ".md")

_IGNORE_RE = "/(" + "|".join(d.replace(".", "\\.") for d in IGNORE_DIRS) + ")/"

# lang -> extension routing for the derived corpus (fixed, arbitrary).
LANG_EXT = {"en": ".py", "de": ".js", "es": ".ts", "fr": ".md", "zh": ".txt"}


def scan_corpus(spark: SparkSession, root: str) -> DataFrame:
    """Recursive scan of source files under ``root`` -> (path, ext, content).

    Reads whole files (wholetext) with recursive lookup; prunes ignored
    directories with a path filter Catalyst applies before content IO, and
    keeps only the reference's supported extensions.
    """
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .text(root, wholetext=True)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("content"),
        )
    )
    ext = F.lower(F.regexp_extract(F.col("path"), r"(\.[^./\\]+)$", 1))
    return (
        df.filter(~F.col("path").rlike(_IGNORE_RE))
        .withColumn("ext", ext)
        .filter(F.col("ext").isin(*SOURCE_EXTS))
        .select("path", "ext", "content")
    )


def derived_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (path, ext, content) corpus derived from documents.

    Must stay expression-for-expression identical to DERIVED_CORPUS_SQL.
    """
    d = load_table(spark, sf_dir, "documents")
    ext = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in LANG_EXT.items()]
    )
    header = F.when(
        F.col("doc_id") % 7 == 0, F.lit("from os import *\n")
    ).otherwise(F.lit("import os\n"))
    printline = F.when(F.col("doc_id") % 3 == 0, F.lit("print(value)\n")).otherwise(
        F.lit("")
    )
    jsline = F.when(
        F.col("doc_id") % 4 == 0, F.lit("console.log(x);;\n")
    ).otherwise(F.lit(""))
    trailing = F.when(F.col("doc_id") % 5 == 0, F.lit("x = 1 \n")).otherwise(
        F.lit("")
    )
    body = F.replace(F.col("text"), F.lit(" the "), F.lit("\n"))
    return d.select(
        F.concat(
            F.lit("corpus/"),
            F.col("source"),
            F.lit("/doc_"),
            F.col("doc_id").cast("string"),
            ext,
        ).alias("path"),
        ext.alias("ext"),
        F.concat(header, printline, jsline, trailing, body).alias("content"),
    )


def derived_markdown_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (path, content) MARKDOWN corpus with real headings, for
    the heading sectioner (indexing_agent.py:242-288). Built from the 'fr'
    documents (the .md slice of the derived corpus); every ' the ' becomes a
    '## Part' heading line so each doc yields several sections.

    Must stay expression-for-expression identical to DERIVED_MD_SQL.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "fr")
    return d.select(
        F.concat(
            F.lit("corpus/"),
            F.col("source"),
            F.lit("/doc_"),
            F.col("doc_id").cast("string"),
            F.lit(".md"),
        ).alias("path"),
        F.concat(
            F.lit("# Overview\n"),
            F.replace(F.col("text"), F.lit(" the "), F.lit("\n## Part\n")),
        ).alias("content"),
    )


def derived_python_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic VALID-Python corpus for the AST chunker — the 'en'
    documents rendered as real modules: two imports, 1-3 functions with
    docstrings, one class with a method.

    The point of the construction: the Spark side parses these files with
    GENUINE ``ast.parse`` (operators/chunking.py:chunk_python_ast) while
    the DuckDB oracle predicts the expected elements ARITHMETICALLY from
    the same generation rules (DERIVED_PY_SQL + the py_elements CTE in
    __spark_entry__) — a hash-checked oracle over a real parser, not a
    string heuristic checked against itself.

    Layout (1-based lines; nf = doc_id % 3 + 1 functions; w = first
    lowercase word of the doc text):

        1  import os
        2  from collections import OrderedDict
        3
        4+4i  def f_i(x):            (for i in 0..nf-1)
        5+4i      \"\"\"w i\"\"\"
        6+4i      return x + i
        7+4i
        4+4nf class C<doc_id>:
        5+4nf     \"\"\"w class\"\"\"
        6+4nf     def m(self):
        7+4nf         return <doc_id>

    Must stay expression-for-expression identical to DERIVED_PY_SQL.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    w = F.regexp_extract(F.col("text"), "[a-z]+", 0)
    nf = F.col("doc_id") % 3 + 1
    doc_id_s = F.col("doc_id").cast("string")
    header = F.lit("import os\nfrom collections import OrderedDict\n\n")

    def fn_block(i: int):
        return F.when(
            nf > i,
            F.concat(
                F.lit(f'def f_{i}(x):\n    """'),
                w,
                F.lit(f' {i}"""\n    return x + {i}\n\n'),
            ),
        ).otherwise(F.lit(""))

    cls_block = F.concat(
        F.lit("class C"),
        doc_id_s,
        F.lit(':\n    """'),
        w,
        F.lit(' class"""\n    def m(self):\n        return '),
        doc_id_s,
    )
    return d.select(
        F.concat(
            F.lit("corpus_py/"),
            F.col("source"),
            F.lit("/mod_"),
            doc_id_s,
            F.lit(".py"),
        ).alias("path"),
        F.lit(".py").alias("ext"),
        F.concat(header, fn_block(0), fn_block(1), fn_block(2), cls_block).alias(
            "content"
        ),
    )


def derived_js_corpus(
    spark: SparkSession, sf_dir: str, lang: str = "de", ext: str = ".js"
) -> DataFrame:
    """Deterministic VALID-JS/TS corpus for the heuristic element extractor
    (operators/chunking.py:chunk_js_elements) — the ``lang`` documents
    rendered as real modules: two imports, 1-3 exported functions, one
    class with 1-2 methods.

    Same construction as ``derived_python_corpus``: the Spark side extracts
    elements with the GENERAL js/ts extractor while the DuckDB oracle
    predicts the rows ARITHMETICALLY from these generation rules
    (DERIVED_JS_SQL + the js_elements CTE in __spark_entry__).

    Layout (1-based lines; nf = doc_id % 3 + 1 functions; nm = doc_id % 2
    + 1 methods; w = first lowercase word of the doc text):

        1      import os from 'os';
        2      import { readFile } from 'fs';
        3
        4+4i   export function f_i(x) {      (for i in 0..nf-1)
        5+4i     return x + i; // w i
        6+4i   }
        7+4i
        S      class C<doc_id> {             (S = 4 + 4*nf)
        S+1+3j   m_j(x) {                    (for j in 0..nm-1)
        S+2+3j     return <doc_id> + j;
        S+3+3j   }
        S+3nm+1 }

    Must stay expression-for-expression identical to DERIVED_JS_SQL.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == lang)
    w = F.regexp_extract(F.col("text"), "[a-z]+", 0)
    nf = F.col("doc_id") % 3 + 1
    nm = F.col("doc_id") % 2 + 1
    doc_id_s = F.col("doc_id").cast("string")
    prefix = "corpus_js/" if ext == ".js" else "corpus_ts/"
    header = F.lit(
        "import os from 'os';\nimport { readFile } from 'fs';\n\n"
    )

    def fn_block(i: int):
        return F.when(
            nf > i,
            F.concat(
                F.lit(f"export function f_{i}(x) {{\n  return x + {i}; // "),
                w,
                F.lit(f" {i}\n}}\n\n"),
            ),
        ).otherwise(F.lit(""))

    def m_block(j: int):
        return F.when(
            nm > j,
            F.concat(
                F.lit(f"  m_{j}(x) {{\n    return "),
                doc_id_s,
                F.lit(f" + {j};\n  }}\n"),
            ),
        ).otherwise(F.lit(""))

    cls_block = F.concat(
        F.lit("class C"), doc_id_s, F.lit(" {\n"),
        m_block(0), m_block(1), F.lit("}"),
    )
    return d.select(
        F.concat(
            F.lit(prefix),
            F.col("source"),
            F.lit("/mod_"),
            doc_id_s,
            F.lit(ext),
        ).alias("path"),
        F.lit(ext).alias("ext"),
        F.concat(header, fn_block(0), fn_block(1), fn_block(2), cls_block).alias(
            "content"
        ),
    )


def indexing_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus the full indexing pipeline runs over: ``derived_corpus``
    with the .py slice replaced by the VALID-Python modules and the .js/.ts
    slices replaced by the VALID-JS/TS modules, so both AST/element routes
    do real extraction instead of falling back on unparseable word-soup
    files."""
    base = derived_corpus(spark, sf_dir).filter(
        ~F.col("ext").isin(".py", ".js", ".ts")
    )
    return (
        base.unionByName(derived_python_corpus(spark, sf_dir))
        .unionByName(derived_js_corpus(spark, sf_dir, "de", ".js"))
        .unionByName(derived_js_corpus(spark, sf_dir, "es", ".ts"))
    )


DERIVED_PY_SQL = '''
py_base AS (
    SELECT 'corpus_py/' || source || '/mod_' || doc_id || '.py' AS path,
           doc_id,
           doc_id % 3 + 1 AS nf,
           regexp_extract(text, '[a-z]+') AS w
    FROM documents WHERE lang = 'en'
),
py_corpus AS (
    SELECT path, '.py' AS ext,
           'import os' || chr(10) || 'from collections import OrderedDict' || chr(10) || chr(10)
           || CASE WHEN nf > 0 THEN 'def f_0(x):' || chr(10) || '    """' || w || ' 0"""' || chr(10) || '    return x + 0' || chr(10) || chr(10) ELSE '' END
           || CASE WHEN nf > 1 THEN 'def f_1(x):' || chr(10) || '    """' || w || ' 1"""' || chr(10) || '    return x + 1' || chr(10) || chr(10) ELSE '' END
           || CASE WHEN nf > 2 THEN 'def f_2(x):' || chr(10) || '    """' || w || ' 2"""' || chr(10) || '    return x + 2' || chr(10) || chr(10) ELSE '' END
           || 'class C' || doc_id || ':' || chr(10) || '    """' || w || ' class"""' || chr(10) || '    def m(self):' || chr(10) || '        return ' || doc_id
           AS content
    FROM py_base
)
'''


DERIVED_JS_SQL = """
js_base{sfx} AS (
    SELECT '{prefix}' || source || '/mod_' || doc_id || '{ext}' AS path,
           doc_id,
           doc_id % 3 + 1 AS nf,
           doc_id % 2 + 1 AS nm,
           regexp_extract(text, '[a-z]+') AS w
    FROM documents WHERE lang = '{lang}'
),
js_corpus{sfx} AS (
    SELECT path, '{ext}' AS ext,
           'import os from ''os'';' || chr(10) || 'import {{ readFile }} from ''fs'';' || chr(10) || chr(10)
           || CASE WHEN nf > 0 THEN 'export function f_0(x) {{' || chr(10) || '  return x + 0; // ' || w || ' 0' || chr(10) || '}}' || chr(10) || chr(10) ELSE '' END
           || CASE WHEN nf > 1 THEN 'export function f_1(x) {{' || chr(10) || '  return x + 1; // ' || w || ' 1' || chr(10) || '}}' || chr(10) || chr(10) ELSE '' END
           || CASE WHEN nf > 2 THEN 'export function f_2(x) {{' || chr(10) || '  return x + 2; // ' || w || ' 2' || chr(10) || '}}' || chr(10) || chr(10) ELSE '' END
           || 'class C' || doc_id || ' {{' || chr(10)
           || '  m_0(x) {{' || chr(10) || '    return ' || doc_id || ' + 0;' || chr(10) || '  }}' || chr(10)
           || CASE WHEN nm > 1 THEN '  m_1(x) {{' || chr(10) || '    return ' || doc_id || ' + 1;' || chr(10) || '  }}' || chr(10) ELSE '' END
           || '}}'
           AS content
    FROM js_base{sfx}
)
"""


def derived_js_sql(lang: str = "de", ext: str = ".js", sfx: str = "") -> str:
    """DERIVED_JS_SQL instantiated for a (lang, ext) slice — the DuckDB
    twin of ``derived_js_corpus(spark, sf_dir, lang, ext)``. ``sfx``
    suffixes the CTE names so two slices can share one WITH clause."""
    prefix = "corpus_js/" if ext == ".js" else "corpus_ts/"
    return DERIVED_JS_SQL.format(prefix=prefix, ext=ext, lang=lang, sfx=sfx)


DERIVED_MD_SQL = """
md_corpus AS (
    SELECT 'corpus/' || source || '/doc_' || doc_id || '.md' AS path,
           '# Overview' || chr(10) ||
           replace(text, ' the ', chr(10) || '## Part' || chr(10)) AS content
    FROM documents WHERE lang = 'fr'
)
"""


DERIVED_CORPUS_SQL = """
corpus AS (
    SELECT 'corpus/' || source || '/doc_' || doc_id ||
           CASE lang WHEN 'en' THEN '.py' WHEN 'de' THEN '.js'
                     WHEN 'es' THEN '.ts' WHEN 'fr' THEN '.md'
                     ELSE '.txt' END AS path,
           CASE lang WHEN 'en' THEN '.py' WHEN 'de' THEN '.js'
                     WHEN 'es' THEN '.ts' WHEN 'fr' THEN '.md'
                     ELSE '.txt' END AS ext,
           (CASE WHEN doc_id % 7 = 0 THEN 'from os import *' || chr(10) ELSE 'import os' || chr(10) END)
           || (CASE WHEN doc_id % 3 = 0 THEN 'print(value)' || chr(10) ELSE '' END)
           || (CASE WHEN doc_id % 4 = 0 THEN 'console.log(x);;' || chr(10) ELSE '' END)
           || (CASE WHEN doc_id % 5 = 0 THEN 'x = 1 ' || chr(10) ELSE '' END)
           || replace(text, ' the ', chr(10)) AS content
    FROM documents
)
"""
