from pyspark.sql import Row

from adk_noui_vectordb_spark.operators.chunking import (
    chunk_fixed_lines,
    chunk_markdown_sections,
)

MD = """intro line one
intro line two
# First
alpha
beta
## Second
gamma
# Empty

# Last
delta"""


def test_markdown_sections(spark):
    df = spark.createDataFrame([Row(path="a.md", content=MD)])
    rows = {r["name"]: r for r in chunk_markdown_sections(df).collect()}
    # implicit Introduction section for content before the first heading
    assert rows["Introduction"]["content"] == "intro line one\nintro line two"
    assert rows["Introduction"]["start_line"] == 1
    assert rows["First"]["content"] == "alpha\nbeta"
    assert rows["Second"]["content"] == "gamma"
    assert rows["Last"]["content"] == "delta"
    # blank section dropped (reference skips empty sections)
    assert "Empty" not in rows
    assert all(r["element_type"] == "markdown_section" for r in rows.values())


def test_fixed_lines_chunking(spark):
    content = "\n".join(f"line{i}" for i in range(120))
    df = spark.createDataFrame([Row(path="big.txt", content=content)])
    rows = sorted(
        chunk_fixed_lines(df, chunk_size=50).collect(),
        key=lambda r: r["start_line"],
    )
    assert [r["name"] for r in rows] == ["chunk_0", "chunk_1", "chunk_2"]
    assert (rows[0]["start_line"], rows[0]["end_line"]) == (1, 50)
    assert (rows[2]["start_line"], rows[2]["end_line"]) == (101, 120)
    assert rows[0]["content"].startswith("line0\nline1")


def test_fixed_lines_skips_blank_chunks(spark):
    # 50 real lines then 50 whitespace-only lines -> second chunk dropped
    content = "\n".join(["x"] * 50 + ["   "] * 50)
    df = spark.createDataFrame([Row(path="pad.txt", content=content)])
    rows = chunk_fixed_lines(df, chunk_size=50).collect()
    assert [r["name"] for r in rows] == ["chunk_0"]


def test_minhash_arrow_equals_expr(spark, sf_dir):
    """The Arrow minhash kernel must be value-identical to the pure-JVM
    expression pipeline (same md5-prefix/int64 arithmetic)."""
    from adk_noui_vectordb_spark.operators.dedup import (
        _minhash_wide,
        _minhash_wide_expr,
    )

    a = sorted(tuple(r) for r in _minhash_wide(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in _minhash_wide_expr(spark, sf_dir).collect())
    assert a == b
