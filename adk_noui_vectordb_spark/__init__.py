"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference vector-DB pipeline (GWeale/ADK-noUI-vectorDB).

The reference (see SURVEY.md) is a chunk -> embed -> store -> k-NN-retrieve
pipeline over a document corpus plus rule-based text diagnostics. This package
re-expresses that surface Spark-first (DataFrame/SQL, Catalyst-optimizable),
and extends it with the LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the same data model needs at
100 TB scale.

Layout:
    session.py    -- tuned SparkSession builder
    sources/      -- table registry, corpus scan, upsert sinks
    functions/    -- scalar/array expression helpers (vector math, text)
    operators/    -- the operator inventory from SURVEY.md section 2
    streaming/    -- incremental re-index + watermarked event aggregation
    plans/        -- plan-inspection helpers (pushdown / broadcast asserts)
"""

__version__ = "0.1.0"
