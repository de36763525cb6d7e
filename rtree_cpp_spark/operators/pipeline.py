"""End-to-end corpus curation — the COMPOSITION a training-data
pipeline actually runs, as one oracled query:

    quality filter → exact dedup (min-id survivor) →
    near-dup clustering (MinHash LSH → connected components) →
    representative selection (doc == its component's min id)

Each stage is an already-gate-verified operator; this proves the
composed semantics end-to-end (the oracle chains the same stages as
SQL CTEs over the same table).

Scale shape: quality + exact dedup are one scan + one groupBy each
(map-side partials); the LSH/component stages run on the filtered
survivor set, so the expensive near-dup machinery only ever sees
post-filter volume — the stage order IS the optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtree_cpp_spark.operators import dedup
from rtree_cpp_spark.operators.text_analysis import quality_score


def curate(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """(doc_id, quality) of the curated corpus: quality-passing docs that
    survive exact dedup and represent their near-dup cluster."""
    q = quality_score(docs)
    kept = docs.select("doc_id", "text").join(
        q.where(F.col("quality") >= F.lit(min_quality)), "doc_id"
    )
    exact_rep = kept.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    surv = kept.join(exact_rep, "doc_id")
    comps = dedup.duplicate_components(surv.select("doc_id", "text"))
    reps = comps.where(F.col("doc_id") == F.col("component_id")).select("doc_id")
    return surv.join(reps, "doc_id").select("doc_id", "quality")
