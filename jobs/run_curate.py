"""Corpus curation job — the composed training-data pipeline
(quality filter → exact dedup → near-dup clustering → representative
selection) as a resumable cluster job.

    spark-submit --py-files engine.zip jobs/run_curate.py \
        --input <documents_parquet> --min-quality 0.5 \
        --output /data/out/curated --manifest /data/out/manifest

Output: (doc_id, quality) of the curated corpus, hash-partitioned on
doc_id for per-partition lineage + skip-on-rerun, like jobs/run_dedup.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs._common import base_parser, build_session, finish
from pyspark.sql import functions as F

from rtree_cpp_spark.operators.pipeline import curate


def main() -> None:
    p = base_parser("corpus curation (quality -> exact dedup -> near-dup representatives)")
    p.add_argument("--input", required=True, help="documents table (doc_id, text)")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--num-parts", type=int, default=64,
                   help="hash-partition count for lineage granularity")
    args = p.parse_args()
    if args.num_parts <= 0:
        p.error(f"--num-parts must be positive, got {args.num_parts}")

    spark = build_session("rtree-spark-curate", args)
    docs = spark.read.parquet(args.input)
    out = curate(docs, min_quality=args.min_quality).withColumn(
        "part", F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(args.num_parts))
    )
    finish(out, args, stage="curate")
    spark.stop()


if __name__ == "__main__":
    main()
