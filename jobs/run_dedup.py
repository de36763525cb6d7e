"""Corpus deduplication job — the training-data pipeline counterpart of
the spatial jobs (no reference analog; the reference is spatial-only).

    spark-submit --py-files engine.zip jobs/run_dedup.py \
        --input <documents_parquet> --mode components \
        --output /data/out/dedup --manifest /data/out/manifest

Modes:
  exact       -> (text_hash, keep_id, n_copies)         one row per distinct text
  pairs       -> (a_doc_id, b_doc_id)                   LSH near-dup candidates
  components  -> (doc_id, component_id)                 duplicate clusters

Output is hash-partitioned on the stable leading key (``part`` =
pmod(xxhash64(key), --num-parts)) so the resumable write has the same
per-partition lineage + skip-on-rerun semantics as the spatial jobs.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs._common import base_parser, build_session, finish
from pyspark.sql import functions as F

from rtree_cpp_spark.operators import dedup


def main() -> None:
    p = base_parser("corpus deduplication (exact / LSH pairs / duplicate clusters)")
    p.add_argument("--input", required=True, help="documents table (doc_id, text)")
    p.add_argument("--mode", choices=["exact", "pairs", "components"], default="components")
    p.add_argument("--num-parts", type=int, default=64,
                   help="hash-partition count for lineage granularity")
    args = p.parse_args()
    if args.num_parts <= 0:
        p.error(f"--num-parts must be positive, got {args.num_parts}")

    spark = build_session("rtree-spark-dedup", args)
    docs = spark.read.parquet(args.input)
    if args.mode == "exact":
        out, key = dedup.exact_dedup(docs), "keep_id"
    elif args.mode == "pairs":
        out, key = dedup.lsh_candidate_pairs(docs), "a_doc_id"
    else:
        out, key = dedup.duplicate_components(docs), "doc_id"
    out = out.withColumn(
        "part", F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(args.num_parts))
    )
    finish(out, args, stage=f"dedup_{args.mode}")
    spark.stop()


if __name__ == "__main__":
    main()
