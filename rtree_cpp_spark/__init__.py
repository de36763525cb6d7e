"""rtree_cpp_spark — a PySpark-native spatial-join + tiling engine.

A brand-new distributed re-expression of the query semantics of the
reference R-tree engine (serafm/rtree_cpp): STR bulk-loaded R-tree with
range / kNN / spatial-join queries (reference:
src/rtree/builders/RTreeBulkLoad.cpp) becomes a hierarchical quadkey
cell index over DataFrames:

- the "index" is table *layout*: a cell-key column + repartitionByRange
  + sortWithinPartitions (reference STR bulk load, RTreeBulkLoad.cpp:7-97)
- range query  = cell-cover join + exact closed-bound predicate
  (reference DFS, RTreeBulkLoad.cpp:139-210)
- spatial join = salted cell equi-join + refinement + reference-point
  dedup (reference dual-tree DFS, RTreeBulkLoad.cpp:304-379)
- kNN          = batched cell-ring expansion with an exact distance
  bound (reference best-first search, RTreeBulkLoad.cpp:238-302)
- tiles        = the leaf-assignment relation the STR build materializes
  (RTreeBulkLoad.cpp:42-58)

Everything custom lives above the DataFrame API (job-level planning +
vectorized Arrow/pandas UDF kernels); no RDDs, no per-row Python.
"""

__version__ = "0.1.0"
