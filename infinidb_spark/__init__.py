"""infinidb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of InfiniDB (reference: /root/reference,
infinidb/infinidb, a columnar MPP DBMS packaged as a MySQL storage engine).

Design stance (SURVEY.md §7): the reference's entire distributed execution
machinery (ExeMgr JobLists, PrimProc block primitives, RowGroup FIFOs) is
replaced by Spark SQL / Catalyst / Tungsten.  What this package provides is

* a session + catalog layer (``InfiniSession``) that registers Parquet
  tables the way InfiniDB's system catalog did
  (ref ``dbcon/execplan/calpontsystemcatalog.h:107``),
* the MySQL-dialect scalar function library
  (ref ``utils/funcexp/funcexp.cpp:68-207``),
* operator helpers where Spark needs a composition to match reference
  semantics (GROUP_CONCAT ordering, DISTINCT-over-window, top-N,
  set-op type normalization, …),
* bulk load (ref ``writeengine/bulk/cpimport.cpp``) as CSV→Parquet,
* scale-path extensions: dedup (exact/MinHash-LSH/SimHash/Jaccard),
  similarity search over embeddings, text analysis, multimodal column
  plumbing, and Structured Streaming over the ``events`` table.

Everything is DataFrame-declarative so Catalyst keeps predicate pushdown,
column pruning, partial aggregation, broadcast selection and AQE.
"""

from infinidb_spark.session import InfiniSession, get_spark, load_tables

__all__ = ["InfiniSession", "get_spark", "load_tables"]

__version__ = "0.1.0"
