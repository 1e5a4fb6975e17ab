"""multithreaded_map_reduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MapReduce framework (``ganmol123/multithreaded_map_reduce``,
surveyed in SURVEY.md), re-expressed Spark-first:

- the reference's map/shuffle/reduce pipeline becomes declarative
  DataFrame plans optimized by Catalyst (SURVEY.md §3);
- its two shipped applications (WordCounter, InvertedIndex) and the
  generic ``map_fn``/``reduce_fn`` client API (reference
  ``include/MapReduceMaster.h:75-112``) are first-class operators;
- the relational / windowing / dedup / similarity / text-analysis surface
  a 100 TB training-data pipeline needs is built on top.

Nothing here copies reference code — the reference is a C++ process-fork
RPC engine; this package is a PySpark library.
"""

from .session import get_spark
from .sources.catalog import TABLES, load_table, register_views
from .operators.mapreduce import MapReduce

__all__ = ["get_spark", "TABLES", "load_table", "register_views", "MapReduce"]
__version__ = "0.1.0"
