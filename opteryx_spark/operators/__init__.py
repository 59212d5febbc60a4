"""Relational + training-data-pipeline operators built Spark-first.

Everything here is expressed with built-in ``pyspark.sql.functions``
(JVM-side, codegen-friendly) wherever semantics allow; Pandas UDFs are
used only where a kernel genuinely cannot be expressed (see
``multimodal``).  No operator collects to the driver.
"""

from opteryx_spark.operators import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
