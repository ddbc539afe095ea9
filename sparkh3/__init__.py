"""sparkh3 — a PySpark-native H3 spatial-join + tiling engine.

From-scratch rebuild of the query/data-processing capabilities of the
DahnJ/H3-Pandas reference (read-only at /root/reference), re-expressed as
Spark DataFrame algebra + vectorized Arrow/pandas UDFs over a from-scratch
NumPy H3 kernel (no h3-py dependency). See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
