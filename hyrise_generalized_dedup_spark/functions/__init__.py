"""Scalar/column function library.

The reference's scalar surface is SUBSTR + CONCAT + EXTRACT
(src/lib/expression/function_expression.hpp:8-11) — all native Columns in
Spark (plans/relational.py exercises them). This package adds the
training-data-pipeline functions a 100 TB corpus needs: text quality /
language-id / token stats (text.py), document fingerprints (fingerprint.py),
and multimodal binary-column plumbing (multimodal.py) — all JVM-side
Column expressions or Arrow-batched pandas UDFs, never per-row Python.
"""
