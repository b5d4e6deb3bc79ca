"""Approximate nearest neighbor over embedding columns (array<float>).

brute.py — exact cosine top-k: the correctness baseline, JVM-side
zip_with/aggregate arithmetic (no UDF), query side broadcast.
lsh.py — random-hyperplane (sign-sketch) bucketing: the scale path; at
10^12 rows the bucket equi-join replaces the quadratic cross join.
"""
