"""Vectorized kernels (Arrow pandas UDFs) and JVM-side column expressions.

The engine exposes exactly the UDF surface documented in SURVEY.md §2.8:
``extract_text`` (byte-stable), ``encode`` (dense embeddings), and the pair
scorers. Everything else stays in ``pyspark.sql.functions`` so Catalyst can
optimize it.
"""
