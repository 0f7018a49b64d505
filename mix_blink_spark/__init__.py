"""mix_blink_spark — a from-scratch PySpark-native record-linkage engine.

Re-expresses the capabilities of the ``mix-blink`` bi-encoder entity-linking
toolkit (reference: /root/reference, YuSawan/mix-blink) as a three-stage
DataFrame pipeline over web-page tables:

1. **blocking**  — normalized-mention keys + MinHash-LSH shingle signatures
   (``operators.blocking``), with salted splitting of hot keys;
2. **pairwise scoring** — dense bi-encoder embedding measures (ip/cos/l2,
   reference retriever/dense.py:41-46) broadcast to executors, plus
   Jaro-Winkler / Levenshtein string scores, all in Arrow pandas UDFs
   (``operators.scoring``);
3. **transitive clustering** — large-star/small-star connected components
   with per-iteration ``checkpoint()`` (``operators.cc``).

Everything is public PySpark DataFrame API + three Arrow-vectorized kernels;
no per-row Python in any hot path.
"""

__version__ = "0.1.0"
