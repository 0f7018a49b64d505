"""Incremental / append processing.

The reference is pure batch (SURVEY.md §2.7: no streaming operators), and
the north rule asks for *resumability*, not streaming. This package holds
the append-increment path: process only pages newer than the last
committed ``warc_ts`` watermark and merge new clusters into the previous
assignment.
"""
