"""Sources / sinks (SURVEY.md §2.1): page tables, mention spans, the entity
dictionary (with NIL append), embedding index parquet, prediction sinks."""
