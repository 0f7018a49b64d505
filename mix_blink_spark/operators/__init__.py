"""Dataflow operators (SURVEY.md §2): blocking, pairwise scoring, top-k
retrieval, transitive clustering, metrics, dedup/ANN families."""
