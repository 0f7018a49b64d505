"""Pipeline plans: the end-to-end linkage job and its resumable stage store."""
