"""End-to-end pipelines (the ALCO collector lifecycle, SURVEY.md §3.4)."""
