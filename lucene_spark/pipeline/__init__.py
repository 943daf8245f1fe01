"""Training-data pipeline operators (dedup, text analysis, similarity
search, multimodal plumbing) — the large-scale data-curation layer that
complements the full-text index (SURVEY.md §2 + driver requirements)."""
