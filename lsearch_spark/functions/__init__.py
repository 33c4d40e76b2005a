"""Column-level operator library: the reference's scalar surface
(loaders/filters/scorers, SURVEY.md §2.2-2.4) plus the large-scale
training-data operators (dedup, similarity, text analysis)."""
