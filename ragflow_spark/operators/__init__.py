"""Web-scale training-data pipeline operators (dedup, similarity search,
text analysis) — first-class components alongside the extraction path."""
