# Training-data pipeline operators: dedup, similarity search, text analysis,
# multimodal plumbing. All Spark-first (built-in functions; pandas UDFs only
# where Catalyst lacks the primitive).
