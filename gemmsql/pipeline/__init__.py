"""LLM-data-pipeline operators: relational analytics, dedup, similarity
search, text analysis, event analytics, multimodal plumbing.

These extend the reference's surface (which has no tables, sources, or
relational ops — SURVEY.md §2.9) with the operations a 100 TB training-
data pipeline needs, expressed as declarative Spark plans.
"""
