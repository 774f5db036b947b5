"""LLM-training-data pipeline operators (SURVEY.md §2.11, BASELINE.json
north_star): deduplication, similarity search, text analysis, multimodal
columns — each designed for the 100 TB regime (blocked candidate generation,
broadcast query vectors, no cross joins over the corpus).
"""
