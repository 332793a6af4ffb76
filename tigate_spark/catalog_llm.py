"""LLM-data-pipeline operator catalog (SURVEY §7 M6) — placeholder.

Filled by the dedup / similarity / text-analysis / multimodal waves.
"""
