"""Operator library: relational surface + LLM-data-pipeline extensions.

The reference has no relational operators at all (SURVEY.md §2.2 — its
whole surface is scan/filter/project/render); this package supplies the
full surface a user would expect from an analytics engine, plus the
dedup / similarity / text-analysis / multimodal operators a large-scale
training-data pipeline needs, each designed for very large inputs.
"""
