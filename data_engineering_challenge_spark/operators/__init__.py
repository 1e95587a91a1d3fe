"""Operator library — each module maps one SURVEY.md §2 block to Spark."""
