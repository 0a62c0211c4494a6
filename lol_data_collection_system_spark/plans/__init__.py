"""Composed query plans (SURVEY.md §3 pipelines + corpus analytics)."""
