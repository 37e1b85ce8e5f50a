"""Relational + kernel operators (SURVEY.md §2)."""
