"""Sources: synthetic fixtures and table loaders (SURVEY.md §2.1)."""
