"""Placeholder — queries land incrementally (SURVEY.md §2)."""
