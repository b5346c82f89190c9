"""Placeholder — filled in during this round (SURVEY.md §7)."""
