"""Placeholder — filled in by build plan step (SURVEY.md §7.2)."""
