"""Sinks + table-maintenance jobs (SURVEY.md A8 + §7.4)."""
