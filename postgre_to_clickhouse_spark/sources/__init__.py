"""Source connectors (SURVEY.md §2.1 Tier A + B1 scans)."""
