"""Multi-chip / multi-host distribution (new capability — the reference is
single-process, SURVEY.md §2.3)."""
