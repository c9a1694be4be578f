"""Engine operators beyond built-in DataFrame ops (SURVEY.md §2.6 Tier C
+ the join helpers of §2.5 B5/B6). All pure ``DataFrame -> DataFrame``
functions, JVM-side expressions wherever semantics allow; Pandas UDFs
only where they genuinely can't (documented per module)."""
