"""Sources — catalog metadata readers and distribution data readers
(SURVEY §2.1: S1-S9)."""
