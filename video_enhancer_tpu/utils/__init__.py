"""Infrastructure utilities (perf tracking, metrics, timing, errors, ...)."""
