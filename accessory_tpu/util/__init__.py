"""Host-side utilities: logging/metrics, profiling, misc."""
