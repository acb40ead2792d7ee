"""Sources: archive scans (batch) and stream sources (streaming)."""
