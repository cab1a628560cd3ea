"""Host-side utilities: PLY IO, point-cloud helpers, ETA, logging."""
