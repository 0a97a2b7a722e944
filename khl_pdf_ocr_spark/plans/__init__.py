"""Physical-plan inspection utilities (used by tests and tuning)."""
