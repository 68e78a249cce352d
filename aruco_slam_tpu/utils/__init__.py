"""Config, metrics, and logging utilities."""
